"""Piecewise-linear gencost (epigraph) + HVDC dcline support.

The reference consumes whatever PowerModels parses — including model-1
piecewise-linear generator costs and the ``mpc.dcline`` HVDC matrix its own
``examples/acopf/case3.m`` carries.  Here: the MATPOWER parser converts
convex PWL costs to max-of-affine segments, ``acopf_polar`` epigraphs them
(one t variable per PWL generator + one leading linear row per segment) and
models dclines with [pf, qf, qt] tail variables (receiving end dependent:
pt = (1-loss1)*pf - loss0, MATPOWER semantics).
"""

import dataclasses

import numpy as np
import pytest

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models.acopf import acopf_polar, acopf_rect
from sqpsolver_tpu.models.matpower import parse_matpower
from sqpsolver_tpu.models.power import case9

PARAMS = sqp.Parameters(
    max_iter=100, OutputFlag=0, tol_infeas=1e-6, tol_residual=1e-4,
    use_soc=True,
)
CASE9_OPT = 5296.69  # published MATPOWER case9 AC-OPF optimum


def _case9_m_text(pwl_segments=0, dcline_row=None):
    """Emit MATPOWER .m text from the in-code case9 data."""
    c = case9()
    base = c.baseMVA
    lines = ["function mpc = case9x", "mpc.version = '2';",
             f"mpc.baseMVA = {base};"]

    def matrix(name, rows):
        body = "\n".join(
            "  " + "\t".join(f"{v:.10g}" for v in r) + ";" for r in rows
        )
        return f"mpc.{name} = [\n{body}\n];"

    bus = []
    for i in range(c.nb):
        btype = 3 if i == c.ref_bus else (2 if i in c.gen_bus else 1)
        bus.append([
            i + 1, btype, c.bus_pd[i] * base, c.bus_qd[i] * base,
            c.bus_gs[i] * base, c.bus_bs[i] * base, 1, 1.0, 0.0, 345, 1,
            c.bus_vmax[i], c.bus_vmin[i],
        ])
    lines.append(matrix("bus", bus))

    gen = []
    for gi in range(c.ng):
        gen.append([
            c.gen_bus[gi] + 1, 0, 0, c.gen_qmax[gi] * base,
            c.gen_qmin[gi] * base, 1.0, base, 1, c.gen_pmax[gi] * base,
            c.gen_pmin[gi] * base,
        ])
    lines.append(matrix("gen", gen))

    br = []
    for li in range(c.nl):
        rate = 0.0 if not np.isfinite(c.br_rate[li]) else c.br_rate[li] * base
        br.append([
            c.br_f[li] + 1, c.br_t[li] + 1, c.br_r[li], c.br_x[li],
            c.br_b[li], rate, rate, rate, 0, 0, 1,
        ])
    lines.append(matrix("branch", br))

    cost = []
    for gi in range(c.ng):
        if pwl_segments:
            xs = np.linspace(
                c.gen_pmin[gi] * base, c.gen_pmax[gi] * base,
                pwl_segments + 1,
            )
            ys = c.cost_c2[gi] * xs**2 + c.cost_c1[gi] * xs + c.cost_c0[gi]
            cost.append(
                [1, 0, 0, pwl_segments + 1]
                + [v for xy in zip(xs, ys) for v in xy]
            )
        else:
            cost.append([2, 0, 0, 3, c.cost_c2[gi], c.cost_c1[gi],
                         c.cost_c0[gi]])
    lines.append(matrix("gencost", cost))

    if dcline_row is not None:
        lines.append(matrix("dcline", [dcline_row]))
    return "\n".join(lines)


def _write_and_parse(tmp_path, text, name):
    p = tmp_path / f"{name}.m"
    p.write_text(text)
    return parse_matpower(str(p), name=name)


def test_roundtrip_polynomial(tmp_path):
    """The emitted .m reparses to the same network (sanity of the emitter —
    everything else in this file builds on it)."""
    parsed = _write_and_parse(tmp_path, _case9_m_text(), "case9rt")
    res = sqp.optimize(acopf_polar(parsed, scenario_batchable=False), PARAMS)
    assert res.success
    np.testing.assert_allclose(float(res.obj_val), CASE9_OPT, rtol=1e-4)


def test_pwl_gencost_epigraph(tmp_path):
    """12-segment PWL outer approximation of the case9 quadratics: the PWL
    curve lies ON the quadratic at breakpoints and ABOVE between them, so
    min_PWL >= min_quad; the chord gap (c2*h^2/4 per segment) keeps the
    objective within 1% at this resolution."""
    parsed = _write_and_parse(tmp_path, _case9_m_text(pwl_segments=12),
                              "case9pwl")
    assert parsed.pwl_gen is not None and len(parsed.pwl_gen) == 36
    assert parsed.n_pwl_gen == 3
    assert np.all(parsed.cost_c2 == 0) and np.all(parsed.cost_c1 == 0)
    nlp = acopf_polar(parsed, scenario_batchable=False)
    assert nlp.num_linear == 1 + 36
    assert nlp.n == 2 * 9 + 2 * 3 + 3  # + one epigraph var per generator
    res = sqp.optimize(nlp, PARAMS)
    assert res.success, res.status_name
    assert CASE9_OPT * (1 - 1e-4) <= float(res.obj_val) <= CASE9_OPT * 1.01


def test_pwl_nonconvex_rejected(tmp_path):
    text = _case9_m_text()
    # concave 3-point curve: slopes decrease
    bad = ("mpc.gencost = [\n"
           "  1 0 0 3 10 100 20 190 30 200;\n"
           "  2 0 0 3 0.085 1.2 0;\n"
           "  2 0 0 3 0.1225 1 0;\n"
           "];")
    import re
    text = re.sub(r"mpc\.gencost = \[.*?\];", bad, text, flags=re.DOTALL)
    with pytest.raises(ValueError, match="convex"):
        _write_and_parse(tmp_path, text, "case9bad")


def test_dcline_zero_capacity_is_noop(tmp_path):
    """A dcline pinned to zero transfer must not move the optimum."""
    dc = [1, 7, 1, 0, 0, 0, 0, 1.0, 1.0, 0, 0, 0, 0, 0, 0, 0, 0]
    parsed = _write_and_parse(tmp_path, _case9_m_text(dcline_row=dc),
                              "case9dc0")
    assert parsed.ndc == 1
    res = sqp.optimize(acopf_polar(parsed, scenario_batchable=False), PARAMS)
    assert res.success
    np.testing.assert_allclose(float(res.obj_val), CASE9_OPT, rtol=1e-4)


def test_dcline_adds_flexibility(tmp_path):
    """A free lossless HVDC path from the cheap generator's bus to a load
    bus can only help: optimum <= the base optimum (and the solve is
    feasible with the line active)."""
    dc = [1, 7, 1, 0, 0, 0, 0, 1.0, 1.0, -100, 100, -50, 50, -50, 50, 0, 0]
    parsed = _write_and_parse(tmp_path, _case9_m_text(dcline_row=dc),
                              "case9dc")
    res = sqp.optimize(acopf_polar(parsed, scenario_batchable=False), PARAMS)
    assert res.success, res.status_name
    assert float(res.obj_val) <= CASE9_OPT * (1 + 1e-6)


def test_dcline_losses_cost_money(tmp_path):
    """Forcing 40 MW through a lossy line (loss1=10%) wastes 4 MW: the
    optimum must exceed the zero-capacity baseline."""
    dc = [1, 7, 1, 0, 0, 0, 0, 1.0, 1.0, 40, 40, 0, 0, 0, 0, 0, 0.10]
    parsed = _write_and_parse(tmp_path, _case9_m_text(dcline_row=dc),
                              "case9dcloss")
    res = sqp.optimize(acopf_polar(parsed, scenario_batchable=False), PARAMS)
    assert res.success, res.status_name
    assert float(res.obj_val) > CASE9_OPT * (1 + 1e-5)


def test_other_formulations_reject_extensions(tmp_path):
    parsed = _write_and_parse(
        tmp_path, _case9_m_text(pwl_segments=4), "case9pwl2"
    )
    with pytest.raises(NotImplementedError, match="acopf_polar"):
        acopf_rect(parsed)


def test_replicate_tiles_extensions(tmp_path):
    from sqpsolver_tpu.models.power import replicate_case

    dc = [1, 7, 1, 0, 0, 0, 0, 1.0, 1.0, -100, 100, -50, 50, -50, 50, 0, 0]
    parsed = _write_and_parse(
        tmp_path, _case9_m_text(pwl_segments=4, dcline_row=dc), "case9both"
    )
    rep = replicate_case(parsed, 3)
    assert rep.ndc == 3 and rep.n_pwl_gen == 9
    assert rep.dc_f[1] == parsed.dc_f[0] + 9
    assert rep.pwl_gen[len(parsed.pwl_gen)] == parsed.pwl_gen[0] + 3
