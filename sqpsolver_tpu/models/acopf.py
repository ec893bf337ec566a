"""AC Optimal Power Flow as pure-JAX NLPs (polar ACP and rectangular ACR).

The flagship workload, mirroring the reference's PowerModels-built OPF
(``/root/reference/test/opf.jl:5-25`` for ACP, ``examples/acopf/opf.jl:12-46``
for ACR): minimize polynomial generation cost subject to reference-bus angle,
bus power balance, and branch thermal limits.  The *math* of the reference's
``build_opf`` (variable_bus_voltage / variable_gen_power / power balance /
ohms / thermal limits) is restated as vectorized jax functions over
:class:`sqpsolver_tpu.models.power.PowerCase`; PowerModels/JuMP are replaced
by jax AD.

Scenario batching: loads (pd, qd) enter through the NLP ``theta`` parameter
pytree, so one compiled solver vmaps over thousands of load scenarios — the
instance-batch scaling axis of BASELINE.md (1024 x case118).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..nlp import NLP
from .power import PowerCase

INF = np.inf


def _start_point(case: PowerCase, nv: int):
    """Bound-midpoint generator start + flat voltage start, per the
    reference's init_vars (examples/acopf/init_opf.jl:4-20)."""
    pg0 = 0.5 * (case.gen_pmin + case.gen_pmax)
    qg0 = 0.5 * (case.gen_qmin + case.gen_qmax)
    return pg0, qg0


def _require_plain(case: PowerCase, who: str):
    """PWL-cost / HVDC extensions are wired into the flagship polar
    formulation only; the other formulations reject such cases loudly."""
    if case.n_pwl_gen or case.ndc:
        raise NotImplementedError(
            f"{who} does not support piecewise-linear costs or dclines; "
            "use acopf_polar for such cases"
        )


def _objective(case: PowerCase):
    base = case.baseMVA
    c2 = jnp.asarray(case.cost_c2)
    c1 = jnp.asarray(case.cost_c1)
    c0 = jnp.asarray(case.cost_c0)

    def cost(pg):
        mw = pg * base
        dt = pg.dtype
        return jnp.sum(
            c2.astype(dt) * mw * mw + c1.astype(dt) * mw + c0.astype(dt)
        )

    return cost


def acopf_polar(case: PowerCase, scenario_batchable: bool = True) -> NLP:
    """Polar (ACP) formulation.

    Variables  x = [va (nb), vm (nb), pg (ng), qg (ng)], plus, when the case
    carries them, piecewise-linear cost epigraph variables t (one per PWL
    generator) and HVDC line variables [pf, qf, qt] (the receiving-end
    active power is dependent: pt = (1-loss1)*pf - loss0, so no coupling row
    is needed — MATPOWER dcline semantics).
    Rows (linear first): ref-bus angle; PWL epigraph segments
    (t_g >= slope*Pg_MW + icpt); P balance (nb); Q balance (nb); from/to
    thermal limits (2*nl).
    """
    nb, ng, nl, ndc = case.nb, case.ng, case.nl, case.ndc
    (gff, bff, gft, bft, gtf, btf, gtt, btt) = case.admittances()
    gff, bff, gft, bft, gtf, btf, gtt, btt = (
        jnp.asarray(a) for a in (gff, bff, gft, bft, gtf, btf, gtt, btt)
    )
    f_idx = jnp.asarray(case.br_f)
    t_idx = jnp.asarray(case.br_t)
    gs = jnp.asarray(case.bus_gs)
    bs = jnp.asarray(case.bus_bs)
    gen_bus = jnp.asarray(case.gen_bus)
    cost = _objective(case)

    # PWL epigraph bookkeeping: one t variable per PWL generator, one linear
    # row per segment
    n_pwl = case.n_pwl_gen
    nseg = 0 if case.pwl_gen is None else len(case.pwl_gen)
    if n_pwl:
        pwl_gens = np.unique(case.pwl_gen)  # (n_pwl,) generator indices
        gen2t = {int(gi): k for k, gi in enumerate(pwl_gens)}
        seg_t = jnp.asarray([gen2t[int(gi)] for gi in case.pwl_gen])
        seg_gen = jnp.asarray(case.pwl_gen)
        seg_slope = jnp.asarray(case.pwl_slope)
    n = 2 * nb + 2 * ng + n_pwl + 3 * ndc

    if ndc:
        dcf_idx = jnp.asarray(case.dc_f)
        dct_idx = jnp.asarray(case.dc_t)
        loss0 = jnp.asarray(case.dc_loss0)
        loss1 = jnp.asarray(case.dc_loss1)

    has_rate = np.isfinite(case.br_rate) & (case.br_rate > 0)
    rate2 = np.where(has_rate, case.br_rate**2, 1.0e4)

    def split(x):
        va = x[:nb]
        vm = x[nb : 2 * nb]
        pg = x[2 * nb : 2 * nb + ng]
        qg = x[2 * nb + ng : 2 * nb + 2 * ng]
        return va, vm, pg, qg

    o_extra = 2 * nb + 2 * ng

    def split_extra(x):
        """(t, dc_pf, dc_qf, dc_qt) — the optional tail variables."""
        t = x[o_extra : o_extra + n_pwl]
        pf = x[o_extra + n_pwl : o_extra + n_pwl + ndc]
        qf = x[o_extra + n_pwl + ndc : o_extra + n_pwl + 2 * ndc]
        qt = x[o_extra + n_pwl + 2 * ndc :]
        return t, pf, qf, qt

    def flows(va, vm):
        dt = vm.dtype
        Gff, Bff, Gft, Bft, Gtf, Btf, Gtt, Btt = (
            a.astype(dt) for a in (gff, bff, gft, bft, gtf, btf, gtt, btt)
        )
        vf, vt = vm[f_idx], vm[t_idx]
        d = va[f_idx] - va[t_idx]
        A = vf * vt * jnp.cos(d)
        B = vf * vt * jnp.sin(d)
        vf2 = vf * vf
        vt2 = vt * vt
        p_f = Gff * vf2 + Gft * A + Bft * B
        q_f = -Bff * vf2 - Bft * A + Gft * B
        p_t = Gtt * vt2 + Gtf * A - Btf * B
        q_t = -Btt * vt2 - Btf * A - Gtf * B
        return p_f, q_f, p_t, q_t

    def f(x, theta=None):
        _, _, pg, _ = split(x)
        val = cost(pg)
        if n_pwl:
            t, _, _, _ = split_extra(x)
            val = val + jnp.sum(t)
        return val

    def g(x, theta=None):
        va, vm, pg, qg = split(x)
        dt = x.dtype
        pd = (
            jnp.asarray(theta["pd"], dt)
            if theta is not None
            else jnp.asarray(case.bus_pd, dt)
        )
        qd = (
            jnp.asarray(theta["qd"], dt)
            if theta is not None
            else jnp.asarray(case.bus_qd, dt)
        )
        p_f, q_f, p_t, q_t = flows(va, vm)
        vm2 = vm * vm
        p_inj = (
            jnp.zeros(nb, x.dtype).at[gen_bus].add(pg)
            - pd
            - gs.astype(dt) * vm2
            - jnp.zeros(nb, x.dtype).at[f_idx].add(p_f)
            - jnp.zeros(nb, x.dtype).at[t_idx].add(p_t)
        )
        q_inj = (
            jnp.zeros(nb, x.dtype).at[gen_bus].add(qg)
            - qd
            + bs.astype(dt) * vm2
            - jnp.zeros(nb, x.dtype).at[f_idx].add(q_f)
            - jnp.zeros(nb, x.dtype).at[t_idx].add(q_t)
        )
        rows_lin = [x[case.ref_bus][None]]
        if n_pwl:
            t, _, _, _ = split_extra(x)
            base = jnp.asarray(case.baseMVA, dt)
            rows_lin.append(
                t[seg_t] - seg_slope.astype(dt) * base * pg[seg_gen]
            )
        if ndc:
            _, dpf, dqf, dqt = split_extra(x)
            dpt = (1.0 - loss1.astype(dt)) * dpf - loss0.astype(dt)
            p_inj = (
                p_inj.at[dcf_idx].add(-dpf).at[dct_idx].add(dpt)
            )
            q_inj = q_inj.at[dcf_idx].add(dqf).at[dct_idx].add(dqt)
        s_from = p_f * p_f + q_f * q_f
        s_to = p_t * p_t + q_t * q_t
        return jnp.concatenate(
            rows_lin + [p_inj, q_inj, s_from, s_to]
        )

    m = 1 + nseg + 2 * nb + 2 * nl
    g_l = np.concatenate(
        [
            np.zeros(1),
            np.asarray(case.pwl_icpt) if nseg else np.zeros(0),
            np.zeros(2 * nb),
            np.full(2 * nl, -INF),
        ]
    )
    g_u = np.concatenate(
        [np.zeros(1), np.full(nseg, INF), np.zeros(2 * nb), rate2, rate2]
    )

    pg0, qg0 = _start_point(case, n)
    x0 = np.concatenate([np.zeros(nb), np.ones(nb), pg0, qg0])
    x_l = np.concatenate(
        [np.full(nb, -INF), case.bus_vmin, case.gen_pmin, case.gen_qmin]
    )
    x_u = np.concatenate(
        [np.full(nb, INF), case.bus_vmax, case.gen_pmax, case.gen_qmax]
    )
    if n_pwl:
        # start each epigraph variable on its PWL curve at pg0 (feasible)
        mw0 = pg0[pwl_gens] * case.baseMVA
        t0 = np.full(n_pwl, -np.inf)
        for s in range(nseg):
            k = int(np.searchsorted(pwl_gens, case.pwl_gen[s]))
            t0[k] = max(
                t0[k], case.pwl_slope[s] * mw0[k] + case.pwl_icpt[s]
            )
        x0 = np.concatenate([x0, t0])
        x_l = np.concatenate([x_l, np.full(n_pwl, -INF)])
        x_u = np.concatenate([x_u, np.full(n_pwl, INF)])
    if ndc:
        x0 = np.concatenate(
            [
                x0,
                0.5 * (case.dc_pmin + case.dc_pmax),
                0.5 * (case.dc_qminf + case.dc_qmaxf),
                0.5 * (case.dc_qmint + case.dc_qmaxt),
            ]
        )
        x_l = np.concatenate(
            [x_l, case.dc_pmin, case.dc_qminf, case.dc_qmint]
        )
        x_u = np.concatenate(
            [x_u, case.dc_pmax, case.dc_qmaxf, case.dc_qmaxt]
        )

    theta = (
        {"pd": np.asarray(case.bus_pd), "qd": np.asarray(case.bus_qd)}
        if scenario_batchable
        else None
    )
    if not scenario_batchable:
        f_fn, g_fn = (lambda x: f(x, None)), (lambda x: g(x, None))
    else:
        f_fn, g_fn = f, g

    return NLP(
        f=f_fn,
        g=g_fn,
        n=n,
        m=m,
        x_l=x_l,
        x_u=x_u,
        g_l=g_l,
        g_u=g_u,
        x0=x0,
        num_linear=1 + nseg,
        theta=theta,
        name=f"acopf_acp_{case.name}",
        # the BBD structure map covers the plain [va,vm,pg,qg] layout; cases
        # with PWL epigraph / HVDC tail variables use the dense path
        structure=(
            None if (n_pwl or ndc) else acopf_polar_structure(case)
        ),
    )


def acopf_rect(case: PowerCase, scenario_batchable: bool = True) -> NLP:
    """Rectangular (ACR) formulation — the reference example's formulation
    (``examples/acopf/opf.jl:52`` uses build_acr).

    Variables  x = [vr (nb), vi (nb), pg (ng), qg (ng)]; voltage magnitude
    bounds become nonlinear rows  vmin^2 <= vr^2 + vi^2 <= vmax^2
    (PowerModels constraint_voltage_magnitude semantics).
    """
    _require_plain(case, "acopf_rect")
    nb, ng, nl = case.nb, case.ng, case.nl
    (gff, bff, gft, bft, gtf, btf, gtt, btt) = case.admittances()
    gff, bff, gft, bft, gtf, btf, gtt, btt = (
        jnp.asarray(a) for a in (gff, bff, gft, bft, gtf, btf, gtt, btt)
    )
    f_idx = jnp.asarray(case.br_f)
    t_idx = jnp.asarray(case.br_t)
    gs = jnp.asarray(case.bus_gs)
    bs = jnp.asarray(case.bus_bs)
    gen_bus = jnp.asarray(case.gen_bus)
    cost = _objective(case)
    n = 2 * nb + 2 * ng

    has_rate = np.isfinite(case.br_rate) & (case.br_rate > 0)
    rate2 = np.where(has_rate, case.br_rate**2, 1.0e4)

    def split(x):
        vr = x[:nb]
        vi = x[nb : 2 * nb]
        pg = x[2 * nb : 2 * nb + ng]
        qg = x[2 * nb + ng :]
        return vr, vi, pg, qg

    def f(x, theta=None):
        _, _, pg, _ = split(x)
        return cost(pg)

    def g(x, theta=None):
        vr, vi, pg, qg = split(x)
        dt = x.dtype
        pd = (
            jnp.asarray(theta["pd"], dt)
            if theta is not None
            else jnp.asarray(case.bus_pd, dt)
        )
        qd = (
            jnp.asarray(theta["qd"], dt)
            if theta is not None
            else jnp.asarray(case.bus_qd, dt)
        )
        Gff, Bff, Gft, Bft, Gtf, Btf, Gtt, Btt = (
            a.astype(dt) for a in (gff, bff, gft, bft, gtf, btf, gtt, btt)
        )
        vrf, vrt = vr[f_idx], vr[t_idx]
        vif, vit = vi[f_idx], vi[t_idx]
        vf2 = vrf * vrf + vif * vif
        vt2 = vrt * vrt + vit * vit
        A = vrf * vrt + vif * vit  # Re(V_f conj(V_t))
        B = vif * vrt - vrf * vit  # Im(V_f conj(V_t))
        p_f = Gff * vf2 + Gft * A + Bft * B
        q_f = -Bff * vf2 - Bft * A + Gft * B
        p_t = Gtt * vt2 + Gtf * A - Btf * B
        q_t = -Btt * vt2 - Btf * A - Gtf * B
        v2 = vr * vr + vi * vi
        p_inj = (
            jnp.zeros(nb, x.dtype).at[gen_bus].add(pg)
            - pd
            - gs.astype(dt) * v2
            - jnp.zeros(nb, x.dtype).at[f_idx].add(p_f)
            - jnp.zeros(nb, x.dtype).at[t_idx].add(p_t)
        )
        q_inj = (
            jnp.zeros(nb, x.dtype).at[gen_bus].add(qg)
            - qd
            + bs.astype(dt) * v2
            - jnp.zeros(nb, x.dtype).at[f_idx].add(q_f)
            - jnp.zeros(nb, x.dtype).at[t_idx].add(q_t)
        )
        s_from = p_f * p_f + q_f * q_f
        s_to = p_t * p_t + q_t * q_t
        return jnp.concatenate(
            [vi[case.ref_bus][None], p_inj, q_inj, v2, s_from, s_to]
        )

    m = 1 + 2 * nb + nb + 2 * nl
    g_l = np.concatenate(
        [
            np.zeros(1),
            np.zeros(2 * nb),
            case.bus_vmin**2,
            np.full(2 * nl, -INF),
        ]
    )
    g_u = np.concatenate(
        [np.zeros(1), np.zeros(2 * nb), case.bus_vmax**2, rate2, rate2]
    )

    pg0, qg0 = _start_point(case, n)
    x0 = np.concatenate([np.ones(nb), np.zeros(nb), pg0, qg0])
    x_l = np.concatenate(
        [np.full(nb, -INF), np.full(nb, -INF), case.gen_pmin, case.gen_qmin]
    )
    x_u = np.concatenate(
        [np.full(nb, INF), np.full(nb, INF), case.gen_pmax, case.gen_qmax]
    )

    theta = (
        {"pd": np.asarray(case.bus_pd), "qd": np.asarray(case.bus_qd)}
        if scenario_batchable
        else None
    )
    if not scenario_batchable:
        f_fn, g_fn = (lambda x: f(x, None)), (lambda x: g(x, None))
    else:
        f_fn, g_fn = f, g

    return NLP(
        f=f_fn,
        g=g_fn,
        n=n,
        m=m,
        x_l=x_l,
        x_u=x_u,
        g_l=g_l,
        g_u=g_u,
        x0=x0,
        num_linear=1,
        theta=theta,
        name=f"acopf_acr_{case.name}",
    )


def acopf_ivr(case: PowerCase, scenario_batchable: bool = True) -> NLP:
    """Current-voltage rectangular (IVR) formulation — parity with the
    reference's IVR warm-start model (``examples/acopf/init_opf.jl:53-183``
    initializes an ``IVRPowerModel``; PowerModels' build_opf_iv semantics).

    Variables  x = [vr (nb), vi (nb), crg (ng), cig (ng)] — rectangular
    voltages plus rectangular GENERATOR current injections.  Branch currents
    are linear expressions  I_f = Y_ff V_f + Y_ft V_t  (substituted, not
    lifted), generator power is the bilinear expression
    ``S_g = V conj(I_g)``, and the bus *current* balance carries the
    constant-power loads as the rational  I_d = conj(S_d / V) — the defining
    trait of IVR.  Rows (linear first): ref-bus vi; current balance
    (2 nb); generator P/Q windows on the bilinear expressions (2 ng);
    voltage magnitude (nb); thermal limits as the quartic
    ``|V_f|^2 |I_f|^2 <= rate^2`` (2 nl, PowerModels IVR semantics —
    same feasible set as the polar |S_f|^2 form).
    """
    _require_plain(case, "acopf_ivr")
    nb, ng, nl = case.nb, case.ng, case.nl
    (gff, bff, gft, bft, gtf, btf, gtt, btt) = case.admittances()
    gff, bff, gft, bft, gtf, btf, gtt, btt = (
        jnp.asarray(a) for a in (gff, bff, gft, bft, gtf, btf, gtt, btt)
    )
    f_idx = jnp.asarray(case.br_f)
    t_idx = jnp.asarray(case.br_t)
    gs = jnp.asarray(case.bus_gs)
    bs = jnp.asarray(case.bus_bs)
    gen_bus = jnp.asarray(case.gen_bus)
    cost = _objective(case)
    n = 2 * nb + 2 * ng

    has_rate = np.isfinite(case.br_rate) & (case.br_rate > 0)
    rate2 = np.where(has_rate, case.br_rate**2, 1.0e4)

    def split(x):
        vr = x[:nb]
        vi = x[nb : 2 * nb]
        crg = x[2 * nb : 2 * nb + ng]
        cig = x[2 * nb + ng :]
        return vr, vi, crg, cig

    def gen_power(x):
        vr, vi, crg, cig = split(x)
        vrg = vr[gen_bus]
        vig = vi[gen_bus]
        pg = vrg * crg + vig * cig  # Re  V conj(I_g)
        qg = vig * crg - vrg * cig  # Im  V conj(I_g)
        return pg, qg

    def f(x, theta=None):
        pg, _ = gen_power(x)
        return cost(pg)

    def g(x, theta=None):
        vr, vi, crg, cig = split(x)
        dt = x.dtype
        pd = (
            jnp.asarray(theta["pd"], dt)
            if theta is not None
            else jnp.asarray(case.bus_pd, dt)
        )
        qd = (
            jnp.asarray(theta["qd"], dt)
            if theta is not None
            else jnp.asarray(case.bus_qd, dt)
        )
        Gff, Bff, Gft, Bft, Gtf, Btf, Gtt, Btt = (
            a.astype(dt) for a in (gff, bff, gft, bft, gtf, btf, gtt, btt)
        )
        vrf, vrt = vr[f_idx], vr[t_idx]
        vif, vit = vi[f_idx], vi[t_idx]
        # branch terminal currents, LINEAR in v:  I_f = Yff Vf + Yft Vt,
        # I_t = Ytt Vt + Ytf Vf (same admittance data as the ACP/ACR power
        # forms — S_f = V_f conj(I_f) reproduces their p_f/q_f exactly)
        cr_f = Gff * vrf - Bff * vif + Gft * vrt - Bft * vit
        ci_f = Gff * vif + Bff * vrf + Gft * vit + Bft * vrt
        cr_t = Gtt * vrt - Btt * vit + Gtf * vrf - Btf * vif
        ci_t = Gtt * vit + Btt * vrt + Gtf * vif + Btf * vrf
        v2 = vr * vr + vi * vi
        # load current  I_d = conj(S_d / V) = (S_d^* V) / |V|^2
        ird = (pd * vr + qd * vi) / v2
        iid = (pd * vi - qd * vr) / v2
        # shunt current  (gs + j bs) V
        irs = gs.astype(dt) * vr - bs.astype(dt) * vi
        iis = gs.astype(dt) * vi + bs.astype(dt) * vr
        bal_r = (
            jnp.zeros(nb, dt).at[gen_bus].add(crg)
            - ird
            - irs
            - jnp.zeros(nb, dt).at[f_idx].add(cr_f)
            - jnp.zeros(nb, dt).at[t_idx].add(cr_t)
        )
        bal_i = (
            jnp.zeros(nb, dt).at[gen_bus].add(cig)
            - iid
            - iis
            - jnp.zeros(nb, dt).at[f_idx].add(ci_f)
            - jnp.zeros(nb, dt).at[t_idx].add(ci_t)
        )
        vrg = vr[gen_bus]
        vig = vi[gen_bus]
        pg = vrg * crg + vig * cig
        qg = vig * crg - vrg * cig
        vf2 = vrf * vrf + vif * vif
        vt2 = vrt * vrt + vit * vit
        s_from = vf2 * (cr_f * cr_f + ci_f * ci_f)  # == |S_f|^2
        s_to = vt2 * (cr_t * cr_t + ci_t * ci_t)
        return jnp.concatenate(
            [vi[case.ref_bus][None], bal_r, bal_i, pg, qg, v2, s_from, s_to]
        )

    m = 1 + 2 * nb + 2 * ng + nb + 2 * nl
    g_l = np.concatenate(
        [
            np.zeros(1),
            np.zeros(2 * nb),
            case.gen_pmin,
            case.gen_qmin,
            case.bus_vmin**2,
            np.full(2 * nl, -INF),
        ]
    )
    g_u = np.concatenate(
        [
            np.zeros(1),
            np.zeros(2 * nb),
            case.gen_pmax,
            case.gen_qmax,
            case.bus_vmax**2,
            rate2,
            rate2,
        ]
    )

    pg0, qg0 = _start_point(case, n)
    # flat voltage start V = 1 + 0j  =>  I_g = conj(S_g / V) = pg0 - j qg0
    x0 = np.concatenate([np.ones(nb), np.zeros(nb), pg0, -qg0])
    x_l = np.full(n, -INF)
    x_u = np.full(n, INF)

    theta = (
        {"pd": np.asarray(case.bus_pd), "qd": np.asarray(case.bus_qd)}
        if scenario_batchable
        else None
    )
    if not scenario_batchable:
        f_fn, g_fn = (lambda x: f(x, None)), (lambda x: g(x, None))
    else:
        f_fn, g_fn = f, g

    return NLP(
        f=f_fn,
        g=g_fn,
        n=n,
        m=m,
        x_l=x_l,
        x_u=x_u,
        g_l=g_l,
        g_u=g_u,
        x0=x0,
        num_linear=1,
        theta=theta,
        name=f"acopf_ivr_{case.name}",
    )


def acopf_wr(case: PowerCase, scenario_batchable: bool = True) -> NLP:
    """W-space rectangular (ACWR) formulation — parity with the reference's
    custom ``ACWRPowerModel`` (examples/acopf/acwr.jl:22-35).

    Lifted variables ``w_i = vr_i^2 + vi_i^2`` per bus and
    ``wr_ij = vr_i vr_j + vi_i vi_j``, ``wi_ij = vi_i vr_j - vr_i vi_j`` per
    bus pair make the power-flow rows *linear* in (w, wr, wi, pg, qg); only
    the lifting constraints and thermal limits stay nonlinear.  Variable
    layout: x = [vr, vi (nb each), w (nb), wr, wi (npairs each), pg, qg].
    """
    _require_plain(case, "acopf_wr")
    if np.any(case.br_tap != 1.0) or np.any(case.br_shift != 0.0):
        raise ValueError("acopf_wr supports tap=1, shift=0 branches only")
    nb, ng, nl = case.nb, case.ng, case.nl
    (gff, bff, gft, bft, gtf, btf, gtt, btt) = case.admittances()
    gff, bff, gft, bft, gtf, btf, gtt, btt = (
        jnp.asarray(np.real(a)) for a in (gff, bff, gft, bft, gtf, btf, gtt, btt)
    )
    f_idx = np.asarray(case.br_f)
    t_idx = np.asarray(case.br_t)
    # canonical bus pairs (i<j); parallel branches share one (wr, wi)
    pair_lo = np.minimum(f_idx, t_idx)
    pair_hi = np.maximum(f_idx, t_idx)
    pairs, br_pair = np.unique(
        np.stack([pair_lo, pair_hi], axis=1), axis=0, return_inverse=True
    )
    npair = len(pairs)
    # branch orientation: +1 if (f,t) matches the canonical (lo,hi) pair
    orient = np.where(f_idx == pair_lo, 1.0, -1.0)

    gs = jnp.asarray(case.bus_gs)
    bs = jnp.asarray(case.bus_bs)
    gen_bus = jnp.asarray(case.gen_bus)
    cost = _objective(case)
    fj = jnp.asarray(f_idx)
    tj = jnp.asarray(t_idx)
    br_pair_j = jnp.asarray(br_pair)
    orient_j = jnp.asarray(orient)
    plo = jnp.asarray(pairs[:, 0])
    phi_ = jnp.asarray(pairs[:, 1])

    n = 3 * nb + 2 * npair + 2 * ng
    has_rate = np.isfinite(case.br_rate) & (case.br_rate > 0)
    rate2 = np.where(has_rate, case.br_rate**2, 1.0e4)

    def split(x):
        vr = x[:nb]
        vi = x[nb : 2 * nb]
        w = x[2 * nb : 3 * nb]
        wr = x[3 * nb : 3 * nb + npair]
        wi = x[3 * nb + npair : 3 * nb + 2 * npair]
        pg = x[3 * nb + 2 * npair : 3 * nb + 2 * npair + ng]
        qg = x[3 * nb + 2 * npair + ng :]
        return vr, vi, w, wr, wi, pg, qg

    def f(x, theta=None):
        *_, pg, _ = split(x)
        return cost(pg)

    def g(x, theta=None):
        vr, vi, w, wr, wi, pg, qg = split(x)
        dt = x.dtype
        pd = (
            jnp.asarray(theta["pd"], dt)
            if theta is not None
            else jnp.asarray(case.bus_pd, dt)
        )
        qd = (
            jnp.asarray(theta["qd"], dt)
            if theta is not None
            else jnp.asarray(case.bus_qd, dt)
        )
        Gff, Bff, Gft, Bft, Gtf, Btf, Gtt, Btt = (
            a.astype(dt) for a in (gff, bff, gft, bft, gtf, btf, gtt, btt)
        )
        wr_b = wr[br_pair_j]
        wi_b = wi[br_pair_j] * orient_j.astype(dt)
        wf = w[fj]
        wt = w[tj]
        # branch flows, linear in (w, wr, wi)
        p_f = Gff * wf + Gft * wr_b + Bft * wi_b
        q_f = -Bff * wf - Bft * wr_b + Gft * wi_b
        p_t = Gtt * wt + Gtf * wr_b - Btf * wi_b
        q_t = -Btt * wt - Btf * wr_b - Gtf * wi_b
        p_inj = (
            jnp.zeros(nb, x.dtype).at[gen_bus].add(pg)
            - pd
            - gs.astype(dt) * w
            - jnp.zeros(nb, x.dtype).at[fj].add(p_f)
            - jnp.zeros(nb, x.dtype).at[tj].add(p_t)
        )
        q_inj = (
            jnp.zeros(nb, x.dtype).at[gen_bus].add(qg)
            - qd
            + bs.astype(dt) * w
            - jnp.zeros(nb, x.dtype).at[fj].add(q_f)
            - jnp.zeros(nb, x.dtype).at[tj].add(q_t)
        )
        # nonlinear lifting rows (acwr.jl:28-34)
        link_w = w - (vr * vr + vi * vi)
        link_wr = wr - (vr[plo] * vr[phi_] + vi[plo] * vi[phi_])
        link_wi = wi - (vi[plo] * vr[phi_] - vr[plo] * vi[phi_])
        s_from = p_f * p_f + q_f * q_f
        s_to = p_t * p_t + q_t * q_t
        return jnp.concatenate(
            [
                vi[case.ref_bus][None],  # linear: ref angle
                p_inj,  # linear in this space
                q_inj,  # linear
                link_w,
                link_wr,
                link_wi,
                s_from,
                s_to,
            ]
        )

    m = 1 + 2 * nb + nb + 2 * npair + 2 * nl
    num_linear = 1 + 2 * nb
    g_l = np.concatenate(
        [
            np.zeros(1 + 2 * nb),
            np.zeros(nb + 2 * npair),
            np.full(2 * nl, -INF),
        ]
    )
    g_u = np.concatenate(
        [np.zeros(1 + 2 * nb), np.zeros(nb + 2 * npair), rate2, rate2]
    )

    pg0, qg0 = _start_point(case, n)
    x0 = np.concatenate(
        [
            np.ones(nb),  # vr
            np.zeros(nb),  # vi
            np.ones(nb),  # w
            np.ones(npair),  # wr
            np.zeros(npair),  # wi
            pg0,
            qg0,
        ]
    )
    vmax2 = case.bus_vmax**2
    pair_wmax = case.bus_vmax[pairs[:, 0]] * case.bus_vmax[pairs[:, 1]]
    x_l = np.concatenate(
        [
            np.full(nb, -INF),
            np.full(nb, -INF),
            case.bus_vmin**2,
            -pair_wmax,
            -pair_wmax,
            case.gen_pmin,
            case.gen_qmin,
        ]
    )
    x_u = np.concatenate(
        [
            np.full(nb, INF),
            np.full(nb, INF),
            vmax2,
            pair_wmax,
            pair_wmax,
            case.gen_pmax,
            case.gen_qmax,
        ]
    )

    theta = (
        {"pd": np.asarray(case.bus_pd), "qd": np.asarray(case.bus_qd)}
        if scenario_batchable
        else None
    )
    if not scenario_batchable:
        f_fn, g_fn = (lambda x: f(x, None)), (lambda x: g(x, None))
    else:
        f_fn, g_fn = f, g

    return NLP(
        f=f_fn,
        g=g_fn,
        n=n,
        m=m,
        x_l=x_l,
        x_u=x_u,
        g_l=g_l,
        g_u=g_u,
        x0=x0,
        num_linear=num_linear,
        theta=theta,
        name=f"acopf_wr_{case.name}",
    )


def acopf_polar_structure(case: PowerCase):
    """Exact structural sparsity of the polar ACOPF formulation (row-wise
    variable supports), enabling the block-structured KKT path.

    Mirrors the reference's sparse Jacobian/Hessian structure callbacks
    (``/root/reference/src/model.jl:21-47``) — here derived analytically from
    the network topology instead of reported by JuMP's AD.  Variable layout
    (``acopf_polar``): ``[va (nb), vm (nb), pg (ng), qg (ng)]``; row layout:
    ``[ref angle, P balance (nb), Q balance (nb), s_from (nl), s_to (nl)]``.
    """
    from ..structure import NLPStructure

    nb, ng, nl = case.nb, case.ng, case.nl
    va = lambda i: int(i)
    vm = lambda i: int(nb + i)
    pg = lambda k: int(2 * nb + k)
    qg = lambda k: int(2 * nb + ng + k)

    nbr: list[set] = [set() for _ in range(nb)]
    for l in range(nl):
        f, t = int(case.br_f[l]), int(case.br_t[l])
        nbr[f].add(t)
        nbr[t].add(f)
    gens_at: list[list] = [[] for _ in range(nb)]
    for k, b in enumerate(case.gen_bus):
        gens_at[int(b)].append(k)

    rows = [np.array([va(case.ref_bus)])]
    for i in range(nb):  # P balance
        cols = [va(i), vm(i)]
        for j in sorted(nbr[i]):
            cols += [va(j), vm(j)]
        cols += [pg(k) for k in gens_at[i]]
        rows.append(np.array(sorted(cols)))
    for i in range(nb):  # Q balance
        cols = [va(i), vm(i)]
        for j in sorted(nbr[i]):
            cols += [va(j), vm(j)]
        cols += [qg(k) for k in gens_at[i]]
        rows.append(np.array(sorted(cols)))
    for l in range(nl):  # s_from
        f, t = int(case.br_f[l]), int(case.br_t[l])
        rows.append(np.array(sorted({va(f), vm(f), va(t), vm(t)})))
    for l in range(nl):  # s_to
        f, t = int(case.br_f[l]), int(case.br_t[l])
        rows.append(np.array(sorted({va(f), vm(f), va(t), vm(t)})))
    return NLPStructure(row_cols=tuple(rows))


def load_scenarios(case: PowerCase, batch: int, seed: int = 0, spread: float = 0.1):
    """Batch of load scenarios: multiplicative perturbations of (pd, qd).

    Returns a theta pytree with leading axis ``batch`` for vmapped solves.
    """
    rng = np.random.default_rng(seed)
    scale = 1.0 + spread * (2.0 * rng.random((batch, 1)) - 1.0)
    jitter = 1.0 + 0.5 * spread * (2.0 * rng.random((batch, case.nb)) - 1.0)
    pd = case.bus_pd[None, :] * scale * jitter
    qd = case.bus_qd[None, :] * scale * jitter
    return {"pd": pd, "qd": qd}
