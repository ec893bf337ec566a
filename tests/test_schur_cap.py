"""Bounded Schur set (Parameters.schur_cap -> IpmOptions.schur_cap).

The hybrid elastic IPM solves every small-E row (equalities + active
constraints) through a dense Schur complement S; uncapped, S is (m, m) even
though typically only equalities plus a few active rows are ever stiff.  At
ACOPF scale (m ~ 2n) that (m, m) factorization dominates the whole solve.
``schur_cap`` keeps only the cap stiffest rows on the Schur path and folds
the overflow into K with the bounded 1/E the structured (BBD) backend
already uses — same results, ~4-8x fewer factorization FLOPs.

The reference has no counterpart (its QP is outsourced to Ipopt/ma57 sparse
LDLt, examples/acopf/opf.jl:59-64); this is a TPU-batching-motivated
redesign of the condensation, documented in PARITY.md.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import sqpsolver_tpu as sqp
from sqpsolver_tpu.algorithms.common import schur_cap_for
from sqpsolver_tpu.models.acopf import acopf_polar
from sqpsolver_tpu.ops.qp_ipm import IpmOptions, solve_qp


def _random_eq_ineq_qp(seed, n=24, m=40, n_eq=10):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n))
    Q = M @ M.T + n * np.eye(n)
    c = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    x_feas = rng.normal(size=n) * 0.3
    b = A @ x_feas
    rl = np.where(np.arange(m) < n_eq, b, b - rng.uniform(0.05, 1.0, m))
    ru = np.where(np.arange(m) < n_eq, b, b + rng.uniform(0.05, 1.0, m))
    lb = np.full(n, -10.0)
    ub = np.full(n, 10.0)
    w = np.full(m, 1e8)
    return tuple(
        jnp.asarray(a, jnp.float64) for a in (Q, c, A, rl, ru, lb, ub, w)
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_qp_capped_matches_uncapped(seed):
    Q, c, A, rl, ru, lb, ub, w = _random_eq_ineq_qp(seed)
    base = IpmOptions(tol=1e-9, max_iter=60)
    ref = solve_qp(Q, c, A, rl, ru, lb, ub, w, opts=base)
    # cap = n_eq + headroom; mixed f32 factorization (the target deployment)
    capped = solve_qp(
        Q, c, A, rl, ru, lb, ub, w,
        opts=IpmOptions(
            tol=2e-6, max_iter=60, factor_dtype="float32", ir_steps=3,
            schur_cap=24, invE_floor=3e-7,
        ),
    )
    assert bool(capped.converged)
    # a 2e-6-tol f32-factorized solve vs a 1e-9 f64 one: ~1e-4 step agreement
    # is the honest expectation (the invE_floor condensation slop is 3e-7)
    np.testing.assert_allclose(
        np.asarray(capped.p), np.asarray(ref.p), rtol=5e-3, atol=1e-4
    )


def test_qp_cap_smaller_than_eq_count_still_solves():
    """Even a cap below the equality count stays correct (equalities fold
    with bounded 1/E; refinement + elastic slack absorb the O(floor) slop) —
    just less accurate, so only the objective is pinned loosely."""
    Q, c, A, rl, ru, lb, ub, w = _random_eq_ineq_qp(3, n_eq=12)
    ref = solve_qp(Q, c, A, rl, ru, lb, ub, w, opts=IpmOptions(tol=1e-9))
    capped = solve_qp(
        Q, c, A, rl, ru, lb, ub, w,
        opts=IpmOptions(
            tol=1e-4, max_iter=80, factor_dtype="float32", ir_steps=4,
            schur_cap=8, invE_floor=3e-7,
        ),
    )
    assert bool(capped.converged)
    np.testing.assert_allclose(
        np.asarray(capped.p), np.asarray(ref.p), rtol=2e-2, atol=2e-2
    )


def test_auto_policy():
    from sqpsolver_tpu.models.matpower import load_case

    nlp = acopf_polar(load_case("case30"), scenario_batchable=False)
    mixed = sqp.Parameters(kkt_precision="mixed_ir")
    # direct precision, structured mode, and schur_cap=0 all disable the cap
    assert schur_cap_for(sqp.Parameters(), nlp) == 0
    assert schur_cap_for(mixed.replace(schur_cap=0), nlp) == 0
    assert (
        schur_cap_for(mixed.replace(kkt_structured=True), nlp) == 0
    )
    cap = schur_cap_for(mixed, nlp)
    m_eq = int(np.sum(np.asarray(nlp.g_l) == np.asarray(nlp.g_u)))
    assert m_eq < cap < nlp.m, (m_eq, cap, nlp.m)
    # explicit cap honored (clamped to m)
    assert schur_cap_for(mixed.replace(schur_cap=97), nlp) == 97
    assert schur_cap_for(mixed.replace(schur_cap=10_000), nlp) == nlp.m


def test_acopf_case30_capped_matches_direct():
    """End-to-end SQP on real case30: auto-capped mixed_ir reproduces the
    direct-f64 optimum (which itself is pinned to the published MATPOWER
    value in test_acopf)."""
    from sqpsolver_tpu.models.matpower import load_case

    nlp = acopf_polar(load_case("case30"), scenario_batchable=False)
    common = dict(
        max_iter=100, OutputFlag=0, tol_infeas=1e-6, tol_residual=1e-4,
        use_soc=True,
    )
    r_direct = sqp.optimize(nlp, sqp.Parameters(**common))
    r_capped = sqp.optimize(
        nlp, sqp.Parameters(kkt_precision="mixed_ir", **common)
    )
    assert r_direct.success and r_capped.success
    np.testing.assert_allclose(
        float(r_capped.obj_val), float(r_direct.obj_val), rtol=1e-5
    )


def test_acopf_case30_plane_capped():
    """mixed_plane (the TPU bench fast path) through the compact Schur
    gather: solves real case30 from cold start (uncapped plane fails this
    first QP — the cap's smaller, better-conditioned S is what rescues it)
    and lands on the direct optimum."""
    from sqpsolver_tpu.models.matpower import load_case

    nlp = acopf_polar(load_case("case30"), scenario_batchable=False)
    res = sqp.optimize(
        nlp,
        sqp.Parameters(
            kkt_precision="mixed_plane", hessian_shift="power",
            max_iter=100, OutputFlag=0, tol_infeas=1e-6, tol_residual=1e-4,
            use_soc=True,
        ),
    )
    assert res.success, res.status_name
    np.testing.assert_allclose(float(res.obj_val), 576.977, rtol=1e-3)
