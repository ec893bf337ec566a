"""QP interior-point solver tests.

Property tests against a trusted CPU solver (scipy) on random QPs — coverage
the reference lacks entirely (its QP layer is Ipopt's responsibility); part of
the new framework's test plan per SURVEY §4 (implications item c).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize as sopt

from sqpsolver_tpu.ops.qp_ipm import IpmOptions, solve_qp

INF = np.inf


def _scipy_qp(Q, c, A, rl, ru, lb, ub):
    n = len(c)
    cons = []
    if A.shape[0]:
        cons.append(sopt.LinearConstraint(A, rl, ru))
    res = sopt.minimize(
        lambda p: 0.5 * p @ Q @ p + c @ p,
        jac=lambda p: Q @ p + c,
        x0=np.clip(np.zeros(n), lb, ub),
        bounds=sopt.Bounds(lb, ub),
        constraints=cons,
        method="SLSQP",
        options={"ftol": 1e-12, "maxiter": 500},
    )
    return res


def _solve(Q, c, A, rl, ru, lb, ub, w_big=1e8, **kw):
    m = A.shape[0]
    return solve_qp(
        jnp.asarray(Q),
        jnp.asarray(c),
        jnp.asarray(A),
        jnp.asarray(rl),
        jnp.asarray(ru),
        jnp.asarray(lb),
        jnp.asarray(ub),
        jnp.full((m,), w_big),
        **kw,
    )


def _random_qp(rng, n, m, *, psd=True):
    L = rng.standard_normal((n, n)) / np.sqrt(n)
    Q = L @ L.T + (0.1 * np.eye(n) if psd else -0.5 * np.eye(n))
    c = rng.standard_normal(n)
    A = rng.standard_normal((m, n)) / np.sqrt(n)
    mid = A @ rng.standard_normal(n) * 0.1
    half = np.abs(rng.standard_normal(m)) + 0.1
    rl = mid - half
    ru = mid + half
    # random one-sided / equality rows
    kind = rng.integers(0, 4, m)
    rl = np.where(kind == 1, -INF, rl)
    ru = np.where(kind == 2, INF, ru)
    rl = np.where(kind == 3, ru, rl)  # equality
    lb = np.full(n, -2.0)
    ub = np.full(n, 2.0)
    return Q, c, A, rl, ru, lb, ub


@pytest.mark.parametrize("seed", range(8))
def test_random_qp_vs_scipy(seed):
    rng = np.random.default_rng(seed)
    n, m = 8, 5
    Q, c, A, rl, ru, lb, ub = _random_qp(rng, n, m)
    sol = _solve(Q, c, A, rl, ru, lb, ub)
    ref = _scipy_qp(Q, c, A, rl, ru, lb, ub)
    assert bool(sol.converged)
    assert ref.success
    obj_ipm = 0.5 * sol.p @ Q @ sol.p + c @ sol.p
    obj_ref = ref.fun
    # objective parity (scipy SLSQP itself is only ~1e-8 accurate)
    assert obj_ipm <= obj_ref + 1e-6 * (1 + abs(obj_ref))
    np.testing.assert_allclose(sol.p, ref.x, atol=2e-4)
    # feasibility of our solution
    r = A @ np.asarray(sol.p)
    assert np.all(r >= rl - 1e-7) and np.all(r <= ru + 1e-7)
    assert np.all(sol.p >= lb - 1e-9) and np.all(sol.p <= ub + 1e-9)


@pytest.mark.parametrize("seed", range(4))
def test_qp_kkt_stationarity(seed):
    """Our duals satisfy  Qp + c + A'y - zl + zu = 0 to high accuracy."""
    rng = np.random.default_rng(100 + seed)
    Q, c, A, rl, ru, lb, ub = _random_qp(rng, 6, 4)
    sol = _solve(Q, c, A, rl, ru, lb, ub)
    assert bool(sol.converged)
    stat = (
        Q @ np.asarray(sol.p)
        + c
        + A.T @ np.asarray(sol.y)
        - np.asarray(sol.mult_lo)
        + np.asarray(sol.mult_up)
    )
    assert np.max(np.abs(stat)) < 1e-7
    assert np.all(np.asarray(sol.mult_lo) >= 0)
    assert np.all(np.asarray(sol.mult_up) >= 0)


def test_lp_mode():
    """Q=0 (the reference's hessian_type='none' SLP path,
    subproblem_JuMP.jl:137-140)."""
    c = np.array([-1.0, -2.0])
    A = np.array([[1.0, 1.0]])
    sol = _solve(
        np.zeros((2, 2)), c, A, np.array([-INF]), np.array([1.0]),
        np.zeros(2), np.full(2, 10.0),
    )
    assert bool(sol.converged)
    np.testing.assert_allclose(sol.p, [0.0, 1.0], atol=1e-7)


def test_infeasible_detection():
    """Conflicting equalities -> slack mass >> 0 (the FR trigger,
    sqp_trust_region.jl:151)."""
    Q = np.eye(2)
    c = np.zeros(2)
    A = np.array([[1.0, 1.0], [1.0, 1.0]])
    sol = _solve(
        Q, c, A, np.array([1.0, 3.0]), np.array([1.0, 3.0]),
        np.full(2, -10.0), np.full(2, 10.0),
    )
    slack = np.asarray(sol.slack_u + sol.slack_v)
    assert slack.max() > 0.5  # total violation 2 split across rows


def test_feasible_has_tiny_slack():
    rng = np.random.default_rng(7)
    Q, c, A, rl, ru, lb, ub = _random_qp(rng, 6, 4)
    sol = _solve(Q, c, A, rl, ru, lb, ub)
    assert float(jnp.max(sol.slack_u + sol.slack_v)) < 1e-6


def test_fixed_variables():
    Q = np.eye(2)
    c = np.array([-1.0, -2.0])
    A = np.zeros((0, 2))
    sol = _solve(
        Q, c, A, np.zeros(0), np.zeros(0),
        np.array([0.0, 0.5]), np.array([10.0, 0.5]),
    )
    np.testing.assert_allclose(sol.p, [1.0, 0.5], atol=1e-8)


def test_indefinite_hessian_regularized():
    """Indefinite Q: the Cholesky delta-ladder (inertia correction) must keep
    the solve finite and feasible."""
    rng = np.random.default_rng(3)
    Q, c, A, rl, ru, lb, ub = _random_qp(rng, 6, 4, psd=False)
    sol = _solve(Q, c, A, rl, ru, lb, ub)
    p = np.asarray(sol.p)
    assert np.all(np.isfinite(p))
    r = A @ p
    assert np.all(r >= rl - 1e-6) and np.all(r <= ru + 1e-6)
    assert np.all(p >= lb - 1e-8) and np.all(p <= ub + 1e-8)


def test_vmap_batch_matches_loop():
    """vmap-batched solves == loop of single solves (SURVEY §4 item c)."""
    rng = np.random.default_rng(11)
    n, m, B = 5, 3, 6
    probs = [_random_qp(np.random.default_rng(50 + i), n, m) for i in range(B)]
    singles = [np.asarray(_solve(*p).p) for p in probs]

    stacked = [jnp.stack([jnp.asarray(p[k]) for p in probs]) for k in range(7)]
    w = jnp.full((B, m), 1e8)
    batched = jax.vmap(lambda Q, c, A, rl, ru, lb, ub, w: solve_qp(
        Q, c, A, rl, ru, lb, ub, w
    ))(*stacked, w)
    for i in range(B):
        np.testing.assert_allclose(np.asarray(batched.p[i]), singles[i], atol=1e-7)


def test_mixed_precision_kkt():
    """float32 factorization + iterative refinement reaches ~f64 accuracy."""
    rng = np.random.default_rng(21)
    Q, c, A, rl, ru, lb, ub = _random_qp(rng, 8, 5)
    base = _solve(Q, c, A, rl, ru, lb, ub)
    mixed = _solve(
        Q, c, A, rl, ru, lb, ub,
        opts=IpmOptions(factor_dtype="float32", ir_steps=3, tol=1e-9),
    )
    assert bool(mixed.converged)
    np.testing.assert_allclose(mixed.p, base.p, atol=5e-5)
