"""KKT / violation / complementarity formulas.

Vectorized jax re-statements of the reference's scalar loops in
``/root/reference/src/algorithms/common.jl``.  These exact formulas define
"converged" for parity testing (SURVEY §2.3 item 10), so they are kept
term-for-term identical — only the serial loops become masked array ops.

Multiplier sign convention used throughout this framework (self-consistent;
the reference inherits JuMP/MOI's): stationarity is

    grad f + J^T lam + nu_U - nu_L = 0,      nu_U >= 0, nu_L >= 0

with ``lam_i > 0`` when row i's *upper* side is active and ``lam_i < 0`` when
the *lower* side is active (free for equality rows).  This makes the
reference's residual formula ``df + Jac' * lambda + mult_x_U - mult_x_L``
(``common.jl:17``) vanish exactly at KKT points for every bound direction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax import Array, lax


def lanczos_lmin_bound(h_mv, n: int, dtype, iters: int = 40):
    """Lower bound on ``lambda_min`` of a symmetric operator via Lanczos.

    Runs ``iters`` Lanczos steps (matvecs only — works for both dense and
    block-structured Hessians), takes the smallest Ritz value ``theta`` of
    the tridiagonal matrix and subtracts the residual term ``beta_k |s_k|``
    (the classical Kaniel-Paige bound), giving a *valid* lower bound even
    before convergence.  A plain power iteration on ``sigma I - H`` fails
    here: with the Gershgorin ``sigma`` far above the spectrum the
    convergence rate is ``1 - gap/sigma`` and 80 iterations can
    under-estimate ``|lambda_min|`` several-fold — an under-shifted
    convexification then hands the IPM a *nonconvex* QP that cannot converge
    (observed: case9/case118 lanes failing with status -3).
    """
    # deterministic GAUSSIAN start: overlap ~1/sqrt(n) with EVERY
    # eigenvector whp.  The previous near-uniform ramp start was almost
    # orthogonal (2.6e-3 overlap) to copy-antisymmetric eigenvectors of
    # replicated/symmetric problems — on a 10-copy network the "bound"
    # missed lambda_min by 2.2x (-6.7 vs -14.5), the convexification
    # under-shifted, and the QP solvers received an INDEFINITE K (the
    # regularization ladders then solved a heavily damped wrong system).
    v0 = jax.random.normal(jax.random.PRNGKey(20240819), (n,), dtype)
    v0 = v0 / jnp.linalg.norm(v0)

    def step(carry, _):
        v_prev, v, beta_prev = carry
        w = h_mv(v) - beta_prev * v_prev
        alpha = v @ w
        w = w - alpha * v
        # full reorthogonalization is overkill; one extra projection against
        # the previous two vectors curbs the worst drift
        w = w - (w @ v) * v - (w @ v_prev) * v_prev
        beta = jnp.linalg.norm(w)
        v_new = w / jnp.maximum(beta, 1e-30)
        return (v, v_new, beta), (alpha, beta)

    _, (alphas, betas) = lax.scan(
        step, (jnp.zeros((n,), dtype), v0, jnp.asarray(0.0, dtype)),
        None, length=iters,
    )
    T = (
        jnp.diag(alphas)
        + jnp.diag(betas[:-1], 1)
        + jnp.diag(betas[:-1], -1)
    )
    # the tiny (iters x iters) eigendecomposition runs in float32: a f64 eigh
    # is software-emulated on TPU AND is the op that faulted the axon device
    # under vmap at batch 32 (round-2 root cause, scripts/tpu_smoke.py);
    # f32 precision costs ~1e-5 relative on the bound, absorbed by the pad
    evals, evecs = jnp.linalg.eigh(T.astype(jnp.float32))
    idx = jnp.argmin(evals)
    theta = evals[idx].astype(dtype)
    resid = betas[-1] * jnp.abs(evecs[-1, idx]).astype(dtype)
    pad = 4.0e-7 * jnp.max(jnp.abs(alphas) + 2.0 * betas, initial=0.0)
    return theta - resid - pad


def constraint_violation(E: Array, g_l: Array, g_u: Array) -> Array:
    """Per-row constraint violation max(E - g_u, g_l - E, 0)
    (reference common.jl:62-68)."""
    return jnp.maximum(jnp.maximum(E - g_u, g_l - E), 0.0)


def bound_violation(x: Array, x_l: Array, x_u: Array) -> Array:
    """Per-variable bound violation (reference common.jl:69-75)."""
    return jnp.maximum(jnp.maximum(x - x_u, x_l - x), 0.0)


def norm_violations(
    E: Array,
    g_l: Array,
    g_u: Array,
    x: Array,
    x_l: Array,
    x_u: Array,
    ord: float = jnp.inf,
) -> Array:
    """p-norm of stacked constraint + bound violations
    (reference common.jl:54-77; the SQP loop uses ord=1, sqp.jl:124)."""
    viol = jnp.concatenate(
        [constraint_violation(E, g_l, g_u), bound_violation(x, x_l, x_u)]
    )
    if ord == 1:
        return jnp.sum(viol)
    if ord == jnp.inf:
        return jnp.max(viol, initial=0.0)
    return jnp.linalg.norm(viol, ord=ord)


def kt_residuals_from_parts(
    df: Array,
    lam: Array,
    mult_x_U: Array,
    mult_x_L: Array,
    jt_lam: Array,
    row_norms: Array,
) -> Array:
    """:func:`kt_residuals` from precomputed ``J^T lam`` and per-row norms —
    shared by the dense path and the block-structured path (which never
    materializes a dense Jacobian)."""
    stat = df + jt_lam + mult_x_U - mult_x_L
    res = jnp.max(jnp.abs(stat), initial=0.0)
    scalar = jnp.maximum(1.0, jnp.max(jnp.abs(df), initial=0.0))
    scalar = jnp.maximum(scalar, jnp.max(jnp.abs(mult_x_U), initial=0.0))
    scalar = jnp.maximum(scalar, jnp.max(jnp.abs(mult_x_L), initial=0.0))
    scalar = jnp.maximum(scalar, jnp.max(jnp.abs(lam) * row_norms, initial=0.0))
    return res / scalar


def kt_residuals(
    df: Array,
    lam: Array,
    mult_x_U: Array,
    mult_x_L: Array,
    jac: Array,
) -> Array:
    """Normalized Kuhn-Tucker residual (reference common.jl:14-23):

        || df + J^T lam + nu_U - nu_L ||_inf
        -------------------------------------------------------------
        max(1, ||df||_inf, ||nu_U||_inf, ||nu_L||_inf, max_i |lam_i| * ||J_i||_2)
    """
    row_norms = jnp.sqrt(jnp.sum(jac * jac, axis=1))
    return kt_residuals_from_parts(
        df, lam, mult_x_U, mult_x_L, jac.T @ lam, row_norms
    )


def norm_complementarity(
    E: Array,
    g_l: Array,
    g_u: Array,
    lam: Array,
    ord: float = jnp.inf,
) -> Array:
    """Normalized complementarity (reference common.jl:30-47): equality rows
    contribute zero; inequality rows contribute
    ``min(E - g_l, g_u - E) * lam``, normalized by ``1 + ||lam_ineq||_2``."""
    is_eq = g_l == g_u
    compl = jnp.where(is_eq, 0.0, jnp.minimum(E - g_l, g_u - E) * lam)
    denom = jnp.sqrt(jnp.sum(jnp.where(is_eq, 0.0, lam * lam)))
    if ord == jnp.inf:
        num = jnp.max(jnp.abs(compl), initial=0.0)
    else:
        num = jnp.linalg.norm(compl, ord=ord)
    return num / (1.0 + denom)


def schur_cap_for(params, nlp) -> int:
    """Resolve Parameters.schur_cap into a concrete IpmOptions.schur_cap.

    The bounded Schur set (qp_ipm.IpmOptions.schur_cap) is only compiled in
    for the dense float32-factorized fast path, and only when it shrinks the
    (m, m) Schur factorization meaningfully: cap = static equality count +
    headroom for active inequalities (at least 32 rows, at least a quarter
    of the inequality rows), rounded up to a lane-friendly multiple of 8.
    The strict-tolerance direct f64 path stays uncapped — the bounded-
    condensation floor (invE_floor ~ 3e-7) would block 1e-10 QP residuals.
    """
    m = nlp.m
    if (
        params.schur_cap == 0
        or params.kkt_structured
        or not params.kkt_precision.startswith("mixed")
        or m == 0
    ):
        return 0
    if params.schur_cap > 0:
        return min(params.schur_cap, m)
    import numpy as _np

    m_eq = int(
        _np.sum(
            _np.broadcast_to(_np.asarray(nlp.g_l), (m,))
            == _np.broadcast_to(_np.asarray(nlp.g_u), (m,))
        )
    )
    cap = m_eq + max(32, (m - m_eq + 3) // 4)
    cap = min(m, ((cap + 7) // 8) * 8)
    return cap if cap <= int(0.75 * m) else 0
