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

import jax.numpy as jnp

from jax import Array


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
    stat = df + jac.T @ lam + mult_x_U - mult_x_L
    res = jnp.max(jnp.abs(stat), initial=0.0)
    row_norms = jnp.sqrt(jnp.sum(jac * jac, axis=1))
    scalar = jnp.maximum(1.0, jnp.max(jnp.abs(df), initial=0.0))
    scalar = jnp.maximum(scalar, jnp.max(jnp.abs(mult_x_U), initial=0.0))
    scalar = jnp.maximum(scalar, jnp.max(jnp.abs(mult_x_L), initial=0.0))
    scalar = jnp.maximum(scalar, jnp.max(jnp.abs(lam) * row_norms, initial=0.0))
    return res / scalar


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
