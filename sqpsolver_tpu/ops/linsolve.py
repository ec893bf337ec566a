"""Dense SPD linear solves with regularization and mixed-precision refinement.

This is the innermost compute of the framework: every interior-point iteration
of the QP subproblem solver factorizes one condensed KKT matrix

    M = Q + D_p + A^T diag(E^-1) A + delta * I      (n x n, symmetric)

and back-solves two right-hand sides (Mehrotra predictor + corrector).  The
reference outsources this to Ipopt/ma57 inside the external QP solver
(``/root/reference/examples/acopf/opf.jl:59-64``); here it is in-framework and
TPU-shaped:

* factorization and triangular solves are XLA ``cholesky`` /
  ``triangular_solve`` — batched and MXU-tiled by the compiler; a Pallas
  block factorization can be slotted in behind the same interface.
* *inertia correction without an inertia-revealing factorization* (SURVEY hard
  part #1): the Lagrangian Hessian Q may be indefinite, so we probe Cholesky
  and escalate a primal regularization ``delta`` until the factorization
  succeeds (NaN-free) — a jittable ``lax.while_loop``, vmap-safe.
* optional mixed precision: factorize in float32 (MXU speed), then recover
  float64-grade accuracy with a few sweeps of iterative refinement — the
  TPU-native answer to the float64-on-TPU policy question (SURVEY hard part #4).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

#: multiplicative ladder for the inertia-correction regularization
_REG_GROWTH = 100.0
_REG_MAX_TRIES = 10


class Factorization(NamedTuple):
    """Cholesky factor bundle (possibly lower precision) + metadata."""

    chol: Array  # lower-triangular factor, in factorization dtype
    matrix: Array  # regularized matrix in compute dtype (for refinement)
    delta: Array  # regularization actually applied (scalar)
    ok: Array  # bool: factorization succeeded within the ladder
    #: Jacobi equilibration vector d (chol factors d M d, unit diagonal);
    #: None = unscaled.  Solves and refinement go through the scaling.
    scale: Array | None = None
    #: explicit L^-1 (factor dtype); when present every back-solve becomes
    #: two (batched) matmuls instead of latency-bound triangular solves —
    #: on TPU a vector-RHS triangular solve is ~10x slower than the matvec,
    #: while this chip's f64 matmuls run near f32 speed (~20 TFLOP/s
    #: measured), so the direct-f64 path gains as much as the f32 one.
    inv_chol: Array | None = None


def _chol_ok(L: Array) -> Array:
    return jnp.all(jnp.isfinite(L))


@jax.custom_batching.custom_vmap
def _chol_pallas(A: Array) -> Array:
    """Cholesky through the Pallas-blocked path, single-matrix semantics.

    The custom vmap rule is the point: the SQP/IPM stack batches instances
    with ``jax.vmap``, and this routes the WHOLE batch into one
    :func:`sqpsolver_tpu.ops.chol_blocked.cholesky_blocked` call — panel
    matmuls stay batched MXU work and the sequential 128x128 diagonal-block
    factorization runs as one fused Pallas kernel across all lanes.  On
    non-TPU backends (tests) the kernel runs in interpreter mode.
    """
    from .chol_blocked import cholesky_blocked

    interp = jax.default_backend() not in ("tpu", "axon")
    return cholesky_blocked(A[None], interpret=interp)[0]


@_chol_pallas.def_vmap
def _chol_pallas_vmap(axis_size, in_batched, A):
    from .chol_blocked import cholesky_blocked

    (a_batched,) = in_batched
    if not a_batched:
        A = jnp.broadcast_to(A, (axis_size,) + A.shape)
    interp = jax.default_backend() not in ("tpu", "axon")
    if A.ndim > 3:  # nested vmap: flatten to one batch axis
        lead = A.shape[:-2]
        L = cholesky_blocked(
            A.reshape((-1,) + A.shape[-2:]), interpret=interp
        ).reshape(lead + A.shape[-2:])
        return L, True
    return cholesky_blocked(A, interpret=interp), True


def factorize_spd(
    M: Array,
    delta0: Array | float = 0.0,
    *,
    factor_dtype=None,
    backend: str = "xla",
    min_pivot: float = 0.0,
    equilibrate: bool = False,
    invert: bool = False,
) -> Factorization:
    """Cholesky-factorize ``M + delta I`` with escalating ``delta``.

    ``delta`` starts at ``delta0`` (pass the previous iteration's value to warm
    start the ladder) and multiplies by ``_REG_GROWTH`` until the factor is
    NaN-free.  This is the regularized/condensed-KKT stability strategy that
    replaces sparse-LDL' pivoting (pivoting is hostile to fixed-shape TPU
    code; a diagonal shift is branch-free and batchable).

    ``min_pivot > 0`` additionally escalates when the smallest Cholesky pivot
    falls below it — on an *equilibrated* (unit-diagonal) matrix a tiny pivot
    means the matrix is numerically singular at the factor's precision: the
    factorization "succeeds" NaN-free but back-solves amplify noise and the
    mixed-precision refinement diverges.  Pass ~1e-3 for float32 factors of
    equilibrated KKT matrices; leave 0 for full-precision factors.

    ``backend``: "xla" (default) or "pallas" — the blocked factorization
    (:mod:`sqpsolver_tpu.ops.chol_blocked`, float32) with a custom vmap rule
    that collapses a vmapped batch into one fused call.  Measured on v5e the
    two are within ~10%% of each other (XLA's batched cholesky is already
    near its practical bound); "pallas" exists as the tunable alternative,
    "xla" stays the default.

    ``equilibrate=True`` factors the Jacobi-scaled  Ms = d M d  (unit
    diagonal, d = 1/sqrt(|diag M|)) instead of M.  A barrier KKT matrix's
    ill-conditioning lives mostly in its diagonal (entries spanning ~1/mu);
    the symmetric unit-diagonal scaling cuts the condition number the f32
    factor sees by orders of magnitude — without it, f32-factorized cold
    starts on heavily infeasible instances sit on a rounding knife-edge
    (observed: the same case30 first QP succeeds or fails with the XLA:CPU
    thread count).  The regularization then acts RELATIVELY
    (``M + delta diag|M|``), which is also scale-free.  Pass ``min_pivot``
    ~1e-3 with it for f32 factors.
    """
    n = M.shape[-1]
    dtype = M.dtype
    fdtype = factor_dtype or dtype
    eye = jnp.eye(n, dtype=dtype)

    scale = None
    reg_diag = eye
    if equilibrate:
        dvec = jnp.maximum(jnp.abs(jnp.diagonal(M)), 1e-30)
        scale = lax.rsqrt(dvec)
        M_eff = M * scale[:, None] * scale[None, :]
        reg_diag = jnp.diag(dvec)  # delta on Ms == delta*diag|M| on M
    else:
        M_eff = M

    # floor for the first nonzero delta, scaled to the (effective) matrix
    diag_scale = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(M_eff)), initial=0.0), 1.0
    )
    delta_floor = diag_scale * jnp.asarray(1e-12, dtype)

    delta0 = jnp.asarray(delta0, dtype)

    if backend == "pallas":
        _chol = _chol_pallas
    else:

        def _chol(A):
            return jnp.linalg.cholesky(A)

    def attempt(delta):
        L = _chol((M_eff + delta * eye).astype(fdtype))
        ok = _chol_ok(L)
        if min_pivot > 0.0:
            piv = jnp.min(jnp.diagonal(L, axis1=-2, axis2=-1), initial=jnp.inf)
            ok = jnp.logical_and(ok, piv > min_pivot)
        return L, ok

    L0, ok0 = attempt(delta0)

    def cond(carry):
        _, _, ok, tries = carry
        return jnp.logical_and(~ok, tries < _REG_MAX_TRIES)

    def body(carry):
        delta, _, _, tries = carry
        new_delta = jnp.where(delta == 0.0, delta_floor, delta * _REG_GROWTH)
        L, ok = attempt(new_delta)
        return (new_delta, L, ok, tries + 1)

    delta, L, ok, tries = lax.while_loop(
        cond, body, (delta0, L0, ok0, jnp.array(0))
    )

    # Bisection refinement of the escalated delta (round 4): the coarse
    # x100 ladder overshoots the minimal inertia correction by up to 100x,
    # and an over-damped K produces steps that miss the merit model —
    # measured on case118 cold starts under the minimal-shift "ladder"
    # convexification, every lane stalled at SQP iteration 3 (status -3).
    # Four log-bisection steps tighten the bracket [delta/GROWTH, delta]
    # to ~1.8x granularity for four extra (cheap, f32) factorization
    # attempts; skipped entirely when the ladder never escalated.
    def _refine(args):
        lo, hi, L_hi = args

        def step(_, carry):
            lo, hi, L_hi = carry
            mid = jnp.sqrt(lo * hi)
            L_m, ok_m = attempt(mid)
            return (
                jnp.where(ok_m, lo, mid),
                jnp.where(ok_m, mid, hi),
                jax.tree.map(lambda a, b: jnp.where(ok_m, a, b), L_m, L_hi),
            )

        lo, hi, L_hi = lax.fori_loop(0, 4, step, (lo, hi, L_hi))
        return hi, L_hi

    escalated = jnp.logical_and(ok, tries > 0)
    delta_r, L_r = lax.cond(
        escalated,
        _refine,
        lambda args: (args[1], args[2]),
        (jnp.maximum(delta / _REG_GROWTH, delta_floor * 1e-2), delta, L),
    )
    delta = jnp.where(escalated, delta_r, delta)
    L = jax.tree.map(lambda a, b: jnp.where(escalated, a, b), L_r, L)
    return Factorization(
        chol=L, matrix=M + delta * reg_diag, delta=delta, ok=ok, scale=scale,
        inv_chol=tri_inv(L) if invert else None,
    )


def tri_inv(L: Array) -> Array:
    """Explicit inverse of a (possibly batched) lower-triangular factor via
    the 128-blocked product-doubling algorithm (ops.chol_blocked
    tri_inv_blocked) — matmuls only.  XLA's ``triangular_solve`` runs a
    per-lane substitution loop that costs a flat ~35-50 ms per call on the
    v5e REGARDLESS of dtype or right-hand-side count (measured round 4,
    (8,344,344)); the doubling inverse is ~log2(n) rounds of batched MXU
    matmuls, and back-solves then become matvecs x = L^-T (L^-1 b)."""
    from .chol_blocked import tri_inv_blocked

    lead = L.shape[:-2]
    m = L.shape[-1]
    if m == 0:  # degenerate empty system (e.g. an empty stiff set)
        return L
    X = tri_inv_blocked(L.reshape((-1, m, m)))
    return X.reshape(lead + (m, m))


def _cho_solve(L: Array, b: Array) -> Array:
    """Triangular solve pair in the factor's dtype."""
    b = b.astype(L.dtype)
    y = lax.linalg.triangular_solve(
        L, b, left_side=True, lower=True, transpose_a=False
    )
    return lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )


def _apply_inverse(fact: Factorization, b: Array) -> Array:
    """(M + delta R)^-1 b through the factor, honoring the equilibration:
    the factor holds chol(d M d + delta I), so M^-1 b = d Ls^-T Ls^-1 (d b)."""
    if fact.inv_chol is not None:
        Li = fact.inv_chol

        def core(v):
            v = v.astype(Li.dtype)
            return Li.T @ (Li @ v)

    else:

        def core(v):
            return _cho_solve(fact.chol, v)

    if fact.scale is None:
        return core(b)
    d = fact.scale
    if b.ndim == 2:
        return d[:, None] * core(d[:, None] * b)
    return d * core(d * b)


@partial(jax.jit, static_argnames=("ir_steps",))
def solve_factorized(fact: Factorization, b: Array, ir_steps: int = 0) -> Array:
    """Solve ``(M + delta R) x = b`` from a prepared factorization
    (R = I, or diag|M| when equilibrated — see ``factorize_spd``).

    With ``ir_steps > 0`` (mixed-precision mode) the triangular solves run in
    the factor dtype (float32) and each refinement sweep computes the residual
    in the compute dtype, recovering ~compute-dtype accuracy.
    """
    dtype = fact.matrix.dtype
    x = _apply_inverse(fact, b).astype(dtype)
    if fact.chol.dtype == dtype and ir_steps == 0 and fact.inv_chol is None:
        return x
    # explicit-inverse solves carry ~cond*eps extra rounding vs triangular
    # back-substitution; one residual sweep (a fast matmul) restores it
    sweeps = (
        max(ir_steps, 1)
        if (fact.chol.dtype != dtype or fact.inv_chol is not None)
        else ir_steps
    )

    def sweep(_, x):
        r = b - fact.matrix @ x
        return x + _apply_inverse(fact, r).astype(dtype)

    return lax.fori_loop(0, sweeps, sweep, x)
