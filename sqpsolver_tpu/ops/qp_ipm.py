"""Elastic primal-dual interior-point QP solver (Mehrotra predictor-corrector).

This module is the in-framework replacement for the reference's L0/L1 layers —
the external Ipopt call behind ``sub_optimize!`` and friends
(``/root/reference/src/algorithms/subproblem_JuMP.jl``).  One branch-free,
jit/vmap/pjit-safe kernel covers every QP flavor the reference builds:

Canonical *elastic* form (the canonical form of
``/root/reference/src/algorithms/subproblem.jl:3-11`` with per-row elastic
weights):

    min_{p,u,v}  1/2 p'Qp + c'p + w'(u + v)
    s.t.         A p + u - v = s,   rl <= s <= ru        (row constraints)
                 lb <= p <= ub                            (box, incl. TR)
                 u >= 0, v >= 0                           (elastic slacks)

* **Normal QP** (``sub_optimize!``, subproblem_JuMP.jl:127-183): ``w = W_BIG``
  on every row.  If the hard QP is feasible the elastic slacks converge to
  ~mu/W (zero in the limit) and primal/dual solutions match the hard QP; if it
  is infeasible the slack mass stays positive — that is the infeasibility
  signal that triggers feasibility restoration (the reference gets it from the
  external solver's INFEASIBLE status, sqp_trust_region.jl:151).
* **Feasibility restoration QP** (``sub_optimize_FR!``,
  subproblem_JuMP.jl:352-393): ``Q=0, c=0``; ``w=1`` on the *violated
  nonlinear* rows (whose slacks the reference frees), ``W_BIG`` elsewhere.
* **Elastic L1QP** (``sub_optimize_L1QP!``, subproblem_JuMP.jl:283-347):
  ``w = mu`` on nonlinear rows.
* **Initial projection LP/QP** (``sub_optimize_lp``,
  subproblem_JuMP.jl:185-244): ``Q = 2I, c = -2 x_k`` over the linear rows.

The elastic variables make every row's elasticity
``E_i = u/zeta_u + v/zeta_v (+ 1/Ds) > 0``, so the Newton system always
admits the hybrid stiff/soft factorization (see the body): soft rows (large
E) condense into the primal block K = Q + D_p + A_s' E_s^-1 A_s, stiff rows
(equalities / active constraints) solve through the SPD Schur complement
S = A_t K^-1 A_t' + diag(E_t) — both factors stay well-conditioned across
the whole barrier path, and the Cholesky probe in
:mod:`sqpsolver_tpu.ops.linsolve` handles indefinite Q.

Multiplier conventions (see :mod:`sqpsolver_tpu.algorithms.common`): the
equality multiplier ``y`` of ``Ap + u - v - s = 0`` *is* the row multiplier
``lambda`` (stationarity in s gives ``y = lambda_u - lambda_l``), and the box
duals ``zl, zu >= 0`` are the reduced costs ``mult_x_L`` / ``mult_x_U`` —
the sign-split the reference performs on JuMP reduced costs
(subproblem_JuMP.jl:543-550) falls out of the formulation here.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .linsolve import (
    _cho_solve as _cho_solve_tri,
    factorize_spd,
    solve_factorized,
    tri_inv,
)

Array = jax.Array

_BIG = 1e20  # stand-in for +inf inside masked arithmetic

#: the mixed-precision floor: below this QP tolerance a float32-factorized
#: KKT solve stops converging (cond(K) ~ 1/mu exceeds 1/eps_f32), and the
#: "mixed_polish" second phase with direct factorizations takes over
_POLISH_FLOOR = 2.0e-6


class QpSolution(NamedTuple):
    """Solution bundle of one elastic QP solve."""

    p: Array  # primal step, (n,)
    y: Array  # row multipliers lambda (our convention), (m,)
    mult_lo: Array  # lower-bound duals zl >= 0  -> mult_x_L, (n,)
    mult_up: Array  # upper-bound duals zu >= 0  -> mult_x_U, (n,)
    slack_u: Array  # elastic up slacks, (m,)
    slack_v: Array  # elastic down slacks, (m,)
    iters: Array  # interior-point iterations taken (scalar int)
    converged: Array  # bool
    pri_res: Array  # final scaled primal residual
    dual_res: Array  # final scaled dual residual
    gap: Array  # final mean complementarity


@dataclasses.dataclass(frozen=True)
class IpmOptions:
    max_iter: int = 50
    tol: float = 1.0e-10
    ftb: float = 0.995  # fraction-to-boundary
    fixed_var_ridge: float = 1.0e10  # penalty pinning fixed variables (lb==ub)
    factor_dtype: str = "same"  # "same" or "float32" (mixed-precision KKT)
    ir_steps: int = 2  # refinement sweeps when factor_dtype != compute dtype
    kkt_backend: str = "xla"  # "xla" | "pallas" (ops.chol_blocked)
    plane: bool = False  # f32 matrix-plane solves (block-level refinement)
    #: replace triangular back-solves by explicit inverse-factor matvecs in
    #: the f32 plane.  A vector-RHS triangular solve is latency-bound on TPU
    #: (~0.4 ms for a batched (16,294,294) solve); with L^-1 formed once per
    #: factorization (one n-RHS solve) every subsequent back-solve is a
    #: batched matvec (~10x faster).  The f64 block-level refinement absorbs
    #: the slightly larger rounding error of the explicit inverse.
    invert_factors: bool = True
    #: stop when the best iterate has not improved for this many consecutive
    #: iterations (0 = off).  At the mixed-precision floor a lane's QP can
    #: sit at its best-attainable residual for the rest of ``max_iter`` —
    #: under vmap every lane then pays those trips (max-over-lanes).  The
    #: best-iterate snapshot is returned either way, so stopping early is
    #: safe; this is the difference between ~10 and ~30 IPM trips per outer
    #: iteration on batched case118.
    stall_iters: int = 6
    #: bounded condensation (dual regularization): rows folded into K use
    #: 1/max(E, invE_floor).  The structured (BBD) backend folds *active*
    #: inequality rows (its Schur set is the static equality rows only);
    #: unbounded 1/E there amplifies solve error into the recovered duals.
    #: A small floor bounds the amplification at the cost of an O(floor)
    #: inexactness the IPM absorbs.  0 = exact condensation (dense default).
    invE_floor: float = 0.0
    #: float64 second phase: run the float32-factorized loop first, then
    #: CONTINUE the same interior-point iteration with direct compute-dtype
    #: factorizations for at most this many extra iterations.  Two uses, one
    #: mechanism:
    #:
    #: * strict tolerances (kkt_precision="mixed_polish", tol below the
    #:   ~2e-6 mixed-precision floor — cond(K) grows like 1/mu on the
    #:   barrier path, and once it exceeds 1/eps_f32 ~ 1e7 the f32 factor
    #:   stops being a contraction for iterative refinement): phase 1 stops
    #:   at the floor, phase 2 closes the gap to tol.  Only the last ~2-4
    #:   iterations pay f64-emulation cost.
    #: * stall rescue (any tolerance): a lane whose f32 phase exits
    #:   unconverged — a barrier/high-penalty KKT system past f32's
    #:   conditioning range — continues with exact factors instead of
    #:   failing.  Lanes that converged in phase 1 take ZERO phase-2 trips,
    #:   so the rescue costs nothing on the happy path (under vmap the
    #:   batched loop exits at trip 0 when no lane needs it).
    #:
    #: 0 = off (single-phase).  Dense backend only.
    polish_iters: int = 0
    #: static cap on the Schur (stiff) set size.  The hybrid split sends
    #: every small-E row (equalities + active constraints) through the dense
    #: Schur complement S — an (m, m) factorization even when only a fraction
    #: of rows are ever stiff.  With ``schur_cap = c`` in (0, m) the body
    #: keeps only the c *stiffest* rows (smallest E — equalities sort first
    #: by construction) on the Schur path, folds the overflow into K via the
    #: bounded 1/max(E, invE_floor), and ``DenseOp`` gathers the survivors
    #: into a compact (c, n) block so S is (c, c).  At ACOPF scale (m ~ 2n,
    #: equalities ~ m/2, few active inequalities) this cuts the dominant
    #: factorization's FLOPs ~6-8x.  Requires ``invE_floor > 0``.
    #: 0 = uncapped (classic full hybrid).
    schur_cap: int = 0

    def __hash__(self):
        return hash(
            (self.max_iter, self.tol, self.ftb, self.fixed_var_ridge,
             self.factor_dtype, self.ir_steps, self.kkt_backend, self.plane,
             self.invert_factors, self.invE_floor, self.stall_iters,
             self.polish_iters, self.schur_cap)
        )


class DenseOp:
    """Dense linear-algebra backend of the elastic IPM (the original path).

    The IPM body is written against an abstract operator interface —
    ``q_mv``/``a_mv``/``a_rmv`` matvecs, a static ``stiff_allowed`` row mask,
    and ``prepare`` which assembles + factors the condensed KKT system and
    returns the 2x2 block solver.  ``DenseOp`` implements it with explicit
    (n, n)/(m, n) matrices; :class:`sqpsolver_tpu.ops.kkt_bbd.BbdOperator`
    implements the same interface with bordered-block-diagonal structure for
    large instances.  ONE IPM, two linear-algebra backends — this preserves
    the architecture invariant that QP *flavors* (normal/FR/L1/projection)
    never fork the solver.
    """

    def __init__(self, Q, A, opts, dtype):
        self.Q = Q
        self.A = A
        self.opts = opts
        self.dtype = dtype
        self.mixed_plane = opts.factor_dtype == "float32" and opts.plane
        self.fdtype = jnp.float32 if opts.factor_dtype == "float32" else dtype
        self.ir_steps = opts.ir_steps if opts.factor_dtype == "float32" else 0
        if self.mixed_plane:
            self.Q32 = Q.astype(jnp.float32)
            self.A32 = A.astype(jnp.float32)

    def q_mv(self, x):
        return self.Q @ x

    def a_mv(self, x):
        return self.A @ x

    def a_rmv(self, y):
        return self.A.T @ y

    def stiff_allowed(self):
        return jnp.ones((self.A.shape[0],), bool)

    def rescue_op(self, keep_cap: bool = False):
        """Full-precision twin for the f64 phase-2 loop: direct factors, no
        f32 plane.  ``keep_cap=True`` (the STALL-RESCUE use) retains the
        bounded Schur set: an uncapped rescue factors a dense (m, m) system
        in emulated f64 — at case118 b16 that is seconds per IPM trip and a
        rescue-heavy chunk crosses the 60 s execution watchdog.  The
        strict-tolerance mixed_polish phase lifts the cap (False) so
        nothing blocks 1e-8-grade dual accuracy."""
        return DenseOp(
            self.Q, self.A,
            dataclasses.replace(
                self.opts, factor_dtype="same", plane=False,
                schur_cap=self.opts.schur_cap if keep_cap else 0,
            ),
            self.dtype,
        )

    def cap_stiff(self, stiff, E, cap):
        """Bounded Schur set (IpmOptions.schur_cap): keep the ``cap``
        globally stiffest rows (smallest E — equalities first by
        construction).  The rank is computed by double-argsort (O(m log m),
        trivial next to the factorizations); ties break by row index, so the
        selection is deterministic and matches prepare()'s gather."""
        m = self.A.shape[0]
        if not 0 < cap < m:
            return stiff
        # non-finite guard: an extreme lane can push a row elasticity E to
        # inf/nan transiently; the axon sort/top_k kernels FAULT THE DEVICE
        # on non-finite keys (round-4 isolation, scripts/op_probe.py), so
        # poisoned entries are routed to the fold-into-K path instead
        key = jnp.where(jnp.logical_and(stiff, jnp.isfinite(E)), E, _BIG)
        rank = jnp.zeros((m,), jnp.int32).at[
            jnp.argsort(key, stable=True)
        ].set(jnp.arange(m, dtype=jnp.int32))
        return jnp.logical_and(stiff, rank < cap)

    def prepare(self, diag_k, invE_soft, stiff, E_stiff, delta0):
        """Assemble/factor  K = Q + diag(diag_k) + A' diag(invE) A  and the
        stiff Schur complement  S = A_t K^-1 A_t' + diag(E_t); return
        ``(solve_block, delta)``.

        ``diag_k`` = fixed-variable ridge + barrier diagonal Dp."""
        opts = self.opts
        dtype = self.dtype
        Q, A = self.Q, self.A
        A_stiff = jnp.where(stiff[:, None], A, 0.0)

        if self.mixed_plane:
            # f32 matrix plane: ALL matrix work — assembly matmuls,
            # factorizations, back-solves — in float32 on the MXU; the wider
            # dtype appears only in vectors and block-level refinement
            # residuals (cheap matvecs).
            #
            # Jacobi equilibration: a barrier KKT matrix's ill-conditioning
            # lives mostly in its diagonal (entries spanning ~1/mu); the
            # symmetric scaling  Ks = D^-1/2 K D^-1/2  (unit diagonal) cuts
            # the effective condition number the f32 factorization sees by
            # orders of magnitude — without it, hard barrier iterates make
            # the f32 factor + refinement diverge (observed: case118 lanes
            # aborting with status -3).
            f32 = jnp.float32
            invE32 = invE_soft.astype(f32)
            K32 = (
                self.Q32
                + jnp.diag(diag_k.astype(f32))
                + (self.A32.T * invE32) @ self.A32
            )
            diagK = jnp.maximum(jnp.abs(jnp.diagonal(K32)), 1e-30)
            dK = jax.lax.rsqrt(diagK)
            K32s = K32 * dK[:, None] * dK[None, :]
            fact_K = factorize_spd(
                K32s, delta0.astype(f32), backend=opts.kkt_backend,
                min_pivot=1e-3,
            )
            if opts.invert_factors:
                LKi = tri_inv(fact_K.chol)

                def solve_Ks(b):
                    return LKi.T @ (LKi @ b)

            else:

                def solve_Ks(b):
                    return _cho_solve_tri(fact_K.chol, b)

            def solve_K32(b):
                # unscale: K^-1 b = D^-1/2 Ks^-1 D^-1/2 b
                if b.ndim == 1:
                    return dK * solve_Ks(dK * b)
                return dK[:, None] * solve_Ks(dK[:, None] * b)

            m_rows = A.shape[0]
            cap = opts.schur_cap
            if 0 < cap < m_rows:
                # bounded Schur set (IpmOptions.schur_cap): gather the capped
                # stiff rows into a compact (cap, n) block — S becomes
                # (cap, cap) instead of (m, m); overflow rows were already
                # folded into K by the IPM body.  Unused slots carry a zero
                # A-row and unit diagonal (dy stays 0 there: stiff-masked rhs).
                idx = jnp.argsort(~stiff, stable=True)[:cap]
                sel = stiff[idx]
                A_st32 = jnp.where(sel[:, None], self.A32[idx], 0.0)
                E_s32 = jnp.where(sel, E_stiff[idx], 1.0).astype(f32)

                def r2_pick(r2):
                    return jnp.where(sel, r2[idx], 0.0)

                def dy_unpick(dy):
                    return (
                        jnp.zeros((m_rows,), dy.dtype)
                        .at[idx]
                        .add(jnp.where(sel, dy, 0.0))
                    )

            else:
                A_st32 = jnp.where(stiff[:, None], self.A32, 0.0)
                E_s32 = E_stiff.astype(f32)

                def r2_pick(r2):
                    return r2

                def dy_unpick(dy):
                    return dy

            KiAt32 = solve_K32(A_st32.T)
            S32 = A_st32 @ KiAt32 + jnp.diag(E_s32)
            dS = jax.lax.rsqrt(
                jnp.maximum(jnp.abs(jnp.diagonal(S32)), 1e-30)
            )
            S32s = S32 * dS[:, None] * dS[None, :]
            fact_S = factorize_spd(
                S32s, jnp.zeros((), f32), backend=opts.kkt_backend,
                min_pivot=1e-3,
            )
            if opts.invert_factors:
                LSi = tri_inv(fact_S.chol)

                def solve_Ss(b):
                    return LSi.T @ (LSi @ b)

            else:

                def solve_Ss(b):
                    return _cho_solve_tri(fact_S.chol, b)

            def solve_S32(b):
                if b.ndim == 1:
                    return dS * solve_Ss(dS * b)
                return dS[:, None] * solve_Ss(dS[:, None] * b)

            delta64 = fact_K.delta.astype(dtype)
            # the ladder's delta was added to the EQUILIBRATED (unit-diagonal)
            # matrix, i.e. K + delta * diag(K) in unscaled units — the
            # refinement target must match exactly or the sweeps diverge
            # whenever delta escalates
            delta_row = delta64 * diagK.astype(dtype)

            def K_mv(x):
                # exact (K + delta diag(K)) @ x in the compute dtype
                return (
                    Q @ x
                    + (diag_k + delta_row) * x
                    + A.T @ (invE_soft * (A @ x))
                )

            def approx_block(r1_t, r2_t):
                t1 = solve_K32(r1_t.astype(f32))
                b = A_st32 @ t1 - r2_pick(r2_t).astype(f32)
                dy = solve_S32(b)
                dp = t1 - KiAt32 @ dy
                return dp.astype(dtype), dy_unpick(dy).astype(dtype)

            def solve_block(r1_t, r2_t):
                """Solve [K+dI, A_t'; A_t, -E_t] (dp; dy_t) = (r1_t; r2_t)
                with f32 factors + compute-dtype residual refinement.
                The sweeps are a rolled fori_loop: one traced copy of the
                refinement body instead of ir_steps copies (compile size)."""

                def sweep(_, carry):
                    dp, dy = carry
                    res1 = r1_t - (K_mv(dp) + A_stiff.T @ dy)
                    res2 = r2_t - (A_stiff @ dp - E_stiff * dy)
                    ddp, ddy = approx_block(res1, res2)
                    return (dp + ddp, dy + ddy)

                dp, dy = lax.fori_loop(
                    0, max(1, self.ir_steps), sweep,
                    approx_block(r1_t, r2_t),
                )
                return dp, dy

            return solve_block, delta64

        K = Q + jnp.diag(diag_k) + (A.T * invE_soft) @ A
        # f32 factors get Jacobi equilibration + pivot probe (linsolve
        # docstring: without it, cold-start barrier systems sit on a
        # rounding knife-edge); f64 factors stay untouched.  Explicit
        # inverse factors (opts.invert_factors): back-solves become matmuls
        # — latency-bound triangular solves were the dominant per-trip cost
        # on TPU, and this chip's f64 matmuls run near f32 speed.
        mixed = self.fdtype != dtype
        inv = bool(opts.invert_factors)
        fact_K = factorize_spd(
            K, delta0, factor_dtype=self.fdtype, backend=opts.kkt_backend,
            equilibrate=mixed, min_pivot=1e-3 if mixed else 0.0, invert=inv,
        )
        m = A.shape[0]
        cap = opts.schur_cap
        if 0 < cap < m:
            # bounded Schur set (IpmOptions.schur_cap): the body capped
            # ``stiff`` to at most ``cap`` rows — gather them into a compact
            # (cap, n) block so S is (cap, cap) instead of (m, m).  Unused
            # slots carry a zero A-row and unit diagonal; their dy is zero
            # because the rhs is stiff-masked.
            idx = jnp.argsort(~stiff, stable=True)[:cap]
            sel = stiff[idx]
            A_sel = jnp.where(sel[:, None], A[idx], 0.0)
            E_sel = jnp.where(sel, E_stiff[idx], 1.0)
            KiAt = solve_factorized(fact_K, A_sel.T, ir_steps=self.ir_steps)
            S = A_sel @ KiAt + jnp.diag(E_sel)
            fact_S = factorize_spd(
                S, jnp.zeros((), dtype), factor_dtype=self.fdtype,
                backend=opts.kkt_backend,
                equilibrate=mixed, min_pivot=1e-3 if mixed else 0.0,
                invert=inv,
            )

            def solve_block(r1_t, r2_t):
                t1 = solve_factorized(fact_K, r1_t, ir_steps=self.ir_steps)
                b_t = A_sel @ t1 - jnp.where(sel, r2_t[idx], 0.0)
                dy_sel = solve_factorized(fact_S, b_t, ir_steps=self.ir_steps)
                dp = t1 - KiAt @ dy_sel
                dy_t = (
                    jnp.zeros((m,), dtype)
                    .at[idx]
                    .add(jnp.where(sel, dy_sel, 0.0))
                )
                return dp, dy_t

            return solve_block, fact_K.delta

        KiAt = solve_factorized(fact_K, A_stiff.T, ir_steps=self.ir_steps)
        S = A_stiff @ KiAt + jnp.diag(E_stiff)
        fact_S = factorize_spd(
            S, jnp.zeros((), dtype), factor_dtype=self.fdtype,
            backend=opts.kkt_backend,
            equilibrate=mixed, min_pivot=1e-3 if mixed else 0.0,
            invert=inv,
        )

        def solve_block(r1_t, r2_t):
            t1 = solve_factorized(fact_K, r1_t, ir_steps=self.ir_steps)
            b_t = A_stiff @ t1 - r2_t
            dy_t = solve_factorized(fact_S, b_t, ir_steps=self.ir_steps)
            dp = t1 - KiAt @ dy_t
            return dp, dy_t

        return solve_block, fact_K.delta


def _pos(x):
    return jnp.maximum(x, 0.0)


def _masked_div(num, den, mask):
    """num/den where mask else 0, safe against den==0 outside the mask."""
    safe = jnp.where(mask, den, 1.0)
    return jnp.where(mask, num / safe, 0.0)


def _ftb_alpha(a, da, mask, tau):
    """Fraction-to-boundary step: largest alpha<=1 with a + alpha*da >= (1-tau)*a
    over masked entries (standard IPM rule)."""
    shrink = jnp.logical_and(mask, da < 0)
    ratio = jnp.where(shrink, -a / jnp.where(shrink, da, -1.0), jnp.inf)
    amax = jnp.min(ratio, initial=jnp.inf)
    return jnp.minimum(1.0, tau * amax)


@partial(jax.jit, static_argnames=("opts",))
def solve_qp(
    Q: Array,
    c: Array,
    A: Array,
    rl: Array,
    ru: Array,
    lb: Array,
    ub: Array,
    w: Array,
    opts: IpmOptions = IpmOptions(),
    skip: Array | None = None,
    init: dict | None = None,
    tol_override: Array | None = None,
) -> QpSolution:
    """Solve the canonical elastic QP (module docstring) to tolerance.

    All bounds may be ``+-inf``; equality rows are ``rl == ru``; fixed
    variables ``lb == ub`` are pinned by a ridge penalty (their reduced cost is
    recovered from stationarity afterwards).  Branch-free: safe under
    ``vmap`` over problem instances and inside outer ``lax.while_loop``s.

    ``skip`` (bool scalar, traced): when True the interior-point loop exits at
    iteration 0 and the (meaningless) initial iterate is returned with
    ``converged=False, iters=0``.  This is the per-lane early-exit mechanism:
    under ``vmap``, lanes whose QP is not needed this outer iteration (done
    instances, un-triggered SOC) contribute nothing to the batched
    while_loop's trip count, so the inner loop runs only as long as the
    slowest *active* lane (VERDICT r1 weakness #3).

    ``init`` (optional warm start): dict with ``p`` (n,), ``y`` (m,),
    ``zl``/``zu`` (n,) and a traced bool ``on``.  Lanes with ``on`` start
    from the previous QP's solution — primal clipped strictly inside the
    (new, possibly shrunk) box, row duals clamped into the elastic dual box
    ``|y| < w``, bound duals floored at ``_WARM_DUAL_FLOOR`` to keep every
    complementarity pair strictly positive.  Across an SQP sequence the QP
    data changes slowly and the duals converge, so warm-started solves cut
    the Mehrotra iteration count roughly in half (the classic SQP+IPM
    warm-start result); under vmap that directly shortens the max-over-lanes
    trip count of the inner while_loop.  Lanes with ``on=False`` use the
    cold Mehrotra start, bitwise identical to ``init=None``.

    ``tol_override`` (optional traced scalar): per-solve RELAXATION of the
    convergence tolerance — the loop stops at ``max(opts.tol, tol_override)``.
    This is the inexact-SQP forcing-sequence hook: early outer iterations
    far from a KKT point only need the QP solved to a fraction of the
    current outer error, not to the final tolerance.  Never tightens below
    ``opts.tol``.
    """
    # TPU matmuls default to bfloat16 passes; the float32 matrix plane and
    # the refinement contraction both need true float32 products
    with jax.default_matmul_precision("float32"):
        return _solve_qp_impl(
            Q, c, A, rl, ru, lb, ub, w, opts, skip, init=init,
            tol_override=tol_override,
        )


def solve_qp_op(
    op,
    c: Array,
    rl: Array,
    ru: Array,
    lb: Array,
    ub: Array,
    w: Array,
    opts: IpmOptions = IpmOptions(),
    skip: Array | None = None,
    init: dict | None = None,
    tol_override: Array | None = None,
) -> QpSolution:
    """``solve_qp`` with a custom linear-algebra backend (e.g. the
    bordered-block-diagonal :class:`sqpsolver_tpu.ops.kkt_bbd.BbdOperator`)
    instead of dense (Q, A).  Same IPM, same semantics; called from already-
    traced code (the operator closes over traced arrays)."""
    with jax.default_matmul_precision("float32"):
        return _solve_qp_impl(
            None, c, None, rl, ru, lb, ub, w, opts, skip, op=op, init=init,
            tol_override=tol_override,
        )


#: floor for warm-started bound/row duals: keeps every complementarity pair
#: strictly positive (an exactly-zero dual would make its pair's barrier
#: term degenerate).  Small enough that inactive constraints start nearly
#: complementarity-satisfied (their pair product ~ box_width * floor), large
#: enough that the fraction-to-boundary rule is not crippled on the first
#: steps.
_WARM_DUAL_FLOOR = 1.0e-2


def _ipm_bundle(Q, c, A, rl, ru, lb, ub, w, opts, skip=None, op=None,
                init=None, tol_override=None):
    """Shared machinery of one elastic-QP solve: masks, the initial state,
    a (cond, body) loop factory, the phase-2 (f64 polish/rescue) entry
    transition, and the solution finalizer.

    Both execution styles are built on this ONE bundle so they are
    bit-identical by construction:

    * the monolithic ``_solve_qp_impl`` (phase-1 while_loop, then the
      phase-2 while_loop inside the same device program), and
    * the resumable micro-stepped form (``qp_micro_start`` /
      ``qp_micro_resume`` / ``qp_micro_finalize``) where the host advances
      the phase-2 loop a bounded number of trips per device call — the
      round-4 finding is that ONE rescue-storm QP (dozens of f64-emulated
      factorization trips at n~344) exceeds the axon tunnel's 60 s
      execution watchdog even at slab width 4, so the QP itself must stop
      being a watchdog-atomic unit (VERDICT r4 item 2).
    """
    # harmonize input dtypes (mixed f32/f64 inputs would otherwise promote
    # inside the while_loop and break the carry signature)
    if op is None:
        dtype = jnp.result_type(Q, c, A, rl, ru, lb, ub, w)
        Q = Q.astype(dtype)
        A = A.astype(dtype)
    else:
        dtype = jnp.result_type(op.dtype, c, rl, ru, lb, ub, w)
    c, rl, ru, lb, ub, w = (
        a.astype(dtype) for a in (c, rl, ru, lb, ub, w)
    )
    n = c.shape[0]
    m = rl.shape[0]
    tau = jnp.asarray(opts.ftb, dtype)

    # ------------------------------------------------------------- masks ----
    eq = jnp.logical_and(jnp.isfinite(rl), rl == ru)  # equality rows
    hrl = jnp.logical_and(jnp.isfinite(rl), ~eq)  # lower-bounded ineq rows
    hru = jnp.logical_and(jnp.isfinite(ru), ~eq)  # upper-bounded ineq rows
    rowbounded = jnp.logical_or(hrl, hru)
    freerow = jnp.logical_and(~eq, ~rowbounded)

    fixed = jnp.logical_and(  # degenerate variable boxes
        jnp.isfinite(lb), jnp.logical_and(jnp.isfinite(ub), ub - lb <= 1e-12)
    )
    fixval = jnp.where(fixed, 0.5 * (lb + ub), 0.0)
    # fixed vars get a fake interior box + a ridge pinning them to fixval
    lb_eff = jnp.where(fixed, fixval - 1.0, lb)
    ub_eff = jnp.where(fixed, fixval + 1.0, ub)
    hlb = jnp.isfinite(lb_eff)
    hub = jnp.isfinite(ub_eff)

    ridge = jnp.asarray(opts.fixed_var_ridge, dtype)
    ridge_vec = jnp.where(fixed, ridge, 0.0)
    cmod = c - jnp.where(fixed, ridge * fixval, 0.0)
    if op is None:
        op = DenseOp(Q, A, opts, dtype)
    allowed = op.stiff_allowed()

    def qmod_mv(x):
        return op.q_mv(x) + ridge_vec * x

    # ------------------------------------------------------- initial point --
    pad_p = jnp.where(
        jnp.logical_and(hlb, hub),
        jnp.minimum(0.25 * (ub_eff - lb_eff), 1.0),
        1.0,
    )
    p = jnp.clip(
        jnp.zeros((n,), dtype),
        jnp.where(hlb, lb_eff + pad_p, -_BIG),
        jnp.where(hub, ub_eff - pad_p, _BIG),
    )
    sl_width = jnp.where(jnp.logical_and(hrl, hru), ru - rl, jnp.inf)
    pad_s = jnp.minimum(0.25 * sl_width, 1.0)
    Ap = op.a_mv(p)
    s = jnp.clip(
        Ap,
        jnp.where(hrl, rl + pad_s, -_BIG),
        jnp.where(hru, ru - pad_s, _BIG),
    )
    s = jnp.where(eq, rl, s)

    eps_uv = 1.0 / jnp.sqrt(w)
    u = eps_uv * jnp.ones((m,), dtype)
    v = eps_uv * jnp.ones((m,), dtype)

    y = jnp.zeros((m,), dtype)
    one_n = jnp.ones((n,), dtype)
    one_m = jnp.ones((m,), dtype)
    zl = jnp.where(hlb, one_n, 0.0)
    zu = jnp.where(hub, one_n, 0.0)
    ll = jnp.where(hrl, one_m, 0.0)  # lambda_l
    lu = jnp.where(hru, one_m, 0.0)  # lambda_u
    zeta_u = w + y  # dual-feasible start for the elastic duals
    zeta_v = w - y

    # cold-start fields, kept verbatim: the float64 rescue phase (below)
    # restarts unconverged lanes from the COLD point — a warm start that led
    # the f32 phase astray must not also seed the rescue
    cold_fields = dict(
        p=p, s=s, u=u, v=v, y=y, zl=zl, zu=zu, ll=ll, lu=lu,
        zeta_u=zeta_u, zeta_v=zeta_v,
    )

    # ------------------------------------------------- warm start (opt-in) --
    if init is not None:
        on = jnp.asarray(init["on"], bool)
        zf = jnp.asarray(_WARM_DUAL_FLOOR, dtype)
        # primal: previous solution clipped strictly inside the new box
        # (after a TR shrink the old step may sit outside; a 5% pad keeps
        # the fraction-to-boundary rule alive at active bounds)
        p_w = jnp.clip(
            init["p"].astype(dtype),
            jnp.where(hlb, lb_eff + 0.05 * pad_p, -_BIG),
            jnp.where(hub, ub_eff - 0.05 * pad_p, _BIG),
        )
        p = jnp.where(on, p_w, p)
        Ap_w = op.a_mv(p)
        s_w = jnp.clip(
            Ap_w,
            jnp.where(hrl, rl + 0.05 * pad_s, -_BIG),
            jnp.where(hru, ru - 0.05 * pad_s, _BIG),
        )
        s = jnp.where(eq, rl, jnp.where(on, s_w, s))
        # row duals clamped into the elastic dual box (zeta = w -+ y > 0)
        y_w = jnp.clip(init["y"].astype(dtype), -0.99 * w, 0.99 * w)
        y = jnp.where(on, y_w, y)
        zeta_u = w + y
        zeta_v = w - y
        on_lb = jnp.logical_and(on, hlb)
        on_ub = jnp.logical_and(on, hub)
        zl_w = jnp.maximum(init["zl"].astype(dtype), zf)
        zu_w = jnp.maximum(init["zu"].astype(dtype), zf)
        # sign-split of y onto the one-sided row duals (rd_s: ll - lu = -y)
        ll_w = _pos(-y) + zf
        lu_w = _pos(y) + zf
        # centrality lift: a warm point's complementarity pairs can be
        # arbitrarily asymmetric (a stale near-zero dual against a wide-open
        # primal gap, or vice versa), which stalls Mehrotra's centering on
        # the first steps.  Lift every dual so its pair product is at least
        # a fraction of the warm point's own mean complementarity — the
        # standard primal-dual warm-start safeguard.
        a_pl_w = jnp.where(hlb, p - lb_eff, 1.0)
        a_pu_w = jnp.where(hub, ub_eff - p, 1.0)
        a_sl_w = jnp.where(hrl, s - rl, 1.0)
        a_su_w = jnp.where(hru, ru - s, 1.0)
        tot_w = (
            jnp.sum(jnp.where(hlb, a_pl_w * zl_w, 0.0))
            + jnp.sum(jnp.where(hub, a_pu_w * zu_w, 0.0))
            + jnp.sum(jnp.where(hrl, a_sl_w * ll_w, 0.0))
            + jnp.sum(jnp.where(hru, a_su_w * lu_w, 0.0))
            + jnp.sum(u * zeta_u)
            + jnp.sum(v * zeta_v)
        )
        pairs_w = jnp.maximum(
            (jnp.sum(hlb) + jnp.sum(hub) + jnp.sum(hrl) + jnp.sum(hru)
             + 2 * m).astype(dtype),
            1.0,
        )
        mu_w = tot_w / pairs_w
        lift = 0.1 * mu_w
        zl_w = jnp.maximum(zl_w, lift / a_pl_w)
        zu_w = jnp.maximum(zu_w, lift / a_pu_w)
        ll_w = jnp.maximum(ll_w, lift / a_sl_w)
        lu_w = jnp.maximum(lu_w, lift / a_su_w)
        zl = jnp.where(on_lb, zl_w, zl)
        zu = jnp.where(on_ub, zu_w, zu)
        ll = jnp.where(jnp.logical_and(on, hrl), ll_w, ll)
        lu = jnp.where(jnp.logical_and(on, hru), lu_w, lu)

    n_pairs = (
        jnp.sum(hlb) + jnp.sum(hub) + jnp.sum(hrl) + jnp.sum(hru) + 2 * m
    ).astype(dtype)
    n_pairs = jnp.maximum(n_pairs, 1.0)

    def compl_mu(p, s, u, v, zl, zu, ll, lu, zeta_u, zeta_v):
        tot = (
            jnp.sum(jnp.where(hlb, (p - lb_eff) * zl, 0.0))
            + jnp.sum(jnp.where(hub, (ub_eff - p) * zu, 0.0))
            + jnp.sum(jnp.where(hrl, (s - rl) * ll, 0.0))
            + jnp.sum(jnp.where(hru, (ru - s) * lu, 0.0))
            + jnp.sum(u * zeta_u)
            + jnp.sum(v * zeta_v)
        )
        return tot / n_pairs

    state0 = dict(
        p=p, s=s, u=u, v=v, y=y, zl=zl, zu=zu, ll=ll, lu=lu,
        zeta_u=zeta_u, zeta_v=zeta_v,
        iters=jnp.array(0, jnp.int32),
        # a skipped lane starts "converged": its while_loop trip count is 0
        converged=(
            jnp.array(False) if skip is None else jnp.asarray(skip, bool)
        ),
        failed=jnp.array(False),
        since_improve=jnp.array(0, jnp.int32),
        delta=jnp.zeros((), dtype),
        pri_res=jnp.array(jnp.inf, dtype),
        dual_res=jnp.array(jnp.inf, dtype),
        gap=jnp.array(jnp.inf, dtype),
        # best-iterate snapshot: at the precision floor the Newton systems go
        # noise-dominated and iterates can wander off a converged point; the
        # best solution seen is what gets returned
        best=dict(
            p=p, y=y, zl=zl, zu=zu, u=u, v=v,
            err=jnp.array(jnp.inf, dtype),
            pri=jnp.array(jnp.inf, dtype),
            dual=jnp.array(jnp.inf, dtype),
            gap=jnp.array(jnp.inf, dtype),
        ),
    )

    c_scale = 1.0 + jnp.max(jnp.abs(c), initial=0.0)

    def primal_objective(p, u, v):
        return 0.5 * p @ op.q_mv(p) + c @ p + w @ (u + v)

    def residuals(st):
        p, s, u, v, y = st["p"], st["s"], st["u"], st["v"], st["y"]
        rd_p = qmod_mv(p) + cmod + op.a_rmv(y) - st["zl"] + st["zu"]
        rp = op.a_mv(p) + u - v - s
        rd_s = jnp.where(rowbounded, -y - st["ll"] + st["lu"], 0.0)
        rd_u = w + y - st["zeta_u"]
        rd_v = w - y - st["zeta_v"]
        return rd_p, rp, rd_s, rd_u, rd_v

    def scaled_residuals(st):
        rd_p, rp, rd_s, rd_u, rd_v = residuals(st)
        pri = jnp.max(jnp.abs(rp), initial=0.0) / (
            1.0 + jnp.max(jnp.abs(st["s"]), initial=0.0)
        )
        dscale = c_scale + jnp.max(jnp.abs(st["y"]), initial=0.0)
        dual = (
            jnp.maximum(
                jnp.max(jnp.abs(rd_p), initial=0.0),
                jnp.maximum(
                    jnp.max(jnp.abs(rd_s), initial=0.0),
                    jnp.maximum(
                        jnp.max(jnp.abs(rd_u), initial=0.0),
                        jnp.max(jnp.abs(rd_v), initial=0.0),
                    ),
                ),
            )
            / dscale
        )
        return pri, dual

    # phase configuration read at trace time: the float64 polish phase
    # re-traces cond/body with a direct-factorization operator and the
    # strict tolerance (see IpmOptions.polish_iters)
    do_polish = (
        opts.polish_iters > 0
        and opts.factor_dtype == "float32"
        and dtype == jnp.float64
    )
    tol_p1 = jnp.asarray(
        max(opts.tol, _POLISH_FLOOR) if do_polish else opts.tol, dtype
    )
    if tol_override is not None:
        # inexact-SQP relaxation (solve_qp docstring): loosen, never tighten.
        # Phase-1 only — the polish/rescue phase keeps its strict target.
        tol_p1 = jnp.maximum(tol_p1, jnp.asarray(tol_override, dtype))

    def make_loop(op_, tol, max_iter_, cap, guard):
        """Fresh (cond, body) closures for one interior-point phase.  Fresh
        function OBJECTS per phase matter: jax caches while_loop cond/body
        jaxprs keyed on function identity, so reusing one closure across
        phases would silently replay the first phase's trace (the original
        loop_cfg-mutation bug documented below at the phase-2 call site)."""
        loop_cfg = dict(
            op=op_, tol=tol, max_iter=max_iter_, cap=cap, guard=guard
        )

        def cond_fn(st):
            return jnp.logical_and(
                jnp.logical_and(~st["converged"], ~st["failed"]),
                st["iters"] < loop_cfg["max_iter"],
            )

        def body_fn(st):
            p, s, u, v = st["p"], st["s"], st["u"], st["v"]
            y, zl, zu, ll, lu = st["y"], st["zl"], st["zu"], st["ll"], st["lu"]
            zeta_u, zeta_v = st["zeta_u"], st["zeta_v"]

            # slack distances (masked; dummy 1 outside masks)
            a_pl = jnp.where(hlb, p - lb_eff, 1.0)
            a_pu = jnp.where(hub, ub_eff - p, 1.0)
            a_sl = jnp.where(hrl, s - rl, 1.0)
            a_su = jnp.where(hru, ru - s, 1.0)

            rd_p, rp, rd_s, rd_u, rd_v = residuals(st)
            mu = compl_mu(p, s, u, v, zl, zu, ll, lu, zeta_u, zeta_v)

            # condensed matrix pieces (independent of the rhs -> factor once).
            #
            # Row elasticity E_i = u/zeta_u + v/zeta_v (+ 1/Ds for inequality
            # rows) spans ~mu/w^2 (tight equality rows) to ~1/mu (slack rows):
            # eliminating every row through 1/E_i (pure primal condensation)
            # or none (pure range space) explodes the condition number at one
            # extreme or the other.  Hybrid split: "soft" rows (large E) fold
            # into the primal block K; "stiff" rows (small E — equalities and
            # active constraints) are solved through an SPD Schur complement
            #   S = A_t K^-1 A_t' + diag(E_t),
            # whose E_t term acts as a bounded dual regularization.  Both
            # factors stay well-conditioned across the whole barrier path.
            Dp = _masked_div(zl, a_pl, hlb) + _masked_div(zu, a_pu, hub)
            Ds = _masked_div(ll, a_sl, hrl) + _masked_div(lu, a_su, hru)
            eu = u / zeta_u
            ev = v / zeta_v
            E = eu + ev + _masked_div(one_m, Ds, rowbounded)
            soft = jnp.logical_or(E > 1.0, freerow)
            # rows outside the operator's allowed set fold into K regardless of E
            stiff = jnp.logical_and(~soft, allowed)
            # bounded Schur set: the operator may shrink the stiff set to its
            # capacity (DenseOp: keep the loop_cfg["cap"] globally stiffest rows;
            # BbdOperator: per-part top-k into static part-local slots); the
            # overflow folds into K via the bounded 1/max(E, invE_floor) like
            # any soft row.  The SAME rule must produce the mask here and the
            # gathered rows inside prepare(), so capping lives on the operator.
            stiff = loop_cfg["op"].cap_stiff(stiff, E, loop_cfg["cap"])
            elim = jnp.logical_and(~stiff, ~freerow)  # fold into K via 1/E
            invE_soft = jnp.where(
                elim, 1.0 / jnp.maximum(E, opts.invE_floor), 0.0
            )
            E_stiff = jnp.where(stiff, E, 1.0)

            # --- factorization (operator backend) ------------------------------
            # DenseOp: explicit K/S assembly; mixed_plane runs every matmul/
            # factorization in float32 on the MXU with compute-dtype block-level
            # refinement.  BbdOperator: bordered-block-diagonal K + dense
            # equality Schur complement for structured large instances.
            solve_block, fact_delta = loop_cfg["op"].prepare(
                ridge_vec + Dp, invE_soft, stiff, E_stiff, st["delta"]
            )

            def newton(cc_pl, cc_pu, cc_sl, cc_su, cc_u, cc_v):
                """One Newton solve for given complementarity targets.

                cc_* are the right-hand sides of the linearized complementarity
                equations (sigma*mu - a.z - corrector term)."""
                r1 = (
                    -rd_p
                    + _masked_div(cc_pl, a_pl, hlb)
                    - _masked_div(cc_pu, a_pu, hub)
                )
                ts = (
                    -rd_s
                    + _masked_div(cc_sl, a_sl, hrl)
                    - _masked_div(cc_su, a_su, hru)
                )
                rhs2 = (
                    -rp
                    - cc_u / zeta_u
                    + eu * rd_u
                    + cc_v / zeta_v
                    - ev * rd_v
                    + _masked_div(ts, Ds, rowbounded)
                )
                # free rows contribute a fixed dy = -y to the p-equation
                r1_t = r1 + op.a_rmv(
                    invE_soft * rhs2 + jnp.where(freerow, y, 0.0)
                )
                dp, dy_t = solve_block(r1_t, jnp.where(stiff, rhs2, 0.0))
                Adp = op.a_mv(dp)
                dy_soft = jnp.where(elim, (Adp - rhs2) * invE_soft, -y)
                dy = jnp.where(stiff, dy_t, dy_soft)
                du = cc_u / zeta_u - eu * (dy + rd_u)
                dv = cc_v / zeta_v - ev * (rd_v - dy)
                ds = _masked_div(dy + ts, Ds, rowbounded)
                ds = jnp.where(freerow, Adp + du - dv + rp, ds)  # eq rows: 0
                dzl = _masked_div(cc_pl - zl * dp, a_pl, hlb)
                dzu = _masked_div(cc_pu + zu * dp, a_pu, hub)
                dll = _masked_div(cc_sl - ll * ds, a_sl, hrl)
                dlu = _masked_div(cc_su + lu * ds, a_su, hru)
                dzeta_u = dy + rd_u
                dzeta_v = rd_v - dy
                return dp, ds, du, dv, dy, dzl, dzu, dll, dlu, dzeta_u, dzeta_v

            # ---- predictor-corrector as ONE rolled stage (compile size) --------
            # Stage 0 is the affine predictor, stage 1 the Mehrotra corrector.
            # With the previous direction zero and smu masked to 0, the corrector
            # right-hand sides reduce EXACTLY to the affine ones (the d*_a
            # products vanish), so one traced Newton solve serves both stages —
            # the static-bound fori_loop lowers to a scan whose body appears once
            # in the HLO (the module was ~2x bigger with both solves inlined, and
            # the axon remote-compile time scales with module size).
            def pc_stage(k, d_prev):
                (dp_a, ds_a, du_a, dv_a, dy_a,
                 dzl_a, dzu_a, dll_a, dlu_a, dzu_ua, dzv_va) = d_prev
                is_cor = (k > 0).astype(dtype)

                # affine step size of the PREVIOUS direction (stage 1 only; at
                # stage 0 the zero direction gives aa=1, mu_aff=mu — masked out)
                ap_a = jnp.minimum(
                    jnp.minimum(
                        _ftb_alpha(a_pl, dp_a, hlb, 1.0),
                        _ftb_alpha(a_pu, -dp_a, hub, 1.0),
                    ),
                    jnp.minimum(
                        jnp.minimum(
                            _ftb_alpha(a_sl, ds_a, hrl, 1.0),
                            _ftb_alpha(a_su, -ds_a, hru, 1.0),
                        ),
                        jnp.minimum(
                            _ftb_alpha(u, du_a, jnp.ones_like(u, bool), 1.0),
                            _ftb_alpha(v, dv_a, jnp.ones_like(v, bool), 1.0),
                        ),
                    ),
                )
                ad_a = jnp.minimum(
                    jnp.minimum(
                        _ftb_alpha(zl, dzl_a, hlb, 1.0),
                        _ftb_alpha(zu, dzu_a, hub, 1.0),
                    ),
                    jnp.minimum(
                        jnp.minimum(
                            _ftb_alpha(ll, dll_a, hrl, 1.0),
                            _ftb_alpha(lu, dlu_a, hru, 1.0),
                        ),
                        jnp.minimum(
                            _ftb_alpha(zeta_u, dzu_ua, jnp.ones_like(u, bool), 1.0),
                            _ftb_alpha(zeta_v, dzv_va, jnp.ones_like(v, bool), 1.0),
                        ),
                    ),
                )
                # single common step size: with Q != 0 separate primal/dual steps
                # leave a (ap-ad)*Q*dp term in the dual residual that can stall
                aa = jnp.minimum(ap_a, ad_a)
                mu_aff = compl_mu(
                    p + aa * dp_a, s + aa * ds_a, u + aa * du_a, v + aa * dv_a,
                    zl + aa * dzl_a, zu + aa * dzu_a,
                    ll + aa * dll_a, lu + aa * dlu_a,
                    zeta_u + aa * dzu_ua, zeta_v + aa * dzv_va,
                )
                sigma = jnp.clip(
                    (mu_aff / jnp.maximum(mu, 1e-300)) ** 3, 0.0, 1.0
                )
                smu = is_cor * sigma * mu

                return newton(
                    jnp.where(hlb, smu - a_pl * zl - dp_a * dzl_a, 0.0),
                    jnp.where(hub, smu - a_pu * zu - (-dp_a) * dzu_a, 0.0),
                    jnp.where(hrl, smu - a_sl * ll - ds_a * dll_a, 0.0),
                    jnp.where(hru, smu - a_su * lu - (-ds_a) * dlu_a, 0.0),
                    smu - u * zeta_u - du_a * dzu_ua,
                    smu - v * zeta_v - dv_a * dzv_va,
                )

            zero_dir = (
                jnp.zeros_like(p), jnp.zeros_like(s), jnp.zeros_like(u),
                jnp.zeros_like(v), jnp.zeros_like(y), jnp.zeros_like(zl),
                jnp.zeros_like(zu), jnp.zeros_like(ll), jnp.zeros_like(lu),
                jnp.zeros_like(zeta_u), jnp.zeros_like(zeta_v),
            )
            (dp, ds, du, dv, dy, dzl, dzu, dll, dlu, dzeta_u, dzeta_v) = (
                lax.fori_loop(0, 2, pc_stage, zero_dir)
            )

            ap = jnp.minimum(
                jnp.minimum(
                    _ftb_alpha(a_pl, dp, hlb, tau),
                    _ftb_alpha(a_pu, -dp, hub, tau),
                ),
                jnp.minimum(
                    jnp.minimum(
                        _ftb_alpha(a_sl, ds, hrl, tau),
                        _ftb_alpha(a_su, -ds, hru, tau),
                    ),
                    jnp.minimum(
                        _ftb_alpha(u, du, jnp.ones_like(u, bool), tau),
                        _ftb_alpha(v, dv, jnp.ones_like(v, bool), tau),
                    ),
                ),
            )
            ad = jnp.minimum(
                jnp.minimum(
                    _ftb_alpha(zl, dzl, hlb, tau),
                    _ftb_alpha(zu, dzu, hub, tau),
                ),
                jnp.minimum(
                    jnp.minimum(
                        _ftb_alpha(ll, dll, hrl, tau),
                        _ftb_alpha(lu, dlu, hru, tau),
                    ),
                    jnp.minimum(
                        _ftb_alpha(zeta_u, dzeta_u, jnp.ones_like(u, bool), tau),
                        _ftb_alpha(zeta_v, dzeta_v, jnp.ones_like(v, bool), tau),
                    ),
                ),
            )

            alpha = jnp.minimum(ap, ad)
            new = dict(st)
            new["p"] = p + alpha * dp
            new["s"] = jnp.where(eq, rl, s + alpha * ds)
            new["u"] = u + alpha * du
            new["v"] = v + alpha * dv
            new["y"] = y + alpha * dy
            new["zl"] = jnp.where(hlb, zl + alpha * dzl, 0.0)
            new["zu"] = jnp.where(hub, zu + alpha * dzu, 0.0)
            new["ll"] = jnp.where(hrl, ll + alpha * dll, 0.0)
            new["lu"] = jnp.where(hru, lu + alpha * dlu, 0.0)
            new["zeta_u"] = zeta_u + alpha * dzeta_u
            new["zeta_v"] = zeta_v + alpha * dzeta_v
            new["delta"] = fact_delta.astype(dtype) * 0.1  # decay the warm-started regularization
            new["iters"] = st["iters"] + 1

            pri, dual = scaled_residuals(new)
            # relative complementarity: normalize by the primal objective scale.
            # For an infeasible QP in elastic mode the objective is ~w * viol
            # (huge), and the elastic dual zeta_u = w + y suffers eps*w
            # cancellation as y -> -w; the relative measure converges well before
            # that regime while remaining the absolute measure for ordinary QPs.
            mu_total = compl_mu(
                new["p"], new["s"], new["u"], new["v"], new["zl"], new["zu"],
                new["ll"], new["lu"], new["zeta_u"], new["zeta_v"],
            )
            obj_scale = 1.0 + jnp.abs(primal_objective(new["p"], new["u"], new["v"]))
            gap = mu_total * n_pairs / obj_scale
            new["pri_res"], new["dual_res"], new["gap"] = pri, dual, gap
            ltol = loop_cfg["tol"]
            new["converged"] = jnp.logical_and(
                pri < ltol, jnp.logical_and(dual < ltol, gap < ltol)
            )

            # best-iterate bookkeeping + divergence/stall cutoffs
            err = jnp.maximum(pri, jnp.maximum(dual, gap))
            better = err < st["best"]["err"]
            # stall: counts only once the best iterate is already *usable*
            # (below sqrt(tol), the driver's step-acceptance threshold) — the
            # early centering phase may plateau err legitimately.  In the usable
            # regime demand a 10%-per-iteration improvement: the last decade
            # above the mixed-precision floor otherwise consumes most of
            # max_iter at max-over-lanes cost under vmap.
            usable = st["best"]["err"] < jnp.sqrt(loop_cfg["tol"])
            improved10 = err < 0.9 * st["best"]["err"]
            new["since_improve"] = jnp.where(
                jnp.logical_and(usable, ~improved10),
                st["since_improve"] + 1,
                0,
            )
            if opts.stall_iters > 0 and loop_cfg["guard"]:
                new["failed"] = jnp.logical_or(
                    new["failed"], new["since_improve"] >= opts.stall_iters
                )
            b = st["best"]
            new["best"] = dict(
                p=jnp.where(better, new["p"], b["p"]),
                y=jnp.where(better, new["y"], b["y"]),
                zl=jnp.where(better, new["zl"], b["zl"]),
                zu=jnp.where(better, new["zu"], b["zu"]),
                u=jnp.where(better, new["u"], b["u"]),
                v=jnp.where(better, new["v"], b["v"]),
                err=jnp.where(better, err, b["err"]),
                pri=jnp.where(better, pri, b["pri"]),
                dual=jnp.where(better, dual, b["dual"]),
                gap=jnp.where(better, gap, b["gap"]),
            )
            # 1e4: wide enough that a transient excursion at the float32
            # precision floor (iterates wander once the Newton systems go
            # noise-dominated) does not abort a solve whose best iterate is
            # already usable — the best-iterate snapshot is what gets returned.
            # Both cutoffs are PHASE-1 (f32) guards: the exact-factor second
            # phase disables them (loop_cfg["guard"]) — its steps are trusted,
            # and a lane crossing into the elastic (slack-growing) regime spikes
            # err transiently in a way the divergence test misreads (observed:
            # the stall rescue aborted after one trip on an elastically-solvable
            # QP).  max_iter still bounds the phase.
            if loop_cfg["guard"]:
                diverging = err > 1.0e4 * jnp.maximum(
                    new["best"]["err"], loop_cfg["tol"]
                )
                new["failed"] = jnp.logical_or(new["failed"], diverging)

            # numerical-breakdown backstop: if anything went non-finite, revert to
            # the previous iterate and stop (converged stays False -> the caller's
            # "unexpected status" triage path, mirroring the reference's handling
            # of a sub-solver that errors out, sqp_trust_region.jl:169-178)
            finite = jnp.array(True)
            for k in ("p", "s", "u", "v", "y", "zl", "zu", "ll", "lu",
                      "zeta_u", "zeta_v"):
                finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(new[k])))
            out = {}
            for k in new:
                old_val = st[k] if k in st else new[k]
                out[k] = jax.tree.map(
                    lambda a, b: jnp.where(finite, a, b), new[k], old_val
                )
            # keep BOTH stop signals: the divergence cutoff computed above (lives
            # in new["failed"]) and the non-finite backstop
            out["failed"] = jnp.where(finite, new["failed"], True)
            out["iters"] = new["iters"]
            return out

        return cond_fn, body_fn

    # ---- phase-2 (f64 polish / stall rescue) configuration -----------------
    # Schur-cap policy (see DenseOp.rescue_op): the STALL-RESCUE use (tol
    # at/above the mixed floor) keeps the bounded Schur set — an uncapped
    # f64 (m, m) factorization per trip is seconds of emulated f64 at
    # case118 scale; the strict mixed_polish use (tol below the floor)
    # lifts the cap for full dual accuracy.
    strict_polish = (float(opts.tol) < _POLISH_FLOOR) if do_polish else False
    tol_p2 = jnp.asarray(opts.tol, dtype)
    if tol_override is not None:
        # the inexact-SQP relaxation applies to BOTH phases: a lane the
        # driver only wants solved loosely must not pay f64 iterations
        # chasing the strict target
        tol_p2 = jnp.maximum(tol_p2, jnp.asarray(tol_override, dtype))
    max_iter2 = opts.max_iter + opts.polish_iters
    cap2 = 0 if strict_polish else opts.schur_cap

    def phase2_entry(st):
        """Transition into the f64 polish/rescue phase: continue the SAME
        interior-point iteration with direct compute-dtype factorizations.
        Lanes already strictly converged (and skipped lanes) take zero
        phase-2 trips.  The swap is backend-generic: every operator supplies
        its own full-precision twin (DenseOp -> direct f64 factors;
        BbdOperator -> f64 block factors), so the stall rescue covers the
        structured path too.

        Entry selection (all per-solve scalars, so vmap lanes diverge
        freely): strict/skipped lanes take zero trips; lanes that converged
        at the phase-1 (floored) tolerance CONTINUE warm (the mixed_polish
        floor->tol case); lanes that exited unconverged RESTART COLD with
        exact factors — an f32 exit is typically jammed at a degenerate
        corner (complementarity pair at the boundary, fraction-to-boundary
        alpha ~ 0) where exact Newton steps cannot recover either, while a
        fresh exact solve converges normally."""
        strict = jnp.logical_and(
            st["pri_res"] < tol_p2,
            jnp.logical_and(st["dual_res"] < tol_p2, st["gap"] < tol_p2),
        )
        skiparr = (
            jnp.array(False) if skip is None else jnp.asarray(skip, bool)
        )
        done2 = jnp.logical_or(strict, skiparr)
        cold = jnp.logical_and(~done2, ~st["converged"])
        best1 = st["best"]
        # restart from the true COLD point, even when phase 1 was warm-started
        state0_cold = dict(state0, **cold_fields)
        st = jax.tree.map(
            lambda a, b: jnp.where(cold, b, a), st, state0_cold
        )
        return dict(
            st,
            best=best1,  # the return value considers both phases
            converged=done2,
            failed=jnp.array(False),
            since_improve=jnp.array(0, jnp.int32),
            iters=jnp.where(cold, 0, st["iters"]).astype(jnp.int32),
        )

    def finalize(st):
        """Return the best iterate seen (identical to the final one in the
        normal well-conditioned case)."""
        b = st["best"]
        pri, dual, gap = b["pri"], b["dual"], b["gap"]
        converged = jnp.logical_and(
            pri < opts.tol, jnp.logical_and(dual < opts.tol, gap < opts.tol)
        )

        # reduced costs: for fixed variables, recover from stationarity of
        # the ORIGINAL problem and sign-split (mirrors
        # subproblem_JuMP.jl:543-550)
        redcost_fixed = op.q_mv(b["p"]) + c + op.a_rmv(b["y"])
        mult_lo = jnp.where(fixed, _pos(redcost_fixed), b["zl"])
        mult_up = jnp.where(fixed, _pos(-redcost_fixed), b["zu"])
        p_out = jnp.where(fixed, fixval, b["p"])

        return QpSolution(
            p=p_out,
            y=b["y"],
            mult_lo=mult_lo,
            mult_up=mult_up,
            slack_u=b["u"],
            slack_v=b["v"],
            iters=st["iters"],
            converged=converged,
            pri_res=pri,
            dual_res=dual,
            gap=gap,
        )

    return dict(
        state0=state0,
        make_loop=make_loop,
        phase2_entry=phase2_entry,
        finalize=finalize,
        do_polish=do_polish,
        strict_polish=strict_polish,
        tol_p1=tol_p1,
        tol_p2=tol_p2,
        max_iter1=opts.max_iter,
        max_iter2=max_iter2,
        cap1=opts.schur_cap,
        cap2=cap2,
        op=op,
    )


def _solve_qp_impl(Q, c, A, rl, ru, lb, ub, w, opts, skip=None, op=None,
                   init=None, tol_override=None):
    """Monolithic execution: phase-1 while_loop, then (when configured) the
    phase-2 polish/rescue while_loop inside the same device program."""
    b = _ipm_bundle(
        Q, c, A, rl, ru, lb, ub, w, opts, skip=skip, op=op, init=init,
        tol_override=tol_override,
    )
    cond1, body1 = b["make_loop"](
        b["op"], b["tol_p1"], b["max_iter1"], b["cap1"], True
    )
    st = lax.while_loop(cond1, body1, b["state0"])
    if b["do_polish"]:
        op2 = b["op"].rescue_op(keep_cap=not b["strict_polish"])
        st = b["phase2_entry"](st)
        # make_loop hands out fresh cond/body function objects per phase
        # (see its docstring) — phase 2 gets its own trace with the rescue
        # operator, the strict tolerance, and the guards lifted
        cond2, body2 = b["make_loop"](
            op2, b["tol_p2"], b["max_iter2"], b["cap2"], False
        )
        st = lax.while_loop(cond2, body2, st)
    return b["finalize"](st)


# --------------------------------------------------------------------------
# resumable micro-stepped execution (VERDICT r4 item 2)
# --------------------------------------------------------------------------
#
# The axon tunnel kills any single device-program execution at 60 s.  The
# round-4 chunked driver (parallel.batch.make_chunked_batch_solver) bounds a
# device call at ONE outer SQP iteration, but the watchdog-atomic unit
# inside that is one QP solve — and a rescue-storm QP (dozens of
# f64-emulated factorization trips at n ~ 344) measured 44-60+ s even at
# slab width 4 (BASELINE.md r4 fault ladder).  These entry points split the
# QP itself: ``qp_micro_start`` runs the cheap f32 phase 1 plus the phase-2
# entry transition, and the host then advances the f64 phase-2 loop at most
# ``trip_cap`` trips per ``qp_micro_resume`` call, carrying the IPM state
# pytree across calls (algorithms.sqp_tr builds the driver-level state
# machine on top).  The trip sequence is bit-identical to the monolithic
# phase-2 while_loop: same body closures from the same bundle, only the
# execution is cut at trip boundaries.


def qp_micro_template(Q, c, A, rl, ru, lb, ub, w, opts, skip=None, init=None,
                      tol_override=None, op=None):
    """A correctly-shaped IPM state pytree (the bundle's initial state) with
    no loop work — the zero template a driver-level state machine carries
    for lanes that have no QP in flight."""
    b = _ipm_bundle(
        Q, c, A, rl, ru, lb, ub, w, opts, skip=skip, op=op, init=init,
        tol_override=tol_override,
    )
    return b["state0"]


def qp_micro_start(Q, c, A, rl, ru, lb, ub, w, opts, skip=None, init=None,
                   tol_override=None, op=None):
    """Run phase 1 + the phase-2 entry transition; return the resumable IPM
    state dict (a fixed-structure pytree)."""
    with jax.default_matmul_precision("float32"):
        b = _ipm_bundle(
            Q, c, A, rl, ru, lb, ub, w, opts, skip=skip, op=op, init=init,
            tol_override=tol_override,
        )
        cond1, body1 = b["make_loop"](
            b["op"], b["tol_p1"], b["max_iter1"], b["cap1"], True
        )
        st = lax.while_loop(cond1, body1, b["state0"])
        if b["do_polish"]:
            st = b["phase2_entry"](st)
        return st


def qp_micro_resume(st, Q, c, A, rl, ru, lb, ub, w, opts, trip_cap,
                    skip=None, init=None, tol_override=None, op=None):
    """Advance the phase-2 (f64 polish/rescue) loop by at most ``trip_cap``
    trips (a traced scalar — one compile covers every cap).  No-op when the
    configuration has no phase 2."""
    with jax.default_matmul_precision("float32"):
        b = _ipm_bundle(
            Q, c, A, rl, ru, lb, ub, w, opts, skip=skip, op=op, init=init,
            tol_override=tol_override,
        )
        if not b["do_polish"]:
            return st
        op2 = b["op"].rescue_op(keep_cap=not b["strict_polish"])
        cond2, body2 = b["make_loop"](
            op2, b["tol_p2"], b["max_iter2"], b["cap2"], False
        )

        def cond(carry):
            st_, k = carry
            return jnp.logical_and(cond2(st_), k < trip_cap)

        def body(carry):
            st_, k = carry
            return body2(st_), k + 1

        st, _ = lax.while_loop(cond, body, (st, jnp.array(0, jnp.int32)))
        return st


def qp_micro_done(st, opts: IpmOptions):
    """Per-lane bool: this QP needs no further phase-2 trips (converged,
    failed, or out of iterations) — its solution is final."""
    max2 = opts.max_iter + opts.polish_iters
    return jnp.logical_or(
        jnp.logical_or(st["converged"], st["failed"]), st["iters"] >= max2
    )


def qp_micro_finalize(st, Q, c, A, rl, ru, lb, ub, w, opts, skip=None,
                      init=None, tol_override=None, op=None):
    """Extract the QpSolution from a (finished or in-flight) micro state."""
    with jax.default_matmul_precision("float32"):
        b = _ipm_bundle(
            Q, c, A, rl, ru, lb, ub, w, opts, skip=skip, op=op, init=init,
            tol_override=tol_override,
        )
        return b["finalize"](st)
