"""Trust-region SQP driver (the live algorithm of the reference).

A functional, jit/vmap/pjit-able re-statement of
``/root/reference/src/algorithms/sqp_trust_region.jl`` (``SqpTR`` + ``run!``):
the mutable-state serial ``while true`` loop (``:124-214``) becomes a
``lax.while_loop`` over an immutable :class:`SqpState` pytree, the external
Ipopt QP solve becomes the in-framework elastic IPM
(:mod:`sqpsolver_tpu.ops.qp_ipm`), and the per-instance control flow
(accept/reject, feasibility-restoration entry/exit, SOC) is expressed as
masked arithmetic so a batch of instances can diverge freely under ``vmap``
(SURVEY hard part #2).

Behavioral rules preserved (SURVEY §2.3, with reference cites inline):

1.  canonical QP with TR box and slack placement (subproblem.jl:3-11)
2.  ared/pred acceptance, pred forced to 1 in FR (sqp_trust_region.jl:515-538)
3.  TR expand x2 only when the step hits the boundary; halve-on-reject with
    floor 0.1*tol_direction (:535-537, :575)
4.  penalty update  mu <- max(mu, |lam|inf, |nuL|inf, |nuU|inf)  (:378)
5.  dual step = QP multipliers minus current, added on accept (:375-377,:532)
6.  convergence tests in the reference's exact order (:187-204), iteration
    limit with feasible-point downgrade (sqp.jl:215-224), unbounded heuristic
    (:146-150), NaN objective -> status -13 (:113-115)
7.  feasibility restoration as a mode flag; trigger on infeasible QP; exit on
    accepted step (filterSQP-style) or tiny direction (:151-168,:188-191,:209)
8.  optional second-order correction (:341-360, :543-572)
9.  initial point clamp + projection onto linear constraints (:111-122)

Known deviations (each deliberate, documented here):

* the reference's ``sqp.ret == -3`` on an unexpected subproblem status is a
  comparison, not an assignment (sqp_trust_region.jl:170 — a latent bug that
  leaves the status at -5); we assign -3.
* outputs re-evaluate g(x) at the final iterate instead of reporting the
  possibly one-step-stale cached ``E`` (run! :218 writes the stale cache).
* non-finite trial objectives reject the step instead of poisoning the merit
  comparison (the reference only checks NaN at the initial point).
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..nlp import NLP, NLPData, initial_point
from ..ops.qp_ipm import (
    IpmOptions,
    qp_micro_done,
    qp_micro_finalize,
    qp_micro_resume,
    qp_micro_start,
    qp_micro_template,
    solve_qp,
    solve_qp_op,
)
from ..parameters import Parameters
from ..status import Status
from .common import (
    kt_residuals,
    kt_residuals_from_parts,
    lanczos_lmin_bound,
    norm_violations,
    schur_cap_for,
)

Array = jax.Array

#: Julia isapprox() default rtol = sqrt(eps), used by the reference for the
#: "step on the TR boundary" tests (sqp_trust_region.jl:146,200,535)
_ISAPPROX_RTOL = 1.4901161193847656e-08


def _isapprox(a, b):
    return jnp.abs(a - b) <= _ISAPPROX_RTOL * jnp.maximum(jnp.abs(a), jnp.abs(b))


def _inf_norm(x):
    return jnp.max(jnp.abs(x), initial=0.0)


def _dropzeros(x, tol=1e-10):
    """Reference dropzeros! (src/utils.jl:16-22): zero out tiny entries."""
    return jnp.where(jnp.abs(x) < tol, 0.0, x)


class SqpState(NamedTuple):
    """Solver state pytree — the functional analog of the @sqp_fields struct
    (sqp.jl:16-59) plus the SqpTR extras (sqp_trust_region.jl:6-91)."""

    x: Array
    lam: Array
    mult_lo: Array  # nu_L >= 0
    mult_up: Array  # nu_U >= 0
    # cached evaluations at x (refreshed when the last step was accepted)
    f: Array
    df: Array
    E: Array
    J: Array
    H: Array
    prim_infeas: Array
    dual_infeas: Array
    # step/merit state
    p: Array
    phi: Array
    mu: Array
    tr: Array  # Delta
    step_accepted: Array  # bool
    fr: Array  # bool: feasibility restoration mode
    iter: Array  # int32
    ret: Array  # int32 status code
    done: Array  # bool
    # counters / observability (SURVEY §5.1/§5.5)
    qp_iters_total: Array
    n_accept: Array
    n_reject: Array
    n_soc_accept: Array
    n_fr_iters: Array
    n_qp_bad: Array  # consecutive stalled-QP count (see stage 3c)
    stats: Any  # dict of per-iteration arrays or None


class MicroState(NamedTuple):
    """Driver state of the micro-stepped execution (``_micro_step``): the
    SQP state plus the in-flight IPM state of the current subproblem QP.

    WHY (VERDICT r4 item 2): the axon tunnel kills any single device
    execution at 60 s, the round-4 chunked driver bounds a call at one SQP
    iteration, and the remaining watchdog-atomic unit is ONE QP — a
    rescue-storm QP (dozens of f64-emulated factorization trips at n~344)
    measured 44-60+ s even at slab width 4.  Carrying the IPM state across
    device calls lets the host advance the f64 rescue loop a few trips at a
    time; lanes whose QP is still in flight simply do not advance their SQP
    iteration (``qp_active``), so the trip sequence is bit-identical to the
    monolithic solve."""

    sqp: SqpState
    qp: Any  # resumable IPM state dict (ops.qp_ipm micro API)
    qp_active: Array  # bool: this lane's subproblem QP is mid-flight


class SqpResult(NamedTuple):
    """Raw device-side result (wrapped host-side by results.Results)."""

    x: Array
    obj_val: Array
    status: Array
    g: Array
    mult_g: Array
    mult_x_L: Array
    mult_x_U: Array
    iterations: Array
    prim_infeas: Array
    dual_infeas: Array
    qp_iters_total: Array
    n_accept: Array
    n_reject: Array
    n_soc_accept: Array
    n_fr_iters: Array
    stats: Any


#: consecutive stalled-QP iterations (qp_bad) tolerated before a lane fails
#: with ERROR_IN_STEP_COMPUTATION.  Each stall halves the TR, which
#: regularizes the next QP's KKT systems; 3 halvings recover every transient
#: f32-precision stall observed on the real-case ACOPF batteries while still
#: failing fast on genuinely broken subproblems (stage 3c).
_QP_BAD_MAX = 3


def _trust_region_box(x, x_l, x_u, tr):
    """TR box in step space with the degenerate-interval guard
    (subproblem_JuMP.jl:432-463)."""
    v_lb = x_l - x
    v_ub = x_u - x
    lb = jnp.maximum(-tr, v_lb)
    ub = jnp.minimum(tr, v_ub)
    bad = lb > ub
    lb = jnp.where(bad, jnp.maximum(-tr, jnp.minimum(0.0, v_lb)), lb)
    ub = jnp.where(bad, jnp.minimum(tr, jnp.maximum(0.0, v_ub)), ub)
    return lb, ub


def make_solver(
    nlp: NLP,
    params: Parameters = Parameters(),
    *,
    verbose: Optional[bool] = None,
    block_shard=None,
) -> Callable[[NLPData], SqpResult]:
    """Build the jittable single-instance SQP-TR solve function.

    The returned function maps :class:`NLPData` (bounds/x0/theta arrays) to a
    :class:`SqpResult`; it is a pure jax function — jit it, vmap it over a
    batch of NLPData, or pjit it over a device mesh.

    ``block_shard=(mesh, axis)`` (structured mode only): shard the BBD part
    axis of ONE large instance over a device mesh — per-block factorizations
    and matmuls run device-local, separator/Schur reductions become
    all-reduces over the mesh axis (see ops.kkt_bbd.BlockMaps).  Do not
    combine with vmap instance batching.
    """
    if params.algorithm != "SQP-TR":
        raise ValueError(
            f"make_solver builds SQP-TR; got algorithm={params.algorithm!r} "
            "(reference model.jl:78-91 rejects unknown algorithms with -12)"
        )
    n, m = nlp.n, nlp.m
    n_lin = nlp.num_linear
    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    if params.dtype == "float64" and not jax.config.jax_enable_x64:
        raise RuntimeError(
            "Parameters.dtype='float64' requires jax x64: call "
            "sqpsolver_tpu.enable_x64() (or set JAX_ENABLE_X64=1) before "
            "building a solver, or choose dtype='float32'."
        )
    exact_hessian = params.hessian_type == "exact"
    use_soc = bool(params.use_soc)
    collect_stats = bool(params.StatisticsFlag)
    log_iters = bool(params.OutputFlag) if verbose is None else verbose

    # dtype-aware QP tolerance floor: float32 cannot reach 1e-10 residuals
    # (~30*eps is the practical interior-point limit per dtype), and
    # float32-factorized mixed-precision refinement bottoms out around 1e-6
    # on barrier-ill-conditioned KKT systems — ample for the 1e-6/1e-4
    # ACOPF tolerance regime; use direct float64 for 1e-8-grade solves
    qp_tol_eff = max(params.qp_tol, 30.0 * float(jnp.finfo(dtype).eps))
    polish = (
        params.kkt_precision == "mixed_polish"
        and not params.kkt_structured
        and dtype == jnp.float64
    )
    if (
        params.kkt_precision.startswith("mixed") or params.kkt_structured
    ) and not polish:
        # float32-factorized KKT (mixed modes and the always-f32 BBD
        # structured backend) bottoms out around 1e-6 on barrier-ill-
        # conditioned systems.  "mixed_polish" lifts the floor instead: the
        # IPM continues past it with direct f64 factorizations (only the
        # last ~2-4 iterations pay f64-emulation cost; qp_ipm.py
        # IpmOptions.polish_iters)
        qp_tol_eff = max(qp_tol_eff, 2.0e-6)
    # bounded Schur set for the dense f32-factorized fast path
    # (Parameters.schur_cap / IpmOptions.schur_cap): cap S at the static
    # equality count plus headroom for active inequalities; overflow rows
    # fold into K via the bounded 1/E the BBD backend already uses.
    schur_cap = schur_cap_for(params, nlp)
    ipm_opts = IpmOptions(
        max_iter=params.qp_max_iter,
        tol=qp_tol_eff,
        ftb=params.qp_ftb,
        factor_dtype=(
            "float32" if params.kkt_precision.startswith("mixed") else "same"
        ),
        ir_steps=(
            # the bounded Schur set folds active inequality rows into K with
            # a large (bounded) 1/E — harder systems; four sweeps keep the
            # f32 solve usable through barrier-tight iterates (the BBD
            # backend applies the same rule, kkt_bbd.py BbdOperator.__init__)
            max(4, params.kkt_ir_steps)
            if schur_cap
            else (
                max(2, params.kkt_ir_steps)
                if params.kkt_precision == "mixed_plane"
                else params.kkt_ir_steps
            )
        ),
        kkt_backend=params.kkt_backend,
        plane=params.kkt_precision == "mixed_plane",
        # structured backend: bounded condensation of the folded active
        # inequality rows (its Schur set is static — equalities only).
        # 3e-7 is measured, not arbitrary: 1e-8 lets the folded 1/E reach
        # 1e8, past the f32-factor refinement convergence range (cond *
        # eps_f32 < 1), and the BBD dual residual stalls at ~3e-2 on real
        # case30; 1e-5 over-softens active rows and the primal residual
        # cannot close.  1e-7..1e-6 both converge in ~14 IPM iters.
        invE_floor=(
            3.0e-7 if (params.kkt_structured or schur_cap) else 0.0
        ),
        # mixed_polish: 20 f64 iterations to close the floor->tol gap.
        # All other f32-factorized modes (dense mixed AND structured BBD —
        # both backends supply a full-precision rescue_op): 8 f64
        # STALL-RESCUE iterations — a lane whose f32 phase exits unconverged
        # (barrier/high-penalty KKT past f32's conditioning range) continues
        # with exact factors instead of failing; costs zero trips when every
        # lane converged in the f32 phase (qp_ipm.IpmOptions.polish_iters).
        # Without this the structured path was a knife-edge: case118's FR
        # QP at the flat start flipped between solving and stalling on a 6%
        # change in the convexification shift (Lanczos 40 vs 64 steps).
        polish_iters=(
            20
            if polish
            else (
                8
                if (
                    (params.kkt_precision.startswith("mixed")
                     or params.kkt_structured)
                    and dtype == jnp.float64
                    and params.qp_rescue
                )
                else 0
            )
        ),
        schur_cap=schur_cap,
    )
    w_big = jnp.asarray(params.elastic_weight, dtype)
    # row index helper: linear rows lead (canonical ordering, SURVEY §3.2)
    is_linear_row = jnp.arange(m) < n_lin

    # ---------------------------------------------- structured (BBD) mode ---
    # Block-structured KKT path: derivatives arrive coloring-compressed and
    # are gathered into bordered-block-diagonal local blocks; the QP solver
    # runs through ops.kkt_bbd.BbdOperator instead of dense (Q, A).  This is
    # the TPU-native equivalent of the reference's sparse-callback + ma57
    # pipeline (model.jl:21-47, examples/acopf/opf.jl:59-64).
    structured = bool(params.kkt_structured)
    if structured and nlp.structure is None:
        raise ValueError(
            "kkt_structured=True requires nlp.structure (see "
            "sqpsolver_tpu.structure.NLPStructure; models can also use "
            "structure.detect_structure)"
        )
    if structured:
        import numpy as _np

        from ..ops.kkt_bbd import BbdOperator, BlockMaps
        from ..structure import build_block_structure

        g_l_np = _np.asarray(nlp.g_l, dtype=_np.float64)
        g_u_np = _np.asarray(nlp.g_u, dtype=_np.float64)
        eq_mask_np = _np.isfinite(g_l_np) & (g_l_np == g_u_np)
        bs = build_block_structure(
            n, m, nlp.structure, eq_mask_np,
            n_parts=(params.kkt_parts or None),
        )
        maps = BlockMaps(bs, shard=block_shard)
        # jvp/hvp seed matrices from the colorings (one-hot per color).
        # Built INSIDE the traced functions from the tiny (n,) color vectors:
        # a materialized (nJ, n)/(nH, n) f64 one-hot captured by the inner
        # jitted eval_all cannot be hoisted out of the cond/while regions and
        # embeds as a dense literal — at case118 the two seed matrices alone
        # were 479K of the 1.98M-char StableHLO module, and the axon remote
        # compile time scales with module size.
        colJ_vec = jnp.asarray(bs.colorJ, jnp.int32)
        colH_vec = jnp.asarray(bs.colorH, jnp.int32)

        def make_seeds(col, k, ref_dtype):
            return (
                col[None, :] == jnp.arange(k, dtype=jnp.int32)[:, None]
            ).astype(ref_dtype)

        def jac_mv(J, p):
            return maps.j_mv(J, p)

        def jac_rmv(J, y):
            return maps.j_rmv(J, y)

        def jac_row_norms(J):
            return maps.j_row_norms(J)

        def hess_mv(H, v):
            return maps.h_mv(H, v)

        def zero_hess(ref_dtype):
            z = lambda *s: jnp.zeros(s, ref_dtype)
            return (
                z(bs.P, bs.nd, bs.nd), z(bs.P, bs.nd, bs.ns),
                z(bs.ns, bs.ns),
            )

        def qp_operator(H_blocks, J_blocks):
            return BbdOperator(maps, J_blocks, H_blocks, ipm_opts)

        maps_arrays = maps.arrays()

        @jax.jit
        def _solve_qp_structured(
            marrs, H_blocks, J_blocks, c, rl, ru, lb, ub, w, skip, init,
            tol_dyn,
        ):
            """Structured QP behind a jit boundary: the dense path's
            ``solve_qp`` is jitted, so its two call sites (subproblem + SOC)
            share ONE lowered copy — the structured ``solve_qp_op`` was
            traced inline and doubled the module (compile size; see the
            eval_all note above).  The BlockMaps index/mask arrays travel as
            the ``marrs`` argument so they hoist to top-level parameters
            instead of embedding as dense literals (BlockMaps.arrays)."""
            op = BbdOperator(
                maps.bind(marrs), J_blocks, H_blocks, ipm_opts
            )
            return solve_qp_op(
                op, c, rl, ru, lb, ub, w,
                opts=ipm_opts, skip=skip, init=init, tol_override=tol_dyn,
            )

        def solve_qp_structured(
            H_blocks, J_blocks, c, rl, ru, lb, ub, w, skip, init, tol_dyn
        ):
            return _solve_qp_structured(
                maps_arrays, H_blocks, J_blocks, c, rl, ru, lb, ub, w, skip,
                init, tol_dyn,
            )

    else:

        def jac_mv(J, p):
            return J @ p

        def jac_rmv(J, y):
            return J.T @ y

        def jac_row_norms(J):
            return jnp.sqrt(jnp.sum(J * J, axis=1))

        def hess_mv(H, v):
            return H @ v

    tol_dir = params.tol_direction
    tol_res = params.tol_residual
    tol_inf = params.tol_infeas
    max_iter = params.max_iter
    tr_max = jnp.asarray(1.0e8, dtype)  # Delta_max (sqp_trust_region.jl:70)

    solve_t0 = [0.0]  # host-side clock for the iteration printer

    # ------------------------------------------------------------- evals ----
    # NB: eval_all / obj_cons below are jax.jit-wrapped.  Inside the outer
    # traced program a jitted inner function lowers to ONE shared StableHLO
    # function per (function identity, avals) — so the init/refresh eval_all
    # sites and the trial/SOC-trial/finalize obj+cons sites each cost one
    # traced copy instead of one per call site.  The ACOPF AD bundle is the
    # bulk of the outer module (case30 b32: lag_hess 86K + cons_jac 45K +
    # cons 27K HLO chars per copy), and the axon TPU compile time scales
    # with module size (scripts/hlo_breakdown.py, scripts/compile_probe.py).
    if structured:

        @jax.jit
        def _eval_all_structured(x, lam, theta, marrs):
            mp = maps.bind(marrs)
            f, df = nlp.obj_grad(x, theta)
            E = nlp.cons(x, theta)
            gfun = lambda z: nlp.cons(z, theta)
            # coloring-compressed Jacobian: nJ jvp passes instead of n
            seedsJ = make_seeds(colJ_vec, bs.nJ, x.dtype)
            Jc = jax.vmap(lambda s: jax.jvp(gfun, (x,), (s,))[1])(seedsJ)
            J = mp.jac_blocks(Jc.T)
            if exact_hessian:
                def lag_grad(z):
                    val = nlp.obj(z, theta)
                    if nlp.g is not None:
                        val = val + jnp.dot(lam, nlp.cons(z, theta))
                    return val

                glag = jax.grad(lag_grad)
                # compressed Lagrangian Hessian: nH HVP passes
                seedsH = make_seeds(colH_vec, bs.nH, x.dtype)
                Hc = jax.vmap(lambda s: jax.jvp(glag, (x,), (s,))[1])(seedsH)
                H = mp.hess_blocks(Hc.T)
            else:
                H = zero_hess(x.dtype)  # SLP mode: LP subproblems
            return f, df, E, J, H

        def eval_all(x, lam, theta):
            return _eval_all_structured(x, lam, theta, maps_arrays)

    else:

        @jax.jit
        def eval_all(x, lam, theta):
            f, df = nlp.obj_grad(x, theta)
            E = nlp.cons(x, theta)
            J = nlp.cons_jac(x, theta)
            if exact_hessian:
                H = nlp.lag_hess(x, lam, theta)
            else:
                H = jnp.zeros((n, n), dtype)  # SLP mode: LP subproblems
            return f, df, E, J, H

    @jax.jit
    def obj_cons(x, theta):
        """(f, g) at a trial point — one shared trace for the step trial,
        the SOC trial, and the finalize write-back."""
        return nlp.obj(x, theta), nlp.cons(x, theta)

    def viol1(E, x, d: NLPData):
        return norm_violations(E, d.g_l, d.g_u, x, d.x_l, d.x_u, ord=1)

    def merit(f_val, E_val, x_val, mu, fr, d: NLPData):
        """l1 merit phi (sqp.jl:170-183); pure violation in FR mode."""
        v = viol1(E_val, x_val, d)
        phi = jnp.where(fr, v, f_val + mu * v)
        # hardening: non-finite trial objective can never look attractive
        return jnp.where(jnp.isfinite(phi), phi, jnp.asarray(jnp.inf, dtype))

    # ---------------------------------------------------------- QP solves ---
    def convexify(H, sqp_iter=None):
        """Shift an indefinite Lagrangian Hessian to PSD:
        H + max(0, -lambda_min + eps) I.

        The reference hands possibly-indefinite QPs to Ipopt, which globalizes
        nonconvex QPs internally; a Mehrotra IPM requires convexity, so the
        shift happens here at the SQP level (Levenberg-style).  Near a KKT
        point p* -> 0, so the convexified QP's multipliers converge to the
        true NLP multipliers (shift * p -> 0) and the q-model/pred ratio still
        uses the ORIGINAL H (compute_qmodel parity, sqp_trust_region.jl:487).

        ``sqp_iter`` (traced scalar; "ladder" mode only): continuation on
        the regularization floor — see _convexify_impl.
        """
        if not exact_hessian:
            return H
        # true f32 products: TPU matmuls default to bfloat16 passes, which
        # degrades the shift estimate below usable accuracy
        with jax.default_matmul_precision("float32"):
            return _convexify_impl(H, sqp_iter)

    def _gershgorin_data(H):
        """(diag, off-diagonal |row| sums) — backend-generic."""
        if structured:
            diag, rowabs = maps.h_diag_rowabs(H)
            return diag, rowabs - jnp.abs(diag)
        diag = jnp.diagonal(H)
        return diag, jnp.sum(jnp.abs(H), axis=1) - jnp.abs(diag)

    def _convexify_impl(H, sqp_iter=None):
        if params.hessian_shift == "ladder":
            # Minimal-shift mode: do NOT estimate lambda_min at all — apply
            # only a small factorability floor and let the KKT
            # factorization's escalating-delta ladder (ops/linsolve
            # factorize_spd, ops/kkt_bbd.bbd_factorize) regularize K = H +
            # D_p + A' E^-1 A per interior-point iteration.  This is the
            # inertia-correction strategy of the reference's Ipopt backend
            # (delta_w escalation), applied to the condensed system: the QP
            # only needs the REDUCED Hessian positive definite, and K's
            # constraint-curvature terms usually dominate an indefinite H's
            # negative directions, so the ladder's delta is typically orders
            # of magnitude below the global -lambda_min shift.  Measured on
            # case118 (cold start): the global eigenvalue shift damps every
            # late step to |p| ~ 0.01 with geometric rate ~0.9 (67 SQP
            # iterations); the TR box keeps the nonconvex QP bounded, and
            # the merit test rejects any ascent direction the nonconvex QP
            # might produce.
            # (A decaying-floor continuation — heavier damping on the first
            # SQP iterations — was tried in round 4 and REVERTED: it did not
            # make the cold case118 QPs f32-solvable, and it broke the
            # structured path's previously-working trajectory, so the cold
            # conditioning wall is handled by the f64 stall rescue instead.)
            diag_g, off_g = _gershgorin_data(H)
            scale = 1.0 + jnp.max(jnp.abs(diag_g) + off_g, initial=0.0)
            floor = 4.0e-7 * scale
            if structured:
                return maps.h_add_diag(H, floor)
            return H + floor * jnp.eye(n, dtype=dtype)
        if params.hessian_shift == "gershgorin":
            # lambda_min >= min_i (H_ii - sum_{j != i} |H_ij|): conservative
            # (can over-shift by orders of magnitude -> damped steps) but a
            # single cheap pass
            diag, off = _gershgorin_data(H)
            lmin = jnp.min(diag - off, initial=0.0)
        elif params.hessian_shift == "power" or structured:
            # Lanczos lower bound on lambda_min (40 matvecs + a tiny k x k
            # eigh) — matvec-only, so it serves both the dense "power" mode
            # and the block-structured path (no dense H exists there).  A
            # plain power iteration on sigma I - H was tried first and
            # under-estimated clustered negative eigenvalues several-fold,
            # handing the IPM nonconvex QPs (see common.lanczos_lmin_bound).
            lmin = lanczos_lmin_bound(
                lambda vv: hess_mv(H, vv), n, dtype,
                iters=(params.hessian_shift_iters or min(n, 64)),
            )
        else:
            # f32 is ample precision for a convexification bound, and f64
            # eigendecompositions are software-emulated on TPU; pad the
            # estimate by f32-eps * |H| to stay a valid lower bound
            lmin32 = jnp.linalg.eigvalsh(H.astype(jnp.float32))[0]
            # pad by f32-eps relative to |H| only: an absolute pad would
            # inflate the shift of (near-)zero Hessians, pulling LP-like
            # subproblem steps off the TR boundary and defeating the
            # boundary-based unbounded/TR-growth heuristics
            pad = 4.0e-7 * jnp.max(jnp.abs(H), initial=0.0)
            lmin = lmin32.astype(dtype) - pad
        # shift floor: float32-factorized KKT paths (mixed modes / structured
        # BBD) cannot usefully factor a PSD-singular Hessian's K — the floor
        # supplies the minimum curvature the f32 factor needs.  Magnitude is
        # calibrated to match the "eigh" mode's pad (4e-7 * |H|), which was
        # measured robust on case118: a 2e-6 * Gershgorin-scale floor (20-50x
        # larger) visibly damped early ACOPF iterations (singular-at-lam=0
        # Hessians -> mean SQP iterations doubled), while 1e-8-absolute left
        # f32 factors noise-dominated (lanes failing with status -3).
        f32_factor = params.kkt_precision.startswith("mixed") or structured
        if f32_factor:
            diag_g, off_g = _gershgorin_data(H)
            scale = 1.0 + jnp.max(jnp.abs(diag_g) + off_g, initial=0.0)
            floor = 4.0e-7 * scale
        else:
            floor = 1e-8 * (1.0 + jnp.abs(lmin))
        shift = jnp.maximum(0.0, -lmin) + jnp.where(lmin < floor, floor, 0.0)
        if structured:
            return maps.h_add_diag(H, shift)
        return H + shift * jnp.eye(n, dtype=dtype)

    def _adaptive_qp_tol(st: SqpState):
        """Inexact-SQP forcing sequence (Parameters.qp_tol_adaptive): the QP
        only needs solving to a fraction of the current outer KKT error.
        Returns a traced per-lane scalar, or None when disabled."""
        if params.qp_tol_adaptive <= 0.0:
            return None
        kkt_err = jnp.maximum(st.prim_infeas, st.dual_infeas)
        return jnp.clip(
            jnp.asarray(params.qp_tol_adaptive, dtype) * kkt_err,
            0.0,
            1.0e-3,
        )

    def subproblem_inputs(st: SqpState, d: NLPData, H_qp):
        """Problem data of the normal/FR trust-region QP, via input
        selection (no control flow — mirrors the sub_optimize! dispatch at
        sqp_trust_region.jl:314-331).  Pure function of the SQP state, so
        the micro-stepped driver can rebuild identical QP data on every
        resume call (x/lam/E/tr are frozen while a QP is in flight)."""
        rl = d.g_l - st.E
        ru = d.g_u - st.E
        lb, ub = _trust_region_box(st.x, d.x_l, d.x_u, st.tr)
        # FR objective: min sum of freed slacks; slacks freed only for
        # violated nonlinear rows (subproblem_JuMP.jl:352-393)
        violated = jnp.logical_or(st.E < d.g_l, st.E > d.g_u)
        freed = jnp.logical_and(violated, ~is_linear_row)
        w_fr = jnp.where(freed, jnp.asarray(1.0, dtype), w_big)
        w = jnp.where(st.fr, w_fr, w_big)
        c = jnp.where(st.fr, jnp.zeros_like(st.df), st.df)
        # warm start (Parameters.qp_warm_start): the accepted duals are the
        # natural anchors across the SQP sequence; the previous primal step
        # is only reused after a REJECTED step (same x, shrunk TR box) —
        # after acceptance the linearization moved and p=0 is the better
        # (cold) primal guess.  FR lanes stay cold: the restoration QP's
        # objective/weights differ and its multipliers live on another scale.
        init = None
        if params.qp_warm_start:
            init = dict(
                p=jnp.where(st.step_accepted, 0.0, st.p),
                y=st.lam,
                zl=st.mult_lo,
                zu=st.mult_up,
                on=jnp.logical_and(st.iter > 1, ~st.fr),
            )
        tol_dyn = _adaptive_qp_tol(st)
        if structured:
            Q = jax.tree.map(lambda h: jnp.where(st.fr, 0.0, h), H_qp)
        else:
            Q = jnp.where(st.fr, jnp.zeros_like(st.H), H_qp)
        return Q, c, rl, ru, lb, ub, w, init, tol_dyn, freed

    def solve_subproblem(st: SqpState, d: NLPData, H_qp):
        """Normal/FR trust-region QP: inputs -> solve -> triage.

        Done lanes skip: their inner IPM while_loop exits at iteration 0, so
        a batch's QP cost follows the slowest *active* lane (per-lane early
        exit, VERDICT r1 item 2)."""
        Q, c, rl, ru, lb, ub, w, init, tol_dyn, freed = subproblem_inputs(
            st, d, H_qp
        )
        if structured:
            sol = solve_qp_structured(
                Q, st.J, c, rl, ru, lb, ub, w, st.done, init, tol_dyn
            )
        else:
            sol = solve_qp(
                Q, c, st.J, rl, ru, lb, ub, w, opts=ipm_opts, skip=st.done,
                init=init, tol_override=tol_dyn,
            )
        return triage_subproblem(st, d, sol, freed)

    def triage_subproblem(st: SqpState, d: NLPData, sol, freed):
        """Post-solve classification shared by the monolithic and
        micro-stepped drivers: TR-vs-true-bound dual masking, the
        infeasibility certificate, and the stalled-QP signal."""
        # keep a box dual as an NLP bound multiplier only when the TRUE
        # variable bound (not the trust region) is the active side of the
        # clipped box.  The reference stores JuMP reduced costs of the
        # TR-clipped variables directly (subproblem_JuMP.jl:543-550), which
        # lets TR-bound duals pollute mult_x_L/U — for quadratic objectives
        # the polluted KT residual then vanishes at non-stationary points
        # (false convergence observed on hs012).
        bound_lo_active = (d.x_l - st.x) >= -st.tr
        bound_up_active = (d.x_u - st.x) <= st.tr
        sol = sol._replace(
            mult_lo=jnp.where(bound_lo_active, sol.mult_lo, 0.0),
            mult_up=jnp.where(bound_up_active, sol.mult_up, 0.0),
        )
        # infeasibility signal: slack mass on rows whose slacks are NOT freed
        hard = jnp.where(st.fr, ~freed, jnp.ones((m,), bool))
        hard_slack = jnp.max(
            jnp.where(hard, sol.slack_u + sol.slack_v, 0.0), initial=0.0
        )
        # "unexpected status" analog: IPM stopped far from a solution.  The
        # PRIMAL residual is the usability bar (a step violating its own
        # linearization poisons the merit line); the DUAL residual gets a
        # much looser cutoff — near-degenerate endgame QPs (active-set ties
        # at the TR boundary) stall with pri ~1e-12 but dual ~1e-3 on any
        # backend, and such a step is still an excellent primal step whose
        # multiplier noise the merit test and the dual-growth clamp already
        # bound.  Requiring dual < sqrt(tol) here put the structured case118
        # endgame on a knife-edge: its stalls sat at 1.5e-3 vs the dense
        # backend's 5e-5 against a 1e-4 bar, turning a backend-precision
        # nuance into Error_In_Step_Computation (PARITY.md #13/#14 family).
        rough = jnp.sqrt(jnp.asarray(qp_tol_eff, dtype))
        rough_dual = jnp.maximum(rough, jnp.asarray(3e-2, dtype))
        rough_exit = jnp.logical_and(
            ~sol.converged,
            jnp.logical_or(sol.pri_res > rough, sol.dual_res > rough_dual),
        )
        # slack mass certifies an inconsistent linearization ONLY when the
        # elastic QP actually solved: the elastic form is always feasible, so
        # a converged-with-slack exit is a genuine certificate, while an
        # unconverged exit leaves arbitrary slack values behind.  Treating
        # the latter as "infeasible" sent transiently-stalled lanes into FR
        # and out with a false status 2 (observed: structured case30 at
        # batch 1 on TPU — batch-size-dependent f32 rounding flips a
        # marginal IPM trajectory; the same lane converges at batch 8.  And
        # again on structured case118 near convergence: an exit at max_iter
        # with residuals below sqrt(tol) — hence not "rough" — but phantom
        # slack ~1e-6 sent an inf_pr=2e-4 iterate into FR, which then
        # stalled at |p|=0).  Anything unconverged goes down the stalled-QP
        # retry path instead (TR halved, _QP_BAD_MAX cap).
        infeasible = jnp.logical_and(
            hard_slack > params.qp_infeas_tol, sol.converged
        )
        qp_bad = jnp.logical_and(rough_exit, ~infeasible)
        return sol, infeasible, qp_bad

    def solve_soc(st: SqpState, E_trial, d: NLPData, H_qp, try_soc, duals):
        """Second-order correction QP (sqp_trust_region.jl:341-360):
        re-solve the subproblem with the constraint linearization shifted by
        the curvature residual at the trial point,  E_soc = g(x+p) - J p,
        and take the NEW solution as the full corrected step (the textbook
        SOC: at p_tilde = p the shifted row value is exactly g(x+p), so the
        re-solve bends the step to cancel the observed constraint curvature).

        DELIBERATE DEVIATION (bug fix, PARITY.md): the reference builds the
        identical shifted QP but then ADDS the base step on top of its
        solution (``p_soc .= p .+ p_new``, sqp_trust_region.jl:357) — with
        rows b = g(x+p) - Jp the QP variable is already the total step, so
        the reference's SOC trial is ~2x too long, lands far outside the
        curvature region, and is essentially always rejected (measured on
        the Maratos problem: |p_soc| = 2|p|, phi_soc far above phi — SOC
        never fires, the TR crawls through halvings instead;
        tests/test_soc.py pins the fixed behavior).

        Lanes whose step was accepted (or in FR) skip: when *no* lane needs
        the correction the SOC while_loop exits at trip 0, removing the
        unconditional second QP per iteration flagged in VERDICT r1."""
        E_soc = E_trial - jac_mv(st.J, st.p)
        rl = d.g_l - E_soc
        ru = d.g_u - E_soc
        lb, ub = _trust_region_box(st.x, d.x_l, d.x_u, st.tr)
        w = jnp.full((m,), w_big, dtype)
        # warm start from the QP being corrected: same Q/A/box, only the row
        # rhs moved by the curvature correction — the rejected step is the
        # natural primal guess for the corrected total step.
        init = None
        if params.qp_warm_start:
            y_w, zl_w, zu_w = duals
            init = dict(p=st.p, y=y_w, zl=zl_w, zu=zu_w, on=try_soc)
        tol_dyn = _adaptive_qp_tol(st)
        if structured:
            sol = solve_qp_structured(
                H_qp, st.J, st.df, rl, ru, lb, ub, w, ~try_soc, init, tol_dyn
            )
        else:
            sol = solve_qp(
                H_qp, st.df, st.J, rl, ru, lb, ub, w, opts=ipm_opts,
                skip=~try_soc, init=init, tol_override=tol_dyn,
            )
        return sol.p, sol.iters

    def qmodel(st: SqpState, p, d: NLPData, with_step):
        """q(p) = df'p + 1/2 p'Hp + mu * ||linearized viol||_1
        (sqp_trust_region.jl:487-508); q(0) = mu * ||viol at x||_1."""
        if with_step:
            qval = st.df @ p + 0.5 * p @ hess_mv(st.H, p)
            E_lin = st.E + jac_mv(st.J, p)
            x_t = st.x + p
        else:
            qval = jnp.asarray(0.0, dtype)
            E_lin = st.E
            x_t = st.x
        return qval + st.mu * viol1(E_lin, x_t, d)

    # ------------------------------------------------------------ logging ---
    def emit_log(st: SqpState, mark_fr, accepted_mark):
        if not log_iters:
            return

        def _print(it, acc, fr, f, phi, mu, lmax, tr, pnorm, pr, du):
            mark = "FR" if bool(fr) else "  "
            a = "a" if bool(acc) else "r"
            pr_s = f"{float(pr):6.8e}" if jnp.isfinite(pr) else "           Inf"
            du_s = f"{float(du):6.8e}" if jnp.isfinite(du) else "           Inf"
            print(
                f"{mark}{int(it):6d}{a}  {float(f):+6.8e}  {float(phi):+6.8e}"
                f"  {float(mu):+6.8e}  {float(lmax):+6.8e}  {float(tr):6.8e}"
                f"  {float(pnorm):6.8e}  {pr_s}  {du_s}"
                f"  {time.time() - solve_t0[0]:10.2f}"
            )

        lmax = jnp.maximum(
            _inf_norm(st.lam),
            jnp.maximum(_inf_norm(st.mult_lo), _inf_norm(st.mult_up)),
        )
        jax.debug.callback(
            _print,
            st.iter,
            accepted_mark,
            mark_fr,
            st.f,
            st.phi,
            st.mu,
            lmax,
            st.tr,
            _inf_norm(st.p),
            st.prim_infeas,
            st.dual_infeas,
            ordered=True,
        )

    # ------------------------------------------------------- statistics -----
    def init_stats():
        if not collect_stats:
            return None
        z = lambda: jnp.zeros((max_iter + 1,), dtype)
        return dict(
            f=z(), phi=z(), mu=z(), tr=z(), p_norm=z(),
            inf_pr=z(), inf_du=z(), qp_iters=z(),
            accepted=jnp.zeros((max_iter + 1,), jnp.int32),
            fr=jnp.zeros((max_iter + 1,), jnp.int32),
        )

    def record_stats(st: SqpState, qp_iters):
        if not collect_stats:
            return st.stats
        i = jnp.clip(st.iter, 0, max_iter)
        s = dict(st.stats)
        s["f"] = s["f"].at[i].set(st.f)
        s["phi"] = s["phi"].at[i].set(st.phi)
        s["mu"] = s["mu"].at[i].set(st.mu)
        s["tr"] = s["tr"].at[i].set(st.tr)
        s["p_norm"] = s["p_norm"].at[i].set(_inf_norm(st.p))
        s["inf_pr"] = s["inf_pr"].at[i].set(st.prim_infeas)
        s["inf_du"] = s["inf_du"].at[i].set(st.dual_infeas)
        s["qp_iters"] = s["qp_iters"].at[i].set(qp_iters.astype(dtype))
        s["accepted"] = s["accepted"].at[i].set(st.step_accepted.astype(jnp.int32))
        s["fr"] = s["fr"].at[i].set(st.fr.astype(jnp.int32))
        return s

    # ----------------------------------------------------------- the loop ---
    def stage_refresh(st: SqpState, d: NLPData) -> SqpState:
        """Stage 1: refresh evaluations iff the last step was accepted
        (sqp_trust_region.jl:134-138).  Idempotent while a QP is in flight
        (x/lam unchanged), which the micro-stepped driver relies on."""
        theta = d.theta

        def refresh(_):
            f, df, E, J, H = eval_all(st.x, st.lam, theta)
            prim = viol1(E, st.x, d)
            dual = kt_residuals_from_parts(
                df, st.lam, st.mult_up, st.mult_lo,
                jac_rmv(J, st.lam), jac_row_norms(J),
            )
            return f, df, E, J, H, prim, dual

        def keep(_):
            return st.f, st.df, st.E, st.J, st.H, st.prim_infeas, st.dual_infeas

        f, df, E, J, H, prim, dual = lax.cond(st.step_accepted, refresh, keep, None)
        return st._replace(
            f=f, df=df, E=E, J=J, H=H, prim_infeas=prim, dual_infeas=dual
        )

    def body(st: SqpState, d: NLPData) -> SqpState:
        st = stage_refresh(st, d)
        # 2. QP subproblem (compute_step!, :370-380)
        H_qp = convexify(st.H, st.iter)
        sol, qp_infeasible, qp_bad = solve_subproblem(st, d, H_qp)
        return stages_post_qp(st, d, H_qp, sol, qp_infeasible, qp_bad)

    def stages_post_qp(
        st: SqpState, d: NLPData, H_qp, sol, qp_infeasible, qp_bad
    ) -> SqpState:
        """Stages 2(tail)-9: dual/penalty bookkeeping, status triage,
        merit/convergence tests, step acceptance, TR update, counters."""
        theta = d.theta
        failed = jnp.logical_or(qp_infeasible, qp_bad)
        p = jnp.where(failed, 0.0, sol.p)
        p_lam = jnp.where(failed, 0.0, sol.y - st.lam)
        p_mlo = jnp.where(failed, 0.0, sol.mult_lo - st.mult_lo)
        p_mup = jnp.where(failed, 0.0, sol.mult_up - st.mult_up)
        mu = jnp.maximum(
            st.mu,
            jnp.maximum(
                _inf_norm(st.lam),
                jnp.maximum(_inf_norm(st.mult_lo), _inf_norm(st.mult_up)),
            ),
        )
        # Deviation (bug fix): also track the FRESH QP multipliers (with a
        # safety factor).  The reference updates mu from the stale duals
        # (sqp_trust_region.jl:378), which only refresh on acceptance — once
        # the true multiplier exceeds mu, the l1 penalty stops being exact,
        # pred < 0 rejects every step, the duals never refresh, and the solve
        # deadlocks (observed stalling hs014/hs015 at viol ~ 1e-6 forever).
        # FR iterations are excluded: restoration-phase duals are for a
        # different objective and would inflate mu spuriously.
        mu_fresh = 1.1 * jnp.maximum(
            _inf_norm(sol.y),
            jnp.maximum(_inf_norm(sol.mult_lo), _inf_norm(sol.mult_up)),
        )
        # growth clamp: one marginal QP can report outlier multipliers, and
        # since mu never decreases, an unclamped fresh-dual update would
        # poison the merit permanently (observed: case30 scenario lanes
        # jumping mu 4e2 -> 1.6e6 off a rejected step's duals, after which
        # every step is rejected and the KKT systems outrun f32 precision).
        # Genuine dual growth tracks the accepted iterates; a 1e4x headroom
        # over the accepted multipliers passes every legitimate jump in the
        # batteries while absorbing the spikes.
        mu_cap = 1.0e4 * (
            1.0
            + jnp.maximum(
                _inf_norm(st.lam),
                jnp.maximum(_inf_norm(st.mult_lo), _inf_norm(st.mult_up)),
            )
        )
        mu_fresh = jnp.minimum(mu_fresh, mu_cap)
        use_fresh = jnp.logical_and(~failed, ~st.fr)
        mu = jnp.maximum(mu, jnp.where(use_fresh, mu_fresh, 0.0))
        mu = jnp.minimum(mu, jnp.asarray(params.max_mu, dtype))
        st = st._replace(
            p=p, mu=mu, qp_iters_total=st.qp_iters_total + sol.iters
        )
        p_norm = _inf_norm(p)

        live = ~st.done

        # 3. status triage (sqp_trust_region.jl:144-178)
        #    3a. possibly unbounded: TR at max and step on its boundary.
        #    The boundary test is looser than the reference's isapprox
        #    (sqp_trust_region.jl:146): an interior-point QP leaves the step
        #    ~sqrt(mu) inside a *degenerately* active bound (zero multiplier,
        #    exactly the unbounded-descent case), so exact equality never
        #    fires.
        on_boundary_loose = p_norm >= (1.0 - 1.0e-5) * st.tr
        unbounded = jnp.logical_and(
            ~failed, jnp.logical_and(st.tr == tr_max, on_boundary_loose)
        )
        set_unbounded = jnp.logical_and(live, unbounded)
        st = st._replace(
            ret=jnp.where(set_unbounded, Status.DIVERGING_ITERATES, st.ret),
            done=jnp.logical_or(st.done, set_unbounded),
        )
        live = ~st.done

        #    3b. infeasible QP: enter FR, or fail out of FR (:151-168)
        fr_fail = jnp.logical_and(qp_infeasible, st.fr)
        fr_fail_ret = jnp.where(
            st.prim_infeas <= tol_inf,
            Status.FEASIBLE_POINT_FOUND,
            Status.INFEASIBLE_PROBLEM_DETECTED,
        )
        set_fr_fail = jnp.logical_and(live, fr_fail)
        st = st._replace(
            ret=jnp.where(set_fr_fail, fr_fail_ret, st.ret),
            done=jnp.logical_or(st.done, set_fr_fail),
        )
        live = ~st.done
        fr_enter = jnp.logical_and(live, jnp.logical_and(qp_infeasible, ~st.fr))
        # re-base the merit to the FR merit (pure l1 violation) on entry.
        # Deviation (bug fix): the reference only refreshes phi after an
        # accepted step, so FR entered right after a rejection compares FR
        # trial merits against the stale f + mu*viol value and rejects every
        # restoration step until the TR collapses.
        phi_fr = viol1(st.E, st.x, d)
        st = st._replace(
            fr=jnp.logical_or(st.fr, fr_enter),
            phi=jnp.where(fr_enter, phi_fr, st.phi),
            n_fr_iters=st.n_fr_iters + fr_enter.astype(jnp.int32),
        )

        #    3c. unexpected QP status (:169-178); reference's dead assignment
        #        ret == -3 is fixed to an assignment here (module docstring).
        #        Deviation (robustness, PARITY.md): the reference aborts on
        #        ANY unexpected QP status because its subproblem solver is
        #        Ipopt — an Ipopt failure is terminal.  The in-framework
        #        f32-factorized IPM can instead stall *transiently* on a hard
        #        barrier system; a stalled QP is handled like a rejected step
        #        (TR halved — the tighter TR box regularizes the next QP) and
        #        only _QP_BAD_MAX consecutive stalls are fatal.
        n_qp_bad = jnp.where(qp_bad, st.n_qp_bad + 1, 0).astype(jnp.int32)
        fatal_bad = jnp.logical_and(qp_bad, n_qp_bad >= _QP_BAD_MAX)
        bad_retry = jnp.logical_and(
            live, jnp.logical_and(qp_bad, ~fatal_bad)
        )
        bad_ret = jnp.where(
            st.prim_infeas <= tol_inf * 10.0,
            Status.FEASIBLE_POINT_FOUND,
            Status.ERROR_IN_STEP_COMPUTATION,
        )
        set_bad = jnp.logical_and(live, fatal_bad)
        st = st._replace(
            n_qp_bad=n_qp_bad,
            ret=jnp.where(set_bad, bad_ret, st.ret),
            done=jnp.logical_or(st.done, set_bad),
            tr=jnp.where(
                bad_retry,
                jnp.maximum(0.5 * st.tr, 0.1 * tol_dir),
                st.tr,
            ),
            step_accepted=jnp.where(bad_retry, False, st.step_accepted),
            n_reject=st.n_reject + bad_retry.astype(jnp.int32),
        )
        live = ~st.done
        # FR entry and stalled-QP retries skip the rest of the iteration
        # (the `continue` at :167)
        live_step = jnp.logical_and(
            live, jnp.logical_and(~fr_enter, ~bad_retry)
        )

        # 4. refresh merit after accepted steps (:180-182), with current mu
        phi_new = merit(st.f, st.E, st.x, st.mu, st.fr, d)
        st = st._replace(
            phi=jnp.where(
                jnp.logical_and(live_step, st.step_accepted), phi_new, st.phi
            )
        )

        emit_log(st, st.fr, st.step_accepted)
        st = st._replace(stats=record_stats(st, sol.iters))

        # 5. tiny-direction test (:187-196): in FR exit restoration and
        #    continue; otherwise converged.
        #    Deviation (improvement): a tiny FR direction at a point that is
        #    still infeasible means restoration converged to a local minimizer
        #    of infeasibility -> Infeasible_Problem_Detected.  The reference
        #    exits FR and re-enters it forever (2 iterations per cycle) until
        #    the iteration limit.
        tiny = p_norm <= tol_dir
        tiny_live = jnp.logical_and(live_step, tiny)
        fr_tiny = jnp.logical_and(tiny_live, st.fr)
        # "genuinely infeasible" needs clear margin over tol_infeas: near a
        # solution with active constraints, prim_infeas sits slightly above
        # tol while the iterates are fine — those cases exit FR and continue
        fr_stuck = jnp.logical_and(
            fr_tiny, st.prim_infeas > jnp.sqrt(jnp.asarray(tol_inf, dtype))
        )
        fr_exit_tiny = jnp.logical_and(fr_tiny, ~fr_stuck)
        conv_tiny = jnp.logical_and(tiny_live, ~st.fr)
        # symmetric merit re-base when leaving FR and continuing normally
        phi_normal = st.f + st.mu * viol1(st.E, st.x, d)
        st = st._replace(
            fr=jnp.logical_and(st.fr, ~fr_exit_tiny),
            phi=jnp.where(fr_exit_tiny, phi_normal, st.phi),
            ret=jnp.where(
                conv_tiny,
                Status.SOLVE_SUCCEEDED,
                jnp.where(fr_stuck, Status.INFEASIBLE_PROBLEM_DETECTED, st.ret),
            ),
            done=jnp.logical_or(st.done, jnp.logical_or(conv_tiny, fr_stuck)),
        )
        live_step = jnp.logical_and(live_step, ~tiny)

        # 6. KKT convergence test (:198-204)
        kkt_ok = jnp.logical_and(
            st.prim_infeas <= tol_inf,
            jnp.logical_and(
                st.dual_infeas <= tol_res,
                jnp.logical_and(~on_boundary_loose, ~st.fr),
            ),
        )
        conv_kkt = jnp.logical_and(live_step, kkt_ok)
        st = st._replace(
            ret=jnp.where(conv_kkt, Status.SOLVE_SUCCEEDED, st.ret),
            done=jnp.logical_or(st.done, conv_kkt),
        )
        live_step = jnp.logical_and(live_step, ~kkt_ok)

        # 7. do_step! — accept/reject with optional SOC (:515-579)
        x_t = st.x + st.p
        f_t, E_t = obj_cons(x_t, theta)
        phi_t = merit(f_t, E_t, x_t, st.mu, st.fr, d)
        ared = st.phi - phi_t
        q0 = qmodel(st, st.p, d, with_step=False)
        qk = qmodel(st, st.p, d, with_step=True)
        pred = jnp.where(st.fr, jnp.asarray(1.0, dtype), q0 - qk)
        rho = ared / pred
        accept = jnp.logical_and(ared > 0.0, rho > 0.0)

        new_x = x_t
        new_lam = st.lam + p_lam
        new_mlo = st.mult_lo + p_mlo
        new_mup = st.mult_up + p_mup
        soc_accept = jnp.array(False)
        soc_qp_iters = jnp.array(0, jnp.int32)

        if use_soc:
            # SOC trial on rejection with constraint violation, outside FR
            # (:543-572).  Branch-free: the SOC QP is solved unconditionally
            # and the result is select-merged (batched instances diverge).
            c_k = viol1(E_t, x_t, d)
            try_soc = jnp.logical_and(
                jnp.logical_and(~accept, c_k > 0.0), ~st.fr
            )
            try_soc = jnp.logical_and(try_soc, live_step)
            p_soc, soc_qp_iters = solve_soc(
                st, E_t, d, H_qp, try_soc, (new_lam, new_mlo, new_mup)
            )
            x_soc = st.x + p_soc
            f_soc, E_soc_t = obj_cons(x_soc, theta)
            phi_soc = merit(f_soc, E_soc_t, x_soc, st.mu, st.fr, d)
            ared_soc = st.phi - phi_soc
            q_soc = qmodel(st, p_soc, d, with_step=True)
            pred_soc = jnp.where(st.fr, jnp.asarray(1.0, dtype), q0 - q_soc)
            rho_soc = ared_soc / pred_soc
            soc_accept = jnp.logical_and(
                try_soc, jnp.logical_and(ared_soc > 0.0, rho_soc > 0.0)
            )
            if os.environ.get("SQP_DEBUG_SOC"):  # trace-time debug aid
                jax.debug.callback(
                    lambda *a: print(
                        "SOC dbg: try=%s ck=%.3e ared=%.3e pred=%.3e "
                        "|p|=%.3e |psoc|=%.3e phi=%.6f phit=%.6f phisoc=%.6f"
                        % a
                    ),
                    try_soc, c_k, ared_soc, pred_soc,
                    _inf_norm(st.p), _inf_norm(p_soc), st.phi, phi_t, phi_soc,
                    ordered=True,
                )
            new_x = jnp.where(soc_accept, x_soc, new_x)

        any_accept = jnp.logical_or(accept, soc_accept)
        # TR update: expand only on a plain accept that hit the boundary
        # (same IPM-aware boundary test as stage 3a)
        tr_exp = jnp.where(
            jnp.logical_and(accept, on_boundary_loose),
            jnp.minimum(2.0 * st.tr, tr_max),
            st.tr,
        )
        tr_shrink = jnp.maximum(
            0.5 * jnp.minimum(st.tr, p_norm), 0.1 * tol_dir
        )
        new_tr = jnp.where(any_accept, tr_exp, tr_shrink)

        upd = jnp.logical_and(live_step, any_accept)
        st = st._replace(
            x=jnp.where(upd, new_x, st.x),
            lam=jnp.where(upd, new_lam, st.lam),
            mult_lo=jnp.where(upd, new_mlo, st.mult_lo),
            mult_up=jnp.where(upd, new_mup, st.mult_up),
            tr=jnp.where(live_step, new_tr, st.tr),
            step_accepted=jnp.where(live_step, any_accept, st.step_accepted),
            n_accept=st.n_accept + upd.astype(jnp.int32),
            n_reject=st.n_reject
            + jnp.logical_and(live_step, ~any_accept).astype(jnp.int32),
            n_soc_accept=st.n_soc_accept
            + jnp.logical_and(live_step, soc_accept).astype(jnp.int32),
            qp_iters_total=st.qp_iters_total
            + jnp.where(live_step, soc_qp_iters, 0) * use_soc,
        )

        # 8. filterSQP-style FR exit on an accepted step (:209-211)
        st = st._replace(
            fr=jnp.logical_and(st.fr, ~jnp.logical_and(live_step, any_accept))
        )

        # 9. iteration counter (also counts the FR-entry and FR-exit
        #    `continue` iterations, :166/:191/:213)
        return st._replace(iter=st.iter + jnp.where(live, 1, 0).astype(jnp.int32))

    # ------------------------------------------------------ initialization --
    def init_state(d: NLPData) -> SqpState:
        theta = d.theta
        x0 = initial_point(d)
        # dual warm start (reference MOI_wrapper.jl:1200-1222)
        lam = (
            jnp.zeros((m,), dtype)
            if d.lam0 is None
            else jnp.asarray(d.lam0, dtype)
        )
        # The first body iteration always refreshes (step_accepted=True at
        # init, sqp_trust_region.jl:71), so the derivative state can start as
        # zeros — only f0 (NaN check, :113-115) and E0/J0 (initial
        # projection) are actually read before the refresh.  Skipping the
        # full eval_all here keeps ONE lowered copy of the AD bundle in the
        # program (the init call site batches `lam` differently under vmap,
        # which would defeat the jit call-site dedup — see eval_all above).
        if n_lin > 0 and params.init_projection != "off" and not structured:
            f0, df0, E0, J0, H0 = eval_all(x0, lam, theta)
        else:
            f0, E0 = obj_cons(x0, theta)
            df0 = jnp.zeros((n,), dtype)
            if structured:
                J0 = (
                    jnp.zeros((bs.P, bs.mr, bs.nd), dtype),
                    jnp.zeros((bs.P, bs.mr, bs.ns), dtype),
                )
                H0 = zero_hess(dtype)
            else:
                J0 = jnp.zeros((m, n), dtype)
                H0 = jnp.zeros((n, n), dtype)
        mlo = jnp.zeros((n,), dtype)
        mup = jnp.zeros((n,), dtype)

        # linear-feasibility projection (sqp_trust_region.jl:111-122,:264-304).
        # Structured mode skips it: the projection QP would need a dense
        # Jacobian; supply a linear-feasible x0 instead (ACOPF starts are).
        if n_lin > 0 and params.init_projection != "off" and not structured:
            lpviol = jnp.sum(
                jnp.maximum(0.0, d.g_l[:n_lin] - E0[:n_lin])
                + jnp.maximum(0.0, E0[:n_lin] - d.g_u[:n_lin])
            ) + jnp.sum(
                jnp.maximum(0.0, d.x_l - x0) + jnp.maximum(0.0, x0 - d.x_u)
            )

            # min ||x - x0||^2 over linear rows + bounds: Q=2I, c=-2 x0;
            # nonlinear rows are freed by +-inf row bounds (they decouple).
            # Lanes already linear-feasible skip (trip count 0).
            do_proj = lpviol > tol_inf
            rl = jnp.where(is_linear_row, d.g_l, -jnp.inf)
            ru = jnp.where(is_linear_row, d.g_u, jnp.inf)
            w = jnp.full((m,), w_big, dtype)
            proj = solve_qp(
                2.0 * jnp.eye(n, dtype=dtype),
                -2.0 * x0,
                J0,
                rl,
                ru,
                d.x_l,
                d.x_u,
                w,
                opts=ipm_opts,
                skip=~do_proj,
            )
            x0 = jnp.where(do_proj, _dropzeros(proj.p), x0)
            lam = jnp.where(do_proj, _dropzeros(proj.y), lam)
            mlo = jnp.where(do_proj, _dropzeros(proj.mult_lo), mlo)
            mup = jnp.where(do_proj, _dropzeros(proj.mult_up), mup)

        nan_f = ~jnp.isfinite(f0)

        return SqpState(
            x=x0,
            lam=lam,
            mult_lo=mlo,
            mult_up=mup,
            f=f0,
            df=df0,
            E=E0,
            J=J0,
            H=H0,
            prim_infeas=jnp.asarray(jnp.inf, dtype),
            dual_infeas=jnp.asarray(jnp.inf, dtype),
            p=jnp.zeros((n,), dtype),
            phi=jnp.asarray(1.0e20, dtype),  # sqp_trust_region.jl:66
            mu=jnp.asarray(params.init_mu, dtype),
            tr=jnp.asarray(params.tr_size, dtype),
            step_accepted=jnp.array(True),  # :71 — forces first-iter evals
            fr=jnp.array(False),
            iter=jnp.array(1, jnp.int32),
            ret=jnp.where(
                nan_f,
                jnp.asarray(Status.INVALID_NUMBER_DETECTED, jnp.int32),
                jnp.asarray(Status.OPTIMIZE_NOT_CALLED, jnp.int32),
            ),
            done=nan_f,
            qp_iters_total=jnp.array(0, jnp.int32),
            n_accept=jnp.array(0, jnp.int32),
            n_reject=jnp.array(0, jnp.int32),
            n_soc_accept=jnp.array(0, jnp.int32),
            n_fr_iters=jnp.array(0, jnp.int32),
            n_qp_bad=jnp.array(0, jnp.int32),
            stats=init_stats(),
        )

    # ------------------------------------------------------------- driver ---
    def run_until(st: SqpState, d: NLPData, limit) -> SqpState:
        """Advance the loop until done or ``iter > limit`` (jittable; the
        chunked form behind checkpoint/resume, utils/checkpoint.py)."""

        def cond_fn(st: SqpState):
            return jnp.logical_and(~st.done, st.iter <= limit)

        # NB: a plain closure, NOT functools.partial(body, d=d) — jax's
        # debug_info reprs partial-bound arguments, and repr of an
        # array-holding pytree forces device fetches of traced values
        # (observed deadlocking under pytest's output capture).
        return lax.while_loop(cond_fn, lambda s: body(s, d), st)

    # ------------------------------------------- micro-stepped driver ------
    # Dense backend only: the structured (BBD) path needs no f64 rescue with
    # the ladder shift (BASELINE.md r4: case118 structured+ladder converges
    # rescue-free), so the watchdog-atomic-QP problem is a dense-path one.
    def micro_init(d: NLPData) -> MicroState:
        st = init_state(d)
        H_qp = convexify(st.H, st.iter)
        Q, cq, rl, ru, lb, ub, wq, initq, tol_dyn, _ = subproblem_inputs(
            st, d, H_qp
        )
        qp0 = qp_micro_template(
            Q, cq, st.J, rl, ru, lb, ub, wq, opts=ipm_opts,
            skip=jnp.array(True), init=initq, tol_override=tol_dyn,
        )
        return MicroState(sqp=st, qp=qp0, qp_active=jnp.array(False))

    def micro_step(ms: MicroState, d: NLPData, trip_cap) -> MicroState:
        """One bounded device call of the micro-stepped state machine:

        * fresh lanes (no QP in flight) run stage 1, build their QP, run the
          cheap f32 phase 1 and the phase-2 entry transition;
        * every lane with an unfinished QP then advances the f64 phase-2
          loop by at most ``trip_cap`` trips (traced scalar — one compile
          covers every cap);
        * lanes whose QP finished complete the SQP iteration (stages 3-9);
          the rest keep their IPM state and do NOT advance ``iter``.

        The QP problem data is rebuilt from the (frozen) SQP state each
        call — bit-identical inputs, only the IPM state travels.  The SOC
        QP, when enabled, still runs atomically inside the completing call.
        """
        st = stage_refresh(ms.sqp, d)
        H_qp = convexify(st.H, st.iter)
        Q, cq, rl, ru, lb, ub, wq, initq, tol_dyn, freed = subproblem_inputs(
            st, d, H_qp
        )
        kw = dict(opts=ipm_opts, init=initq, tol_override=tol_dyn)
        skip_fresh = jnp.logical_or(st.done, ms.qp_active)
        qp_fresh = qp_micro_start(
            Q, cq, st.J, rl, ru, lb, ub, wq, skip=skip_fresh, **kw
        )
        ipm = jax.tree.map(
            lambda a, b: jnp.where(ms.qp_active, a, b), ms.qp, qp_fresh
        )
        ipm = qp_micro_resume(
            ipm, Q, cq, st.J, rl, ru, lb, ub, wq, trip_cap=trip_cap,
            skip=st.done, **kw
        )
        finished = qp_micro_done(ipm, ipm_opts)
        sol = qp_micro_finalize(
            ipm, Q, cq, st.J, rl, ru, lb, ub, wq, skip=st.done, **kw
        )
        sol, qp_infeasible, qp_bad = triage_subproblem(st, d, sol, freed)
        st2 = stages_post_qp(st, d, H_qp, sol, qp_infeasible, qp_bad)
        adv = jnp.logical_or(st.done, finished)
        new_sqp = jax.tree.map(
            lambda a, b: jnp.where(adv, a, b), st2, st
        )
        return MicroState(
            sqp=new_sqp,
            qp=ipm,
            qp_active=jnp.logical_and(~adv, ~st.done),
        )

    def finalize(st: SqpState, d: NLPData) -> SqpResult:
        # iteration-limit downgrade (sqp.jl:215-224)
        hit_limit = ~st.done
        limit_ret = jnp.where(
            st.prim_infeas <= tol_inf,
            Status.FEASIBLE_POINT_FOUND,
            Status.MAXIMUM_ITERATIONS_EXCEEDED,
        )
        ret = jnp.where(hit_limit, limit_ret, st.ret)

        # write-back (run! :215-222); g re-evaluated at the final x
        obj_val, g_out = obj_cons(st.x, d.theta)
        obj_out = -obj_val if nlp.maximize else obj_val

        return SqpResult(
            x=st.x,
            obj_val=obj_out,
            status=ret,
            g=g_out,
            mult_g=st.lam,
            mult_x_L=st.mult_lo,
            mult_x_U=st.mult_up,
            iterations=st.iter,
            prim_infeas=st.prim_infeas,
            dual_infeas=st.dual_infeas,
            qp_iters_total=st.qp_iters_total,
            n_accept=st.n_accept,
            n_reject=st.n_reject,
            n_soc_accept=st.n_soc_accept,
            n_fr_iters=st.n_fr_iters,
            stats=st.stats,
        )

    def solve(d: NLPData) -> SqpResult:
        return finalize(run_until(init_state(d), d, max_iter), d)

    def solve_with_clock(d: NLPData) -> SqpResult:
        solve_t0[0] = time.time()
        if log_iters:
            print(
                f"  {'iter':>6}   {'f(x_k)':>15}  {'phi(x_k)':>15}  {'mu':>15}"
                f"  {'|lam|inf':>15}  {'Delta':>14}  {'|p|':>14}"
                f"  {'inf_pr':>14}  {'inf_du':>14}  {'time':>10}"
            )
        return solve(d)

    solve_with_clock._raw = solve  # batched/sharded paths use the pure fn
    # chunked-stepping handles for checkpoint/resume (utils/checkpoint.py)
    solve_with_clock._init_state = init_state
    solve_with_clock._run_until = run_until
    solve_with_clock._finalize = finalize
    # micro-stepped handles (parallel/batch.py micro_trips mode)
    solve_with_clock._micro_init = micro_init
    solve_with_clock._micro_step = micro_step
    solve_with_clock._micro_supported = not structured
    return solve_with_clock
