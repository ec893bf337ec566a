"""Line-search SQP driver (algorithm="SQP-LS").

A working, TPU-native realization of the reference's line-search variant
``/root/reference/src/algorithms/sqp_line_search.jl`` — dead code upstream
(its include is commented out at ``sqp.jl:226`` and its constructor references
a stale 3-parameter Model type, SURVEY §2.1), kept there as the spec for an LS
mode.  Semantics implemented from that spec:

* QP subproblem with a fixed box |p| <= 1000 (``sqp_line_search.jl:255``)
* per-constraint vector penalty ``mu`` with update rule 2
  (``compute_mu_rule2!``, ``:279-291``): first iteration sets
  ``mu_i = (df'p + max(0.5 p'Hp, 0)) / max((1-rho) viol_1, 1e-8)``,
  afterwards ``mu_i = max(mu_i, |lambda_i|)``
* Armijo backtracking on the l1 merit: ``alpha <- tau * alpha`` until
  ``phi(x + alpha p) <= phi + eta * alpha * D`` with
  ``D = df'p - mu . viol`` (``compute_alpha``, ``:303-334``; merit.jl:13-17)
* second-order correction step on line-search failure (``:210-223``), then
  ``x += alpha p + soc``
* multipliers replaced (not incremented) by the QP duals each iteration
  (``:127``)
* convergence: tiny direction, or prim-infeasibility (inf-norm, ``:120``)
  + complementarity + dual residual (``:172-192``); FR entry/exit as in the
  TR driver.

Like the TR driver it is branch-free (vmap-safe) and jit-compiles to a single
``lax.while_loop`` program.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..nlp import NLP, NLPData, initial_point
from ..ops.qp_ipm import IpmOptions, solve_qp
from ..parameters import Parameters
from ..status import Status
from .common import (
    constraint_violation,
    kt_residuals,
    norm_complementarity,
    norm_violations,
    schur_cap_for,
)

Array = jax.Array

_LS_TR = 1000.0  # fixed step box of the LS subproblem (sqp_line_search.jl:255)


class LsState(NamedTuple):
    x: Array
    lam: Array
    mult_lo: Array
    mult_up: Array
    mu: Array  # per-constraint penalties (vector)
    f: Array
    prim_infeas: Array
    dual_infeas: Array
    compl: Array
    p: Array
    phi: Array
    alpha: Array
    fr: Array
    iter: Array
    ret: Array
    done: Array
    qp_iters_total: Array
    n_soc: Array


def make_ls_solver(
    nlp: NLP,
    params: Parameters = Parameters(algorithm="SQP-LS"),
    *,
    verbose: Optional[bool] = None,
):
    n, m = nlp.n, nlp.m
    n_lin = nlp.num_linear
    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    if params.dtype == "float64" and not jax.config.jax_enable_x64:
        raise RuntimeError(
            "Parameters.dtype='float64' requires jax x64: call "
            "sqpsolver_tpu.enable_x64() first, or choose dtype='float32'."
        )
    exact_hessian = params.hessian_type == "exact"
    log_iters = bool(params.OutputFlag) if verbose is None else verbose

    # dtype-aware QP tolerance floor: float32 cannot reach 1e-10 residuals
    # (~30*eps is the practical interior-point limit per dtype), and
    # float32-factorized mixed-precision refinement bottoms out around 1e-6
    # on barrier-ill-conditioned KKT systems — ample for the 1e-6/1e-4
    # ACOPF tolerance regime; use direct float64 for 1e-8-grade solves
    qp_tol_eff = max(params.qp_tol, 30.0 * float(jnp.finfo(dtype).eps))
    polish = params.kkt_precision == "mixed_polish" and dtype == jnp.float64
    if params.kkt_precision.startswith("mixed") and not polish:
        qp_tol_eff = max(qp_tol_eff, 2.0e-6)
    ipm_opts = IpmOptions(
        max_iter=params.qp_max_iter,
        tol=qp_tol_eff,
        ftb=params.qp_ftb,
        factor_dtype=(
            "float32" if params.kkt_precision.startswith("mixed") else "same"
        ),
        ir_steps=(
            # capped Schur set => harder K systems => >= 4 sweeps (see sqp_tr)
            max(4, params.kkt_ir_steps)
            if (
                params.kkt_precision == "mixed_plane"
                or schur_cap_for(params, nlp)
            )
            else params.kkt_ir_steps
        ),
        kkt_backend=params.kkt_backend,
        plane=params.kkt_precision == "mixed_plane",
        # 20 = mixed_polish floor->tol phase; 8 = stall rescue (see sqp_tr)
        polish_iters=(
            20
            if polish
            else (
                8
                if (
                    params.kkt_precision.startswith("mixed")
                    and not params.kkt_structured
                    and dtype == jnp.float64
                )
                else 0
            )
        ),
        # bounded Schur set for the f32-factorized fast path (see sqp_tr /
        # qp_ipm.IpmOptions.schur_cap); overflow rows fold with bounded 1/E
        invE_floor=3.0e-7 if schur_cap_for(params, nlp) else 0.0,
        schur_cap=schur_cap_for(params, nlp),
    )
    w_big = jnp.asarray(params.elastic_weight, dtype)
    is_linear_row = jnp.arange(m) < n_lin
    eta = params.eta
    tau = params.tau
    rho = params.rho
    min_alpha = params.min_alpha
    max_iter = params.max_iter
    # number of backtracking steps to reach min_alpha: tau^k < min_alpha
    import math

    n_bt = max(1, int(math.ceil(math.log(max(min_alpha, 1e-16)) / math.log(tau))))

    solve_t0 = [0.0]

    def eval_all(x, lam, theta):
        f, df = nlp.obj_grad(x, theta)
        E = nlp.cons(x, theta)
        J = nlp.cons_jac(x, theta)
        if exact_hessian:
            H = nlp.lag_hess(x, lam, theta)
        else:
            H = jnp.zeros((n, n), dtype)
        return f, df, E, J, H

    def convexify(H):
        if not exact_hessian:
            return H
        with jax.default_matmul_precision("float32"):
            return _convexify_impl(H)

    def _convexify_impl(H):
        if params.hessian_shift == "ladder":
            # minimal-shift mode (see sqp_tr._convexify_impl): only the
            # f32-factorability floor; the KKT delta ladder does the
            # inertia correction per interior-point iteration
            off = jnp.sum(jnp.abs(H), axis=1) - jnp.abs(jnp.diagonal(H))
            scale = 1.0 + jnp.max(jnp.abs(jnp.diagonal(H)) + off, initial=0.0)
            return H + (4.0e-7 * scale) * jnp.eye(n, dtype=dtype)
        if params.hessian_shift == "gershgorin":
            # lambda_min >= min_i (H_ii - sum_{j != i} |H_ij|): conservative
            # (can over-shift by orders of magnitude -> damped steps) but a
            # single cheap pass
            off = jnp.sum(jnp.abs(H), axis=1) - jnp.abs(jnp.diagonal(H))
            lmin = jnp.min(jnp.diagonal(H) - off, initial=0.0)
        elif params.hessian_shift == "power":
            # Lanczos lower bound on lambda_min — see
            # common.lanczos_lmin_bound (a plain power iteration on
            # sigma I - H under-estimates clustered negative eigenvalues)
            from .common import lanczos_lmin_bound

            lmin = lanczos_lmin_bound(
                lambda vv: H @ vv, n, dtype,
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
        shift = jnp.maximum(0.0, -lmin) + jnp.where(
            lmin < 1e-8, 1e-8 * (1.0 + jnp.abs(lmin)), 0.0
        )
        return H + shift * jnp.eye(n, dtype=dtype)

    def merit(f_val, E_val, x_val, mu_vec, fr, d: NLPData):
        """phi = f + mu . viol (vector penalty); pure sum-of-violations in FR
        (sqp.jl:170-183 with the LS vector mu)."""
        cv = constraint_violation(E_val, d.g_l, d.g_u)
        bv = jnp.sum(
            jnp.maximum(0.0, d.x_l - x_val) + jnp.maximum(0.0, x_val - d.x_u)
        )
        mu_max = jnp.max(mu_vec, initial=1.0)
        phi = jnp.where(
            fr,
            jnp.sum(cv) + bv,
            f_val + jnp.sum(mu_vec * cv) + mu_max * bv,
        )
        return jnp.where(jnp.isfinite(phi), phi, jnp.asarray(jnp.inf, dtype))

    def _adaptive_qp_tol(prim, dual):
        """Inexact-SQP forcing sequence (see sqp_tr._adaptive_qp_tol)."""
        if params.qp_tol_adaptive <= 0.0:
            return None
        return jnp.clip(
            jnp.asarray(params.qp_tol_adaptive, dtype)
            * jnp.maximum(prim, dual),
            0.0,
            1.0e-3,
        )

    def solve_subproblem(x, df, E, J, H_qp, fr, d: NLPData, skip=None,
                         init=None, tol_override=None):
        rl = d.g_l - E
        ru = d.g_u - E
        v_lb = d.x_l - x
        v_ub = d.x_u - x
        lb = jnp.maximum(-_LS_TR, v_lb)
        ub = jnp.minimum(_LS_TR, v_ub)
        bad = lb > ub
        lb = jnp.where(bad, jnp.maximum(-_LS_TR, jnp.minimum(0.0, v_lb)), lb)
        ub = jnp.where(bad, jnp.minimum(_LS_TR, jnp.maximum(0.0, v_ub)), ub)
        violated = jnp.logical_or(E < d.g_l, E > d.g_u)
        freed = jnp.logical_and(violated, ~is_linear_row)
        w = jnp.where(
            fr, jnp.where(freed, jnp.asarray(1.0, dtype), w_big), w_big
        )
        Q = jnp.where(fr, jnp.zeros_like(H_qp), H_qp)
        c = jnp.where(fr, jnp.zeros_like(df), df)
        sol = solve_qp(
            Q, c, J, rl, ru, lb, ub, w, opts=ipm_opts, skip=skip, init=init,
            tol_override=tol_override,
        )
        # drop step-box duals that belong to the fixed |p|<=1000 box rather
        # than a true variable bound (see sqp_tr.solve_subproblem)
        sol = sol._replace(
            mult_lo=jnp.where(v_lb >= -_LS_TR, sol.mult_lo, 0.0),
            mult_up=jnp.where(v_ub <= _LS_TR, sol.mult_up, 0.0),
        )
        hard = jnp.where(fr, ~freed, jnp.ones((m,), bool))
        hard_slack = jnp.max(
            jnp.where(hard, sol.slack_u + sol.slack_v, 0.0), initial=0.0
        )
        rough = jnp.sqrt(jnp.asarray(qp_tol_eff, dtype))
        rough_exit = jnp.logical_and(
            ~sol.converged,
            jnp.logical_or(sol.pri_res > rough, sol.dual_res > rough),
        )
        # slack mass certifies infeasibility only on a non-rough QP exit
        # (see sqp_tr.solve_subproblem: a rough f32 exit leaves arbitrary
        # slack values; it goes down the stalled-QP path instead)
        infeasible = jnp.logical_and(
            hard_slack > params.qp_infeas_tol, ~rough_exit
        )
        return sol, infeasible, jnp.logical_and(rough_exit, ~infeasible)

    def emit_log(st: LsState):
        if not log_iters:
            return

        def _p(it, fr, f, phi, mu, al, pn, pr, du, co):
            mark = "FR" if bool(fr) else "  "
            print(
                f"{mark}{int(it):6d}  {float(f):+6.8e}  {float(phi):+6.8e}"
                f"  {float(mu):+6.8e}  {float(al):6.8e}  {float(pn):6.8e}"
                f"  {float(pr):6.8e}  {float(du):.8e}  {float(co):6.8e}"
                f"  {time.time() - solve_t0[0]:10.2f}"
            )

        jax.debug.callback(
            _p, st.iter, st.fr, st.f, st.phi,
            jnp.max(st.mu, initial=0.0), st.alpha,
            jnp.max(jnp.abs(st.p), initial=0.0),
            st.prim_infeas, st.dual_infeas, st.compl, ordered=True,
        )

    def body(st: LsState, d: NLPData) -> LsState:
        theta = d.theta
        # LS evaluates every iteration (sqp_line_search.jl:118)
        f, df, E, J, H = eval_all(st.x, st.lam, theta)
        prim = norm_violations(E, d.g_l, d.g_u, st.x, d.x_l, d.x_u, ord=jnp.inf)
        dual = kt_residuals(df, st.lam, st.mult_up, st.mult_lo, J)
        compl = norm_complementarity(E, d.g_l, d.g_u, st.lam)
        st = st._replace(
            f=f, prim_infeas=prim, dual_infeas=dual, compl=compl,
            alpha=jnp.asarray(0.0, dtype),
        )

        H_qp = convexify(H)
        # dual warm start (Parameters.qp_warm_start; see sqp_tr): LS replaces
        # multipliers outright each iteration, so st.lam/mults are exactly
        # the previous QP's duals.  The primal stays cold — LS moves x every
        # iteration (alpha-damped), so the previous step is a weak guess.
        init = None
        if params.qp_warm_start:
            init = dict(
                p=jnp.zeros((n,), dtype),
                y=st.lam,
                zl=st.mult_lo,
                zu=st.mult_up,
                on=jnp.logical_and(st.iter > 1, ~st.fr),
            )
        sol, qp_infeasible, qp_bad = solve_subproblem(
            st.x, df, E, J, H_qp, st.fr, d, skip=st.done, init=init,
            tol_override=_adaptive_qp_tol(prim, dual),
        )
        failed = jnp.logical_or(qp_infeasible, qp_bad)
        p = jnp.where(failed, 0.0, sol.p)
        # LS replaces multipliers outright (:127)
        lam = jnp.where(failed, st.lam, sol.y)
        mlo = jnp.where(failed, st.mult_lo, sol.mult_lo)
        mup = jnp.where(failed, st.mult_up, sol.mult_up)
        st = st._replace(
            p=p, lam=lam, mult_lo=mlo, mult_up=mup,
            qp_iters_total=st.qp_iters_total + sol.iters,
        )
        live = ~st.done

        # triage (:137-160)
        fr_fail = jnp.logical_and(qp_infeasible, st.fr)
        fr_fail_ret = jnp.where(
            prim <= params.tol_infeas,
            Status.FEASIBLE_POINT_FOUND,
            Status.INFEASIBLE_PROBLEM_DETECTED,
        )
        set_ff = jnp.logical_and(live, fr_fail)
        st = st._replace(
            ret=jnp.where(set_ff, fr_fail_ret, st.ret),
            done=jnp.logical_or(st.done, set_ff),
        )
        live = ~st.done
        fr_enter = jnp.logical_and(live, jnp.logical_and(qp_infeasible, ~st.fr))
        st = st._replace(fr=jnp.logical_or(st.fr, fr_enter))
        bad_ret = jnp.where(
            prim <= params.tol_infeas,
            Status.FEASIBLE_POINT_FOUND,
            Status.ERROR_IN_STEP_COMPUTATION,
        )
        set_bad = jnp.logical_and(live, qp_bad)
        st = st._replace(
            ret=jnp.where(set_bad, bad_ret, st.ret),
            done=jnp.logical_or(st.done, set_bad),
        )
        live = ~st.done
        live_step = jnp.logical_and(live, ~fr_enter)

        # penalty update rule 2 (:279-291)
        cv = constraint_violation(E, d.g_l, d.g_u)
        viol1 = jnp.sum(cv) + jnp.sum(
            jnp.maximum(0.0, d.x_l - st.x) + jnp.maximum(0.0, st.x - d.x_u)
        )
        denom = jnp.maximum((1.0 - rho) * viol1, 1e-8)
        hess_part = jnp.maximum(0.5 * p @ (H @ p), 0.0)
        mu_init = jnp.full((m,), (df @ p + hess_part) / denom, dtype)
        mu_upd = jnp.maximum(st.mu, jnp.abs(lam))
        new_mu = jnp.where(st.iter == 1, mu_init, mu_upd)
        st = st._replace(mu=jnp.where(live_step, new_mu, st.mu))

        # merit + directional derivative (merit.jl:13-17; sqp.jl:190-213)
        phi = merit(f, E, st.x, st.mu, st.fr, d)
        slack_mass = jnp.sum(
            jnp.where(st.fr, sol.slack_u + sol.slack_v, 0.0)
        )
        dfp = jnp.where(st.fr, slack_mass, df @ p)
        mu_eff = jnp.where(st.fr, jnp.ones_like(st.mu), st.mu)
        D = dfp - jnp.sum(mu_eff * cv)
        st = st._replace(phi=jnp.where(live_step, phi, st.phi))

        # Armijo backtracking (compute_alpha, :303-334) as a bounded scan:
        # find the largest alpha in {1, tau, tau^2, ...} >= min_alpha with
        # phi(x + alpha p) <= phi + eta*alpha*D
        def try_alpha(alpha):
            x_t = st.x + alpha * p
            f_t = nlp.obj(x_t, theta)
            E_t = nlp.cons(x_t, theta)
            return merit(f_t, E_t, x_t, st.mu, st.fr, d)

        def bt_body(carry, _):
            alpha, accepted, alpha_best = carry
            phi_t = try_alpha(alpha)
            ok = phi_t <= phi + eta * alpha * D
            take = jnp.logical_and(ok, ~accepted)
            alpha_best = jnp.where(take, alpha, alpha_best)
            accepted = jnp.logical_or(accepted, ok)
            return (alpha * tau, accepted, alpha_best), None

        tiny_dir = jnp.max(jnp.abs(p), initial=0.0) <= params.tol_direction
        (_, ls_ok, alpha_best), _ = lax.scan(
            bt_body,
            (jnp.asarray(1.0, dtype), jnp.array(False), jnp.asarray(1.0, dtype)),
            None,
            length=n_bt,
        )
        ls_ok = jnp.logical_or(ls_ok, tiny_dir)  # (:307-309)
        alpha = jnp.where(tiny_dir, 1.0, alpha_best)
        st = st._replace(alpha=jnp.where(live_step, alpha, st.alpha))

        emit_log(st)

        # convergence (:172-192)
        tiny_live = jnp.logical_and(live_step, tiny_dir)
        fr_tiny = jnp.logical_and(tiny_live, st.fr)
        fr_stuck = jnp.logical_and(fr_tiny, prim > params.tol_infeas)
        conv_tiny = jnp.logical_and(tiny_live, ~st.fr)
        st = st._replace(
            fr=jnp.logical_and(st.fr, ~fr_tiny),
            ret=jnp.where(
                conv_tiny,
                Status.SOLVE_SUCCEEDED,
                jnp.where(fr_stuck, Status.INFEASIBLE_PROBLEM_DETECTED, st.ret),
            ),
            done=jnp.logical_or(st.done, jnp.logical_or(conv_tiny, fr_stuck)),
        )
        live_step = jnp.logical_and(live_step, ~tiny_dir)

        near_feas = jnp.logical_and(
            prim <= params.tol_infeas, compl <= params.tol_residual
        )
        fr_exit2 = jnp.logical_and(
            jnp.logical_and(live_step, near_feas), st.fr
        )
        conv_kkt = jnp.logical_and(
            jnp.logical_and(live_step, near_feas),
            jnp.logical_and(~st.fr, dual <= params.tol_residual),
        )
        st = st._replace(
            fr=jnp.logical_and(st.fr, ~fr_exit2),
            ret=jnp.where(conv_kkt, Status.SOLVE_SUCCEEDED, st.ret),
            done=jnp.logical_or(st.done, conv_kkt),
        )
        live_step = jnp.logical_and(
            live_step, jnp.logical_and(~conv_kkt, ~fr_exit2)
        )

        # SOC on line-search failure (:210-223).  The LS spec always
        # attempts SOC on failure, independent of the use_soc flag
        # (sqp_line_search.jl:211); branch-free select-merge.
        #
        # DELIBERATE DEVIATION (bug fix, PARITY.md; same fix as the TR
        # driver's solve_soc): with rows shifted by E_soc = g(x+p) - Jp the
        # corrected QP's solution IS the full corrected step (at z = p the
        # shifted row value is exactly g(x+p)), so the spec's update
        # ``x += alpha p + soc`` (sqp_line_search.jl:228, alpha forced to 1)
        # adds the base step twice and the SOC trial lands ~2x out.  Here
        # the SOC lanes take x + soc.
        x_p = st.x + p
        E_p = nlp.cons(x_p, theta)
        E_soc = E_p - J @ p
        rl = d.g_l - E_soc
        ru = d.g_u - E_soc
        v_lb = d.x_l - st.x
        v_ub = d.x_u - st.x
        lb = jnp.maximum(-_LS_TR, v_lb)
        ub = jnp.minimum(_LS_TR, v_ub)
        w = jnp.full((m,), w_big, dtype)
        need_soc = jnp.logical_and(live_step, ~ls_ok)
        # per-lane skip: when no lane failed its line search the SOC QP's
        # while_loop exits at trip 0 (same gating as the TR driver)
        soc_init = None
        if params.qp_warm_start:
            # duals from the QP this SOC corrects (lam == sol.y on the lanes
            # that reach here); the rejected step is the primal guess for
            # the corrected total step
            soc_init = dict(p=p, y=lam, zl=mlo, zu=mup, on=need_soc)
        soc_sol = solve_qp(
            H_qp, df, J, rl, ru, lb, ub, w, opts=ipm_opts, skip=~need_soc,
            init=soc_init,
        )
        soc = jnp.where(need_soc, soc_sol.p, 0.0)
        # SOC lanes take the corrected step INSTEAD of alpha*p (deviation
        # note above); non-SOC lanes keep their line-search alpha
        alpha = jnp.where(need_soc, 0.0, alpha)
        st = st._replace(
            n_soc=st.n_soc + need_soc.astype(jnp.int32),
            qp_iters_total=st.qp_iters_total
            + jnp.where(need_soc, soc_sol.iters, 0),
        )

        new_x = st.x + alpha * p + soc
        st = st._replace(x=jnp.where(live_step, new_x, st.x))
        return st._replace(
            iter=st.iter + jnp.where(live, 1, 0).astype(jnp.int32)
        )

    def init_state(d: NLPData) -> LsState:
        x0 = initial_point(d)
        f0 = nlp.obj(x0, d.theta)
        nan_f = ~jnp.isfinite(f0)
        return LsState(
            x=x0,
            lam=jnp.zeros((m,), dtype),
            mult_lo=jnp.zeros((n,), dtype),
            mult_up=jnp.zeros((n,), dtype),
            mu=jnp.full((m,), 10.0, dtype),  # sqp_line_search.jl:47
            f=f0,
            prim_infeas=jnp.asarray(jnp.inf, dtype),
            dual_infeas=jnp.asarray(jnp.inf, dtype),
            compl=jnp.asarray(jnp.inf, dtype),
            p=jnp.zeros((n,), dtype),
            phi=jnp.asarray(jnp.inf, dtype),
            alpha=jnp.asarray(1.0, dtype),
            fr=jnp.array(False),
            iter=jnp.array(1, jnp.int32),
            ret=jnp.where(
                nan_f,
                jnp.asarray(Status.INVALID_NUMBER_DETECTED, jnp.int32),
                jnp.asarray(Status.OPTIMIZE_NOT_CALLED, jnp.int32),
            ),
            done=nan_f,
            qp_iters_total=jnp.array(0, jnp.int32),
            n_soc=jnp.array(0, jnp.int32),
        )

    def solve(d: NLPData):
        from .sqp_tr import SqpResult

        st0 = init_state(d)

        def cond_fn(st: LsState):
            return jnp.logical_and(~st.done, st.iter <= max_iter)

        # plain closure, not functools.partial — see sqp_tr.py solve()
        st = lax.while_loop(cond_fn, lambda s: body(s, d), st0)
        hit_limit = ~st.done
        limit_ret = jnp.where(
            st.prim_infeas <= params.tol_infeas,
            Status.FEASIBLE_POINT_FOUND,
            Status.MAXIMUM_ITERATIONS_EXCEEDED,
        )
        ret = jnp.where(hit_limit, limit_ret, st.ret)
        obj_val = nlp.obj(st.x, d.theta)
        obj_out = -obj_val if nlp.maximize else obj_val
        return SqpResult(
            x=st.x,
            obj_val=obj_out,
            status=ret,
            g=nlp.cons(st.x, d.theta),
            mult_g=st.lam,
            mult_x_L=st.mult_lo,
            mult_x_U=st.mult_up,
            iterations=st.iter,
            prim_infeas=st.prim_infeas,
            dual_infeas=st.dual_infeas,
            qp_iters_total=st.qp_iters_total,
            n_accept=jnp.array(0, jnp.int32),
            n_reject=jnp.array(0, jnp.int32),
            n_soc_accept=st.n_soc,
            n_fr_iters=jnp.array(0, jnp.int32),
            stats=None,
        )

    def solve_with_clock(d: NLPData):
        solve_t0[0] = time.time()
        if log_iters:
            print(
                f"  {'iter':>6}  {'f(x_k)':>15}  {'phi(x_k)':>15}  {'|mu|':>15}"
                f"  {'alpha':>14}  {'|p|':>14}  {'inf_pr':>14}  {'inf_du':>14}"
                f"  {'compl':>14}  {'time':>10}"
            )
        return solve(d)

    solve_with_clock._raw = solve
    return solve_with_clock
