"""Bisect the structured case118 b16 runtime fault by program phase.

Every single op passes in isolation (scripts/op_probe.py) while the full
structured solve faults at runtime (scripts/aot_probe.py: compile OK, first
execution dies), so the fault is composite or data-dependent.  This script
runs the solver's phases separately at the failing shapes with the REAL
cold-start data the first SQP iteration sees:

  eval    batched structured eval_all (coloring-compressed AD)
  shift   batched Lanczos lambda_min bound at (b, n)
  qp      ONE structured elastic QP from the cold start (the first
          subproblem), via the same BbdOperator path
  sqp_k   the full solver, iteration limit k (chunked driver handles)

Usage: python scripts/bisect118.py <stage> [batch] [nbus] [k]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/sqpsolver_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sqpsolver_tpu import Parameters  # noqa: E402
from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios  # noqa: E402
from sqpsolver_tpu.models.matpower import load_case  # noqa: E402
from sqpsolver_tpu.parallel.batch import batch_data  # noqa: E402


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "qp"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    nbus = int(sys.argv[3]) if len(sys.argv) > 3 else 118
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    case = load_case(f"case{nbus}")
    nlp = acopf_polar(case)
    n, m = nlp.n, nlp.m
    params = Parameters(
        max_iter=100, OutputFlag=0, tol_infeas=1e-6, tol_residual=1e-4,
        qp_max_iter=30, kkt_precision="mixed_ir", hessian_shift="power",
        init_projection="off", kkt_structured=True,
    )
    theta = jax.tree.map(
        jnp.asarray, load_scenarios(case, batch, seed=7, spread=0.03)
    )
    d = nlp.data(jnp.float64)
    xB = jnp.broadcast_to(jnp.clip(d.x0, d.x_l, d.x_u), (batch, n))
    lamB = jnp.zeros((batch, m))

    import numpy as _np

    from sqpsolver_tpu.algorithms.common import lanczos_lmin_bound
    from sqpsolver_tpu.ops.kkt_bbd import BbdOperator, BlockMaps
    from sqpsolver_tpu.ops.qp_ipm import IpmOptions, solve_qp_op
    from sqpsolver_tpu.structure import build_block_structure

    g_l_np = _np.asarray(nlp.g_l, _np.float64)
    g_u_np = _np.asarray(nlp.g_u, _np.float64)
    bs = build_block_structure(
        n, m, nlp.structure, _np.isfinite(g_l_np) & (g_l_np == g_u_np)
    )
    maps = BlockMaps(bs)
    colJ = jnp.asarray(bs.colorJ, jnp.int32)
    colH = jnp.asarray(bs.colorH, jnp.int32)

    def eval_all(x, lam, th):
        f, df = nlp.obj_grad(x, th)
        E = nlp.cons(x, th)
        gfun = lambda z: nlp.cons(z, th)
        seedsJ = (colJ[None, :] == jnp.arange(bs.nJ)[:, None]).astype(x.dtype)
        Jc = jax.vmap(lambda s: jax.jvp(gfun, (x,), (s,))[1])(seedsJ)
        J = maps.jac_blocks(Jc.T)

        def lag(z):
            return nlp.obj(z, th) + jnp.dot(lam, nlp.cons(z, th))

        glag = jax.grad(lag)
        seedsH = (colH[None, :] == jnp.arange(bs.nH)[:, None]).astype(x.dtype)
        Hc = jax.vmap(lambda s: jax.jvp(glag, (x,), (s,))[1])(seedsH)
        H = maps.hess_blocks(Hc.T)
        return f, df, E, J, H

    t0 = time.time()
    if stage == "eval":
        out = jax.jit(jax.vmap(eval_all, (0, 0, 0)))(xB, lamB, theta)
        jax.block_until_ready(out)
    elif stage == "shift":
        def one(x, lam, th):
            _, _, _, _, H = eval_all(x, lam, th)
            return lanczos_lmin_bound(
                lambda v: maps.h_mv(H, v), n, jnp.float64, iters=64
            )
        out = jax.jit(jax.vmap(one, (0, 0, 0)))(xB, lamB, theta)
        jax.block_until_ready(out)
        print("lmin:", np.asarray(out)[:8])
    elif stage == "qp":
        opts = IpmOptions(
            max_iter=30, tol=2e-6, factor_dtype="float32", ir_steps=2,
            invE_floor=3.0e-7, stall_iters=6, polish_iters=8,
        )

        def one(x, lam, th):
            f, df, E, J, H = eval_all(x, lam, th)
            lmin = lanczos_lmin_bound(
                lambda v: maps.h_mv(H, v), n, jnp.float64, iters=64
            )
            diag, rowabs = maps.h_diag_rowabs(H)
            scale = 1.0 + jnp.max(rowabs, initial=0.0)
            shift = jnp.maximum(0.0, -lmin) + 4.0e-7 * scale
            Hs = maps.h_add_diag(H, shift)
            op = BbdOperator(maps, J, Hs, opts)
            rl = d.g_l - E
            ru = d.g_u - E
            lb = jnp.maximum(-10.0, d.x_l - x)
            ub = jnp.minimum(10.0, d.x_u - x)
            w = jnp.full((m,), 1.0e8)
            sol = solve_qp_op(op, df, rl, ru, lb, ub, w, opts=opts)
            return sol.p, sol.iters, sol.converged, sol.pri_res, sol.dual_res

        out = jax.jit(jax.vmap(one, (0, 0, 0)))(xB, lamB, theta)
        jax.block_until_ready(out)
        print("qp iters:", np.asarray(out[1]).tolist())
        print("conv:", np.asarray(out[2]).tolist())
    elif stage.startswith("sqp"):
        from sqpsolver_tpu.algorithms.sqp_tr import make_solver

        solver = make_solver(nlp, params, verbose=False)
        data = batch_data(nlp, batch, theta=theta, dtype=jnp.float64)

        @jax.jit
        def run_k(dd):
            st = jax.vmap(solver._init_state)(dd)
            st = jax.vmap(
                lambda s, di: solver._run_until(s, di, k)
            )(st, dd)
            return st.iter, st.ret, st.prim_infeas

        out = run_k(data)
        jax.block_until_ready(out)
        print("iters:", np.asarray(out[0]).tolist())
        print("ret:", np.asarray(out[1]).tolist())
    else:
        raise SystemExit(f"unknown stage {stage}")
    print(f"PASS {stage} ({time.time() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
