"""Decompose the BATCHED structured (BBD) per-IPM-trip cost on the chip.

VERDICT r4 item 1: structured case118 b16 runs at 3.2 iter/s batched vs 4.5
serial (0.7x) — batching must win at exactly this scale.  This script times
the BBD operator's components at several batch widths so the scaling regime
is measurable (latency-bound => flat in b, throughput-bound => linear):

  * bbd_factorize (batched interior Cholesky + separator Schur factor)
  * the stiff-Schur panel build  KiA = solve_K_ref(At, .)  by sweep count
  * one full structured elastic-QP solve (solve_qp_op)

Usage: python scripts/profile_bbd.py [nbus] [b1,b2,...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/sqpsolver_tpu_jax_cache"
    if os.environ.get("JAX_PLATFORMS", "") != "cpu"
    else "/tmp/sqpsolver_tpu_jax_cache_cpu",
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from sqpsolver_tpu import Parameters  # noqa: E402
from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios  # noqa: E402
from sqpsolver_tpu.models.matpower import load_case  # noqa: E402
from sqpsolver_tpu.ops.kkt_bbd import BbdOperator, BlockMaps, bbd_factorize  # noqa: E402
from sqpsolver_tpu.ops.qp_ipm import IpmOptions, solve_qp_op  # noqa: E402
from sqpsolver_tpu.structure import build_block_structure  # noqa: E402


def timed(fn, *a, reps=5):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
        jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    nbus = int(sys.argv[1]) if len(sys.argv) > 1 else 118
    widths = (
        [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2
        else [1, 4, 8]
    )
    case = load_case(f"case{nbus}") if nbus in (5, 14, 30, 118) else None
    nlp = acopf_polar(case)
    n, m = nlp.n, nlp.m
    gl = np.asarray(nlp.g_l, np.float64)
    gu = np.asarray(nlp.g_u, np.float64)
    bs = build_block_structure(
        n, m, nlp.structure, np.isfinite(gl) & (gl == gu)
    )
    maps = BlockMaps(bs)
    print(f"case{nbus}: n={n} m={m} P={bs.P} nd={bs.nd} ns={bs.ns} "
          f"mr={bs.mr} mre={bs.mre}", flush=True)

    params = Parameters(kkt_structured=True)
    opts = IpmOptions(
        max_iter=30, tol=2.0e-6, factor_dtype="float32", ir_steps=4,
        invE_floor=3.0e-7, stall_iters=6,
    )

    d = nlp.data(jnp.float64)
    x0 = jnp.clip(d.x0, d.x_l, d.x_u)

    def rep_inputs(b):
        """Representative per-lane QP data at the ACOPF start point."""
        theta = jax.tree.map(
            jnp.asarray, load_scenarios(case, b, seed=7, spread=0.03)
        )
        xB = jnp.broadcast_to(x0, (b, n))
        E = jax.vmap(nlp.cons)(xB, theta)
        # coloring-compressed J -> blocks (same as the driver)
        colJ = jnp.asarray(bs.colorJ, jnp.int32)
        seeds = (
            colJ[None, :] == jnp.arange(bs.nJ, dtype=jnp.int32)[:, None]
        ).astype(jnp.float64)
        def jac_blocks(x, th):
            gfun = lambda z: nlp.cons(z, th)
            Jc = jax.vmap(lambda s: jax.jvp(gfun, (x,), (s,))[1])(seeds)
            return maps.jac_blocks(Jc.T)
        J = jax.vmap(jac_blocks)(xB, theta)
        colH = jnp.asarray(bs.colorH, jnp.int32)
        seedsH = (
            colH[None, :] == jnp.arange(bs.nH, dtype=jnp.int32)[:, None]
        ).astype(jnp.float64)
        def hess_blocks(x, lam, th):
            def lg(z):
                return nlp.obj(z, th) + jnp.dot(lam, nlp.cons(z, th))
            g = jax.grad(lg)
            Hc = jax.vmap(lambda s: jax.jvp(g, (x,), (s,))[1])(seedsH)
            return maps.hess_blocks(Hc.T)
        H = jax.vmap(hess_blocks)(xB, jnp.zeros((b, m)), theta)
        H = jax.vmap(lambda h: maps.h_add_diag(h, 1.0e-4))(H)
        df = jax.vmap(lambda x, th: nlp.obj_grad(x, th)[1])(xB, theta)
        rl = jnp.broadcast_to(d.g_l, (b, m)) - E
        ru = jnp.broadcast_to(d.g_u, (b, m)) - E
        lb = jnp.broadcast_to(jnp.maximum(-10.0, d.x_l - x0), (b, n))
        ub = jnp.broadcast_to(jnp.minimum(10.0, d.x_u - x0), (b, n))
        w = jnp.full((b, m), 1.0e8)
        return H, J, df, rl, ru, lb, ub, w

    for b in widths:
        H, J, df, rl, ru, lb, ub, w = jax.tree.map(
            jax.block_until_ready, rep_inputs(b)
        )

        # ---- (a) bbd_factorize alone (f32 blocks) -------------------------
        def fac(Hb):
            H_pp, H_ps, H_ss = jax.tree.map(
                lambda a: a.astype(jnp.float32), Hb
            )
            eye = jnp.eye(bs.nd, dtype=jnp.float32)
            K_pp = H_pp + 1.0 * eye  # crude diag to make it SPD-ish
            K_ss = H_ss + 1.0 * jnp.eye(bs.ns, dtype=jnp.float32)
            return bbd_factorize(K_pp, H_ps, K_ss, jnp.zeros((), jnp.float32))

        t = timed(jax.jit(jax.vmap(fac)), H, reps=3)
        print(f"b{b}: bbd_factorize       {t*1e3:8.1f} ms", flush=True)

        # ---- (b) one prepare + one solve_block (the per-trip core), by
        # refinement sweep count (the panel solve KiA = solve_K_ref(At) runs
        # 1 + ir_steps panel applications — the prime Schur-cost lever)
        def prep_solve_ir(Hb, Jb, r1, r2, irs):
            op = BbdOperator(
                maps, Jb, Hb,
                IpmOptions(
                    max_iter=30, tol=2.0e-6, factor_dtype="float32",
                    ir_steps=irs, invE_floor=3.0e-7, stall_iters=6,
                ),
            )
            diag_k = jnp.full((n,), 1.0e-2)
            invE = jnp.full((m,), 1.0e-2)
            stiff = op.cap_stiff(
                jnp.asarray(np.asarray(bs.is_eq)), jnp.full((m,), 1e-6), 0
            )
            E_st = jnp.where(stiff, 1.0e-6, 1.0)
            solve_block, delta = op.prepare(
                diag_k, jnp.where(stiff, 0.0, invE), stiff, E_st,
                jnp.zeros(()),
            )
            dp, dy = solve_block(r1, jnp.where(stiff, r2, 0.0))
            return dp, dy

        r1 = jnp.ones((b, n))
        r2 = jnp.ones((b, m))
        for irs in (4, 2, 1):
            def prep_solve(Hb, Jb, r1b, r2b, _irs=irs):
                return prep_solve_ir(Hb, Jb, r1b, r2b, _irs)

            with jax.default_matmul_precision("float32"):
                t = timed(
                    jax.jit(jax.vmap(prep_solve)), H, J, r1, r2, reps=3
                )
            print(f"b{b}: prepare+solve ir={irs} {t*1e3:8.1f} ms",
                  flush=True)

        # ---- (c) full structured QP solve ---------------------------------
        def qp(Hb, Jb, dfb, rlb, rub, lbb, ubb, wb):
            op = BbdOperator(maps, Jb, Hb, opts)
            return solve_qp_op(
                op, dfb, rlb, rub, lbb, ubb, wb, opts=opts
            )

        fn = jax.jit(jax.vmap(qp))
        t = timed(fn, H, J, df, rl, ru, lb, ub, w, reps=3)
        out = fn(H, J, df, rl, ru, lb, ub, w)
        print(f"b{b}: full QP             {t*1e3:8.1f} ms "
              f"(trips mean {float(jnp.mean(out.iters)):.1f} "
              f"max {int(jnp.max(out.iters))}, "
              f"conv {int(jnp.sum(out.converged))}/{b}) "
              f"-> {t*1e3/max(1.0, float(jnp.max(out.iters))):.1f} "
              f"ms/max-trip", flush=True)


if __name__ == "__main__":
    main()
