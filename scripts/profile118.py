"""Decompose the batched case118 per-SQP-iteration wall-clock on the chip.

The round-4 dense case118 b16 measurement (19.7 iter/s batched vs 18.6
serial) showed per-iteration cost scaling ~linearly with batch — i.e. a
throughput-bound program, not the latency-bound regime the analytic-FLOP
model (mfu ~ 3.5e-4) implies.  Prime suspect: float64 work, which the v5e
emulates in software — (a) the f64 AD evaluation bundle (sin/cos-heavy
power-flow graphs), (b) the f64 residual matmuls inside mixed-precision
iterative refinement (solve_factorized sweeps; schur_cap forces ir_steps=4).

Usage: python scripts/profile118.py [nbus] [batch]
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
from sqpsolver_tpu.ops.qp_ipm import IpmOptions, solve_qp  # noqa: E402


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
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    case = load_case(f"case{nbus}")
    nlp = acopf_polar(case)
    n, m = nlp.n, nlp.m
    print(f"case{nbus}: n={n} m={m} b={batch}", flush=True)
    theta = jax.tree.map(
        jnp.asarray, load_scenarios(case, batch, seed=7, spread=0.03)
    )
    d = nlp.data(jnp.float64)
    xB = jnp.broadcast_to(jnp.clip(d.x0, d.x_l, d.x_u), (batch, n))
    lamB = jnp.zeros((batch, m))

    # ---- (0) f64 vs f32 matmul cost on this chip --------------------------
    for dt, tag in ((jnp.float32, "f32"), (jnp.float64, "f64")):
        A = jnp.ones((batch, n, n), dt)
        B = jnp.ones((batch, n, 304), dt)
        with jax.default_matmul_precision("float32"):
            t = timed(jax.jit(lambda A, B: A @ B), A, B)
        fl = 2 * batch * n * n * 304
        print(f"matmul {tag} (b,{n},{n})@(b,{n},304): {t*1e3:7.2f} ms "
              f"-> {fl/t/1e12:.3f} TFLOP/s", flush=True)

    # ---- (1) the AD evaluation bundle, f64 vs f32 -------------------------
    def eval_bundle(x, lam, th):
        f, df = nlp.obj_grad(x, th)
        E = nlp.cons(x, th)
        J = nlp.cons_jac(x, th)
        H = nlp.lag_hess(x, lam, th)
        return f, df, E, J, H

    evB = jax.jit(jax.vmap(eval_bundle))
    t = timed(evB, xB, lamB, theta)
    print(f"eval_all f64: {t*1e3:8.1f} ms", flush=True)
    theta32 = jax.tree.map(lambda a: a.astype(jnp.float32), theta)
    t = timed(evB, xB.astype(jnp.float32), lamB.astype(jnp.float32), theta32)
    print(f"eval_all f32: {t*1e3:8.1f} ms", flush=True)

    # ---- (2) the convexification shift ------------------------------------
    H0 = np.random.default_rng(0).standard_normal((n, n))
    H0 = H0 + H0.T
    HB = jnp.broadcast_to(jnp.asarray(H0), (batch, n, n))
    t = timed(jax.jit(jax.vmap(
        lambda Hs: jnp.linalg.eigvalsh(Hs.astype(jnp.float32))[0]
    )), HB)
    print(f"eigh f32 (b,{n},{n}): {t*1e3:8.1f} ms", flush=True)

    # ---- (3) one batched QP at representative data, by ir_steps -----------
    f, df = jax.vmap(nlp.obj_grad)(xB, theta)
    E = jax.vmap(nlp.cons)(xB, theta)
    J = jax.vmap(nlp.cons_jac)(xB, theta)
    Hq = jnp.broadcast_to(
        jnp.asarray(H0 @ H0.T / n + 10.0 * np.eye(n)), (batch, n, n)
    )
    rl = d.g_l - E
    ru = d.g_u - E
    lb = jnp.broadcast_to(jnp.maximum(-10.0, d.x_l - xB[0]), (batch, n))
    ub = jnp.broadcast_to(jnp.minimum(10.0, d.x_u - xB[0]), (batch, n))
    w = jnp.full((m,), 1.0e8)
    from sqpsolver_tpu.algorithms.common import schur_cap_for

    cap = schur_cap_for(
        Parameters(kkt_precision="mixed_ir", schur_cap=-1), nlp
    )
    for irs in (4, 2, 1):
        opts = IpmOptions(
            max_iter=20, tol=2.0e-6, factor_dtype="float32", ir_steps=irs,
            schur_cap=cap, invE_floor=3.0e-7, stall_iters=6,
        )

        def one(Hb, dfb, Jb, rlb, rub, lbb, ubb):
            return solve_qp(Hb, dfb, Jb, rlb, rub, lbb, ubb, w, opts=opts)

        fn = jax.jit(jax.vmap(one))
        t = timed(fn, Hq, df, J, rl, ru, lb, ub, reps=3)
        out = fn(Hq, df, J, rl, ru, lb, ub)
        print(f"QP b{batch} ir={irs} cap={cap}: {t*1e3:8.1f} ms "
              f"(ipm mean {float(jnp.mean(out.iters)):.1f} "
              f"max {int(jnp.max(out.iters))}, "
              f"conv {int(jnp.sum(out.converged))}/{batch}, "
              f"dual {float(jnp.max(out.dual_res)):.1e})", flush=True)


if __name__ == "__main__":
    main()
