"""Decompose the case118 b16 per-iteration cost: QP solve, eigh, pieces."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/sqpsolver_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios
from sqpsolver_tpu.models.power import synthetic_case
from sqpsolver_tpu.ops.qp_ipm import IpmOptions, solve_qp


def timed(fn, *a, reps=3):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main():
    case = synthetic_case(118, seed=1)
    nlp = acopf_polar(case)
    n, m = nlp.n, nlp.m
    print(f"n={n} m={m}", flush=True)
    d = nlp.data(jnp.float64)
    x0 = jnp.clip(d.x0, d.x_l, d.x_u)
    lam = jnp.zeros((m,))

    # representative QP data at the start point
    def qp_data(theta):
        f, df = nlp.obj_grad(x0, theta)
        E = nlp.cons(x0, theta)
        J = nlp.cons_jac(x0, theta)
        H = nlp.lag_hess(x0, lam, theta)
        # convexify via power shift for simplicity
        Hq = H + 10.0 * jnp.eye(n)
        rl = d.g_l - E
        ru = d.g_u - E
        lb = jnp.maximum(-10.0, d.x_l - x0)
        ub = jnp.minimum(10.0, d.x_u - x0)
        w = jnp.full((m,), 1.0e8)
        return Hq, df, J, rl, ru, lb, ub, w

    theta1 = jax.tree.map(lambda a: jnp.asarray(a), dict(
        pd=np.asarray(case.bus_pd), qd=np.asarray(case.bus_qd)))
    thetaB = jax.tree.map(jnp.asarray, load_scenarios(case, 16, seed=7,
                                                      spread=0.05))

    for prec, plane, inv, irs in (
        ("mixed_ir", False, False, 2),
        ("plane_ir4", True, False, 4),
        ("plane_inv4", True, True, 4),
        ("plane_inv2", True, True, 2),
    ):
        opts = IpmOptions(max_iter=30, tol=2.0e-6, factor_dtype="float32",
                          ir_steps=irs, plane=plane, invert_factors=inv)

        @jax.jit
        def solve1(theta):
            args = qp_data(theta)
            return solve_qp(*args, opts=opts)

        @jax.jit
        def solveB(thetas):
            return jax.vmap(solve1)(thetas)

        t1, o1 = timed(solve1, theta1)
        tB, oB = timed(solveB, thetaB)
        print(
            f"{prec:12s} QP b=1: {t1*1e3:8.1f} ms ({int(o1.iters)} ipm) | "
            f"b=16: {tB*1e3:8.1f} ms (max {int(jnp.max(oB.iters))} ipm, "
            f"mean {float(jnp.mean(oB.iters)):.1f}) | "
            f"ratio {tB/t1:.1f}x", flush=True)

    # eigh cost at (n,n)
    H1 = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)))
    H1 = H1 + H1.T

    @jax.jit
    def eigh1(Hs):
        return jnp.linalg.eigvalsh(Hs.astype(jnp.float32))[..., 0]

    te1, _ = timed(eigh1, H1)
    teB, _ = timed(eigh1, jnp.broadcast_to(H1, (16, n, n)))
    print(f"eigh f32 n={n}: b=1 {te1*1e3:.1f} ms | b=16 {teB*1e3:.1f} ms",
          flush=True)

    # derivative bundle cost
    @jax.jit
    def derivs(theta):
        J = nlp.cons_jac(x0, theta)
        H = nlp.lag_hess(x0, lam, theta)
        return J, H

    td1, _ = timed(derivs, theta1)
    tdB, _ = timed(jax.jit(jax.vmap(derivs)), thetaB)
    print(f"jac+hess: b=1 {td1*1e3:.1f} ms | b=16 {tdB*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
