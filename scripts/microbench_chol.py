"""Microbenchmark: batched Cholesky / triangular-solve scaling on TPU.

Times K repetitions inside ONE jitted fori_loop to amortize dispatch, with a
data dependency between iterations so XLA cannot elide work.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/sqpsolver_tpu_jax_cache")

K = 50


def loop_time(step, x0, reps=3):
    @jax.jit
    def run(x):
        return lax.fori_loop(0, K, step, x)

    out = run(x0)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = run(x0)
    jax.block_until_ready(out)
    return (time.time() - t0) / (reps * K)


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    for n in (151, 294, 591, 1182):
        M1 = rng.standard_normal((n, n))
        A1 = jnp.asarray(M1 @ M1.T + n * np.eye(n), jnp.float32)
        for b in (1, 16, 32):
            Ab = jnp.broadcast_to(A1, (b, n, n)).copy()

            def step(i, x):
                L = jnp.linalg.cholesky(x)
                # feed result back (diag shift keeps it SPD)
                return x + 1e-6 * L[..., :1, :1]

            t = loop_time(step, Ab)
            flops = b * n**3 / 3
            print(
                f"chol     n={n:4d} b={b:3d}: {t*1e3:8.3f} ms  "
                f"{flops/t/1e9:9.1f} GF/s", flush=True
            )
        L1 = jnp.linalg.cholesky(A1)
        for b in (1, 16):
            Lb = jnp.broadcast_to(L1, (b, n, n)).copy()
            Bb = jnp.broadcast_to(
                jnp.asarray(M1, jnp.float32), (b, n, n)
            ).copy()

            def step(i, carry):
                B = carry
                X = lax.linalg.triangular_solve(
                    Lb, B, left_side=True, lower=True
                )
                return B + 1e-6 * X

            t = loop_time(step, Bb)
            flops = b * n**3
            print(
                f"trisolve n={n:4d} b={b:3d}: {t*1e3:8.3f} ms  "
                f"{flops/t/1e9:9.1f} GF/s", flush=True
            )
        with jax.default_matmul_precision("float32"):
            for b in (1, 16):
                Ab = jnp.broadcast_to(A1, (b, n, n)).copy()

                def step(i, x):
                    y = jnp.einsum("bij,bjk->bik", x, x)
                    return x + 1e-9 * y

                t = loop_time(step, Ab)
                print(
                    f"matmulf32 n={n:4d} b={b:3d}: {t*1e3:8.3f} ms  "
                    f"{2*b*n**3/t/1e9:9.1f} GF/s", flush=True
                )


if __name__ == "__main__":
    main()
