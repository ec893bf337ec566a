"""Standalone on-chip probes of single ops at fault-rung shapes.

Round-4 isolation: dense case30 b256 and structured case118 b16 both fault
with the generic UNAVAILABLE while their smaller siblings pass.  The ops
they share (and the passing rungs exercise only at smaller sizes) are the
sort family (argsort in DenseOp.cap_stiff / prepare, top_k in
BbdOperator.cap_stiff), large-batch cholesky/triangular_solve, scatter-add,
and the batched f32 eigh.  Each probe runs one op at the failing shape.

Usage: python scripts/op_probe.py [probe ...]   (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/sqpsolver_tpu_jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402


def _run(name, fn):
    t0 = time.time()
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"PASS {name} ({time.time() - t0:.1f}s)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name} ({time.time() - t0:.1f}s): {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
        return False


def probes():
    key = jax.random.PRNGKey(0)

    def argsort_256x143():
        x = jax.random.normal(key, (256, 143))
        f = jax.jit(jax.vmap(lambda v: jnp.argsort(v, stable=True)))
        return f(x)

    def argsort_16x609():
        x = jax.random.normal(key, (16, 609))
        return jax.jit(jax.vmap(lambda v: jnp.argsort(v, stable=True)))(x)

    def topk_16x8x208():
        x = jax.random.normal(key, (16, 8, 208))
        return jax.jit(jax.vmap(lambda v: lax.top_k(v, 80)[1]))(x)

    def chol_256x143():
        b = jax.random.normal(key, (256, 143, 143), jnp.float32)
        spd = b @ jnp.swapaxes(b, -1, -2) + 143 * jnp.eye(143, dtype=jnp.float32)
        return jax.jit(jnp.linalg.cholesky)(spd)

    def chol_16x8x96():
        b = jax.random.normal(key, (16, 8, 96, 96), jnp.float32)
        spd = b @ jnp.swapaxes(b, -1, -2) + 96 * jnp.eye(96, dtype=jnp.float32)
        return jax.jit(jnp.linalg.cholesky)(spd)

    def triinv_16x8x96():
        b = jax.random.normal(key, (16, 8, 96, 96), jnp.float32)
        spd = b @ jnp.swapaxes(b, -1, -2) + 96 * jnp.eye(96, dtype=jnp.float32)
        L = jnp.linalg.cholesky(spd)
        eye = jnp.broadcast_to(jnp.eye(96, dtype=jnp.float32), L.shape)
        return jax.jit(lambda L: lax.linalg.triangular_solve(
            L, eye, left_side=True, lower=True))(L)

    def eigh_256x72():
        b = jax.random.normal(key, (256, 72, 72), jnp.float32)
        s = b + jnp.swapaxes(b, -1, -2)
        return jax.jit(lambda s: jnp.linalg.eigvalsh(s)[..., 0])(s)

    def eigh_16x344():
        b = jax.random.normal(key, (16, 344, 344), jnp.float32)
        s = b + jnp.swapaxes(b, -1, -2)
        return jax.jit(lambda s: jnp.linalg.eigvalsh(s)[..., 0])(s)

    def scatter_16x8x208():
        x = jax.random.normal(key, (16, 8, 80))
        sel = jax.random.randint(key, (16, 8, 80), 0, 208)

        def one(xv, sv):
            return jnp.zeros((8, 208)).at[
                jnp.arange(8)[:, None], sv
            ].add(xv)

        return jax.jit(jax.vmap(one))(x, sel)

    def f64matmul_16x344():
        a = jax.random.normal(key, (16, 344, 344), jnp.float64)
        b = jax.random.normal(key, (16, 344, 304), jnp.float64)
        return jax.jit(lambda a, b: a @ b)(a, b)

    # --- non-finite inputs: the solve path feeds NaN/Inf matrices to these
    # kernels by DESIGN (the regularization ladder detects failure by NaN
    # propagation), so a kernel that faults on non-finite data would explain
    # a data-dependent "TPU device error" that no clean-input probe catches.
    def chol_nan_256x143():
        spd = jnp.full((256, 143, 143), jnp.nan, jnp.float32)
        return jax.jit(jnp.linalg.cholesky)(spd)

    def chol_inf_16x8x96():
        spd = jnp.full((16, 8, 96, 96), jnp.inf, jnp.float32)
        return jax.jit(jnp.linalg.cholesky)(spd)

    def trisolve_nan_16x8x96():
        L = jnp.full((16, 8, 96, 96), jnp.nan, jnp.float32)
        eye = jnp.broadcast_to(jnp.eye(96, dtype=jnp.float32), L.shape)
        return jax.jit(lambda L: lax.linalg.triangular_solve(
            L, eye, left_side=True, lower=True))(L)

    def eigh_nan_256x72():
        s = jnp.full((256, 72, 72), jnp.nan, jnp.float32)
        return jax.jit(lambda s: jnp.linalg.eigvalsh(s)[..., 0])(s)

    def eigh_nan_16x344():
        s = jnp.full((16, 344, 344), jnp.nan, jnp.float32)
        return jax.jit(lambda s: jnp.linalg.eigvalsh(s)[..., 0])(s)

    def topk_nan_16x8x208():
        x = jnp.full((16, 8, 208), jnp.nan)
        return jax.jit(jax.vmap(lambda v: lax.top_k(v, 80)[1]))(x)

    def argsort_nan_256x143():
        x = jnp.full((256, 143), jnp.nan)
        return jax.jit(jax.vmap(lambda v: jnp.argsort(v, stable=True)))(x)

    def topk_inf_16x8x208():
        x = jnp.full((16, 8, 208), jnp.inf)
        return jax.jit(jax.vmap(lambda v: lax.top_k(v, 80)[1]))(x)

    def argsort_inf_256x143():
        x = jnp.full((256, 143), jnp.inf)
        return jax.jit(jax.vmap(lambda v: jnp.argsort(v, stable=True)))(x)

    def eigh_inf_16x344():
        s = jnp.full((16, 344, 344), jnp.inf, jnp.float32)
        return jax.jit(lambda s: jnp.linalg.eigvalsh(s)[..., 0])(s)

    def eigh_nan_256x143():
        s = jnp.full((256, 143, 143), jnp.nan, jnp.float32)
        return jax.jit(lambda s: jnp.linalg.eigvalsh(s)[..., 0])(s)

    return {k.__name__: k for k in (
        argsort_256x143, argsort_16x609, topk_16x8x208, chol_256x143,
        chol_16x8x96, triinv_16x8x96, eigh_256x72, eigh_16x344,
        scatter_16x8x208, f64matmul_16x344,
        chol_nan_256x143, chol_inf_16x8x96, trisolve_nan_16x8x96,
        eigh_nan_256x72, eigh_nan_16x344, topk_nan_16x8x208,
        argsort_nan_256x143, topk_inf_16x8x208, argsort_inf_256x143,
        eigh_inf_16x344, eigh_nan_256x143,
    )}


def main():
    which = sys.argv[1:] or None
    print(f"devices: {jax.devices()}", flush=True)
    table = probes()
    names = which or list(table)
    for name in names:
        _run(name, table[name])


if __name__ == "__main__":
    main()
