"""Pallas TPU kernels for the condensed-KKT hot path.

The interior-point QP solver factorizes one SPD condensed matrix and
back-solves a handful of right-hand sides per iteration
(:mod:`sqpsolver_tpu.ops.linsolve`).  This module provides a Pallas
implementation of that factorization for matrices that fit in VMEM
(n <= ~1024 at float32): the whole factorization runs out of VMEM with a
single HBM round-trip, the trailing updates are MXU matmuls, and batches of
QP instances map onto the pallas grid via ``jax.vmap``.

Blocked right-looking Cholesky (panel width 128 = MXU tile):

  for each panel k:
    1. factor the 128x128 diagonal block (128 column steps on the VPU)
    2. triangular-solve the sub-diagonal panel against the block's L^T
       (128 column steps, each a full-width VPU axpy)
    3. rank-128 MXU update of the trailing submatrix

Correctness is tested in interpreter mode on CPU (tests/test_pallas.py).

Known issue (round 1): the axon TPU pallas backend in this environment fails
to lower several core constructs — a fori_loop carrying an (n, n) value with
masked updates hits an infinite astype-dispatch RecursionError, jnp.tril
SIGABRTs the remote compiler, and dynamic-ds read-modify-write trips the
Mosaic verifier (minimal repros confirmed; plain VMEM copies work).  Until
the toolchain lands fixes, ``kkt_backend="pallas"`` is CPU-interpreter-only
and the default "xla" backend (measured working on-chip) carries the hot
path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

BLOCK = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _factor_diag_block(a):
    """Unblocked Cholesky of a (BLOCK, BLOCK) SPD tile; returns lower L.

    Column-by-column Cholesky-Crout.  All column reads/writes use one-hot
    masked full-tile ops — Mosaic rejects dynamic value indexing (``L[:, j]``
    with a traced j) inside kernels, and masked VPU ops vectorize better
    anyway.
    """
    n = a.shape[0]
    col_ids = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    row_ids = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ar = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def body(j, L):
        sel = col_ids == j
        col = jnp.sum(jnp.where(sel, L, 0.0), axis=1)
        # no clamping: a negative pivot must surface as NaN so the caller's
        # inertia-correction ladder (linsolve.factorize_spd) can detect it,
        # matching the XLA cholesky's failure behavior
        diag = jnp.sqrt(jnp.sum(jnp.where(ar == j, col, 0.0)))
        colj = jnp.where(ar > j, col / diag, 0.0)
        colj = jnp.where(ar == j, diag, colj)
        # subtract the rank-1 contribution from the trailing lower triangle
        outer = colj[:, None] * colj[None, :]
        mask = jnp.logical_and(col_ids > j, row_ids >= col_ids)
        L = jnp.where(mask, L - outer, L)
        L = jnp.where(sel, colj[:, None], L)
        return L

    return jnp.tril(lax.fori_loop(0, n, body, jnp.tril(a)))


def _solve_panel(panel, Lkk):
    """X such that X @ Lkk^T = panel  (forward substitution over columns,
    one-hot masked — see _factor_diag_block).  ``panel`` is (rows, BLOCK),
    ``Lkk`` (BLOCK, BLOCK)."""
    n = Lkk.shape[0]
    lkk_rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    pan_cols = lax.broadcasted_iota(jnp.int32, panel.shape, 1)
    ar = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def body(j, X):
        rowj = jnp.sum(jnp.where(lkk_rows == j, Lkk, 0.0), axis=0)
        ljj = jnp.sum(jnp.where(ar == j, rowj, 0.0))
        lrow = jnp.where(ar < j, rowj, 0.0)
        acc = X @ lrow  # only columns < j contribute
        pcol = jnp.sum(jnp.where(pan_cols == j, panel, 0.0), axis=1)
        newcol = (pcol - acc) / ljj
        return jnp.where(pan_cols == j, newcol[:, None], X)

    return lax.fori_loop(0, n, body, jnp.zeros_like(panel))


def _chol_kernel(n_panels: int, a_ref, out_ref):
    """In-VMEM blocked Cholesky of one (N, N) tile (N = n_panels * BLOCK)."""
    N = n_panels * BLOCK
    out_ref[:] = a_ref[:]

    def panel_step(k, _):
        off = pl.multiple_of(k * BLOCK, BLOCK)
        akk = out_ref[pl.ds(off, BLOCK), pl.ds(off, BLOCK)]
        Lkk = _factor_diag_block(akk)
        out_ref[pl.ds(off, BLOCK), pl.ds(off, BLOCK)] = Lkk

        @pl.when(k + 1 < n_panels)
        def _():
            # fused masked tail: rows beyond the active panel; static shapes
            # across k (masked rows contribute zero to the MXU update).
            # NB: boolean masks + where only — .astype on masks sends the
            # TPU pallas trace into infinite astype dispatch.
            rows = lax.broadcasted_iota(jnp.int32, (N, 1), 0)
            tailb = rows >= off + BLOCK
            cur = out_ref[:, pl.ds(off, BLOCK)]
            panel = jnp.where(tailb, cur, 0.0)
            X = _solve_panel(panel, Lkk)
            out_ref[:, pl.ds(off, BLOCK)] = jnp.where(tailb, X, cur)
            out_ref[:] = out_ref[:] - jnp.dot(
                X, X.T, preferred_element_type=out_ref.dtype
            )

        return 0

    lax.fori_loop(0, n_panels, panel_step, 0)
    r = lax.broadcasted_iota(jnp.int32, (N, N), 0)
    c = lax.broadcasted_iota(jnp.int32, (N, N), 1)
    out_ref[:] = jnp.where(r >= c, out_ref[:], 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_pallas(M: Array, interpret: bool = False) -> Array:
    """Lower-Cholesky via the Pallas kernel; batches via vmap.

    ``M``: (..., n, n) SPD; n is padded up to a multiple of 128 with an
    identity tail (the pad block factors to I and is sliced away).
    """
    *batch, n, _ = M.shape
    N = _round_up(max(n, BLOCK), BLOCK)
    n_panels = N // BLOCK

    def one(Mi):
        if N != n:
            pad = jnp.zeros((N, N), M.dtype)
            pad = pad.at[:n, :n].set(Mi)
            idx = jnp.arange(n, N)
            pad = pad.at[idx, idx].set(1.0)
            Mi = pad
        out = pl.pallas_call(
            functools.partial(_chol_kernel, n_panels),
            out_shape=jax.ShapeDtypeStruct((N, N), M.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(Mi)
        return out[:n, :n]

    fn = one
    for _ in batch:
        fn = jax.vmap(fn)
    return fn(M)
