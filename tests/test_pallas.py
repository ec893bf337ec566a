"""Blocked Cholesky / triangular-inverse kernel tests (interpreter on CPU).

The ``kkt_backend="pallas"`` path (parameters.py) routes factorizations to
``ops/chol_blocked.py``: Pallas for the sequential 128x128 diagonal-block
factor, batched XLA MXU matmuls for panel corrections, and a log-depth
product-doubling triangular inverse.  On-chip (v5e) the path is measured
within ~10% of XLA's batched cholesky; these tests pin correctness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqpsolver_tpu.ops.chol_blocked import (
    chol_diag128,
    cholesky_blocked,
    tri_inv_blocked,
    tri_inv_doubling,
)
from sqpsolver_tpu.ops.linsolve import factorize_spd


def _spd(rng, n, B=1):
    L = rng.standard_normal((B, n, n))
    return (L @ L.transpose(0, 2, 1) + n * np.eye(n)).astype(np.float32)


@pytest.mark.parametrize("n", [16, 128, 200, 591])
def test_cholesky_blocked_matches_numpy(n):
    rng = np.random.default_rng(n)
    M = _spd(rng, n, B=2)
    L = np.asarray(cholesky_blocked(jnp.asarray(M), interpret=True))
    Lr = np.linalg.cholesky(M)
    scale = np.abs(Lr).max()
    assert np.abs(L - Lr).max() / scale < 5e-6
    # exact-zero strict upper triangle (jnp.linalg.cholesky contract)
    assert np.abs(np.triu(L[0], 1)).max() == 0.0


def test_chol_diag128_nan_on_indefinite():
    rng = np.random.default_rng(0)
    M = _spd(rng, 128)
    M[0, 5, 5] = -1e3  # break positive definiteness
    L = np.asarray(chol_diag128(jnp.asarray(M), interpret=True))
    assert np.isnan(L).any()  # ladder-visible failure, not a silent clamp


@pytest.mark.parametrize("n", [16, 128, 313, 591])
def test_tri_inv_blocked(n):
    rng = np.random.default_rng(n + 1)
    L = np.linalg.cholesky(_spd(rng, n, B=2).astype(np.float64)).astype(
        np.float32
    )
    Li = np.asarray(tri_inv_blocked(jnp.asarray(L)))
    resid = np.abs(Li @ L - np.eye(n)).max()
    assert resid < 5e-5, resid


def test_tri_inv_doubling_small():
    rng = np.random.default_rng(3)
    L = np.tril(rng.standard_normal((4, 32, 32))) + 8 * np.eye(32)
    Li = np.asarray(tri_inv_doubling(jnp.asarray(L.astype(np.float32))))
    assert np.abs(Li @ L - np.eye(32)).max() < 1e-5


def test_factorize_spd_pallas_backend_vmap():
    """The custom vmap rule collapses a vmapped batch into one blocked call
    and matches the xla backend lane by lane."""
    rng = np.random.default_rng(7)
    M = jnp.asarray(_spd(rng, 200, B=3))

    def chol_of(backend):
        def f(Mi):
            return factorize_spd(Mi, 0.0, backend=backend).chol

        return jax.vmap(f)(M)

    Lp = np.asarray(chol_of("pallas"))
    Lx = np.asarray(chol_of("xla"))
    np.testing.assert_allclose(Lp, Lx, rtol=1e-4, atol=1e-4)
