"""Pallas KKT kernel tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqpsolver_tpu.ops.kkt_pallas import cholesky_pallas


def _spd(rng, n):
    L = rng.standard_normal((n, n))
    return (L @ L.T + n * np.eye(n)).astype(np.float32)


@pytest.mark.parametrize("n", [16, 128, 200, 256])
def test_cholesky_matches_xla(n):
    rng = np.random.default_rng(n)
    M = _spd(rng, n)
    L_ref = np.linalg.cholesky(M)
    L = cholesky_pallas(jnp.asarray(M), interpret=True)
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=2e-4, atol=2e-3)


def test_cholesky_batched():
    rng = np.random.default_rng(0)
    Ms = np.stack([_spd(rng, 96) for _ in range(3)])
    L = cholesky_pallas(jnp.asarray(Ms), interpret=True)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(L[i]), np.linalg.cholesky(Ms[i]), rtol=2e-4, atol=2e-3
        )
