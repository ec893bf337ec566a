"""Unit tests of the KKT/violation/complementarity formulas against
hand-computed values of the reference formulas (common.jl:14-77)."""

import jax.numpy as jnp
import numpy as np

from sqpsolver_tpu.algorithms.common import (
    kt_residuals,
    norm_complementarity,
    norm_violations,
)


def test_norm_violations_matches_reference_formula():
    E = jnp.array([0.5, 2.0, -1.0])
    g_l = jnp.array([0.0, 0.0, 0.0])
    g_u = jnp.array([1.0, 1.0, 1.0])
    x = jnp.array([3.0, -4.0])
    x_l = jnp.array([0.0, 0.0])
    x_u = jnp.array([2.0, 2.0])
    # rows: 0; 2-1=1; 0-(-1)=1.  bounds: 3-2=1; 0-(-4)=4
    assert float(norm_violations(E, g_l, g_u, x, x_l, x_u, ord=1)) == 7.0
    assert float(norm_violations(E, g_l, g_u, x, x_l, x_u, ord=jnp.inf)) == 4.0


def test_kt_residuals_zero_at_kkt_point():
    """Stationary point with our sign convention: df + J'lam + nuU - nuL = 0."""
    df = jnp.array([1.0, -2.0])
    J = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    lam = jnp.array([-1.0, 2.0])  # lower-active row 0, upper-active row 1
    nuL = jnp.array([0.0, 0.0])
    nuU = jnp.array([0.0, 0.0])
    assert float(kt_residuals(df, lam, nuU, nuL, J)) < 1e-15


def test_kt_residuals_normalization():
    """Denominator = max(1, |df|inf, |nuU|inf, |nuL|inf, max_i |lam_i| |J_i|_2)
    (common.jl:18-21)."""
    df = jnp.array([10.0, 0.0])
    J = jnp.array([[3.0, 4.0]])  # row norm 5
    lam = jnp.array([2.0])  # |lam| * |J_i| = 10
    nuL = jnp.zeros(2)
    nuU = jnp.zeros(2)
    stat = df + J.T @ lam  # [16, 8] -> inf-norm 16
    expect = 16.0 / 10.0
    np.testing.assert_allclose(float(kt_residuals(df, lam, nuU, nuL, J)), expect)


def test_norm_complementarity_equality_rows_zero():
    E = jnp.array([1.0, 0.3])
    g_l = jnp.array([1.0, 0.0])
    g_u = jnp.array([1.0, 1.0])  # row 0 is an equality
    lam = jnp.array([5.0, 2.0])
    val = float(norm_complementarity(E, g_l, g_u, lam))
    # row0 contributes 0; row1: min(0.3, 0.7)*2 = 0.6; denom 1+|2|
    np.testing.assert_allclose(val, 0.6 / 3.0)
