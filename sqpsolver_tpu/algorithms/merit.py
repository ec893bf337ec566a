"""Merit-function directional derivative.

Parity with ``/root/reference/src/algorithms/merit.jl:13-17``: the directional
derivative of the l1 exact-penalty merit at x along p,

    D(phi; p) = grad f' p - mu . viol(x)

in both the scalar-penalty (SQP-TR) and per-constraint vector-penalty
(SQP-LS) forms; the feasibility-restoration variant replaces grad f' p with
the slack mass (sqp.jl:190-213).
"""

from __future__ import annotations

import jax.numpy as jnp

from jax import Array


def merit_derivative(dfp: Array, mu, cons_viol: Array) -> Array:
    """D = dfp - mu . viol  (mu scalar or per-row vector; merit.jl:13-17)."""
    return dfp - jnp.sum(mu * cons_viol)
