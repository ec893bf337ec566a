"""The reference's golden-value toy problem.

From ``/root/reference/test/ext_solver.jl:14-28`` (same model in
``examples/toy_example.jl:9-28``):

    min  x^2 + x
    s.t. x^2 - x == 2
         x*y    == 1
         x*y    >= 0
         x      >= -2         (a *linear* constraint in the reference, so it
                               lands in the leading linear block)

Known solution x* = -1, y* = -1 (asserted at rtol 1e-4 with status
LOCALLY_SOLVED in ``test/runtests.jl:12-14``) — the golden regression target.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..nlp import NLP


def toy_nlp() -> NLP:
    inf = np.inf

    def f(z):
        x, y = z[0], z[1]
        return x * x + x

    def g(z):
        x, y = z[0], z[1]
        return jnp.stack(
            [
                x,  # linear row: x >= -2
                x * x - x,  # == 2
                x * y,  # == 1
                x * y,  # >= 0
            ]
        )

    return NLP(
        f=f,
        g=g,
        n=2,
        m=4,
        x_l=np.array([-inf, -inf]),
        x_u=np.array([inf, inf]),
        g_l=np.array([-2.0, 2.0, 1.0, 0.0]),
        g_u=np.array([inf, 2.0, 1.0, inf]),
        x0=np.zeros(2),
        num_linear=1,
        name="toy_ext_solver",
    )
