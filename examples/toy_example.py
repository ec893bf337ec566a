"""The reference's toy example (examples/toy_example.jl) on sqpsolver_tpu.

    min  x^2 + x
    s.t. x^2 - x == 2,  x*y == 1,  x*y >= 0,  x >= -2

Run:  JAX_PLATFORMS=cpu python examples/toy_example.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import sqpsolver_tpu as sqp

sqp.enable_x64()

import jax.numpy as jnp
import numpy as np

nlp = sqp.build_nlp(
    f=lambda x: x[0] ** 2 + x[0],
    x0=np.zeros(2),
    eq=lambda x: jnp.stack([x[0] ** 2 - x[0] - 2.0, x[0] * x[1] - 1.0]),
    ineq=lambda x: jnp.stack([-(x[0] * x[1])]),  # xy >= 0  as  -xy <= 0
    linear=lambda x: jnp.stack([x[0]]),
    linear_l=-2.0,
    name="toy",
)

res = sqp.optimize(nlp, sqp.Parameters(max_iter=100, OutputFlag=1))
print()
print("status   :", res.status_name)
print("objective:", res.obj_val)
print("solution :", res.x)  # expect [-1, -1]
