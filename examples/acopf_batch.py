"""Batched ACOPF scenarios on a device mesh.

The flagship workload (reference examples/acopf/opf.jl + test/opf.jl),
scaled the TPU-native way: one compiled trust-region SQP program advances a
whole fleet of load scenarios in lockstep, sharded over every available
device.

Run (CPU fake mesh):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/acopf_batch.py
Run (TPU): python examples/acopf_batch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios
from sqpsolver_tpu.models.power import case9
from sqpsolver_tpu.parallel import sharding as shd
from sqpsolver_tpu.parallel.batch import batch_data, summarize_batch

BATCH = int(os.environ.get("BATCH", "16"))

case = case9()
nlp = acopf_polar(case)
params = sqp.Parameters(
    max_iter=60,
    OutputFlag=0,
    tol_infeas=1.0e-6,
    tol_residual=1.0e-4,
    use_soc=True,
)

mesh = shd.instance_mesh()
print(f"devices: {mesh.devices.size} x {mesh.devices.flat[0].platform}")

data = batch_data(nlp, BATCH, theta=load_scenarios(case, BATCH, seed=0, spread=0.1))
data = shd.shard_data(data, mesh)
solver = shd.make_sharded_solver(nlp, params, mesh)

t0 = time.time()
out = solver(data)
jax.block_until_ready(out.x)
print(f"first call (incl. compile): {time.time() - t0:.1f}s")

t0 = time.time()
out = solver(data)
jax.block_until_ready(out.x)
dt = time.time() - t0
print(f"steady state: {dt:.3f}s for {BATCH} scenarios")
print(summarize_batch(out))
