"""Test configuration: CPU backend with 8 virtual devices + float64.

Multi-chip sharding logic is tested on a fake CPU mesh via
``--xla_force_host_platform_device_count`` (the standard way to test pjit
logic without a pod — SURVEY §4 test-plan item c); numerics run in float64.
"""

import os

# hard override: the environment may pre-set JAX_PLATFORMS (e.g. the TPU
# "axon" tunnel); tests must run on CPU with the fake 8-device mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the jaxtyping pytest plugin imports jax before this conftest runs, so the
# env var alone is too late — force the platform through the live config too
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: repeated test runs skip XLA recompiles
# (disable with SQP_NO_JAX_CACHE=1 e.g. when several jax processes run
# concurrently).  NB: a CPU-ONLY cache dir — sharing one dir with TPU/axon
# runs poisons it with entries whose XLA:CPU AOT serialization targets other
# machine features; deserializing them warns "could lead to SIGILL" and
# re-serializing alongside them segfaulted full-suite runs (observed round 2
# in compilation_cache.put_executable_and_time).
if not os.environ.get("SQP_NO_JAX_CACHE"):
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/sqpsolver_tpu_jax_cache_cputests"
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # only cache expensive compiles: the XLA:CPU executable serializer on
    # this box segfaults intermittently under many rapid cache writes (the
    # HS battery compiles ~75 small programs); 5 s keeps the big ACOPF/QP
    # programs cached while skipping the crash-prone burst of small writes
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
