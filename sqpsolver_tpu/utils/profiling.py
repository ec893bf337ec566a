"""Profiling / tracing helpers (SURVEY §5.1).

The reference's tracing is wall-clock fields plus an ``@elapsed`` around the
QP solve ("QP_time", sqp_trust_region.jl:141-142).  The TPU-native equivalents:

* :func:`trace` — a context manager around ``jax.profiler`` producing a
  TensorBoard-loadable XPlane trace of the whole solve (kernel timeline,
  HBM traffic, MXU utilization);
* :func:`solve_timing` — coarse phase timing (compile vs run) measured by
  re-running the jitted solve after warm-up;
* per-iteration counters (QP interior-point iterations, accept/reject/SOC/FR
  counts) ride in the solver state itself and come back in
  :class:`sqpsolver_tpu.results.Results`.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax profiler trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def solve_timing(fn: Callable, *args, repeats: int = 3) -> dict:
    """(compile_time, steady-state run time) of a jitted callable."""
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    first = time.time() - t0
    t0 = time.time()
    for _ in range(repeats):
        out = fn(*args)
        jax.block_until_ready(out)
    steady = (time.time() - t0) / repeats
    return {
        "first_call_s": first,
        "steady_state_s": steady,
        "compile_overhead_s": max(first - steady, 0.0),
    }
