"""Pegase-scale end-to-end ACOPF solve through the BBD structured path.

VERDICT r4 item 5: the reference's flagship claim is running case2869pegase
through ma57 (/root/reference/examples/acopf/opf.jl:102).  Real pegase data
cannot be vendored in a zero-egress environment, so the scale stand-ins are
interconnected replicas of the REAL IEEE case118 (models/power.replicate_case
— the partitioner must cut genuine 118-bus mesh):

    case118x12 -> 1,416 buses, n=4,128   (pegase-1354 scale)
    case118x24 -> 2,832 buses, n=8,256   (pegase-2869 scale)

Usage:
    JAX_PLATFORMS=cpu python scripts/pegase_solve.py [k] [maxit]
    python scripts/pegase_solve.py 12           # on the chip (chunked)

Prints wall clock, peak RSS, iterations, objective, and the per-copy
objective sanity band (replicating the single-case optimum is feasible, so
the coupled optimum sits at/just below k * f*_single).
"""

import os
import resource
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
if not os.environ.get("SQP_NO_JAX_CACHE"):
    # NB: disable when co-running with a TPU bench — the XLA:CPU cache
    # serializer has segfaulted under concurrent cache traffic (CLAUDE.md)
    jax.config.update(
        "jax_compilation_cache_dir",
        "/tmp/sqpsolver_tpu_jax_cache"
        if os.environ.get("JAX_PLATFORMS", "") != "cpu"
        else "/tmp/sqpsolver_tpu_jax_cache_cpu",
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sqpsolver_tpu as sqp  # noqa: E402
from sqpsolver_tpu.models.acopf import acopf_polar  # noqa: E402
from sqpsolver_tpu.models.matpower import VENDORED_OPTIMA, load_case  # noqa: E402
from sqpsolver_tpu.models.power import replicate_case  # noqa: E402


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    maxit = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    platform = jax.devices()[0].platform
    case = replicate_case(load_case("case118"), k)
    nlp = acopf_polar(case, scenario_batchable=False)
    print(f"backend={platform} case={case.name} buses={case.nb} "
          f"n={nlp.n} m={nlp.m}", flush=True)

    params = sqp.Parameters(
        max_iter=maxit, OutputFlag=1, tol_infeas=1e-6, tol_residual=1e-4,
        use_soc=True, kkt_structured=True, hessian_shift="ladder",
        init_projection="off",
    )
    t0 = time.time()
    if platform == "cpu":
        res = sqp.optimize(nlp, params)
        status, iters = res.status_name, res.iterations
        obj, prim = float(res.obj_val), float(res.prim_infeas)
    else:
        # chunked on chip: every long solve must go through the watchdog-
        # safe host loop (CLAUDE.md round-4 finding)
        from sqpsolver_tpu.parallel.batch import (
            batch_data, make_chunked_batch_solver,
        )

        data = batch_data(nlp, 1)
        out = make_chunked_batch_solver(
            nlp, params.replace(OutputFlag=0), log=lambda m: print(m, flush=True)
        )(data)
        status = int(np.asarray(out.status)[0])
        iters = int(np.asarray(out.iterations)[0])
        obj = float(np.asarray(out.obj_val)[0])
        prim = float(np.asarray(out.prim_infeas)[0])
    wall = time.time() - t0
    peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

    single = VENDORED_OPTIMA["case118"]
    print(f"status={status} iters={iters} obj={obj:.2f} "
          f"inf_pr={prim:.2e} wall={wall:.1f}s peak_rss={peak_mb:.0f}MB",
          flush=True)
    print(f"sanity band: k*f*_single = {k * single:.2f} "
          f"(obj/band = {obj / (k * single):.4f})", flush=True)


if __name__ == "__main__":
    main()
