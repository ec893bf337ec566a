"""Split remote-compile from first-run for a fault rung (round-4 isolation).

The axon tunnel reports one generic UNAVAILABLE for kernel faults AND
compile/infrastructure failures; tpu_smoke.py can't tell them apart.  This
prober lowers locally, compiles (the remote step) with its own timing, THEN
executes — whichever step dies is printed.

Usage: python scripts/aot_probe.py [batch] [precision] [shift] [nbus]
                                   [maxit] [structured]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/sqpsolver_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    precision = sys.argv[2] if len(sys.argv) > 2 else "mixed_ir"
    shift = sys.argv[3] if len(sys.argv) > 3 else "power"
    nbus = int(sys.argv[4]) if len(sys.argv) > 4 else 118
    maxit = int(sys.argv[5]) if len(sys.argv) > 5 else 100
    structured = (sys.argv[6] == "1") if len(sys.argv) > 6 else True

    from sqpsolver_tpu import Parameters
    from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios
    from sqpsolver_tpu.models.matpower import load_case
    from sqpsolver_tpu.parallel.batch import batch_data
    from sqpsolver_tpu.algorithms.sqp_tr import make_solver

    case = load_case(f"case{nbus}")
    nlp = acopf_polar(case)
    params = Parameters(
        max_iter=maxit, OutputFlag=0, tol_infeas=1e-6, tol_residual=1e-4,
        qp_max_iter=30, kkt_precision=precision, hessian_shift=shift,
        init_projection="off", kkt_structured=structured,
    )
    core = make_solver(nlp, params, verbose=False)._raw
    fn = jax.jit(jax.vmap(core))
    theta = load_scenarios(case, batch, seed=7, spread=0.03)
    data = batch_data(nlp, batch, theta=theta, dtype=jnp.float64)

    t0 = time.time()
    lowered = fn.lower(data)
    print(f"LOWERED ok {time.time()-t0:.1f}s "
          f"({len(lowered.as_text())/1e6:.2f}M chars)", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"COMPILED ok {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = compiled(data)
    jax.block_until_ready(out.x)
    print(f"RAN ok {time.time()-t0:.1f}s "
          f"status={np.asarray(out.status).tolist()[:16]} "
          f"iters={np.asarray(out.iterations).tolist()[:16]}", flush=True)


if __name__ == "__main__":
    main()
