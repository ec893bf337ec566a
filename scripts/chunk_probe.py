"""AOT-split probe of the chunked batch solver's three programs (init /
run-chunk / finalize) at a failing configuration — continues the round-4
b256 isolation: the chunked bench run died at the init program's first
execution.

Usage: python scripts/chunk_probe.py [batch] [nbus] [chunk_iters] [shift]
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
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nbus = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    shift = sys.argv[4] if len(sys.argv) > 4 else "eigh"

    from sqpsolver_tpu import Parameters
    from sqpsolver_tpu.algorithms.sqp_tr import make_solver
    from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios
    from sqpsolver_tpu.models.matpower import load_case
    from sqpsolver_tpu.parallel.batch import batch_data

    case = load_case(f"case{nbus}")
    nlp = acopf_polar(case)
    params = Parameters(
        max_iter=60, OutputFlag=0, tol_infeas=1e-6, tol_residual=1e-4,
        qp_max_iter=30, kkt_precision="mixed_ir", hessian_shift=shift,
        init_projection="off",
    )
    solver = make_solver(nlp, params, verbose=False)
    theta = load_scenarios(case, batch, seed=7, spread=0.03)
    data = batch_data(nlp, batch, theta=theta, dtype=jnp.float64)

    def aot(tag, fn, *args):
        t0 = time.time()
        lowered = jax.jit(fn).lower(*args)
        print(f"{tag}: lowered {time.time()-t0:.1f}s "
              f"({len(lowered.as_text())/1e6:.2f}M)", flush=True)
        t0 = time.time()
        compiled = lowered.compile()
        print(f"{tag}: COMPILED {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        out = compiled(*args)
        jax.block_until_ready(out)
        print(f"{tag}: RAN {time.time()-t0:.1f}s", flush=True)
        return out

    init_b = jax.vmap(solver._init_state)
    st = aot("init", init_b, data)
    run_b = jax.vmap(solver._run_until, in_axes=(0, 0, None))
    for c in range(80):
        it = np.asarray(st.iter)
        done = np.asarray(st.done)
        if done.all() or int(it.max()) > params.max_iter:
            break
        limit = jnp.asarray(int(it[~done].min()) + k - 1, jnp.int32)
        st = aot(f"chunk{c}(k={k})", run_b, st, data, limit)
        done = np.asarray(st.done)
        print(f"  done {int(done.sum())}/{batch} "
              f"itmax {int(np.asarray(st.iter).max())} "
              f"qp_trips {int(np.asarray(st.qp_iters_total).sum())}",
              flush=True)
    fin_b = jax.vmap(solver._finalize)
    out = aot("finalize", fin_b, st, data)
    status = np.asarray(out.status)
    print("status counts:", {int(s): int((status == s).sum())
                             for s in np.unique(status)}, flush=True)


if __name__ == "__main__":
    main()
