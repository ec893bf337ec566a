"""Sweep the full Hock-Schittkowski battery under algorithm="SQP-LS"
(VERDICT r2 item 9: make the LS ledger comparable to the TR battery's).

Prints one line per problem: name, status, objective vs published f*,
verdict in {OK, LOCAL (matches a known TR-battery local optimum), FAIL}.
The output seeds tests/test_ls.py's parametrized battery + xfail ledger.

Run on CPU:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
             python scripts/ls_battery.py [start_idx] [end_idx]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/sqpsolver_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

import sqpsolver_tpu as sqp  # noqa: E402
from sqpsolver_tpu.models import hs  # noqa: E402

# known alternate local optima (same table as tests/test_hs.py)
LOCAL_OPTIMA = {
    "hs002": [0.0504261879, 4.941229318],
    "hs016": [0.25, 23.14466],
    "hs020": [81.5 - 25.0 * np.sqrt(3.0), 83.5 - 25.0 * np.sqrt(3.0)],
}

PARAMS = sqp.Parameters(algorithm="SQP-LS", max_iter=500, OutputFlag=0)


def main():
    names = hs.hs_names()
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else len(names)
    n_ok = n_local = n_fail = 0
    for name in names[lo:hi]:
        prob = hs.hs_problem(name)
        try:
            res = sqp.optimize(prob.nlp, PARAMS)
            obj = float(res.obj_val)
            ok = bool(res.success) and bool(res.prim_infeas <= 1e-6)
            at_gopt = np.isclose(obj, prob.f_star, rtol=1e-4, atol=1e-6)
            at_lopt = any(
                np.isclose(obj, t, rtol=1e-4, atol=1e-6)
                for t in LOCAL_OPTIMA.get(name, [])
            )
            if ok and at_gopt:
                verdict = "OK"
                n_ok += 1
            elif ok and at_lopt:
                verdict = "LOCAL"
                n_local += 1
            else:
                verdict = "FAIL"
                n_fail += 1
            print(f"{name}: {verdict}  status={res.status_name} "
                  f"f={obj:.8g} f*={prob.f_star:.8g} "
                  f"viol={float(res.prim_infeas):.1e} "
                  f"it={int(res.iterations)}", flush=True)
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
    print(f"== {n_ok} OK, {n_local} LOCAL, {n_fail} FAIL "
          f"of {hi - lo}", flush=True)


if __name__ == "__main__":
    main()
