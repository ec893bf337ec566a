"""Where do the HLO characters go?  Lower the bench program and report the
largest functions in the StableHLO module (the axon remote compile time
scales with module size — scripts/compile_probe.py measures the total, this
attributes it)."""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = os.environ.get("PROBE_PLATFORM", "cpu")

import jax

jax.config.update("jax_enable_x64", True)

from sqpsolver_tpu import Parameters  # noqa: E402
from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios  # noqa: E402
from sqpsolver_tpu.models.matpower import load_case  # noqa: E402
from sqpsolver_tpu.parallel.batch import batch_data  # noqa: E402


def main(nbus=30, batch=32, structured=False):
    case = load_case(f"case{nbus}")
    nlp = acopf_polar(case)
    params = Parameters(
        max_iter=40, OutputFlag=0, tol_infeas=1e-6, tol_residual=1e-4,
        qp_max_iter=30, kkt_precision="mixed_ir", hessian_shift="eigh",
        schur_cap=-1, init_projection="off", kkt_structured=structured,
    )
    from sqpsolver_tpu.algorithms.sqp_tr import make_solver

    core = make_solver(nlp, params, verbose=False)._raw
    fn = jax.jit(jax.vmap(core))
    theta = load_scenarios(case, batch, seed=7, spread=0.03)
    args = (batch_data(nlp, batch, theta=theta),)
    txt = fn.lower(*args).as_text()
    print(f"total: {len(txt)/1e6:.2f}M chars, case{nbus} b{batch} "
          f"structured={structured}")
    # attribute chars to stablehlo functions
    sizes = Counter()
    cur = "<module>"
    for line in txt.splitlines(keepends=True):
        m = re.match(r"\s*func\.func\s+(?:private\s+)?@(\S+?)\(", line)
        if m:
            cur = m.group(1)
        sizes[cur] += len(line)
    for name, sz in sizes.most_common(25):
        print(f"  {sz/1e3:8.0f}K  {name}")


if __name__ == "__main__":
    nbus = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    structured = len(sys.argv) > 3 and sys.argv[3] == "structured"
    main(nbus, batch, structured)
