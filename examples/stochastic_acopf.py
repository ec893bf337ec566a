"""Two-stage stochastic ACOPF: shared here-and-now dispatch across load
scenarios, solved as ONE structured NLP.

The reference is strictly single-instance (sqp_trust_region.jl:124); this is
the SURVEY §7 step-6 capability — cross-scenario coupling through shared
first-stage variables, factored by the bordered-block-diagonal KKT path
(scenario locals = interiors, shared dispatch = separator) instead of a
dense coupled system.  On a multi-chip mesh the scenario blocks spread over
devices (parallel.sharding.make_block_sharded_solver).

Run: python examples/stochastic_acopf.py  [K]
"""

import sys

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/sqpsolver_tpu_jax_cache")

import numpy as np  # noqa: E402

import sqpsolver_tpu as sqp  # noqa: E402
from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios  # noqa: E402
from sqpsolver_tpu.models.matpower import load_case  # noqa: E402
from sqpsolver_tpu.models.stochastic import (  # noqa: E402
    couple_scenarios,
    pg_shared_mask,
)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    case = load_case("case30")
    nlp = acopf_polar(case)
    thetas = load_scenarios(case, K, seed=7, spread=0.03)

    coupled = couple_scenarios(nlp, thetas, pg_shared_mask(case, nlp))
    print(f"{case.name}: {K} scenarios, coupled n={coupled.n} m={coupled.m}")

    params = sqp.Parameters(
        max_iter=150, OutputFlag=1, tol_infeas=1e-6, tol_residual=1e-4,
        use_soc=True, kkt_structured=True, hessian_shift="power",
    )
    res = sqp.optimize(coupled, params)
    print(res)
    mask = pg_shared_mask(case, nlp)
    ns = int(mask.sum())
    print("shared dispatch (p.u.):", np.round(np.asarray(res.x[:ns]), 4))
    print(f"expected cost: {float(res.obj_val):.2f} $/h")


if __name__ == "__main__":
    main()
