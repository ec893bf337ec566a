"""Where does cold-compile time go?  (VERDICT r2 item 6)

Times ``.lower().compile()`` of the batched bench program under ablations on
the CPU backend (relative shares guide the attack; the axon remote compile is
the real cold number but scales with the same HLO).  Fresh process per probe
recommended; a fresh cache dir is forced so nothing is reused.

Usage: python scripts/compile_probe.py [case] [batch] [ablation ...]
  ablation in {full, noshift, norescue, nowarm, qp_only, min}
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = os.environ.get("PROBE_PLATFORM", "cpu")

import jax

jax.config.update("jax_enable_x64", True)
cache = tempfile.mkdtemp(prefix="probe_cache_")
jax.config.update("jax_compilation_cache_dir", cache)

import jax.numpy as jnp  # noqa: E402

from sqpsolver_tpu import Parameters  # noqa: E402
from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios  # noqa: E402
from sqpsolver_tpu.models.matpower import load_case  # noqa: E402
from sqpsolver_tpu.parallel.batch import batch_data  # noqa: E402


def probe(nbus, batch, which):
    case = load_case(f"case{nbus}")
    nlp = acopf_polar(case)
    base = Parameters(
        max_iter=40, OutputFlag=0, tol_infeas=1e-6, tol_residual=1e-4,
        qp_max_iter=30, kkt_precision="mixed_ir", hessian_shift="eigh",
        schur_cap=-1, init_projection="off",
    )
    mods = {
        "full": {},
        "noshift": {"hessian_shift": "gershgorin"},
        "norescue": {"qp_rescue": False},
        "nowarm": {"qp_warm_start": False},
        "nosoc": {"use_soc": False},
        "min": {"hessian_shift": "gershgorin", "qp_rescue": False,
                "qp_warm_start": False, "use_soc": False},
    }
    if which == "qp_only":
        from sqpsolver_tpu.ops.qp_ipm import IpmOptions, solve_qp

        d = nlp.data()
        x = d.x0
        _, gr = nlp.obj_grad(x, d.theta)
        E = nlp.cons(x, d.theta)
        J = nlp.cons_jac(x, d.theta)
        H = jnp.eye(nlp.n, dtype=x.dtype)
        opts = IpmOptions(max_iter=30, tol=1e-8, factor_dtype="float32",
                          polish_iters=20)
        w = jnp.ones((nlp.m,))

        def one(Hb):
            return solve_qp(Hb, gr, J, d.g_l - E, d.g_u - E,
                            d.x_l - x, d.x_u - x, w, opts=opts).p

        fn = jax.jit(jax.vmap(one))
        args = (jnp.broadcast_to(H, (batch,) + H.shape),)
    else:
        params = base.replace(**mods[which])
        from sqpsolver_tpu.algorithms.sqp_tr import make_solver

        core = make_solver(nlp, params, verbose=False)._raw
        fn = jax.jit(jax.vmap(core))
        theta = load_scenarios(case, batch, seed=7, spread=0.03)
        args = (batch_data(nlp, batch, theta=theta),)

    t0 = time.time()
    lowered = fn.lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    txt = lowered.as_text()
    print(f"{which:>10}: trace+lower {t1 - t0:6.1f}s  compile {t2 - t1:6.1f}s"
          f"  hlo_chars {len(txt) / 1e6:.1f}M", flush=True)
    del compiled


if __name__ == "__main__":
    nbus = int(sys.argv[1]) if len(sys.argv) > 1 else 118
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    which = sys.argv[3] if len(sys.argv) > 3 else "full"
    try:
        probe(nbus, batch, which)
    finally:
        shutil.rmtree(cache, ignore_errors=True)
