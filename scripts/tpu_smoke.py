"""On-chip fault isolation ladder.

The axon TPU tunnel intermittently kills programs with a generic
"TPU device error".  This script runs progressively larger pieces of the
solve path so a fault can be attributed to a component instead of the whole
bench.  Usage:

    python scripts/tpu_smoke.py [stage] [batch] [precision] [shift]

stage in {matmul, chol, qp_ir, qp_plane, sqp1, sqp32, all} (default: all).
The sqp rungs take optional positional overrides (defaults reproduce the
round-2 fault isolation: sqp1 = batch 1, sqp32 = batch 32, both
mixed_plane + power shift).  Each stage prints PASS/FAIL and timing.
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


def _run(name, fn):
    t0 = time.time()
    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"PASS {name}  ({time.time() - t0:.1f}s)", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}  ({time.time() - t0:.1f}s): {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return False


def stage_matmul():
    a = jnp.ones((512, 512), jnp.float32)
    return jax.jit(lambda a: a @ a)(a)


def stage_chol():
    key = jax.random.PRNGKey(0)
    b = jax.random.normal(key, (32, 143, 143), jnp.float32)
    spd = b @ jnp.swapaxes(b, -1, -2) + 143 * jnp.eye(143, dtype=jnp.float32)
    return jax.jit(jnp.linalg.cholesky)(spd)


def _qp(precision):
    from sqpsolver_tpu.models.acopf import acopf_polar
    from sqpsolver_tpu.models.matpower import load_case
    from sqpsolver_tpu.ops.qp_ipm import IpmOptions, solve_qp

    case = load_case("case30")
    nlp = acopf_polar(case)
    d = nlp.data()
    x = d.x0
    f, gr = nlp.obj_grad(x, d.theta)
    E = nlp.cons(x, d.theta)
    J = nlp.cons_jac(x, d.theta)
    H = jnp.eye(nlp.n, dtype=x.dtype)
    opts = IpmOptions(
        max_iter=30, tol=1e-8, factor_dtype="float32",
        plane=(precision == "mixed_plane"),
    )
    w = jnp.where(jnp.arange(nlp.m) < nlp.num_linear, 0.0, 1.0)
    sol = solve_qp(H, gr, J, d.g_l - E, d.g_u - E,
                   d.x_l - x, d.x_u - x, w, opts=opts)
    return sol.p


def stage_qp_ir():
    return _qp("mixed_ir")


def stage_qp_plane():
    return _qp("mixed_plane")


def stage_sqp1(precision="mixed_plane", shift="power", batch=1,
               structured=False, nbus=30, maxit=40):
    from sqpsolver_tpu import Parameters
    from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios
    from sqpsolver_tpu.models.matpower import load_case
    from sqpsolver_tpu.parallel.batch import batch_data, make_batch_solver

    case = load_case(f"case{nbus}")
    nlp = acopf_polar(case)
    params = Parameters(max_iter=maxit, OutputFlag=0, tol_infeas=1e-6,
                        tol_residual=1e-4, qp_max_iter=30,
                        kkt_precision=precision, hessian_shift=shift,
                        init_projection="off", kkt_structured=structured)
    solver = make_batch_solver(nlp, params)
    theta = load_scenarios(case, batch, seed=7, spread=0.03)
    data = batch_data(nlp, batch, theta=theta, dtype=jnp.float64)
    out = solver(data)
    jax.block_until_ready(out.x)
    print(f"  status={np.asarray(out.status).tolist()[:16]} "
          f"iters={np.asarray(out.iterations).tolist()[:16]}", flush=True)
    return out.x


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    stages = {
        "matmul": stage_matmul,
        "chol": stage_chol,
        "qp_ir": stage_qp_ir,
        "qp_plane": stage_qp_plane,
        "sqp1": stage_sqp1,
        # the rung that reproduced the round-2 device fault: batch 32
        "sqp32": lambda **kw: stage_sqp1(**{"batch": 32, **kw}),
        # structured (BBD) rungs — round-4 isolation of the structured
        # case118 b16 on-chip fault.  The structured path defaults to the
        # Lanczos shift; pass shift=gershgorin to take the blocked-Gershgorin
        # escape hatch (convexify checks gershgorin before the structured
        # dispatch).
        "bbd": lambda **kw: stage_sqp1(
            **{"structured": True, "precision": "mixed_ir", "batch": 8,
               "shift": "power", **kw}
        ),
    }
    if which not in stages and which != "all":
        print(f"unknown stage {which!r}; valid: "
              f"{', '.join([*stages, 'all'])}", file=sys.stderr)
        sys.exit(2)
    # optional positional overrides for the sqp rungs:
    #   tpu_smoke.py sqp1 <batch> <precision> <shift>
    kw = {}
    if which.startswith("sqp") or which == "bbd":
        if len(sys.argv) > 2:
            kw["batch"] = int(sys.argv[2])
        if len(sys.argv) > 3 and sys.argv[3] != "-":
            kw["precision"] = sys.argv[3]
        if len(sys.argv) > 4:
            kw["shift"] = sys.argv[4]
        if len(sys.argv) > 5:
            kw["nbus"] = int(sys.argv[5])
        if len(sys.argv) > 6:
            kw["maxit"] = int(sys.argv[6])
    if which == "all":
        ok = True
        for name, fn in stages.items():
            ok = _run(name, fn) and ok
            if not ok:
                break
        sys.exit(0 if ok else 1)
    fn = stages[which]
    _run(which, (lambda: fn(**kw)) if kw else fn) or sys.exit(1)


if __name__ == "__main__":
    main()
