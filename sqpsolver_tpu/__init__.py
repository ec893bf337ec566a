"""sqpsolver_tpu — a TPU-native trust-region SQP framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
exanauts/SqpSolver.jl (reference mounted read-only at ``/root/reference``):
trust-region SQP with an l1-penalty merit function, feasibility restoration,
and second-order correction for continuous NLPs

    min f(x)  s.t.  g_L <= g(x) <= g_U,  x_L <= x <= x_U.

Where the reference uses JuMP/MOI sparse callbacks for derivatives and an
external Ipopt process-local library for every QP subproblem, this framework
uses jax AD on user-supplied pure functions and an in-framework, batched
elastic interior-point QP solver; the whole SQP solve compiles to a single
XLA program that can be vmapped over thousands of NLP instances and sharded
over a TPU mesh.

Quick start (the reference's toy problem, test/ext_solver.jl)::

    import sqpsolver_tpu as sqp
    sqp.enable_x64()
    from sqpsolver_tpu.models.toy import toy_nlp
    res = sqp.optimize(toy_nlp(), sqp.Parameters(max_iter=100))
    print(res.x, res.status_name)
"""

from __future__ import annotations

import time as _time

import jax as _jax

from .nlp import NLP, NLPData, build_nlp, initial_point
from .parameters import Parameters, get_parameter, set_parameter
from .results import Results, from_raw
from .status import STATUS_NAME, Status, is_success, status_name

__version__ = "0.1.0"

__all__ = [
    "NLP",
    "NLPData",
    "Parameters",
    "Results",
    "Status",
    "STATUS_NAME",
    "build_nlp",
    "enable_x64",
    "get_parameter",
    "initial_point",
    "is_success",
    "make_solver",
    "optimize",
    "set_parameter",
    "status_name",
]


def enable_x64() -> None:
    """Enable float64 in jax (required for the default dtype='float64').

    On TPU, float64 is software-emulated; for chip-speed solves use
    ``Parameters(dtype='float32', kkt_precision='mixed_ir')`` instead.
    """
    _jax.config.update("jax_enable_x64", True)


def make_solver(nlp: NLP, params: Parameters = Parameters(), **kw):
    """Build a jittable solve function NLPData -> SqpResult (see
    algorithms.sqp_tr.make_solver / algorithms.sqp_ls.make_ls_solver)."""
    if params.algorithm == "SQP-TR":
        from .algorithms.sqp_tr import make_solver as _mk
    elif params.algorithm == "SQP-LS":
        from .algorithms.sqp_ls import make_ls_solver as _mk
    else:
        # reference: unknown algorithm -> status -12 Invalid_Option
        # (src/model.jl:86-90); we fail loudly at build time instead
        raise ValueError(
            f"unknown algorithm {params.algorithm!r} (Invalid_Option); "
            "expected 'SQP-TR' or 'SQP-LS'"
        )
    return _mk(nlp, params, **kw)


def optimize(nlp: NLP, params: Parameters = Parameters(), **kw) -> Results:
    """Solve one NLP end-to-end and return host-side Results.

    The convenience entry point mirroring ``JuMP.optimize!`` ->
    ``MOI.optimize!`` -> ``optimize!(::Model)`` in the reference
    (SURVEY §3.1); for batched / sharded / repeated solves build the solver
    once with :func:`make_solver` and jit it yourself.
    """
    import jax.numpy as jnp

    solver = make_solver(nlp, params, **kw)
    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    data = nlp.data(dtype=dtype)
    t0 = _time.time()
    raw = solver(data)
    _jax.block_until_ready(raw.x)
    return from_raw(raw, _time.time() - t0)
