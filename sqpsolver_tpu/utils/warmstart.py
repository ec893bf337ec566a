"""Presolve warm start: solve once cheaply, start the strict solve there.

TPU-native analog of the reference's Ipopt-presolve initialization
(``/root/reference/examples/acopf/init_opf.jl:25-47`` —
``init_vars_from_ipopt`` optimizes a second copy of the model with Ipopt and
copies its solution into the start values; the SQP solve then begins from an
almost-feasible, almost-optimal point).  Here the presolver is the framework
itself at a loose tolerance: the same jitted program, so the presolve
batches/shards exactly like the strict solve, and both primal *and* dual
(``lam0``, reference ``MOI_wrapper.jl:1200-1222``) starts carry over.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nlp import NLP, NLPData
from ..parameters import Parameters

_PRESOLVE_OVERRIDES = dict(
    tol_infeas=1.0e-4,
    tol_residual=1.0e-2,
    tol_direction=1.0e-4,
    OutputFlag=0,
)


def presolve_parameters(params: Parameters, **overrides) -> Parameters:
    """Loose-tolerance copy of ``params`` used for the presolve pass."""
    kw = dict(_PRESOLVE_OVERRIDES)
    kw.setdefault("max_iter", min(params.max_iter, 50))
    kw.update(overrides)
    return dataclasses.replace(params, **kw)


def presolve_start(
    nlp: NLP,
    params: Parameters = Parameters(),
    data: NLPData | None = None,
    presolve_params: Parameters | None = None,
    **overrides,
) -> NLPData:
    """Run a loose presolve and return ``data`` with ``x0``/``lam0`` set to
    the presolve solution (clamped into the variable box).

    Batched use: pass batched ``data`` (from ``parallel.batch.batch_data``)
    and the returned pytree is batched the same way — the presolve runs as
    one vmapped solve.
    """
    import sqpsolver_tpu as sqp

    pp = presolve_params or presolve_parameters(params, **overrides)
    dtype = jnp.float64 if pp.dtype == "float64" else jnp.float32
    if data is None:
        data = nlp.data(dtype=dtype)
    core = sqp.make_solver(nlp, pp, verbose=False)._raw
    batched = data.x0.ndim == 2
    raw = jax.vmap(core)(data) if batched else core(data)
    x0 = jnp.clip(raw.x, data.x_l, data.x_u)
    return dataclasses.replace(data, x0=x0, lam0=raw.mult_g)
