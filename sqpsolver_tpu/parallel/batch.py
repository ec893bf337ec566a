"""Instance-batched solves (vmap).

The reference is strictly serial and single-instance (SURVEY §2.4); batching
is the first designed-for-TPU scaling axis: one compiled SQP program advances
B independent NLP instances in lockstep, with per-instance status/FR/TR state
as masked arithmetic (``algorithms.sqp_tr`` is written branch-free for exactly
this).  Divergent instances simply mask out (``done`` lanes do no updates);
the batch finishes when every instance has terminated.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nlp import NLP, NLPData
from ..parameters import Parameters
from ..algorithms.sqp_tr import SqpResult, make_solver


def batch_data(
    nlp: NLP,
    batch: int,
    *,
    theta=None,
    x0=None,
    dtype=jnp.float64,
) -> NLPData:
    """Tile an NLP's data along a leading batch axis.

    ``theta`` (scenario parameters with leading axis ``batch``) and/or ``x0``
    (per-instance starts, shape (batch, n)) override the tiled defaults.
    """
    base = nlp.data(dtype=dtype)
    tile = lambda a: jnp.broadcast_to(a, (batch,) + a.shape)
    if theta is None:
        theta = base.theta
        if theta is not None:
            theta = jax.tree.map(tile, theta)
    else:
        theta = jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), theta)
    x0_arr = tile(base.x0) if x0 is None else jnp.asarray(x0, dtype=dtype)
    return NLPData(
        x_l=tile(base.x_l),
        x_u=tile(base.x_u),
        g_l=tile(base.g_l),
        g_u=tile(base.g_u),
        x0=x0_arr,
        theta=theta,
    )


def make_batch_solver(
    nlp: NLP,
    params: Parameters = Parameters(),
) -> Callable[[NLPData], SqpResult]:
    """jitted vmapped solver: batched NLPData -> batched SqpResult."""
    core = make_solver(nlp, params, verbose=False)._raw
    return jax.jit(jax.vmap(core))


def summarize_batch(raw: SqpResult) -> dict:
    """Host-side summary of a batched solve."""
    status = np.asarray(raw.status)
    return {
        "batch": int(status.shape[0]),
        "n_success": int(np.isin(status, [0, 1, 6]).sum()),
        "n_infeasible": int((status == 2).sum()),
        "status_counts": {
            int(s): int((status == s).sum()) for s in np.unique(status)
        },
        "iterations_max": int(np.asarray(raw.iterations).max()),
        "iterations_mean": float(np.asarray(raw.iterations).mean()),
        "prim_infeas_max": float(np.asarray(raw.prim_infeas).max()),
        "obj_mean": float(np.asarray(raw.obj_val).mean()),
        # where the iterations went (per-batch totals): rejected steps, FR
        # entries, accepted second-order corrections, total IPM trips
        "n_reject": int(np.asarray(raw.n_reject).sum()),
        "n_fr": int(np.asarray(raw.n_fr_iters).sum()),
        "n_soc": int(np.asarray(raw.n_soc_accept).sum()),
        "qp_trips": int(np.asarray(raw.qp_iters_total).sum()),
    }
