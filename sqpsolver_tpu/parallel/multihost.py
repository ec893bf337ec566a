"""Multi-host (pod-slice) execution helpers.

The reference has no distributed runtime at all (SURVEY §2.4/§5.8).  The
TPU-native scaling model here:

* ``jax.distributed.initialize()`` once per host (coordinator discovery via
  the standard TPU environment);
* a global 1-D instance mesh over every chip in the slice — instance batches
  shard across hosts over DCN-free layouts (each instance lives wholly on one
  chip, so the SQP hot loop still needs no collectives; only fleet-level
  reductions like the convergence census below touch the ICI/DCN);
* per-host data feeding via ``jax.make_array_from_process_local_data``.

Single-process fallbacks keep every entry point usable on one host / the CPU
fake mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kw) -> None:
    """Initialize jax.distributed if running under a multi-process launcher
    (no-op when single-process or already initialized)."""
    try:
        if jax.process_count() > 1:
            return  # already initialized
    except RuntimeError:
        pass
    try:
        jax.distributed.initialize(**kw)
    except (ValueError, RuntimeError):
        # single-process environment (no coordinator) — fine
        pass


def global_instance_mesh(axis: str = "batch") -> Mesh:
    """1-D mesh over every device in the (possibly multi-host) job."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_batch(
    global_data, mesh: Mesh, axis: str = "batch"
):
    """Assemble a globally-sharded batch from per-host shards.

    ``global_data`` is the full batched pytree on every host (cheap for NLP
    bound/theta arrays); each host contributes its slice, producing global
    jax.Arrays without replicating instance state.
    """
    sharding = NamedSharding(mesh, P(axis))

    def place(a):
        if np.ndim(a) == 0:
            return a
        return jax.make_array_from_process_local_data(sharding, np.asarray(a))

    return jax.tree.map(place, global_data)


@jax.jit
def _census_device(status):
    """Global counts over a (possibly multi-host sharded) status array.

    Plain jnp reductions: under GSPMD the sums lower to device-side
    all-reduces over ICI/DCN and return replicated scalars on every process —
    the psum census of SURVEY §5.8 (replacing the round-1 host-side numpy
    reduction, which cannot even read a non-fully-addressable global array).
    """
    import jax.numpy as jnp

    okset = jnp.asarray([0, 1, 6], status.dtype)
    ok = jnp.sum(jnp.any(status[:, None] == okset[None, :], axis=1))
    infeas = jnp.sum(status == 2)
    return ok, infeas


def convergence_census(status, mesh: Optional[Mesh] = None) -> dict:
    """Fleet-level convergence counts — the only cross-host communication a
    batched solve needs.  jax.Array inputs reduce on-device (all-reduce over
    the mesh; works for multi-process global arrays); host arrays fall back
    to numpy."""
    if isinstance(status, jax.Array):
        ok, infeas = _census_device(status)
        n_total = int(status.size)
        n_ok = int(ok)
        n_inf = int(infeas)
        return {
            "n_total": n_total,
            "n_done_ok": n_ok,
            "n_infeasible": n_inf,
            "n_other": n_total - n_ok - n_inf,
        }
    status = np.asarray(status)
    return {
        "n_total": int(status.size),
        "n_done_ok": int(np.isin(status, [0, 1, 6]).sum()),
        "n_infeasible": int((status == 2).sum()),
        "n_other": int((~np.isin(status, [0, 1, 2, 6])).sum()),
    }
