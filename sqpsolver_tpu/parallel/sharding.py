"""Multi-device sharding of batched solves (pjit over a Mesh).

The reference has no distributed backend at all (SURVEY §2.4: no NCCL/MPI —
strictly one process).  The TPU-native scaling design: shard the *instance*
axis of a vmapped solve across a ``jax.sharding.Mesh``; every instance's SQP
state lives on one device, so the hot loop needs **zero** collectives — XLA
only communicates at the final gather (and for any cross-instance reductions
the caller requests).  ICI/DCN collectives therefore ride only on explicitly
batched reductions (e.g. fleet-level convergence counters), which is the
speed-of-light layout for an embarrassingly-parallel solver fleet.

Works identically on a real TPU slice and on the CPU fake mesh
(``--xla_force_host_platform_device_count``) used by the tests and by the
driver's ``dryrun_multichip``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nlp import NLP, NLPData
from ..parameters import Parameters
from ..algorithms.sqp_tr import SqpResult, make_solver
from .batch import batch_data


def instance_mesh(devices: Optional[Sequence] = None, axis: str = "batch") -> Mesh:
    """1-D device mesh over the instance axis."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_data(data: NLPData, mesh: Mesh, axis: str = "batch") -> NLPData:
    """Place batched NLPData with the leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), data)


def make_sharded_solver(
    nlp: NLP,
    params: Parameters = Parameters(),
    mesh: Optional[Mesh] = None,
    axis: str = "batch",
) -> Callable[[NLPData], SqpResult]:
    """Compile a batched solver whose instance axis is sharded over ``mesh``.

    The returned function takes NLPData with leading dimension B (a multiple
    of the mesh size) and returns a sharded batched SqpResult.
    """
    mesh = mesh or instance_mesh(axis=axis)
    core = make_solver(nlp, params, verbose=False)._raw
    # GSPMD: the input placement (shard_data) pins the instance axis to the
    # mesh; jit propagates that sharding through the whole while_loop program,
    # so each device advances its shard of instances with no collectives.
    return jax.jit(jax.vmap(core))


def make_block_sharded_solver(
    nlp: NLP,
    params: Parameters,
    mesh: Optional[Mesh] = None,
    axis: str = "block",
) -> Callable[[NLPData], SqpResult]:
    """Compile ONE large structured instance with its BBD part axis sharded
    over the mesh (SURVEY §7 step 6: Schur-complement coupling over the
    interconnect).

    Requires ``params.kkt_structured=True`` and ``nlp.structure``; pick
    ``params.kkt_parts`` as a multiple of the mesh size so the interior
    blocks divide evenly across devices.  Typical use: a cross-scenario
    coupled NLP (models/stochastic) whose scenario blocks spread over the
    chips while the shared first-stage block reduces over ICI.
    """
    if not params.kkt_structured:
        raise ValueError("block sharding requires kkt_structured=True")
    mesh = mesh or instance_mesh(axis=axis)
    core = make_solver(
        nlp, params, verbose=False, block_shard=(mesh, axis)
    )._raw
    return jax.jit(core)


def solve_sharded(
    nlp: NLP,
    params: Parameters,
    batch: int,
    *,
    theta=None,
    mesh: Optional[Mesh] = None,
    axis: str = "batch",
) -> SqpResult:
    """End-to-end sharded batched solve: build data, shard, solve."""
    import jax.numpy as jnp

    mesh = mesh or instance_mesh(axis=axis)
    ndev = mesh.devices.size
    if batch % ndev != 0:
        raise ValueError(f"batch {batch} not divisible by mesh size {ndev}")
    dtype = jnp.float64 if params.dtype == "float64" else jnp.float32
    data = batch_data(nlp, batch, theta=theta, dtype=dtype)
    data = shard_data(data, mesh, axis)
    solver = make_sharded_solver(nlp, params, mesh, axis)
    return solver(data)
