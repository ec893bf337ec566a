"""Checkpoint / resume of long (batched) solves.

The reference has no in-solver checkpointing — only warm-start plumbing
(SURVEY §5.4).  Here the solver state is an immutable pytree, so long batched
runs checkpoint trivially: advance the jitted loop in chunks of K iterations,
serialize the :class:`SqpState` pytree with orbax between chunks, and resume
from the latest checkpoint after a preemption — the standard TPU resilience
pattern for multi-hour fleets.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..nlp import NLP, NLPData
from ..parameters import Parameters
from ..algorithms.sqp_tr import SqpResult, make_solver


def solve_with_checkpoints(
    nlp: NLP,
    params: Parameters,
    data: NLPData,
    *,
    chunk_iters: int = 50,
    checkpoint_dir: Optional[str] = None,
    resume: bool = True,
    batched: bool = False,
) -> SqpResult:
    """Solve with periodic state checkpoints.

    ``batched=True`` treats ``data`` as having a leading instance axis (the
    state pytree is vmapped accordingly).  With ``checkpoint_dir`` set, state
    is saved after every chunk and, if ``resume`` and a checkpoint exists,
    the solve continues from it instead of starting over.

    ``params.time_limit`` is honored at chunk granularity: when the wall
    clock exceeds it the solve stops and unfinished instances report
    Maximum_CpuTime_Exceeded (-4).  (The reference declares this parameter
    but never implements it, src/parameters.jl:21.)
    """
    import time as _time

    t_start = _time.time()
    import jax.numpy as jnp

    solver = make_solver(nlp, params, verbose=False)
    init_state = solver._init_state
    run_until = solver._run_until
    finalize = solver._finalize
    if batched:
        init_state = jax.vmap(init_state)
        run_until = jax.vmap(run_until, in_axes=(0, 0, None))
        finalize = jax.vmap(finalize)
    # limit is TRACED (not static): one compiled program serves every chunk
    # boundary — a static limit recompiled per distinct value, which on the
    # axon remote compiler costs minutes per chunk
    run_until = jax.jit(run_until)
    finalize = jax.jit(finalize)

    ckptr = None
    ckpt_path = None
    if checkpoint_dir is not None:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckpt_path = os.path.join(os.path.abspath(checkpoint_dir), "sqp_state")

    st = None
    if ckptr is not None and resume and os.path.exists(ckpt_path):
        template = jax.tree.map(np.asarray, init_state(data))
        restored = ckptr.restore(ckpt_path, item=template)
        st = jax.tree.map(jnp.asarray, restored)
        st = type(template)(*st) if not isinstance(st, type(template)) else st
    if st is None:
        st = init_state(data)

    max_iter = params.max_iter
    timed_out = False
    while True:
        it = np.asarray(st.iter)
        done = np.asarray(st.done)
        if bool(np.all(done)) or int(it.max()) > max_iter:
            break
        if _time.time() - t_start > params.time_limit:
            timed_out = True
            break
        limit = min(int(it.max()) + chunk_iters - 1, max_iter)
        st = run_until(st, data, jnp.asarray(limit, jnp.int32))
        jax.block_until_ready(st.x)
        if ckptr is not None:
            host_state = jax.tree.map(np.asarray, st)
            ckptr.save(ckpt_path, host_state, force=True)

    result = finalize(st, data)
    if timed_out:
        from ..status import Status

        status = np.where(
            ~np.asarray(st.done),
            np.int32(Status.MAXIMUM_CPUTIME_EXCEEDED),
            np.asarray(result.status),
        )
        result = result._replace(status=jnp.asarray(status))
    return result
