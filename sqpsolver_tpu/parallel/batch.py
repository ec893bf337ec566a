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


def make_chunked_batch_solver(
    nlp: NLP,
    params: Parameters = Parameters(),
    *,
    target_chunk_seconds: float = 20.0,
    chunk0: int = 1,
    max_chunk: int = 64,
    sub_batch: int = 0,
    log: Callable[[str], None] | None = None,
    rescue_fallback: bool = False,
    micro_trips: int = 0,
) -> Callable[[NLPData], SqpResult]:
    """Batched solver advanced in host-controlled chunks of outer iterations.

    WHY THIS EXISTS (round-4 root cause): the axon TPU tunnel kills any
    single device-program execution at 60 seconds with the generic
    "UNAVAILABLE: TPU device error" (measured exactly: a benign matmul loop
    targeting 75 s dies at 60.0 s, a 26 s one passes — scripts/op_probe.py
    session; this one limit explains every round-2/3/4 'device fault': the
    Lanczos-at-b32 fault, structured case118 b16, dense case30 b256, and
    eigh on NaN input, which simply never converges).  A monolithic batched
    `lax.while_loop` solve of B instances x I iterations is ONE execution;
    at case118-scale it crosses 60 s long before convergence.

    The solver state is an immutable pytree, so the fix is architectural
    and cheap: advance `run_until` by a bounded iteration chunk per device
    call (the limit is a TRACED argument — one compile covers every chunk
    size), measure each chunk's wall clock on the host, and adapt the next
    chunk to ``target_chunk_seconds``.  Host early-exit when every lane is
    done.  Chunking costs one host round-trip per chunk (~ms) and buys:

    * watchdog immunity (each call is far under the 60 s limit),
    * the checkpoint/resume cut points (utils/checkpoint.py uses the same
      `run_until` contract), and
    * a future lane-repacking hook at chunk boundaries.

    ``sub_batch``: device slab width.  Measured on v5e: a COLD SQP
    iteration at case30 b256 costs ~15 s (the first QPs take ~38 IPM
    trips), so at b1024 even a ONE-iteration chunk would cross the 60 s
    watchdog.  At these sizes the chip is throughput-bound — processing
    the batch through a fixed-width slab loses nothing and ONE compiled
    program serves any batch size.  With a slab, lanes are scheduled as a
    WORK QUEUE: each round gathers up to ``sub_batch`` still-active lanes
    (padded with done lanes whose QPs skip at trip 0), advances them one
    chunk, and scatters the state back.  This also kills the straggler
    tax: a batched `lax.while_loop` runs max-over-lanes trips at full
    width, and one rescue-heavy lane was measured costing 10-24 s per
    iteration with 127/128 lanes done riding along.  0 = full width.

    ``rescue_fallback``: two-pass execution for fleets running with
    ``qp_rescue=False`` (the f64 stall-rescue phase factors in EMULATED
    f64 on TPU; under max-over-lanes semantics one rescue-bound lane drags
    the whole batch through those trips).  Pass 1 runs the fast rescue-free
    program; lanes that exit with Error_In_Step_Computation (-3) are then
    RE-SOLVED from cold by a lazily-built rescue-enabled twin of the same
    chunked solver, and their results merged back.  Measured case30 b256:
    248/256 converge in the fast pass at 70 iter/s; only the 8 stalled
    lanes pay the f64 price.
    """
    if params.qp_rescue and nlp.n >= 160:
        # LARGE rescue-enabled solves advance ONE iteration per device call:
        # the per-iteration cost is bimodal (0.4 s steady-state vs ~19 s
        # during an f64 rescue storm at W=8, a 35-50x flip), so no learned
        # estimate is watchdog-safe — measured on v5e: after two cheap
        # chunks the decayed-worst controller raised k to 3 and a single
        # 3-iteration call crossed the 60 s watchdog mid-rescue (dense
        # case118 b16).  The host round-trip tax (~0.2-0.3 s/iteration) is
        # noise on a correctness path whose iterations cost seconds.
        #
        # SMALL problems keep the adaptive controller: a case30-scale f64
        # storm iteration costs ~2 s (r4 measured 1.9 s/batched-iter worst),
        # so even a storm-heavy adaptive chunk stays well under the
        # watchdog — while one-iteration chunks made the b256 rescue pass
        # ~500 host round-trips for 7 lanes (~0.2-0.3 s each), slower than
        # the whole 249-lane fast pass.
        max_chunk = 1
    solver = make_solver(nlp, params, verbose=False)
    init_b = jax.jit(jax.vmap(solver._init_state))
    run_b = jax.jit(jax.vmap(solver._run_until, in_axes=(0, 0, None)))
    fin_b = jax.jit(jax.vmap(solver._finalize))
    max_iter = params.max_iter
    # micro-stepped mode (``micro_trips`` > 0): ONE SQP iteration is no
    # longer the atomic unit — each device call advances the f64 rescue
    # phase of an in-flight QP by at most micro_trips trips (sqp_tr
    # MicroState docstring).  The round-4 fault ladder showed a single
    # rescue/restoration QP at n=344 exceeding the 60 s watchdog even at
    # slab width 4; this is the level below ``run_until`` that fixes it.
    # only configs with an actual f64 second phase benefit: for a phase-1-
    # only program every QP finishes in its first micro call and micro mode
    # degenerates to one-iteration chunks (strictly worse than the adaptive
    # controller above)
    micro = (
        bool(micro_trips)
        and getattr(solver, "_micro_supported", False)
        and (params.qp_rescue or params.kkt_precision == "mixed_polish")
    )
    if micro:
        minit_b = jax.jit(jax.vmap(solver._micro_init))
        mstep_b = jax.jit(
            jax.vmap(solver._micro_step, in_axes=(0, 0, None))
        )

    @jax.jit
    def _gather(tree, idx):
        return jax.tree.map(lambda a: jnp.take(a, idx, axis=0), tree)

    @jax.jit
    def _scatter(full, slab, idx):
        return jax.tree.map(
            lambda f, s: f.at[idx].set(s), full, slab
        )

    def _solve_micro(data: NLPData, B: int, W: int) -> SqpResult:
        """Micro-stepped host loop: same work-queue slab scheduling as the
        chunked loop below, but each device call advances in-flight QPs by
        at most ``micro_trips`` f64 rescue trips instead of whole SQP
        iterations."""
        import time as _time

        cap = jnp.asarray(int(micro_trips), jnp.int32)
        t0 = _time.time()
        if W == B:
            ms = minit_b(data)
        else:
            idx_all = np.arange(B)
            slabs = []
            for i in range(0, B, W):
                sel = idx_all[i : i + W]
                if len(sel) < W:
                    sel = np.concatenate(
                        [sel, np.full(W - len(sel), sel[-1])]
                    )
                slabs.append(minit_b(_gather(data, jnp.asarray(sel))))
            ms = (
                jax.tree.map(
                    lambda *xs: jnp.concatenate(xs, axis=0)[:B], *slabs
                )
                if len(slabs) > 1
                else slabs[0]
            )
        jax.block_until_ready(ms.sqp.x)
        if log:
            log(f"micro: init {_time.time() - t0:.1f}s "
                f"(B={B}, W={W}, cap={int(micro_trips)})")
        calls = 0
        while True:
            it = np.asarray(ms.sqp.iter)
            done = np.asarray(ms.sqp.done)
            active = np.where(~done & (it <= max_iter))[0]
            if active.size == 0:
                break
            # work queue: least-advanced active lanes form the slab (ties
            # include the in-flight-QP lanes, which sit at the same iter
            # until their QP completes); pad with done lanes — their QPs
            # skip at trip 0
            order = active[np.argsort(it[active], kind="stable")]
            sel = order[:W]
            if sel.size < W:
                pad_pool = np.setdiff1d(np.arange(B), sel)
                sel = np.concatenate([sel, pad_pool[: W - sel.size]])
            sel_d = jnp.asarray(np.sort(sel))
            t0 = _time.time()
            ms_slab = mstep_b(
                _gather(ms, sel_d), _gather(data, sel_d), cap
            )
            jax.block_until_ready(ms_slab.sqp.x)
            ms = _scatter(ms, ms_slab, sel_d)
            calls += 1
            if log:
                done_now = int(np.asarray(ms.sqp.done).sum())
                inflight = int(np.asarray(ms.qp_active).sum())
                log(f"micro: call {calls} ran {_time.time() - t0:.1f}s "
                    f"({done_now}/{B} done, slab {sel.size}, "
                    f"{inflight} QPs in flight)")
        return fin_b(ms.sqp, data)

    def solve(data: NLPData) -> SqpResult:
        import time as _time

        B_req = int(data.x0.shape[0])
        if params.qp_rescue and B_req < 4:
            # degenerate leading dims are a compiler trap for the rescue
            # program: the W=2 variant crashes XLA's memory-space-assignment
            # pass in the remote compile (SIGABRT) and W=1/3 are untested
            # cousins.  Pad the batch to 4 by duplicating the last lane —
            # under max-over-lanes semantics the duplicates ride along at
            # ~the real lane's cost — and slice the result back at the end.
            pad = 4 - B_req
            data = jax.tree.map(
                lambda a: jnp.concatenate(
                    [a] + [a[-1:]] * pad, axis=0
                ),
                data,
            )
        B = int(data.x0.shape[0])
        W = min(sub_batch, B) if sub_batch else B
        if params.qp_rescue and W < 4:
            W = min(4, B)  # same MSA-crash avoidance for the slab width

        if micro:
            res = _solve_micro(data, B, W)
            if B != B_req:  # drop the degenerate-width padding lanes
                res = jax.tree.map(lambda a: a[:B_req], res)
            return res

        t0 = _time.time()
        if W == B:
            st = init_b(data)
        else:
            # init through the same width-W program (one compile): process
            # lanes in W-slabs (init is cheap — clip + one obj/cons eval)
            idx_all = np.arange(B)
            slabs = []
            for i in range(0, B, W):
                sel = idx_all[i : i + W]
                if len(sel) < W:  # pad by repeating the last lane
                    sel = np.concatenate(
                        [sel, np.full(W - len(sel), sel[-1])]
                    )
                slabs.append((sel, init_b(_gather(data, jnp.asarray(sel)))))
            st = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0)[:B],
                *[s for _, s in slabs],
            ) if len(slabs) > 1 else slabs[0][1]
        jax.block_until_ready(st.x)
        if log:
            log(f"chunked: init {_time.time() - t0:.1f}s (B={B}, W={W})")

        k = max(1, int(chunk0))
        per_iter_worst = 0.0
        first_chunk = True
        while True:
            it = np.asarray(st.iter)
            done = np.asarray(st.done)
            active = np.where(~done & (it <= max_iter))[0]
            if active.size == 0:
                break
            # work queue: the W least-advanced active lanes form the slab
            # (keeps lane progress roughly level so the batch drains
            # together); pad with done lanes — their QPs skip at trip 0
            order = active[np.argsort(it[active], kind="stable")]
            act_sel = order[:W]  # the slab's ACTIVE lanes, pre-padding
            sel = act_sel
            if sel.size < W:
                pad_pool = np.setdiff1d(np.arange(B), sel)
                sel = np.concatenate([sel, pad_pool[: W - sel.size]])
            sel_d = jnp.asarray(np.sort(sel))
            st_slab = _gather(st, sel_d)
            d_slab = _gather(data, sel_d)
            # the chunk limit keys on the ACTIVE lanes only: a done padding
            # lane parked at a lower iteration would otherwise pin the limit
            # below every active lane and the loop would spin forever
            # advancing nothing (hit: b256 rescue pass, 5 active lanes
            # padded with 3 done lanes at an earlier iteration)
            hi = int(it[act_sel].min())
            limit = min(hi + k - 1, max_iter)
            if log:
                log(f"chunked: -> limit {limit} (k={k}, "
                    f"{int(done.sum())}/{B} done, slab {sel.size})")
            t0 = _time.time()
            st_slab = run_b(st_slab, d_slab, jnp.asarray(limit, jnp.int32))
            jax.block_until_ready(st_slab.x)
            dt = _time.time() - t0
            st = _scatter(st, st_slab, sel_d)
            adv = max(
                int(np.asarray(st_slab.iter).max()) - int(it[sel].max()), 1
            )
            per_iter = dt / adv
            if log:
                log(f"chunked: chunk ran {dt:.1f}s ({adv} iters, "
                    f"{per_iter:.2f}s/iter)")
            # Adapt against the 60 s watchdog with three safeguards:
            # * the FIRST chunk's wall time includes the one-off jit compile
            #   (observed 199 s for a 3 s chunk) — never learn from it;
            # * size by a decayed-worst per-iteration cost (iteration cost
            #   is strongly non-uniform: cold QPs and rescue-heavy endgame
            #   iterations spike well above steady state), halving per
            #   chunk so a one-off spike doesn't pin k at 1 forever;
            # * growth capped at 4x per chunk so one cheap chunk cannot
            #   launch a huge overshoot (a 1->19 jump crossed the watchdog
            #   at case118 b16), with the projection bounded to ~25 s so a
            #   2x per-iteration spike inside a chunk still fits.
            if first_chunk:
                first_chunk = False
            else:
                per_iter_worst = (
                    max(per_iter, 0.5 * per_iter_worst)
                    if per_iter_worst > 0.0
                    else per_iter
                )
            if dt > 40.0:
                # close call: a spike blew straight past the projection
                # (iteration cost can flip 35x when lanes enter the f64
                # rescue) — drop to single-iteration chunks and hold the
                # spike cost undecayed as the new floor
                k = 1
                per_iter_worst = max(per_iter_worst, per_iter)
            elif per_iter_worst > 0.0:
                k = int(np.clip(
                    min(target_chunk_seconds, 25.0)
                    / max(per_iter_worst, 1e-4),
                    1,
                    min(4 * k, max_chunk),
                ))
        res = fin_b(st, data)

        if rescue_fallback and not params.qp_rescue:
            from ..status import Status

            status = np.asarray(res.status)
            bad = np.where(status == int(Status.ERROR_IN_STEP_COMPUTATION))[0]
            if bad.size:
                if log:
                    log(f"chunked: rescue fallback for {bad.size} lanes")
                # pad to the fallback's slab width so its init/run programs
                # see one fixed shape (duplicate lanes are just re-solved)
                W_fb = _fb_width()
                pad_n = (-bad.size) % W_fb
                idx = np.concatenate([bad, np.full(pad_n, bad[0], bad.dtype)])
                res_bad = _fallback()(
                    _gather(data, jnp.asarray(idx))
                )
                sel = jnp.asarray(bad)
                res = jax.tree.map(
                    lambda f, p: f.at[sel].set(p[: bad.size]), res, res_bad
                )
        if B != B_req:  # drop the degenerate-width padding lanes
            res = jax.tree.map(lambda a: a[:B_req], res)
        return res

    _fb_cache: list = []

    def _fb_width() -> int:
        # The watchdog-atomic unit of a rescue pass is ONE SQP iteration =
        # one QP = up to qp_max_iter f64-emulated-factor trips; it cannot
        # be subdivided by chunking, only narrowed.  Measured on v5e at
        # n=344 (case118): a single rescue-storm iteration at W=8 costs
        # 44-60+ s (one crossed the 60 s watchdog at k=1), i.e. ~8 s per
        # lane — so the width scales down with problem size to hold the
        # worst single iteration well under the limit.  Floor at 4: the
        # batch-2 variant of the rescue program crashed XLA's memory-space-
        # assignment pass in the remote compile (MSA "conflicting pending
        # required assignment" check failure, SIGABRT) while W=8 compiled
        # clean — degenerate leading dims are a known compiler trap.
        w = 8 if nlp.n < 160 else 4
        # never return the known-crashing widths: a caller-supplied
        # sub_batch of 2 or 3 (SQP_BENCH_SUBBATCH) is rounded UP to 4 —
        # running the W=2/3 rescue program would reproduce the MSA SIGABRT
        return max(4, min(w, sub_batch) if sub_batch else w)

    def _fallback():
        if not _fb_cache:
            _fb_cache.append(
                make_chunked_batch_solver(
                    nlp,
                    params.replace(qp_rescue=True),
                    target_chunk_seconds=target_chunk_seconds,
                    chunk0=chunk0,
                    max_chunk=max_chunk,
                    sub_batch=_fb_width(),
                    log=log,
                    rescue_fallback=False,
                    micro_trips=micro_trips,
                )
            )
        return _fb_cache[0]

    return solve


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
