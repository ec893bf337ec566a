"""Rescue-fallback merge + work-queue slab scheduling (VERDICT r4 item 6).

The two-pass ``rescue_fallback`` path of
:func:`sqpsolver_tpu.parallel.batch.make_chunked_batch_solver` is a bench
default on TPU: pass 1 runs the fast rescue-free program, lanes exiting with
``Error_In_Step_Computation`` (-3) are re-solved from cold by a rescue-enabled
twin, and the results merged back.  A merge bug would silently misreport
convergence, so these tests pin:

* the merge is exact — rescued lanes bit-match a rescue-on solve of the same
  data; untouched lanes bit-match the fast pass;
* statuses are preserved per lane;
* the work-queue slab scheduler (straggler lanes, narrow sub_batch) matches
  full-width results;
* the degenerate-width rescue guard (B < 4 padded to 4 — the W=2 rescue
  program crashes XLA's MSA pass on the remote compile) returns the
  unpadded result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models import hs
from sqpsolver_tpu.parallel import batch as batch_mod
from sqpsolver_tpu.parallel.batch import (
    batch_data,
    make_batch_solver,
    make_chunked_batch_solver,
)
from sqpsolver_tpu.status import Status

PARAMS = sqp.Parameters(max_iter=200, OutputFlag=0, qp_rescue=False)


def _marked_data(nlp, batch):
    """Per-lane x0 perturbations; lanes with odd marker are the designated
    'stall' lanes for the injected fast-pass failure."""
    base = np.asarray(nlp.x0, np.float64)
    x0 = np.stack([base + 1.0e-3 * i for i in range(batch)])
    return batch_data(nlp, batch, x0=x0)


def _lane_marker(x0_row, base0):
    return (
        jnp.round((x0_row[0] - base0) * 1.0e3).astype(jnp.int32) % 2
    ) == 1


def test_rescue_fallback_merge_exact(monkeypatch):
    """Inject a deterministic fast-pass failure on the odd lanes; the
    fallback must re-solve exactly those lanes rescue-enabled and merge
    without disturbing the others."""
    prob = hs.hs_problem("hs071")
    nlp = prob.nlp
    base0 = float(np.asarray(nlp.x0)[0])
    data = _marked_data(nlp, 6)

    real_make_solver = batch_mod.make_solver

    def failing_make_solver(nlp_, params_, **kw):
        s = real_make_solver(nlp_, params_, **kw)
        if params_.qp_rescue:
            return s  # the rescue twin runs the true solver
        orig_fin = s._finalize

        def finalize(st, d):
            res = orig_fin(st, d)
            fail = _lane_marker(d.x0, base0)
            return res._replace(
                status=jnp.where(
                    fail,
                    jnp.asarray(
                        int(Status.ERROR_IN_STEP_COMPUTATION), jnp.int32
                    ),
                    res.status,
                )
            )

        s._finalize = finalize
        return s

    monkeypatch.setattr(batch_mod, "make_solver", failing_make_solver)
    merged = make_chunked_batch_solver(
        nlp, PARAMS, target_chunk_seconds=1e9, chunk0=5,
        rescue_fallback=True,
    )(data)
    monkeypatch.setattr(batch_mod, "make_solver", real_make_solver)

    # references: the honest fast pass and a rescue-on chunked solve
    fast = make_batch_solver(nlp, PARAMS)(data)
    rescue = make_chunked_batch_solver(
        nlp, PARAMS.replace(qp_rescue=True), target_chunk_seconds=1e9,
        chunk0=5,
    )(data)

    failed = [i for i in range(6) if i % 2 == 1]
    ok = [i for i in range(6) if i % 2 == 0]
    # statuses preserved per lane: rescued lanes report the RESCUE result
    # (converged), not the injected -3
    for i in failed:
        assert int(merged.status[i]) == int(rescue.status[i])
        assert int(merged.status[i]) != int(Status.ERROR_IN_STEP_COMPUTATION)
        assert int(merged.iterations[i]) == int(rescue.iterations[i])
        np.testing.assert_array_equal(
            np.asarray(merged.x[i]), np.asarray(rescue.x[i])
        )
    for i in ok:
        assert int(merged.status[i]) == int(fast.status[i])
        np.testing.assert_array_equal(
            np.asarray(merged.x[i]), np.asarray(fast.x[i])
        )


def test_rescue_fallback_noop_when_all_converge():
    """No -3 lanes -> the fallback twin is never built and results equal the
    plain chunked solve."""
    prob = hs.hs_problem("hs071")
    data = _marked_data(prob.nlp, 4)
    plain = make_chunked_batch_solver(
        prob.nlp, PARAMS, target_chunk_seconds=1e9, chunk0=5
    )(data)
    fb = make_chunked_batch_solver(
        prob.nlp, PARAMS, target_chunk_seconds=1e9, chunk0=5,
        rescue_fallback=True,
    )(data)
    np.testing.assert_array_equal(
        np.asarray(plain.status), np.asarray(fb.status)
    )
    np.testing.assert_array_equal(np.asarray(plain.x), np.asarray(fb.x))


def test_work_queue_slab_with_stragglers():
    """Straggler lanes (divergent iteration counts) through a narrow slab:
    the work-queue scheduler must reproduce the full-width results exactly."""
    from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios
    from sqpsolver_tpu.models.power import case9

    case = case9()
    nlp = acopf_polar(case)
    params = sqp.Parameters(
        max_iter=60, OutputFlag=0, tol_infeas=1e-6, tol_residual=1e-4,
        init_projection="off", qp_rescue=False,
    )
    # spread 0.2 pushes some scenarios into many more SQP iterations than
    # others (possibly including non-converged statuses — irrelevant here:
    # whatever the full-width result is, the slab must match it)
    theta = load_scenarios(case, 7, seed=11, spread=0.2)
    data = batch_data(nlp, 7, theta=theta)
    full = make_chunked_batch_solver(
        nlp, params, target_chunk_seconds=1e9, chunk0=4
    )(data)
    iters = np.asarray(full.iterations)
    assert iters.max() - iters.min() >= 3, (
        f"scenario spread produced no stragglers: {iters}"
    )
    slab = make_chunked_batch_solver(
        nlp, params, target_chunk_seconds=1e9, chunk0=4, sub_batch=2
    )(data)
    np.testing.assert_array_equal(
        np.asarray(full.status), np.asarray(slab.status)
    )
    np.testing.assert_array_equal(
        np.asarray(full.iterations), np.asarray(slab.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(full.x), np.asarray(slab.x), rtol=1e-12, atol=1e-14
    )


def test_single_iteration_chunks_with_done_padding_terminate():
    """Regression: with the chunk limit pinned at one iteration (rescue
    mode) and fewer active lanes than the slab width, the done lanes used
    as padding sit at LOWER iteration counts than the active stragglers —
    the chunk limit must key on the active lanes only, or no lane advances
    and the host loop spins forever (hit on-chip: the b256 rescue pass
    looped 8900+ no-op calls at '3/8 done')."""
    prob = hs.hs_problem("hs071")
    nlp = prob.nlp
    base = np.asarray(nlp.x0, np.float64)
    # staggered starts -> staggered convergence iterations
    x0 = np.stack([base + 2.0e-2 * i for i in range(6)])
    data = batch_data(nlp, 6, x0=x0)
    params = PARAMS.replace(qp_rescue=True)  # pins max_chunk = 1
    res = make_chunked_batch_solver(
        nlp, params, target_chunk_seconds=1e9, sub_batch=4
    )(data)
    iters = np.asarray(res.iterations)
    assert iters.max() - iters.min() >= 1, iters  # stragglers existed
    full = make_batch_solver(nlp, params)(data)
    np.testing.assert_array_equal(
        np.asarray(full.status), np.asarray(res.status)
    )
    np.testing.assert_array_equal(np.asarray(full.x), np.asarray(res.x))


@pytest.mark.parametrize("b", [1, 2])
def test_rescue_degenerate_width_padding(b):
    """Rescue-enabled solves at B < 4 pad to width 4 (the W=2/3 rescue
    program SIGABRTs XLA's MSA pass on the remote compile) and must return
    exactly the requested lanes."""
    prob = hs.hs_problem("hs071")
    nlp = prob.nlp
    data = _marked_data(nlp, 4)
    small = jax.tree.map(lambda a: a[:b], data)
    params = PARAMS.replace(qp_rescue=True)
    res_small = make_chunked_batch_solver(
        nlp, params, target_chunk_seconds=1e9, chunk0=5
    )(small)
    assert np.asarray(res_small.x).shape[0] == b
    res_full = make_chunked_batch_solver(
        nlp, params, target_chunk_seconds=1e9, chunk0=5
    )(data)
    for i in range(b):
        assert int(res_small.status[i]) == int(res_full.status[i])
        np.testing.assert_array_equal(
            np.asarray(res_small.x[i]), np.asarray(res_full.x[i])
        )
