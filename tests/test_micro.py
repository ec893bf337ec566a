"""Micro-stepped (resumable-QP) execution == monolithic (VERDICT r4 item 2).

The micro driver carries the IPM state of an in-flight QP across device
calls so the f64 rescue/polish phase advances at most ``micro_trips`` trips
per call — the fix for the watchdog-atomic rescue QP at case118 scale.  The
trip sequence must be bit-identical to the monolithic solve: same bundle,
same body closures, only the execution is cut at trip boundaries.
"""

import numpy as np

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models.hs import hs_problem
from sqpsolver_tpu.parallel.batch import (
    batch_data,
    make_batch_solver,
    make_chunked_batch_solver,
)


def _check(nlp, data, params, micro_trips):
    mono = make_batch_solver(nlp, params)(data)
    msgs = []
    micro = make_chunked_batch_solver(
        nlp, params, target_chunk_seconds=1e9, chunk0=5,
        micro_trips=micro_trips, log=msgs.append,
    )(data)
    assert any(m.startswith("micro:") for m in msgs), (
        "micro mode did not engage"
    )
    np.testing.assert_array_equal(
        np.asarray(mono.status), np.asarray(micro.status)
    )
    np.testing.assert_array_equal(
        np.asarray(mono.iterations), np.asarray(micro.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(mono.qp_iters_total), np.asarray(micro.qp_iters_total)
    )
    np.testing.assert_array_equal(np.asarray(mono.x), np.asarray(micro.x))
    return msgs


def test_micro_matches_monolithic_polish():
    """mixed_polish with a strict tolerance exercises the f64 second phase
    on every QP; trip cap 2 forces many mid-QP suspensions."""
    prob = hs_problem("hs071")
    base = np.asarray(prob.nlp.x0, np.float64)
    x0 = np.stack([base + 1e-3 * i for i in range(4)])
    data = batch_data(prob.nlp, 4, x0=x0)
    params = sqp.Parameters(
        max_iter=200, OutputFlag=0, kkt_precision="mixed_polish",
        qp_tol=1e-10,
    )
    msgs = _check(prob.nlp, data, params, micro_trips=2)
    # the suspension mechanism must actually engage (calls with QPs left
    # in flight), otherwise this test proves nothing
    assert any(
        "QPs in flight" in m and not m.endswith("0 QPs in flight)")
        for m in msgs
    )


def test_micro_matches_monolithic_rescue():
    """mixed_ir + stall rescue (the dense case118 bench config family)."""
    prob = hs_problem("hs071")
    data = batch_data(prob.nlp, 4)
    params = sqp.Parameters(
        max_iter=200, OutputFlag=0, kkt_precision="mixed_ir",
        qp_rescue=True,
    )
    _check(prob.nlp, data, params, micro_trips=3)
