"""Targeted second-order-correction parity tests (VERDICT r4 item 10).

A problem where a rejected step is specifically rescued by SOC, on both
drivers.  The canonical trigger is the Maratos effect (Powell):

    min 2(x1^2 + x2^2 - 1) - x1   s.t.  x1^2 + x2^2 = 1,   x* = (1, 0)

From an iterate on the circle, the full SQP step moves tangentially and the
quadratic constraint curvature raises BOTH f and ||c|| at the trial point —
the l1 merit rejects every such step and the trust region crawls through
halvings.  The SOC re-solve with the curvature-shifted rows
(sqp_trust_region.jl:341-360 semantics, with the base-step double-add of
:357 fixed — see sqp_tr.solve_soc's deviation note) restores unit steps.
"""

import jax.numpy as jnp
import numpy as np

import sqpsolver_tpu as sqp


def _maratos(theta=0.3):
    return sqp.build_nlp(
        lambda x: 2.0 * (x[0] ** 2 + x[1] ** 2 - 1.0) - x[0],
        np.array([np.cos(theta), np.sin(theta)]),
        eq=lambda x: jnp.array([x[0] ** 2 + x[1] ** 2 - 1.0]),
    )


def test_tr_soc_rescues_maratos_rejection():
    nlp = _maratos()
    base = sqp.optimize(
        nlp, sqp.Parameters(max_iter=100, OutputFlag=0, use_soc=False)
    )
    soc = sqp.optimize(
        nlp, sqp.Parameters(max_iter=100, OutputFlag=0, use_soc=True)
    )
    # without SOC: the Maratos crawl — multiple rejected steps
    assert base.success and base.n_reject >= 2
    # with SOC: at least one rejected step is RESCUED (accepted as a SOC
    # step), and the crawl disappears (sqp_trust_region.jl:543-572
    # semantics: x += p_soc, step_acceptance = true)
    assert soc.success, soc.status_name
    assert soc.n_soc_accept >= 1
    assert soc.n_reject < base.n_reject
    assert soc.iterations < base.iterations
    np.testing.assert_allclose(soc.x, [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(soc.obj_val, -1.0, atol=1e-6)


def test_tr_soc_trajectory_counters():
    """The SOC-accepted iteration counts as an accept (not a reject), and
    the counters add up: every live iteration is an accept, a reject, an FR
    entry, or a stalled-QP retry."""
    res = sqp.optimize(
        _maratos(),
        sqp.Parameters(max_iter=100, OutputFlag=0, use_soc=True,
                       StatisticsFlag=1),
    )
    assert res.success
    assert res.n_soc_accept >= 1
    # SOC accepts are counted inside n_accept as well (do_step! sets
    # step_acceptance true on the SOC branch, :563-567)
    assert res.n_accept >= res.n_soc_accept
    acc = np.asarray(res.statistics["accepted"][1 : res.iterations])
    # with SOC on, the Maratos problem accepts every step after the first
    assert acc[1:].all(), acc


def test_ls_soc_fires_on_line_search_failure():
    """LS driver: SOC is attempted whenever the Armijo search fails
    (sqp_line_search.jl:210-223 — unconditional, not gated on use_soc).
    hs077 fails one line search from the book start and the corrected step
    carries it to the published optimum."""
    from sqpsolver_tpu.models.hs import hs_problem

    prob = hs_problem("hs077")
    res = sqp.optimize(
        prob.nlp,
        sqp.Parameters(algorithm="SQP-LS", max_iter=300, OutputFlag=0),
    )
    assert res.success, res.status_name
    assert res.n_soc_accept >= 1
    np.testing.assert_allclose(res.obj_val, 0.24150513, rtol=1e-5)
