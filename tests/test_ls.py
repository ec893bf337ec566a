"""Line-search SQP (algorithm="SQP-LS") tests — the reference's LS variant
revived from its dead-code spec (sqp_line_search.jl; SURVEY §2.1)."""

import numpy as np
import pytest

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models import hs
from sqpsolver_tpu.models.toy import toy_nlp

PARAMS = sqp.Parameters(algorithm="SQP-LS", max_iter=300, OutputFlag=0)


def test_ls_toy_golden():
    res = sqp.optimize(toy_nlp(), PARAMS)
    assert res.success, res.status_name
    np.testing.assert_allclose(res.x, [-1.0, -1.0], rtol=1e-4)


@pytest.mark.parametrize("name", ["hs006", "hs028", "hs035", "hs051", "hs071"])
def test_ls_hs(name):
    prob = hs.hs_problem(name)
    res = sqp.optimize(prob.nlp, PARAMS)
    assert res.success, f"{name}: {res.status_name}"
    np.testing.assert_allclose(
        res.obj_val, prob.f_star, rtol=1e-4, atol=1e-6,
        err_msg=f"{name} objective mismatch",
    )


#: hs015 is excluded: from the book start the LS spec's tiny-direction test
#: accepts a non-optimal stationary point of the penalty function (the
#: reference's dead-code spec has no trust region to escape it; SQP-TR
#: solves hs015 fine, tests/test_hs.py)
@pytest.mark.parametrize("name", ["hs014", "hs011"])
def test_ls_harder_constrained(name):
    """Problems whose iterates hit infeasible linearizations / rejected steps
    (exercising the FR entry and backtracking paths of the LS driver)."""
    prob = hs.hs_problem(name)
    res = sqp.optimize(prob.nlp, PARAMS)
    assert res.success, f"{name}: {res.status_name}"
    np.testing.assert_allclose(
        res.obj_val, prob.f_star, rtol=1e-3, atol=1e-6,
        err_msg=f"{name} objective mismatch",
    )


def test_ls_infeasible_fr_path():
    """Infeasible problem: the LS driver enters restoration.  The LS spec
    (sqp_line_search.jl) cycles FR like the reference TR does (PARITY.md
    deviation 3 documents the TR-side fix; the revived LS keeps the spec's
    behavior), so either a clean Infeasible verdict or an iteration-limit
    exit at an infeasible point is reference-faithful."""
    res = sqp.optimize(hs.infeasible_nlp(), PARAMS)
    assert res.status in (
        sqp.Status.INFEASIBLE_PROBLEM_DETECTED,
        sqp.Status.MAXIMUM_ITERATIONS_EXCEEDED,
    ), res.status_name
    assert res.prim_infeas > 1e-3  # genuinely infeasible point


def test_ls_soc_counter_exposed():
    """The SOC-on-line-search-failure count is reported through
    n_soc_accept (sqp_line_search.jl:210-223's correction attempts)."""
    prob = hs.hs_problem("hs006")  # curved equality: rejections occur
    res = sqp.optimize(prob.nlp, PARAMS)
    assert res.success
    assert res.n_soc_accept >= 0  # counter plumbed (value may be 0)


def test_ls_hs100():
    """hs100-LS was divergent in round 1; the Lanczos convexification bound
    (common.lanczos_lmin_bound — the old power iteration under-shifted this
    Hessian) fixed it."""
    prob = hs.hs_problem("hs100")
    res = sqp.optimize(prob.nlp, PARAMS)
    assert res.success, res.status_name
    np.testing.assert_allclose(res.obj_val, prob.f_star, rtol=1e-4)
