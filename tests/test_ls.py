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


# ---------------------------------------------------------------------------
# Full Hock-Schittkowski battery under SQP-LS (VERDICT r2 item 9): the same
# ledger discipline as the TR battery (tests/test_hs.py) — measured verdicts
# from scripts/ls_battery.py, every xfail with a diagnosis, no silent skips.
# Reference spec: /root/reference/src/algorithms/sqp_line_search.jl (dead
# code upstream; revived here).  Ledger (2026-08-19): 64 OK, 3 LOCAL,
# 7 xfail of 74.
# ---------------------------------------------------------------------------

BATTERY_PARAMS = sqp.Parameters(algorithm="SQP-LS", max_iter=500, OutputFlag=0)

#: same alternate local optima the TR battery documents (tests/test_hs.py)
LOCAL_OPTIMA = {
    "hs002": [0.0504261879, 4.941229318],
    "hs016": [0.25, 23.14466],
    "hs020": [81.5 - 25.0 * np.sqrt(3.0), 83.5 - 25.0 * np.sqrt(3.0)],
}

#: hs013's constraint qualification fails at the solution (unbounded
#: multipliers) — first-order methods stop within ~1e-3 of f* (same
#: allowance as the TR battery)
LOOSE_RTOL = {"hs013": 1e-3}

XFAIL_LS = {
    "hs015": (
        "the LS spec has no trust region: from the book start the Armijo "
        "search on the l1 merit walks to a feasible stationary point of "
        "the penalty far above f* (f=5.6e7 'Feasible_Point_Found'); "
        "SQP-TR's box escapes it (tests/test_hs.py passes hs015)"
    ),
    "hs039": (
        "diverges: the merit line search follows an unbounded descent "
        "direction of the l1 penalty (viol 8.9e3 at the iteration cap); "
        "the trust region keeps TR-SQP bounded here"
    ),
    "hs055": (
        "stops at the degenerate vertex f=20/3 from the book start (x0 "
        "lies on a degenerate constraint intersection); the TR battery "
        "reaches f*=19/3"
    ),
    "hs061": (
        "same as the TR battery's hs061 xfail: from the book start the "
        "equality linearizations wedge restoration at a local "
        "infeasibility minimum; scipy SLSQP fails identically"
    ),
    "hs066": (
        "three consecutive stalled restoration QPs from an infeasible "
        "linearization (status -3); the TR driver's halved box "
        "regularizes these and its battery passes hs066"
    ),
    "hs081": (
        "same flat-manifold slow tail as the TR battery's hs081 xfail: "
        "feasible with objective 0.8% above f* after 500 iterations"
    ),
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(
            n, marks=pytest.mark.xfail(reason=XFAIL_LS[n], strict=False)
        )
        if n in XFAIL_LS
        else n
        for n in hs.hs_names()
    ],
)
def test_ls_battery(name):
    prob = hs.hs_problem(name)
    res = sqp.optimize(prob.nlp, BATTERY_PARAMS)
    assert res.success, f"{name}: {res.status_name}"
    assert res.prim_infeas <= 1e-6, f"{name}: viol {res.prim_infeas:.2e}"
    targets = LOCAL_OPTIMA.get(name, [prob.f_star])
    rtol = LOOSE_RTOL.get(name, 1e-4)
    assert any(
        np.isclose(res.obj_val, t, rtol=rtol, atol=1e-6) for t in targets
    ), f"{name}: f={float(res.obj_val):.8g} targets={targets}"
