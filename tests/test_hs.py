"""Hock–Schittkowski battery: converge to the published optimal objective
(reference-equivalent tolerance discipline: 1e-4 on solutions/objectives,
SURVEY §6 / BASELINE.md)."""

import numpy as np
import pytest

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models import hs

PARAMS = sqp.Parameters(max_iter=500, OutputFlag=0)


# problems where the standard start converges to a different (legitimate)
# local optimum than the book's global one — scipy SLSQP from the same start
# lands on the same point; both values accepted
LOCAL_OPTIMA = {
    "hs002": [0.0504261879, 4.941229318],
    "hs016": [0.25, 23.14466],
    # x1 = -0.5 branch (f = 83.5 - 25 sqrt(3)) vs the x1 = +0.5 global
    "hs020": [81.5 - 25.0 * np.sqrt(3.0), 83.5 - 25.0 * np.sqrt(3.0)],
}

# looser objective tolerance: at hs013's solution the constraint
# qualification fails (unbounded multipliers) — first-order methods stop
# within ~1e-3 of f* by construction
LOOSE_RTOL = {"hs013": 1e-3}

# known-hard problems, each with a verified diagnosis (not silent skips):
XFAIL = {
    "hs061": (
        "from the book start (0,0,0) the two equality linearizations wedge "
        "feasibility restoration at a local infeasibility minimum (viol "
        "1.25); scipy SLSQP fails the same way from this start ('Singular "
        "matrix C in LSQ subproblem', viol 18)"
    ),
    "hs081": (
        "slow tail convergence: feasible to 1e-8 with objective 0.8% above "
        "f* after 500 iterations and still inching (the -(x1^3+x2^3+1)^2 "
        "term is flat along the active constraint manifold)"
    ),
    "hs106": (
        "heat-exchanger design with variables spanning 1e1..1e4 and no "
        "problem scaling in the reference algorithm; crawls (9589 vs 7049 "
        "after 3000 iterations) — Ipopt-class solvers rely on their "
        "internal scaling here"
    ),
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(
            n, marks=pytest.mark.xfail(reason=XFAIL[n], strict=False)
        )
        if n in XFAIL
        else n
        for n in hs.hs_names()
    ],
)
def test_hs_objective(name):
    prob = hs.hs_problem(name)
    res = sqp.optimize(prob.nlp, PARAMS)
    assert res.success, f"{name}: {res.status_name}"
    assert res.prim_infeas <= 1e-6, f"{name}: prim_infeas={res.prim_infeas}"
    targets = LOCAL_OPTIMA.get(name, [prob.f_star])
    rtol = LOOSE_RTOL.get(name, 1e-4)
    assert any(
        np.isclose(res.obj_val, t, rtol=rtol, atol=1e-6) for t in targets
    ), f"{name}: obj {res.obj_val} not near any of {targets}"
    if prob.x_star is not None and name not in LOCAL_OPTIMA:
        np.testing.assert_allclose(
            res.x, prob.x_star, rtol=1e-3, atol=1e-4,
            err_msg=f"{name} solution mismatch",
        )


def test_infeasible_status():
    res = sqp.optimize(hs.infeasible_nlp(), PARAMS)
    assert res.status == sqp.Status.INFEASIBLE_PROBLEM_DETECTED, res.status_name


def test_unbounded_status():
    res = sqp.optimize(hs.unbounded_nlp(), PARAMS)
    assert res.status == sqp.Status.DIVERGING_ITERATES, res.status_name
