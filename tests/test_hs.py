"""Hock–Schittkowski battery: converge to the published optimal objective
(reference-equivalent tolerance discipline: 1e-4 on solutions/objectives,
SURVEY §6 / BASELINE.md)."""

import numpy as np
import pytest

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models import hs

PARAMS = sqp.Parameters(max_iter=500, OutputFlag=0)


@pytest.mark.parametrize("name", hs.hs_names())
def test_hs_objective(name):
    prob = hs.hs_problem(name)
    res = sqp.optimize(prob.nlp, PARAMS)
    assert res.success, f"{name}: {res.status_name}"
    assert res.prim_infeas <= 1e-6, f"{name}: prim_infeas={res.prim_infeas}"
    np.testing.assert_allclose(
        res.obj_val, prob.f_star, rtol=1e-4, atol=1e-6,
        err_msg=f"{name} objective mismatch",
    )
    if prob.x_star is not None:
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
