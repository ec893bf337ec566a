"""Golden-value regression: the reference's toy NLP.

Mirrors ``/root/reference/test/runtests.jl:10-15`` + ``test/ext_solver.jl``:
x* = -1, y* = -1 at rtol 1e-4 with a locally-solved status.
"""

import numpy as np
import pytest

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models.toy import toy_nlp


def test_toy_golden():
    res = sqp.optimize(toy_nlp(), sqp.Parameters(max_iter=200, OutputFlag=0))
    assert res.success, res.status_name
    np.testing.assert_allclose(res.x, [-1.0, -1.0], rtol=1e-4)
    np.testing.assert_allclose(res.obj_val, 0.0, atol=1e-6)
    # constraint values at the solution
    np.testing.assert_allclose(res.g, [-1.0, 2.0, 1.0, 1.0], atol=1e-6)
    assert res.prim_infeas <= 1e-6


def test_toy_statistics():
    res = sqp.optimize(
        toy_nlp(),
        sqp.Parameters(max_iter=200, OutputFlag=0, StatisticsFlag=1),
    )
    assert res.success
    assert res.statistics is not None
    assert len(res.statistics["f"]) == res.iterations + 1
    # FR was entered on the first iteration for this problem (zero Jacobian
    # row for x*y == 1 at the origin makes the first QP infeasible)
    assert res.n_fr_iters >= 1


def test_toy_iteration_limit():
    res = sqp.optimize(toy_nlp(), sqp.Parameters(max_iter=2, OutputFlag=0))
    assert res.status in (
        sqp.Status.MAXIMUM_ITERATIONS_EXCEEDED,
        sqp.Status.FEASIBLE_POINT_FOUND,
    )


def test_invalid_algorithm():
    with pytest.raises(ValueError):
        sqp.make_solver(toy_nlp(), sqp.Parameters(algorithm="bogus"))


def test_slp_mode():
    """hessian_type='none' -> LP subproblems (reference SLP-implicit mode,
    MOI_wrapper.jl:1178).  Slower but still converges on the toy problem."""
    res = sqp.optimize(
        toy_nlp(),
        sqp.Parameters(max_iter=500, OutputFlag=0, hessian_type="none"),
    )
    assert res.success, res.status_name
    np.testing.assert_allclose(res.x, [-1.0, -1.0], rtol=1e-3)
