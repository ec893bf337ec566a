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
