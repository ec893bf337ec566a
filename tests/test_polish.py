"""Strict-tolerance (1e-8) solves via kkt_precision="mixed_polish".

The f32-factorized mixed modes floor at ~2e-6 QP residual (cond(K) ~ 1/mu
outruns 1/eps_f32 on the barrier path — qp_ipm._POLISH_FLOOR documents the
why).  "mixed_polish" continues the interior-point loop past the floor with
direct compute-dtype factorizations, reaching the reference's default 1e-8
regime (/root/reference/src/parameters.jl:17-19) while the bulk of the
iterations stay on the f32 fast path.  Plus maximize-sense and SLP
(hessian_type="none") battery coverage (reference MOI max-sense scaling
MOI_wrapper.jl:1106-1114; hessian_type "none" parameters.jl:10).
"""

import dataclasses

import numpy as np
import pytest

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models import hs

STRICT = dict(
    max_iter=300, OutputFlag=0,
    tol_residual=1e-8, tol_infeas=1e-8, tol_direction=1e-8,
)

#: problems spanning QP flavors: inequality-only, equality, box, degenerate
POLISH_SET = [
    "hs006", "hs014", "hs028", "hs035", "hs043",
    "hs048", "hs051", "hs052", "hs071", "hs076", "hs100",
]


@pytest.mark.parametrize("name", POLISH_SET)
def test_polish_matches_direct_at_1e8(name):
    prob = hs.hs_problem(name)
    r_dir = sqp.optimize(
        prob.nlp, sqp.Parameters(kkt_precision="direct", **STRICT)
    )
    r_pol = sqp.optimize(
        prob.nlp, sqp.Parameters(kkt_precision="mixed_polish", **STRICT)
    )
    assert r_dir.success, f"{name} direct: {r_dir.status_name}"
    assert r_pol.success, f"{name} polish: {r_pol.status_name}"
    np.testing.assert_allclose(
        r_pol.obj_val, r_dir.obj_val, rtol=1e-7, atol=1e-9,
        err_msg=f"{name}: polish objective drifted from direct",
    )
    # the point of the mode: strict-regime dual feasibility, which plain
    # mixed_ir cannot reach (its QP floor is 2e-6)
    assert r_pol.dual_infeas < 1e-6, f"{name}: {r_pol.dual_infeas}"
    assert r_pol.prim_infeas < 1e-7, f"{name}: {r_pol.prim_infeas}"


def test_polish_noop_above_floor():
    """At ACOPF-grade tolerances (>= 2e-6 QP tol) polish never activates —
    same result as mixed_ir."""
    prob = hs.hs_problem("hs071")
    loose = dict(max_iter=200, OutputFlag=0, qp_tol=1e-5)
    r_mix = sqp.optimize(
        prob.nlp, sqp.Parameters(kkt_precision="mixed_ir", **loose)
    )
    r_pol = sqp.optimize(
        prob.nlp, sqp.Parameters(kkt_precision="mixed_polish", **loose)
    )
    assert r_mix.success and r_pol.success
    np.testing.assert_allclose(r_pol.obj_val, r_mix.obj_val, rtol=1e-6)


@pytest.mark.parametrize("name", ["hs035", "hs076", "hs024"])
def test_maximize_sense(name):
    """maximize=True with -f reproduces the minimization optimum (reference
    max->min objective scaling, MOI_wrapper.jl:1106-1114)."""
    prob = hs.hs_problem(name)
    base = prob.nlp
    f = base.f
    neg = dataclasses.replace(
        base, f=(lambda x, _f=f: -_f(x)), maximize=True
    )
    res = sqp.optimize(neg, sqp.Parameters(max_iter=300, OutputFlag=0))
    assert res.success, f"{name}: {res.status_name}"
    # Results reports the user-sense objective: max of -f == -(min of f)
    np.testing.assert_allclose(
        -res.obj_val, prob.f_star, rtol=1e-4, atol=1e-6
    )


@pytest.mark.parametrize("name", ["hs021", "hs035", "hs076", "hs118"])
def test_slp_mode(name):
    """hessian_type="none" (SLP — LP-like subproblems, the reference's
    parameters.jl:10 default): converges on mildly nonlinear problems,
    more slowly than exact-Hessian SQP."""
    prob = hs.hs_problem(name)
    res = sqp.optimize(
        prob.nlp,
        sqp.Parameters(
            max_iter=1500, OutputFlag=0, hessian_type="none"
        ),
    )
    assert res.success, f"{name}: {res.status_name}"
    np.testing.assert_allclose(
        res.obj_val, prob.f_star, rtol=1e-3, atol=1e-5,
        err_msg=f"{name} SLP objective mismatch",
    )


@pytest.mark.parametrize("name", ["hs071", "hs100"])
def test_adaptive_qp_tol_optin(name):
    """Inexact-SQP forcing sequence (qp_tol_adaptive>0): loose early QPs
    with the tolerance tightening as the outer error shrinks still reach the
    optimum on exact-Hessian TR runs (the validated opt-in scope)."""
    prob = hs.hs_problem(name)
    res = sqp.optimize(
        prob.nlp,
        sqp.Parameters(max_iter=300, OutputFlag=0, qp_tol_adaptive=0.05),
    )
    assert res.success, res.status_name
    np.testing.assert_allclose(res.obj_val, prob.f_star, rtol=1e-4, atol=1e-6)
