"""Modeling-API edge-case battery (VERDICT r4 item 9).

The reference inherits hundreds of model-shape edge cases from
``MOI.Test.runtests`` (``/root/reference/test/MOI_wrapper.jl:36-63``).  There
is no MOI in this framework by design (SURVEY §4 implication b); this file
mirrors the *behaviors* those cases pin down at the ``build_nlp`` surface:

* variable-free model rejection        (MOI_wrapper.jl:1160-1163)
* max-sense objective un-scaling and dual sign conventions
                                       (MOI_wrapper.jl:1106-1114, 1340-1344,
                                        583-671)
* ranged-row duals (one value per ranged row, sign by active side — the
  reference recombines its two split rows,  subproblem_JuMP.jl:537-539)
* dual warm starts                     (MOI_wrapper.jl:1200-1222)
* fixed variables (lb == ub) and their reduced costs
                                       (subproblem_JuMP.jl:543-550)
* FEASIBILITY_SENSE (constant objective -> any feasible point,
                                        MOI_wrapper.jl:1106-1114 scale 0)
"""

import jax.numpy as jnp
import numpy as np
import pytest

import sqpsolver_tpu as sqp

P = sqp.Parameters(max_iter=200, OutputFlag=0)


def _kkt_stationarity(nlp, res):
    """|| grad f_int + J' lam + nu_U - nu_L ||_inf at the solution, in the
    internal minimization convention (common.py module docstring)."""
    import jax

    x = jnp.asarray(res.x)
    df = jax.grad(lambda z: nlp.obj(z))(x)
    r = df + np.asarray(res.mult_x_U) - np.asarray(res.mult_x_L)
    if nlp.m:
        J = jax.jacfwd(lambda z: nlp.cons(z))(x)
        r = r + J.T @ jnp.asarray(res.mult_g)
    return float(np.max(np.abs(np.asarray(r))))


# ---------------------------------------------------------------------------
# variable-free model rejection
# ---------------------------------------------------------------------------


def test_variable_free_model_rejected():
    with pytest.raises(ValueError, match="zero variables"):
        sqp.build_nlp(lambda x: 0.0, np.zeros((0,)))


def test_zero_constraint_model_ok():
    # the m == 0 case IS valid (unconstrained NLP)
    nlp = sqp.build_nlp(lambda x: jnp.sum((x - 2.0) ** 2), np.zeros(3))
    res = sqp.optimize(nlp, P)
    assert res.success
    np.testing.assert_allclose(res.x, 2.0, atol=1e-6)


# ---------------------------------------------------------------------------
# maximize sense
# ---------------------------------------------------------------------------


def test_maximize_objective_unscaling_and_duals():
    """max -(x1-3)^2 - (x2+1)^2 s.t. x1 <= 1: solution (1, -1), objective
    reported in the MAX sense (-4), duals satisfy the internal-min KKT."""
    nlp = sqp.build_nlp(
        lambda x: -((x[0] - 3.0) ** 2) - (x[1] + 1.0) ** 2,
        np.zeros(2),
        linear=lambda x: jnp.array([x[0]]),
        linear_u=np.array([1.0]),
        maximize=True,
    )
    res = sqp.optimize(nlp, P)
    assert res.success, res.status_name
    np.testing.assert_allclose(res.x, [1.0, -1.0], atol=1e-6)
    # objective un-scaled back to the max sense (MOI_wrapper.jl:1340-1344)
    np.testing.assert_allclose(res.obj_val, -4.0, atol=1e-6)
    # internal convention: min f_int = (x1-3)^2 + ..., grad at x1=1 is -4;
    # row upper side active => lam > 0 (common.py sign convention), lam = 4
    np.testing.assert_allclose(res.mult_g, [4.0], atol=1e-4)
    assert _kkt_stationarity(nlp, res) < 1e-4


def test_maximize_with_bound_duals():
    """max x1 + 2 x2 on the box [0,1]^2: both upper bounds active, reduced
    costs land in mult_x_U with the internal-min signs."""
    nlp = sqp.build_nlp(
        lambda x: x[0] + 2.0 * x[1],
        np.full(2, 0.5),
        x_l=np.zeros(2),
        x_u=np.ones(2),
        maximize=True,
    )
    res = sqp.optimize(nlp, P)
    assert res.success
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(res.obj_val, 3.0, atol=1e-6)
    # internal min objective -x1 - 2 x2: upper-bound duals 1 and 2
    np.testing.assert_allclose(res.mult_x_U, [1.0, 2.0], atol=1e-4)
    np.testing.assert_allclose(res.mult_x_L, [0.0, 0.0], atol=1e-4)


# ---------------------------------------------------------------------------
# ranged rows
# ---------------------------------------------------------------------------


def test_ranged_row_duals_upper_active():
    """min (x1-2)^2 + (x2-2)^2 s.t. 0 <= x1 + x2 <= 2.  Upper side active:
    ONE dual per ranged row, positive (the reference sums its two split
    rows' duals, subproblem_JuMP.jl:537-539)."""
    nlp = sqp.build_nlp(
        lambda x: jnp.sum((x - 2.0) ** 2),
        np.zeros(2),
        linear=lambda x: jnp.array([x[0] + x[1]]),
        linear_l=np.array([0.0]),
        linear_u=np.array([2.0]),
    )
    res = sqp.optimize(nlp, P)
    assert res.success
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=1e-6)
    assert res.mult_g.shape == (1,)
    # grad f = (-2, -2) at x*; stationarity needs lam = +2 (upper active)
    np.testing.assert_allclose(res.mult_g, [2.0], atol=1e-4)
    assert _kkt_stationarity(nlp, res) < 1e-4


def test_ranged_row_duals_lower_active():
    """Same row with the LOWER side active: dual is negative."""
    nlp = sqp.build_nlp(
        lambda x: jnp.sum((x + 2.0) ** 2),
        np.zeros(2),
        linear=lambda x: jnp.array([x[0] + x[1]]),
        linear_l=np.array([-2.0]),
        linear_u=np.array([5.0]),
    )
    res = sqp.optimize(nlp, P)
    assert res.success
    np.testing.assert_allclose(res.x, [-1.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(res.mult_g, [-2.0], atol=1e-4)
    assert _kkt_stationarity(nlp, res) < 1e-4


def test_ranged_row_inactive_zero_dual():
    """Ranged row strictly inactive at the solution: zero dual."""
    nlp = sqp.build_nlp(
        lambda x: jnp.sum(x**2),
        np.ones(2),
        linear=lambda x: jnp.array([x[0] + x[1]]),
        linear_l=np.array([-10.0]),
        linear_u=np.array([10.0]),
    )
    res = sqp.optimize(nlp, P)
    assert res.success
    np.testing.assert_allclose(res.x, [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(res.mult_g, [0.0], atol=1e-5)


# ---------------------------------------------------------------------------
# dual warm starts
# ---------------------------------------------------------------------------


def test_dual_warm_start_plumbed():
    """NLPData.lam0 (ConstraintDualStart analog, MOI_wrapper.jl:1200-1222):
    starting from the known optimal multiplier must not change the answer."""
    nlp = sqp.build_nlp(
        lambda x: jnp.sum((x - 2.0) ** 2),
        np.zeros(2),
        eq=lambda x: jnp.array([x[0] + x[1] - 2.0]),
    )
    cold = sqp.optimize(nlp, P)
    assert cold.success
    solver = sqp.make_solver(nlp, P)
    data = nlp.data()
    data.lam0 = jnp.asarray(cold.mult_g)
    warm = sqp.from_raw(solver(data), 0.0)
    assert warm.success
    np.testing.assert_allclose(warm.x, cold.x, atol=1e-8)
    np.testing.assert_allclose(warm.mult_g, cold.mult_g, atol=1e-6)
    # a correct warm start never costs extra outer iterations
    assert warm.iterations <= cold.iterations


# ---------------------------------------------------------------------------
# fixed variables
# ---------------------------------------------------------------------------


def test_fixed_variable_and_reduced_cost():
    """x2 fixed at 3 via lb == ub: solution honors the pin, and the fixed
    variable's reduced cost is recovered from stationarity with the
    reference's sign split (subproblem_JuMP.jl:543-550)."""
    nlp = sqp.build_nlp(
        lambda x: (x[0] - 1.0) ** 2 + (x[1] - 5.0) ** 2,
        np.array([0.0, 3.0]),
        x_l=np.array([-np.inf, 3.0]),
        x_u=np.array([np.inf, 3.0]),
    )
    res = sqp.optimize(nlp, P)
    assert res.success
    np.testing.assert_allclose(res.x, [1.0, 3.0], atol=1e-6)
    # grad f at x* = (0, -4): descent wants x2 UP, the upper bound blocks
    # it -> stationarity grad f + nu_U - nu_L = 0 puts the reduced cost in
    # mult_x_U (nu_U = 4), the positive branch of the reference's sign
    # split (subproblem_JuMP.jl:543-550 under its sign convention)
    np.testing.assert_allclose(res.mult_x_U[1], 4.0, atol=1e-4)
    np.testing.assert_allclose(res.mult_x_L[1], 0.0, atol=1e-6)
    assert _kkt_stationarity(nlp, res) < 1e-4


def test_all_variables_fixed():
    """Degenerate but legal: every variable fixed — the 'solve' just
    evaluates the point."""
    nlp = sqp.build_nlp(
        lambda x: jnp.sum(x**2),
        np.array([2.0, -1.0]),
        x_l=np.array([2.0, -1.0]),
        x_u=np.array([2.0, -1.0]),
    )
    res = sqp.optimize(nlp, P)
    assert res.success
    np.testing.assert_allclose(res.x, [2.0, -1.0], atol=1e-8)
    np.testing.assert_allclose(res.obj_val, 5.0, atol=1e-8)


# ---------------------------------------------------------------------------
# feasibility sense
# ---------------------------------------------------------------------------


def test_feasibility_sense_constant_objective():
    """FEASIBILITY_SENSE analog (objective scale 0, MOI_wrapper.jl:1106-1114):
    a constant objective turns the solve into 'find a feasible point'."""
    # start off the constraint set but away from the origin (at x=0 the
    # quadratic row's Jacobian vanishes and restoration legitimately stalls
    # at a degenerate point — same geometry as the toy problem's FR entry)
    nlp = sqp.build_nlp(
        lambda x: jnp.asarray(0.0),
        np.array([0.5, 0.1]),
        eq=lambda x: jnp.array([x[0] ** 2 + x[1] ** 2 - 2.0]),
        linear=lambda x: jnp.array([x[0] - x[1]]),
        linear_l=np.array([0.0]),
        linear_u=np.array([0.0]),
    )
    res = sqp.optimize(nlp, P)
    assert res.success, res.status_name
    assert res.prim_infeas <= 1e-6
    np.testing.assert_allclose(np.abs(res.x), [1.0, 1.0], atol=1e-5)
    np.testing.assert_allclose(res.obj_val, 0.0, atol=1e-12)


def test_infeasible_linear_rows_detected():
    """Contradictory linear rows: the initial projection cannot satisfy
    them; the solve must not report success."""
    nlp = sqp.build_nlp(
        lambda x: jnp.sum(x**2),
        np.zeros(2),
        linear=lambda x: jnp.array([x[0] + x[1], x[0] + x[1]]),
        linear_l=np.array([1.0, -np.inf]),
        linear_u=np.array([np.inf, -1.0]),
    )
    res = sqp.optimize(nlp, sqp.Parameters(max_iter=60, OutputFlag=0))
    assert res.status in (
        sqp.Status.INFEASIBLE_PROBLEM_DETECTED,
        sqp.Status.MAXIMUM_ITERATIONS_EXCEEDED,
        sqp.Status.ERROR_IN_STEP_COMPUTATION,
    )
