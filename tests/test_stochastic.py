"""Cross-scenario coupled (two-stage stochastic) solves — SURVEY §7 step 6 /
BASELINE north-star "Schur-complement coupling" (no reference counterpart:
the reference is strictly single-instance, sqp_trust_region.jl:124)."""

import numpy as np
import pytest

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios
from sqpsolver_tpu.models.power import case9
from sqpsolver_tpu.models.stochastic import couple_scenarios, pg_shared_mask

PARAMS = sqp.Parameters(
    max_iter=100, OutputFlag=0, tol_infeas=1e-6, tol_residual=1e-4,
    use_soc=True,
)


def _solve(nlp, params=PARAMS):
    res = sqp.optimize(nlp, params)
    assert res.success, res.status_name
    return res


def test_coupled_identical_scenarios_match_single():
    """K identical scenarios with shared dispatch == the single-scenario
    optimum: same (expected) objective, shared pg at the single-case pg."""
    case = case9()
    nlp = acopf_polar(case)
    K = 3
    thetas = {
        "pd": np.tile(case.bus_pd, (K, 1)),
        "qd": np.tile(case.bus_qd, (K, 1)),
    }
    mask = pg_shared_mask(case, nlp)
    coupled = couple_scenarios(nlp, thetas, mask)
    ns = int(mask.sum())
    nl = nlp.n - ns
    assert coupled.n == ns + K * nl
    assert coupled.m == K * nlp.m
    assert coupled.num_linear == K * nlp.num_linear

    res_c = _solve(coupled)
    # single-scenario reference optimum (known MATPOWER case9 value)
    np.testing.assert_allclose(float(res_c.obj_val), 5296.69, rtol=1e-4)
    # the dispatch is unique (strictly convex quadratic gencost): every
    # scenario's reconstructed pg must equal the single-case optimal pg.
    # (Raw locals can differ by more: voltage profiles have cost-flat
    # degenerate directions at solver tolerance.)
    import jax

    th0 = jax.tree.map(lambda a: a[0], thetas)
    solver = sqp.make_solver(nlp, PARAMS)
    from sqpsolver_tpu import results as _results

    r1 = _results.from_raw(solver(nlp.data(theta=th0)), 0.0)
    assert r1.success
    nb, ng = case.nb, case.ng
    pg_single = np.asarray(r1.x)[2 * nb : 2 * nb + ng]
    z = np.asarray(res_c.x)
    locals_ = z[ns:].reshape(K, nl)
    loc_idx = np.nonzero(~mask)[0]
    sh_idx = np.nonzero(mask)[0]
    for k in range(K):
        xk = np.zeros(nlp.n)
        xk[sh_idx] = z[:ns]
        xk[loc_idx] = locals_[k]
        np.testing.assert_allclose(
            xk[2 * nb : 2 * nb + ng], pg_single, rtol=1e-3, atol=1e-4
        )


def test_coupled_structured_matches_dense():
    """The coupled problem IS bordered-block-diagonal (scenario locals =
    interiors, shared dispatch = separator): the structured KKT path must
    reproduce the dense solve."""
    case = case9()
    nlp = acopf_polar(case)
    K = 3
    thetas = load_scenarios(case, K, seed=3, spread=0.03)
    coupled = couple_scenarios(nlp, thetas, pg_shared_mask(case, nlp))

    res_d = _solve(coupled)
    res_s = _solve(
        coupled, PARAMS.replace(kkt_structured=True, hessian_shift="power")
    )
    np.testing.assert_allclose(
        float(res_s.obj_val), float(res_d.obj_val), rtol=1e-5
    )
    assert float(res_s.prim_infeas) < 1e-6


def test_coupled_first_stage_costs_more():
    """Fixing dispatch before the scenario realizes cannot beat
    scenario-by-scenario reoptimization: expected coupled cost >= mean of the
    independent optima (equality only when scenarios coincide)."""
    case = case9()
    nlp = acopf_polar(case)
    K = 3
    thetas = load_scenarios(case, K, seed=11, spread=0.05)
    coupled = couple_scenarios(nlp, thetas, pg_shared_mask(case, nlp))
    res_c = _solve(coupled)

    import jax

    indep = []
    for k in range(K):
        th = jax.tree.map(lambda a: a[k], thetas)
        d = nlp.data(theta=th)
        solver = sqp.make_solver(nlp, PARAMS)
        from sqpsolver_tpu import results as _results

        r = _results.from_raw(solver(d), 0.0)
        assert r.success, r.status_name
        indep.append(float(r.obj_val))
    mean_indep = float(np.mean(indep))
    assert float(res_c.obj_val) >= mean_indep - 1e-6 * abs(mean_indep)
    # shared pg is a genuinely feasible compromise: every scenario block is
    # feasible at the coupled solution
    assert float(res_c.prim_infeas) < 1e-6
