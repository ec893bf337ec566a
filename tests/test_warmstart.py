"""Presolve warm start (reference examples/acopf/init_opf.jl:25-47).

The reference initializes an OPF from a full Ipopt presolve; here the
presolver is the framework at loose tolerance.  Coverage: the warm-started
strict solve reaches the same optimum in fewer SQP iterations, and the
batched form warm-starts a vmapped solve.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios
from sqpsolver_tpu.models.power import case9
from sqpsolver_tpu.parallel.batch import batch_data, make_batch_solver, summarize_batch
from sqpsolver_tpu.utils.warmstart import presolve_parameters, presolve_start

PARAMS = sqp.Parameters(
    max_iter=60, OutputFlag=0, tol_infeas=1e-6, tol_residual=1e-4,
)


def _solve(nlp, data):
    solver = sqp.make_solver(nlp, PARAMS)
    return solver(data)


def test_presolve_start_case9():
    nlp = acopf_polar(case9(), scenario_batchable=False)
    cold = _solve(nlp, nlp.data(jnp.float64))
    warm_data = presolve_start(nlp, PARAMS)
    # the presolve moved the primal start off the bound-midpoint default
    assert not np.allclose(np.asarray(warm_data.x0), np.asarray(nlp.x0))
    assert warm_data.lam0 is not None
    warm = _solve(nlp, warm_data)
    assert int(warm.status) == 0, int(warm.status)
    np.testing.assert_allclose(
        float(warm.obj_val), float(cold.obj_val), rtol=1e-5
    )
    np.testing.assert_allclose(float(warm.obj_val), 5296.69, rtol=1e-4)
    # the whole point: strictly fewer SQP iterations than the cold solve
    assert int(warm.iterations) < int(cold.iterations), (
        int(warm.iterations), int(cold.iterations),
    )


def test_presolve_start_batched():
    case = case9()
    nlp = acopf_polar(case)
    batch = 3
    data = batch_data(
        nlp, batch, theta=load_scenarios(case, batch, seed=11), dtype=jnp.float64
    )
    warm = presolve_start(nlp, PARAMS, data=data)
    assert warm.x0.shape == data.x0.shape
    solver = make_batch_solver(nlp, PARAMS)
    out = solver(warm)
    summ = summarize_batch(out)
    assert summ["n_success"] == batch, summ


def test_presolve_parameters_are_loose():
    pp = presolve_parameters(PARAMS)
    assert pp.tol_infeas > PARAMS.tol_infeas
    assert pp.max_iter <= PARAMS.max_iter
    # strict knobs unrelated to the presolve are preserved
    assert pp.dtype == PARAMS.dtype
