"""Checkpoint/resume + chunked solving (SURVEY §5.4 TPU-build item)."""

import numpy as np

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models.hs import hs_problem
from sqpsolver_tpu.models.toy import toy_nlp
from sqpsolver_tpu.utils.checkpoint import solve_with_checkpoints

PARAMS = sqp.Parameters(max_iter=200, OutputFlag=0)


def test_chunked_matches_monolithic():
    prob = hs_problem("hs071")
    direct = sqp.optimize(prob.nlp, PARAMS)
    chunked = solve_with_checkpoints(
        prob.nlp, PARAMS, prob.nlp.data(), chunk_iters=7
    )
    np.testing.assert_allclose(np.asarray(chunked.x), direct.x, rtol=1e-10)
    assert int(chunked.iterations) == direct.iterations
    assert int(chunked.status) == int(direct.status)


def test_adaptive_chunked_batch_matches_monolithic():
    """make_chunked_batch_solver (the 60-s axon watchdog workaround,
    parallel/batch.py) must be bit-identical to the monolithic vmapped
    solve: same while-loop body, only the execution is cut at chunk
    boundaries."""
    from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios
    from sqpsolver_tpu.models.power import case9
    from sqpsolver_tpu.parallel.batch import (
        batch_data,
        make_batch_solver,
        make_chunked_batch_solver,
    )

    case = case9()
    nlp = acopf_polar(case)
    params = sqp.Parameters(
        max_iter=40, OutputFlag=0, tol_infeas=1e-6, tol_residual=1e-4,
        use_soc=True, init_projection="off",
    )
    theta = load_scenarios(case, 6, seed=3, spread=0.05)
    data = batch_data(nlp, 6, theta=theta)
    mono = make_batch_solver(nlp, params)(data)
    chunked = make_chunked_batch_solver(
        nlp, params, target_chunk_seconds=1e9, chunk0=3
    )(data)
    # sub-batch splitting (watchdog cap on the device batch): slices share
    # shapes/compiles, results concatenate in order
    split = make_chunked_batch_solver(
        nlp, params, target_chunk_seconds=1e9, chunk0=3, sub_batch=3
    )(data)
    for other in (chunked, split):
        np.testing.assert_array_equal(
            np.asarray(mono.status), np.asarray(other.status)
        )
        np.testing.assert_array_equal(
            np.asarray(mono.iterations), np.asarray(other.iterations)
        )
        np.testing.assert_allclose(
            np.asarray(mono.x), np.asarray(other.x), rtol=1e-12, atol=1e-14
        )


def test_checkpoint_resume(tmp_path):
    nlp = toy_nlp()
    ckdir = str(tmp_path / "ck")
    # run only a few chunks by limiting max_iter, saving state
    partial_params = PARAMS.replace(max_iter=3)
    partial = solve_with_checkpoints(
        nlp, partial_params, nlp.data(), chunk_iters=1, checkpoint_dir=ckdir
    )
    assert int(partial.status) in (
        sqp.Status.MAXIMUM_ITERATIONS_EXCEEDED,
        sqp.Status.FEASIBLE_POINT_FOUND,
    )
    # resume from the checkpoint with the full budget -> converges
    full = solve_with_checkpoints(
        nlp, PARAMS, nlp.data(), chunk_iters=50, checkpoint_dir=ckdir,
        resume=True,
    )
    np.testing.assert_allclose(np.asarray(full.x), [-1.0, -1.0], rtol=1e-4)


def test_warm_start_duals():
    """Dual warm start (MOI_wrapper.jl:1200-1222 parity): seeding the known
    multipliers speeds convergence."""
    prob = hs_problem("hs071")
    cold = sqp.optimize(prob.nlp, PARAMS)
    data = prob.nlp.data()
    data.lam0 = np.asarray(cold.mult_g)
    data.x0 = np.asarray(cold.x)
    solver = sqp.make_solver(prob.nlp, PARAMS, verbose=False)
    warm = solver(data)
    assert int(warm.iterations) <= cold.iterations
    np.testing.assert_allclose(np.asarray(warm.x), cold.x, atol=1e-6)


def test_time_limit():
    """time_limit (declared but unimplemented in the reference,
    parameters.jl:21) is honored at chunk granularity."""
    prob = hs_problem("hs071")
    res = solve_with_checkpoints(
        prob.nlp,
        PARAMS.replace(time_limit=0.0),
        prob.nlp.data(),
        chunk_iters=5,
    )
    assert int(res.status) == sqp.Status.MAXIMUM_CPUTIME_EXCEEDED
