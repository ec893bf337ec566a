"""Batched (vmap) and sharded (mesh) solve tests.

Key invariant: vmap-batch == loop-of-singles (SURVEY §4 implications item c),
plus divergence tolerance — instances with different control-flow paths
(accept/reject, FR) in one batch.
"""

import jax
import jax.numpy as jnp
import numpy as np

import sqpsolver_tpu as sqp
from sqpsolver_tpu.algorithms.sqp_tr import make_solver
from sqpsolver_tpu.models import hs
from sqpsolver_tpu.models.toy import toy_nlp
from sqpsolver_tpu.parallel import sharding as shd
from sqpsolver_tpu.parallel.batch import batch_data, make_batch_solver, summarize_batch

PARAMS = sqp.Parameters(max_iter=200, OutputFlag=0)


def test_batch_matches_single_toy():
    nlp = toy_nlp()
    # batch over perturbed starting points; the toy NLP has two KKT points,
    # x = (-1, -1) and x = (2, 0.5) (both roots of x^2 - x = 2 with xy = 1);
    # each instance must land on one of them
    x0s = np.array([[0.0, 0.0], [1.0, 1.0], [-2.0, 0.5], [0.3, -0.7]])
    data = batch_data(nlp, 4, x0=x0s)
    out = make_batch_solver(nlp, PARAMS)(data)
    assert out.x.shape == (4, 2)
    for i in range(4):
        xi = np.asarray(out.x[i])
        ok = np.allclose(xi, [-1.0, -1.0], rtol=1e-4) or np.allclose(
            xi, [2.0, 0.5], rtol=1e-4
        )
        assert ok, f"instance {i}: {xi}"
    # the reference's golden start (the origin) reaches (-1, -1)
    np.testing.assert_allclose(np.asarray(out.x[0]), [-1.0, -1.0], rtol=1e-4)
    summ = summarize_batch(out)
    assert summ["n_success"] == 4


def test_batch_equals_loop_hs():
    """Same instance replicated in a batch gives bitwise-identical iterates to
    the single solve (the batched control flow is pure masking)."""
    prob = hs.hs_problem("hs071")
    single = make_solver(prob.nlp, PARAMS, verbose=False)._raw(prob.nlp.data())
    data = batch_data(prob.nlp, 3)
    batched = make_batch_solver(prob.nlp, PARAMS)(data)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(batched.x[i]), np.asarray(single.x), rtol=1e-10
        )
        assert int(batched.iterations[i]) == int(single.iterations)


def test_sharded_solve_on_fake_mesh():
    """pjit the batched solve over the 8-device CPU fake mesh."""
    assert len(jax.devices()) >= 8
    nlp = toy_nlp()
    mesh = shd.instance_mesh(jax.devices()[:8])
    data = batch_data(nlp, 16)
    data = shd.shard_data(data, mesh)
    solver = shd.make_sharded_solver(nlp, PARAMS, mesh)
    out = solver(data)
    jax.block_until_ready(out.x)
    assert out.x.shape == (16, 2)
    np.testing.assert_allclose(
        np.asarray(out.x), np.tile([-1.0, -1.0], (16, 1)), rtol=1e-4
    )


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(4)
