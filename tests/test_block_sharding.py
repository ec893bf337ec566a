"""BBD part-axis sharding of one large structured instance over the fake
8-device mesh (SURVEY §7 step 6: Schur-complement coupling over ICI; the
reference has no distributed backend at all, SURVEY §2.4)."""

import numpy as np

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models.acopf import acopf_polar, load_scenarios
from sqpsolver_tpu.models.power import case9
from sqpsolver_tpu.models.stochastic import couple_scenarios, pg_shared_mask
from sqpsolver_tpu.parallel import sharding as shd
from sqpsolver_tpu import results as _results

#: kkt_parts=8: one interior block per fake-mesh device (even sharding)
PARAMS = sqp.Parameters(
    max_iter=100, OutputFlag=0, tol_infeas=1e-6, tol_residual=1e-4,
    use_soc=True, kkt_structured=True, hessian_shift="power", kkt_parts=8,
)


def test_block_sharded_coupled_matches_unsharded():
    """A coupled 4-scenario case9 with scenario blocks sharded over the
    8-device fake mesh reproduces the unsharded structured solve (GSPMD may
    reorder the Schur reductions -> compare at solver tolerance)."""
    import jax

    case = case9()
    nlp = acopf_polar(case)
    K = 4
    thetas = load_scenarios(case, K, seed=5, spread=0.02)
    coupled = couple_scenarios(nlp, thetas, pg_shared_mask(case, nlp))

    d = coupled.data()

    base = sqp.make_solver(coupled, PARAMS)
    r_base = _results.from_raw(base(d), 0.0)
    assert r_base.success, r_base.status_name

    mesh = shd.instance_mesh(axis="block")
    assert mesh.devices.size == 8  # conftest fake mesh
    sharded = shd.make_block_sharded_solver(coupled, PARAMS, mesh)
    r_sh = _results.from_raw(sharded(d), 0.0)
    assert r_sh.success, r_sh.status_name

    np.testing.assert_allclose(
        float(r_sh.obj_val), float(r_base.obj_val), rtol=1e-6
    )
    assert float(r_sh.prim_infeas) < 1e-6


def test_block_sharded_requires_structured():
    import pytest

    case = case9()
    nlp = acopf_polar(case)
    with pytest.raises(ValueError):
        shd.make_block_sharded_solver(
            nlp, PARAMS.replace(kkt_structured=False)
        )
