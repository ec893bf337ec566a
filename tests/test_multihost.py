"""Multi-host helper tests (single-process behavior on the fake mesh)."""

import jax
import numpy as np

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models.toy import toy_nlp
from sqpsolver_tpu.parallel import multihost as mh
from sqpsolver_tpu.parallel.batch import batch_data
from sqpsolver_tpu.parallel.sharding import make_sharded_solver


def test_initialize_noop_single_process():
    mh.initialize_distributed()  # must not raise on a single process


def test_global_mesh_and_host_local_batch():
    mesh = mh.global_instance_mesh()
    assert mesh.devices.size == len(jax.devices())
    nlp = toy_nlp()
    data = batch_data(nlp, 2 * mesh.devices.size)
    gdata = mh.host_local_batch(data, mesh)
    out = make_sharded_solver(nlp, sqp.Parameters(max_iter=100, OutputFlag=0), mesh)(gdata)
    jax.block_until_ready(out.x)
    census = mh.convergence_census(out.status)
    assert census["n_done_ok"] == census["n_total"]
