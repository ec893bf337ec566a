"""MATPOWER parser + OPF end-to-end on a parsed file."""

import textwrap

import numpy as np
import pytest

import sqpsolver_tpu as sqp
from sqpsolver_tpu.models.acopf import acopf_polar
from sqpsolver_tpu.models.matpower import parse_matpower

# a small 3-bus case of our own design, in MATPOWER syntax
CASE3 = textwrap.dedent(
    """
    function mpc = case3t
    mpc.version = '2';
    mpc.baseMVA = 100;
    %% bus_i type Pd Qd Gs Bs area Vm Va baseKV zone Vmax Vmin
    mpc.bus = [
        1  3   0    0   0  0  1  1.0  0  230  1  1.1  0.9;
        2  2  50   15   0  0  1  1.0  0  230  1  1.1  0.9;
        3  1  80   25   0  0  1  1.0  0  230  1  1.1  0.9;
    ];
    %% bus Pg Qg Qmax Qmin Vg mBase status Pmax Pmin
    mpc.gen = [
        1  0  0  100  -100  1.0  100  1  150  5;
        2  0  0  100  -100  1.0  100  1  120  5;
    ];
    %% fbus tbus r x b rateA rateB rateC ratio angle status
    mpc.branch = [
        1  2  0.02  0.10  0.03  120  0  0  0  0  1;
        1  3  0.03  0.12  0.02  120  0  0  0  0  1;
        2  3  0.02  0.09  0.02  0    0  0  0  0  1;
    ];
    %% model startup shutdown ncost c2 c1 c0
    mpc.gencost = [
        2  0  0  3  0.05   8.0  100;
        2  0  0  3  0.08  10.0  150;
    ];
    """
)


@pytest.fixture()
def case3_file(tmp_path):
    p = tmp_path / "case3t.m"
    p.write_text(CASE3)
    return str(p)


def test_parse_fields(case3_file):
    case = parse_matpower(case3_file)
    assert case.nb == 3 and case.ng == 2 and case.nl == 3
    assert case.baseMVA == 100.0
    assert case.ref_bus == 0
    np.testing.assert_allclose(case.bus_pd, [0.0, 0.5, 0.8])
    np.testing.assert_allclose(case.gen_pmax, [1.5, 1.2])
    np.testing.assert_allclose(case.cost_c1, [8.0, 10.0])
    # rate 0 -> unlimited
    assert np.isinf(case.br_rate[2])
    np.testing.assert_allclose(case.br_rate[:2], [1.2, 1.2])


def test_parsed_case_solves(case3_file):
    case = parse_matpower(case3_file)
    nlp = acopf_polar(case, scenario_batchable=False)
    res = sqp.optimize(
        nlp,
        sqp.Parameters(
            max_iter=100, OutputFlag=0, tol_infeas=1e-6, tol_residual=1e-4
        ),
    )
    assert res.success, res.status_name
    assert res.prim_infeas <= 1e-6
