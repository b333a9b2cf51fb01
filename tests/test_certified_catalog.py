"""Convergence against the certified-optima catalog (artifacts/)."""

import json
import os

import numpy as np
import pytest

from dpgo_tpu.driver import DPGOSolver
from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.solvers.mm import MMOptions

from tests.conftest import dataset_path

CATALOG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "certified_optima.json")


@pytest.mark.parametrize("name,nodes,iters,rel_tol", [
    ("intel.g2o", 4, 120, 2e-3),
    ("MITb.g2o", 4, 120, 5e-2),
])
def test_amm_approaches_certified_optimum(name, nodes, iters, rel_tol):
    if not os.path.exists(CATALOG):
        pytest.skip("catalog not built")
    cat = json.load(open(CATALOG))
    if name not in cat or cat[name].get("status") != "GlobalOpt":
        pytest.skip(f"{name} not certified")
    f_star = cat[name]["fxhat_2x"]
    meas = read_g2o_file(dataset_path(name))
    solver = DPGOSolver(meas, num_nodes=nodes, opts=MMOptions())
    st, hist = solver.run(iters, record_every=iters)
    final = hist[-1, 1]
    assert final >= f_star - 1e-6          # certified lower bound holds
    assert final <= f_star * (1 + rel_tol)  # and we approach it
