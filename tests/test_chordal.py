"""Distributed chordal initialization (DChordal) tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from dpgo_tpu.chordal import DChordalConfig, distributed_chordal_init
from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.objective import EdgeData, evaluate_f
from dpgo_tpu.sesync import chordal_initialization, recover_translations_global

from tests.conftest import dataset_path
from tests.synthetic import random_pose_graph


def _init_objectives(meas, nodes, cfg=DChordalConfig()):
    edges = EdgeData.from_measurements(meas)
    t, R = distributed_chordal_init(meas, nodes, cfg=cfg)
    f_dist = float(evaluate_f(edges, jnp.asarray(t), jnp.asarray(R)))
    Rc = chordal_initialization(meas)
    tc = recover_translations_global(meas, Rc)
    f_cent = float(evaluate_f(edges, jnp.asarray(tc), jnp.asarray(Rc)))
    return f_dist, f_cent, (t, R)


def test_dchordal_csail_matches_centralized():
    meas = read_g2o_file(dataset_path("CSAIL.g2o"))
    f_dist, f_cent, (t, R) = _init_objectives(meas, 4)
    # Distributed init must land within 5% of centralized chordal quality.
    assert f_dist <= 1.05 * f_cent
    # Valid rotations.
    RtR = np.einsum("nki,nkj->nij", R, R)
    np.testing.assert_allclose(RtR, np.tile(np.eye(2), (len(R), 1, 1)),
                               atol=1e-8)


def test_dchordal_3d_synthetic(rng):
    meas, _, _ = random_pose_graph(rng, num_poses=48, d=3, loop_closures=30,
                                   noise=0.05)
    f_dist, f_cent, _ = _init_objectives(meas, 4)
    assert f_dist <= 1.5 * f_cent + 1.0


def test_dchordal_feeds_solver():
    from dpgo_tpu.driver import DPGOSolver
    from dpgo_tpu.solvers.mm import MMOptions
    meas = read_g2o_file(dataset_path("tinyGrid3D.g2o"))
    solver = DPGOSolver(meas, num_nodes=2, opts=MMOptions())
    st = solver.initialize(dist_init=True)
    f0, _ = solver._metrics(st)
    import jax.numpy as jnp
    for k in range(30):
        st = solver._step(st, jnp.asarray(k, jnp.int32))
    f1, g1 = solver._metrics(st)
    assert float(f1) <= float(f0)
    assert float(g1) < 1.0


def test_dchordal_single_node():
    """A 1-node run must return the stage-0 local solve untouched (the
    uncoupled-BCD-block freeze; the homogeneous rotation stage previously
    underflowed here)."""
    meas = read_g2o_file(dataset_path("tinyGrid3D.g2o"))
    edges = EdgeData.from_measurements(meas)
    t, R = distributed_chordal_init(meas, 1)
    assert np.isfinite(t).all() and np.isfinite(R).all()
    f = float(evaluate_f(edges, jnp.asarray(t), jnp.asarray(R)))
    # Stage-0 TNT refinement solves the whole (single-node) problem.
    assert 2 * f < 90.0
