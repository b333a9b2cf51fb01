"""Tests for g2o IO, partitioning, and per-node schedules."""

import numpy as np
import pytest

from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.graph import make_partition, partition_measurements, build_multigraph

from tests.conftest import dataset_path
from tests.synthetic import random_pose_graph


def test_read_tiny_grid3d():
    meas = read_g2o_file(dataset_path("tinyGrid3D.g2o"))
    assert meas.d == 3
    assert meas.num_poses == 9
    assert len(meas) > 0
    # Rotations are orthonormal with det +1.
    RtR = np.einsum("eki,ekj->eij", meas.R, meas.R)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (len(meas), 1, 1)),
                               atol=1e-8)
    np.testing.assert_allclose(np.linalg.det(meas.R), 1.0, atol=1e-8)
    assert np.all(meas.tau > 0) and np.all(meas.kappa > 0)


def test_read_csail_2d():
    meas = read_g2o_file(dataset_path("CSAIL.g2o"))
    assert meas.d == 2
    assert meas.num_poses == 1045
    assert len(meas) == 1172


def test_partition_blocks():
    part = make_partition(10, 3)
    np.testing.assert_array_equal(part.n0, [4, 3, 3])
    np.testing.assert_array_equal(part.start, [0, 4, 7])
    np.testing.assert_array_equal(part.node_of[:5], [0, 0, 0, 0, 1])
    np.testing.assert_array_equal(part.local_of[:5], [0, 1, 2, 3, 0])


def test_partition_measurements_roundtrip(rng):
    meas, _, _ = random_pose_graph(rng, num_poses=40, d=3, loop_closures=25)
    part, nodes = partition_measurements(meas, 4)

    # Every edge appears once per touching node; intra once, inter twice.
    total = sum(len(g.intra) + len(g.inter) for g in nodes)
    ni = part.node_of[meas.i]
    nj = part.node_of[meas.j]
    num_inter = int(np.sum(ni != nj))
    assert total == len(meas) + num_inter

    for g in nodes:
        # Halo slots sorted by (node, pose), no own poses among them.
        keys = list(zip(g.halo_owner.tolist(), g.halo_lpose.tolist()))
        assert keys == sorted(keys)
        assert all(n != g.node for n, _ in keys)
        # Inter edge indexing is consistent.
        for k in range(len(g.inter)):
            own = g.self_l[k]
            slot = g.other_slot[k]
            assert 0 <= own < g.n0
            assert 0 <= slot < g.n1
            gi, gj = g.inter.i[k], g.inter.j[k]
            own_g = part.start[g.node] + own
            other_g = (part.start[g.halo_owner[slot]] + g.halo_lpose[slot])
            if g.self_is_i[k]:
                assert gi == own_g and gj == other_g
            else:
                assert gj == own_g and gi == other_g
        # sent/recv schedules are mutually consistent with halo content.
        for b, (lposes, slots) in g.recv.items():
            np.testing.assert_array_equal(g.halo_owner[slots], b)
            np.testing.assert_array_equal(g.halo_lpose[slots], lposes)

    # sent of a to b == recv of b from a.
    for ga in nodes:
        for b, sent in ga.sent.items():
            lposes, _ = nodes[b].recv[ga.node]
            np.testing.assert_array_equal(sent, lposes)


def test_multigraph_padding(rng):
    meas, _, _ = random_pose_graph(rng, num_poses=37, d=2, loop_closures=12)
    part, nodes, mg = build_multigraph(meas, 5)
    assert mg.pose_mask.sum() == 37
    assert mg.a_mask.sum() == sum(len(g.intra) for g in nodes)
    assert mg.e_mask.sum() == sum(len(g.inter) for g in nodes)
    # Padded edges carry zero weight.
    assert np.all(mg.a_tau[~mg.a_mask] == 0)
    assert np.all(mg.e_tau[~mg.e_mask] == 0)


def test_intel_partition_counts():
    meas = read_g2o_file(dataset_path("intel.g2o"))
    part, nodes = partition_measurements(meas, 4)
    assert sum(g.n0 for g in nodes) == meas.num_poses
    assert sum(len(g.intra) for g in nodes) \
        + sum(len(g.inter) for g in nodes) // 2 == len(meas)


def test_message_transport_matches_gather(rng):
    """Explicit p2p messages reproduce the gather-based communicate."""
    from dpgo_tpu.transport import extract_messages, apply_messages
    from dpgo_tpu.graph import build_multigraph
    meas, t_true, R_true = random_pose_graph(rng, num_poses=40, d=3,
                                             loop_closures=25)
    part, nodes, mg = build_multigraph(meas, 4)
    # Per-node own states = slices of a global random state.
    t = rng.normal(size=(meas.num_poses, 3))
    import jax.numpy as jnp
    from dpgo_tpu.manifold import project_sod
    R = np.asarray(project_sod(jnp.asarray(
        rng.normal(size=(meas.num_poses, 3, 3)))))
    own = {a: (t[part.start[a]:part.start[a] + g.n0],
               R[part.start[a]:part.start[a] + g.n0])
           for a, g in enumerate(nodes)}
    # Exchange messages.
    inboxes = {a: {} for a in range(4)}
    for a, g in enumerate(nodes):
        for b, msg in extract_messages(g, *own[a]).items():
            inboxes[b][a] = msg
    for a, g in enumerate(nodes):
        th0 = np.zeros((g.n1, 3))
        Rh0 = np.zeros((g.n1, 3, 3))
        th, Rh = apply_messages(g, th0, Rh0, inboxes[a])
        # Gather oracle: halo = owner states at halo indices.
        gidx = part.start[g.halo_owner] + g.halo_lpose
        np.testing.assert_allclose(th, t[gidx], atol=0)
        np.testing.assert_allclose(Rh, R[gidx], atol=0)


def test_g2o_writer_roundtrip(rng, tmp_path):
    from dpgo_tpu.io.g2o import write_g2o_file
    import jax.numpy as jnp
    from dpgo_tpu.manifold import project_sod
    meas, t_true, R_true = random_pose_graph(rng, num_poses=12, d=3,
                                             loop_closures=5, noise=0.0)
    p = str(tmp_path / "out.g2o")
    write_g2o_file(p, t_true, R_true, meas)
    back = read_g2o_file(p)
    assert back.num_poses == meas.num_poses
    assert len(back) == len(meas)
    np.testing.assert_allclose(back.R, meas.R, atol=1e-6)
    np.testing.assert_allclose(back.t, meas.t, atol=1e-6)
    np.testing.assert_allclose(back.kappa, meas.kappa, rtol=1e-6)
