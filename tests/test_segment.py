"""Segment path (blocks past the dense/eigen-split limit): parity against
the dense eigen-split path on a problem small enough to run both.

The segment path is forced by segment_limit/seg_size far below the real
2048-pose trigger; the reference bar is CHOLMOD's any-block-size
factorization + RegularizedCholesky preconditioner
(/root/reference/C++/DPGO/src/DPGOProblem.cpp:93-124), replaced here by
segment-Schwarz CG translation solves and the coupled segment-
preconditioned TNT (problem.py segment fields, mm._make_tnt_model_coupled).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.synthetic import random_pose_graph

from dpgo_tpu.driver import DPGOSolver
from dpgo_tpu.losses import Loss
from dpgo_tpu.solvers.mm import MMOptions
from dpgo_tpu.solvers.tnt import TNTParams

SEG = dict(segment_limit=16, seg_size=16)


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(0)
    meas, t_true, R_true = random_pose_graph(
        rng, num_poses=120, d=3, loop_closures=60, noise=0.05)
    return meas


def test_segment_operator_and_solve_parity(graph):
    """mG00_matvec == dense mG00_full; segment CG solve == eigen-split
    solve to the CG tolerance."""
    rng = np.random.default_rng(1)
    s_ref = DPGOSolver(graph, num_nodes=2, dtype=jnp.float64)
    s_seg = DPGOSolver(graph, num_nodes=2, dtype=jnp.float64, **SEG)
    assert s_seg.probs.seg and not s_seg.probs.dense
    assert not s_ref.probs.seg
    p_ref = jax.tree.map(lambda x: x[0], s_ref.probs)
    p_seg = jax.tree.map(lambda x: x[0], s_seg.probs)
    n0 = p_seg.pose_mask.shape[0]
    rhs = jnp.asarray(rng.normal(size=(n0, 3)))

    Av_dense = p_ref.mG00_d @ rhs
    Av_seg = p_seg.mG00_matvec(rhs)
    np.testing.assert_allclose(np.asarray(Av_seg), np.asarray(Av_dense),
                               rtol=1e-12, atol=1e-12)

    a = p_ref.solve_mG00(rhs, t_anchor=jnp.zeros_like(rhs))
    b = p_seg.solve_mG00(rhs, t_anchor=jnp.zeros_like(rhs))
    rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(a))
    assert rel < 1e-6, rel


def test_segment_proximal_trajectory_parity(graph):
    """Proximal-only AMM (no TNT): the segment path's only inexactness is
    the translation CG, so the trajectory must track the dense path to
    solver tolerance."""
    k0 = jnp.zeros((), jnp.int32)
    px = MMOptions(accelerated=True, tnt=TNTParams(max_iterations=0))
    sa = DPGOSolver(graph, num_nodes=2, opts=px, dtype=jnp.float64)
    sb = DPGOSolver(graph, num_nodes=2, opts=px, dtype=jnp.float64, **SEG)
    _, _, (fa, _) = sa.run_steps_history(sa.initialize(), k0, 50)
    _, _, (fb, _) = sb.run_steps_history(sb.initialize(), k0, 50)
    fa, fb = np.asarray(fa), np.asarray(fb)
    assert np.max(np.abs(fa - fb) / np.abs(fa)) < 1e-6


def test_segment_refined_converges(graph):
    """Refined (coupled segment TNT) reaches the same objective as the
    dense refined path — a different, equally valid surrogate refinement
    (documented deviation: coupled (t, R) trust region instead of the
    reduced rotation-only one), and stays finite in f32."""
    k0 = jnp.zeros((), jnp.int32)
    sa = DPGOSolver(graph, num_nodes=2, opts=MMOptions(accelerated=True),
                    dtype=jnp.float64)
    sb = DPGOSolver(graph, num_nodes=2, opts=MMOptions(accelerated=True),
                    dtype=jnp.float64, **SEG)
    _, _, (fa, _) = sa.run_steps_history(sa.initialize(), k0, 50)
    _, _, (fb, _) = sb.run_steps_history(sb.initialize(), k0, 50)
    fa, fb = np.asarray(fa), np.asarray(fb)
    assert abs(fb[-1] - fa[-1]) / abs(fa[-1]) < 1e-5

    sc = DPGOSolver(graph, num_nodes=2, opts=MMOptions(accelerated=True),
                    dtype=jnp.float32, **SEG)
    _, _, (fc, _) = sc.run_steps_history(sc.initialize(), k0, 50)
    fc = np.asarray(fc)
    assert np.all(np.isfinite(fc))
    assert abs(fc[-1] - fa[-1]) / abs(fa[-1]) < 1e-3


def test_segment_dynamic_rescale_and_single_node(graph):
    """Huber + dynamic rescale: the segment matvec reads scale_w directly
    (no Woodbury core), so the reweighted translation solves must land on
    the dense path's answer. Single node: the component-indicator null_V
    replaces the eigen-split's numeric null basis."""
    k0 = jnp.zeros((), jnp.int32)
    opts = MMOptions(accelerated=True, rescale="dynamic")
    sa = DPGOSolver(graph, num_nodes=2, opts=opts, loss=Loss.HUBER,
                    dtype=jnp.float64)
    sb = DPGOSolver(graph, num_nodes=2, opts=opts, loss=Loss.HUBER,
                    dtype=jnp.float64, **SEG)
    _, _, (fa, _) = sa.run_steps_history(sa.initialize(), k0, 40)
    _, _, (fb, _) = sb.run_steps_history(sb.initialize(), k0, 40)
    fa, fb = np.asarray(fa), np.asarray(fb)
    assert abs(fb[-1] - fa[-1]) / abs(fa[-1]) < 1e-5

    sg = DPGOSolver(graph, num_nodes=1, opts=MMOptions(accelerated=True),
                    dtype=jnp.float64, **SEG)
    # exactly one no-inter component -> one normalized indicator column
    nv = np.asarray(sg.probs.null_V)
    assert nv.shape[2] == 1
    np.testing.assert_allclose(np.sum(nv ** 2), 1.0, rtol=1e-12)
    _, _, (fg, _) = sg.run_steps_history(sg.initialize(), k0, 40)
    fg = np.asarray(fg)
    sh = DPGOSolver(graph, num_nodes=1, opts=MMOptions(accelerated=True),
                    dtype=jnp.float64)
    _, _, (fh, _) = sh.run_steps_history(sh.initialize(), k0, 40)
    assert abs(fg[-1] - np.asarray(fh)[-1]) / abs(fg[-1]) < 1e-4
