"""Robust loss kernels: surrogate certificates + end-to-end outlier runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpgo_tpu.driver import DPGOSolver
from dpgo_tpu.graph import build_multigraph
from dpgo_tpu.losses import Loss
from dpgo_tpu.objective import EdgeData, evaluate_f
from dpgo_tpu.problem import build_node_problems
from dpgo_tpu.solvers.mm import MMOptions

from tests.synthetic import random_pose_graph
from tests.test_problem import (global_to_states, node_prob, rand_global,
                                state_at)


@pytest.mark.parametrize("loss", [Loss.HUBER, Loss.GEMAN_MCCLURE,
                                  Loss.WELSCH])
def test_robust_surrogate_touches_and_majorizes(rng, loss):
    meas, _, _ = random_pose_graph(rng, num_poses=30, d=3, loop_closures=18)
    part, nodes, mg = build_multigraph(meas, 3)
    probs = build_node_problems(mg, xi=1e-6, loss=loss, loss_reg=0.25)
    edges = EdgeData.from_measurements(meas, node_of=part.node_of)

    tz, Rz = rand_global(rng, meas)
    zs = global_to_states(mg, part, tz, Rz)

    # Tangency: surrogate value at the anchor equals the node objective, and
    # the node objectives sum to the global robust objective.
    total = 0.0
    for a in range(mg.num_nodes):
        p = node_prob(probs, a)
        z = state_at(zs, a)
        g, f = p.surrogate_g_f(z)
        G_at = float(p.evaluate_G(z.t, z.R, g, f))
        fobj = float(p.local_fobj(z))
        np.testing.assert_allclose(G_at, fobj, rtol=1e-9)
        total += fobj
    f_global = float(evaluate_f(edges, jnp.asarray(tz), jnp.asarray(Rz),
                                loss=loss, loss_reg=0.25))
    np.testing.assert_allclose(total, f_global, rtol=1e-9)

    # Global majorization: sum_a G^a(X|Z) >= F(X) for random X.
    for _ in range(4):
        tx, Rx = rand_global(rng, meas)
        xs = global_to_states(mg, part, tx, Rx)
        tot_G = 0.0
        for a in range(mg.num_nodes):
            p = node_prob(probs, a)
            g, f = p.surrogate_g_f(state_at(zs, a))
            x = state_at(xs, a)
            tot_G += float(p.evaluate_G(x.t, x.R, g, f))
        fx = float(evaluate_f(edges, jnp.asarray(tx), jnp.asarray(Rx),
                              loss=loss, loss_reg=0.25))
        assert tot_G >= fx - 1e-8


@pytest.mark.parametrize("dtype", ["f64", "f32"])
@pytest.mark.parametrize("mode", ["static", "dynamic"])
@pytest.mark.parametrize("loss", [Loss.HUBER, Loss.GEMAN_MCCLURE,
                                  Loss.WELSCH])
def test_robust_matrix(rng, loss, mode, dtype):
    """The full {kernel} x {static, dynamic} x {f32, f64} certificate
    matrix (reference evaluate_E kernels, DPGOProblem.cpp:634-681):
    tangency of the surrogate at the anchor, global majorization of the
    robust objective, and (dynamic) the Woodbury-reweighted translation
    solve inverting the reweighted system.

    Dynamic mode uses the EXACT IRLS weights w(s_z) (inter_weights): the
    solver's persisted 1.25x-inflated weights are the reference's
    DiagReScale heuristic and intentionally do NOT majorize for shrinking
    residuals — the restart machinery covers that regime instead.
    """
    jt = jnp.float64 if dtype == "f64" else jnp.float32
    meas, _, _ = random_pose_graph(rng, num_poses=30, d=3, loop_closures=18)
    part, nodes, mg = build_multigraph(meas, 3)
    probs = build_node_problems(mg, xi=1e-6, loss=loss, loss_reg=0.25,
                                dtype=jt)
    edges = EdgeData.from_measurements(meas, node_of=part.node_of)
    cast_e = jax.tree.map(
        lambda x: x.astype(jt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, edges)

    tz, Rz = rand_global(rng, meas)
    zs = jax.tree.map(
        lambda x: x.astype(jt) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, global_to_states(mg, part, tz, Rz))

    probs_wood = None
    if mode == "dynamic":
        from dpgo_tpu.problem import with_weights
        w, _ = jax.vmap(lambda p, Z: p.inter_weights(Z))(probs, zs)
        w = jnp.where(jnp.asarray(mg.e_mask), w, 1.0)
        # The Woodbury round-trip is checked in the solver's actual regime
        # (weights clipped to min_rescale: unclipped Welsch weights ~0
        # make the reweighted system near-singular, which f32 cannot
        # round-trip); tangency/majorization use the exact IRLS weights.
        probs_wood = jax.vmap(with_weights)(
            probs, jnp.clip(w, 0.01, 1.0))
        probs = jax.vmap(with_weights)(probs, w)

    rtol = 1e-9 if dtype == "f64" else 5e-5
    total = 0.0
    for a in range(mg.num_nodes):
        p = node_prob(probs, a)
        z = state_at(zs, a)
        g, f = p.surrogate_g_f(z)
        G_at = float(p.evaluate_G(z.t, z.R, g, f))
        fobj = float(p.local_fobj(z))
        np.testing.assert_allclose(G_at, fobj, rtol=rtol)
        total += fobj
        if mode == "dynamic":
            # Woodbury/reweighted translation solve inverts mG00(w).
            pw = node_prob(probs_wood, a)
            v = jnp.asarray(rng.normal(size=z.t.shape), jt)
            mv, _ = pw.G_apply(v, jnp.zeros_like(z.R))
            back = pw.solve_mG00(mv)
            atol = 1e-6 if dtype == "f64" else 5e-3
            np.testing.assert_allclose(np.asarray(back), np.asarray(v),
                                       atol=atol)
    f_global = float(evaluate_f(cast_e, jnp.asarray(tz, jt),
                                jnp.asarray(Rz, jt),
                                loss=loss, loss_reg=0.25))
    np.testing.assert_allclose(total, f_global, rtol=max(rtol, 1e-6))

    for _ in range(3):
        tx, Rx = rand_global(rng, meas)
        xs = jax.tree.map(
            lambda x: x.astype(jt) if jnp.issubdtype(x.dtype, jnp.floating)
            else x, global_to_states(mg, part, tx, Rx))
        tot_G = 0.0
        for a in range(mg.num_nodes):
            p = node_prob(probs, a)
            g, f = p.surrogate_g_f(state_at(zs, a))
            x = state_at(xs, a)
            tot_G += float(p.evaluate_G(x.t, x.R, g, f))
        fx = float(evaluate_f(cast_e, jnp.asarray(tx, jt),
                              jnp.asarray(Rx, jt),
                              loss=loss, loss_reg=0.25))
        slack = 1e-8 if dtype == "f64" else 1e-4 * (1.0 + abs(fx))
        assert tot_G >= fx - slack


@pytest.mark.parametrize("loss,rescale", [
    (Loss.HUBER, "static"), (Loss.WELSCH, "static"),
    (Loss.GEMAN_MCCLURE, "static"), (Loss.GEMAN_MCCLURE, "dynamic")])
def test_robust_solver_decreases(rng, loss, rescale):
    meas, t_true, R_true = random_pose_graph(rng, num_poses=36, d=3,
                                             loop_closures=20, noise=0.05)
    # Corrupt a few inter-node edges to create outliers.
    from dpgo_tpu.graph import make_partition
    part = make_partition(meas.num_poses, 3)
    inter = np.nonzero(part.node_of[meas.i] != part.node_of[meas.j])[0]
    bad = inter[:2]
    meas.t[bad] += 5.0

    solver = DPGOSolver(meas, num_nodes=3,
                        opts=MMOptions(accelerated=True, rescale=rescale),
                        loss=loss, loss_reg=0.25)
    st, hist = solver.run(60, record_every=15)
    assert np.all(np.isfinite(hist))
    assert hist[-1, 1] <= hist[0, 1]
    assert hist[-1, 1] <= np.min(hist[:, 1]) + 1e-6


def test_dynamic_rescale_consistency(rng):
    """Dynamic rescale: reweighted surrogate still touches + majorizes, the
    Woodbury translation solve inverts the reweighted system, and the solver
    converges."""
    import jax
    from dpgo_tpu.problem import with_weights
    meas, _, _ = random_pose_graph(rng, num_poses=30, d=3, loop_closures=18)
    part, nodes, mg = build_multigraph(meas, 3)
    probs = build_node_problems(mg, xi=1e-6, loss=Loss.WELSCH, loss_reg=0.25)
    from tests.test_problem import global_to_states, rand_global, node_prob, \
        state_at
    tz, Rz = rand_global(rng, meas)
    zs = global_to_states(mg, part, tz, Rz)

    w = np.clip(rng.uniform(0.05, 1.0, size=probs.scale_w.shape), 0.05, 1.0)
    w = np.where(np.asarray(mg.e_mask), w, 1.0)
    probs_w = jax.vmap(with_weights)(probs, jnp.asarray(w))

    for a in range(mg.num_nodes):
        p = node_prob(probs_w, a)
        z = state_at(zs, a)
        # Tangency at the anchor still holds with reweighted quadratic.
        g, f = p.surrogate_g_f(z)
        G_at = float(p.evaluate_G(z.t, z.R, g, f))
        np.testing.assert_allclose(G_at, float(p.local_fobj(z)), rtol=1e-8)
        # Woodbury solve inverts the reweighted translation system:
        # mG00(w) v = G_apply(v, 0).t ; solve must return v.
        v = rng.normal(size=z.t.shape)
        mv, _ = p.G_apply(jnp.asarray(v), jnp.zeros_like(z.R))
        back = p.solve_mG00(mv)
        np.testing.assert_allclose(np.asarray(back), v, atol=1e-6)
        # Dense path parity under reweighting.
        if p.dense:
            Q = p.to_tall(z.R)
            val_dense = float(p.evaluate_G_tall(z.t, Q, g[0],
                                                p.to_tall(g[1]), f))
            np.testing.assert_allclose(val_dense, G_at, rtol=1e-8)

    # End-to-end dynamic solver run.
    from dpgo_tpu.driver import DPGOSolver
    meas.t[0] += 4.0  # an outlier
    solver = DPGOSolver(meas, num_nodes=3,
                        opts=MMOptions(accelerated=True, rescale="dynamic"),
                        loss=Loss.WELSCH, loss_reg=0.25)
    st, hist = solver.run(50, record_every=10)
    assert np.all(np.isfinite(hist))
    assert hist[-1, 1] <= hist[0, 1]


def test_robust_beats_trivial_under_outliers(rng):
    """With corrupted inter edges, the Welsch solution should recover the
    ground-truth trajectory better (lower ATE) than the trivial loss."""
    from dpgo_tpu.metrics import ate
    meas, t_true, R_true = random_pose_graph(rng, num_poses=40, d=3,
                                             loop_closures=30, noise=0.02)
    from dpgo_tpu.graph import make_partition
    part = make_partition(meas.num_poses, 4)
    inter = np.nonzero(part.node_of[meas.i] != part.node_of[meas.j])[0]
    bad = inter[:: max(len(inter) // 5, 1)][:5]
    meas.t[bad] += rng.normal(size=(len(bad), 3)) * 8.0

    results = {}
    for loss in (Loss.TRIVIAL, Loss.WELSCH):
        s = DPGOSolver(meas, num_nodes=4, opts=MMOptions(accelerated=True),
                       loss=loss, loss_reg=0.25)
        st, _ = s.run(80, record_every=80)
        t_est, _ = map(np.asarray, s.gather_global(st))
        results[loss] = ate(t_est, t_true)
    assert results[Loss.WELSCH] < results[Loss.TRIVIAL]
    # Absolute quality: well below the outlier magnitude (8.0) and the
    # trajectory scale.
    assert results[Loss.WELSCH] < 3.0
