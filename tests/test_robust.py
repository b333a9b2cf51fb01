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


@pytest.mark.parametrize("loss", [Loss.HUBER, Loss.WELSCH])
def test_robust_solver_decreases(rng, loss):
    meas, t_true, R_true = random_pose_graph(rng, num_poses=36, d=3,
                                             loop_closures=20, noise=0.05)
    # Corrupt a few inter-node edges to create outliers.
    from dpgo_tpu.graph import make_partition
    part = make_partition(meas.num_poses, 3)
    inter = np.nonzero(part.node_of[meas.i] != part.node_of[meas.j])[0]
    bad = inter[:2]
    meas.t[bad] += 5.0

    solver = DPGOSolver(meas, num_nodes=3, opts=MMOptions(accelerated=True),
                        loss=loss, loss_reg=0.25)
    st, hist = solver.run(60, record_every=15)
    assert np.all(np.isfinite(hist))
    assert hist[-1, 1] <= hist[0, 1]
    assert hist[-1, 1] <= np.min(hist[:, 1]) + 1e-6
