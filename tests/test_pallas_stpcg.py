"""Fused-STPCG Pallas kernel vs the portable solvers/tnt.py stpcg."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.synthetic import random_pose_graph


def _setup(rng, num_poses=40, d=3):
    from dpgo_tpu.driver import DPGOSolver
    from dpgo_tpu.solvers.mm import MMOptions

    meas, t_true, R_true = random_pose_graph(rng, num_poses=num_poses, d=d,
                                             loop_closures=30, noise=0.05)
    s = DPGOSolver(meas, num_nodes=2, opts=MMOptions(accelerated=True),
                   dtype=jnp.float64)
    st = s.initialize()
    st, _ = s.run_steps(st, jnp.zeros((), jnp.int32), 3)
    p = jax.tree.map(lambda x: x[0], s.probs)
    return s, st, p


@pytest.mark.parametrize("dim", [3, 2])
def test_fused_stpcg_matches_reference(rng, dim):
    from dpgo_tpu.ops import pallas_stpcg as pk
    from dpgo_tpu.solvers.tnt import TNTParams, stpcg

    s, st, p = _setup(rng, d=dim)
    f32 = jnp.float32
    d = p.d
    n = p.pose_mask.shape[0]
    n_pad = max(-(-n // pk.LANE) * pk.LANE, pk.LANE)

    # TNT-entry quantities for node 0 (f32, like the TPU path).
    t0 = jnp.asarray(st.Z.t[0], f32)
    Q = jnp.asarray(p.to_tall(st.Z.R[0]), f32)
    gQ = jnp.asarray(p.to_tall(st.g_R[0]), f32)
    gt = jnp.asarray(st.g_t[0], f32)
    pf = jax.tree.map(lambda x: jnp.asarray(x, f32)
                      if jnp.issubdtype(x.dtype, jnp.floating) else x, p)
    nabla = pf.reduced_grad_tall(t0, Q, gQ)
    grad = pf.proj_tall(Q, nabla)
    pgrad = pf.precondition_tall(Q, grad)

    params = TNTParams()
    for Delta in (1.0, 0.02):
        h_ref, Hh_ref, nrm_ref, k_ref = stpcg(
            grad,
            lambda v: pf.hessian_vp_tall(Q, nabla, v),
            lambda v: pf.precondition_tall(Q, v),
            jnp.asarray(Delta, f32), params, v0=pgrad)

        Hpan = jnp.asarray(pk.block_panels(
            np.asarray(p.Hred_d, np.float64), d, n_pad), f32)
        Ppan = jnp.asarray(pk.block_panels(
            np.asarray(p.precon_dense, np.float64), d, n_pad), f32)
        Sb = jnp.einsum("nar,nbr->nab", Q.reshape(n, d, d),
                        nabla.reshape(n, d, d))
        Sb = 0.5 * (Sb + jnp.swapaxes(Sb, -1, -2))
        h, Hh, nrm, k = pk.stpcg_fused(
            Hpan, Ppan, grad, pgrad, Q, Sb,
            jnp.asarray(Delta, f32), jnp.asarray(True),
            max_iters=params.max_tCG_iterations,
            kappa_fgr=params.kappa_fgr, theta=params.theta)

        assert int(k) == int(k_ref), (Delta, int(k), int(k_ref))
        np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(Hh), np.asarray(Hh_ref),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(float(nrm), float(nrm_ref), rtol=1e-4)

    # Inactive lane: zero step, zero iterations.
    h, Hh, nrm, k = pk.stpcg_fused(
        Hpan, Ppan, grad, pgrad, Q, Sb, jnp.asarray(1.0, f32),
        jnp.asarray(False), max_iters=params.max_tCG_iterations,
        kappa_fgr=params.kappa_fgr, theta=params.theta)
    assert int(k) == 0
    np.testing.assert_allclose(np.asarray(h), 0.0)


def test_fused_stpcg_under_shard_map():
    """The fused kernel lowers under shard_map over a device mesh (the
    sharded f32 3-D deployment path); the solver runs and stays finite."""
    import os

    import numpy as np
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    import __graft_entry__ as ge
    from dpgo_tpu.parallel.spmd import ShardedDPGOSolver
    from dpgo_tpu.solvers.mm import MMOptions

    n_dev = min(4, len(jax.devices()))
    meas = ge._synthetic_problem(num_poses=16 * n_dev, num_nodes=n_dev,
                                 seed=5)
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("nodes",))
    s = ShardedDPGOSolver(meas, num_nodes=n_dev, mesh=mesh,
                          opts=MMOptions(accelerated=True),
                          dtype=jnp.float32)
    assert s.probs.Hpan.shape[-1] > 1  # fused panels active
    st = s.initialize()
    st, _ = s.run_steps(st, jnp.zeros((), jnp.int32), 8)
    f, g = map(float, s._metrics(st))
    assert np.isfinite(f) and np.isfinite(g)


def test_fused_panels_refresh_under_dynamic_rescale(rng):
    """with_weights refreshes the fused kernel's Hred panels: the reweighted
    panel matvec must match the reweighted dense hessian_vp_tall."""
    from dpgo_tpu.problem import with_weights
    from dpgo_tpu.ops import pallas_stpcg as pk

    from dpgo_tpu.driver import DPGOSolver
    from dpgo_tpu.solvers.mm import MMOptions

    meas, t_true, R_true = random_pose_graph(rng, num_poses=40, d=3,
                                             loop_closures=30, noise=0.05)
    sol = DPGOSolver(meas, num_nodes=2, opts=MMOptions(accelerated=True),
                     dtype=jnp.float32)
    p = jax.tree.map(lambda x: x[0], sol.probs)
    assert p.Hpan.shape[-1] > 1
    m1 = p.scale_w.shape[0]
    w = jnp.asarray(rng.uniform(0.2, 1.0, size=(m1,)),
                    p.scale_w.dtype)
    pw = with_weights(p, w)
    n_pad = pw.Hpan.shape[-1]
    # Panel of the reweighted Hred equals block_panels(Hred_d).
    ref = pk.block_panels(np.asarray(pw.Hred_d, np.float64), p.d, n_pad)
    np.testing.assert_allclose(np.asarray(pw.Hpan), ref, atol=1e-5)
