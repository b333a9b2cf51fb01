"""SE-Sync staircase + certification tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.objective import EdgeData, evaluate_f
from dpgo_tpu.sesync import chordal_initialization
from dpgo_tpu.sesync.problem import build_sesync_problem
from dpgo_tpu.sesync.staircase import (SESyncOpts, certify_solution, sesync)

from tests.conftest import dataset_path
from tests.synthetic import random_pose_graph


def test_translation_elimination_identity(rng):
    """F_sesync(R) == min_t F_full(t, R) for any rotations."""
    meas, _, R_true = random_pose_graph(rng, num_poses=25, d=3)
    prob = build_sesync_problem(meas)
    R = chordal_initialization(meas)
    Y = jnp.asarray(np.swapaxes(R, 1, 2).reshape(prob.n * prob.d, prob.d))
    f_ses = float(prob.objective(Y))
    t_opt = prob.recover_translations(jnp.asarray(R))
    edges = EdgeData.from_measurements(meas)
    f_full = float(evaluate_f(edges, t_opt, jnp.asarray(R)))
    np.testing.assert_allclose(f_ses, f_full, rtol=1e-10)
    # And the recovered t is optimal: any perturbation increases F.
    for _ in range(3):
        dt = rng.normal(size=t_opt.shape) * 0.01
        f_pert = float(evaluate_f(edges, t_opt + dt, jnp.asarray(R)))
        assert f_pert >= f_full - 1e-12


def test_sesync_certifies_csail():
    meas = read_g2o_file(dataset_path("CSAIL.g2o"))
    res = sesync(meas)
    assert res.status == "GlobalOpt"
    assert res.lambda_min > -1e-5
    # Tight instance: rounded value == SDP value.
    np.testing.assert_allclose(res.fxhat, res.sdp_val, rtol=1e-8)
    # Known certified optimum for CSAIL under these precision conventions.
    np.testing.assert_allclose(2 * res.fxhat, 31.7037158836, rtol=1e-8)


def test_explicit_formulation_matches_simplified(rng):
    """Explicit (joint (t, Y)) staircase reaches the same certified optimum
    as the translation-eliminated Simplified formulation."""
    meas, _, _ = random_pose_graph(rng, num_poses=30, d=3, noise=0.05)
    res_s = sesync(meas)
    res_e = sesync(meas, formulation="explicit")
    assert res_s.status == "GlobalOpt"
    assert res_e.status == "GlobalOpt"
    np.testing.assert_allclose(res_e.fxhat, res_s.fxhat, rtol=1e-7)
    # Explicit's joint gradient must vanish at its solution: validate via the
    # full objective with the returned (t, R).
    edges = EdgeData.from_measurements(meas)
    f_e = float(evaluate_f(edges, jnp.asarray(res_e.t), jnp.asarray(res_e.R)))
    np.testing.assert_allclose(f_e, res_e.fxhat, rtol=1e-9)


def test_explicit_gradient_and_hessian(rng):
    """Autodiff gradient of the explicit objective matches finite differences,
    and the Riemannian Hessian-vp is symmetric on the tangent space."""
    from dpgo_tpu.sesync.problem import build_sesync_explicit
    meas, _, _ = random_pose_graph(rng, num_poses=12, d=3)
    ep = build_sesync_explicit(meas)
    n, d = ep.base.n, ep.base.d
    r = d + 1
    Y = ep.base.project_blocks(
        jnp.asarray(rng.normal(size=(n * d, r))))
    t = jnp.asarray(rng.normal(size=(n, r)))
    x = (t, Y)
    g, nabla = ep.tnt_model().grad_and_nabla(x)

    def rand_tangent():
        v = (jnp.asarray(rng.normal(size=t.shape)),
             jnp.asarray(rng.normal(size=Y.shape)))
        return ep.proj_tangent(x, v)

    u, v = rand_tangent(), rand_tangent()
    Hu = ep.hess_vp(x, nabla, u)
    Hv = ep.hess_vp(x, nabla, v)
    ip = lambda a, b: float(jnp.sum(a[0] * b[0]) + jnp.sum(a[1] * b[1]))
    np.testing.assert_allclose(ip(v, Hu), ip(u, Hv), rtol=1e-9)
    # Directional derivative check.
    eps = 1e-6
    f0 = float(ep.objective(x))
    f1 = float(ep.objective((t + eps * u[0], Y + eps * u[1])))
    np.testing.assert_allclose((f1 - f0) / eps, ip(u, nabla), rtol=1e-4,
                               atol=1e-8)


def test_certify_dpgo_output():
    """AMM-PGO# output on CSAIL certifies as (near-)globally optimal."""
    from dpgo_tpu.driver import DPGOSolver
    from dpgo_tpu.solvers.mm import MMOptions
    meas = read_g2o_file(dataset_path("CSAIL.g2o"))
    res = sesync(meas)
    # certification of the staircase solution itself
    ok, lam, bound, fx = certify_solution(meas, res.R)
    assert ok
    # The sound certificate charges the stationarity defect eps = |S Yhat|
    # times nd/2 — a few 1e-4 in f units for a numerically-rounded optimum
    # (the old fixed-iteration LOBPCG reported ~0 here but could also
    # falsely certify suboptimal points; see certificate_lambda_bound).
    assert bound < 1e-2


def test_hessian_vp_symmetry_stiefel(rng):
    meas, _, _ = random_pose_graph(rng, num_poses=15, d=3)
    prob = build_sesync_problem(meas)
    R = chordal_initialization(meas)
    Y = jnp.asarray(np.swapaxes(R, 1, 2).reshape(prob.n * prob.d, prob.d))
    nabla = prob.apply_Q(Y)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    V1 = prob.proj_tangent(Y, jax.random.normal(k1, Y.shape, dtype=Y.dtype))
    V2 = prob.proj_tangent(Y, jax.random.normal(k2, Y.shape, dtype=Y.dtype))
    ip1 = float(jnp.sum(prob.hess_vp(Y, nabla, V1) * V2))
    ip2 = float(jnp.sum(prob.hess_vp(Y, nabla, V2) * V1))
    np.testing.assert_allclose(ip1, ip2, rtol=1e-8, atol=1e-10)


def test_lobpcg_matches_dense_eig(rng):
    """LOBPCG min eigenvalue matches numpy on a small dense S."""
    from dpgo_tpu.sesync.staircase import min_eig_lobpcg
    n = 60
    A = rng.normal(size=(n, n))
    S = 0.5 * (A + A.T)
    lam_ref = np.linalg.eigvalsh(S)[0]
    lam, v, resid = min_eig_lobpcg(lambda V: jnp.asarray(S) @ V, n,
                            jax.random.PRNGKey(0), jnp.float64,
                            block=4, iters=150)
    np.testing.assert_allclose(float(lam), lam_ref, rtol=1e-6, atol=1e-8)


def test_lanczos_extreme_matches_dense(rng):
    """Lanczos (the Spectra SymEigsSolver role) matches numpy eigh."""
    from dpgo_tpu.ops.eigen import lanczos_extreme, lambda_max_lanczos
    n = 80
    A = rng.normal(size=(n, n))
    S = 0.5 * (A + A.T)
    w = np.linalg.eigvalsh(S)
    lam, v = lanczos_extreme(lambda x: S @ x, n, which="max", tol=1e-10)
    np.testing.assert_allclose(lam, w[-1], rtol=1e-8)
    lam, v = lanczos_extreme(lambda x: S @ x, n, which="min", tol=1e-10)
    np.testing.assert_allclose(lam, w[0], rtol=1e-8)
    np.testing.assert_allclose(lambda_max_lanczos(S),
                               max(abs(w[0]), abs(w[-1])), rtol=1e-6)


def test_lobpcg_chebyshev_precon(rng):
    """Preconditioned LOBPCG (the ILDL role) reaches the min eigenvalue of
    an ill-conditioned PSD operator in far fewer iterations."""
    from dpgo_tpu.sesync.staircase import chebyshev_precon, min_eig_lobpcg
    n = 120
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    # Certificate-like spectrum: an isolated small eigenvalue below a wide
    # well-separated band (kappa = 1e6).
    w = np.concatenate([[1e-3], np.geomspace(1.0, 1e3, n - 1)])
    S = (Q * w[None, :]) @ Q.T
    Sj = jnp.asarray(S)
    apply_S = lambda V: Sj @ V
    pre = chebyshev_precon(apply_S, lam_max=1.05e3, degree=10)
    lam_p, _, resid_p = min_eig_lobpcg(apply_S, n, jax.random.PRNGKey(0),
                                       jnp.float64, block=4, iters=20)
    lam_c, _, resid_c = min_eig_lobpcg(apply_S, n, jax.random.PRNGKey(0),
                                       jnp.float64, block=4, iters=20,
                                       precon=pre)
    # Same budget: the preconditioned run must be far more converged.
    assert float(resid_c) < 0.1 * float(resid_p)
    np.testing.assert_allclose(float(lam_c), w.min(), rtol=1e-3)


def test_certify_with_chebyshev_precon():
    meas = read_g2o_file(dataset_path("CSAIL.g2o"))
    res = sesync(meas)
    # method="lobpcg" forces past the staged sparse fast path so the
    # Chebyshev-preconditioned LOBPCG branch actually executes.
    ok, lam, bound, fx = certify_solution(meas, res.R, precon="chebyshev",
                                          method="lobpcg")
    assert ok
    assert bound < 1e-2


def test_city10000_certified_without_arpack(monkeypatch):
    """Large-dataset certification end-to-end on the DEVICE LOBPCG route
    (VERDICT r4 #7): chordal init + host-LM candidate, then the matrix-free
    Chebyshev-preconditioned device LOBPCG certificate only — ARPACK and
    the host sparse shift-invert factorization are asserted unused. Must
    reach the catalog verdict and optimum (~35 s CPU f64)."""
    import json
    import os
    cat_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "certified_optima.json")
    if not os.path.exists(cat_path):
        pytest.skip("catalog not built")
    cat = json.load(open(cat_path))
    if cat.get("city10000.g2o", {}).get("status") != "GlobalOpt":
        pytest.skip("city10000 not certified")
    f_star = cat["city10000.g2o"]["fxhat_2x"]

    from dpgo_tpu.sesync import staircase as sc
    from dpgo_tpu.sesync.init import recover_translations_global
    from dpgo_tpu.solvers.host_lm import lm_polish

    def _banned(*a, **k):  # pragma: no cover - fails the test if reached
        raise AssertionError("host sparse-direct eigensolve used on the "
                             "device-LOBPCG certification route")

    monkeypatch.setattr(sc, "min_eig_arpack_deflated", _banned)
    monkeypatch.setattr(sc, "schur_shift_invert_precon", _banned)

    meas = read_g2o_file(dataset_path("city10000.g2o"))
    R0 = chordal_initialization(meas)
    t0 = recover_translations_global(meas, R0)
    res = lm_polish(meas, t0, R0)
    np.testing.assert_allclose(res.f2x, f_star, rtol=1e-9)

    ok, lam, bound, fx = certify_solution(
        meas, res.R, min_eig_tol=1e-5, dtype=jnp.float64,
        method="lobpcg", precon="chebyshev", lobpcg_iters=400)
    assert ok
    assert lam >= -1e-5
    np.testing.assert_allclose(2 * fx, f_star, rtol=1e-9)
    # Residual-honest bound at a true optimum: tight.
    assert 2 * bound <= 1e-4 * f_star
