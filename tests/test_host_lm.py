"""Host-side exact sparse Newton (LM) polish + staged sparse certification.

The LM polisher (solvers/host_lm.py) is the conditioning-immune f64 tail
solver for pathological graphs (ais2klinik); the staged certification
(staircase.certificate_sparse_full / psd_accept_splu /
min_eig_arpack_deflated) mirrors the reference fast_verification order
(SESync_utils.cpp:721-850): sparse Cholesky-equivalent PSD accept first,
iterative eigensolver only on failure.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.objective import EdgeData, evaluate_f, grad_norm
from dpgo_tpu.sesync import chordal_initialization, \
    recover_translations_global
from dpgo_tpu.sesync.problem import build_sesync_problem
from dpgo_tpu.sesync.staircase import (certificate_sparse_full,
                                       certify_solution,
                                       min_eig_arpack_deflated,
                                       psd_accept_splu)
from dpgo_tpu.solvers.host_lm import lm_polish_2d

from tests.conftest import dataset_path

CSAIL_2F = 31.7037158836  # certified (artifacts/certified_optima.json)


@pytest.fixture(scope="module")
def csail_lm():
    meas = read_g2o_file(dataset_path("CSAIL.g2o"))
    R0 = chordal_initialization(meas)
    t0 = recover_translations_global(meas, R0)
    return meas, lm_polish_2d(meas, t0, R0)


def test_lm_reaches_certified_optimum(csail_lm):
    meas, res = csail_lm
    assert res.converged
    np.testing.assert_allclose(res.f2x, CSAIL_2F, rtol=1e-9)
    # Oracle agreement: the theta-chart objective IS the chordal objective.
    edges = EdgeData.from_measurements(meas, dtype=jnp.float64)
    f2 = 2 * float(evaluate_f(edges, jnp.asarray(res.t), jnp.asarray(res.R)))
    np.testing.assert_allclose(f2, res.f2x, rtol=1e-12)
    g2 = 2 * float(grad_norm(edges, jnp.asarray(res.t), jnp.asarray(res.R)))
    assert g2 < 1e-8


def test_lm_newton_beats_gauss_newton(csail_lm):
    """Full Newton (diagonal curvature correction) must converge at least
    as deep as Gauss-Newton in the same iteration budget."""
    meas, _ = csail_lm
    R0 = chordal_initialization(meas)
    t0 = recover_translations_global(meas, R0)
    gn = lm_polish_2d(meas, t0, R0, max_iters=8, newton=False)
    nw = lm_polish_2d(meas, t0, R0, max_iters=8, newton=True)
    assert nw.grad_inf <= gn.grad_inf * 10  # both converge on CSAIL...
    assert nw.f2x <= gn.f2x + 1e-9          # ...Newton never worse


def test_sparse_certificate_stationarity(csail_lm):
    """S_full [t; Y] = 0 at a stationary point (M X = blkdiag(0,Lam) X)."""
    meas, res = csail_lm
    prob = build_sesync_problem(meas)
    n, d = prob.n, prob.d
    Y = np.swapaxes(res.R, 1, 2).reshape(n * d, d)
    Lam = np.asarray(prob.Lambda_blocks(jnp.asarray(Y)))
    S = certificate_sparse_full(meas, Lam)
    # The explicit-state certificate annihilates the solution itself.
    X = np.concatenate([res.t, Y], axis=0)
    assert np.linalg.norm(S @ X) < 1e-6
    # And the sparse M part reproduces the objective: <M X, X> = 2 F.
    M = certificate_sparse_full(meas, np.zeros_like(Lam))
    edges = EdgeData.from_measurements(meas, dtype=jnp.float64)
    f2 = 2 * float(evaluate_f(edges, jnp.asarray(res.t), jnp.asarray(res.R)))
    np.testing.assert_allclose(np.sum(X * (M @ X)), f2, rtol=1e-10)


def test_psd_accept_at_optimum_rejects_perturbed(csail_lm):
    meas, res = csail_lm
    prob = build_sesync_problem(meas)
    n, d = prob.n, prob.d
    Y = np.swapaxes(res.R, 1, 2).reshape(n * d, d)
    Lam = np.asarray(prob.Lambda_blocks(jnp.asarray(Y)))
    S = certificate_sparse_full(meas, Lam)
    assert psd_accept_splu(S, 1e-7) is True
    # Suboptimal candidate: Lambda blocks of a perturbed Y give an
    # indefinite certificate that the pivot test must NOT accept.
    th = np.arctan2(res.R[:, 1, 0], res.R[:, 0, 0]).copy()
    th[200:400] += 0.5
    c, s = np.cos(th), np.sin(th)
    Rbad = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)
    Ybad = np.swapaxes(Rbad, 1, 2).reshape(n * d, d)
    Lbad = np.asarray(prob.Lambda_blocks(jnp.asarray(Ybad)))
    Sbad = certificate_sparse_full(meas, Lbad)
    assert psd_accept_splu(Sbad, 1e-7) is not True


def test_certify_solution_staged(csail_lm):
    meas, res = csail_lm
    ok, lam, bound, fxhat = certify_solution(meas, res.R)
    assert ok and lam > -1e-5
    assert bound < 1e-3
    np.testing.assert_allclose(2 * fxhat, CSAIL_2F, rtol=1e-9)
    # Negative control must reject through the staged route too.
    th = np.arctan2(res.R[:, 1, 0], res.R[:, 0, 0]).copy()
    th[200:400] += 0.5
    c, s = np.cos(th), np.sin(th)
    Rbad = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)
    ok_b, lam_b, _, _ = certify_solution(meas, Rbad)
    assert not ok_b and lam_b < -1e-2


def test_lm3d_zero_noise_exact():
    """d=3 LM on the zero-noise sphere_small: residual collapses to
    machine zero (the Jacobian chart is exact at the solution)."""
    meas = read_g2o_file(dataset_path("sphere_small.g2o"))
    R0 = chordal_initialization(meas)
    t0 = recover_translations_global(meas, R0)
    from dpgo_tpu.solvers.host_lm import lm_polish
    res = lm_polish(meas, t0, R0)
    assert res.f2x < 1e-20
    # Rotations stay on SO(3) through the Exp-map updates.
    RtR = np.einsum("nab,nac->nbc", res.R, res.R)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (res.R.shape[0],
                                                        1, 1)), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(res.R), 1.0, atol=1e-12)


def test_lm3d_sphere2500_reaches_certified_optimum():
    """d=3 Gauss-Newton LM from chordal init lands on sphere2500's
    certified global optimum (catalog 2f* = 1687.0058142779)."""
    import json
    import os
    cat_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "certified_optima.json")
    if not os.path.exists(cat_path):
        pytest.skip("catalog not built")
    f_star = json.load(open(cat_path))["sphere2500.g2o"]["fxhat_2x"]
    meas = read_g2o_file(dataset_path("sphere2500.g2o"))
    R0 = chordal_initialization(meas)
    t0 = recover_translations_global(meas, R0)
    from dpgo_tpu.solvers.host_lm import lm_polish
    res = lm_polish(meas, t0, R0)
    edges = EdgeData.from_measurements(meas, dtype=jnp.float64)
    f2 = 2 * float(evaluate_f(edges, jnp.asarray(res.t),
                              jnp.asarray(res.R)))
    np.testing.assert_allclose(f2, f_star, rtol=1e-9)
    assert res.grad_inf < 1e-8


def test_ais2klinik_lm_reaches_certified_optimum():
    """ais2klinik end-to-end: chordal init + exact-Newton LM reaches the
    certified global optimum (catalog entry written by tools/ais_certify.py;
    the round-2/3 multilevel-preconditioner plateau at 2f=188.51, grad
    ~9e-2, is fully resolved by the conditioning-immune direct solve).
    ~10 s; the certificate itself is exercised by the catalog tool."""
    import json
    import os
    cat_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "certified_optima.json")
    if not os.path.exists(cat_path):
        pytest.skip("catalog not built")
    cat = json.load(open(cat_path))
    if cat.get("ais2klinik.g2o", {}).get("status") != "GlobalOpt":
        pytest.skip("ais2klinik not certified")
    f_star = cat["ais2klinik.g2o"]["fxhat_2x"]
    meas = read_g2o_file(dataset_path("ais2klinik.g2o"))
    R0 = chordal_initialization(meas)
    t0 = recover_translations_global(meas, R0)
    res = lm_polish_2d(meas, t0, R0, max_iters=100)
    assert res.grad_inf < 1e-8
    np.testing.assert_allclose(res.f2x, f_star, rtol=1e-7)


def test_translation_compression_matches_dense():
    """sigma^2 estimate == lambda_max(V^T L^+ L^+ V) computed densely
    (the factor that deflates the PSD-accept shift; underestimating it
    would re-open the compression false-certificate hole)."""
    from dpgo_tpu.sesync.staircase import translation_compression
    meas = read_g2o_file(dataset_path("CSAIL.g2o"))
    n, d = meas.num_poses, meas.d
    L = np.zeros((n, n))
    np.add.at(L, (meas.i, meas.i), meas.tau)
    np.add.at(L, (meas.j, meas.j), meas.tau)
    np.add.at(L, (meas.i, meas.j), -meas.tau)
    np.add.at(L, (meas.j, meas.i), -meas.tau)
    V = np.zeros((n, n * d))
    for e in range(len(meas.i)):
        i, j = meas.i[e], meas.j[e]
        V[i, d * i:d * i + d] += meas.tau[e] * meas.t[e]
        V[j, d * i:d * i + d] -= meas.tau[e] * meas.t[e]
    Lp = np.linalg.pinv(L)
    A = Lp @ V
    sig2_dense = np.linalg.norm(A, 2) ** 2
    sig2 = translation_compression(meas, iters=100)
    # Power iteration converges from below; within 5% after 100 iters and
    # never above the dense value by more than roundoff.
    assert sig2 <= sig2_dense * (1 + 1e-8)
    assert sig2 >= 0.95 * sig2_dense


def test_arpack_deflated_matches_dense():
    """min_eig_arpack_deflated == dense eigh on the deflated complement,
    for a certificate-shaped matrix (S Y ~ 0: span(Y) near-invariant, the
    structure that holds at stationarity and makes shift-deflation exact)."""
    rng = np.random.default_rng(7)
    nd, k = 60, 2
    A = rng.standard_normal((nd, nd))
    A = 0.5 * (A + A.T)
    Y = rng.standard_normal((nd, k))
    Q, _ = np.linalg.qr(Y)
    P = np.eye(nd) - Q @ Q.T
    S = P @ A @ P  # S Y = 0 exactly (the certificate structure)
    w = np.sort(np.linalg.eigvalsh(S))
    lamc, v, resid = min_eig_arpack_deflated(lambda x: S @ x, Y, nd)
    np.testing.assert_allclose(lamc, w[0], atol=1e-8)
    assert resid < 1e-6
    assert abs(Q.T @ v).max() < 1e-8
