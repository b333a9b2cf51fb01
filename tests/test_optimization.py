"""Generic optimization-library solvers: toy-problem tests (the reference's
Optimization tests use the same pattern of tiny closed-form problems,
C++/Optimization/tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpgo_tpu.solvers.optimization import (ADMMParams, GDParams, PGParams,
                                           admm, gradient_descent, lsqr,
                                           proximal_gradient, tnls_step)


def test_gradient_descent_sphere():
    """min |x - p|^2 on S^2 -> x* = p/|p| (the reference's TNT unit test
    problem, TNT_unit_test.cpp:26-50)."""
    p = jnp.asarray([1.0, 2.0, 2.0])

    def obj(x):
        return jnp.sum((x - p) ** 2)

    def grad(x):
        g = 2.0 * (x - p)
        return g - jnp.dot(g, x) * x  # tangent projection

    def retract(x, v):
        y = x + v
        return y / jnp.linalg.norm(y)

    x0 = jnp.asarray([1.0, 0.0, 0.0])
    x, fx, gn, k = gradient_descent(obj, grad, retract, x0,
                                    GDParams(max_iterations=200))
    np.testing.assert_allclose(np.asarray(x), np.asarray(p / 3.0), atol=1e-5)
    assert float(gn) < 1e-5


def test_lsqr_least_squares(rng):
    A = jnp.asarray(rng.normal(size=(30, 10)))
    b = jnp.asarray(rng.normal(size=(30,)))
    x = lsqr(lambda v: A @ v, lambda u: A.T @ u, b, jnp.zeros(10),
             max_iters=200, atol=1e-12)
    x_ref = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-6)


def test_tnls_step_solves_gauss_newton(rng):
    J = jnp.asarray(rng.normal(size=(20, 6)))
    r = jnp.asarray(rng.normal(size=(20,)))
    h = tnls_step(lambda v: J @ v, lambda u: J.T @ u, r, jnp.zeros(6),
                  max_iters=100)
    h_ref = np.linalg.lstsq(np.asarray(J), -np.asarray(r), rcond=None)[0]
    np.testing.assert_allclose(np.asarray(h), h_ref, atol=1e-6)


def test_tnls_euclidean_nonlinear_ls(rng):
    """Full TNLS on a nonlinear Euclidean LS (exponential curve fit):
    converges to the zero-residual ground truth from a perturbed start
    (the reference's TNLS_unit_test pattern: tiny closed-form problems,
    solver status + numeric tolerance)."""
    from dpgo_tpu.solvers.optimization import TNLSParams, tnls
    tgrid = jnp.linspace(0.0, 1.0, 25)
    p_true = jnp.asarray([1.3, -0.7])
    model = lambda p: p[0] * jnp.exp(p[1] * tgrid)
    y = model(p_true)
    F = lambda p: model(p) - y
    jac = lambda p, v: jax.jvp(F, (p,), (v,))[1]
    jacT = lambda p, w: jax.vjp(F, p)[1](w)[0]
    x, Fn, gn, k = tnls(F, jac, jacT, lambda p, h: p + h,
                        jnp.asarray([2.0, 0.5]),
                        TNLSParams(max_iterations=60))
    np.testing.assert_allclose(np.asarray(x), np.asarray(p_true), atol=1e-6)
    assert float(Fn) < 1e-7


def test_tnls_riemannian_sphere(rng):
    """TNLS on the sphere: min |x - p| for x in S^2 -> x* = p / |p|
    (the TNT unit test's problem, solved via the LS machinery: retraction
    x -> (x + h)/|x + h|, tangent-space Jacobian adjoint)."""
    from dpgo_tpu.solvers.optimization import TNLSParams, tnls
    p = jnp.asarray([1.0, 2.0, 2.0])
    F = lambda x: x - p
    proj = lambda x, v: v - x * jnp.dot(x, v)

    def jac(x, v):
        return v  # dF = identity restricted to tangents

    def jacT(x, w):
        return proj(x, w)  # adjoint lands back in T_x S^2

    retract = lambda x, h: (x + h) / jnp.linalg.norm(x + h)
    x0 = jnp.asarray([0.0, 0.0, 1.0])
    x, Fn, gn, k = tnls(F, jac, jacT, retract, x0,
                        TNLSParams(max_iterations=60))
    np.testing.assert_allclose(np.asarray(x), np.asarray(p) / 3.0,
                               atol=1e-6)
    # Minimum residual is dist(p, S^2) = |p| - 1 = 2.
    np.testing.assert_allclose(float(Fn), 2.0, rtol=1e-9)
    assert float(gn) < 1e-5


def test_lsqr_trust_region_boundary(rng):
    """With a small Delta, LSQR returns a boundary step |x| = Delta that
    still decreases the residual (Steihaug-Toint truncation)."""
    A = jnp.asarray(rng.normal(size=(30, 10)))
    b = jnp.asarray(rng.normal(size=(30,)))
    x_full = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)[0]
    Delta = 0.25 * float(np.linalg.norm(x_full))
    x, xnorm, k = lsqr(lambda v: A @ v, lambda u: A.T @ u, b,
                       jnp.zeros(10), max_iters=200, atol=1e-12,
                       Delta=Delta, return_info=True)
    np.testing.assert_allclose(float(jnp.linalg.norm(x)), Delta, rtol=1e-6)
    r0 = float(np.linalg.norm(np.asarray(b)))
    r1 = float(np.linalg.norm(np.asarray(A @ x - b)))
    assert r1 < r0


def test_proximal_gradient_lasso(rng):
    """min 1/2 |A x - b|^2 + lam |x|_1 via FISTA vs coordinate descent."""
    A = jnp.asarray(rng.normal(size=(40, 15)))
    b = jnp.asarray(rng.normal(size=(40,)))
    lam = 0.5
    L = float(np.linalg.norm(np.asarray(A), 2) ** 2)

    def grad_f(x):
        return A.T @ (A @ x - b)

    def prox_g(v, step):
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - lam * step, 0.0)

    x, k = proximal_gradient(grad_f, prox_g, jnp.zeros(15),
                             PGParams(step=1.0 / L, max_iterations=2000,
                                      tol=1e-12))

    def lasso_obj(x):
        return 0.5 * np.sum((np.asarray(A) @ x - np.asarray(b)) ** 2) \
            + lam * np.sum(np.abs(x))

    # Subgradient optimality: compare against many random perturbations.
    f0 = lasso_obj(np.asarray(x))
    for _ in range(30):
        xp = np.asarray(x) + rng.normal(size=15) * 1e-3
        assert lasso_obj(xp) >= f0 - 1e-9


def test_admm_lasso(rng):
    """Same lasso via ADMM consensus split: f = 1/2|Ax-b|^2, g = lam|z|_1,
    x - z = 0."""
    A = np.asarray(rng.normal(size=(40, 15)))
    b = np.asarray(rng.normal(size=(40,)))
    lam = 0.5
    rho = 1.0
    AtA = A.T @ A
    Atb = A.T @ b
    M = np.linalg.inv(AtA + rho * np.eye(15))
    Mj = jnp.asarray(M)
    Atbj = jnp.asarray(Atb)

    # x-update: argmin_x 1/2|Ax-b|^2 + rho/2 |x + v|^2  (A_op = I, c = 0).
    def prox_f(v, rho_):
        return Mj @ (Atbj - rho_ * v)

    def prox_g(v, rho_):
        # argmin_z lam|z|_1 + rho/2 |-z + v|^2 -> soft-threshold(v).
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - lam / rho_, 0.0)

    x, z, u, k = admm(prox_f, prox_g,
                      A=lambda x: x, B=lambda z: -z, c=jnp.zeros(15),
                      x0=jnp.zeros(15), z0=jnp.zeros(15),
                      params=ADMMParams(rho=rho, max_iterations=500))

    def lasso_obj(x):
        return 0.5 * np.sum((A @ x - b) ** 2) + lam * np.sum(np.abs(x))

    f0 = lasso_obj(np.asarray(z))
    for _ in range(30):
        xp = np.asarray(z) + rng.normal(size=15) * 1e-3
        assert lasso_obj(xp) >= f0 - 1e-7


def _sphere_tnt_model():
    """min |x - p|^2 on S^2 (the reference's TNT unit-test problem,
    TNT_unit_test.cpp:26-50) as a TNTModel."""
    from dpgo_tpu.solvers.tnt import TNTModel

    p = jnp.asarray([1.0, 2.0, 2.0])

    def objective(x):
        return jnp.sum((x - p) ** 2)

    def grad_and_nabla(x):
        nabla = 2.0 * (x - p)
        return nabla - jnp.dot(nabla, x) * x, nabla

    def hess_vp(x, nabla, v):
        # Riemannian Hessian of the ambient quadratic on the sphere.
        h = 2.0 * v - jnp.dot(nabla, x) * v
        return h - jnp.dot(h, x) * x

    def precondition(x, v):
        return v

    def retract(x, v):
        y = x + v
        return y / jnp.linalg.norm(y)

    return TNTModel(objective=objective, grad_and_nabla=grad_and_nabla,
                    hess_vp=hess_vp, precondition=precondition,
                    retract=retract), p


def test_tnt_history_recording():
    """record=True returns the per-outer-iteration series (reference
    TNTResult fields, TNT.h:168-194): objective decreasing over accepted
    iterations, valid count, inner CG iteration counts."""
    from dpgo_tpu.solvers.tnt import TNTParams, tnt_generic

    model, p = _sphere_tnt_model()
    x0 = jnp.asarray([1.0, 0.0, 0.0])
    params = TNTParams(max_iterations=30, max_iterations_accepted=30,
                       gradient_tolerance=1e-9,
                       preconditioned_gradient_tolerance=1e-10)
    x, fx, gn, acc, hist = tnt_generic(model, x0, params, record=True)
    np.testing.assert_allclose(np.asarray(x), np.asarray(p / 3.0), atol=1e-6)
    cnt = int(hist.count)
    assert 0 < cnt <= 30
    assert int(acc) == int(np.asarray(hist.accepted[:cnt]).sum())
    # fx series starts at the initial objective and is non-increasing over
    # the recorded prefix (rejected steps keep the previous value).
    np.testing.assert_allclose(float(hist.fx[0]),
                               float(model.objective(x0)), rtol=1e-12)
    fxs = np.asarray(hist.fx[:cnt])
    assert np.all(np.diff(fxs) <= 1e-12)
    assert np.asarray(hist.inner_iterations[:cnt]).max() >= 1
    assert np.all(np.asarray(hist.Delta[:cnt]) > 0)


def test_tnt_user_fn_early_termination():
    """user_fn returning True terminates the solve (TNTUserFunction
    semantics, TNT.h:35-71)."""
    from dpgo_tpu.solvers.tnt import TNTParams, tnt_generic

    model, _ = _sphere_tnt_model()
    x0 = jnp.asarray([1.0, 0.0, 0.0])
    params = TNTParams(max_iterations=30, max_iterations_accepted=30,
                       gradient_tolerance=1e-9,
                       preconditioned_gradient_tolerance=1e-10)
    calls = []

    def user_fn(**stats):
        calls.append({k: np.asarray(v) for k, v in stats.items()})
        return True  # terminate immediately

    x, fx, gn, acc, hist = tnt_generic(model, x0, params, record=True,
                                       user_fn=user_fn)
    assert len(calls) == 1
    assert int(hist.count) == 1
    # The callback saw the per-iteration stats.
    assert {"k", "fx", "gradnorm", "Delta", "inner_iterations",
            "rho", "accepted"} <= set(calls[0])
    # Unterminated reference run does strictly more iterations.
    _, _, _, acc_full, hist_full = tnt_generic(model, x0, params,
                                               record=True)
    assert int(hist_full.count) > 1


def test_constrained_stpcg_equality_constraints(rng):
    """STPCG with the `At` constraint operator (reference
    IterativeSolvers.h:166-450 constrained variant): minimizes the quadratic
    model over ker(A) and matches the KKT closed form when the trust region
    is inactive; iterates stay feasible."""
    from dpgo_tpu.solvers.tnt import TNTParams, stpcg

    n, m = 12, 3
    H = rng.normal(size=(n, n))
    H = H @ H.T + n * np.eye(n)          # SPD
    A = rng.normal(size=(m, n))
    g = rng.normal(size=(n,))
    Hj = jnp.asarray(H)
    Aj = jnp.asarray(A)

    # Constraint preconditioner: solve [[I, A^T], [A, 0]] [v; lam] = [r; 0].
    K = np.block([[np.eye(n), A.T], [A, np.zeros((m, m))]])
    Kinv = jnp.asarray(np.linalg.inv(K))

    def precon(r):
        sol = Kinv @ jnp.concatenate([r, jnp.zeros(m)])
        return sol[:n], sol[n:]

    At_op = lambda lam: Aj.T @ lam

    params = TNTParams(max_tCG_iterations=200, kappa_fgr=1e-10, theta=1.0)
    s, Hs, s_norm, k = stpcg(jnp.asarray(g), lambda v: Hj @ v, precon,
                             jnp.asarray(1e6), params, At=At_op)
    s = np.asarray(s)
    # Feasible: A s = 0.
    np.testing.assert_allclose(A @ s, 0.0, atol=1e-8)
    # Matches the KKT solution of min 1/2 s'Hs + g's  s.t.  A s = 0.
    KKT = np.block([[H, A.T], [A, np.zeros((m, m))]])
    sol = np.linalg.solve(KKT, np.concatenate([-g, np.zeros(m)]))
    np.testing.assert_allclose(s, sol[:n], atol=1e-6)
    # H @ s byproduct is consistent.
    np.testing.assert_allclose(np.asarray(Hs), H @ s, atol=1e-6)
