"""Generic optimization-library components.

JAX re-implementations of the remaining solvers in the reference's
header-only Optimization library (C++/Optimization/include/Optimization):

- `gradient_descent`   — Riemannian gradient descent with Armijo
                         backtracking (Riemannian/GradientDescent.h); used by
                         the reference's SE-Sync saddle escape
- `lsqr` / `tnls_step` — LSQR least-squares Krylov solver and the
                         truncated-Newton least-squares step built on it
                         (Riemannian/TNLS.h, LinearAlgebra lsqr)
- `admm`               — scaled-dual ADMM for min f(x) + g(z)
                         s.t. A x + B z = c (Convex/ADMM.h)
- `proximal_gradient`  — (accelerated) proximal gradient / FISTA
                         (Convex/ProximalGradient.h)

All functions are pytree-generic and jit/vmap-friendly (fixed iteration
bounds with masked early-exit).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _ip(a, b):
    return sum(jnp.sum(x * y) for x, y in
               zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def _axpy(alpha, x, y):
    return jax.tree.map(lambda a, b: b + alpha * a, x, y)


# ---------------------------------------------------------------------------
# Riemannian gradient descent with backtracking Armijo line search.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GDParams:
    max_iterations: int = 100
    gradient_tolerance: float = 1e-6
    alpha0: float = 1.0
    shrink: float = 0.5
    sigma: float = 1e-4          # Armijo sufficient-decrease constant
    max_ls_iters: int = 20


def gradient_descent(objective: Callable, riemannian_grad: Callable,
                     retract: Callable, x0, params: GDParams = GDParams()):
    """Returns (x, fx, gradnorm, iters)."""

    class S(NamedTuple):
        x: object
        fx: jnp.ndarray
        k: jnp.ndarray
        done: jnp.ndarray

    def body(st: S):
        g = riemannian_grad(st.x)
        gn2 = _ip(g, g)
        done_g = jnp.sqrt(gn2) < params.gradient_tolerance

        def ls_body(c):
            alpha, _, _ = c
            xc = retract(st.x, jax.tree.map(lambda v: -alpha * v, g))
            fc = objective(xc)
            ok = fc <= st.fx - params.sigma * alpha * gn2
            return alpha * params.shrink, fc, ok

        # Fixed-trip backtracking: scan alphas, pick the first acceptable.
        alphas = params.alpha0 * params.shrink ** jnp.arange(
            params.max_ls_iters, dtype=st.fx.dtype)

        def eval_alpha(alpha):
            xc = retract(st.x, jax.tree.map(lambda v: -alpha * v, g))
            fc = objective(xc)
            return fc, fc <= st.fx - params.sigma * alpha * gn2

        fcs, oks = jax.vmap(eval_alpha)(alphas)
        first = jnp.argmax(oks)  # 0 if none ok -> guarded below
        any_ok = jnp.any(oks)
        alpha_sel = alphas[first]
        x_new = retract(st.x, jax.tree.map(lambda v: -alpha_sel * v, g))
        f_new = fcs[first]
        take = any_ok & (~done_g)
        return S(
            x=jax.tree.map(lambda a, b: jnp.where(take, a, b), x_new, st.x),
            fx=jnp.where(take, f_new, st.fx),
            k=st.k + 1,
            done=done_g | (~any_ok),
        )

    init = S(x=x0, fx=objective(x0), k=jnp.zeros((), jnp.int32),
             done=jnp.zeros((), bool))
    out = lax.while_loop(
        lambda s: (~s.done) & (s.k < params.max_iterations), body, init)
    g = riemannian_grad(out.x)
    return out.x, out.fx, jnp.sqrt(_ip(g, g)), out.k


# ---------------------------------------------------------------------------
# LSQR (Paige & Saunders) for min |A x - b| with linear operators.
# ---------------------------------------------------------------------------


def lsqr(A: Callable, At: Callable, b, x_shape_like, max_iters: int = 100,
         atol: float = 1e-8, damp: float = 0.0, btol: float = None,
         Delta: float = None, return_info: bool = False):
    """Golub-Kahan bidiagonalization least squares for min |A x - b|
    (+ optional Tikhonov damping `damp` and trust-region radius `Delta`).
    A/At are pytree->pytree linear operators.

    Stopping mirrors the reference LSQR (IterativeSolvers.h:458-563):
      S1: |rbar| <= btol |b| + atol |A| |x|   (consistent systems)
      S2: |A' rbar| <= atol |A| |rbar|        (inconsistent systems)
    plus the trust region: LSQR's iterate norm increases monotonically, so
    the first step crossing |x| = Delta is truncated to the boundary and
    the solve stops (the Steihaug-Toint rule for least squares).

    Returns x, or (x, xnorm, iters) when return_info=True."""

    class S(NamedTuple):
        x: object
        u: object
        v: object
        w: object
        alpha: jnp.ndarray
        beta: jnp.ndarray
        rhobar: jnp.ndarray
        phibar: jnp.ndarray
        normA2: jnp.ndarray   # running |A|_F^2 estimate
        xnorm: jnp.ndarray
        k: jnp.ndarray
        done: jnp.ndarray

    beta0 = jnp.sqrt(_ip(b, b))
    u0 = jax.tree.map(lambda t: t / jnp.maximum(beta0, 1e-30), b)
    Atu = At(u0)
    alpha0 = jnp.sqrt(_ip(Atu, Atu))
    v0 = jax.tree.map(lambda t: t / jnp.maximum(alpha0, 1e-30), Atu)
    x0 = jax.tree.map(jnp.zeros_like, x_shape_like)
    btol_v = atol if btol is None else btol

    init = S(x=x0, u=u0, v=v0, w=v0, alpha=alpha0, beta=beta0,
             rhobar=alpha0, phibar=beta0, normA2=alpha0 * alpha0,
             xnorm=jnp.zeros_like(beta0), k=jnp.zeros((), jnp.int32),
             done=(alpha0 * beta0) == 0)

    def body(st: S):
        Av = A(st.v)
        u_next = _axpy(-st.alpha, st.u, Av)
        beta = jnp.sqrt(_ip(u_next, u_next))
        u_next = jax.tree.map(lambda t: t / jnp.maximum(beta, 1e-30), u_next)
        Atu = At(u_next)
        v_next = _axpy(-beta, st.v, Atu)
        alpha = jnp.sqrt(_ip(v_next, v_next))
        v_next = jax.tree.map(lambda t: t / jnp.maximum(alpha, 1e-30),
                              v_next)
        # Damped rotation (regularization), then the standard Givens update.
        if damp > 0:
            rhobar1 = jnp.sqrt(st.rhobar ** 2 + damp ** 2)
            phibar1 = st.phibar * (st.rhobar / rhobar1)
        else:
            rhobar1 = st.rhobar
            phibar1 = st.phibar
        rho = jnp.sqrt(rhobar1 ** 2 + beta ** 2)
        c = rhobar1 / rho
        s = beta / rho
        theta = s * alpha
        rhobar = -c * alpha
        phi = c * phibar1
        phibar = s * phibar1
        x_new = _axpy(phi / rho, st.w, st.x)
        w_new = _axpy(-theta / rho, st.w, v_next)
        normA2 = st.normA2 + beta * beta + alpha * alpha + damp * damp
        normA = jnp.sqrt(normA2)
        xnorm = jnp.sqrt(_ip(x_new, x_new))
        if Delta is not None:
            # Trust region: truncate the step to the |x| = Delta boundary
            # (xnorm is nondecreasing in LSQR, so crossing is final).
            crossed = xnorm > Delta
            # |x_old + sigma dx| = Delta along dx = (phi/rho) w.
            dx = jax.tree.map(lambda t: (phi / rho) * t, st.w)
            a2 = _ip(dx, dx)
            ab = _ip(st.x, dx)
            c2 = _ip(st.x, st.x) - Delta * Delta
            disc = jnp.sqrt(jnp.maximum(ab * ab - a2 * c2, 0.0))
            sigma = (-ab + disc) / jnp.maximum(a2, 1e-30)
            x_bnd = _axpy(sigma, dx, st.x)
            x_new = jax.tree.map(
                lambda xb, xn: jnp.where(crossed, xb, xn), x_bnd, x_new)
            xnorm = jnp.where(crossed, Delta, xnorm)
        else:
            crossed = jnp.zeros((), bool)
        # |A' rbar| estimate = phibar * alpha * |c| (Paige & Saunders S2).
        s1 = jnp.abs(phibar) <= btol_v * beta0 + atol * normA * xnorm
        s2 = phibar * alpha * jnp.abs(c) <= atol * normA * \
            jnp.maximum(jnp.abs(phibar), 1e-30)
        done = s1 | s2 | crossed
        return S(x=x_new, u=u_next, v=v_next, w=w_new, alpha=alpha,
                 beta=beta, rhobar=rhobar, phibar=phibar, normA2=normA2,
                 xnorm=xnorm, k=st.k + 1, done=done)

    out = lax.while_loop(lambda s: (~s.done) & (s.k < max_iters), body, init)
    if return_info:
        return out.x, out.xnorm, out.k
    return out.x


def tnls_step(jacobian: Callable, jacobian_T: Callable, residual,
              x_like, max_iters: int = 100, damp: float = 0.0):
    """One truncated-Newton least-squares step: solve min |J h + r| for the
    update h (the inner solve of tnls below)."""
    neg_r = jax.tree.map(lambda t: -t, residual)
    return lsqr(jacobian, jacobian_T, neg_r, x_like, max_iters=max_iters,
                damp=damp)


# ---------------------------------------------------------------------------
# Riemannian truncated-Newton least squares (TNLS).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TNLSParams:
    """Mirrors the reference TNLSParams (Riemannian/TNLS.h:105-180):
    trust-region control identical to TNT's, inner solver LSQR with the
    Dembo-Eisenstat-Steihaug forcing sequence
    eta_k = min(|F(x)|^theta, kappa_fgr)."""

    max_iterations: int = 100
    max_lsqr_iterations: int = 100
    root_tolerance: float = 1e-9
    gradient_tolerance: float = 1e-8
    relative_decrease_tolerance: float = 1e-12
    stepsize_tolerance: float = 1e-10
    Delta_tolerance: float = 1e-10
    Delta0: float = 1.0
    eta1: float = 0.05
    eta2: float = 0.9
    alpha1: float = 0.25
    alpha2: float = 2.5
    kappa_fgr: float = 0.1
    theta: float = 0.5
    lam: float = 0.0       # Tikhonov damping of the LSQR subproblem
    atol: float = 1e-10    # LSQR relative stopping tolerance


def tnls(F: Callable, jacobian: Callable, jacobian_T: Callable,
         retract: Callable, x0, params: TNLSParams = TNLSParams()):
    """Riemannian truncated-Newton least squares: min_x L(x) = |F(x)| over
    a manifold, F mapping into a Euclidean space (the reference's full
    Riemannian::TNLS, TNLS.h:244-700 — trust-region outer loop, LSQR
    trust-region subproblem min_h |J_x h + F(x)| s.t. |h| <= Delta with
    the eta_k forcing term, gain ratio rho = (|F|^2 - |F(x+)|^2) /
    (|F|^2 - |J h + F|^2), TNT-style radius control).

    F(x) -> residual pytree; jacobian(x, v) -> J_x v;
    jacobian_T(x, w) -> J_x' w (must return a TANGENT at x);
    retract(x, h) -> new point.

    Returns (x, Fx_norm, grad_norm, iters)."""

    class S(NamedTuple):
        x: object
        Fx: object
        Fx2: jnp.ndarray
        Delta: jnp.ndarray
        k: jnp.ndarray
        done: jnp.ndarray

    Fx0 = F(x0)
    Fx2_0 = _ip(Fx0, Fx0)
    init = S(x=x0, Fx=Fx0, Fx2=Fx2_0,
             Delta=jnp.asarray(params.Delta0, Fx2_0.dtype),
             k=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool))
    sqrt_eps = float(np.sqrt(jnp.finfo(Fx2_0.dtype).eps))

    def body(st: S):
        Fnorm = jnp.sqrt(st.Fx2)
        gradL = jacobian_T(st.x, st.Fx)
        gradL = jax.tree.map(lambda t: t / jnp.maximum(Fnorm, 1e-30), gradL)
        gn = jnp.sqrt(_ip(gradL, gradL))
        stop = (Fnorm < params.root_tolerance) | \
               (gn < params.gradient_tolerance)

        # Inner subproblem: min_h |J h + Fx|, |h| <= Delta, forcing
        # btol = eta_k = min(|F|^theta, kappa_fgr) (Dembo et al.).
        etak = jnp.minimum(Fnorm ** params.theta, params.kappa_fgr)
        neg_F = jax.tree.map(jnp.negative, st.Fx)
        h = lsqr(lambda v: jacobian(st.x, v),
                 lambda w: jacobian_T(st.x, w), neg_F, gradL,
                 max_iters=params.max_lsqr_iterations, atol=params.atol,
                 btol=etak, damp=params.lam, Delta=st.Delta)
        h_norm = jnp.sqrt(_ip(h, h))

        x_prop = retract(st.x, h)
        Fp = F(x_prop)
        Fp2 = _ip(Fp, Fp)
        # Linearized residual r = J h + Fx; gain ratio on SQUARED norms.
        r = _axpy(1.0, jacobian(st.x, h), st.Fx)
        dq = st.Fx2 - _ip(r, r)
        rho = (st.Fx2 - Fp2) / dq
        accept = jnp.isfinite(rho) & (rho > params.eta1)

        rel_dec = (Fnorm - jnp.sqrt(Fp2)) / (sqrt_eps + Fnorm)
        done_next = accept & (
            (rel_dec < params.relative_decrease_tolerance)
            | (h_norm < params.stepsize_tolerance))

        Delta_new = jnp.where(
            jnp.isfinite(rho) & (rho >= params.eta2),
            jnp.maximum(params.alpha2 * h_norm, st.Delta),
            jnp.where(jnp.isfinite(rho) & (rho > params.eta1), st.Delta,
                      params.alpha1 * h_norm))
        done_next = done_next | (Delta_new < params.Delta_tolerance)

        x_new = jax.tree.map(lambda a, b: jnp.where(accept, a, b),
                             x_prop, st.x)
        Fx_new = jax.tree.map(lambda a, b: jnp.where(accept, a, b),
                              Fp, st.Fx)
        return S(x=jax.tree.map(
                     lambda a, b: jnp.where(stop, b, a), x_new, st.x),
                 Fx=jax.tree.map(
                     lambda a, b: jnp.where(stop, b, a), Fx_new, st.Fx),
                 Fx2=jnp.where(stop, st.Fx2,
                               jnp.where(accept, Fp2, st.Fx2)),
                 Delta=jnp.where(stop, st.Delta, Delta_new),
                 k=st.k + 1, done=stop | done_next)

    out = lax.while_loop(
        lambda s: (~s.done) & (s.k < params.max_iterations), body, init)
    Fnorm = jnp.sqrt(out.Fx2)
    gradL = jacobian_T(out.x, out.Fx)
    gradL = jax.tree.map(lambda t: t / jnp.maximum(Fnorm, 1e-30), gradL)
    return out.x, Fnorm, jnp.sqrt(_ip(gradL, gradL)), out.k


# ---------------------------------------------------------------------------
# ADMM (scaled dual) for min f(x) + g(z) s.t. A x + B z = c.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ADMMParams:
    rho: float = 1.0
    max_iterations: int = 200
    eps_primal: float = 1e-6
    eps_dual: float = 1e-6


def admm(prox_f: Callable, prox_g: Callable, A: Callable, B: Callable,
         c, x0, z0, params: ADMMParams = ADMMParams()):
    """Generic ADMM (Convex/ADMM.h).

    prox_f(v, rho): argmin_x f(x) + rho/2 |A x + v|^2
    prox_g(v, rho): argmin_z g(z) + rho/2 |B z + v|^2
    Returns (x, z, u, iters). u is the scaled dual variable.
    """
    rho = params.rho

    class S(NamedTuple):
        x: object
        z: object
        u: object
        k: jnp.ndarray
        done: jnp.ndarray

    u0 = jax.tree.map(jnp.zeros_like, c)
    init = S(x=x0, z=z0, u=u0, k=jnp.zeros((), jnp.int32),
             done=jnp.zeros((), bool))

    def body(st: S):
        neg_c = jax.tree.map(lambda t: -t, c)
        vx = jax.tree.map(lambda bz, cc, uu: bz - cc + uu, B(st.z), c, st.u)
        x_new = prox_f(vx, rho)
        vz = jax.tree.map(lambda ax, cc, uu: ax - cc + uu, A(x_new), c,
                          st.u)
        z_new = prox_g(vz, rho)
        r = jax.tree.map(lambda ax, bz, cc: ax + bz - cc, A(x_new),
                         B(z_new), c)
        u_new = jax.tree.map(lambda uu, rr: uu + rr, st.u, r)
        sdiff = jax.tree.map(lambda a, b: a - b, B(z_new), B(st.z))
        done = (jnp.sqrt(_ip(r, r)) < params.eps_primal) & \
               (rho * jnp.sqrt(_ip(sdiff, sdiff)) < params.eps_dual)
        return S(x=x_new, z=z_new, u=u_new, k=st.k + 1, done=done)

    out = lax.while_loop(lambda s: (~s.done)
                         & (s.k < params.max_iterations), body, init)
    return out.x, out.z, out.u, out.k


# ---------------------------------------------------------------------------
# (Accelerated) proximal gradient / FISTA.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PGParams:
    step: float = 1.0             # 1/L
    max_iterations: int = 500
    accelerated: bool = True
    tol: float = 1e-10


def proximal_gradient(grad_f: Callable, prox_g: Callable, x0,
                      params: PGParams = PGParams()):
    """min f(x) + g(x): x <- prox_g(x - step grad_f(x), step), with Nesterov
    acceleration (Convex/ProximalGradient.h). Returns (x, iters)."""

    class S(NamedTuple):
        x: object
        y: object
        t: jnp.ndarray
        k: jnp.ndarray
        done: jnp.ndarray

    init = S(x=x0, y=x0, t=jnp.ones(()), k=jnp.zeros((), jnp.int32),
             done=jnp.zeros((), bool))
    step = params.step

    def body(st: S):
        g = grad_f(st.y)
        x_new = prox_g(_axpy(-step, g, st.y), step)
        if params.accelerated:
            t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * st.t ** 2))
            beta = (st.t - 1.0) / t_new
            y_new = jax.tree.map(lambda xn, xo: xn + beta * (xn - xo),
                                 x_new, st.x)
        else:
            t_new = st.t
            y_new = x_new
        diff = jax.tree.map(lambda a, b: a - b, x_new, st.x)
        done = jnp.sqrt(_ip(diff, diff)) < params.tol
        return S(x=x_new, y=y_new, t=t_new, k=st.k + 1, done=done)

    out = lax.while_loop(lambda s: (~s.done)
                         & (s.k < params.max_iterations), body, init)
    return out.x, out.k
