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
         atol: float = 1e-8, damp: float = 0.0):
    """Golub-Kahan bidiagonalization least squares. A/At are pytree->pytree
    linear operators; returns the LS solution estimate."""

    class S(NamedTuple):
        x: object
        u: object
        v: object
        w: object
        alpha: jnp.ndarray
        beta: jnp.ndarray
        rhobar: jnp.ndarray
        phibar: jnp.ndarray
        k: jnp.ndarray
        done: jnp.ndarray

    beta0 = jnp.sqrt(_ip(b, b))
    u0 = jax.tree.map(lambda t: t / jnp.maximum(beta0, 1e-30), b)
    Atu = At(u0)
    alpha0 = jnp.sqrt(_ip(Atu, Atu))
    v0 = jax.tree.map(lambda t: t / jnp.maximum(alpha0, 1e-30), Atu)
    x0 = jax.tree.map(jnp.zeros_like, x_shape_like)

    init = S(x=x0, u=u0, v=v0, w=v0, alpha=alpha0, beta=beta0,
             rhobar=alpha0, phibar=beta0, k=jnp.zeros((), jnp.int32),
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
        done = jnp.abs(phibar) <= atol * beta0
        return S(x=x_new, u=u_next, v=v_next, w=w_new, alpha=alpha,
                 beta=beta, rhobar=rhobar, phibar=phibar, k=st.k + 1,
                 done=done)

    out = lax.while_loop(lambda s: (~s.done) & (s.k < max_iters), body, init)
    return out.x


def tnls_step(jacobian: Callable, jacobian_T: Callable, residual,
              x_like, max_iters: int = 100, damp: float = 0.0):
    """One truncated-Newton least-squares step: solve min |J h + r| for the
    update h (the inner solve of the reference TNLS.h)."""
    neg_r = jax.tree.map(lambda t: -t, residual)
    return lsqr(jacobian, jacobian_T, neg_r, x_like, max_iters=max_iters,
                damp=damp)


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
