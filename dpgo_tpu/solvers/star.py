"""AMM-PGO* — Nesterov-accelerated MM with master-node aggregation.

Reproduces the reference DPGOStar (C++/DPGO/src/DPGOStar.cpp): per-node
accelerated proximal/TNT steps plus a *master* sequence F that gates global
fallbacks using the TRUE global objective:

  1. all nodes: amm step -> candidates Xkh (proximal) and Xkp (refined)
  2. if F(Xkh) insufficient vs F - psi |Xkh - Xk|^2: redo proximal without
     extrapolation (pm step)
  3. if F(Xkp) insufficient: fall back to MM steps from the Xkh rotations and
     halve the Nesterov parameter
  4. phi-test selects between the refined and proximal translations
  5. F <- (1 - eta0) F + eta0 F(Xkp)    (DPGOStar.cpp:126-213)

There is no physical master: the global objective is an edge-sum over the
gathered candidate state (on a mesh this is a psum of per-shard pieces). All
master decisions are scalars, so the fallback passes run under real
`lax.cond`s — no wasted compute when no fallback triggers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from dpgo_tpu.manifold import proj_tangent
from dpgo_tpu.problem import NodeProblem, NodeState
from dpgo_tpu.solvers.mm import (MMOptions, _eval_G_batch, _masked_tnt,
                                 resolve_preconditioner)


class StarState(NamedTuple):
    """Per-node state (leading node axis) + scalar master reference F."""

    Z: NodeState
    Z_prev: NodeState
    g_t: jnp.ndarray
    g_R: jnp.ndarray
    f: jnp.ndarray
    fobj: jnp.ndarray
    Df_t: jnp.ndarray
    Df_R: jnp.ndarray
    g_t_prev: jnp.ndarray
    g_R_prev: jnp.ndarray
    Df_t_prev: jnp.ndarray
    Df_R_prev: jnp.ndarray
    gradFnorm: jnp.ndarray
    s: jnp.ndarray
    s_next: jnp.ndarray
    gamma: jnp.ndarray
    F: jnp.ndarray  # scalar master reference
    # Anchor residual halves at Z, cached by update_star (see mm.MMState).
    z_rt: jnp.ndarray
    z_rR: jnp.ndarray
    z_us: jnp.ndarray
    z_Es: jnp.ndarray


def init_star_state(probs: NodeProblem, Z: NodeState,
                    global_f) -> StarState:
    N = Z.t.shape[0]
    d = Z.t.shape[-1]
    zeros = jnp.zeros((N,), Z.t.dtype)
    return StarState(
        z_rt=jnp.zeros(probs.a_i.shape + (d,), Z.t.dtype),
        z_rR=jnp.zeros(probs.a_i.shape + (d, d), Z.t.dtype),
        z_us=jnp.zeros(probs.e_self.shape + (d,), Z.t.dtype),
        z_Es=jnp.zeros(probs.e_self.shape + (d, d), Z.t.dtype),
        Z=Z, Z_prev=Z,
        g_t=jnp.zeros_like(Z.t), g_R=jnp.zeros_like(Z.R),
        f=zeros, fobj=zeros,
        Df_t=jnp.zeros_like(Z.t), Df_R=jnp.zeros_like(Z.R),
        g_t_prev=jnp.zeros_like(Z.t), g_R_prev=jnp.zeros_like(Z.R),
        Df_t_prev=jnp.zeros_like(Z.t), Df_R_prev=jnp.zeros_like(Z.R),
        gradFnorm=zeros,
        s=jnp.ones((N,), Z.t.dtype), s_next=jnp.ones((N,), Z.t.dtype),
        gamma=zeros, F=jnp.asarray(global_f, Z.t.dtype),
    )


def update_star(probs: NodeProblem, st: StarState, opts: MMOptions,
                first: bool) -> StarState:
    """DPGOStar::update_n — direct (non-telescoped) surrogate anchors +
    Nesterov gamma (DPGOStar.cpp:309-391)."""

    def per_node(p: NodeProblem, Z: NodeState):
        g, f, fobj, zres = p.surrogate_g_f_fobj_res(Z)
        Df = p.euclidean_Df(Z, g=g)
        grad_t, grad_R = Df[0], proj_tangent(Z.R, Df[1])
        gradnorm = jnp.sqrt(jnp.sum(grad_t * grad_t)
                            + jnp.sum(grad_R * grad_R))
        return g[0], g[1], f, fobj, Df[0], Df[1], gradnorm, zres

    g_t, g_R, f, fobj, Df_t, Df_R, gradFnorm, zres = jax.vmap(per_node)(
        probs, st.Z)

    if opts.accelerated:
        s0 = st.s if first else st.s_next
        s1 = 0.5 + 0.5 * jnp.sqrt(4.0 * s0 * s0 + 1.0)
        gamma = (s0 - 1.0) / s1
    else:
        s0, s1, gamma = st.s, st.s_next, st.gamma

    return st._replace(
        g_t=g_t, g_R=g_R, f=f, fobj=fobj, Df_t=Df_t, Df_R=Df_R,
        g_t_prev=st.g_t if not first else g_t,
        g_R_prev=st.g_R if not first else g_R,
        Df_t_prev=st.Df_t if not first else Df_t,
        Df_R_prev=st.Df_R if not first else Df_R,
        gradFnorm=gradFnorm, s=s0, s_next=s1, gamma=gamma,
        z_rt=zres[0][0], z_rR=zres[0][1], z_us=zres[1][0], z_Es=zres[1][1])


def iterate_star(probs: NodeProblem, st: StarState, opts: MMOptions,
                 global_f_fn, k) -> StarState:
    """One master iteration (DPGOStar::iterate, DPGOStar.cpp:126-213).

    global_f_fn(t_own [N, n0, d], R_own [N, n0, d, d]) -> scalar exact global
    objective of the stacked candidate states.
    """
    gamma = st.gamma

    def extrap(cur, prev):
        g = gamma.reshape((-1,) + (1,) * (cur.ndim - 1))
        return cur + g * (cur - prev)

    from dpgo_tpu.losses import Loss
    Y = jax.tree.map(extrap, st.Z, st.Z_prev)
    if probs.loss is Loss.TRIVIAL:
        g_t_ex = extrap(st.g_t, st.g_t_prev)
        g_R_ex = extrap(st.g_R, st.g_R_prev)
        Df_t_ex = extrap(st.Df_t, st.Df_t_prev)
        Df_R_ex = extrap(st.Df_R, st.Df_R_prev)
    else:
        def reeval(p, Yn):
            g, _ = p.surrogate_g_f(Yn)
            Df = p.euclidean_Df(Yn, g=g)
            return g[0], g[1], Df[0], Df[1]

        g_t_ex, g_R_ex, Df_t_ex, Df_R_ex = jax.vmap(reeval)(probs, Y)

    refined = ((st.gradFnorm * st.gradFnorm / st.fobj) > opts.accepted_delta)
    if opts.tnt.max_iterations <= 0 or opts.tnt.max_iterations_accepted <= 0:
        refined = jnp.zeros_like(refined)

    prox = jax.vmap(lambda p, z, dt, dR: p.proximal(z, (dt, dR)))
    recov = jax.vmap(lambda p, R, gt, ta: p.recover_translations(R, gt, ta))

    zres = ((st.z_rt, st.z_rR), (st.z_us, st.z_Es))

    # amm_pgo_n: proximal candidate Xkh + refined candidate Xkp.
    Xh_t, Xh_R = prox(probs, Y, Df_t_ex, Df_R_ex)
    tp = recov(probs, Xh_R, g_t_ex, Y.t)
    G0 = _eval_G_batch(probs, st, tp, Xh_R, zres)
    precon_kind = resolve_preconditioner(probs, opts)
    Xp_t, Xp_R, _ = _masked_tnt(probs, tp, Xh_R, g_t_ex, g_R_ex, st.f,
                                refined, opts.tnt, G0, t_anchor=Y.t,
                                precon=precon_kind,
                                anchor=(st.Z.t, st.Z.R, st.fobj))

    def sqdiff(at, aR, bt, bR):
        return (jnp.sum((at - bt) ** 2) + jnp.sum((aR - bR) ** 2))

    # Master test 1: proximal candidates (psi-test on the true objective).
    fobjh = global_f_fn(Xh_t, Xh_R)

    def pm_fallback(args):
        Xh_t, Xh_R, fobjh = args
        t2, R2 = prox(probs, st.Z, st.Df_t, st.Df_R)
        return t2, R2, global_f_fn(t2, R2)

    bad_h = fobjh > st.F - opts.psi * sqdiff(Xh_t, Xh_R, st.Z.t, st.Z.R)
    Xh_t, Xh_R, fobjh = lax.cond(bad_h, pm_fallback,
                                 lambda a: a, (Xh_t, Xh_R, fobjh))

    # Master test 2: refined candidates; fall back to MM from Xkh rotations
    # with Nesterov shrink.
    fobj = global_f_fn(Xp_t, Xp_R)

    def mm_fallback(args):
        Xp_t, Xp_R, fobj, s_next = args
        t2 = recov(probs, Xh_R, st.g_t, st.Z.t)
        G2 = _eval_G_batch(probs, st, t2, Xh_R, zres)
        t3, R3, _ = _masked_tnt(probs, t2, Xh_R, st.g_t, st.g_R, st.f,
                                refined, opts.tnt, G2, t_anchor=st.Z.t,
                                precon=precon_kind,
                                anchor=(st.Z.t, st.Z.R, st.fobj))
        return (t3, R3, global_f_fn(t3, R3),
                jnp.maximum(0.5 * s_next, 1.0))

    bad_p = fobj > st.F - opts.psi * sqdiff(Xp_t, Xp_R, st.Z.t, st.Z.R)
    Xp_t, Xp_R, fobj, s_next = lax.cond(
        bad_p, mm_fallback, lambda a: a, (Xp_t, Xp_R, fobj, st.s_next))

    # phi-test: adopt the proximal rotations + re-solved translations.
    def phi_select(args):
        Xp_t, Xp_R, fobj = args
        t2 = recov(probs, Xh_R, st.g_t, st.Z.t)
        return t2, Xh_R, global_f_fn(t2, Xh_R)

    take_h = (st.F - fobj) < opts.phi * (st.F - fobjh)
    Xp_t, Xp_R, fobj = lax.cond(take_h, phi_select, lambda a: a,
                                (Xp_t, Xp_R, fobj))

    F_new = st.F * (1 - opts.eta0) + fobj * opts.eta0
    Z_new = NodeState(t=Xp_t, R=Xp_R, th=st.Z.th, Rh=st.Z.Rh)
    return st._replace(Z=Z_new, Z_prev=st.Z, s_next=s_next, F=F_new)
