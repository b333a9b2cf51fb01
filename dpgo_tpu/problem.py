"""Per-node MM surrogate problem: edge-wise operators, no sparse matrices.

TPU-native re-derivation of the reference's DPGOProblem
(C++/DPGO/include/DPGO/DPGOProblem.h, src/DPGOProblem.cpp) and the surrogate
matrices of simplify_quadratic_data_matrix (C++/DPGO/src/DPGO_utils.cpp:1398-
2289). All reference sparse matrices are replaced by edge-wise gather ->
batched einsum -> scatter-add operators over flat pose/edge arrays.

Notation (see ARCHITECTURE.md): per inter-node edge e the residual splits as
r_e = A_self x_self + A_other x_other. The per-node surrogate around anchor Z:

    G^a(X|Z) = 1/2 <G X, X> + <g, X> + f
    <G X, X> = sum_intra |r_e(X)|^2 + 2 sum_inter |A_self x_self|^2 + xi |X|^2
    g        = sum_inter A_self^T (A_other z_other - A_self z_self) - xi z_a
    f        = 1/4 sum_inter |A_self z_self - A_other z_other|^2
               + xi/2 |z_a|^2

Rotations are stored as true rotation matrices [n, d, d]; the reference stores
transposed blocks in a tall matrix, under which per-pose quadratic blocks act
by left-multiplication — here they act by *right*-multiplication (tr(Q^T S Q)
= tr(R S R^T)).

The auxiliary (proximal) surrogate H^a decouples poses:
    H_tt = diag(DiagT),  H_tR R = R_p nvec_p,   H_RR R = R_p S_p,
with DiagT_p = 2 sum_{e inc p} tau_e + 1.5 xi,
nvec_p = sum_{e: tail p} 2 tau_e t~_e,
S_p = 2 sum_{e inc p} kappa_e I + 2 sum_{e: tail p} tau_e t~ t~^T + 1.5 xi I.
Eliminating t and using that <W R, R> is constant on SO(d)^n for block
W = S - T nvec nvec^T yields the *linear* rotation subproblem solved by one
batched SO(d) projection (reference DPGOProblem::proximal,
DPGOProblem.cpp:600-632).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dpgo_tpu.graph import MultiGraph
from dpgo_tpu.losses import Loss, loss_value, loss_weight
from dpgo_tpu.manifold import proj_tangent, project_sod, sym_block_diag_product


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NodeState:
    """Own + halo pose state of one node (leading axes may be batched)."""

    t: jnp.ndarray    # [n0, d] own translations
    R: jnp.ndarray    # [n0, d, d] own rotations
    th: jnp.ndarray   # [n1, d] halo translations
    Rh: jnp.ndarray   # [n1, d, d] halo rotations

    def own(self):
        return self.t, self.R

    def with_own(self, t, R) -> "NodeState":
        return NodeState(t=t, R=R, th=self.th, Rh=self.Rh)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NodeProblem:
    """Precomputed per-node problem data (one node; vmap over a stack)."""

    # Static metadata.
    d: int = dataclasses.field(metadata=dict(static=True))
    xi: float = dataclasses.field(metadata=dict(static=True))
    loss: Loss = dataclasses.field(metadata=dict(static=True))
    loss_reg: float = dataclasses.field(metadata=dict(static=True))

    # Pose-level arrays.
    pose_mask: jnp.ndarray   # [n0] bool
    diagT_inv: jnp.ndarray   # [n0] T = 1/DiagT
    nvec: jnp.ndarray        # [n0, d]
    W: jnp.ndarray           # [n0, d, d] aux rotation blocks (right-mult)
    # Split inverse of the translation block mG00 = L + xi I: a bounded-entry
    # reduced inverse over the non-null eigenspace plus an explicit rank-k
    # null-space response. mG00^{-1} rhs = Minv_red rhs
    #                                      + null_V (null_V^T rhs) / xi.
    # (The xi-regularized Laplacian is near-singular for nodes without inter
    # edges; a plain dense inverse has O(1/xi) entries whose rounding poisons
    # every translation solve. The reference leans on CHOLMOD for the same
    # system, DPGOProblem.cpp:93.)
    Minv_red: jnp.ndarray    # [n0, n0]
    null_V: jnp.ndarray      # [n0, kmax] (zero-padded columns)
    precon_inv: jnp.ndarray  # [n0, d, d] block-Jacobi preconditioner blocks

    # Dense operator images for the TNT hot loop (MXU path). On TPU, chains
    # of gather -> small-einsum -> scatter-add serialize badly; per-node
    # systems are small (n0 d <= a few thousand), so the G blocks are
    # materialized as dense matrices applied by single matmuls in tall
    # Q-storage (Q = R^T blocks stacked, [n0 d, d]).  mG10 = mG01^T.
    dense: bool = dataclasses.field(metadata=dict(static=True))
    mG00_d: jnp.ndarray      # [n0, n0]
    mG01_d: jnp.ndarray      # [n0, n0 d]
    mG11_d: jnp.ndarray      # [n0 d, n0 d]
    # Reduced (t-eliminated) rotation operator, materialized once:
    # Hred = mG11 - mG10 mG00^{-1} mG01 (the exact Hessian of the reduced
    # surrogate Q -> min_t G; the null response of mG00^{-1} is dropped
    # because null_V^T mG01 = 0 exactly — intra columns telescope and
    # null components only exist on blocks without inter edges). Collapses
    # the STPCG Hessian-vector product from four matmuls + a solve
    # (the reference's per-CG-iteration chain, DPGOProblem.cpp:552-577)
    # to ONE batched MXU matmul.
    Hred_d: jnp.ndarray        # [n0 d, n0 d] (zeros when not dense)
    # Dense regularized preconditioner (Hred + (lambda_max/cond) I)^{-1}:
    # the role of the reference's RegularizedCholesky CHOLMOD factor
    # (DPGOProblem.cpp:96-124) — but of the full reduced Hessian rather
    # than the reference's mG11-only block, so STPCG converges in O(1)
    # iterations (only the point-dependent curvature term and the tangent
    # projection are left unpreconditioned).
    precon_dense: jnp.ndarray  # [n0 d, n0 d] (zeros when not dense)
    # Block panels of Hred / precon_dense for the fused single-kernel
    # Pallas STPCG (ops/pallas_stpcg.py): [d*d, n_pad, n_pad], built only
    # for f32 3-D blocks small enough for both operators to sit in VMEM
    # ([1, 1, 1] placeholders otherwise).
    Hpan: jnp.ndarray
    Ppan: jnp.ndarray
    # One-hot inter-edge scatter operator Asel[p, e] = 1{e_self[e] == p}
    # (valid edges only). On the dense path the per-iteration surrogate
    # scatter-add of inter-edge gradient halves into pose slots runs as
    # ONE MXU matmul Asel @ [dt | dR] instead of a row-serialized TPU
    # scatter (measured on city10000 16-node: the scatter fusion alone was
    # 1.8 ms of a 13.4 ms step). [1, 1] placeholder off the dense path.
    Asel: jnp.ndarray        # [n0, m1]

    # Dynamic rescale (Rescale::Dynamic): persisted per-inter-edge surrogate
    # weights w_bar (DiagReScale in the reference, DPGOProblem.cpp:751-840).
    # The quadratic surrogate's inter contributions scale by w_bar while
    # residual/gradient evaluations keep unit measurement weights; the
    # translation system picks up a diagonal delta handled by preconditioned
    # CG against the base split-inverse (replacing the reference's CHOLMOD
    # refactorization on every rescale).
    dynamic: bool = dataclasses.field(metadata=dict(static=True))
    scale_w: jnp.ndarray     # [m1] in [min_rescale, 1]
    ipose: jnp.ndarray       # [kmax] poses with inter edges (padded with 0)
    imask: jnp.ndarray       # [kmax] bool
    SU: jnp.ndarray          # [n0, kmax] base-inverse columns at ipose
    wood_C: jnp.ndarray      # [kmax, kmax] Woodbury core (set by with_weights)

    # Intra edges.
    a_i: jnp.ndarray
    a_j: jnp.ndarray
    a_R: jnp.ndarray
    a_t: jnp.ndarray
    a_kap: jnp.ndarray
    a_tau: jnp.ndarray

    # Inter edges.
    e_self: jnp.ndarray
    e_slot: jnp.ndarray
    e_self_is_i: jnp.ndarray
    e_R: jnp.ndarray
    e_t: jnp.ndarray
    e_kap: jnp.ndarray
    e_tau: jnp.ndarray

    # Segment path (blocks past the dense/eigen-split feasibility limit,
    # ~2k+ poses per node — the regime the reference hands to CHOLMOD's
    # any-size factorization, DPGOProblem.cpp:93-124). No [n0, n0] arrays
    # are ever materialized: translation solves run preconditioned CG on
    # the edge-wise mG00 matvec with a TWO-LEVEL additive-Schwarz
    # preconditioner (dense factors of mG00's contiguous-segment diagonal
    # blocks + a segment-aggregated Galerkin coarse inverse), and the TNT
    # refinement switches to the coupled (t, R) surrogate model
    # (mm._make_tnt_model_coupled) preconditioned by segment-dense
    # regularized mG11 inverses — all batched MXU matmuls.
    seg: bool = dataclasses.field(metadata=dict(static=True))
    seg_size: int = dataclasses.field(metadata=dict(static=True))
    seg_cg_iters: int = dataclasses.field(metadata=dict(static=True))
    seg_cg_tol: float = dataclasses.field(metadata=dict(static=True))
    seg_t_inv: jnp.ndarray   # [n_seg, S, S] dense mG00 segment inverses
    seg_c_inv: jnp.ndarray   # [n_seg, n_seg] coarse Galerkin inverse
    seg_R_inv: jnp.ndarray   # [n_seg, S d, S d] regularized mG11 inverses
    # BSR image of mG00 for the CG matvec: diagonal [n_seg, S, S] blocks
    # (pre-inversion) + off-diagonal segment-pair blocks with row/col ids.
    # Batched MXU matmuls + a segment-granular scatter replace the
    # edge-wise scatter-add, which TPU serializes row-by-row (~3 ms per
    # pass at 100k-pose scale — the dominant translation-solve cost).
    seg_diag: jnp.ndarray    # [n_seg, S, S]
    seg_blk: jnp.ndarray     # [npair, S, S]
    seg_row: jnp.ndarray     # [npair] int32
    seg_col: jnp.ndarray     # [npair] int32

    # ---------------------------------------------------------------- helpers

    def _n0(self):
        return self.pose_mask.shape[0]

    def intra_residuals(self, t, R):
        """Intra-edge residuals (sqrt-weighted): r_t [m0, d], r_R [m0, d, d]."""
        Ri = R[self.a_i]
        rt = t[self.a_i] + jnp.einsum("eab,eb->ea", Ri, self.a_t) - t[self.a_j]
        rR = jnp.einsum("eab,ebc->eac", Ri, self.a_R) - R[self.a_j]
        return (jnp.sqrt(self.a_tau)[:, None] * rt,
                jnp.sqrt(self.a_kap)[:, None, None] * rR)

    def inter_halves(self, state: NodeState):
        """Per inter-edge (A_self x_self) and (A_other x_other) residual
        halves, each a (u [m1, d], E [m1, d, d]) pair."""
        t, R, th, Rh = state.t, state.R, state.th, state.Rh
        st = jnp.sqrt(self.e_tau)
        sk = jnp.sqrt(self.e_kap)
        sel = self.e_self_is_i[:, None]
        selm = self.e_self_is_i[:, None, None]
        ts = t[self.e_self]
        Rs = R[self.e_self]
        to = th[self.e_slot]
        Ro = Rh[self.e_slot]
        # self = tail(i): u = st (t_s + R_s t~), E = sk R_s R~
        # self = head(j): u = -st t_s,          E = -sk R_s
        u_s = jnp.where(
            sel,
            st[:, None] * (ts + jnp.einsum("eab,eb->ea", Rs, self.e_t)),
            -st[:, None] * ts)
        E_s = jnp.where(
            selm,
            sk[:, None, None] * jnp.einsum("eab,ebc->eac", Rs, self.e_R),
            -sk[:, None, None] * Rs)
        u_o = jnp.where(
            sel,
            -st[:, None] * to,
            st[:, None] * (to + jnp.einsum("eab,eb->ea", Ro, self.e_t)))
        E_o = jnp.where(
            selm,
            -sk[:, None, None] * Ro,
            sk[:, None, None] * jnp.einsum("eab,ebc->eac", Ro, self.e_R))
        return (u_s, E_s), (u_o, E_o)

    def apply_A_self_T(self, u, E):
        """Scatter A_self^T (u, E) into own (t, R) gradient space."""
        st = jnp.sqrt(self.e_tau)
        sk = jnp.sqrt(self.e_kap)
        sel = self.e_self_is_i[:, None]
        selm = self.e_self_is_i[:, None, None]
        # tail: dt = st u ; dR = st u t~^T + sk E R~^T
        # head: dt = -st u ; dR = -sk E
        dt = jnp.where(sel, st[:, None] * u, -st[:, None] * u)
        dR = jnp.where(
            selm,
            st[:, None, None] * u[:, :, None] * self.e_t[:, None, :]
            + sk[:, None, None] * jnp.einsum("eab,ecb->eac", E, self.e_R),
            -sk[:, None, None] * E)
        n0 = self._n0()
        if self.dense and self.Asel.shape[0] == n0:
            # MXU scatter: one [n0, m1] @ [m1, d + d^2] matmul. HIGHEST
            # precision keeps the f32 accumulation at scatter-add quality
            # (the one-hot rows are exact; only summation order differs).
            d = self.d
            m1 = dt.shape[0]
            vals = jnp.concatenate([dt, dR.reshape(m1, d * d)], axis=1)
            out = jax.lax.dot_general(
                self.Asel, vals, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            return out[:, :d], out[:, d:].reshape(n0, d, d)
        g_t = jnp.zeros((n0, self.d), dt.dtype).at[self.e_self].add(dt)
        g_R = jnp.zeros((n0, self.d, self.d), dR.dtype).at[self.e_self].add(dR)
        return g_t, g_R

    def inter_weights(self, state: NodeState):
        """Per inter-edge robust IRLS weights at the anchor state."""
        (u_s, E_s), (u_o, E_o) = self.inter_halves(state)
        u = u_s + u_o
        E = E_s + E_o
        s = jnp.sum(u * u, -1) + jnp.sum(E * E, (-1, -2))
        return loss_weight(self.loss, s, self.loss_reg), s

    # ------------------------------------------------------------ evaluations

    def local_fobj(self, state: NodeState) -> jnp.ndarray:
        """Node objective F^a(Z) = 1/2 sum_intra |r|^2 + 1/2 sum_inter
        rho(|r|^2)/... (inter edges shared half-half between endpoints)."""
        rt, rR = self.intra_residuals(state.t, state.R)
        f = 0.5 * (jnp.sum(rt * rt) + jnp.sum(rR * rR))
        (u_s, E_s), (u_o, E_o) = self.inter_halves(state)
        u = u_s + u_o
        E = E_s + E_o
        s = jnp.sum(u * u, -1) + jnp.sum(E * E, (-1, -2))
        if self.loss is Loss.TRIVIAL:
            f = f + 0.25 * jnp.sum(s)
        else:
            f = f + 0.25 * jnp.sum(loss_value(self.loss, s, self.loss_reg))
        return f

    def surrogate_g_f_fobj(self, state: NodeState):
        g, f, fobj, _ = self.surrogate_g_f_fobj_res(state)
        return g, f, fobj

    def surrogate_g_f_fobj_res(self, state: NodeState):
        """(g, f, fobj, zres) with the residual halves computed ONCE — the
        fused form update_state needs every iteration (surrogate_g_f +
        local_fobj separately would gather the edge arrays twice). The
        returned anchor residuals zres = ((rt, rR), (u_s, E_s)) are cached in
        the solver state so the next iterate's evaluate_G_rel calls skip the
        anchor pass entirely."""
        (u_s, E_s), (u_o, E_o) = self.inter_halves(state)
        u = u_s + u_o
        E = E_s + E_o
        s = jnp.sum(u * u, -1) + jnp.sum(E * E, (-1, -2))
        rt, rR = self.intra_residuals(state.t, state.R)
        f_intra = 0.5 * (jnp.sum(rt * rt) + jnp.sum(rR * rR))
        if self.loss is Loss.TRIVIAL:
            g_t, g_R = self.apply_A_self_T(u_o - u_s, E_o - E_s)
            g_t = g_t - self.xi * state.t
            g_R = g_R - self.xi * state.R
            du = u_s - u_o
            dE = E_s - E_o
            f = 0.25 * (jnp.sum(du * du) + jnp.sum(dE * dE)) \
                + 0.5 * self.xi * (jnp.sum(state.t * state.t)
                                   + jnp.sum(state.R * state.R))
            fobj = f_intra + 0.25 * jnp.sum(s)
            return (g_t, g_R), f, fobj, ((rt, rR), (u_s, E_s))
        w = loss_weight(self.loss, s, self.loss_reg)
        sw = self.scale_w
        g_t, g_R = self.apply_A_self_T(
            w[:, None] * u - 2.0 * sw[:, None] * u_s,
            w[:, None, None] * E - 2.0 * sw[:, None, None] * E_s)
        g_t = g_t - self.xi * state.t
        g_R = g_R - self.xi * state.R
        fobj = f_intra \
            + 0.25 * jnp.sum(loss_value(self.loss, s, self.loss_reg))
        f = fobj - 0.5 * self.G_quad(state.t, state.R) \
            - jnp.sum(g_t * state.t) - jnp.sum(g_R * state.R)
        return (g_t, g_R), f, fobj, ((rt, rR), (u_s, E_s))

    def surrogate_g_f(self, state: NodeState):
        """Linear term g = (g_t, g_R) and constant f of G^a(.|Z).

        Unified over loss kernels: g = A_self^T (w r - 2 A_self z_self)
        - xi z_a, where w is the IRLS weight at the anchor (1 for the trivial
        loss, in which case w r - 2 A_s z_s = A_o z_o - A_s z_s and this is
        the reference's S Z, evaluate_none_g_and_f0; for robust kernels it is
        DfobjE - D Z of evaluate_g_and_f0, DPGOProblem.cpp:222-267 — the
        static-rescale surrogate keeps the unweighted quadratic, valid since
        w <= 1 for all supported kernels).

        The constant f makes the surrogate touch the node objective at the
        anchor: closed form for the trivial loss, F^a - 1/2<G z, z> - <g, z>
        in general.
        """
        (u_s, E_s), (u_o, E_o) = self.inter_halves(state)
        if self.loss is Loss.TRIVIAL:
            g_t, g_R = self.apply_A_self_T(u_o - u_s, E_o - E_s)
            g_t = g_t - self.xi * state.t
            g_R = g_R - self.xi * state.R
            du = u_s - u_o
            dE = E_s - E_o
            f = 0.25 * (jnp.sum(du * du) + jnp.sum(dE * dE)) \
                + 0.5 * self.xi * (jnp.sum(state.t * state.t)
                                   + jnp.sum(state.R * state.R))
            return (g_t, g_R), f
        u = u_s + u_o
        E = E_s + E_o
        s = jnp.sum(u * u, -1) + jnp.sum(E * E, (-1, -2))
        w = loss_weight(self.loss, s, self.loss_reg)
        sw = self.scale_w
        g_t, g_R = self.apply_A_self_T(
            w[:, None] * u - 2.0 * sw[:, None] * u_s,
            w[:, None, None] * E - 2.0 * sw[:, None, None] * E_s)
        g_t = g_t - self.xi * state.t
        g_R = g_R - self.xi * state.R
        # fobj share: intra + 1/4 sum rho(s) (each inter edge's 1/2 rho(s)
        # global contribution is split half-half between endpoint nodes).
        rt, rR = self.intra_residuals(state.t, state.R)
        fobj = 0.5 * (jnp.sum(rt * rt) + jnp.sum(rR * rR)) \
            + 0.25 * jnp.sum(loss_value(self.loss, s, self.loss_reg))
        f = fobj - 0.5 * self.G_quad(state.t, state.R) \
            - jnp.sum(g_t * state.t) - jnp.sum(g_R * state.R)
        return (g_t, g_R), f

    def G_quad(self, t, R):
        """<G X, X> for X = (t, R) (the SPD surrogate quadratic form)."""
        rt, rR = self.intra_residuals(t, R)
        q = jnp.sum(rt * rt) + jnp.sum(rR * rR)
        u_s, E_s = self._self_half(t, R)
        q = q + 2.0 * jnp.sum(
            self.scale_w * (jnp.sum(u_s * u_s, -1)
                            + jnp.sum(E_s * E_s, (-1, -2))))
        q = q + self.xi * (jnp.sum(t * t) + jnp.sum(R * R))
        return q

    def _self_half(self, t, R):
        st = jnp.sqrt(self.e_tau)
        sk = jnp.sqrt(self.e_kap)
        sel = self.e_self_is_i[:, None]
        selm = self.e_self_is_i[:, None, None]
        ts = t[self.e_self]
        Rs = R[self.e_self]
        u_s = jnp.where(
            sel,
            st[:, None] * (ts + jnp.einsum("eab,eb->ea", Rs, self.e_t)),
            -st[:, None] * ts)
        E_s = jnp.where(
            selm,
            sk[:, None, None] * jnp.einsum("eab,ebc->eac", Rs, self.e_R),
            -sk[:, None, None] * Rs)
        return u_s, E_s

    def G_apply(self, t, R):
        """G X as (d/dt, d/dR): gradient of 1/2 <G X, X>."""
        rt, rR = self.intra_residuals(t, R)
        # intra: same scatter pattern as the global gradient with w = 1.
        st = jnp.sqrt(self.a_tau)
        sk = jnp.sqrt(self.a_kap)
        u = st[:, None] * rt
        E = sk[:, None, None] * rR
        n0 = self._n0()
        d = self.d
        Df_t = jnp.zeros((n0, d), t.dtype)
        Df_R = jnp.zeros((n0, d, d), R.dtype)
        Gi = u[:, :, None] * self.a_t[:, None, :] + jnp.einsum(
            "eab,ecb->eac", E, self.a_R)
        Df_t = Df_t.at[self.a_i].add(u).at[self.a_j].add(-u)
        Df_R = Df_R.at[self.a_i].add(Gi).at[self.a_j].add(-E)
        # inter: 2 w_bar A_self^T A_self x_self.
        u_s, E_s = self._self_half(t, R)
        g2t, g2R = self.apply_A_self_T(
            2.0 * self.scale_w[:, None] * u_s,
            2.0 * self.scale_w[:, None, None] * E_s)
        Df_t = Df_t + g2t + self.xi * t
        Df_R = Df_R + g2R + self.xi * R
        return Df_t, Df_R

    def anchor_residuals(self, zt, zR):
        """Residual halves at the anchor state, for reuse across the several
        evaluate_G_rel calls an iteration makes against the same Z."""
        return self.intra_residuals(zt, zR), self._self_half(zt, zR)

    def evaluate_G_rel(self, zt, zR, xt, xR, g, fobj,
                       zres=None) -> jnp.ndarray:
        """Surrogate value G(X|Z) in RELATIVE form, anchored at the node
        objective: G(X|Z) = F^a(Z) + 1/2(<GX,X> - <GZ,Z>) + <g, X-Z>, with
        the quadratic difference expanded PER EDGE as
        (q_e(X)-q_e(Z))(q_e(X)+q_e(Z)).

        Numerically essential in f32: the absolute form 1/2<GX,X>+<g,X>+f
        cancels ~1e4-magnitude bilinear terms down to an O(1) value (a few
        bits of precision), and the restart cascade compares that value
        against fobj — one flipped comparison can accept a catastrophic
        step (observed: huber+dynamic rescale diverging on TPU). The
        relative form only ever multiplies O(|X-Z|) by O(residual)."""
        def sq_diff(aX, aZ):
            return jnp.sum((aX - aZ) * (aX + aZ))

        if zres is None:
            zres = self.anchor_residuals(zt, zR)
        (rtZ, rRZ), (usZ, EsZ) = zres
        rtX, rRX = self.intra_residuals(xt, xR)
        dq = sq_diff(rtX, rtZ) + sq_diff(rRX, rRZ)
        usX, EsX = self._self_half(xt, xR)
        dq = dq + 2.0 * jnp.sum(
            self.scale_w * (jnp.sum((usX - usZ) * (usX + usZ), -1)
                            + jnp.sum((EsX - EsZ) * (EsX + EsZ), (-1, -2))))
        dq = dq + self.xi * (sq_diff(xt, zt) + sq_diff(xR, zR))
        g_t, g_R = g
        lin = jnp.sum(g_t * (xt - zt)) + jnp.sum(g_R * (xR - zR))
        return fobj + 0.5 * dq + lin

    def evaluate_G_rel_pair(self, zt, zR, t1, t2, xR, g, fobj, zres):
        """Two evaluate_G_rel values for candidates sharing the SAME
        rotations (the fast path's (Xakh, Xak) pair, which differ only in
        the translation solve): all R-dependent residual work — the d x d
        einsums, the dominant cost — is computed once."""
        def sq_diff(aX, aZ):
            return jnp.sum((aX - aZ) * (aX + aZ))

        (rtZ, rRZ), (usZ, EsZ) = zres
        # Shared rotation-dependent pieces.
        Ri_at = jnp.einsum("eab,eb->ea", xR[self.a_i], self.a_t)
        rRX = jnp.sqrt(self.a_kap)[:, None, None] * (
            jnp.einsum("eab,ebc->eac", xR[self.a_i], self.a_R)
            - xR[self.a_j])
        st = jnp.sqrt(self.e_tau)
        sk = jnp.sqrt(self.e_kap)
        sel = self.e_self_is_i[:, None]
        selm = self.e_self_is_i[:, None, None]
        Rs = xR[self.e_self]
        EsX = jnp.where(
            selm,
            sk[:, None, None] * jnp.einsum("eab,ebc->eac", Rs, self.e_R),
            -sk[:, None, None] * Rs)
        Rs_et = jnp.einsum("eab,eb->ea", Rs, self.e_t)
        dqR = sq_diff(rRX, rRZ) + self.xi * sq_diff(xR, zR) + 2.0 * jnp.sum(
            self.scale_w * jnp.sum((EsX - EsZ) * (EsX + EsZ), (-1, -2)))
        g_t, g_R = g
        linR = jnp.sum(g_R * (xR - zR))
        sqrt_tau_a = jnp.sqrt(self.a_tau)[:, None]

        def t_part(xt):
            rtX = sqrt_tau_a * (xt[self.a_i] + Ri_at - xt[self.a_j])
            ts = xt[self.e_self]
            usX = jnp.where(sel, st[:, None] * (ts + Rs_et),
                            -st[:, None] * ts)
            dq = sq_diff(rtX, rtZ) + self.xi * sq_diff(xt, zt) \
                + 2.0 * jnp.sum(self.scale_w
                                * jnp.sum((usX - usZ) * (usX + usZ), -1))
            return dq + 2.0 * jnp.sum(g_t * (xt - zt))

        base = fobj + 0.5 * dqR + linR
        return base + 0.5 * t_part(t1), base + 0.5 * t_part(t2)

    def evaluate_G(self, t, R, g, f) -> jnp.ndarray:
        """G^a value = 1/2 <G X, X> + <g, X> + f (DPGOProblem.cpp:180-205)."""
        g_t, g_R = g
        if self.dense:
            return self.evaluate_G_tall(t, self.to_tall(R), g_t,
                                        self.to_tall(g_R), f)
        return (0.5 * self.G_quad(t, R) + jnp.sum(g_t * t)
                + jnp.sum(g_R * R) + f)

    def euclidean_Df(self, state: NodeState, g=None):
        """Local Euclidean gradient Df = G z_a + g  (= nabla_a F(Z) for the
        trivial loss; DPGOProblem::evaluate_Df)."""
        if g is None:
            g, _ = self.surrogate_g_f(state)
        if self.dense:
            Q = self.to_tall(state.R)
            Gt = self.mG00_d @ state.t + self.mG01_d @ Q
            GR = self.from_tall(self.mG01_d.T @ state.t + self.mG11_d @ Q)
        else:
            Gt, GR = self.G_apply(state.t, state.R)
        return Gt + g[0], GR + g[1]

    def riemannian_grad(self, state: NodeState, Df=None):
        if Df is None:
            Df = self.euclidean_Df(state)
        return Df[0], proj_tangent(state.R, Df[1])

    def q_gap(self, dstate: NodeState) -> jnp.ndarray:
        """1/2 <Q dZ, dZ> = -1/4 sum_inter |A_tail dZ_tail - A_head dZ_head|^2
        - xi/2 |dZ_a|^2 — the *anti-residual* of the state delta.

        Exact telescoping gap F^a(Z') - G^a(X'|Z) for the trivial loss: the Q
        matrix of simplify_quadratic_data_matrix is -1/2 x (the quadratic form
        of A_i z_i - A_j z_j) on inter edges (DPGO_utils.cpp:1864-1962). Note
        the per-node telescoped objective carries an antisymmetric cross-term
        that cancels when summed over both endpoint nodes; the reference's
        restart tests consume exactly this sequence, so we reproduce it.
        """
        (u_s, E_s), (u_o, E_o) = self.inter_halves(dstate)
        # anti-residual = A_tail - A_head; its norm is side-symmetric.
        u = u_s - u_o
        E = E_s - E_o
        s = jnp.sum(u * u) + jnp.sum(E * E)
        return (-0.25 * s - 0.5 * self.xi *
                (jnp.sum(dstate.t * dstate.t) + jnp.sum(dstate.R * dstate.R)))

    def p_form(self, state: NodeState) -> jnp.ndarray:
        """1/2 <P Z, Z> = -1/2 sum_intra |r|^2 - sum_inter <A_s z_s, A_o z_o>
        + xi/2 |z_a|^2 (the P matrix of simplify_quadratic_data_matrix):
        converts the telescoped fobj into the surrogate constant f via
        f = fobj + 1/2 <P Z, Z> (evaluate_none_g_and_f,
        DPGOProblem.cpp:516-542)."""
        rt, rR = self.intra_residuals(state.t, state.R)
        (u_s, E_s), (u_o, E_o) = self.inter_halves(state)
        cross = jnp.sum(u_s * u_o) + jnp.sum(E_s * E_o)
        return (-0.5 * (jnp.sum(rt * rt) + jnp.sum(rR * rR)) - cross
                + 0.5 * self.xi * (jnp.sum(state.t * state.t)
                                   + jnp.sum(state.R * state.R)))

    # ------------------------------------------------------------ proximal

    def proximal(self, state: NodeState, Df):
        """Closed-form minimizer of the auxiliary surrogate H^a(.|Z).

        C = Df_R - (N^T T) Df_t - W z_R ;  R+ = project(-C)
        t+ = z_t - T [nvec cross (R+ - z_R)] - T Df_t
        (reference DPGOProblem::proximal, DPGOProblem.cpp:600-632; U matrix
        semantics DPGO_utils.h:241-243 — here derived edge-wise.)
        """
        Df_t, Df_R = Df
        z_t, z_R = state.t, state.R
        Tv = self.diagT_inv
        # (N^T v)[p] = v_p nvec_p^T (outer product into R-space).
        NTv = (Tv[:, None] * Df_t)[:, :, None] * self.nvec[:, None, :]
        WzR = jnp.einsum("pab,pbc->pac", z_R, self.W)
        C = Df_R - NTv - WzR
        R_new = project_sod(-C)
        # t+ = z_t - T nvec-cross (R+ - z_R) - T Df_t
        dR = R_new - z_R
        t_new = z_t - Tv[:, None] * jnp.einsum(
            "pab,pb->pa", dR, self.nvec) - Tv[:, None] * Df_t
        return t_new, R_new

    # ------------------------------------------------- segment translation
    def mG00_matvec(self, v):
        """Segment-BSR mG00 apply: batched [S, S] block matmuls (diagonal
        blocks + off-diagonal segment pairs) + the dynamic-rescale inter
        diagonal delta 2 (w - 1) tau edge-wise. Exactly equal to the
        dense build's mG00_full (the BSR is a lossless host-side
        reassembly); chosen over the edge-wise gather/scatter form
        because TPU serializes scatter-adds row-by-row (~3 ms per pass at
        100k-pose scale vs ~0.1 ms of MXU matmuls here)."""
        S = self.seg_size
        n_seg = self.seg_diag.shape[0]
        n0 = self._n0()
        vb = jnp.pad(v, ((0, n_seg * S - n0), (0, 0))).reshape(n_seg, S, -1)
        out = jnp.einsum("spq,sqa->spa", self.seg_diag, vb)
        contrib = jnp.einsum("kpq,kqa->kpa", self.seg_blk,
                             vb[self.seg_col])
        out = out.at[self.seg_row].add(contrib)
        out = out.reshape(n_seg * S, -1)[:n0]
        # Dynamic-rescale inter diagonal delta (zero at build weights).
        dl = 2.0 * (self.scale_w - 1.0) * self.e_tau
        out = out.at[self.e_self].add(dl[:, None] * v[self.e_self])
        return out

    def _deflate_null(self, v):
        c = jnp.einsum("pk,pa->ka", self.null_V, v)
        return v - jnp.einsum("pk,ka->pa", self.null_V, c)

    def _precondition_t_seg(self, r):
        """Two-level additive-Schwarz preconditioner for mG00: dense
        segment-diagonal inverses + the segment-aggregated coarse inverse
        (Galerkin P^T mG00 P over piecewise-constant indicators), null
        components deflated so CG stays in the range space (the segment
        analog of the eigen-split inverse's clamped spectrum)."""
        S = self.seg_size
        n_seg = self.seg_t_inv.shape[0]
        n0 = self._n0()
        rb = jnp.pad(r, ((0, n_seg * S - n0), (0, 0))).reshape(n_seg, S, -1)
        z = jnp.einsum("spq,sqa->spa", self.seg_t_inv, rb)
        c = jnp.einsum("st,ta->sa", self.seg_c_inv, rb.sum(axis=1))
        z = (z + c[:, None, :]).reshape(n_seg * S, -1)[:n0]
        return self._deflate_null(z)

    def _solve_mG00_seg(self, rhs, x0=None):
        """Preconditioned CG on the edge-wise mG00 (all d RHS columns run
        as independent CGs sharing iterations — per-column scalars). The
        null response is dropped exactly as in the dense split inverse
        (the caller adds it from t_anchor, see solve_mG00).

        `x0` warm-starts the iteration (hot-loop solves pass the anchor
        translations, whose distance to the solution shrinks with the MM
        step size — near convergence CG exits after O(1) iterations
        instead of re-solving from scratch). Convergence is measured
        against |rhs|, not the warm-started initial residual."""
        r_full = self._deflate_null(rhs)
        rr_ref = jnp.sum(r_full * r_full, axis=0)
        if x0 is None:
            x0 = jnp.zeros_like(rhs)
            r0 = r_full
        else:
            x0 = self._deflate_null(x0)
            r0 = r_full - self._deflate_null(self.mG00_matvec(x0))
        z0 = self._precondition_t_seg(r0)
        rz0 = jnp.sum(r0 * z0, axis=0)
        tol2 = self.seg_cg_tol * self.seg_cg_tol

        def cond(st):
            x, r, z, p, rz, k = st
            rr = jnp.sum(r * r, axis=0)
            return (k < self.seg_cg_iters) & jnp.any(rr > tol2 * rr_ref)

        def body(st):
            x, r, z, p, rz, k = st
            Ap = self._deflate_null(self.mG00_matvec(p))
            pAp = jnp.sum(p * Ap, axis=0)
            alpha = jnp.where(pAp > 0, rz / jnp.where(pAp > 0, pAp, 1.0),
                              0.0)
            x = x + alpha[None, :] * p
            r = r - alpha[None, :] * Ap
            z = self._precondition_t_seg(r)
            rz_new = jnp.sum(r * z, axis=0)
            beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0),
                             0.0)
            p = z + beta[None, :] * p
            return x, r, z, p, rz_new, k + 1

        out = jax.lax.while_loop(
            cond, body, (x0, r0, z0, z0, rz0,
                         jnp.zeros((), jnp.int32)))
        return out[0]

    def precondition_R_seg(self, V):
        """Segment-dense regularized mG11 inverse applied to an R-storage
        tangent [n0, d, d] — the segment analog of precondition_tall's
        dense regularized inverse (reference RegularizedCholesky role at
        CHOLMOD-class block sizes)."""
        S, d = self.seg_size, self.d
        n_seg = self.seg_R_inv.shape[0]
        n0 = self._n0()
        Vt = self.to_tall(V)                       # [n0 d, d]
        Vt = jnp.pad(Vt, ((0, (n_seg * S - n0) * d), (0, 0)))
        Vb = Vt.reshape(n_seg, S * d, d)
        Pb = jnp.einsum("spq,sqa->spa", self.seg_R_inv, Vb)
        Pt = Pb.reshape(n_seg * S * d, d)[:n0 * d]
        return self.from_tall(Pt)

    def solve_mG00(self, rhs, t_anchor=None):
        """Apply the inverse of the translation block to rhs [n0, d]:
        split inverse of the base system, plus (dynamic rescale) the Woodbury
        correction for the diagonal weight delta.

        Null-space handling: mG00 = L + xi I is genuinely near-singular on
        connected components without inter edges (the single-node case), and
        the exact null response (nullV^T rhs) / xi amplifies rounding noise
        in rhs by 1/xi = 1e11 — catastrophic in f32 (observed: single-node
        MM oscillating at 2f ~ 32 instead of converging to 31.70). For every
        rhs the solver produces, rhs = g + mG01 R with nullV^T mG01 = 0 and
        nullV^T g = -xi nullV^T z_anchor EXACTLY (inter rows vanish on such
        components), so the null response equals the gauge of the anchor
        state: pass `t_anchor` (the state whose surrogate produced g; zeros
        for a pure-coupling rhs like the Hessian's) to compute it without
        the 1/xi amplification. t_anchor=None keeps the legacy division.

        Segment path: the dense split inverse is replaced by segment-
        Schwarz-preconditioned CG (_solve_mG00_seg), whose matvec carries
        the current scale_w — dynamic rescale needs no Woodbury there. The
        CG warm-starts from -t_anchor: the solve's output is (minus) a
        translation state near the anchor, so the initial residual scales
        with the MM step size instead of the state magnitude."""
        if self.seg:
            out = self._solve_mG00_seg(
                rhs, x0=None if t_anchor is None else -t_anchor)
        else:
            out = jnp.einsum("pq,qa->pa", self.Minv_red, rhs)
        if t_anchor is None:
            c = jnp.einsum("pk,pa->ka", self.null_V, rhs) / self.xi
        else:
            c = -jnp.einsum("pk,pa->ka", self.null_V, t_anchor)
        out = out + jnp.einsum("pk,ka->pa", self.null_V, c)
        if self.dynamic and not self.seg:
            corr = jnp.einsum("kl,la->ka", self.wood_C, out[self.ipose])
            out = out - jnp.einsum("pk,ka->pa", self.SU, corr)
        return out

    def recover_translations(self, R, g_t, t_anchor=None):
        """t = -mG00^{-1} (g_t + mG01 R) (reference recover_translations,
        DPGOProblem.h:275-294, CHOLMOD solve -> cached split inverse).
        `t_anchor`: see solve_mG00."""
        return -self.solve_mG00(g_t + self.mG01_apply(R), t_anchor)

    def mG01_apply(self, M):
        """t-space result of the G translation-rotation coupling block.

        intra e: row t_i += tau M_i t~ ; row t_j -= tau M_i t~
        inter self-tail e: row t_self += 2 tau M_self t~
        """
        n0 = self._n0()
        v = self.a_tau[:, None] * jnp.einsum(
            "eab,eb->ea", M[self.a_i], self.a_t)
        out = jnp.zeros((n0, self.d), M.dtype)
        out = out.at[self.a_i].add(v).at[self.a_j].add(-v)
        w = jnp.where(self.e_self_is_i[:, None],
                      2.0 * (self.scale_w * self.e_tau)[:, None]
                      * jnp.einsum("eab,eb->ea", M[self.e_self], self.e_t),
                      0.0)
        out = out.at[self.e_self].add(w)
        return out

    def mG10_apply(self, v):
        """R-space result of the transpose coupling block.

        intra e: block R_i += tau (v_i - v_j) t~^T
        inter self-tail e: block R_self += 2 tau v_self t~^T
        """
        n0 = self._n0()
        dv = v[self.a_i] - v[self.a_j]
        blk = self.a_tau[:, None, None] * dv[:, :, None] * \
            self.a_t[:, None, :]
        out = jnp.zeros((n0, self.d, self.d), v.dtype)
        out = out.at[self.a_i].add(blk)
        blk2 = jnp.where(
            self.e_self_is_i[:, None, None],
            2.0 * (self.scale_w * self.e_tau)[:, None, None] *
            v[self.e_self][:, :, None] * self.e_t[:, None, :],
            0.0)
        out = out.at[self.e_self].add(blk2)
        return out

    def mG11_apply(self, M):
        """R-space rotation block of G applied to ambient M [n0, d, d].

        intra e: R_i += kappa (M_i R~ - M_j) R~^T + tau (M_i t~) t~^T
                 R_j += -kappa (M_i R~ - M_j)
        inter self-tail: R_s += 2 kappa M_s + 2 tau (M_s t~) t~^T
        inter self-head: R_s += 2 kappa M_s
        plus xi M.
        """
        n0 = self._n0()
        Mi = M[self.a_i]
        Mj = M[self.a_j]
        rR = jnp.einsum("eab,ebc->eac", Mi, self.a_R) - Mj
        blk_i = self.a_kap[:, None, None] * jnp.einsum(
            "eab,ecb->eac", rR, self.a_R) \
            + self.a_tau[:, None, None] * jnp.einsum(
                "eab,eb->ea", Mi, self.a_t)[:, :, None] * self.a_t[:, None, :]
        blk_j = -self.a_kap[:, None, None] * rR
        out = jnp.zeros((n0, self.d, self.d), M.dtype)
        out = out.at[self.a_i].add(blk_i).at[self.a_j].add(blk_j)
        Ms = M[self.e_self]
        tail_extra = jnp.where(
            self.e_self_is_i[:, None, None],
            2.0 * (self.scale_w * self.e_tau)[:, None, None] * jnp.einsum(
                "eab,eb->ea", Ms, self.e_t)[:, :, None] * self.e_t[:, None, :],
            0.0)
        out = out.at[self.e_self].add(
            2.0 * (self.scale_w * self.e_kap)[:, None, None] * Ms
            + tail_extra)
        return out + self.xi * M

    # ------------------------------------------------ dense (MXU) operators

    def to_tall(self, R):
        """[n, d, d] true-rotation blocks -> tall Q-storage [n d, d]."""
        return jnp.swapaxes(R, -1, -2).reshape(-1, self.d)

    def from_tall(self, Q):
        return jnp.swapaxes(Q.reshape(-1, self.d, self.d), -1, -2)

    def sym_block_tall(self, A, B, C):
        """A_i sym(B_i C_i^T) per [d, d] block in tall storage."""
        d = self.d
        Ab = A.reshape(-1, d, d)
        Bb = B.reshape(-1, d, d)
        Cb = C.reshape(-1, d, d)
        S = jnp.einsum("nar,nbr->nab", Bb, Cb)
        S = 0.5 * (S + jnp.swapaxes(S, -1, -2))
        return jnp.einsum("nab,nbr->nar", S, Ab).reshape(A.shape)

    def proj_tall(self, Q, V):
        return V - self.sym_block_tall(Q, Q, V)

    def evaluate_G_tall(self, t, Q, g_t, g_Q, f):
        """Dense-path surrogate value: 1/2 <G X, X> + <g, X> + f."""
        quad = jnp.sum(t * (self.mG00_d @ t)) \
            + 2.0 * jnp.sum(t * (self.mG01_d @ Q)) \
            + jnp.sum(Q * (self.mG11_d @ Q))
        return 0.5 * quad + jnp.sum(g_t * t) + jnp.sum(g_Q * Q) + f

    def evaluate_G_tall_rel(self, t, Q, zt, zQ, g_t, g_Q, fobj):
        """f32-stable relative surrogate value in tall storage, anchored at
        the MM anchor Z (where G(Z|Z) = fobj by tangency):

            G(X) = fobj + 1/2 <G (X+Z), X-Z> + <g, X-Z>

        — exact by symmetry of G, and its rounding error scales with
        |X - Z| instead of the absolute objective. The absolute quad form's
        f32 cancellation noise (~1e-3 at sphere2500 scale) swamps the
        late Newton steps' true decreases and turns TNT's gain ratio into
        noise (observed: rho = -2337 / +1519 rejections burning all 10
        outer iterations per refinement). All dense MXU matmuls."""
        # Full working precision (not the bf16 MXU pass): the objective is
        # evaluated twice per TNT outer iteration and its accuracy decides
        # accept/reject — bf16 noise here re-creates the rho-noise rejection
        # storm the relative form exists to prevent.
        hi = jax.lax.Precision.HIGHEST
        mm = lambda A, B: jnp.matmul(A, B, precision=hi)
        dt, dQ = t - zt, Q - zQ
        st_, sQ = t + zt, Q + zQ
        Gt = mm(self.mG00_d, st_) + mm(self.mG01_d, sQ)
        GQ = mm(self.mG01_d.T, st_) + mm(self.mG11_d, sQ)
        return (fobj + 0.5 * (jnp.sum(Gt * dt) + jnp.sum(GQ * dQ))
                + jnp.sum(g_t * dt) + jnp.sum(g_Q * dQ))

    def reduced_grad_tall(self, t, Q, g_Q):
        return g_Q + self.mG01_d.T @ t + self.mG11_d @ Q

    def hessian_vp_tall(self, Q, nablaQ, Qdot):
        """Hessian-vector product for the STPCG inner loop: one matmul with
        the precomputed reduced operator Hred (see its field comment), plus
        the point-dependent curvature correction and tangent projection.

        Runs its matmul at the fast (bf16-pass) MXU precision: truncated
        Newton tolerates ~1e-3 relative Hessian error (the trust-region
        acceptance test evaluates the objective at full precision), and
        this matvec dominates the iteration cost."""
        E = jnp.matmul(self.Hred_d, Qdot,
                       precision=jax.lax.Precision.DEFAULT)
        E = E - self.sym_block_tall(Qdot, Q, nablaQ)
        return self.proj_tall(Q, E)

    def precondition_tall(self, Q, V):
        # A preconditioner only needs to be a fixed SPD operator, so the
        # matmul runs at the fast MXU precision like the Hessian matvecs.
        P = jnp.matmul(self.precon_dense, V,
                       precision=jax.lax.Precision.DEFAULT)
        return self.proj_tall(Q, P)

    def precondition_tall_jacobi(self, Q, V):
        """Block-Jacobi preconditioner in tall Q-storage (the reference's
        Preconditioner::Jacobi option, DPGO_types.h:35-40). The per-pose
        blocks precon_inv act on R-storage from the right; in Q = R^T
        storage that is a left-multiply by the (symmetric) block."""
        d = self.d
        Vb = V.reshape(-1, d, d)
        P = jnp.einsum("pab,pbc->pac", self.precon_inv,
                       Vb).reshape(V.shape)
        return self.proj_tall(Q, P)

    def recover_translations_tall(self, Q, g_t, t_anchor=None):
        return -self.solve_mG00(g_t + self.mG01_d @ Q, t_anchor)

    # ---------------------------------------------------- TNT building blocks

    def reduced_euclidean_grad(self, t, R, g_R):
        """nabla_R G(X) = g_R + mG10 t + mG11 R (DPGOProblem.h:380-393)."""
        return g_R + self.mG10_apply(t) + self.mG11_apply(R)

    def reduced_hessian_vp(self, R, nablaR, Rdot):
        """Riemannian Hessian-vector product of the reduced (t-eliminated)
        surrogate (DPGOProblem.cpp:552-577). The rhs has exactly zero null
        component, so the null response is dropped (see solve_mG00)."""
        rhs = self.mG01_apply(Rdot)
        tdot = -self.solve_mG00(rhs, t_anchor=jnp.zeros_like(rhs))
        E = self.mG10_apply(tdot) + self.mG11_apply(Rdot)
        E = E - sym_block_diag_product(Rdot, R, nablaR)
        return proj_tangent(R, E)

    def precondition(self, R, V):
        """Block-Jacobi preconditioner + tangent projection
        (reference RegularizedCholesky, DPGOProblem.cpp:579-598)."""
        return proj_tangent(R, jnp.einsum("pab,pbc->pac", V, self.precon_inv))


def with_weights(base: NodeProblem, w_bar: jnp.ndarray) -> NodeProblem:
    """Return a re-weighted problem for dynamic rescale (pure, on-device).

    `base` must be the problem as built (scale_w = 1); w_bar [m1] are the new
    persisted surrogate weights (DiagReScale). Recomputes the proximal
    constants (DiagT, nvec, W), the Woodbury core for the translation solve,
    and the dense operator images. Mirrors the reference's
    update_quadratic_mat + CHOLMOD refactorize (DPGOProblem.cpp:751-840).
    """
    d = base.d
    n0 = base.pose_mask.shape[0]
    dtype = base.diagT_inv.dtype
    eye = jnp.eye(d, dtype=dtype)

    # ---- pose-level auxiliary quantities, rebuilt from edge arrays.
    diagT = jnp.full((n0,), 1.5 * base.xi, dtype)
    a_t2 = 2.0 * base.a_tau
    diagT = diagT.at[base.a_i].add(a_t2).at[base.a_j].add(a_t2)
    e_t2 = 2.0 * w_bar * base.e_tau
    diagT = diagT.at[base.e_self].add(e_t2)

    nvec = jnp.zeros((n0, d), dtype)
    nvec = nvec.at[base.a_i].add(a_t2[:, None] * base.a_t)
    nvec = nvec.at[base.e_self].add(
        jnp.where(base.e_self_is_i[:, None], e_t2[:, None] * base.e_t, 0.0))

    S = 1.5 * base.xi * jnp.tile(eye, (n0, 1, 1))
    a_k2 = 2.0 * base.a_kap
    S = S.at[base.a_i].add(a_k2[:, None, None] * eye
                           + a_t2[:, None, None]
                           * base.a_t[:, :, None] * base.a_t[:, None, :])
    S = S.at[base.a_j].add(a_k2[:, None, None] * eye)
    e_k2 = 2.0 * w_bar * base.e_kap
    S = S.at[base.e_self].add(
        e_k2[:, None, None] * eye
        + jnp.where(base.e_self_is_i[:, None, None],
                    e_t2[:, None, None]
                    * base.e_t[:, :, None] * base.e_t[:, None, :], 0.0))

    Tinv = 1.0 / diagT
    W = S - Tinv[:, None, None] * nvec[:, :, None] * nvec[:, None, :]

    # ---- Woodbury core for the translation solve (dense/edge-wise paths
    # only: the segment path's CG matvec reads scale_w directly, so its
    # translation solves see the new weights with no factorization update).
    repl = dict(dynamic=True, scale_w=w_bar, diagT_inv=Tinv, nvec=nvec, W=W)
    if not base.seg:
        delta = jnp.zeros((n0,), dtype).at[base.e_self].add(
            2.0 * base.e_tau * (w_bar - 1.0))
        D = delta[base.ipose] * base.imask
        UtSU = base.SU[base.ipose]  # [k, k]
        k = D.shape[0]
        A = jnp.eye(k, dtype=dtype) + UtSU * D[None, :]
        wood_C = D[:, None] * jnp.linalg.inv(A)
        repl.update(wood_C=wood_C)

    # ---- dense operator deltas (relative to base's unit weights).
    if base.dense:
        dw = w_bar - base.scale_w
        es = base.e_self
        ar = jnp.arange(d)
        r_idx = (es * d)[:, None, None] + ar[None, :, None]
        c_idx = (es * d)[:, None, None] + ar[None, None, :]
        v11 = (2.0 * dw * base.e_kap)[:, None, None] * eye + jnp.where(
            base.e_self_is_i[:, None, None],
            (2.0 * dw * base.e_tau)[:, None, None]
            * base.e_t[:, :, None] * base.e_t[:, None, :], 0.0)
        mG11_d = base.mG11_d.at[r_idx, c_idx].add(v11)
        v01 = jnp.where(base.e_self_is_i[:, None],
                        (2.0 * dw * base.e_tau)[:, None] * base.e_t, 0.0)
        mG01_d = base.mG01_d.at[es[:, None], c_idx[:, 0, :]].add(v01)
        mG00_d = base.mG00_d.at[es, es].add(2.0 * dw * base.e_tau)
        # Reduced operator under the new weights: Hred = mG11 - mG10 X with
        # X = mG00^{-1} mG01 via the base split inverse + the new Woodbury
        # core (the diagonal weight delta lives at the inter poses only).
        X = jnp.matmul(base.Minv_red, mG01_d)
        corr = jnp.einsum("kl,la->ka", wood_C, X[base.ipose])
        X = X - jnp.einsum("pk,ka->pa", base.SU, corr)
        Hred_d = mG11_d - jnp.matmul(mG01_d.T, X)
        repl.update(mG11_d=mG11_d, mG01_d=mG01_d, mG00_d=mG00_d,
                    Hred_d=Hred_d)
        if base.Hpan.shape[-1] > 1:
            # Refresh the fused-STPCG Hred panels (Ppan stays: the base
            # preconditioner remains SPD-valid under w <= 1).
            n_pad = base.Hpan.shape[-1]
            pan = Hred_d.reshape(n0, d, n0, d).transpose(1, 3, 0, 2)
            pan = jnp.pad(pan, ((0, 0), (0, 0), (0, n_pad - n0),
                                (0, n_pad - n0)))
            repl.update(Hpan=pan.reshape(d * d, n_pad, n_pad)
                        .astype(jnp.float32))

    return dataclasses.replace(base, **repl)


# ------------------------------------------------------------------ builders


def _accum_cross_blocks(blk_map: dict, n_seg: int, S: int, r_arr, c_arr,
                        lr, lc, vals):
    """Accumulate edge couplings into per-(row, col)-segment-pair [S, S]
    dense blocks (host-side BSR assembly)."""
    if len(r_arr) == 0:
        return
    key = r_arr.astype(np.int64) * n_seg + c_arr
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    uniq, starts = np.unique(key_s, return_index=True)
    bounds = np.append(starts, len(key_s))
    for u, s0, s1 in zip(uniq, bounds[:-1], bounds[1:]):
        r, c = divmod(int(u), n_seg)
        blk = blk_map.setdefault((r, c), np.zeros((S, S)))
        sel = order[s0:s1]
        np.add.at(blk, (lr[sel], lc[sel]), vals[sel])


def _clamped_spd_inv(A: np.ndarray, rel_clip: float = 1e-9) -> np.ndarray:
    """Batched SPD (pseudo-)inverse with the near-null spectrum clamped to
    zero weight — the segment analog of the eigen-split inverse: modes the
    block cannot see (segment constants, global gauge) are the coarse
    level's / null deflation's job, and keeping their 1/xi-scale responses
    would destroy the f32 cast of everything else."""
    lam, V = np.linalg.eigh(A)
    lmax = np.maximum(lam[..., -1:], 1e-30)
    w = np.where(lam < rel_clip * lmax, 0.0, 1.0 / np.maximum(lam, 1e-300))
    return np.einsum("...pk,...k,...qk->...pq", V, w, V)


def _build_segment_factors(mg: MultiGraph, xi: float, S: int,
                           reg: np.ndarray):
    """Dense contiguous-segment factors for the segment path.

    Returns (seg_t_inv [N, n_seg, S, S], seg_c_inv [N, n_seg, n_seg],
    seg_R_inv [N, n_seg, S d, S d]):
    - seg_t_inv: clamped inverses of mG00's segment-diagonal blocks (edges
      crossing segments contribute only their diagonal entries);
    - seg_c_inv: clamped inverse of the Galerkin coarse operator
      P^T mG00 P over piecewise-constant segment indicators;
    - seg_R_inv: plain inverses of mG11's segment-diagonal blocks (tall
      Q-storage convention, matching the dense-path mG11_d layout) +
      reg[a] I — the RegularizedCholesky-role preconditioner for the
      coupled TNT model;
    - a block-compressed (BSR) image of the OFF-DIAGONAL segment coupling
      of mG00 (seg_blk [npair, S, S] + seg_row/seg_col [npair]): the CG
      matvec then runs as batched [S, S] MXU matmuls + a segment-granular
      scatter (a few hundred 1.5 KB rows) instead of an edge-wise
      scatter-add over 100k+ 12-byte rows, which TPU serializes
      (measured ~3 ms per scatter at rim-100k scale — the dominant cost
      of the entire translation solve).
    `reg` is the per-node lam_max / precon_cond regularizer."""
    N, n0m, d = mg.num_nodes, mg.n0_max, mg.d
    n_seg = -(-n0m // S)
    n_pad = n_seg * S
    pidx = np.arange(n_pad)
    seg_of = (pidx // S).astype(np.int32)
    loc_of = (pidx % S).astype(np.int32)
    ar = np.arange(d)

    seg_t = np.zeros((N, n_seg, S, S))
    seg_c = np.zeros((N, n_seg, n_seg))
    seg_R = np.zeros((N, n_seg, S * d, S * d))
    blk_maps = [dict() for _ in range(N)]  # (r, c) -> [S, S] off-diag block

    def add_R(a, sp_, lp, lq, vals):
        """seg_R[a][sp_, lp*d:+d, lq*d:+d] += vals ([m, d, d])."""
        r = lp[:, None, None] * d + ar[None, :, None]
        c = lq[:, None, None] * d + ar[None, None, :]
        np.add.at(seg_R[a], (sp_[:, None, None], r, c), vals)

    eye = np.eye(d)
    for a in range(N):
        realp = np.zeros(n_pad, bool)
        realp[:n0m] = mg.pose_mask[a]
        dval = np.where(realp, xi, 1.0)
        np.add.at(seg_t[a], (seg_of, loc_of, loc_of), dval)
        np.add.at(seg_c[a], (seg_of, seg_of), dval)
        for k in range(d):
            np.add.at(seg_R[a], (seg_of, loc_of * d + k, loc_of * d + k),
                      dval)

        ii, jj = mg.a_i[a], mg.a_j[a]
        msk = mg.a_mask[a]
        w = mg.a_tau[a] * msk
        kap = mg.a_kap[a] * msk
        tt = mg.a_t[a]
        Rm = mg.a_R[a]
        si, li = seg_of[ii], loc_of[ii]
        sj, lj = seg_of[jj], loc_of[jj]
        np.add.at(seg_t[a], (si, li, li), w)
        np.add.at(seg_t[a], (sj, lj, lj), w)
        same = si == sj
        np.add.at(seg_t[a], (si[same], li[same], lj[same]), -w[same])
        np.add.at(seg_t[a], (si[same], lj[same], li[same]), -w[same])
        # Crossing edges: record the off-diagonal segment-pair couplings
        # for the BSR matvec (both directions of the symmetric coupling).
        cross = ~same
        _accum_cross_blocks(blk_maps[a], n_seg, S,
                            np.concatenate([si[cross], sj[cross]]),
                            np.concatenate([sj[cross], si[cross]]),
                            np.concatenate([li[cross], lj[cross]]),
                            np.concatenate([lj[cross], li[cross]]),
                            np.concatenate([-w[cross], -w[cross]]))
        np.add.at(seg_c[a], (si, si), w)
        np.add.at(seg_c[a], (sj, sj), w)
        np.add.at(seg_c[a], (si, sj), -w)
        np.add.at(seg_c[a], (sj, si), -w)

        ttT = tt[:, :, None] * tt[:, None, :]
        add_R(a, si, li, li, kap[:, None, None] * eye
              + w[:, None, None] * ttT)
        add_R(a, sj, lj, lj, kap[:, None, None] * eye)
        add_R(a, si[same], li[same], lj[same],
              (-kap[same])[:, None, None] * Rm[same])
        add_R(a, sj[same], lj[same], li[same],
              (-kap[same])[:, None, None]
              * np.swapaxes(Rm[same], -1, -2))

        es = mg.e_self[a]
        et2 = 2.0 * mg.e_tau[a] * mg.e_mask[a]
        ek2 = 2.0 * mg.e_kap[a] * mg.e_mask[a]
        ett = mg.e_t[a]
        is_tail = mg.e_self_is_i[a]
        se, le = seg_of[es], loc_of[es]
        np.add.at(seg_t[a], (se, le, le), et2)
        np.add.at(seg_c[a], (se, se), et2)
        ettT = ett[:, :, None] * ett[:, None, :]
        add_R(a, se, le, le, ek2[:, None, None] * eye
              + (et2 * is_tail)[:, None, None] * ettT)

    # Pack the off-diagonal BSR blocks (padded to the max pair count with
    # zero blocks targeting row/col 0 — adds exact zeros, safe).
    npair = max([len(m) for m in blk_maps] + [1])
    seg_blk = np.zeros((N, npair, S, S))
    seg_row = np.zeros((N, npair), np.int32)
    seg_col = np.zeros((N, npair), np.int32)
    for a in range(N):
        for k, ((r, c), blk) in enumerate(sorted(blk_maps[a].items())):
            seg_blk[a, k] = blk
            seg_row[a, k] = r
            seg_col[a, k] = c

    seg_t_inv = _clamped_spd_inv(seg_t)
    seg_c_inv = _clamped_spd_inv(seg_c)
    seg_R += reg[:, None, None, None] * np.eye(S * d)
    seg_R_inv = np.linalg.inv(seg_R)
    return (seg_t_inv, seg_c_inv, seg_R_inv, seg_t, seg_blk, seg_row,
            seg_col)


def build_node_problems(mg: MultiGraph, xi: float = 1e-11,
                        loss: Loss = Loss.TRIVIAL, loss_reg: float = 1.0,
                        precon_cond: float = 1e6,
                        dense_limit: int = 4096,
                        segment_limit: int = 2048,
                        seg_size: int = 128,
                        # 20 iterations of warm-started segment-Schwarz CG:
                        # measured on rim-100k (16 nodes, 6400 poses/node),
                        # the 300-step trajectory at cap 10 already matches
                        # cap 60 to f32 noise (inexact-MM: the solve only
                        # needs accuracy of order the MM contraction), and
                        # the tol-based early exit takes over once the
                        # warm-start residual shrinks near convergence.
                        seg_cg_iters: int = 20,
                        seg_cg_tol: float | None = None,
                        dtype=jnp.float64) -> NodeProblem:
    """Build a stacked NodeProblem (leading node axis) from a MultiGraph.

    Host-side numpy; the dense mG00 inverses are computed here once
    (replacing the reference's CHOLMOD factorization, DPGOProblem.cpp:93).

    Blocks above `segment_limit` poses use the SEGMENT path: no [n0, n0]
    array is ever formed (the eigen-split inverse is O(n0^2) memory and
    O(n0^3) setup — infeasible at the 3-6k-poses-per-node blocks a
    50-100k-pose graph splits into); instead translation solves run
    segment-Schwarz-preconditioned CG and TNT refinement uses the coupled
    model with segment-dense factors (see the NodeProblem field comments).
    """
    N, n0m, d = mg.num_nodes, mg.n0_max, mg.d
    seg = n0m > segment_limit
    if seg_cg_tol is None:
        seg_cg_tol = 1e-7 if dtype == jnp.float64 else 3e-6
    diagT = np.full((N, n0m), 1.5 * xi)
    nvec = np.zeros((N, n0m, d))
    S = np.tile(1.5 * xi * np.eye(d), (N, n0m, 1, 1))
    mG00 = np.zeros((N, 1, 1) if seg else (N, n0m, n0m))
    jac = np.tile(xi * np.eye(d), (N, n0m, 1, 1))  # mG11 block-diagonal

    for a in range(N):
        ii, jj = mg.a_i[a], mg.a_j[a]
        tau = mg.a_tau[a]
        kap = mg.a_kap[a]
        tt = mg.a_t[a]
        msk = mg.a_mask[a]
        np.add.at(diagT[a], ii, 2 * tau * msk)
        np.add.at(diagT[a], jj, 2 * tau * msk)
        np.add.at(nvec[a], ii, 2 * tau[:, None] * tt * msk[:, None])
        np.add.at(S[a], ii, (2 * kap * msk)[:, None, None] * np.eye(d)
                  + (2 * tau * msk)[:, None, None]
                  * tt[:, :, None] * tt[:, None, :])
        np.add.at(S[a], jj, (2 * kap * msk)[:, None, None] * np.eye(d))
        # mG00 intra Laplacian.
        w = tau * msk
        if not seg:
            np.add.at(mG00[a], (ii, ii), w)
            np.add.at(mG00[a], (jj, jj), w)
            np.add.at(mG00[a], (ii, jj), -w)
            np.add.at(mG00[a], (jj, ii), -w)
        # mG11 block diagonal (Jacobi preconditioner).
        np.add.at(jac[a], ii, (kap * msk)[:, None, None] * np.eye(d)
                  + (tau * msk)[:, None, None]
                  * tt[:, :, None] * tt[:, None, :])
        np.add.at(jac[a], jj, (kap * msk)[:, None, None] * np.eye(d))

        es = mg.e_self[a]
        et = mg.e_tau[a] * mg.e_mask[a]
        ek = mg.e_kap[a] * mg.e_mask[a]
        ett = mg.e_t[a]
        is_tail = mg.e_self_is_i[a]
        np.add.at(diagT[a], es, 2 * et)
        np.add.at(nvec[a], es,
                  (2 * et * is_tail)[:, None] * ett)
        np.add.at(S[a], es, (2 * ek)[:, None, None] * np.eye(d)
                  + (2 * et * is_tail)[:, None, None]
                  * ett[:, :, None] * ett[:, None, :])
        if not seg:
            np.add.at(mG00[a], (es, es), 2 * et)
        np.add.at(jac[a], es, (2 * ek)[:, None, None] * np.eye(d)
                  + (2 * et * is_tail)[:, None, None]
                  * ett[:, :, None] * ett[:, None, :])

        # Padded poses get an identity diagonal (decoupled, well-conditioned).
        real = mg.pose_mask[a]
        if not seg:
            mG00[a][np.diag_indices(n0m)] += np.where(real, 0.0, 1.0)

    Tinv = 1.0 / diagT
    W = S - Tinv[:, :, None, None] * nvec[:, :, :, None] * nvec[:, :, None, :]

    # Split inverse of mG00 = L + xi I per node: eigendecompose the PSD L,
    # clamp the spectrum at zero, and separate the (near-)null eigenspace so
    # the reduced inverse has bounded entries.
    if seg:
        # Segment path: the (near-)null space of mG00 = L + xi I is known
        # analytically — one constant vector per connected component of the
        # intra graph that carries no inter edge (the eigen-split finds
        # exactly these numerically). Connected components replace the
        # O(n0^3) eigendecomposition.
        import scipy.sparse as sp
        import scipy.sparse.csgraph as csgraph
        comp_cols = []
        for a in range(N):
            n_real = int(mg.pose_mask[a].sum())
            am = mg.a_mask[a]
            ii, jj = mg.a_i[a][am], mg.a_j[a][am]
            A = sp.coo_matrix(
                (np.ones(len(ii)), (ii, jj)), shape=(n_real, n_real))
            ncomp, labels = csgraph.connected_components(A, directed=False)
            has_inter = np.zeros(ncomp, bool)
            es_real = mg.e_self[a][mg.e_mask[a]]
            has_inter[labels[es_real]] = True
            cols = []
            for cidx in range(ncomp):
                if has_inter[cidx]:
                    continue
                v = np.zeros(n0m)
                sel = labels == cidx
                v[:n_real][sel] = 1.0 / np.sqrt(sel.sum())
                cols.append(v)
            comp_cols.append(cols)
        kmax = max([len(c) for c in comp_cols] + [1])
        null_V = np.zeros((N, n0m, kmax))
        for a in range(N):
            for k, v in enumerate(comp_cols[a]):
                null_V[a][:, k] = v
        Minv_red = np.zeros((N, 1, 1))
    else:
        lam, V = np.linalg.eigh(mG00)  # L without xi
        lam = np.maximum(lam, 0.0)
        scale = lam.max(axis=1, keepdims=True)
        null_mask = lam < 1e-10 * np.maximum(scale, 1.0)  # [N, n0m]
        kmax = max(int(null_mask.sum(axis=1).max()), 1)
        Minv_red = np.zeros((N, n0m, n0m))
        null_V = np.zeros((N, n0m, kmax))
        for a in range(N):
            nm = null_mask[a]
            w = np.where(nm, 0.0, 1.0 / (lam[a] + xi))
            Minv_red[a] = (V[a] * w[None, :]) @ V[a].T
            k = int(nm.sum())
            null_V[a][:, :k] = V[a][:, nm]

    # Regularized block-Jacobi preconditioner: invert per-pose blocks of
    # mG11 + (lambda_max / cond) I. lambda_max is approximated by the largest
    # Gershgorin bound of the block diagonal (cheap, same role as the
    # reference's Spectra Lanczos estimate, DPGOProblem.cpp:101-124).
    # lambda_max of the rotational block for the regularized preconditioner:
    # Gershgorin bound on the block diagonal (refined below by power
    # iteration on the dense operator when available — the role Spectra's
    # Lanczos plays in the reference, DPGOProblem.cpp:101-124).
    lam_max = np.abs(jac).sum(axis=(-1, -2)).max(axis=-1)  # [N]

    # Dense operator images for the MXU TNT path (tall Q-storage).
    dense = n0m * d <= dense_limit and not seg
    if dense:
        nd = n0m * d
        mG01_d = np.zeros((N, n0m, nd))
        mG11_d = np.zeros((N, nd, nd))
        eye = np.eye(d)
        ar = np.arange(d)

        def add_blocks(M, rows, cols, vals):
            """M[rows*d:+d, cols*d:+d] += vals, vectorized over edges."""
            r = rows[:, None, None] * d + ar[None, :, None]
            c = cols[:, None, None] * d + ar[None, None, :]
            np.add.at(M, (r, c), vals)

        for a in range(N):
            ii, jj = mg.a_i[a], mg.a_j[a]
            tau = mg.a_tau[a] * mg.a_mask[a]
            kap = mg.a_kap[a] * mg.a_mask[a]
            tt = mg.a_t[a]
            Rm = mg.a_R[a]
            ttT = tt[:, :, None] * tt[:, None, :]
            add_blocks(mG11_d[a], ii, ii,
                       kap[:, None, None] * eye + tau[:, None, None] * ttT)
            add_blocks(mG11_d[a], jj, jj, kap[:, None, None] * eye)
            add_blocks(mG11_d[a], ii, jj, -kap[:, None, None] * Rm)
            add_blocks(mG11_d[a], jj, ii,
                       -kap[:, None, None] * np.swapaxes(Rm, -1, -2))
            # mG01: row t_i += tau t~^T in Q_i cols; row t_j -= same.
            c01 = ii[:, None] * d + ar[None, :]
            np.add.at(mG01_d[a], (ii[:, None], c01), tau[:, None] * tt)
            np.add.at(mG01_d[a], (jj[:, None], c01), -tau[:, None] * tt)

            es = mg.e_self[a]
            etau = mg.e_tau[a] * mg.e_mask[a]
            ekap = mg.e_kap[a] * mg.e_mask[a]
            ett = mg.e_t[a]
            is_tail = mg.e_self_is_i[a]
            ettT = ett[:, :, None] * ett[:, None, :]
            add_blocks(mG11_d[a], es, es,
                       2 * ekap[:, None, None] * eye
                       + 2 * (etau * is_tail)[:, None, None] * ettT)
            ce = es[:, None] * d + ar[None, :]
            np.add.at(mG01_d[a], (es[:, None], ce),
                      2 * (etau * is_tail)[:, None] * ett)
            mG11_d[a][np.diag_indices(nd)] += xi
        mG00_full = mG00 + xi * np.where(
            mg.pose_mask, 1.0, 0.0)[:, :, None] * np.eye(n0m)
    else:
        mG01_d = np.zeros((N, 1, 1))
        mG11_d = np.zeros((N, 1, 1))
        mG00_full = np.zeros((N, 1, 1))

    # Reduced (t-eliminated) rotation operator Hred = mG11 - mG10 mG00^+ mG01
    # (null response dropped: null_V^T mG01 = 0 exactly). Computed once in
    # f64 on the host; the STPCG Hessian-vector product is then ONE matmul.
    if dense:
        nd = n0m * d
        Hred_d = np.zeros((N, nd, nd))
        for a in range(N):
            X = Minv_red[a] @ mG01_d[a]
            Hred_d[a] = mG11_d[a] - mG01_d[a].T @ X
            Hred_d[a] = 0.5 * (Hred_d[a] + Hred_d[a].T)
    else:
        Hred_d = np.zeros((N, 1, 1))

    if dense:
        from dpgo_tpu.ops.eigen import lambda_max_lanczos
        for a in range(N):
            lam_max[a] = lambda_max_lanczos(mG11_d[a], seed=a)
    reg = lam_max / precon_cond
    jac_reg = jac + reg[:, None, None, None] * np.eye(d)
    precon_inv = np.linalg.inv(jac_reg)

    # Dense regularized inverse preconditioner (reference RegularizedCholesky
    # role, DPGOProblem.cpp:96-124 — but of the full reduced Hessian Hred
    # instead of the reference's mG11-only block): computed once at setup in
    # f64, applied as one matmul per STPCG iteration. With it, CG only has to
    # correct for the curvature term + tangent projection — O(1) iterations.
    # Stays fixed under dynamic rescale (w <= 1 only shrinks the operator,
    # so the base inverse remains a valid SPD preconditioner; the reference
    # refactorizes instead, DPGOProblem.cpp:751-840).
    if dense:
        precon_dense = np.zeros((N, nd, nd))
        for a in range(N):
            lam_h = lambda_max_lanczos(Hred_d[a], seed=1000 + a)
            precon_dense[a] = np.linalg.inv(
                Hred_d[a] + (lam_h / precon_cond) * np.eye(nd))
    else:
        precon_dense = np.zeros((N, 1, 1))

    # Inter-pose selector + base-inverse columns for the dynamic-rescale
    # Woodbury translation solve.
    ipose_list = [np.unique(mg.e_self[a][mg.e_mask[a]]) for a in range(N)]
    kmax = max([len(v) for v in ipose_list] + [1])
    ipose = np.zeros((N, kmax), np.int32)
    imask = np.zeros((N, kmax), bool)
    SU = np.zeros((N, 1, 1) if seg else (N, n0m, kmax))
    for a in range(N):
        k = len(ipose_list[a])
        ipose[a, :k] = ipose_list[a]
        imask[a, :k] = True
        if k and not seg:
            cols = ipose_list[a]
            SU[a][:, :k] = Minv_red[a][:, cols] \
                + null_V[a] @ null_V[a][cols, :].T / xi

    # Segment-Schwarz factors (the any-block-size path; see the NodeProblem
    # field comments). All dense work is on [S, S] / [S d, S d] contiguous-
    # segment blocks — batched MXU matmuls at apply time.
    if seg:
        (seg_t_inv, seg_c_inv, seg_R_inv, seg_diag, seg_blk, seg_row,
         seg_col) = _build_segment_factors(mg, xi, seg_size,
                                           lam_max / precon_cond)
    else:
        seg_t_inv = np.zeros((N, 1, 1, 1))
        seg_c_inv = np.zeros((N, 1, 1))
        seg_R_inv = np.zeros((N, 1, 1, 1))
        seg_diag = np.zeros((N, 1, 1, 1))
        seg_blk = np.zeros((N, 1, 1, 1))
        seg_row = np.zeros((N, 1), np.int32)
        seg_col = np.zeros((N, 1), np.int32)

    # Fused-STPCG block panels: only when the kernel is usable (f32 blocks
    # whose two operator panels fit VMEM together; d = 2 and 3 supported).
    from dpgo_tpu.ops import pallas_stpcg as _pk
    fused = (dense and d in (2, 3) and dtype == jnp.float32
             and _pk.fits_vmem(n0m, d))
    if fused:
        n_pad = max(-(-n0m // _pk.LANE) * _pk.LANE, _pk.LANE)
        Hpan = np.stack([_pk.block_panels(Hred_d[a], d, n_pad)
                         for a in range(N)])
        Ppan = np.stack([_pk.block_panels(precon_dense[a], d, n_pad)
                         for a in range(N)])
    else:
        Hpan = np.zeros((N, 1, 1, 1))
        Ppan = np.zeros((N, 1, 1, 1))

    # One-hot inter-edge scatter operator (dense path): Asel @ vals is the
    # MXU replacement for the per-iteration at[e_self].add scatter. Padded
    # edges carry zero tau/kappa so masking is belt-and-braces.
    if dense:
        m1m = mg.e_self.shape[1]
        Asel = np.zeros((N, n0m, max(m1m, 1)))
        cols = np.arange(m1m)
        for a in range(N):
            Asel[a][mg.e_self[a], cols] = mg.e_mask[a].astype(float)
    else:
        Asel = np.zeros((N, 1, 1))

    cast = lambda x: jnp.asarray(x, dtype)
    return NodeProblem(
        d=d, xi=xi, loss=loss, loss_reg=loss_reg,
        pose_mask=jnp.asarray(mg.pose_mask),
        diagT_inv=cast(Tinv), nvec=cast(nvec), W=cast(W),
        Minv_red=cast(Minv_red), null_V=cast(null_V),
        precon_inv=cast(precon_inv),
        dense=dense, mG00_d=cast(mG00_full), mG01_d=cast(mG01_d),
        mG11_d=cast(mG11_d), Hred_d=cast(Hred_d),
        precon_dense=cast(precon_dense),
        Hpan=jnp.asarray(Hpan, jnp.float32),
        Asel=cast(Asel),
        Ppan=jnp.asarray(Ppan, jnp.float32),
        dynamic=False, scale_w=jnp.ones((N, mg.m1_max), dtype),
        ipose=jnp.asarray(ipose), imask=jnp.asarray(imask),
        SU=cast(SU), wood_C=jnp.zeros((N, kmax, kmax), dtype),
        a_i=jnp.asarray(mg.a_i), a_j=jnp.asarray(mg.a_j),
        a_R=cast(mg.a_R), a_t=cast(mg.a_t),
        a_kap=cast(mg.a_kap), a_tau=cast(mg.a_tau),
        e_self=jnp.asarray(mg.e_self), e_slot=jnp.asarray(mg.e_slot),
        e_self_is_i=jnp.asarray(mg.e_self_is_i),
        e_R=cast(mg.e_R), e_t=cast(mg.e_t),
        e_kap=cast(mg.e_kap), e_tau=cast(mg.e_tau),
        seg=seg, seg_size=seg_size, seg_cg_iters=seg_cg_iters,
        seg_cg_tol=seg_cg_tol,
        seg_t_inv=cast(seg_t_inv), seg_c_inv=cast(seg_c_inv),
        seg_R_inv=cast(seg_R_inv),
        seg_diag=cast(seg_diag), seg_blk=cast(seg_blk),
        seg_row=jnp.asarray(seg_row), seg_col=jnp.asarray(seg_col),
    )
