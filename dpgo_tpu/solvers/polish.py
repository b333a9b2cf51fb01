"""Global Riemannian trust-region polish of the full pose graph.

The reference framework never couples nodes inside a second-order solve: its
TNT refinement is strictly per-node (block-diagonal Hessian), because every
inner CG iteration would otherwise cost one robot-network message round
(DPGOProblem.cpp:552-577 — the Hessian-vp is local by design). On TPU the
"network" is ICI / an on-device gather, so a GLOBAL truncated-Newton step —
whose Hessian-vector product needs exactly one halo exchange per CG
iteration — is cheap. This module runs Riemannian TNT (solvers/tnt.py, the
same machinery as the per-node refinement and the SE-Sync staircase) on the
full coupled problem E = R^{P x d} x SO(d)^P, using the matrix-free global
objective/gradient oracle (objective.py = DPGOStar::evaluate_f/grad,
DPGOStar.cpp:713-829) and a JVP Hessian.

Use: tail acceleration. The MM fixed point propagates information one
pose-graph hop per iteration, so large-diameter graphs (city10000, MITb)
take hundreds of iterations for the last 1e-4; the global Newton step
collapses that tail superlinearly. Typical recipe: AMM-PGO# bulk phase ->
`polish()` for a handful of outer iterations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dpgo_tpu.losses import Loss
from dpgo_tpu.manifold import (proj_tangent, project_sod,
                               sym_block_diag_product)
from dpgo_tpu.objective import (EdgeData, evaluate_euclidean_grad,
                                evaluate_f)
from dpgo_tpu.solvers.tnt import TNTModel, TNTParams, tnt_generic


def global_tnt_model(edges: EdgeData, loss: Loss = Loss.TRIVIAL,
                     loss_reg: float = 1.0, num_poses: int | None = None,
                     precondition=None) -> TNTModel:
    """TNTModel over the global variable x = (t [P, d], R [P, d, d]).

    `precondition(x, v) -> v'` overrides the built-in per-pose Jacobi
    preconditioner (driver.polish passes the node-block surrogate
    preconditioner — exact per-node mG00 solves + the dense regularized
    mG11 inverse — which collapses intra-node conditioning exactly)."""

    def objective(x):
        return evaluate_f(edges, x[0], x[1], loss, loss_reg)

    def nabla_fn(x):
        return evaluate_euclidean_grad(edges, x[0], x[1], loss, loss_reg)

    def grad_and_nabla(x):
        nabla = nabla_fn(x)
        return (nabla[0], proj_tangent(x[1], nabla[1])), nabla

    def hess_vp(x, nabla, v):
        # Riemannian Hessian on the embedded product manifold: directional
        # derivative of the Euclidean gradient (exact via JVP — includes the
        # robust-loss weight derivatives), minus the SO(d) curvature
        # correction v_R sym(R^T nabla_R), tangent-projected (the same
        # correction as the per-node reduced Hessian, problem.py
        # reduced_hessian_vp / DPGOProblem.cpp:552-577).
        _, (Ht, HR) = jax.jvp(nabla_fn, (x,), (v,))
        HR = HR - sym_block_diag_product(v[1], x[1], nabla[1])
        return (Ht, proj_tangent(x[1], HR))

    # Jacobi preconditioner from per-pose stiffness scalars: translations see
    # the weighted-Laplacian diagonal sum(tau); rotations the connection-
    # Laplacian diagonal scale kappa (+ tau |t~|^2 on the i side). A scalar
    # per pose is enough to equalize the wildly varying edge precisions
    # (tau/kappa span ~6 decades across the bundled datasets).
    if precondition is None:
        P = num_poses if num_poses is not None else int(jnp.max(edges.j)) + 1
        tnorm2 = jnp.sum(edges.t * edges.t, axis=-1)
        wt = (jnp.zeros((P,), edges.tau.dtype)
              .at[edges.i].add(edges.tau).at[edges.j].add(edges.tau))
        wR = (jnp.zeros((P,), edges.tau.dtype)
              .at[edges.i].add(edges.kappa + edges.tau * tnorm2)
              .at[edges.j].add(edges.kappa))
        wt = jnp.maximum(wt, 1e-12)
        wR = jnp.maximum(wR, 1e-12)

        def precondition(x, v):
            return (v[0] / wt[:, None],
                    proj_tangent(x[1], v[1] / wR[:, None, None]))

    def retract(x, h):
        return (x[0] + h[0], project_sod(x[1] + h[1]))

    # precon_spans_full_space=False: every polish preconditioner (node-
    # block base, optionally + rigid coarse levels) deliberately excludes
    # part of the inter-node coupling, so the f32 noise-floor gate must
    # stay off regardless of what TNTParams the caller passes (the
    # round-4 silent-no-op regression, now structural).
    return TNTModel(objective=objective, grad_and_nabla=grad_and_nabla,
                    hess_vp=hess_vp, precondition=precondition,
                    retract=retract, precon_spans_full_space=False)


def _skew_basis(d: int) -> jnp.ndarray:
    """Orthonormal-ish basis of skew d x d matrices [s, d, d]."""
    if d == 2:
        return jnp.asarray([[[0.0, -1.0], [1.0, 0.0]]])
    S = []
    for (a, b) in ((0, 1), (0, 2), (1, 2)):
        M = [[0.0] * 3 for _ in range(3)]
        M[a][b] = -1.0
        M[b][a] = 1.0
        S.append(M)
    return jnp.asarray(S)


def _rigid_coarse_correction(hess_vp_fn, nabla, x0, block_of, num_blocks,
                             reg: float = 1e-8, chunk: int = 128):
    """Build one coarse-level correction v -> P A_c^+ P^T v over per-block
    RIGID MOTIONS (one rotation + one translation per block).

    Block-diagonal preconditioners are blind to cross-block lever arms: on
    corridor graphs (ais2klinik) a rotation at one end moves translations at
    the other by (graph length) x angle, so the Hessian's slow modes are
    smooth block-rigid motions with curvature ~ tau L^2. The coarse space
    spans exactly those modes: for block a with skew basis S_k,
      P(w, u)|_p = (W t_p - W c_a + u,  W R_p),  W = sum_k w_k S_k, p in a.
    The Galerkin operator A_c = P^T H(x0) P is built with a chunked vmapped
    Hessian pass and pseudo-inverted (the global rigid motion is the gauge
    null space -> eigenvalue clip). A standard two-level/deflation
    construction, re-expressed for the pose-graph block structure.
    """
    t0, R0 = x0
    d = t0.shape[-1]
    S = _skew_basis(d).astype(t0.dtype)       # [s, d, d]
    s = S.shape[0]
    N = num_blocks
    # center each block so rotation/translation coarse dofs decouple
    ones = jnp.zeros((N,), t0.dtype).at[block_of].add(1.0)
    c = (jnp.zeros((N, d), t0.dtype).at[block_of].add(t0)
         / jnp.maximum(ones, 1.0)[:, None])
    tc = t0 - c[block_of]
    K = s + d

    def P_apply(coef):
        w = coef[:, :s]
        u = coef[:, s:]
        Wp = jnp.einsum("ns,sab->nab", w, S)[block_of]
        vR = jnp.einsum("pab,pbc->pac", Wp, R0)
        vt = jnp.einsum("pab,pb->pa", Wp, tc) + u[block_of]
        return vt, vR

    def P_adj(v):
        vt, vR = v
        aw = (jnp.einsum("sab,pbc,pac->ps", S, R0, vR)
              + jnp.einsum("sab,pb,pa->ps", S, tc, vt))
        w = jnp.zeros((N, s), t0.dtype).at[block_of].add(aw)
        u = jnp.zeros((N, d), t0.dtype).at[block_of].add(vt)
        return jnp.concatenate([w, u], axis=1)

    # Galerkin coarse operator via a chunked vmapped Hessian pass over the
    # basis (chunking bounds the [NK, P, d, d] intermediates for fine
    # levels, where NK reaches a few thousand). Each chunk's one-hot
    # coefficient block is generated on the fly from its index range —
    # never materializing the full [n_pad, n] identity (~GB at a
    # 1024-segment 3-D level).
    n = N * K
    n_pad = ((n + chunk - 1) // chunk) * chunk

    def one_chunk(ci):
        idx = ci * chunk + jnp.arange(chunk)
        coefs = jax.nn.one_hot(idx, n, dtype=t0.dtype).reshape(chunk, N, K)
        Vt, VR = jax.vmap(P_apply)(coefs)
        HV = jax.vmap(lambda vt, vR: hess_vp_fn(x0, nabla, (vt, vR)))(Vt, VR)
        return jax.vmap(lambda ht, hR: P_adj((ht, hR)).reshape(-1))(*HV)

    A = jax.lax.map(one_chunk,
                    jnp.arange(n_pad // chunk)).reshape(n_pad, n)[:n]
    A = 0.5 * (A + A.T)
    lam, Q = jnp.linalg.eigh(A)
    lam_max = jnp.maximum(lam[-1], 1e-30)
    lam_inv = jnp.where(lam > reg * lam_max, 1.0 / jnp.maximum(lam, 1e-30),
                        0.0)

    def correction(v):
        coef = P_adj(v).reshape(-1)
        y = (Q @ (lam_inv * (Q.T @ coef))).reshape(N, K)
        return P_apply(y)

    return correction


def coarse_rigid_preconditioner(hess_vp_fn, nabla, x0, node_of, num_nodes,
                                base_precon, reg: float = 1e-8):
    """Two-level preconditioner: block solve + per-node rigid coarse
    correction, applied additively:
      M v = M_block v + P A_c^+ P^T v   (SPD on the gauge complement)."""
    corr = _rigid_coarse_correction(hess_vp_fn, nabla, x0, node_of,
                                    num_nodes, reg)

    def precondition(x, v):
        bt, bR = base_precon(x, v)
        ct, cR = corr(v)
        return (bt + ct, proj_tangent(x[1], bR + cR))

    return precondition


def contiguous_segments(num_poses: int, num_segments: int) -> jnp.ndarray:
    """Label poses with `num_segments` equal contiguous blocks [P] int32.

    Pose ids in the bundled datasets follow the trajectory, so contiguous id
    ranges are contiguous stretches of the robot path — the right coarse
    blocks for corridor-style conditioning."""
    seg = (jnp.arange(num_poses, dtype=jnp.int32) * num_segments) // num_poses
    return jnp.minimum(seg, num_segments - 1)


def multilevel_rigid_preconditioner(hess_vp_fn, nabla, x0, levels,
                                    base_precon, reg: float = 1e-8):
    """Additive multilevel (BPX-style) preconditioner: block solve + rigid
    coarse corrections at every granularity in `levels`.

    `levels` is a sequence of (block_of [P] int, num_blocks). A single coarse
    level only equalizes modes at wavelengths >= its block size; corridor
    graphs (ais2klinik) have slow bending modes at EVERY scale between the
    pose spacing and the graph diameter (curvature ~ tau * wavelength^2), so
    the hierarchy sums corrections over a geometric ladder of segment sizes.
    Each level's Galerkin operator is built once at x0 and pseudo-inverted
    with a gauge-null eigenvalue clip; nested levels overcount smooth modes
    by at most the number of levels — a log factor CG absorbs."""
    corrs = [_rigid_coarse_correction(hess_vp_fn, nabla, x0, blk, nb, reg)
             for blk, nb in levels]

    def precondition(x, v):
        ct, cR = base_precon(x, v)
        for corr in corrs:
            dt, dR = corr(v)
            ct = ct + dt
            cR = cR + dR
        return (ct, proj_tangent(x[1], cR))

    return precondition


def polish_params(outer: int = 20, tcg: int = 500,
                  grad_tol: float = 0.0) -> TNTParams:
    """TNT parameters tuned for the polish role: run every outer iteration
    (no single-accept early exit), superlinear forcing from TNT defaults."""
    return TNTParams(max_iterations=outer, max_iterations_accepted=outer,
                     max_tCG_iterations=tcg,
                     gradient_tolerance=grad_tol,
                     preconditioned_gradient_tolerance=0.0,
                     Delta_tolerance=0.0,
                     relative_decrease_tolerance=0.0,
                     stepsize_tolerance=0.0,
                     # The refinement-role f32 noise gate misfires here:
                     # the node-block preconditioner excludes inter-node
                     # coupling, so its model-decrease estimate is ~0 at
                     # any bulk-converged state (see TNTParams).
                     noise_floor_gate=False)


def polish_global(edges: EdgeData, t: jnp.ndarray, R: jnp.ndarray,
                  loss: Loss = Loss.TRIVIAL, loss_reg: float = 1.0,
                  params: TNTParams | None = None, precondition=None):
    """Run the global trust-region polish from (t, R).

    Returns (t, R, f_value). Jittable; the caller picks device/dtype by the
    input arrays.
    """
    params = params or polish_params()
    model = global_tnt_model(edges, loss, loss_reg, num_poses=t.shape[0],
                             precondition=precondition)
    x, fx, _, _ = tnt_generic(model, (t, R), params)
    return x[0], x[1], fx
