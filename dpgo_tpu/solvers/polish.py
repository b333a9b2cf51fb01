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

    return TNTModel(objective=objective, grad_and_nabla=grad_and_nabla,
                    hess_vp=hess_vp, precondition=precondition,
                    retract=retract)


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
                     stepsize_tolerance=0.0)


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
