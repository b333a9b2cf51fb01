"""Host-side exact sparse Levenberg-Marquardt polish (f64, scipy).

Role: the tail-convergence fallback for pathologically conditioned graphs
(ais2klinik's multiscale corridor), where every iterative method — the AMM
fixed point, node-block/multilevel-preconditioned STPCG — plateaus because
the Hessian's condition number spans the corridor's scale hierarchy. A
sparse DIRECT solve is immune to conditioning: this module builds the exact
Gauss-Newton normal equations of the chordal PGO objective and factors them
with SuperLU (scipy.sparse.linalg.splu), converging quadratically from any
stationarity plateau.

This is the moral equivalent of the reference's CHOLMOD-backed second-order
machinery (Eigen::CholmodDecomposition, /root/reference/C++/DPGO/include/
DPGO/DPGO_types.h:27; TNT inner solves, DPGOProblem.cpp:93-124) — the one
architectural piece the TPU-first design replaced with preconditioned CG,
reintroduced here as a host-side f64 tool for the rare graph whose
conditioning defeats preconditioning. It is NOT on the TPU hot path.

Objective (matches dpgo_tpu.objective.evaluate_f, trivial loss):
    F(t, theta) = 1/2 sum_e  tau_e |t_i + R(th_i) t~_e - t_j|^2
                           + kappa_e |R(th_i) R~_e - R(th_j)|^2_F
For d = 2, |R(a) - R(b)|^2_F = 2 |u(a) - u(b)|^2 with u(th) = (cos, sin),
so F = 1/2 |r|^2 with per-edge residual rows
    r_t = sqrt(tau)  (t_i + R(th_i) t~ - t_j)            (2 rows)
    r_R = sqrt(2 kappa) (u(th_i + th~) - u(th_j))        (2 rows)
which is an exact nonlinear least-squares in (x, y, theta) per pose — no
manifold retraction needed (theta is an unconstrained chart of SO(2)).

Gauge: the LM damping term lam * diag(J^T J) regularizes the 3-dimensional
gauge null space; no anchoring required (the solution is reported in the
input's gauge up to the vanishing damped step along the null directions).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from dpgo_tpu.io.g2o import Measurements


@dataclasses.dataclass
class LMResult:
    t: np.ndarray        # [n, d]
    R: np.ndarray        # [n, d, d]
    f2x: float           # 2 * F at the solution
    grad_inf: float      # max |dF/d(t, theta)| (euclidean chart gradient)
    iters: int
    converged: bool


def _theta_of(R: np.ndarray) -> np.ndarray:
    return np.arctan2(R[:, 1, 0], R[:, 0, 0])


def _R_of(theta: np.ndarray) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    R = np.empty((theta.shape[0], 2, 2))
    R[:, 0, 0] = c
    R[:, 0, 1] = -s
    R[:, 1, 0] = s
    R[:, 1, 1] = c
    return R


def _residual_and_jac(meas: Measurements, t: np.ndarray, theta: np.ndarray,
                      want_jac: bool = True):
    """Stacked residual r [4m] and sparse Jacobian J [4m, 3n] (COO built
    vectorized; 6 nonzero columns per edge: x_i y_i th_i x_j y_j th_j)."""
    n = t.shape[0]
    i, j = meas.i, meas.j
    m = len(i)
    th_i, th_j = theta[i], theta[j]
    # Measurement rotation angle and translation.
    th_e = np.arctan2(meas.R[:, 1, 0], meas.R[:, 0, 0])
    te = meas.t  # [m, 2]
    st_, ct_ = np.sin(th_i), np.cos(th_i)
    # R(th_i) t~
    Rt = np.stack([ct_ * te[:, 0] - st_ * te[:, 1],
                   st_ * te[:, 0] + ct_ * te[:, 1]], axis=1)
    sq_tau = np.sqrt(meas.tau)
    sq_kap = np.sqrt(2.0 * meas.kappa)
    r_t = sq_tau[:, None] * (t[i] + Rt - t[j])              # [m, 2]
    a = th_i + th_e
    r_R = sq_kap[:, None] * np.stack(
        [np.cos(a) - np.cos(th_j), np.sin(a) - np.sin(th_j)], axis=1)
    r = np.concatenate([r_t.ravel(), r_R.ravel()])
    if not want_jac:
        return r, None, None

    # dRt/dth_i = R(th_i + pi/2) t~
    dRt = np.stack([-st_ * te[:, 0] - ct_ * te[:, 1],
                    ct_ * te[:, 0] - st_ * te[:, 1]], axis=1)
    rows = []
    cols = []
    vals = []

    def add(rr, cc, vv):
        rows.append(rr)
        cols.append(cc)
        vals.append(vv)

    e = np.arange(m)
    # Translation rows: row ids 2e, 2e+1.
    for comp in (0, 1):
        rr = 2 * e + comp
        add(rr, 3 * i + comp, sq_tau)                    # d/dx_i (or y_i)
        add(rr, 3 * j + comp, -sq_tau)
        add(rr, 3 * i + 2, sq_tau * dRt[:, comp])        # d/dth_i
    # Rotation rows: row ids 4m offset... place after translation block.
    base = 2 * m
    # r_R rows: [cos(a) - cos(th_j), sin(a) - sin(th_j)] * sq_kap
    add(base + 2 * e + 0, 3 * i + 2, -sq_kap * np.sin(a))
    add(base + 2 * e + 0, 3 * j + 2, sq_kap * np.sin(th_j))
    add(base + 2 * e + 1, 3 * i + 2, sq_kap * np.cos(a))
    add(base + 2 * e + 1, 3 * j + 2, -sq_kap * np.cos(th_j))
    J = sp.coo_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(4 * m, 3 * n)).tocsr()

    # Exact-Hessian curvature correction H = J^T J + diag(c): the residuals
    # are linear in t and trigonometric in theta only, so every second-order
    # term sum_k r_k Hess(r_k) lands on the theta diagonal:
    #   d2 r_t / dth_i^2 = -sqrt(tau) R(th_i) t~      (rotation is its own
    #   d2 r_R / dth_i^2 = -sqrt(2kap) u(th_i + th~)   negative 2nd deriv)
    #   d2 r_R / dth_j^2 = +sqrt(2kap) u(th_j)
    c_i = -sq_tau * np.einsum("ec,ec->e", r_t, Rt) \
        - sq_kap * (r_R[:, 0] * np.cos(a) + r_R[:, 1] * np.sin(a))
    c_j = sq_kap * (r_R[:, 0] * np.cos(th_j) + r_R[:, 1] * np.sin(th_j))
    curv = np.zeros(3 * n)
    np.add.at(curv, 3 * i + 2, c_i)
    np.add.at(curv, 3 * j + 2, c_j)
    return r, J, curv


def lm_polish_2d(meas: Measurements, t0: np.ndarray, R0: np.ndarray,
                 max_iters: int = 50, grad_tol: float = 1e-10,
                 lam0: float = 1e-6, newton: bool = True,
                 verbose: bool = False) -> LMResult:
    """Exact sparse damped-Newton polish of the d=2 chordal PGO objective.

    newton=True (default) solves with the EXACT Hessian J^T J + diag(curv)
    — quadratic local convergence; Gauss-Newton (newton=False) drops the
    curvature term and converges only linearly when residuals are large
    (observed on ais2klinik: GN shaves ~1.5%/iter off the gradient where
    full Newton converges in a handful of steps). Conditioning is irrelevant
    either way: the damped system is factored exactly by SuperLU. `grad_tol`
    is on the max-abs euclidean chart gradient J^T r — the stationarity the
    certificate machinery needs (S Y ~ 0)."""
    assert meas.d == 2, "lm_polish_2d: d=2 only (theta chart of SO(2))"
    t = np.asarray(t0, np.float64).copy()
    theta = _theta_of(np.asarray(R0, np.float64))
    lam = lam0
    r, J, curv = _residual_and_jac(meas, t, theta)
    f = 0.5 * float(r @ r)
    it = 0
    converged = False
    for it in range(1, max_iters + 1):
        g = J.T @ r
        ginf = float(np.max(np.abs(g)))
        if verbose:
            print(f"  lm iter {it - 1}: 2f={2 * f:.12g} |g|_inf={ginf:.3e} "
                  f"lam={lam:.1e}", flush=True)
        if ginf < grad_tol:
            converged = True
            break
        H = (J.T @ J).tocsc()
        if newton:
            H = (H + sp.diags(curv)).tocsc()
        dscale = np.maximum(np.abs(H.diagonal()), 1e-12)
        accepted = False
        for _ in range(40):
            A = (H + sp.diags(lam * dscale)).tocsc()
            try:
                lu = spla.splu(A)
                step = lu.solve(-g)
            except RuntimeError:
                lam = max(lam, 1e-12) * 10.0
                continue
            if not np.all(np.isfinite(step)):
                lam = max(lam, 1e-12) * 10.0
                continue
            t_new = t + step.reshape(-1, 3)[:, :2]
            th_new = theta + step.reshape(-1, 3)[:, 2]
            r_new, _, _ = _residual_and_jac(meas, t_new, th_new,
                                            want_jac=False)
            f_new = 0.5 * float(r_new @ r_new)
            pred = -float(g @ step) - 0.5 * float(step @ (H @ step))
            rho = (f - f_new) / max(pred, 1e-300)
            if f_new < f and (rho > 1e-4 or not newton):
                t, theta, f = t_new, th_new, f_new
                r, J, curv = _residual_and_jac(meas, t, theta)
                lam = max(lam * (0.2 if rho > 0.75 else 0.7), 1e-14)
                accepted = True
                break
            lam = max(lam, 1e-12) * 10.0
        if not accepted:
            break
    g = J.T @ r
    return LMResult(t=t, R=_R_of(theta), f2x=2 * f,
                    grad_inf=float(np.max(np.abs(g))), iters=it,
                    converged=converged)
