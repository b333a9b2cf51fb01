"""Eigenvalue estimation utilities.

The reference vendors Spectra (Lanczos/Arnoldi, C++/Spectra/include) solely
to estimate lambda_max of the rotational surrogate block for the
RegularizedCholesky preconditioner (DPGOProblem.cpp:101-124), and the
Optimization library's LOBPCG for certification min-eigenpairs
(sesync/staircase.py hosts that one). Here:

- `lanczos_extreme` — restarted Lanczos with full reorthogonalization (the
  SymEigsSolver<LARGEST_MAGN> role): extreme eigenvalues of a symmetric
  operator to a requested tolerance.
- `power_iteration_max` — cheap fallback for lambda_max only.

Both are host/numpy: they run once at problem-setup time.
"""

from __future__ import annotations

import numpy as np


def lanczos_extreme(matvec, n: int, which: str = "max", m: int = 30,
                    tol: float = 1e-8, seed: int = 0,
                    max_restarts: int = 20) -> tuple[float, np.ndarray]:
    """Extreme eigenpair of a symmetric operator by (thick-restart-free)
    Lanczos with full reorthogonalization.

    which: "max" (largest algebraic), "min" (smallest algebraic), or
    "max_abs" (largest magnitude — Spectra's LARGEST_MAGN mode,
    DPGOProblem.cpp:106-118). Returns (eigenvalue, eigenvector). Restarts
    from the current Ritz vector until the eigen-residual
    |A v - lam v| <= tol * max(|lam|, 1)."""
    rng = np.random.default_rng(seed)
    v0 = rng.normal(size=n)
    v0 /= np.linalg.norm(v0)
    m = min(m, n)

    lam, vec = 0.0, v0
    for _ in range(max_restarts):
        V = np.zeros((n, m))
        alpha = np.zeros(m)
        beta = np.zeros(m)
        V[:, 0] = vec
        w = np.asarray(matvec(V[:, 0]), float)
        alpha[0] = V[:, 0] @ w
        w = w - alpha[0] * V[:, 0]
        k_used = m
        for k in range(1, m):
            b = np.linalg.norm(w)
            if b < 1e-14:
                k_used = k
                break
            V[:, k] = w / b
            # Full reorthogonalization (small m; robust like Spectra's).
            V[:, k] -= V[:, :k] @ (V[:, :k].T @ V[:, k])
            nv = np.linalg.norm(V[:, k])
            if nv < 1e-14:
                k_used = k
                break
            V[:, k] /= nv
            beta[k - 1] = b
            w = np.asarray(matvec(V[:, k]), float)
            alpha[k] = V[:, k] @ w
            w = w - alpha[k] * V[:, k] - beta[k - 1] * V[:, k - 1]
        T = np.diag(alpha[:k_used]) + np.diag(beta[:k_used - 1], 1) \
            + np.diag(beta[:k_used - 1], -1)
        theta, U = np.linalg.eigh(T)
        if which == "max":
            idx = -1
        elif which == "min":
            idx = 0
        else:  # max_abs
            idx = int(np.argmax(np.abs(theta)))
        lam = float(theta[idx])
        vec = V[:, :k_used] @ U[:, idx]
        vec /= np.linalg.norm(vec)
        resid = np.linalg.norm(np.asarray(matvec(vec), float) - lam * vec)
        if resid <= tol * max(abs(lam), 1.0) or k_used < m:
            break
    return lam, vec


def lambda_max_lanczos(A: np.ndarray, tol: float = 1e-6,
                       seed: int = 0) -> float:
    """Largest-magnitude eigenvalue of dense symmetric A (Spectra's
    SymEigsSolver<LARGEST_MAGN, ...> role)."""
    lam, _ = lanczos_extreme(lambda v: A @ v, A.shape[0], which="max_abs",
                             tol=tol, seed=seed)
    return abs(lam)


def power_iteration_max(matvec, n: int, iters: int = 50, seed: int = 0,
                        tol: float = 1e-4) -> float:
    """Largest-magnitude eigenvalue of a symmetric operator (numpy)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=n)
    v /= np.linalg.norm(v)
    lam = 0.0
    for _ in range(iters):
        w = matvec(v)
        lam_new = float(v @ w)
        nw = np.linalg.norm(w)
        if nw == 0:
            return 0.0
        v = w / nw
        if abs(lam_new - lam) <= tol * max(abs(lam_new), 1.0):
            lam = lam_new
            break
        lam = lam_new
    return abs(lam)


def power_iteration_max_dense(A: np.ndarray, iters: int = 50,
                              seed: int = 0) -> float:
    return power_iteration_max(lambda v: A @ v, A.shape[0], iters=iters,
                               seed=seed)
