"""Eigenvalue estimation utilities.

The reference vendors Spectra (Lanczos) solely to estimate lambda_max of the
rotational surrogate block for the RegularizedCholesky preconditioner
(DPGOProblem.cpp:101-124), and the Optimization library's LOBPCG for
certification min-eigenpairs (sesync/staircase.py hosts that one). Here:
power iteration for lambda_max (host/numpy and jnp variants).
"""

from __future__ import annotations

import numpy as np


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
