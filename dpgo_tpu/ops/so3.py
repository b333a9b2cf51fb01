"""Fast batched projection onto SO(3): branch-free Newton polar iteration.

The TPU analog of the reference's hand-written AVX2 batched 3x3 SVD kernels
(C++/DPGO/include/DPGO/internal/svd3x3.h, project_to_SO3.h): XLA's generic
jnp.linalg.svd lowers to a sequential QR-iteration loop that costs ~14 ms for
a few thousand 3x3 blocks on TPU; the iteration below is pure VPU element-wise
math over the batch (~30 us for the same workload).

Method: scaled Higham-Newton iteration X <- (zeta X + (zeta X)^-T)/2 converges
quadratically to the orthogonal polar factor Q with det(Q) = sign(det(A)).
For det(A) < 0 the Frobenius-closest SO(3) matrix is not Q but
U diag(1, 1, -1) V^T = Q (I - 2 v3 v3^T), where v3 is the eigenvector of the
SPD factor H = Q^T A for its smallest eigenvalue — computed in closed form
(trigonometric eigenvalue formula + cross-product null vector), all
`jnp.where`-selected so the whole pipeline is branch-free and batchable.
"""

from __future__ import annotations

import jax.numpy as jnp

_NEWTON_ITERS = 9


def _adjugate_T(X):
    """Transpose of the adjugate of [..., 3, 3]: adj(X)^T[i, j] = cofactor."""
    a, b, c = X[..., 0, 0], X[..., 0, 1], X[..., 0, 2]
    d, e, f = X[..., 1, 0], X[..., 1, 1], X[..., 1, 2]
    g, h, i = X[..., 2, 0], X[..., 2, 1], X[..., 2, 2]
    c00 = e * i - f * h
    c01 = f * g - d * i
    c02 = d * h - e * g
    c10 = c * h - b * i
    c11 = a * i - c * g
    c12 = b * g - a * h
    c20 = b * f - c * e
    c21 = c * d - a * f
    c22 = a * e - b * d
    row0 = jnp.stack([c00, c01, c02], axis=-1)
    row1 = jnp.stack([c10, c11, c12], axis=-1)
    row2 = jnp.stack([c20, c21, c22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def _det3(X):
    return (X[..., 0, 0] * (X[..., 1, 1] * X[..., 2, 2]
                            - X[..., 1, 2] * X[..., 2, 1])
            - X[..., 0, 1] * (X[..., 1, 0] * X[..., 2, 2]
                              - X[..., 1, 2] * X[..., 2, 0])
            + X[..., 0, 2] * (X[..., 1, 0] * X[..., 2, 1]
                              - X[..., 1, 1] * X[..., 2, 0]))


def _inv_T(X, eps):
    """X^-T via adjugate, det clamped away from zero."""
    det = _det3(X)
    safe = jnp.where(jnp.abs(det) > eps, det,
                     jnp.where(det >= 0, eps, -eps))
    return _adjugate_T(X) / safe[..., None, None]


def polar_so3(A: jnp.ndarray) -> jnp.ndarray:
    """Project [..., 3, 3] onto SO(3) (Frobenius-closest, det fix included)."""
    dtype = A.dtype
    eps = jnp.asarray(1e-30 if dtype == jnp.float64 else 1e-18, dtype)

    # Normalize scale; degenerate (zero) input maps to identity.
    nrm = jnp.sqrt(jnp.sum(A * A, axis=(-1, -2), keepdims=True))
    ok = nrm[..., 0, 0] > eps
    X = jnp.where(ok[..., None, None], A / jnp.maximum(nrm, eps),
                  jnp.eye(3, dtype=dtype))

    for _ in range(_NEWTON_ITERS):
        Xinv_T = _inv_T(X, eps)
        # Higham 1,inf-norm scaling accelerates early iterations.
        nx = jnp.sum(X * X, axis=(-1, -2))
        ni = jnp.sum(Xinv_T * Xinv_T, axis=(-1, -2))
        zeta = (ni / jnp.maximum(nx, eps)) ** 0.25
        zeta = zeta[..., None, None]
        X = 0.5 * (zeta * X + Xinv_T / zeta)

    Q = X  # orthogonal, det = sign(det A)

    # det < 0 correction: Q (I - 2 v3 v3^T) with v3 the smallest-eigenvalue
    # eigenvector of H = Q^T A (SPD up to sign).
    H = jnp.einsum("...ki,...kj->...ij", Q, A)
    H = 0.5 * (H + jnp.swapaxes(H, -1, -2))
    q = jnp.trace(H, axis1=-2, axis2=-1) / 3.0
    Hq = H - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p = jnp.sqrt(jnp.maximum(jnp.sum(Hq * Hq, axis=(-1, -2)) / 6.0, eps))
    B = Hq / p[..., None, None]
    r = jnp.clip(0.5 * _det3(B), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # Smallest eigenvalue of H.
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    M = H - lam3[..., None, None] * jnp.eye(3, dtype=dtype)
    # Null vector of M: the largest cross product of two rows.
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c12 = jnp.cross(r1, r2)
    c20 = jnp.cross(r2, r0)
    cands = jnp.stack([c01, c12, c20], axis=-2)
    norms = jnp.sum(cands * cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    v = v / jnp.maximum(jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True)),
                        eps)
    refl = jnp.eye(3, dtype=dtype) - 2.0 * v[..., :, None] * v[..., None, :]
    Q_fixed = jnp.einsum("...ik,...kj->...ij", Q, refl)

    neg = _det3(A) < 0
    R = jnp.where(neg[..., None, None], Q_fixed, Q)
    return jnp.where(ok[..., None, None], R, jnp.eye(3, dtype=dtype))
