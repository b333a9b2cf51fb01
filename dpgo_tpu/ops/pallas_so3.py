"""Pallas TPU kernel: batched projection onto SO(3).

The direct TPU analog of the reference's AVX2 batched 3x3 SVD kernels
(C++/DPGO/include/DPGO/internal/svd3x3.h, project_to_SOd.cpp): matrices are
laid out structure-of-arrays as 9 rows x n lanes so every arithmetic op is a
full-width VPU instruction over the batch, exactly like the reference's
"batch of 4/8 in AVX lanes" — here the batch width is the lane dimension
(128) times the tile. The math is the same scaled Newton polar iteration +
closed-form det<0 correction as ops/so3.py (which remains the portable
reference implementation the kernel is tested against).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEWTON_ITERS = 9
_LANE_TILE = 512


def _mul(x, y):
    """3x3 matmul on 9-tuples of lane vectors (row-major)."""
    return (
        x[0] * y[0] + x[1] * y[3] + x[2] * y[6],
        x[0] * y[1] + x[1] * y[4] + x[2] * y[7],
        x[0] * y[2] + x[1] * y[5] + x[2] * y[8],
        x[3] * y[0] + x[4] * y[3] + x[5] * y[6],
        x[3] * y[1] + x[4] * y[4] + x[5] * y[7],
        x[3] * y[2] + x[4] * y[5] + x[5] * y[8],
        x[6] * y[0] + x[7] * y[3] + x[8] * y[6],
        x[6] * y[1] + x[7] * y[4] + x[8] * y[7],
        x[6] * y[2] + x[7] * y[5] + x[8] * y[8],
    )


def _transpose(x):
    return (x[0], x[3], x[6], x[1], x[4], x[7], x[2], x[5], x[8])


def _det(x):
    return (x[0] * (x[4] * x[8] - x[5] * x[7])
            - x[1] * (x[3] * x[8] - x[5] * x[6])
            + x[2] * (x[3] * x[7] - x[4] * x[6]))


def _adj_T(x):
    """Transpose of the adjugate (cofactor matrix)."""
    return (
        x[4] * x[8] - x[5] * x[7],
        x[5] * x[6] - x[3] * x[8],
        x[3] * x[7] - x[4] * x[6],
        x[2] * x[7] - x[1] * x[8],
        x[0] * x[8] - x[2] * x[6],
        x[1] * x[6] - x[0] * x[7],
        x[1] * x[5] - x[2] * x[4],
        x[2] * x[3] - x[0] * x[5],
        x[0] * x[4] - x[1] * x[3],
    )


def _fnorm2(x):
    return sum(v * v for v in x)


def _kernel(in_ref, out_ref):
    eps = 1e-18
    A = tuple(in_ref[k, :] for k in range(9))

    nrm = jnp.sqrt(_fnorm2(A))
    ok = nrm > eps
    inv_n = jnp.where(ok, 1.0 / jnp.maximum(nrm, eps), 1.0)
    ident = (jnp.ones_like(A[0]), 0.0 * A[0], 0.0 * A[0],
             0.0 * A[0], jnp.ones_like(A[0]), 0.0 * A[0],
             0.0 * A[0], 0.0 * A[0], jnp.ones_like(A[0]))
    X = tuple(jnp.where(ok, a * inv_n, i) for a, i in zip(A, ident))

    for _ in range(_NEWTON_ITERS):
        det = _det(X)
        safe = jnp.where(jnp.abs(det) > eps, det,
                         jnp.where(det >= 0, eps, -eps))
        Xit = tuple(v / safe for v in _adj_T(X))
        nx = _fnorm2(X)
        ni = _fnorm2(Xit)
        zeta = jnp.sqrt(jnp.sqrt(ni / jnp.maximum(nx, eps)))
        X = tuple(0.5 * (zeta * a + b / zeta) for a, b in zip(X, Xit))

    Q = X
    # det < 0 correction: Q (I - 2 v v^T), v = min-eigvec of H = Q^T A.
    H = _mul(_transpose(Q), A)
    Hs = (H[0], 0.5 * (H[1] + H[3]), 0.5 * (H[2] + H[6]),
          0.5 * (H[1] + H[3]), H[4], 0.5 * (H[5] + H[7]),
          0.5 * (H[2] + H[6]), 0.5 * (H[5] + H[7]), H[8])
    # Smallest eigenvalue of Hs by Newton iteration on the characteristic
    # cubic from below (Pallas TPU lowering has no acos, so the usual
    # trigonometric closed form is unavailable). All roots lie in
    # [q - 2p, q + 2p]; f is increasing and concave left of the smallest
    # root, so Newton from q - 2p converges monotonically from below.
    # Work on the normalized trace-free matrix B = (H - q I)/p whose
    # characteristic cubic is y^3 - 3y - det(B) = 0 with roots in [-2, 2]
    # (well-conditioned in f32, unlike the raw cubic); then
    # lambda_min = q + p y_min. Newton from y = -2 converges monotonically.
    q = (Hs[0] + Hs[4] + Hs[8]) / 3.0
    Hq = (Hs[0] - q, Hs[1], Hs[2], Hs[3], Hs[4] - q, Hs[5],
          Hs[6], Hs[7], Hs[8] - q)
    p = jnp.sqrt(jnp.maximum(_fnorm2(Hq) / 6.0, eps))
    B = tuple(v / p for v in Hq)
    r0 = jnp.clip(_det(B), -2.0, 2.0)
    y = jnp.full_like(r0, -2.0) - 1e-4
    for _ in range(30):
        fval = (y * y - 3.0) * y - r0
        fp = 3.0 * y * y - 3.0
        y = y - fval / jnp.where(jnp.abs(fp) > eps, fp,
                                 jnp.where(fp >= 0, eps, -eps))
    lam3 = q + p * jnp.minimum(y, 2.0)
    M = (Hs[0] - lam3, Hs[1], Hs[2], Hs[3], Hs[4] - lam3, Hs[5],
         Hs[6], Hs[7], Hs[8] - lam3)

    def cross(r0, r1, r2, s0, s1, s2):
        return (r1 * s2 - r2 * s1, r2 * s0 - r0 * s2, r0 * s1 - r1 * s0)

    c01 = cross(M[0], M[1], M[2], M[3], M[4], M[5])
    c12 = cross(M[3], M[4], M[5], M[6], M[7], M[8])
    c20 = cross(M[6], M[7], M[8], M[0], M[1], M[2])
    n01 = sum(v * v for v in c01)
    n12 = sum(v * v for v in c12)
    n20 = sum(v * v for v in c20)
    use12 = (n12 >= n01) & (n12 >= n20)
    use20 = (~use12) & (n20 >= n01)
    v = tuple(jnp.where(use12, a, jnp.where(use20, b, c))
              for a, b, c in zip(c12, c20, c01))
    vn = jnp.maximum(jnp.sqrt(sum(x * x for x in v)), eps)
    v = tuple(x / vn for x in v)
    refl = (1.0 - 2.0 * v[0] * v[0], -2.0 * v[0] * v[1], -2.0 * v[0] * v[2],
            -2.0 * v[1] * v[0], 1.0 - 2.0 * v[1] * v[1],
            -2.0 * v[1] * v[2],
            -2.0 * v[2] * v[0], -2.0 * v[2] * v[1],
            1.0 - 2.0 * v[2] * v[2])
    Q_fix = _mul(Q, refl)

    neg = _det(A) < 0
    R = tuple(jnp.where(neg, a, b) for a, b in zip(Q_fix, Q))
    R = tuple(jnp.where(ok, a, i) for a, i in zip(R, ident))
    for k in range(9):
        out_ref[k, :] = R[k]


@functools.partial(jax.jit, static_argnames=("interpret",))
def polar_so3_pallas(A: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Project [n, 3, 3] onto SO(3) via the Pallas SoA kernel."""
    n = A.shape[0]
    npad = max(-(-n // _LANE_TILE) * _LANE_TILE, _LANE_TILE)
    X = jnp.transpose(A, (1, 2, 0)).reshape(9, n)
    X = jnp.pad(X, ((0, 0), (0, npad - n)))

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((9, npad), A.dtype),
        grid=(npad // _LANE_TILE,),
        in_specs=[pl.BlockSpec((9, _LANE_TILE), lambda i: (0, i),
                               memory_space=pltpu.ANY
                               if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec((9, _LANE_TILE), lambda i: (0, i),
                               memory_space=pltpu.ANY
                               if interpret else pltpu.VMEM),
        interpret=interpret,
    )(X)
    return jnp.transpose(out[:, :n].reshape(3, 3, n), (2, 0, 1))
