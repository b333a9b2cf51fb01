"""Synthetic pose-graph generators for tests (no dataset dependency)."""

from __future__ import annotations

import numpy as np

from dpgo_tpu.io.g2o import Measurements


def _rand_rot(rng: np.random.Generator, d: int) -> np.ndarray:
    A = rng.normal(size=(d, d))
    q, r = np.linalg.qr(A)
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, -1] *= -1
    return q


def random_pose_graph(rng: np.random.Generator, num_poses: int = 40, d: int = 3,
                      loop_closures: int = 15, noise: float = 0.05
                      ) -> tuple[Measurements, np.ndarray, np.ndarray]:
    """Odometry chain + random loop closures with noisy measurements.

    Returns (measurements, t_true [P, d], R_true [P, d, d]).
    """
    R_true = np.stack([_rand_rot(rng, d) for _ in range(num_poses)])
    t_true = rng.normal(size=(num_poses, d)) * 2.0

    edges_i, edges_j = [], []
    for k in range(num_poses - 1):
        edges_i.append(k)
        edges_j.append(k + 1)
    for _ in range(loop_closures):
        i, j = rng.integers(0, num_poses, size=2)
        if i != j:
            edges_i.append(min(i, j))
            edges_j.append(max(i, j))
    ei = np.array(edges_i)
    ej = np.array(edges_j)
    m = ei.shape[0]

    R_meas = np.empty((m, d, d))
    t_meas = np.empty((m, d))
    for k in range(m):
        # Measurement maps frame j into frame i: R~ = R_i^T R_j (+ noise),
        # t~ = R_i^T (t_j - t_i) (+ noise).
        Rn = _rand_rot(rng, d) if noise > 0 else np.eye(d)
        # small rotation noise via matrix exponential surrogate: blend+project
        W = rng.normal(size=(d, d)) * noise
        W = W - W.T
        from scipy.linalg import expm
        R_meas[k] = R_true[ei[k]].T @ R_true[ej[k]] @ expm(W)
        t_meas[k] = R_true[ei[k]].T @ (t_true[ej[k]] - t_true[ei[k]]) \
            + rng.normal(size=d) * noise

    meas = Measurements(
        i=ei.astype(np.int64), j=ej.astype(np.int64),
        R=R_meas, t=t_meas,
        kappa=rng.uniform(1.0, 5.0, size=m),
        tau=rng.uniform(1.0, 5.0, size=m),
        num_poses=num_poses, d=d,
    )
    return meas, t_true, R_true
