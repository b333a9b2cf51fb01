"""Centralized chordal initialization (SE-Sync style).

Host-side scipy implementation of the reference's
SESync::chordal_initialization + recover_translations
(C++/SESync/src/SESync_utils.cpp; used by dist_pgo.cpp:416-444 for the
centralized-init path): solve the rotation measurement system as an
unconstrained linear least squares with the first rotation pinned to the
identity, project each block to SO(d), then recover translations from the
tau-weighted translation Laplacian. One-time setup cost; runs on the host.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from dpgo_tpu.io.g2o import Measurements


def chordal_initialization(meas: Measurements) -> np.ndarray:
    """Returns R [P, d, d]: chordal rotation estimate, R[0] = I."""
    P, d, m = meas.num_poses, meas.d, len(meas)
    sk = np.sqrt(meas.kappa)

    # Residual rows act on row-stacked unknowns u (one system per rotation
    # row): row block e, component k: sum_l u_i[l] R~[l,k] - u_j[k].
    rows, cols, vals = [], [], []
    for k in range(d):
        e_idx = np.arange(m)
        for l in range(d):
            rows.append(e_idx * d + k)
            cols.append(meas.i * d + l)
            vals.append(sk * meas.R[:, l, k])
        rows.append(e_idx * d + k)
        cols.append(meas.j * d + k)
        vals.append(-sk)
    A = sp.csc_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(m * d, P * d))

    A0 = A[:, :d]
    A1 = A[:, d:]
    AtA = (A1.T @ A1).tocsc()
    solve = spla.factorized(AtA)

    R = np.zeros((P, d, d))
    R[0] = np.eye(d)
    for r in range(d):
        u0 = np.zeros(d)
        u0[r] = 1.0
        rhs = -(A1.T @ (A0 @ u0))
        u1 = solve(rhs)
        R[1:, r, :] = u1.reshape(P - 1, d)

    # Project each block to SO(d).
    U, _, Vt = np.linalg.svd(R)
    det = np.linalg.det(np.einsum("nik,nkj->nij", U, Vt))
    U[det < 0, :, -1] *= -1
    return np.einsum("nik,nkj->nij", U, Vt)


def recover_translations_global(meas: Measurements, R: np.ndarray
                                ) -> np.ndarray:
    """Least-squares translations given rotations; t[0] = 0."""
    P, d, m = meas.num_poses, meas.d, len(meas)
    tau = meas.tau
    i, j = meas.i, meas.j

    L = sp.csc_matrix(
        (np.concatenate([tau, tau, -tau, -tau]),
         (np.concatenate([i, j, i, j]), np.concatenate([i, j, j, i]))),
        shape=(P, P))

    c = np.einsum("eab,eb->ea", R[i], meas.t)  # R_i t~
    b = np.zeros((P, d))
    np.add.at(b, i, -tau[:, None] * c)
    np.add.at(b, j, tau[:, None] * c)

    t = np.zeros((P, d))
    t[1:] = spla.spsolve(L[1:, 1:].tocsc(), b[1:])
    if d == 1 or t.ndim == 1:
        t = t.reshape(P, d)
    return t
