"""g2o pose-graph file IO.

Parses EDGE_SE2 / EDGE_SE3:QUAT measurement lines into flat numpy arrays,
using the reference's precision conventions (information-divergence-minimizing
tau/kappa; cf. C++/DPGO/src/DPGO_utils.cpp:63-67 for 2-D and :107-116 for 3-D
in the reference implementation):

  2-D:  tau = 2 / tr(TranInfo^-1),  kappa = I33
  3-D:  tau = 3 / tr(TranInfo^-1),  kappa = 3 / (2 tr(RotInfo^-1))

VERTEX_* lines (initial guesses) are ignored, as in the reference.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Measurements:
    """A flat batch of relative-pose measurements (edges).

    i/j are *global* pose indices into [0, num_poses). R[m] maps frame j into
    frame i (the usual g2o convention): residuals are
    sqrt(tau)|t_i + R_i t~ - t_j| and sqrt(kappa)|R_i R~ - R_j|_F.
    """

    i: np.ndarray      # [m] int64
    j: np.ndarray      # [m] int64
    R: np.ndarray      # [m, d, d] float64
    t: np.ndarray      # [m, d] float64
    kappa: np.ndarray  # [m] float64
    tau: np.ndarray    # [m] float64
    num_poses: int
    d: int

    def __len__(self) -> int:
        return self.i.shape[0]

    def select(self, mask_or_idx) -> "Measurements":
        return Measurements(
            i=self.i[mask_or_idx],
            j=self.j[mask_or_idx],
            R=self.R[mask_or_idx],
            t=self.t[mask_or_idx],
            kappa=self.kappa[mask_or_idx],
            tau=self.tau[mask_or_idx],
            num_poses=self.num_poses,
            d=self.d,
        )


def _quat_to_rot(q: np.ndarray) -> np.ndarray:
    """Batched unit quaternion [m, 4] (x, y, z, w) -> rotation matrices [m, 3, 3]."""
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    x, y, z, w = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    m = np.empty((q.shape[0], 3, 3), dtype=np.float64)
    m[:, 0, 0] = 1 - 2 * (y * y + z * z)
    m[:, 0, 1] = 2 * (x * y - z * w)
    m[:, 0, 2] = 2 * (x * z + y * w)
    m[:, 1, 0] = 2 * (x * y + z * w)
    m[:, 1, 1] = 1 - 2 * (x * x + z * z)
    m[:, 1, 2] = 2 * (y * z - x * w)
    m[:, 2, 0] = 2 * (x * z - y * w)
    m[:, 2, 1] = 2 * (y * z + x * w)
    m[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return m


def read_g2o_file(filename: str) -> Measurements:
    """Parse a .g2o file into a Measurements batch.

    Mixed 2-D/3-D files are rejected. Pose count = max pose id + 1.
    """
    rows2: list[list[float]] = []
    rows3: list[list[float]] = []
    with open(filename, "r") as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            tag = tok[0]
            if tag == "EDGE_SE2":
                # id1 id2 dx dy dtheta I11 I12 I13 I22 I23 I33
                rows2.append([float(v) for v in tok[1:12]])
            elif tag == "EDGE_SE3:QUAT":
                # id1 id2 dx dy dz qx qy qz qw I11..I66 (21 upper-tri entries)
                rows3.append([float(v) for v in tok[1:31]])
            elif tag.startswith("VERTEX"):
                continue
            else:
                raise ValueError(f"unrecognized g2o record type: {tag!r}")

    if rows2 and rows3:
        raise ValueError("mixed 2-D and 3-D measurements in one file")
    if not rows2 and not rows3:
        raise ValueError(f"no measurements found in {filename}")

    if rows2:
        a = np.asarray(rows2, dtype=np.float64)
        i = a[:, 0].astype(np.int64)
        j = a[:, 1].astype(np.int64)
        t = a[:, 2:4].copy()
        th = a[:, 4]
        c, s = np.cos(th), np.sin(th)
        R = np.stack(
            [np.stack([c, -s], axis=1), np.stack([s, c], axis=1)], axis=1
        )
        I11, I12, _I13, I22, _I23, I33 = (a[:, 5 + k] for k in range(6))
        # tau = 2 / tr(TranCov) with TranCov = inv([[I11, I12], [I12, I22]])
        det = I11 * I22 - I12 * I12
        tr_cov = (I11 + I22) / det
        tau = 2.0 / tr_cov
        kappa = I33.copy()
        d = 2
    else:
        a = np.asarray(rows3, dtype=np.float64)
        i = a[:, 0].astype(np.int64)
        j = a[:, 1].astype(np.int64)
        t = a[:, 2:5].copy()
        R = _quat_to_rot(a[:, 5:9])
        info = a[:, 9:30]
        # Upper-triangular row-major order I11 I12 ... I16 I22 ... I66.
        T = np.zeros((a.shape[0], 6, 6), dtype=np.float64)
        iu = np.triu_indices(6)
        T[:, iu[0], iu[1]] = info
        T = T + np.triu(T, 1).transpose(0, 2, 1)
        tran_info = T[:, :3, :3]
        rot_info = T[:, 3:, 3:]
        tau = 3.0 / np.trace(np.linalg.inv(tran_info), axis1=1, axis2=2)
        kappa = 3.0 / (2.0 * np.trace(np.linalg.inv(rot_info), axis1=1, axis2=2))
        d = 3

    num_poses = int(max(i.max(), j.max())) + 1
    return Measurements(i=i, j=j, R=R, t=t, kappa=kappa, tau=tau,
                        num_poses=num_poses, d=d)


def write_g2o_file(filename: str, t, R, meas: Measurements | None = None
                   ) -> None:
    """Write poses (VERTEX_*) and optionally edges (EDGE_*) in g2o format."""
    import numpy as _np
    t = _np.asarray(t)
    R = _np.asarray(R)
    d = t.shape[1]
    with open(filename, "w") as fh:
        if d == 2:
            for p in range(t.shape[0]):
                th = _np.arctan2(R[p, 1, 0], R[p, 0, 0])
                fh.write(f"VERTEX_SE2 {p} {t[p,0]:.9g} {t[p,1]:.9g} "
                         f"{th:.9g}\n")
        else:
            for p in range(t.shape[0]):
                w = _np.sqrt(max(1.0 + _np.trace(R[p]), 1e-12)) / 2.0
                qx = (R[p, 2, 1] - R[p, 1, 2]) / (4 * w)
                qy = (R[p, 0, 2] - R[p, 2, 0]) / (4 * w)
                qz = (R[p, 1, 0] - R[p, 0, 1]) / (4 * w)
                fh.write(f"VERTEX_SE3:QUAT {p} {t[p,0]:.9g} {t[p,1]:.9g} "
                         f"{t[p,2]:.9g} {qx:.9g} {qy:.9g} {qz:.9g} "
                         f"{w:.9g}\n")
        if meas is not None:
            for e in range(len(meas)):
                i, j = int(meas.i[e]), int(meas.j[e])
                Re, te = meas.R[e], meas.t[e]
                if d == 2:
                    th = _np.arctan2(Re[1, 0], Re[0, 0])
                    info = f"{meas.tau[e]:.9g} 0 0 {meas.tau[e]:.9g} 0 " \
                           f"{meas.kappa[e]:.9g}"
                    fh.write(f"EDGE_SE2 {i} {j} {te[0]:.9g} {te[1]:.9g} "
                             f"{th:.9g} {info}\n")
                else:
                    w = _np.sqrt(max(1.0 + _np.trace(Re), 1e-12)) / 2.0
                    qx = (Re[2, 1] - Re[1, 2]) / (4 * w)
                    qy = (Re[0, 2] - Re[2, 0]) / (4 * w)
                    qz = (Re[1, 0] - Re[0, 1]) / (4 * w)
                    # Reader inverts the conventions: tau round-trips as
                    # the translation info diagonal; kappa needs 2x on the
                    # rotation info diagonal (kappa = 3 / (2 tr(RotInfo^-1))).
                    ta, ka = meas.tau[e], 2.0 * meas.kappa[e]
                    info = (f"{ta:.9g} 0 0 0 0 0 {ta:.9g} 0 0 0 0 "
                            f"{ta:.9g} 0 0 0 {ka:.9g} 0 0 {ka:.9g} 0 "
                            f"{ka:.9g}")
                    fh.write(f"EDGE_SE3:QUAT {i} {j} {te[0]:.9g} "
                             f"{te[1]:.9g} {te[2]:.9g} {qx:.9g} {qy:.9g} "
                             f"{qz:.9g} {w:.9g} {info}\n")
