"""Generate a grid3D-style synthetic 3-D pose graph (g2o).

The reference checkout strips dataset/grid3D.g2o and dataset/rim.g2o
(.MISSING_LARGE_BLOBS), which BASELINE.json config 4-5 reference. This tool
synthesizes the grid3D family — an L x L x L lattice of poses traversed in
scan order, with lattice-neighbor loop closures — with the reference g2o
conventions (EDGE_SE3:QUAT, information written as kappa/tau isotropic
blocks, DPGO_utils.cpp:107-116).

Usage: python tools/make_grid3d.py --size 8 --out artifacts/grid3D_synth.g2o
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def so3_exp(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]) / th
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def quat_of(Rm):
    """(x, y, z, w) quaternion from a rotation matrix (Shepperd's method)."""
    tr = np.trace(Rm)
    if tr > 0:
        r = np.sqrt(1.0 + tr)
        s = 0.5 / r
        return ((Rm[2, 1] - Rm[1, 2]) * s, (Rm[0, 2] - Rm[2, 0]) * s,
                (Rm[1, 0] - Rm[0, 1]) * s, 0.5 * r)
    k = int(np.argmax(np.diag(Rm)))
    if k == 0:
        r = np.sqrt(1.0 + Rm[0, 0] - Rm[1, 1] - Rm[2, 2])
        s = 0.5 / r
        return (0.5 * r, (Rm[0, 1] + Rm[1, 0]) * s,
                (Rm[2, 0] + Rm[0, 2]) * s, (Rm[2, 1] - Rm[1, 2]) * s)
    if k == 1:
        r = np.sqrt(1.0 - Rm[0, 0] + Rm[1, 1] - Rm[2, 2])
        s = 0.5 / r
        return ((Rm[0, 1] + Rm[1, 0]) * s, 0.5 * r,
                (Rm[1, 2] + Rm[2, 1]) * s, (Rm[0, 2] - Rm[2, 0]) * s)
    r = np.sqrt(1.0 - Rm[0, 0] - Rm[1, 1] + Rm[2, 2])
    s = 0.5 / r
    return ((Rm[2, 0] + Rm[0, 2]) * s, (Rm[1, 2] + Rm[2, 1]) * s,
            0.5 * r, (Rm[1, 0] - Rm[0, 1]) * s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=8)
    ap.add_argument("--out", default="artifacts/grid3D_synth.g2o")
    ap.add_argument("--rot_noise", type=float, default=0.05)
    ap.add_argument("--trans_noise", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    L = args.size
    rng = np.random.default_rng(args.seed)
    n = L ** 3

    def pose_id(x, y, z):
        return (x * L + y) * L + z

    # Ground truth: poses at lattice sites with random orientations.
    t_true = np.zeros((n, 3))
    R_true = np.zeros((n, 3, 3))
    for x in range(L):
        for y in range(L):
            for z in range(L):
                p = pose_id(x, y, z)
                t_true[p] = (x, y, z)
                R_true[p] = so3_exp(rng.normal(size=3))

    # Edges: scan-order odometry chain + lattice-neighbor loop closures.
    edges = []
    order = [pose_id(x, y, z) for x in range(L) for y in range(L)
             for z in range(L)]
    for a, b in zip(order[:-1], order[1:]):
        edges.append((a, b))
    chain = set(zip(order[:-1], order[1:]))
    for x in range(L):
        for y in range(L):
            for z in range(L):
                p = pose_id(x, y, z)
                for dx, dy, dz in ((1, 0, 0), (0, 1, 0), (0, 0, 1)):
                    if x + dx < L and y + dy < L and z + dz < L:
                        q = pose_id(x + dx, y + dy, z + dz)
                        if (p, q) not in chain:
                            edges.append((p, q))

    info_r = 1.0 / args.rot_noise ** 2
    info_t = 1.0 / args.trans_noise ** 2
    lines = []
    for i, j in edges:
        Rm = R_true[i].T @ R_true[j] @ so3_exp(
            args.rot_noise * rng.normal(size=3))
        tv = R_true[i].T @ (t_true[j] - t_true[i]) \
            + args.trans_noise * rng.normal(size=3)
        qx, qy, qz, qw = quat_of(Rm)
        info = [0.0] * 21
        # Upper-triangular 6x6 information: diag = [info_t I3, info_r I3].
        idx = 0
        for r in range(6):
            for c in range(r, 6):
                if r == c:
                    info[idx] = info_t if r < 3 else info_r
                idx += 1
        lines.append(
            "EDGE_SE3:QUAT %d %d %.6f %.6f %.6f %.7f %.7f %.7f %.7f %s"
            % (i, j, tv[0], tv[1], tv[2], qx, qy, qz, qw,
               " ".join("%.6f" % v for v in info)))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}: {n} poses, {len(edges)} edges "
          f"(grid {L}x{L}x{L})")


if __name__ == "__main__":
    main()
