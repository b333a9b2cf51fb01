"""Generate a rim-style synthetic 3-D pose graph (g2o).

The reference checkout strips dataset/rim.g2o (.MISSING_LARGE_BLOBS) — the
multi-floor RIM building sweep (~10k poses) referenced by BASELINE.json
config 5. This tool synthesizes the same structural family: a multi-floor
boustrophedon (serpentine) sweep over each floor with (a) an odometry chain,
(b) same-floor revisit closures between adjacent sweep rows, and (c)
inter-floor closures at vertically aligned positions — the long-corridor +
floor-stack conditioning that makes rim hard. Conventions match the
reference g2o writer (EDGE_SE3:QUAT, isotropic information blocks,
DPGO_utils.cpp:107-116).

Usage: python tools/make_rim.py --out artifacts/rim_synth.g2o
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.make_grid3d import quat_of, so3_exp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16, help="sweep rows/floor")
    ap.add_argument("--cols", type=int, default=64, help="poses per row")
    ap.add_argument("--floors", type=int, default=10)
    ap.add_argument("--out", default="artifacts/rim_synth.g2o")
    ap.add_argument("--rot_noise", type=float, default=0.05)
    ap.add_argument("--trans_noise", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    R_, C, F = args.rows, args.cols, args.floors
    rng = np.random.default_rng(args.seed)
    n = R_ * C * F

    def pose_id(f, r, c):
        return (f * R_ + r) * C + c

    # Ground truth: serpentine sweep per floor (row direction alternates),
    # floors stacked 3 m apart; orientations follow the walking direction
    # with small jitter.
    t_true = np.zeros((n, 3))
    R_true = np.zeros((n, 3, 3))
    for f in range(F):
        for r in range(R_):
            for c in range(C):
                p = pose_id(f, r, c)
                x = c if r % 2 == 0 else C - 1 - c
                t_true[p] = (x, 2.0 * r, 3.0 * f)
                yaw = 0.0 if r % 2 == 0 else np.pi
                R_true[p] = so3_exp(np.array([0.0, 0.0, yaw])) @ so3_exp(
                    0.05 * rng.normal(size=3))

    edges = []
    order = [pose_id(f, r, c) for f in range(F) for r in range(R_)
             for c in range(C)]
    for a, b in zip(order[:-1], order[1:]):
        edges.append((a, b))
    chain = set(zip(order[:-1], order[1:]))

    def maybe(p, q):
        if p != q and (p, q) not in chain and (q, p) not in chain:
            edges.append((min(p, q), max(p, q)))

    # Same-floor revisits: adjacent sweep rows pass the same x position.
    for f in range(F):
        for r in range(R_ - 1):
            for c in range(0, C, 4):
                x = c if r % 2 == 0 else C - 1 - c
                c2 = x if (r + 1) % 2 == 0 else C - 1 - x
                maybe(pose_id(f, r, c), pose_id(f, r + 1, c2))
    # Inter-floor closures at vertically aligned positions (stairwells /
    # open atrium sightlines), sparse.
    for f in range(F - 1):
        for r in range(0, R_, 4):
            for c in range(0, C, 8):
                maybe(pose_id(f, r, c), pose_id(f + 1, r, c))

    seen = set()
    uniq = []
    for e in edges:
        if e not in seen:
            seen.add(e)
            uniq.append(e)
    edges = uniq

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
          f"({F} floors x {R_} rows x {C} cols)")


if __name__ == "__main__":
    main()
