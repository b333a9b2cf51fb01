"""Run the BASELINE.json configuration suite and write BASELINE_RESULTS.md.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/run_baselines.py
       [--iters N] [--out BASELINE_RESULTS.md]

Covers the five BASELINE.json configs (substituting smallGrid3D for the
stripped grid3D/rim blobs) plus certification of the final estimates.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", os.environ.get("DPGO_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.driver import DPGOSolver, DPGOStarSolver
from dpgo_tpu.losses import Loss
from dpgo_tpu.solvers.mm import MMOptions

DATA = "/root/reference/dataset"


def run_config(name, dataset, nodes, iters, accelerated=True, solver="hash",
               loss=Loss.TRIVIAL, pcm=False, dist_init=False, certify=False):
    meas = read_g2o_file(os.path.join(DATA, dataset))
    if pcm:
        from dpgo_tpu.pcm import PCMOptions, pcm_filter
        from dpgo_tpu.sesync import (chordal_initialization,
                                     recover_translations_global)
        R0 = chordal_initialization(meas)
        t0 = recover_translations_global(meas, R0)
        meas, keep = pcm_filter(meas, nodes, t0, R0, PCMOptions(tolerance=1.0))
        pcm_note = f"PCM kept {keep.sum()}/{len(keep)}"
    else:
        pcm_note = ""
    cls = DPGOStarSolver if solver == "star" else DPGOSolver
    s = cls(meas, num_nodes=nodes, opts=MMOptions(accelerated=accelerated),
            loss=loss, loss_reg=0.25)
    t0 = time.time()
    if solver == "hash":
        st = s.initialize(dist_init=dist_init)
    else:
        st = s.initialize()
    import jax.numpy as jnp
    f0, g0 = s._metrics(st)
    for k in range(iters):
        st = s._step(st, jnp.asarray(k, jnp.int32))
    f1, g1 = s._metrics(st)
    dt = time.time() - t0
    cert = ""
    if certify and loss is Loss.TRIVIAL:
        from dpgo_tpu.sesync.staircase import certify_solution
        t_g, R_g = map(np.asarray, s.gather_global(st))
        ok, lam, bound, fx = certify_solution(meas, R_g)
        cert = f"lam_min={lam:.2e} {'CERT' if ok else 'uncert'}"
    row = (name, dataset, nodes, iters, float(f0), float(f1), float(g1), dt,
           " ".join(x for x in (pcm_note, cert) if x))
    print(row, flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--out", default="BASELINE_RESULTS.md")
    args = ap.parse_args()
    it = args.iters

    rows = []

    def flush_rows():
        with open(args.out, "w") as fh:
            fh.write("# BASELINE configuration results\n\n")
            fh.write(f"(CPU float64, {it} iterations per config; objective "
                     "convention 2*fobj as in the reference driver)\n\n")
            fh.write("| config | dataset | nodes | iters | 2f init | "
                     "2f final | 2|grad| | secs | notes |\n"
                     "|---|---|---|---|---|---|---|---|---|\n")
            for r in rows:
                fh.write(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} | "
                         f"{r[4]:.4f} | {r[5]:.4f} | {r[6]:.2e} | "
                         f"{r[7]:.0f} | {r[8]} |\n")

    def add(row):
        rows.append(row)
        flush_rows()

    add(run_config("cfg1 MM single-node", "CSAIL.g2o", 1, it,
                   accelerated=False, certify=True))
    add(run_config("cfg2 AMM* chordal", "intel.g2o", 4, it,
                   solver="star"))
    add(run_config("cfg2 AMM* chordal", "M3500.g2o", 4, it, solver="star"))
    add(run_config("cfg3 AMM# 8-node", "sphere2500.g2o", 8, it,
                   certify=True))
    add(run_config("cfg3 AMM# 8-node", "torus3D.g2o", 8, it))
    add(run_config("cfg4 Huber+PCM", "city10000.g2o", 16, it,
                   loss=Loss.HUBER, pcm=True))
    add(run_config("cfg4 Welsch", "smallGrid3D.g2o", 4, it,
                   loss=Loss.WELSCH))
    add(run_config("cfg5 16-node + cert", "parking-garage.g2o", 4, it,
                   certify=True))
    add(run_config("cfg5 16-node + cert", "cubicle.g2o", 16, it,
                   certify=True))
    add(run_config("cfg5 dist-init", "MITb.g2o", 4, it, dist_init=True))

    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
