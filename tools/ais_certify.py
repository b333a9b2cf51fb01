"""Certify the ais2klinik estimate via the direct residual-honest
certificate (no staircase).

ais2klinik's staircase certification exceeds any reasonable CPU budget (the
multiscale corridor conditioning defeats the warm-started TNT; round-2/3
negative results), so the catalog route for this one dataset is:

  multilevel-rigid polish to stationarity (tools/ais_multilevel.py)
    -> certificate_lambda_bound on the candidate (staircase.certify_solution)

which is exactly the reference's fast_verification route
(/root/reference/C++/SESync/src/SESync_utils.cpp:721-850) rather than its
full Riemannian staircase. The residual-honest bound charges the remaining
stationarity defect, so the printed suboptimality bound is the honest
certificate of how far 2f can be from 2f*.

Usage:
  JAX_PLATFORMS=cpu python tools/ais_certify.py \
      --npz artifacts/ais2klinik_r3.npz [--write-catalog]
"""

import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset",
                    default="/root/reference/dataset/ais2klinik.g2o")
    ap.add_argument("--npz", default="artifacts/ais2klinik_r3.npz")
    ap.add_argument("--min_eig_tol", type=float, default=1e-5)
    ap.add_argument("--lobpcg_iters", type=int, default=2000)
    ap.add_argument("--write-catalog", action="store_true")
    ap.add_argument("--catalog", default="artifacts/certified_optima.json")
    args = ap.parse_args()

    import jax.numpy as jnp
    from dpgo_tpu.io.g2o import read_g2o_file
    from dpgo_tpu.objective import EdgeData, evaluate_f, grad_norm
    from dpgo_tpu.sesync.staircase import certify_solution

    meas = read_g2o_file(args.dataset)
    data = np.load(args.npz)
    t, R = data["t"], data["R"]
    edges = EdgeData.from_measurements(meas, dtype=jnp.float64)
    tj, Rj = jnp.asarray(t, jnp.float64), jnp.asarray(R, jnp.float64)
    two_f = 2 * float(evaluate_f(edges, tj, Rj))
    two_g = 2 * float(grad_norm(edges, tj, Rj))
    print(f"candidate: 2f={two_f:.10g} 2|grad|={two_g:.3e}", flush=True)

    t0 = time.time()
    ok, lam, bound, fxhat = certify_solution(
        meas, R, min_eig_tol=args.min_eig_tol,
        lobpcg_iters=args.lobpcg_iters)
    secs = time.time() - t0
    out = {
        "certified": bool(ok),
        "lambda_min": float(lam),
        "suboptimality_bound_2x": 2 * float(bound),
        "fxhat_2x": 2 * float(fxhat),
        "raw_2f": two_f,
        "grad_2x": two_g,
        "secs": round(secs, 1),
    }
    print(json.dumps(out), flush=True)

    if args.write_catalog and ok:
        results = {}
        if os.path.exists(args.catalog):
            results = json.load(open(args.catalog))
        results[os.path.basename(args.dataset)] = {
            "status": "GlobalOpt",
            # No staircase ran on this route, so there is no relaxation
            # objective to report; consumers key on fxhat_2x/status.
            "sdp_2x": None,
            "fxhat_2x": 2 * float(fxhat),
            "lambda_min": float(lam),
            "suboptimality_bound_2x": 2 * float(bound),
            "rank": meas.d,
            "poses": meas.num_poses,
            "edges": len(meas),
            "secs": round(secs, 1),
            "route": "host-LM exact-Newton polish + direct certificate "
                     "(staircase intractable; see tools/ais_certify.py)",
        }
        with open(args.catalog, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"wrote {args.catalog}", flush=True)


if __name__ == "__main__":
    main()
