"""Benchmark harness: AMM-PGO# on sphere2500, 8-node partition (the BASELINE
headline config), on whatever accelerator is available.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference repo publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against the recorded round-1 value (BENCH_PREV.json).

Headline (round 4+): the REFERENCE-DEFAULT refined preset — accelerated
AMM-PGO# with the TNT refinement gate at its dist_pgo defaults
(accepted_delta=5e-4, TNT 10/1, dist_pgo.cpp:103-120) — measured in the
pure-throughput phase (one device-side scan dispatch, no history
recording), with the fused single-kernel Pallas STPCG verified engaged
(solver.fused_stpcg_engaged()). The proximal-only preset (TNT off), the
previous rounds' headline, is tracked in extras, as are an XLA-CG A/B of
the refined preset, MFU accounting from the compiled executable's cost
analysis, and a chip-filling city10000 16-node row.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dpgo_jax_cache")

import numpy as np

# TPU v5e peak: 197 TFLOP/s bf16 (the MXU's native rate; f32 composes
# multiple bf16 passes). MFU below is reported against this bf16 peak —
# the honest "fraction of the chip" number, pessimistic for f32 math.
V5E_PEAK_FLOPS = 197e12


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from dpgo_tpu.io.g2o import read_g2o_file
    from dpgo_tpu.driver import DPGOSolver
    from dpgo_tpu.solvers.mm import MMOptions
    from dpgo_tpu.solvers.tnt import TNTParams

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

    # Certified global optimum of sphere2500 (2*f*), computed by this
    # framework's own SE-Sync staircase + certification (GlobalOpt).
    F_CERT_2X = 1687.005814
    target = F_CERT_2X * (1.0 + 1e-4)

    n_hist = 150   # history phase length (secs-to-gap measurement)
    n_tp = 600     # pure-throughput phase length (one scan dispatch)
    k0 = jnp.zeros((), jnp.int32)

    def measure(solver):
        """(pure-throughput it/s, secs_to_gap, iters_to_gap, final 2f/2g)."""
        st = solver.initialize()
        # Warmup/compile both jits; device_get is the only true sync
        # through the axon tunnel (block_until_ready can return early).
        stw, _ = solver.run_steps(st, k0, n_tp)
        np.asarray(stw.fobj)
        stw, _, _ = solver.run_steps_history(st, k0, n_hist)
        np.asarray(stw.fobj)
        # Pure throughput, best of 3: the axon tunnel adds run-to-run
        # dispatch jitter of ~+-8%, which would otherwise dominate
        # preset-to-preset comparisons. Fresh input buffers each trial
        # (the tunnel memoizes executions on identical buffers).
        dt = float("inf")
        for _ in range(3):
            st = solver.initialize()
            t0 = time.perf_counter()
            st, _ = solver.run_steps(st, k0, n_tp)
            np.asarray(st.fobj)
            dt = min(dt, time.perf_counter() - t0)
        ips = n_tp / dt
        f1, g1 = solver._metrics(st)
        # Time-to-target: device-side recorded trajectory, prorated clock
        # (best of 3 on the wall time; the trajectory is deterministic).
        dt_hist = float("inf")
        for _ in range(3):
            st = solver.initialize()
            t0 = time.perf_counter()
            st, _, (fhist, _) = solver.run_steps_history(st, k0, n_hist)
            fhist = np.asarray(fhist)
            dt_hist = min(dt_hist, time.perf_counter() - t0)
        secs_to = iters_to = None
        hit = np.nonzero(fhist <= target)[0]
        if hit.size:
            iters_to = int(hit[0]) + 1
            secs_to = dt_hist * iters_to / n_hist
        return ips, secs_to, iters_to, float(f1), float(g1), st

    # ------------------------------------------------- headline: refined
    # Reference-default gate (dist_pgo.cpp:103-120): accepted_delta=5e-4,
    # TNT max 10 outer / 1 accepted — MMOptions defaults.
    solver = DPGOSolver(meas, num_nodes=8,
                        opts=MMOptions(accelerated=True), dtype=dtype)
    fused_engaged = solver.fused_stpcg_engaged()
    # The published refined-preset number must provably exercise the fused
    # Pallas CG: on TPU f32 the gate's conditions (dense path, VMEM fit,
    # dense preconditioner, refinement on) all hold for sphere2500/8, so a
    # disengaged gate is a regression, not a configuration choice.
    assert fused_engaged or platform == "cpu", (
        "fused STPCG gate disengaged on TPU — refined headline would "
        "silently run the XLA-op CG")
    ips, secs_to, iters_to, f1, g1, st_final = measure(solver)

    extra = {
        "platform": platform,
        "dtype": str(jnp.dtype(dtype)),
        "preset": "refined reference-default (TNT 10/1, "
                  "accepted_delta=5e-4)",
        "fused_stpcg_engaged": bool(fused_engaged),
        "certified_opt_2x": F_CERT_2X,
        "fobj_final_2x": f1,
        "grad_final_2x": g1,
        "rel_gap_final": f1 / F_CERT_2X - 1.0,
        "secs_to_certified_opt_1e-4": secs_to,
        "iters_to_certified_opt_1e-4": iters_to,
    }

    # --------------------------------------- A/B: refined with XLA-op CG
    # Also the MFU basis: XLA's cost analysis does not count FLOPs inside
    # Pallas custom calls, so the all-XLA variant (identical math) gives
    # the honest flops/step for the headline preset.
    try:
        s_ab = DPGOSolver(meas, num_nodes=8,
                          opts=MMOptions(accelerated=True,
                                         tnt=TNTParams(fused=False)),
                          dtype=dtype)
        ips_ab, _, _, _, _, _ = measure(s_ab)
        extra["refined_xla_cg_iters_per_sec"] = round(ips_ab, 1)
        extra["fused_speedup"] = round(ips / ips_ab, 3)
        flops_step = s_ab.step_flops(s_ab.initialize(), k0, n_tp)
        extra["flops_per_step"] = flops_step
        if flops_step and platform == "tpu":
            extra["mfu_vs_bf16_peak"] = flops_step * ips / V5E_PEAK_FLOPS
            extra["achieved_gflops"] = flops_step * ips / 1e9
    except Exception as e:  # pragma: no cover - diagnostic only
        extra["refined_xla_cg_error"] = repr(e)[:200]

    # ------------------------------------- extras: proximal-only preset
    try:
        s_px = DPGOSolver(meas, num_nodes=8,
                          opts=MMOptions(accelerated=True,
                                         tnt=TNTParams(max_iterations=0)),
                          dtype=dtype)
        ips_px, secs_px, it_px, f_px, _, st_px = measure(s_px)
        extra["proximal_only_iters_per_sec"] = round(ips_px, 1)
        extra["proximal_only_secs_to_1e-4"] = secs_px
        extra["proximal_only_iters_to_1e-4"] = it_px
        # Global second-order polish tail from the proximal state.
        try:
            s_px.polish(st_px, outer=6, tcg=100)  # compile
            st2 = s_px.initialize()
            st2, _ = s_px.run_steps(st2, k0, n_tp)
            np.asarray(st2.fobj)
            t0 = time.perf_counter()
            _, f_pol = s_px.polish(st2, outer=6, tcg=100)
            extra["polish_secs"] = time.perf_counter() - t0
            extra["polish_rel_gap"] = f_pol / F_CERT_2X - 1.0
        except Exception:
            pass
    except Exception as e:  # pragma: no cover
        extra["proximal_only_error"] = repr(e)[:200]

    # --------------------------- extras: chip-filling city10000 16-node
    # The latency-bound sphere2500 regime leaves the MXU mostly idle; this
    # row measures the large-graph regime (10k poses, d=2 fused panels).
    city = "/root/reference/dataset/city10000.g2o"
    if os.path.exists(city) and platform == "tpu":
        try:
            meas_c = read_g2o_file(city)
            s_c = DPGOSolver(meas_c, num_nodes=16,
                             opts=MMOptions(accelerated=True), dtype=dtype)
            n_c = 300
            st_c = s_c.initialize()
            stw, _ = s_c.run_steps(st_c, k0, n_c)
            np.asarray(stw.fobj)
            st_c = s_c.initialize()
            t0 = time.perf_counter()
            st_c, _ = s_c.run_steps(st_c, k0, n_c)
            np.asarray(st_c.fobj)
            dt_c = time.perf_counter() - t0
            ips_c = n_c / dt_c
            fs_c = s_c.step_flops(s_c.initialize(), k0, n_c)
            f_c, g_c = s_c._metrics(st_c)
            extra["city10000_16node"] = {
                "iters_per_sec": round(ips_c, 1),
                "fused_stpcg_engaged": s_c.fused_stpcg_engaged(),
                # XLA count only — the fused Pallas CG's FLOPs are inside
                # a custom call and invisible to cost_analysis, so this
                # under-reports (the dense panels are 16x [4, 512, 512]).
                "flops_per_step_xla_only": fs_c,
                "mfu_vs_bf16_peak_lower_bound": (
                    fs_c * ips_c / V5E_PEAK_FLOPS if fs_c else None),
                "fobj_2x_300it": float(f_c),
                "certified_opt_2x": 638.624619,
            }
        except Exception as e:  # pragma: no cover
            extra["city10000_error"] = repr(e)[:200]

    # ------------------------- extras: rim_synth 10,240-pose d=3 row
    # The d=3 chip-filling regime: 640-pose blocks engage the fused Pallas
    # STPCG since the round-5 VMEM-gate extension (panels streamed under a
    # raised scoped-VMEM budget). FLOPs are counted on an XLA-only twin
    # (fused=False, identical math) because XLA's cost analysis cannot see
    # inside Pallas custom calls.
    rim = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "rim_synth.g2o")
    if os.path.exists(rim) and platform == "tpu":
        try:
            meas_r = read_g2o_file(rim)
            s_r = DPGOSolver(meas_r, num_nodes=16,
                             opts=MMOptions(accelerated=True), dtype=dtype)
            n_r = 150
            st_r = s_r.initialize()
            stw, _ = s_r.run_steps(st_r, k0, n_r)
            np.asarray(stw.fobj)
            dt_r = float("inf")
            for _ in range(2):
                st_r = s_r.initialize()
                t0 = time.perf_counter()
                st_r, _ = s_r.run_steps(st_r, k0, n_r)
                np.asarray(st_r.fobj)
                dt_r = min(dt_r, time.perf_counter() - t0)
            ips_r = n_r / dt_r
            s_rx = DPGOSolver(meas_r, num_nodes=16,
                              opts=MMOptions(accelerated=True,
                                             tnt=TNTParams(fused=False)),
                              dtype=dtype)
            fs_r = s_rx.step_flops(s_rx.initialize(), k0, n_r)
            extra["rim_synth_10240_16node"] = {
                "iters_per_sec": round(ips_r, 1),
                "fused_stpcg_engaged": s_r.fused_stpcg_engaged(),
                "flops_per_step_xla_twin": fs_r,
                "achieved_gflops": (fs_r * ips_r / 1e9 if fs_r else None),
                "mfu_vs_bf16_peak": (fs_r * ips_r / V5E_PEAK_FLOPS
                                     if fs_r else None),
            }
        except Exception as e:  # pragma: no cover
            extra["rim_synth_error"] = repr(e)[:200]

    # --------------- extras: rim_synth_100k — the SEGMENT-path regime
    # 102,400 poses / 16 nodes = 6,400-pose blocks, far past dense_limit:
    # the reference's CHOLMOD-any-size regime (DPGOProblem.cpp:93-124),
    # served here by segment-Schwarz CG translation solves + the coupled
    # segment-preconditioned TNT. Dataset generated on demand
    # (deterministic, tools/make_rim.py --rows 32 --cols 64 --floors 50).
    rim100k = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "artifacts", "rim_synth_100k.g2o")
    if platform == "tpu":
        try:
            if not os.path.exists(rim100k):
                import subprocess
                subprocess.run(
                    ["python", os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "tools", "make_rim.py"),
                     "--rows", "32", "--cols", "64", "--floors", "50",
                     "--out", rim100k], check=True, timeout=1200)
            meas_k = read_g2o_file(rim100k)
            s_k = DPGOSolver(meas_k, num_nodes=16,
                             opts=MMOptions(accelerated=True,
                                            tnt=TNTParams(max_iterations=0)),
                             dtype=dtype)
            n_k = 100
            st_k = s_k.initialize()
            stw, _ = s_k.run_steps(st_k, k0, n_k)
            np.asarray(stw.fobj)
            dt_k = float("inf")
            for _ in range(2):
                st_k = s_k.initialize()
                t0 = time.perf_counter()
                st_k, _ = s_k.run_steps(st_k, k0, n_k)
                np.asarray(st_k.fobj)
                dt_k = min(dt_k, time.perf_counter() - t0)
            ips_k = n_k / dt_k
            fs_k = s_k.step_flops(s_k.initialize(), k0, n_k)
            f_k, g_k = s_k._metrics(st_k)
            extra["rim_synth_100k_16node_segment"] = {
                "poses": int(meas_k.num_poses),
                "poses_per_node": int(meas_k.num_poses) // 16,
                "iters_per_sec": round(ips_k, 2),
                "segment_path": bool(s_k.probs.seg),
                # cost-analysis counts while-loop bodies once, so this
                # under-reports the CG matvecs — a lower bound.
                "flops_per_step_lower_bound": fs_k,
                "achieved_gflops_lower_bound": (
                    fs_k * ips_k / 1e9 if fs_k else None),
                "fobj_2x_100it": float(f_k),
                "grad_2x_100it": float(g_k),
            }
        except Exception as e:  # pragma: no cover
            extra["rim_synth_100k_error"] = repr(e)[:200]

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
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
