"""ais2klinik multilevel-polish experiment harness.

The one dataset still uncertified: its corridor geometry has slow bending
modes at every scale, defeating both the node-block preconditioner and the
single node-level rigid coarse correction (round-3 negative result). This
harness runs the coupled global polish with an additive multilevel rigid
hierarchy (solvers/polish.py multilevel_rigid_preconditioner) and reports
(2f, 2|grad|) per outer chunk so preconditioner variants can be compared.

  JAX_PLATFORMS=cpu python tools/ais_multilevel.py --levels 64,256 \
      --chunks 6 --outer 10 --tcg 300
"""

import argparse
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset",
                    default="/root/reference/dataset/ais2klinik.g2o")
    ap.add_argument("--num_nodes", type=int, default=16)
    ap.add_argument("--levels", default="64,256",
                    help="comma list of segment counts for extra coarse "
                         "levels; 'node' level is always included; empty "
                         "string = two-level (round-3 behavior)")
    ap.add_argument("--chunks", type=int, default=6)
    ap.add_argument("--outer", type=int, default=10, help="outer TNT iters "
                    "per chunk")
    ap.add_argument("--tcg", type=int, default=300)
    ap.add_argument("--amm", type=int, default=0,
                    help="AMM bulk iterations before the polish")
    ap.add_argument("--init_from", default=None)
    ap.add_argument("--save", default=None, help="save final estimate .npz")
    ap.add_argument("--diag", action="store_true",
                    help="per-outer diagnostic mode (cg iters, rho, Delta)")
    ap.add_argument("--Delta0", type=float, default=0.0)
    args = ap.parse_args()

    from dpgo_tpu.driver import DPGOSolver
    from dpgo_tpu.io.g2o import read_g2o_file
    from dpgo_tpu.objective import evaluate_f, grad_norm
    from dpgo_tpu.solvers import polish as pm
    from dpgo_tpu.solvers.mm import MMOptions
    from dpgo_tpu.solvers.tnt import TNTParams

    meas = read_g2o_file(args.dataset)
    s = DPGOSolver(meas, num_nodes=args.num_nodes,
                   opts=MMOptions(tnt=TNTParams(max_iterations=0)),
                   dtype=jnp.float64)
    if args.init_from:
        warm = np.load(args.init_from)
        st = s.initialize(t=warm["t"], R=warm["R"])
    else:
        st = s.initialize()
    if args.amm:
        st, _, _ = s.run_steps_history(st, 0, args.amm)
    t, R = map(jnp.asarray, s.gather_global(st))

    P = meas.num_poses
    f0 = 2 * float(evaluate_f(s.edges, t, R))
    g0 = 2 * float(grad_norm(s.edges, t, R))
    print(f"start: 2f={f0:.10g} 2|grad|={g0:.3e}")

    seg_counts = [int(x) for x in args.levels.split(",") if x.strip()]

    base = s._node_block_precondition(s.probs)
    model0 = pm.global_tnt_model(s.edges, s.loss, s.loss_reg, num_poses=P,
                                 precondition=base)

    def make_precon(t, R):
        _, nabla = model0.grad_and_nabla((t, R))
        levels = [(s.node_of, s.num_nodes)]
        levels += [(pm.contiguous_segments(P, m), m) for m in seg_counts]
        return pm.multilevel_rigid_preconditioner(
            model0.hess_vp, nabla, (t, R), levels, base)

    params = pm.polish_params(outer=args.outer, tcg=args.tcg)
    if args.Delta0 > 0:
        # Chunk mode previously always started at TNTParams.Delta0=1.0
        # (M-norm), which trust-region-caps the Newton steps on this
        # ill-conditioned corridor — the diag-mode default (1e5) is what
        # produced the plateau-breaking full Newton steps.
        import dataclasses
        params = dataclasses.replace(params, Delta0=args.Delta0)

    if args.diag:
        # Per-outer diagnostics: one TNT outer iteration at a time (python
        # loop), printing CG iterations / trust radius / rho to attribute
        # stalls to CG truncation vs trust-region limiting vs negative
        # curvature. NOTE: the preconditioner is rebuilt every outer
        # iteration here (it closes over the current point), unlike chunk
        # mode which rebuilds once per chunk — diag runs are a diagnostic,
        # not an apples-to-apples timing proxy for chunk mode.
        from dpgo_tpu.solvers.tnt import stpcg, _ip

        @jax.jit
        def outer_step(t, R, Delta):
            precon = make_precon(t, R)
            model = pm.global_tnt_model(s.edges, s.loss, s.loss_reg,
                                        num_poses=P, precondition=precon)
            x = (t, R)
            fx = model.objective(x)
            grad, nabla = model.grad_and_nabla(x)
            gn = jnp.sqrt(_ip(grad, grad))
            h, Hh, h_M, k = stpcg(grad,
                                  lambda v: model.hess_vp(x, nabla, v),
                                  lambda v: model.precondition(x, v), Delta,
                                  params)
            xp = model.retract(x, h)
            fxp = model.objective(xp)
            dm = -_ip(grad, h) - 0.5 * _ip(h, Hh)
            rho = (fx - fxp) / dm
            on_boundary = h_M > 0.99 * Delta
            return xp[0], xp[1], fx, fxp, gn, k, rho, on_boundary, h_M

        Delta = jnp.asarray(1e5 if args.Delta0 <= 0 else args.Delta0,
                            jnp.float64)
        fx_acc = f0 / 2.0
        for it in range(args.chunks * args.outer):
            t0 = time.time()
            tn, Rn, fx, fxp, gn, k, rho, bnd, h_M = outer_step(t, R, Delta)
            rho = float(rho)
            ok = np.isfinite(rho) and rho > 1e-4
            if ok:
                t, R = tn, Rn
                fx_acc = float(fxp)
            # Standard trust-region update: grow on very successful steps,
            # shrink on rejected AND on accepted-but-poor (rho < 0.25) steps.
            if rho >= 0.9:
                Delta = jnp.maximum(4.0 * h_M, Delta)
            elif not ok or rho < 0.25:
                Delta = 0.25 * h_M
            print(f"outer {it}: 2f={2*float(fx):.12g} 2|g|={2*float(gn):.3e}"
                  f" cg={int(k)} rho={rho:.3f} bnd={bool(bnd)}"
                  f" Delta={float(Delta):.2e} ({time.time()-t0:.1f}s)")
        fx = fx_acc
    else:
        @jax.jit
        def chunk(t, R):
            precon = make_precon(t, R)
            return pm.polish_global(s.edges, t, R, params=params,
                                    precondition=precon)

        for c in range(args.chunks):
            t0 = time.time()
            t, R, fx = chunk(t, R)
            fx = float(np.asarray(fx))
            g = 2 * float(grad_norm(s.edges, t, R))
            print(f"chunk {c}: 2f={2*fx:.12g} 2|grad|={g:.3e} "
                  f"({time.time()-t0:.1f}s)", flush=True)
            if args.save:
                # Checkpoint every chunk: long runs must survive the
                # harness being killed (polish_global is monotone, so the
                # latest chunk is always the best iterate).
                _atomic_savez(args.save, t=np.asarray(t), R=np.asarray(R))

    if args.save:
        _atomic_savez(args.save, t=np.asarray(t), R=np.asarray(R))
        print(f"saved {args.save}")


def _atomic_savez(path, **arrays):
    """Write-then-rename so a kill mid-write (the scenario the per-chunk
    checkpoint guards against) can never corrupt the only checkpoint."""
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    # np.savez appends .npz to paths without the suffix.
    os.replace(tmp if tmp.endswith(".npz") else tmp + ".npz", path)


if __name__ == "__main__":
    main()
