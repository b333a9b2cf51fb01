"""Minimizer/repro for the dynamic-rescale embedded-constant miscompile.

Observed (round 2, TPU v5e via axon): with the problem arrays embedded as
jit closure CONSTANTS, the dynamic-rescale step graph (with_weights: scatter
-adds of weight deltas into the dense surrogate matrices, then matmuls with
the results) produces wrong numerics — CSAIL huber+dynamic converged to
2f = 1379 instead of 28.69 on identical state. Passing the same arrays as
jit ARGUMENTS is correct. The workaround (driver._embed_consts = False when
dynamic) costs the ~18% embed win on static runs that share a driver.

This tool reproduces the divergence at three levels of minimization so the
trigger can be reported upstream and the workaround retired when fixed:

  L1: raw scatter-add into an embedded [n, n] constant followed by a matmul
      (embedded vs argument), random data.
  L2: with_weights alone on a real NodeProblem stack (embedded base problem
      vs argument base problem), comparing the reweighted operator images.
  L3: one full solver step, embedded vs argument, on identical state
      (the original observation).

Prints max |diff| per level. Exit code 0 always (it is a reporter; the
pass/fail policy lives in tools/tpu_smoke.py).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/repro_embed_miscompile.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/dpgo_jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from dpgo_tpu.driver import DPGOSolver
from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.losses import Loss
from dpgo_tpu.solvers.mm import MMOptions


def level1(n=312, d=3, seed=0):
    """Raw kernel: scatter-add a data-dependent delta into a constant matrix,
    then matmul. Any embedded-vs-argument difference is a miscompile."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n * d, n * d)).astype(np.float32)
    idx = rng.integers(0, n, size=40).astype(np.int32)
    ar = np.arange(d)
    r = (idx * d)[:, None, None] + ar[None, :, None]
    c = (idx * d)[:, None, None] + ar[None, None, :]
    X = rng.normal(size=(n * d, d)).astype(np.float32)

    def kernel(Amat, w):
        delta = w[:, None, None] * jnp.eye(d, dtype=jnp.float32)
        B = Amat.at[jnp.asarray(r), jnp.asarray(c)].add(delta)
        return B @ jnp.asarray(X)

    f_embed = jax.jit(lambda w: kernel(jnp.asarray(A), w))
    f_arg = jax.jit(kernel)
    w = jnp.asarray(rng.normal(size=(40,)).astype(np.float32))
    ye = np.asarray(f_embed(w))
    ya = np.asarray(f_arg(jnp.asarray(A), w))
    return float(np.abs(ye - ya).max()), float(np.abs(ya).max())


def level1b(n=312, k=40, seed=0):
    """The L2 result pins the divergence to with_weights' Woodbury core
    (wood_C) and its Hred propagation — NOT the scatter-adds (mG01/mG11
    images match exactly). This mid-level repro isolates that pattern:
    gather columns of an embedded constant at fixed indices, form
    A = I + (U^T S U) * D with a data-dependent diagonal D, invert, and
    multiply back."""
    rng = np.random.default_rng(seed)
    SU = rng.normal(size=(n, k)).astype(np.float32)
    ipose = rng.choice(n, size=k, replace=False).astype(np.int32)
    M = rng.normal(size=(n, k)).astype(np.float32)

    def kernel(SU_, w):
        D = w  # [k] data-dependent diagonal
        UtSU = SU_[jnp.asarray(ipose)]          # gather rows [k, k]
        A = jnp.eye(k, dtype=jnp.float32) + UtSU * D[None, :]
        wood = D[:, None] * jnp.linalg.inv(A)
        corr = jnp.einsum("kl,la->ka", wood, jnp.asarray(M)[jnp.asarray(
            ipose)])
        return jnp.asarray(M) - jnp.einsum("pk,ka->pa", SU_, corr)

    f_embed = jax.jit(lambda w: kernel(jnp.asarray(SU), w))
    f_arg = jax.jit(kernel)
    w = jnp.asarray(rng.uniform(0.1, 1.0, size=(k,)).astype(np.float32))
    ye = np.asarray(f_embed(w))
    ya = np.asarray(f_arg(jnp.asarray(SU), w))
    return float(np.abs(ye - ya).max()), float(np.abs(ya).max())


def level2(meas, dtype=jnp.float32):
    """with_weights on a real problem stack: embedded base vs argument."""
    from dpgo_tpu.problem import with_weights

    s = DPGOSolver(meas, num_nodes=4,
                   opts=MMOptions(accelerated=True, rescale="dynamic"),
                   loss=Loss.HUBER, loss_reg=0.25, dtype=dtype)
    probs = s.probs
    N, m1 = probs.scale_w.shape
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.uniform(0.3, 1.0, size=(N, m1)).astype(
        np.dtype(dtype)))

    def images(p, wv):
        pw = jax.vmap(with_weights)(p, wv)
        return pw.mG11_d, pw.mG01_d, pw.Hred_d, pw.wood_C, pw.W

    f_embed = jax.jit(lambda wv: images(probs, wv))
    f_arg = jax.jit(images)
    oe = f_embed(w)
    oa = f_arg(probs, w)
    diffs = [float(jnp.abs(a - b).max()) for a, b in zip(oe, oa)]
    return max(diffs), diffs


def level3(meas, iters=150, dtype=jnp.float32):
    """Full solver trajectory, embedded vs argument, identical init."""
    outs = []
    for embed in (True, False):
        s = DPGOSolver(meas, num_nodes=4,
                       opts=MMOptions(accelerated=True, rescale="dynamic"),
                       loss=Loss.HUBER, loss_reg=0.25, dtype=dtype)
        s._embed_consts = embed
        s._make_jits()
        st = s.initialize()
        st, _ = s.run_steps(st, jnp.zeros((), jnp.int32), iters)
        f, g = map(float, s._metrics(st))
        outs.append((f, g))
    (fe, ge), (fa, ga) = outs
    return abs(fe - fa), (fe, fa)


def main():
    print(f"platform: {jax.devices()[0].platform}")
    d1, scale1 = level1()
    print(f"L1 raw scatter+matmul: max|diff|={d1:.3e} (scale {scale1:.1f})",
          flush=True)
    d1b, scale1b = level1b()
    print(f"L1b gather+inv Woodbury: max|diff|={d1b:.3e} "
          f"(scale {scale1b:.1f})", flush=True)
    meas = read_g2o_file("/root/reference/dataset/CSAIL.g2o")
    d2, diffs2 = level2(meas)
    print(f"L2 with_weights images: max|diff|={d2:.3e} per-output={diffs2}",
          flush=True)
    d3, (fe, fa) = level3(meas)
    print(f"L3 full step trajectory: |2f_embed - 2f_arg|={d3:.3e} "
          f"(embed {fe:.4f} vs arg {fa:.4f})", flush=True)
    repro = d1 > 1e-3 or d2 > 1e-3 or d3 > 0.5
    print("MISCOMPILE REPRODUCES" if repro else "no divergence observed")


if __name__ == "__main__":
    main()
