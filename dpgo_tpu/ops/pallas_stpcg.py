"""Pallas TPU kernel: the ENTIRE Steihaug-Toint truncated preconditioned CG
solve in one kernel launch.

The refined MM step's cost is ~100 small XLA kernels per TNT iteration
(matmul + per-block einsums + CG scalar updates, times 2-5 CG trips), each
latency-bound at these shapes ([n d, d] with d = 3). This kernel keeps the
dense reduced operator Hred and the preconditioner P resident in VMEM across
ALL CG iterations and runs the loop on-core:

- vectors live structure-of-arrays as 9 rows x n lanes (the layout of
  ops/pallas_so3.py — the TPU analog of the reference's AVX lanes,
  DPGO/internal/svd3x3.h);
- the Hred/P matvecs are 9 MXU matmuls [3, n] @ [n, n] over the (r, s)
  d x d block panels of the symmetric operators;
- the point-dependent curvature correction (S_p @ v_p per pose block) and
  the tangent projection are full-width VPU arithmetic on the 9 rows;
- CG scalars update in registers; the trust-region boundary / kernel /
  convergence exits mirror solvers/tnt.py stpcg exactly (which remains the
  portable reference implementation this kernel is tested against).

VMEM budget: 2 * 9 * n_pad^2 * 4 bytes for the two operator panels, ~3x
that in scoped headroom — the kernel is gated to blocks whose total scoped
estimate fits in 100 MB (fits_vmem: ~640 poses/node for d=3, ~896 for
d=2); larger blocks use the XLA path (and past dense_limit, the segment
path).

Reference analog: the STPCG inner-inner loop, Optimization/LinearAlgebra/
IterativeSolvers.h:166-450, with the RegularizedCholesky preconditioner
application (DPGOProblem.cpp:579-598) fused in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def vmem_bytes(n_pad: int, d: int = 3) -> int:
    return 2 * d * d * n_pad * n_pad * 4


def fits_vmem(n: int, d: int = 3, budget: int = 100 * 2 ** 20) -> bool:
    # Gate on the TOTAL scoped-VMEM estimate Mosaic is given (stpcg_fused's
    # compiler_params): the two resident panels plus ~2x panel headroom for
    # the unrolled matvec's panel loads, plus 8 MB for vectors/scratch.
    # v5e has 128 MB of physical VMEM; a 96.5 MB scoped budget (n_pad=640,
    # d=3 — the rim_synth 640-pose blocks) compiles and runs measured 1.66x
    # faster than the XLA-op CG path, so the gate admits everything whose
    # estimate stays within 100 MB: n_pad <= 640 for d=3, <= 896 for d=2.
    n_pad = -(-n // LANE) * LANE
    return vmem_bytes(n_pad, d) * 3 + 8 * 2 ** 20 <= budget


def _mul_d(x, y, d):
    """d x d block matmul on d*d-tuples of lane vectors (row-major)."""
    return tuple(
        sum(x[a * d + k] * y[k * d + b] for k in range(d))
        for a in range(d) for b in range(d))


def _transpose_d(x, d):
    return tuple(x[b * d + a] for a in range(d) for b in range(d))


def block_panels(M: np.ndarray, d: int, n_pad: int) -> np.ndarray:
    """[n d, n d] dense operator -> [d*d, n_pad, n_pad] block panels with
    panels[r*d+s][p, q] = M[p*d + r, q*d + s] (zero-padded)."""
    nd = M.shape[0]
    n = nd // d
    P = M.reshape(n, d, n, d).transpose(1, 3, 0, 2).reshape(d * d, n, n)
    out = np.zeros((d * d, n_pad, n_pad), M.dtype)
    out[:, :n, :n] = P
    return out


def to_soa(tall: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    """Tall [n d, d] -> SoA [d*d, n_pad]: row a*d+b holds block entry
    [a, b] of every pose."""
    nd, d = tall.shape
    n = nd // d
    soa = tall.reshape(n, d, d).transpose(1, 2, 0).reshape(d * d, n)
    return jnp.pad(soa, ((0, 0), (0, n_pad - n)))


def from_soa(soa: jnp.ndarray, n: int) -> jnp.ndarray:
    d2 = soa.shape[0]
    d = int(round(d2 ** 0.5))
    return soa[:, :n].reshape(d, d, n).transpose(2, 0, 1).reshape(n * d, d)


def _rows(ref_val, dd):
    return tuple(ref_val[i, :] for i in range(dd))


def _ip9(x, y):
    return sum(jnp.sum(a * b) for a, b in zip(x, y))


def _axpy9(alpha, x, y):
    return tuple(b + alpha * a for a, b in zip(x, y))


def _scale9(alpha, x):
    return tuple(alpha * a for a in x)


def _sel9(pred, x, y):
    return tuple(jnp.where(pred, a, b) for a, b in zip(x, y))


def _sym_d(t, d):
    """0.5 (T + T^T) on a d*d-tuple."""
    tt = _transpose_d(t, d)
    return tuple(0.5 * (a + b) for a, b in zip(t, tt))


def _matvec_panels(panels_ref, v, d):
    """SoA matvec with the [d*d, n_pad, n_pad] block panels of a SYMMETRIC
    tall-storage operator: out[r*d+c] = sum_s v[s*d+c] @ panels[s*d+r]
    (symmetry turns the transposed panel into the (s, r) panel)."""
    outs = [None] * (d * d)
    for r in range(d):
        for s in range(d):
            Vd = jnp.stack([v[s * d + c] for c in range(d)])
            contrib = jnp.dot(Vd, panels_ref[s * d + r],
                              preferred_element_type=jnp.float32)
            for c in range(d):
                o = outs[r * d + c]
                outs[r * d + c] = contrib[c] if o is None else o + contrib[c]
    return tuple(outs)


def _stpcg_kernel(scal_ref, H_ref, P_ref, g_ref, v0_ref, Q_ref, S_ref,
                  s_out, Hs_out, stats_out, *, max_iters: int, d: int):
    Delta = scal_ref[0, 0]
    active = scal_ref[0, 1] > 0.0
    # Residual target r0 * min(kappa, r0^theta) is computed OUTSIDE the
    # kernel (Mosaic has no powf lowering) and passed in.
    target = scal_ref[0, 2]
    dd = d * d

    Q = _rows(Q_ref, dd)
    S = _rows(S_ref, dd)
    grad = _rows(g_ref, dd)
    v0 = _rows(v0_ref, dd)

    def proj(v):
        # v - sym(Q_p V_p^T) @ Q_p per block (manifold.proj_tangent in tall
        # SoA form).
        t = _sym_d(_mul_d(Q, _transpose_d(v, d), d), d)
        return tuple(a - b for a, b in zip(v, _mul_d(t, Q, d)))

    def hess(v):
        hv = _matvec_panels(H_ref, v, d)
        corr = _mul_d(S, v, d)
        return proj(tuple(a - b for a, b in zip(hv, corr)))

    def precon(v):
        return proj(_matvec_panels(P_ref, v, d))

    eps = 1e-8
    r0v0 = _ip9(grad, v0)
    r0_norm = jnp.sqrt(r0v0)
    Delta2 = Delta * Delta

    zero = _scale9(0.0, grad)
    done0 = (r0_norm <= target) | (r0_norm == 0.0) | (~active)
    init = (zero, zero, grad, v0, _scale9(-1.0, v0),
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32), r0v0,
            jnp.zeros((), jnp.int32), done0, jnp.zeros((), jnp.float32))

    def cond(st):
        return (~st[9]) & (st[8] < max_iters)

    def body(st):
        s, Hs, r, v, p, sk_M_pk, sk_M_2, pk_M_2, k, done, norm_out = st
        Hp = hess(p)
        kappa_k = _ip9(p, Hp)
        p_norm = jnp.sqrt(_ip9(p, p))
        Hp_norm = jnp.sqrt(_ip9(Hp, Hp))
        in_kernel = Hp_norm < eps * p_norm

        def sigma_of(smp):
            disc = smp * smp + pk_M_2 * (Delta2 - sk_M_2)
            return (-smp + jnp.sqrt(jnp.maximum(disc, 0.0))) / pk_M_2

        p_desc = jnp.where(_ip9(p, r) < 0, -1.0, 1.0)
        sig_k = sigma_of(sk_M_pk * p_desc) * p_desc
        s_kernel = _axpy9(sig_k, p, s)
        Hs_kernel = _axpy9(sig_k, Hp, Hs)

        rv = _ip9(r, v)
        alpha = rv / kappa_k
        sk1_M_2 = sk_M_2 + 2 * alpha * sk_M_pk + alpha * alpha * pk_M_2
        bad = (kappa_k <= 0) | (sk1_M_2 > Delta2)
        sig_b = sigma_of(sk_M_pk)
        s_boundary = _axpy9(sig_b, p, s)
        Hs_boundary = _axpy9(sig_b, Hp, Hs)

        s_new = _axpy9(alpha, p, s)
        Hs_new = _axpy9(alpha, Hp, Hs)
        r_new = _axpy9(alpha, Hp, r)
        v_new = precon(r_new)
        rv_new = _ip9(r_new, v_new)
        beta = rv_new / (alpha * kappa_k)
        sk_M_pk_new = beta * (sk_M_pk + alpha * pk_M_2)
        pk_M_2_new = rv_new + beta * beta * pk_M_2
        p_new = _axpy9(beta, p, _scale9(-1.0, v_new))
        interior_done = jnp.sqrt(rv_new) <= target

        exit_b = in_kernel | bad
        s_exit = _sel9(in_kernel, s_kernel, s_boundary)
        Hs_exit = _sel9(in_kernel, Hs_kernel, Hs_boundary)

        return (_sel9(exit_b, s_exit, s_new),
                _sel9(exit_b, Hs_exit, Hs_new),
                _sel9(exit_b, r, r_new),
                _sel9(exit_b, v, v_new),
                _sel9(exit_b, p, p_new),
                jnp.where(exit_b, sk_M_pk, sk_M_pk_new),
                jnp.where(exit_b, sk_M_2, sk1_M_2),
                jnp.where(exit_b, pk_M_2, pk_M_2_new),
                k + 1,
                exit_b | interior_done,
                jnp.where(exit_b, Delta, norm_out))

    out = jax.lax.while_loop(cond, body, init)
    s, Hs = out[0], out[1]
    norm = jnp.where(out[10] > 0, out[10], jnp.sqrt(out[6]))
    for i in range(dd):
        s_out[i, :] = s[i]
        Hs_out[i, :] = Hs[i]
    stats_out[0, 0] = norm
    stats_out[0, 1] = out[8].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("max_iters", "kappa_fgr",
                                             "theta"))
def stpcg_fused(Hpan, Ppan, g_tall, v0_tall, Q_tall, S_blocks, Delta,
                active, *, max_iters: int, kappa_fgr: float, theta: float):
    """Run the fused STPCG kernel for ONE node.

    Hpan/Ppan: [9, n_pad, n_pad] block panels (block_panels of Hred /
    precon_dense). g/v0/Q: tall [n d, d] f32. S_blocks: [n, d, d] curvature
    blocks sym(Q_p nabla_p^T). Returns (h_tall, Hh_tall, h_M_norm, k).
    Padded poses must carry zero gradient (guaranteed by construction).
    """
    n_pad = Hpan.shape[-1]
    nd, d = g_tall.shape
    n = nd // d
    g9 = to_soa(g_tall, n_pad)
    v9 = to_soa(v0_tall, n_pad)
    Q9 = to_soa(Q_tall, n_pad)
    S_tall = S_blocks.reshape(n * d, d)
    S9 = to_soa(S_tall, n_pad)
    r0_norm = jnp.sqrt(jnp.sum(g_tall * v0_tall))
    target = r0_norm * jnp.minimum(kappa_fgr, r0_norm ** theta)
    scal = jnp.stack([jnp.asarray(Delta, jnp.float32),
                      jnp.asarray(active, jnp.float32),
                      jnp.asarray(target, jnp.float32)]).reshape(1, 3)

    kern = functools.partial(_stpcg_kernel, max_iters=max_iters, d=d)
    s9, Hs9, stats = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((d * d, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((d * d, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        # The two operator panels alone are 2*9*n_pad^2*4 B; raise the
        # Mosaic scoped-VMEM budget past the 16 MB default (v5e has 128 MB
        # of physical VMEM) to cover the panels plus the unrolled matvec's
        # panel loads.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                vmem_bytes(n_pad, d) * 3 + 8 * 2 ** 20, 100 * 2 ** 20)),
        interpret=jax.default_backend() == "cpu",
    )(scal, Hpan, Ppan, g9, v9, Q9, S9)

    h = from_soa(s9, n)
    Hh = from_soa(Hs9, n)
    return h, Hh, stats[0, 0], stats[0, 1].astype(jnp.int32)
