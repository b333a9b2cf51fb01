"""SE-Sync Riemannian staircase + solution certification.

Reproduces the reference driver SESync::SESync (C++/SESync/src/SESync.cpp:
224-527): for r = d .. rmax run TNT on the rank-r Stiefel-product relaxation,
certify via the dual certificate S = Q - Lambda (min eigenpair by LOBPCG,
SESync_utils.cpp:721-850 / Optimization LOBPCG.h), and on a saddle lift the
negative-curvature eigenvector to rank r+1 with a backtracking escape
(SESync.cpp:417-436). Rounding projects the solution to SO(d)^n and recovers
translations.

Certification bound: for feasible Y (block rows orthonormal, |Y|^2 = n d),
  <Q y, y> = <S y, y> + tr(Lambda)  >=  n d min(0, lambda_min(S)) + tr(Lambda)
so f* >= f(Y) + (n d / 2) min(0, lambda_min(S)); lambda_min >= -tol certifies
global optimality of the rounded solution up to that gap.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dpgo_tpu.io.g2o import Measurements
from dpgo_tpu.sesync.problem import SESyncProblem, build_sesync_problem
from dpgo_tpu.solvers.tnt import TNTParams, tnt_generic


@dataclasses.dataclass
class SESyncOpts:
    r0: int = None  # defaults to d
    rmax: int = 6
    min_eig_tol: float = 1e-5
    tnt: TNTParams = TNTParams(
        max_iterations=200, max_iterations_accepted=200,
        gradient_tolerance=1e-6, preconditioned_gradient_tolerance=1e-8,
        relative_decrease_tolerance=1e-12, stepsize_tolerance=1e-8)
    lobpcg_iters: int = 200
    lobpcg_block: int = 4
    escape_step: float = 1e-2


@dataclasses.dataclass
class SESyncResult:
    # "GlobalOpt": certificate PSD — xhat is a global optimum.
    # "MaxRank": staircase exhausted rmax without a PSD certificate.
    # "EigImprecision": the certificate eigensolve was too marginal to
    #   trust at this tolerance (reference SESync.cpp:380-388); callers
    #   should polish the estimate (LM / coupled Newton) and re-certify
    #   directly (tools/certify_estimate.py) instead of burning ranks.
    status: str            # "GlobalOpt" | "MaxRank" | "EigImprecision"
    R: np.ndarray          # [n, d, d]
    t: np.ndarray          # [n, d]
    fxhat: float           # objective of the rounded solution
    sdp_val: float         # objective of the relaxation solution
    lambda_min: float      # min eigenvalue of the certificate matrix S
    suboptimality_bound: float
    rank: int


def chebyshev_precon(apply_S, lam_max, lam_min=None, degree=8):
    """Chebyshev polynomial approximate inverse of the SPD-shifted
    certificate operator — the TPU-native stand-in for the reference's
    ILDL incomplete-LDL^T LOBPCG preconditioner (Preconditioners/ILDL,
    SESync_utils.cpp:790-830): matrix-free, a fixed chain of `degree`
    matvecs, no sparse triangular solves.

    Returns V -> p(S) V with p ~ 1/x on [a, b], a = lam_min or lam_max/100,
    b = lam_max (standard Chebyshev iteration for S Y = V run `degree`
    steps from Y0 = 0). Any SPD map accelerates LOBPCG; clustering the
    spectrum of T S around 1 is what kills the 1/sqrt(kappa) factor."""
    b = float(lam_max)
    a = float(lam_min) if lam_min else b / 100.0
    theta = 0.5 * (b + a)
    delta = 0.5 * (b - a)
    sigma1 = theta / delta

    def apply(V):
        # Chebyshev iteration (Saad, Iterative Methods, alg. 12.1) for
        # S Y = V, Y0 = 0, `degree` iterations; all ops are matvec/axpy.
        rho = 1.0 / sigma1
        Y = V / theta
        R = V - apply_S(Y)
        D = Y
        for _ in range(degree - 1):
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            D = rho_new * rho * D + (2.0 * rho_new / delta) * R
            Y = Y + D
            R = R - apply_S(D)
            rho = rho_new
        return Y

    return apply


def min_eig_lobpcg(apply_S, nd, key, dtype, block=4, iters=200,
                   resid_tol=None, max_iters=20000, deflate=None,
                   precon=None):
    """Smallest eigenpair of a symmetric operator via basic LOBPCG (B=I,
    no constraints; Optimization/LinearAlgebra/LOBPCG.h algorithm).

    Returns (theta, v, resid) where resid = |S v - theta v|. The Ritz value
    converges to lambda_min FROM ABOVE, so an unconverged run can report a
    positive theta for an indefinite S — callers MUST treat
    (theta - resid) as the defensible estimate (observed: a suboptimal
    city10000 estimate "certifying" with theta = +3e-4 at 300 iterations).

    With resid_tol set, iterates in chunks of `iters` until the eigen-
    residual satisfies resid <= max(resid_tol, 0.5 * max(theta, 0)) —
    i.e. until the sign question "is lambda_min >= -2*resid_tol?" can be
    answered from (theta, resid) — or max_iters is exhausted.

    With `deflate` ([nd, k]), iterates are kept orthogonal to span(deflate):
    returns the smallest eigenpair of S RESTRICTED to that complement. Used
    by certification to remove the solution's known near-null space, where
    the unrestricted spectrum clusters at 0 and LOBPCG stalls.

    `precon` (optional, V -> T V with T SPD ~ S^{-1}) is applied to the
    residual block each iteration — the reference's ILDL-preconditioned
    LOBPCG (SESync_utils.cpp:790-830); see `chebyshev_precon`.

    Robustness (the Duersch-et-al machinery the reference vendors,
    Optimization/LinearAlgebra/LOBPCG.h): (a) SOFT LOCKING — columns whose
    eigen-residual is below the tolerance contribute no search direction
    (their residual column is zeroed) but stay in the Rayleigh-Ritz basis;
    (b) BASIS TRUNCATION — after the [X R P] orthogonalization, basis
    columns whose novel content (|diag R-factor|) collapses below
    sqrt(eps) of the largest are dropped from the Rayleigh-Ritz (masked
    out of H with a +inf diagonal and zeroed in the Ritz rotation), which
    removes the numerically-arbitrary directions Householder QR emits for
    a rank-deficient basis (the zero initial P block, locked residuals,
    or a P block that has converged into span(X)) instead of letting them
    inject noise into the Ritz step. Static shapes throughout (jit-safe:
    dropping is masking, not reshaping)."""

    def ortho(X):
        Q, _ = jnp.linalg.qr(X)
        return Q

    if deflate is not None:
        D = ortho(jnp.asarray(deflate, dtype))
        proj = lambda X: X - D @ (D.T @ X)
    else:
        proj = lambda X: X

    X0 = ortho(proj(jax.random.normal(key, (nd, block), dtype)))
    budget = iters if resid_tol is None else max_iters

    # One jitted device-side while_loop for the whole solve: body does one
    # LOBPCG iteration, the convergence test runs on device (no per-chunk
    # host syncs), and S X is carried across iterations (S X_{k+1} =
    # (S Q) U comes free from the Rayleigh-Ritz pass, halving the big
    # operator applications vs re-applying S to X each round).
    lock_tol = jnp.asarray(0.0 if resid_tol is None else resid_tol, dtype)
    drop_tol = jnp.sqrt(jnp.asarray(jnp.finfo(dtype).eps, dtype))

    def body(carry):
        X, SX, P, k, _, _ = carry
        theta = jnp.einsum("ik,ik->k", X, SX)
        Rres = SX - X * theta[None, :]
        # Soft locking: converged columns stop generating search
        # directions (they remain in the basis via the X block).
        resid_cols = jnp.linalg.norm(Rres, axis=0)
        Rres = jnp.where(resid_cols[None, :] <= lock_tol, 0.0, Rres)
        if precon is not None:
            Rres = precon(Rres)
        Rres = proj(Rres)
        # Subspace [X, R, P] Rayleigh-Ritz (all columns stay in the
        # deflated complement: X, P are by construction, Rres by proj;
        # re-projecting X/P counters numerical drift out of D^perp).
        V = jnp.concatenate([X, Rres, P], axis=1)
        Q, Rf = jnp.linalg.qr(V)
        # Basis truncation: mask columns with no novel content. The X
        # block is never dropped (first `block` columns, orthonormal).
        dR = jnp.abs(jnp.diagonal(Rf))
        good = dR > drop_tol * jnp.max(dR)
        good = good.at[:block].set(True)
        SQ = apply_S(Q)
        H = Q.T @ SQ
        H = 0.5 * (H + H.T)
        gmask = good[:, None] & good[None, :]
        big = jnp.asarray(1e12, dtype) * (1.0 + jnp.max(jnp.abs(H)))
        H = jnp.where(gmask, H, 0.0) \
            + jnp.diag(jnp.where(good, 0.0, big))
        w, U = jnp.linalg.eigh(H)
        U = U * good[:, None]
        Xn = proj(Q @ U[:, :block])
        SXn = SQ @ U[:, :block]
        Pn = proj(Xn - X @ (X.T @ Xn))
        # Convergence of the smallest Ritz pair (ascending eigh order).
        th = w[0]
        resid = jnp.linalg.norm(SXn[:, 0] - th * Xn[:, 0])
        return Xn, SXn, Pn, k + 1, th, resid

    def cond(carry):
        _, _, _, k, th, resid = carry
        go = k < budget
        if resid_tol is not None:
            # Stop once the SIGN question is resolved: theta is always an
            # upper bound on the (restricted) lambda_min, so a clearly
            # negative theta is already a sound negative verdict; a positive
            # theta certifies once the residual is safely below it.
            unresolved = resid > jnp.maximum(resid_tol, 0.5 * jnp.abs(th))
            go = go & (unresolved | (k < 2))
        return go

    init = (X0, apply_S(X0), jnp.zeros_like(X0), jnp.zeros((), jnp.int32),
            jnp.zeros((), dtype), jnp.asarray(jnp.inf, dtype))
    X, _, _, _, _, _ = jax.jit(
        lambda c: jax.lax.while_loop(cond, body, c))(init)

    # Final pair from an EXACT operator application (the carried S X picks
    # up the drift re-projections) — the residual feeds the certificate's
    # defensible bound, so it must be honest.
    SX = apply_S(X)
    theta = jnp.einsum("ik,ik->k", X, SX)
    order = jnp.argsort(theta)
    v = X[:, order[0]]
    th = theta[order[0]]
    resid = jnp.linalg.norm(SX[:, order[0]] - th * v)
    return th, v, resid


def certificate_lambda_bound(apply_S, Y, key, dtype, tol, iters=200,
                             precon=None):
    """Defensible lower bound on lambda_min(S) at a (near-)stationary Y.

    At stationarity S Y = 0 exactly, so span(Y) is S's near-null space and
    the unrestricted spectrum clusters at 0 (where plain LOBPCG stalls and
    its from-above Ritz value can falsely certify). Split the space:

        eps   = |S Yhat|_F           (Yhat = orthonormalized Y; exact matvec)
        lamc  = lambda_min(S | span(Y)^perp)   (deflated LOBPCG, residual-
                backed: lamc_cons = theta - resid)
        lambda_min(S) >= ((lamc - eps) - sqrt((lamc + eps)^2 + 4 eps^2)) / 2

    (the min eigenvalue of the 2x2 interaction bound [[-eps, -eps],
    [-eps, lamc]]). For a true optimum eps ~ 0 and the bound is ~ -eps;
    for a suboptimal candidate eps is the stationarity defect and honestly
    blocks certification. Returns (lam_lb, escape_vec, lamc_cons, eps)."""
    Yd = jnp.asarray(Y, dtype)
    Q, _ = jnp.linalg.qr(Yd)
    eps = float(jnp.linalg.norm(apply_S(Q)))
    lamc, vec, resid = min_eig_lobpcg(
        apply_S, Y.shape[0], key, dtype, iters=iters, resid_tol=tol,
        deflate=Yd, precon=precon)
    lamc_c = float(lamc) - float(resid)
    lam_lb = 0.5 * ((lamc_c - eps)
                    - float(np.sqrt((lamc_c + eps) ** 2 + 4.0 * eps ** 2)))
    return lam_lb, vec, lamc_c, eps


def sesync(meas: Measurements, opts: SESyncOpts = SESyncOpts(),
           dtype=jnp.float64, Y0: np.ndarray | None = None,
           formulation: str = "simplified") -> SESyncResult:
    """Full certifiably-correct solve (Riemannian staircase).

    formulation: "simplified" (translation-eliminated, the default),
    "sosync" (rotation-only), or "explicit" (joint (t, Y) variables —
    reference Formulation::Explicit). Certification always runs on the
    translation-eliminated certificate: at a joint stationary point the
    translations are optimal given Y, so Y is stationary for the reduced
    problem and the same dual certificate S = Q - Lambda applies.
    """
    from dpgo_tpu.sesync.init import chordal_initialization

    prob = build_sesync_problem(
        meas, dtype=dtype,
        formulation="sosync" if formulation == "sosync" else "simplified")
    d, n = prob.d, prob.n
    r = opts.r0 or d

    if Y0 is None:
        R0 = chordal_initialization(meas)
        Y = jnp.asarray(np.swapaxes(R0, 1, 2).reshape(n * d, d), dtype)
    else:
        Y = jnp.asarray(Y0, dtype)
    if Y.shape[1] < r:
        Y = jnp.concatenate(
            [Y, jnp.zeros((n * d, r - Y.shape[1]), dtype)], axis=1)

    explicit = formulation == "explicit"
    if explicit:
        from dpgo_tpu.sesync.problem import build_sesync_explicit
        eprob = build_sesync_explicit(meas, dtype=dtype)
        Rc = prob.round_solution(Y)
        t = prob.recover_translations(Rc)
        t = jnp.concatenate(
            [t, jnp.zeros((n, Y.shape[1] - d), dtype)], axis=1)
        solve_e = jax.jit(
            lambda x: tnt_generic(eprob.tnt_model(), x, opts.tnt))
    else:
        solve = jax.jit(lambda Y: tnt_generic(prob.tnt_model(), Y, opts.tnt),
                        static_argnums=())
    key = jax.random.PRNGKey(0)

    status = "MaxRank"
    lam_min = np.nan
    vec = None
    for rank in range(r, opts.rmax + 1):
        if explicit:
            (t, Y), fY, gn, acc = solve_e((t, Y))
        else:
            Y, fY, gn, acc = solve(Y)
        Lam = prob.Lambda_blocks(Y)
        apply_S = jax.jit(lambda V: prob.apply_S(Lam, V))
        key, sub = jax.random.split(key)
        # Reference fast_verification order: cheap sparse PSD accept, then
        # ARPACK; the sparse translation-explicit certificate only models
        # the simplified/explicit formulations (LOBPCG handles sosync).
        lam_min = vec = None
        if formulation != "sosync":
            try:
                lam_min, vec, lamc, eps = staged_lambda_bound(
                    meas, Lam, apply_S, Y, dtype, opts.min_eig_tol)
            except Exception:
                lam_min = None
        if lam_min is None or (lam_min < -opts.min_eig_tol and vec is None):
            # Need LOBPCG either because the staged path was unavailable,
            # or the PSD accept failed only through a large stationarity
            # defect eps (vec=None) and a saddle escape direction is
            # required.
            lam_min, vec, lamc, eps = certificate_lambda_bound(
                apply_S, Y, sub, dtype, opts.min_eig_tol,
                iters=opts.lobpcg_iters)
        if lam_min >= -opts.min_eig_tol:
            status = "GlobalOpt"
            break
        if lamc >= -opts.min_eig_tol / 2:
            # No genuinely negative curvature direction in span(Y)^perp:
            # the failed verdict comes from the stationarity defect eps /
            # eigensolver imprecision, not a saddle — escalating the rank
            # would burn the staircase to MaxRank on a point that is
            # (numerically) already optimal. The reference stops here with
            # EigImprecision (SESync.cpp:380-388); callers can polish the
            # estimate to tighter stationarity and re-certify directly
            # (lm_polish + certify_solution).
            status = "EigImprecision"
            break
        if rank == opts.rmax:
            break
        # Saddle escape: lift to rank+1 along the negative eigenvector with
        # backtracking (SESync::escape_saddle).
        Yl = jnp.concatenate(
            [Y, jnp.zeros((n * d, 1), dtype)], axis=1)
        Vdir = jnp.concatenate(
            [jnp.zeros_like(Y), vec[:, None]], axis=1)
        prob_r = prob  # same problem; manifold ops are rank-agnostic
        f0 = float(prob.objective(Yl))
        alpha = opts.escape_step
        Y_next = None
        for _ in range(30):
            cand = prob.retract(Yl, alpha * Vdir)
            if float(prob.objective(cand)) < f0 - 1e-12:
                Y_next = cand
                break
            alpha *= 0.5
        Y = Y_next if Y_next is not None else prob.retract(
            Yl, opts.escape_step * Vdir)
        if explicit:
            t = jnp.concatenate([t, jnp.zeros((n, 1), dtype)], axis=1)

    sdp_val = float(prob.objective(Y))
    R = prob.round_solution(Y)
    t = prob.recover_translations(R)
    Yr = jnp.swapaxes(R, 1, 2).reshape(n * d, d)
    fxhat = float(prob.objective(Yr))
    # f* >= sdp_val + (nd/2) min(0, lam_min), so
    # f(xhat) - f* <= (fxhat - sdp_val) + (nd/2) max(0, -lam_min)
    # (SESync.cpp:505-527 duality-gap computation).
    bound = (fxhat - sdp_val) \
        + 0.5 * n * d * max(0.0, -min(lam_min, 0.0))
    return SESyncResult(
        status=status, R=np.asarray(R), t=np.asarray(t), fxhat=fxhat,
        sdp_val=sdp_val, lambda_min=lam_min, suboptimality_bound=bound,
        rank=Y.shape[1])


def certificate_sparse_full(meas: Measurements, Lam_blocks: np.ndarray):
    """Sparse translation-explicit certificate S_full = M - blkdiag(0, Lam).

    Mirrors the reference's verification route (SESyncProblem.cpp:430-452):
    the PSD test runs on the certificate of the FULL (t-explicit) problem,
    whose data matrix M is sparse, rather than the dense simplified Q. M is
    built as B^T B from the edge residual factor (state X = [t; Y] with
    Y_i = R_i^T, F = 1/2 |B X|_F^2):

        rt-row:  sqrt(tau)  (e_i^T t + t~^T Y_i - e_j^T t)     (1 row/edge)
        rR-rows: sqrt(kappa)(R~^T Y_i - Y_j)                   (d rows/edge)

    By the generalized Schur-complement argument, S_full >= 0 iff the
    simplified certificate S = Q - Lam >= 0 (SE-Sync Prop. 4 machinery).
    CAUTION — the eta-SHIFTED accept does NOT transfer at the same eta:
    for a unit eigenvector y of S, the full-state Rayleigh quotient at
    x = [t*(y); y] is lambda / (1 + |t*(y)|^2) with t*(y) = -L_tau^+ V y,
    so S_full >= -eta I only proves S >= -eta (1 + |L^+ V|_2^2) I.
    Callers must deflate eta by the compression factor
    (`translation_compression`); the reference's own fast_verification
    ignores this (CHOLMOD attempt at the raw eta, SESync_utils.cpp:
    721-757) — we keep the stronger guarantee."""
    import scipy.sparse as sp
    n, d, m = meas.num_poses, meas.d, len(meas)
    i, j = meas.i, meas.j
    sq_tau = np.sqrt(meas.tau)
    sq_kap = np.sqrt(meas.kappa)
    rows, cols, vals = [], [], []
    e = np.arange(m)

    def add(rr, cc, vv):
        rows.append(np.broadcast_to(rr, vv.shape).ravel())
        cols.append(np.broadcast_to(cc, vv.shape).ravel())
        vals.append(vv.ravel())

    # Translation rows: one per edge (row id e), unknown columns:
    # t_i (col i), t_j (col j), Y_i rows (cols n + d*i .. n + d*i + d - 1).
    add(e, i, sq_tau)
    add(e, j, -sq_tau)
    add(e[:, None], n + d * i[:, None] + np.arange(d)[None, :],
        sq_tau[:, None] * meas.t)
    # Rotation rows: d per edge (row ids m + d*e + a), R~^T Y_i - Y_j.
    # (R~^T)[a, b] multiplies Y_i's row b into output row a.
    ra = m + d * e[:, None, None] + np.arange(d)[None, :, None]
    add(ra, n + d * i[:, None, None] + np.arange(d)[None, None, :],
        sq_kap[:, None, None] * np.swapaxes(meas.R, -1, -2))
    add(m + d * e[:, None] + np.arange(d)[None, :],
        n + d * j[:, None] + np.arange(d)[None, :],
        np.broadcast_to(-sq_kap[:, None], (m, d)))
    B = sp.coo_matrix(
        (np.concatenate(vals),
         (np.concatenate(rows), np.concatenate(cols))),
        shape=(m * (1 + d), n * (1 + d))).tocsr()
    M = (B.T @ B).tocsr()
    Lam = sp.block_diag(
        [sp.csr_matrix((n, n))] + [sp.csr_matrix(np.asarray(Lam_blocks[k]))
                                   for k in range(n)], format="csr")
    return (M - Lam).tocsc()


def translation_compression(meas: Measurements, iters: int = 200,
                            seed: int = 0, rtol: float = 1e-3) -> float:
    """Estimate sigma^2 = |L_tau^+ V|_2^2 — the factor by which negative
    curvature of the simplified certificate S is compressed in the
    translation-explicit S_full (see certificate_sparse_full). Power
    iteration on V^T L^-1 L^-1 V with a grounded (pose-0-removed) sparse
    factorization of the tau-Laplacian; the grounded solve's norm upper-
    bounds the min-norm response, so the estimate errs conservative in
    that respect. Power iteration itself converges from below, so the
    iteration runs to a relative-change tolerance `rtol` (not a fixed
    count) from TWO independent random starts and returns the max — the
    callers' 2x safety factor then only has to cover the residual
    convergence slack, not a badly unconverged estimate."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    n, d = meas.num_poses, meas.d
    i, j = meas.i, meas.j
    L = sp.coo_matrix(
        (np.concatenate([meas.tau, meas.tau, -meas.tau, -meas.tau]),
         (np.concatenate([i, j, i, j]), np.concatenate([i, j, j, i]))),
        shape=(n, n)).tocsc()
    lu = spla.splu(L[1:, 1:].tocsc())

    # V = t-R coupling block of M = B^T B: row t_i couples to Y_i rows via
    # tau * t~ (and the pure-translation rows cancel against t_j). Apply
    # V / V^T edge-wise rather than slicing M (cheap, allocation-free).
    def V_apply(w):            # w [dn] -> [n]
        Wb = w.reshape(n, d)
        c = meas.tau * np.einsum("ea,ea->e", meas.t, Wb[i])
        out = np.zeros(n)
        np.add.at(out, i, c)
        np.add.at(out, j, -c)
        return out

    def Vt_apply(u):           # u [n] -> [dn]
        s = meas.tau * (u[i] - u[j])
        out = np.zeros((n, d))
        np.add.at(out, i, s[:, None] * meas.t)
        return out.ravel()

    def power_iter(start_seed):
        rng = np.random.default_rng(start_seed)
        w = rng.standard_normal(n * d)
        w /= np.linalg.norm(w)
        sig2 = 0.0
        for _ in range(iters):
            u = V_apply(w)                                   # V w
            z = np.concatenate([[0.0], lu.solve(u[1:])])     # L^+ (V w)
            z -= z.mean()
            z2 = np.concatenate([[0.0], lu.solve(z[1:])])    # L^+ L^+ (V w)
            z2 -= z2.mean()
            v = Vt_apply(z2)                                 # V^T L^-2 V w
            nrm = np.linalg.norm(v)
            if nrm == 0:
                break
            prev = sig2
            sig2 = nrm  # Rayleigh est. of lambda_max(V^T L^-2 V) = sigma^2
            w = v / nrm
            if prev > 0 and abs(sig2 - prev) <= rtol * sig2:
                break
        return float(sig2)

    return max(power_iter(seed), power_iter(seed + 104729))


def psd_accept_splu(S, eta: float):
    """Reference fast_verification stage 1 (SESync_utils.cpp:721-757):
    attempt a Cholesky-equivalent factorization of S + eta*I; success
    proves S >= -eta*I. CHOLMOD is unavailable, so the factorization is
    SuperLU in symmetric mode with diagonal pivoting only
    (diag_pivot_thresh=0): if it completes with a purely symmetric
    permutation (perm_r inverse of perm_c) and all U pivots positive, then
    P(S + eta I)P^T = L D L^T with D > 0, i.e. positive definite.

    Returns True (proved PSD within eta), False (a negative pivot — proved
    indefinite at this shift), or None (row pivoting engaged / breakdown:
    inconclusive, caller must fall back to the eigensolver)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    n = S.shape[0]
    A = (S + eta * sp.identity(n, format="csc")).tocsc()
    try:
        lu = spla.splu(A, diag_pivot_thresh=0.0,
                       permc_spec="MMD_AT_PLUS_A",
                       options=dict(SymmetricMode=True))
    except RuntimeError:
        return None  # exactly singular pivot: inconclusive at this shift
    pr = np.asarray(lu.perm_r)
    pc = np.asarray(lu.perm_c)
    if not np.array_equal(pr, pc):
        return None  # row pivoting engaged: not an LDL^T, inconclusive
    piv = lu.U.diagonal()
    if np.all(piv > 0):
        return True
    return False


def min_eig_arpack_deflated(apply_S_np, Y: np.ndarray, nd: int,
                            tol: float = 1e-8, maxiter: int = None,
                            ncv: int = 64, shift: float = None):
    """lambda_min of the simplified certificate S restricted to span(Y)^perp
    via ARPACK (scipy eigsh) on the deflation-shifted operator
    S' = S + c YY^T — the fast CPU alternative to min_eig_lobpcg for the
    clustered-at-zero spectra where LOBPCG needs thousands of iterations
    (city10000 staircase certificate: 435 s LOBPCG -> seconds here).

    Residual-honest like the LOBPCG path: the returned (lamc, resid) come
    from one exact operator application to the deflated-projected Ritz
    vector, so lamc - resid is a defensible lower bound on the restricted
    lambda_min regardless of ARPACK's internal state."""
    import scipy.sparse.linalg as spla
    Q, _ = np.linalg.qr(np.asarray(Y, np.float64))
    if shift is None:
        # Safe deflation shift: a few power iterations for |S|.
        v = np.random.default_rng(0).standard_normal(nd)
        v /= np.linalg.norm(v)
        for _ in range(8):
            w = apply_S_np(v)
            nrm = np.linalg.norm(w)
            if nrm == 0:
                break
            v = w / nrm
        shift = 4.0 * max(nrm, 1.0)

    # The target eigenvalue sits at ~0 for healthy certificates, where
    # ARPACK's RELATIVE tolerance can never be met — offset the whole
    # spectrum by -c0 so the target has magnitude ~c0; the offset is
    # removed from the returned Rayleigh pair (and the honest residual is
    # recomputed on the true operator regardless).
    c0 = 0.5 * shift

    def mv(x):
        return apply_S_np(x) + shift * (Q @ (Q.T @ x)) - c0 * x

    op = spla.LinearOperator((nd, nd), matvec=mv, dtype=np.float64)
    try:
        w, V = spla.eigsh(op, k=1, which="SA", tol=tol,
                          maxiter=maxiter, ncv=min(ncv, nd - 1))
    except spla.ArpackNoConvergence as e:
        # Clustered-at-zero spectra (healthy certificates) can exhaust the
        # Lanczos budget; the partial Ritz pair is still usable because
        # the returned bound charges the EXACT residual below — an
        # unconverged vector just gives a looser, still-sound lamc-resid.
        if e.eigenvectors is None or e.eigenvectors.shape[1] == 0:
            raise
        V = e.eigenvectors
    v = V[:, 0]
    # Project out span(Y) drift and take an exact honest Rayleigh pair.
    v = v - Q @ (Q.T @ v)
    v /= np.linalg.norm(v)
    Sv = apply_S_np(v)
    lamc = float(v @ Sv)
    res = Sv - lamc * v
    res = res - Q @ (Q.T @ res)   # residual within the complement
    return lamc, v, float(np.linalg.norm(res))


def staged_lambda_bound(meas: Measurements, Lam, apply_S, Y, dtype,
                        min_eig_tol: float, eta_psd: float = 1e-7):
    """Reference-ordered certificate bound: sparse Cholesky-equivalent PSD
    accept on S_full first (fast_verification stage 1), ARPACK deflated
    eigensolve on failure — both feeding the same residual-honest 2x2
    interaction bound as certificate_lambda_bound.

    The accept shift is deflated by the translation compression factor
    (S_full >= -eta I only proves S >= -eta (1 + sigma^2) I; see
    certificate_sparse_full): eta_eff = min(eta_psd, tol/2 / (1 + 2
    sigma_est^2)), the 2x safety covering power-iteration from-below
    convergence. When eta_eff sinks below the factorization's own
    floating-point resolution (~1e3 eps |S|), the accept cannot honestly
    resolve the question and the ARPACK stage runs instead.

    Returns (lam_lb, escape_vec_or_None, lamc_cons, eps); raises on
    ARPACK breakdown (callers fall back to LOBPCG)."""
    Y_np = np.asarray(Y, np.float64)
    Qo, _ = np.linalg.qr(Y_np)
    eps = float(np.linalg.norm(np.asarray(apply_S(jnp.asarray(Qo, dtype)))))

    def bound(lamc_c):
        return 0.5 * ((lamc_c - eps) - float(
            np.sqrt((lamc_c + eps) ** 2 + 4.0 * eps ** 2)))

    Sfull = certificate_sparse_full(meas, np.asarray(Lam))
    sig2 = translation_compression(meas)
    eta_eff = min(eta_psd, 0.5 * min_eig_tol / (1.0 + 2.0 * sig2))
    fp_floor = 1e3 * np.finfo(np.float64).eps * abs(Sfull).max()
    if eta_eff >= fp_floor and psd_accept_splu(Sfull, eta_eff) is True:
        lamc_c = -eta_eff * (1.0 + 2.0 * sig2)
        return bound(lamc_c), None, lamc_c, eps

    def apply_S_np(v):
        return np.asarray(apply_S(jnp.asarray(v[:, None], dtype))).ravel()

    # Stage 2: SHORT plain-Lanczos budget. ARPACK `maxiter` counts IRAM
    # restarts (up to ncv matvecs each), so the old 2000-restart budget
    # allowed ~192k matvecs — minutes of burn on exactly the marginal
    # clustered-at-zero spectra that plain Lanczos cannot resolve anyway.
    # Saddles and well-separated spectra converge within a few restarts;
    # everything else falls through to the shift-invert stage quickly.
    nd = Y_np.shape[0]
    try:
        lamc, vec, resid = min_eig_arpack_deflated(
            apply_S_np, Y_np, nd, tol=min(1e-8, min_eig_tol),
            maxiter=30, ncv=96)
        unconverged = resid > max(abs(lamc), min_eig_tol)
    except Exception:
        unconverged = True
    if unconverged:
        # Stage 3 (the DEFAULT marginal route, generalized from the
        # ais2klinik rescue): deflated LOBPCG with the exact sparse
        # shift-invert Schur preconditioner — corridor-conditioned /
        # clustered-at-zero spectra where unpreconditioned Lanczos cannot
        # push the absolute residual below tol in any reasonable budget.
        # Min-seeking + residual-honest: the preconditioner only
        # accelerates; the bound charges the exact residual.
        delta = max(min_eig_tol, 10 * np.finfo(np.float64).eps
                    * abs(Sfull).max())
        pre_np = schur_shift_invert_precon(Sfull, meas.num_poses, nd,
                                           delta)

        def pre(V):
            return jax.pure_callback(
                lambda X: pre_np(np.asarray(X)).astype(np.asarray(X).dtype),
                jax.ShapeDtypeStruct(V.shape, V.dtype), V,
                vmap_method="sequential")

        lamc_j, vec_j, resid_j = min_eig_lobpcg(
            apply_S, nd, jax.random.PRNGKey(2), dtype,
            resid_tol=min_eig_tol, max_iters=2000, deflate=Y_np,
            precon=pre)
        lamc, vec = float(lamc_j), np.asarray(vec_j)
        resid = float(resid_j)
        if resid > max(abs(lamc), min_eig_tol):
            raise RuntimeError("certificate eigensolve unconverged "
                               f"(lamc={lamc:.3e}, resid={resid:.3e})")
    return bound(lamc - resid), jnp.asarray(vec, dtype), lamc - resid, eps


def schur_shift_invert_precon(Sfull, n: int, nd: int, delta: float):
    """LOBPCG preconditioner T ~ (S + delta I)^-1 for the SIMPLIFIED
    certificate, built from one sparse factorization of the translation-
    explicit S_full + delta I: by the block-inverse identity, the
    rotation-block of (S_full + delta I)^-1 is the inverse of the
    delta-shifted generalized Schur complement, which is S + delta I up to
    O(delta)-coupling terms. Cost: one splu of the sparse (n+nd) system +
    two triangular solves per application — the TPU-forbidden sparse-
    direct trick is fair game here (host-side certification tool), and it
    is exactly what the corridor-conditioned spectra (ais2klinik) need:
    eigenvalues >> delta are mapped near 1, the near-zero cluster caps at
    1/delta. Honesty is unaffected — preconditioning only accelerates the
    eigensolver; the certificate bound charges the exact residual."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    A = (Sfull + delta * sp.identity(Sfull.shape[0], format="csc")).tocsc()
    lu = spla.splu(A)

    def apply_np(V):
        V = np.asarray(V, np.float64)
        rhs = np.zeros((n + nd, V.shape[1]))
        rhs[n:] = V
        out = lu.solve(rhs)
        return np.ascontiguousarray(out[n:])

    return apply_np


def certify_solution(meas: Measurements, R: np.ndarray,
                     min_eig_tol: float = 1e-5, dtype=jnp.float64,
                     lobpcg_iters: int = 300, precon: str | None = "auto",
                     method: str = "auto", eta_psd: float = 1e-7):
    """Certify a candidate SO(d)^n solution of the PGO problem (the SE-Sync
    machinery applied to a DPGO output; reference fast_verification).

    method="auto" (default) runs the reference fast_verification order
    (SESync_utils.cpp:721-850): (1) build the SPARSE translation-explicit
    certificate S_full and attempt the Cholesky-equivalent PSD accept at
    shift eta_psd (certificate_sparse_full / psd_accept_splu) — the cheap
    branch that resolves comfortably-PSD certificates in milliseconds;
    (2) on failure/inconclusive, the ARPACK deflated eigensolve on the
    simplified S (min_eig_arpack_deflated) with the residual-honest 2x2
    interaction bound; (3) on ARPACK breakdown, the original deflated
    LOBPCG (method="lobpcg" forces this path; its `precon` semantics
    unchanged: "chebyshev" opt-in, "auto" -> none).
    Returns (certified, lambda_min, suboptimality_bound, fxhat)."""
    prob = build_sesync_problem(meas, dtype=dtype)
    n, d = prob.n, prob.d
    Y = jnp.asarray(np.swapaxes(R, 1, 2).reshape(n * d, d), dtype)
    Lam = prob.Lambda_blocks(Y)
    apply_S = jax.jit(lambda V: prob.apply_S(Lam, V))
    fxhat = float(prob.objective(Y))
    tr_lam = float(jnp.sum(jnp.trace(Lam, axis1=-2, axis2=-1)))

    def finish(lam_min):
        # f* >= tr(Lambda)/2 + (nd/2) min(0, lam_min); for a stationary
        # candidate tr(Lambda) = <Q y, y> and the slack term vanishes.
        bound = max(0.0, fxhat - 0.5 * tr_lam) \
            + 0.5 * n * d * max(0.0, -min(lam_min, 0.0))
        return lam_min >= -min_eig_tol, lam_min, bound, fxhat

    if method == "auto":
        # Stage 1+2 (staged_lambda_bound): sparse Cholesky-equivalent PSD
        # accept — success proves S_full >= -eta_psd I, hence (by the
        # Schur-complement transfer) the simplified S is PSD to the same
        # shift, with the stationarity defect charged via eps = |S Yhat|
        # exactly as in certificate_lambda_bound — then ARPACK deflated
        # eigensolve on failure.
        try:
            lam_min, _, _, _ = staged_lambda_bound(
                meas, Lam, apply_S, Y, dtype, min_eig_tol, eta_psd)
            return finish(lam_min)
        except Exception:
            pass  # ARPACK breakdown: fall through to LOBPCG

    pre = None
    if precon == "auto":
        precon = None
    if precon == "chebyshev":
        from dpgo_tpu.ops.eigen import lanczos_extreme
        lam_max, _ = lanczos_extreme(
            lambda v: np.asarray(apply_S(jnp.asarray(v[:, None], dtype)))
            .ravel(), n * d, which="max", tol=1e-3, seed=3)
        pre = chebyshev_precon(apply_S, 1.05 * lam_max)
    lam_min, _, lamc, eps = certificate_lambda_bound(
        apply_S, Y, jax.random.PRNGKey(1), dtype, min_eig_tol,
        iters=lobpcg_iters, precon=pre)
    return finish(lam_min)
