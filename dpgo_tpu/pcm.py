"""Pairwise consistency maximization (PCM) outlier rejection.

Reproduces the reference DPGO::PCM (C++/DPGO/include/DPGO/PCM.h,
src/PCM.cpp) + the vendored Pattabiraman fast max-clique solvers
(C++/PCM/fmc): for each node pair, build the pairwise-consistency graph of
their inter-node measurements — edge (p, q) is consistent when the composed
loop

    T_p(i0<-j0) o T_est(j0<-j1) o T_q^{-1}(j1<-i1) o T_est(i1<-i0)

is within tolerance of the identity (error = sqrt(kappa |R_loop - I|^2 +
tau |t_loop|^2), PCM.cpp:226-230) — then select the maximum mutually
consistent subset by max clique.

The loop-error matrix is one batched einsum over all measurement pairs
(device-friendly); the max-clique search runs on the host with bitset
branch-and-bound (graphs are small: tens of inter edges per node pair).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from dpgo_tpu.graph import make_partition
from dpgo_tpu.io.g2o import Measurements


@dataclasses.dataclass(frozen=True)
class PCMOptions:
    tolerance: float = 0.2
    weighted: bool = False
    exact: bool = True
    exact_limit: int = 64  # fall back to the heuristic above this size
    # Use the native C++ branch-and-bound (native/max_clique.cpp — the
    # reference's vendored fmc library role) when available; the pure-Python
    # bitset solver below is the fallback. With the native solver the exact
    # path stays fast well past exact_limit.
    native: bool = True


def loop_errors(P, Q) -> jnp.ndarray:
    """Cross loop-error matrix between two sets of oriented measurements.

    P and Q are tuples (meas_R [m,d,d], meas_t [m,d], kappa [m], tau [m],
    ti [m,d], Ri [m,d,d], tj [m,d], Rj [m,d,d]) — alpha->beta oriented
    measurements with the current endpoint pose estimates. Returns
    err [mP, mQ] with err[p, q] the composed-loop deviation

        e = sqrt(kap |R_loop - I|^2 + ta |t_loop|^2)

    (reference evaluate_consistency, PCM.cpp:226-230; the cross form is what
    lets the incremental pipeline score only new-vs-prior pairs)."""
    R_p, t_p, kap_p, tau_p, ti_p, Ri_p, tj_p, Rj_p = map(jnp.asarray, P)
    R_q, t_q, kap_q, tau_q, ti_q, Ri_q, tj_q, Rj_q = map(jnp.asarray, Q)
    d = t_p.shape[-1]

    # B[p,q] = R_jp^T R_jq ; D[q,p] = R_iq^T R_ip
    B = jnp.einsum("pba,qbc->pqac", Rj_p, Rj_q)
    tB = jnp.einsum("pba,qb->pqa", Rj_p, tj_q) - jnp.einsum(
        "pba,pb->pa", Rj_p, tj_p)[:, None, :]
    # chain: A = T_p ; AB ; ABC with C = T_q^{-1} ; ABCD with D = T(i1<-i0)
    AB_R = jnp.einsum("pab,pqbc->pqac", R_p, B)
    AB_t = t_p[:, None, :] + jnp.einsum("pab,pqb->pqa", R_p, tB)
    C_R = jnp.swapaxes(R_q, -1, -2)  # [q, d, d]
    C_t = -jnp.einsum("qba,qb->qa", R_q, t_q)
    ABC_R = jnp.einsum("pqab,qbc->pqac", AB_R, C_R)
    ABC_t = AB_t + jnp.einsum("pqab,qb->pqa", AB_R, C_t)
    D_R = jnp.einsum("qba,pbc->qpac", Ri_q, Ri_p)  # [q, p]: R_iq^T R_ip
    D_t = jnp.einsum("qba,pb->qpa", Ri_q, ti_p) - jnp.einsum(
        "qba,qb->qa", Ri_q, ti_q)[:, None, :]
    R_loop = jnp.einsum("pqab,qpbc->pqac", ABC_R, D_R)
    t_loop = ABC_t + jnp.einsum("pqab,qpb->pqa", ABC_R, D_t)

    kap = 0.5 * (kap_p[:, None] + kap_q[None, :])
    ta = 0.5 * (tau_p[:, None] + tau_q[None, :])
    return jnp.sqrt(
        kap * jnp.sum((R_loop - jnp.eye(d)) ** 2, axis=(-1, -2))
        + ta * jnp.sum(t_loop ** 2, axis=-1))


def pairwise_consistency(meas_R, meas_t, kappa, tau, ti, Ri, tj, Rj,
                         tolerance: float, weighted: bool) -> np.ndarray:
    """Boolean consistency matrix for one node pair.

    Inputs are alpha->beta oriented measurements (R [m,d,d], t [m,d]) and the
    current estimates of their endpoint poses (ti/Ri in alpha, tj/Rj in
    beta).
    """
    m = meas_t.shape[0]
    if not weighted:
        kappa = np.ones((m,))
        tau = np.ones((m,))
    A = (meas_R, meas_t, kappa, tau, ti, Ri, tj, Rj)
    err = loop_errors(A, A)
    adj = np.array(err <= tolerance)
    np.fill_diagonal(adj, False)
    return adj


def max_clique_exact(adj: np.ndarray) -> np.ndarray:
    """Exact max clique by bitset branch-and-bound with greedy-coloring
    bound (Pattabiraman-style; fmc/findClique.h)."""
    n = adj.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    nb = [0] * n
    for v in range(n):
        mask = 0
        for u in np.nonzero(adj[v])[0]:
            mask |= 1 << int(u)
        nb[v] = mask

    best = [0, 0]  # size, mask

    # Order by degree descending for better pruning.
    order = np.argsort(-adj.sum(axis=1))

    def popcount(x):
        return bin(x).count("1")

    def expand(cand_mask, cur_mask, cur_size):
        if cand_mask == 0:
            if cur_size > best[0]:
                best[0] = cur_size
                best[1] = cur_mask
            return
        if cur_size + popcount(cand_mask) <= best[0]:
            return
        # Pick candidates in order.
        m = cand_mask
        while m:
            v = (m & -m).bit_length() - 1
            m &= m - 1
            if cur_size + popcount(cand_mask) <= best[0]:
                return
            expand(cand_mask & nb[v], cur_mask | (1 << v), cur_size + 1)
            cand_mask &= ~(1 << v)

    full = (1 << n) - 1
    expand(full, 0, 0)
    out = np.zeros(n, dtype=bool)
    for v in range(n):
        if best[1] >> v & 1:
            out[v] = True
    return out


def max_clique_heuristic(adj: np.ndarray) -> np.ndarray:
    """Greedy heuristic: repeatedly add the highest-degree compatible vertex
    (fmc maxCliqueHeu)."""
    n = adj.shape[0]
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    deg = adj.sum(axis=1)
    cand = np.ones(n, dtype=bool)
    while cand.any():
        scores = np.where(cand, deg, -1)
        v = int(np.argmax(scores))
        out[v] = True
        cand &= adj[v]
        cand[v] = False
    return out


def pcm_filter(meas: Measurements, num_nodes: int, t: np.ndarray,
               R: np.ndarray, opts: PCMOptions = PCMOptions()
               ) -> tuple[Measurements, np.ndarray]:
    """Run PCM on every node pair's inter edges against the estimate (t, R).

    Returns (filtered measurements, keep mask over the original edges).
    Intra-node edges are always kept (the reference wires PCM on inter-node
    loop closures only).
    """
    part = make_partition(meas.num_poses, num_nodes)
    ni = part.node_of[meas.i]
    nj = part.node_of[meas.j]
    keep = np.ones(len(meas), dtype=bool)

    inter = np.nonzero(ni != nj)[0]
    pairs = {}
    for e in inter:
        a, b = sorted((int(ni[e]), int(nj[e])))
        pairs.setdefault((a, b), []).append(int(e))

    for (a, b), es in pairs.items():
        es = np.asarray(es)
        if len(es) < 2:
            continue
        # Orient alpha->beta.
        flip = ni[es] != a
        Rm = meas.R[es].copy()
        tm = meas.t[es].copy()
        Rm[flip] = np.swapaxes(Rm[flip], -1, -2)
        tm[flip] = -np.einsum("eab,eb->ea", Rm[flip], meas.t[es][flip])
        gi = np.where(flip, meas.j[es], meas.i[es])
        gj = np.where(flip, meas.i[es], meas.j[es])
        adj = pairwise_consistency(
            Rm, tm, jnp.asarray(meas.kappa[es]), jnp.asarray(meas.tau[es]),
            t[gi], R[gi], t[gj], R[gj], opts.tolerance, opts.weighted)
        exact = opts.exact and (len(es) <= opts.exact_limit or opts.native)
        mask = None
        if opts.native:
            from dpgo_tpu.io.native import max_clique_native
            mask = max_clique_native(adj, exact=exact)
        if mask is None:
            mask = max_clique_exact(adj) if exact \
                else max_clique_heuristic(adj)
        keep[es[~mask]] = False

    return meas.select(keep), keep


class PCMSolver:
    """Incremental PCM pipeline for one node pair.

    Reproduces the reference's streaming interface
    (PCM::PCMSolver<MCS, Evaluator>, PCM/PCM.hpp:99-191, and
    DPGO::PCM::update, DPGO/PCM.h:43-52): measurements arrive in batches;
    each `update` scores only the NEW measurements' loop errors against all
    prior ones (one batched cross einsum — the incremental analog of
    evaluate_consistency_with_prior_measurements) and extends the adjacency
    matrix in place; `solve_exact` / `solve_heuristic` re-run max clique on
    the accumulated adjacency (reference solveExact/solveHeuristic).
    """

    def __init__(self, opts: PCMOptions = PCMOptions()):
        self.opts = opts
        self._data = None        # accumulated oriented arrays (tuple)
        self.adj = np.zeros((0, 0), dtype=bool)
        self._results = None

    @property
    def num_measurements(self) -> int:
        return self.adj.shape[0]

    def update(self, meas_R, meas_t, kappa, tau, ti, Ri, tj, Rj) -> int:
        """Add a batch of alpha->beta oriented measurements with their
        current endpoint pose estimates; extends the consistency adjacency
        by the new rows/columns only. Returns the new measurement count."""
        new = tuple(np.asarray(x) for x in
                    (meas_R, meas_t, kappa, tau, ti, Ri, tj, Rj))
        m_new = new[1].shape[0]
        if m_new == 0:
            return self.num_measurements
        if not self.opts.weighted:
            new = (new[0], new[1], np.ones(m_new), np.ones(m_new)) + new[4:]
        if self._data is None:
            self._data = new
            err = np.asarray(loop_errors(new, new))
            adj = err <= self.opts.tolerance
            np.fill_diagonal(adj, False)
            self.adj = adj
        else:
            old = self._data
            cross = np.asarray(loop_errors(new, old)) <= self.opts.tolerance
            inner = np.asarray(loop_errors(new, new)) <= self.opts.tolerance
            np.fill_diagonal(inner, False)
            m_old = self.adj.shape[0]
            adj = np.zeros((m_old + m_new, m_old + m_new), dtype=bool)
            adj[:m_old, :m_old] = self.adj
            adj[m_old:, :m_old] = cross
            adj[:m_old, m_old:] = cross.T
            adj[m_old:, m_old:] = inner
            self.adj = adj
            self._data = tuple(np.concatenate([o, n], axis=0)
                               for o, n in zip(old, new))
        self._results = None
        return self.num_measurements

    def _solve(self, exact: bool) -> np.ndarray:
        if self.num_measurements == 0:
            return np.zeros(0, dtype=bool)
        mask = None
        if self.opts.native:
            from dpgo_tpu.io.native import max_clique_native
            mask = max_clique_native(self.adj, exact=exact)
        if mask is None:
            mask = max_clique_exact(self.adj) if exact \
                else max_clique_heuristic(self.adj)
        self._results = mask
        return mask

    def solve_exact(self) -> np.ndarray:
        """Inlier mask over all measurements seen so far (exact clique)."""
        return self._solve(True)

    def solve_heuristic(self) -> np.ndarray:
        return self._solve(False)

    @property
    def results(self) -> np.ndarray | None:
        return self._results


def pcm_filter_incremental(meas: Measurements, num_nodes: int, t: np.ndarray,
                           R: np.ndarray, opts: PCMOptions = PCMOptions(),
                           batch: int = 1
                           ) -> tuple[Measurements, np.ndarray]:
    """pcm_filter through the incremental PCMSolver pipeline: each node
    pair's inter edges stream in batches of `batch` (the reference's
    add_measurements/update flow); the final clique solve gives the same
    inlier set as the one-shot batch filter (tested)."""
    part = make_partition(meas.num_poses, num_nodes)
    ni = part.node_of[meas.i]
    nj = part.node_of[meas.j]
    keep = np.ones(len(meas), dtype=bool)

    inter = np.nonzero(ni != nj)[0]
    pairs = {}
    for e in inter:
        a, b = sorted((int(ni[e]), int(nj[e])))
        pairs.setdefault((a, b), []).append(int(e))

    for (a, b), es in pairs.items():
        es = np.asarray(es)
        if len(es) < 2:
            continue
        flip = ni[es] != a
        Rm = meas.R[es].copy()
        tm = meas.t[es].copy()
        Rm[flip] = np.swapaxes(Rm[flip], -1, -2)
        tm[flip] = -np.einsum("eab,eb->ea", Rm[flip], meas.t[es][flip])
        gi = np.where(flip, meas.j[es], meas.i[es])
        gj = np.where(flip, meas.i[es], meas.j[es])
        solver = PCMSolver(opts)
        m = len(es)
        for pos in range(0, m, max(batch, 1)):
            sl = slice(pos, min(pos + max(batch, 1), m))
            solver.update(Rm[sl], tm[sl], meas.kappa[es][sl],
                          meas.tau[es][sl], t[gi[sl]], R[gi[sl]],
                          t[gj[sl]], R[gj[sl]])
        exact = opts.exact and (m <= opts.exact_limit or opts.native)
        mask = solver.solve_exact() if exact else solver.solve_heuristic()
        keep[es[~mask]] = False

    return meas.select(keep), keep
