"""PCM outlier rejection tests."""

import numpy as np
import pytest

from dpgo_tpu.graph import make_partition
from dpgo_tpu.pcm import (PCMOptions, max_clique_exact, max_clique_heuristic,
                          pcm_filter)

from tests.synthetic import random_pose_graph


def test_max_clique_exact_known():
    # 5-cycle: max clique = 2; add a triangle 0-1-2 -> 3.
    n = 5
    adj = np.zeros((n, n), dtype=bool)
    for k in range(n):
        adj[k, (k + 1) % n] = adj[(k + 1) % n, k] = True
    adj[0, 2] = adj[2, 0] = True
    mask = max_clique_exact(adj)
    assert mask.sum() == 3
    sel = np.nonzero(mask)[0]
    for a in sel:
        for b in sel:
            assert a == b or adj[a, b]


def test_max_clique_random_vs_bruteforce(rng):
    import itertools
    for trial in range(5):
        n = 12
        adj = rng.random((n, n)) < 0.4
        adj = adj & adj.T
        np.fill_diagonal(adj, False)
        mask = max_clique_exact(adj)
        # brute force
        best = 0
        for r in range(n, 0, -1):
            if best:
                break
            for sub in itertools.combinations(range(n), r):
                ok = all(adj[a, b] for a, b in itertools.combinations(sub, 2))
                if ok:
                    best = r
                    break
        assert mask.sum() == best
        # heuristic returns a valid clique no larger than the optimum
        h = max_clique_heuristic(adj)
        sel = np.nonzero(h)[0]
        for a, b in itertools.combinations(sel, 2):
            assert adj[a, b]
        assert h.sum() <= best


def test_pcm_rejects_outlier_edges(rng):
    meas, t_true, R_true = random_pose_graph(rng, num_poses=40, d=3,
                                             loop_closures=40, noise=0.01)
    part = make_partition(meas.num_poses, 2)
    inter = np.nonzero(part.node_of[meas.i] != part.node_of[meas.j])[0]
    assert len(inter) >= 6
    # Corrupt two inter edges badly.
    bad = inter[:2]
    meas.t[bad] += 10.0
    filtered, keep = pcm_filter(meas, 2, t_true, R_true,
                                PCMOptions(tolerance=1.0))
    assert not keep[bad].any()          # outliers rejected
    good_inter = np.setdiff1d(inter, bad)
    assert keep[good_inter].mean() > 0.8  # most inliers kept
    # intra edges untouched
    intra = np.nonzero(part.node_of[meas.i] == part.node_of[meas.j])[0]
    assert keep[intra].all()


def test_native_max_clique_parity(rng):
    """Native C++ branch-and-bound (the fmc role) matches the Python exact
    solver's clique size and returns a genuine clique."""
    from dpgo_tpu.io.native import max_clique_native, native_available
    from dpgo_tpu.pcm import max_clique_exact
    if not native_available():
        import pytest
        pytest.skip("native toolchain unavailable")
    for _ in range(60):
        n = int(rng.integers(2, 24))
        A = rng.random((n, n)) < rng.uniform(0.2, 0.8)
        A = np.triu(A, 1)
        A = A | A.T
        m_py = max_clique_exact(A)
        m_na = max_clique_native(A, exact=True)
        assert m_na.sum() == m_py.sum()
        idx = np.nonzero(m_na)[0]
        assert all(A[a, b] for a in idx for b in idx if a != b)


def test_incremental_pcm_matches_batch(rng):
    """Streaming measurements through PCMSolver.update one at a time (and in
    random batch sizes) reproduces the one-shot batch adjacency and clique
    (reference PCM::PCMSolver incremental pipeline, PCM.hpp:99-191)."""
    from dpgo_tpu.pcm import PCMSolver, pairwise_consistency

    meas, t_true, R_true = random_pose_graph(rng, num_poses=40, d=3,
                                             loop_closures=40, noise=0.01)
    part = make_partition(meas.num_poses, 2)
    ni, nj = part.node_of[meas.i], part.node_of[meas.j]
    inter = np.nonzero(ni != nj)[0]
    # corrupt a couple
    meas.t[inter[:2]] += 10.0

    # Orient alpha->beta for the single node pair (0, 1).
    es = inter
    flip = ni[es] != 0
    Rm = meas.R[es].copy()
    tm = meas.t[es].copy()
    Rm[flip] = np.swapaxes(Rm[flip], -1, -2)
    tm[flip] = -np.einsum("eab,eb->ea", Rm[flip], meas.t[es][flip])
    gi = np.where(flip, meas.j[es], meas.i[es])
    gj = np.where(flip, meas.i[es], meas.j[es])
    args = (Rm, tm, meas.kappa[es], meas.tau[es],
            t_true[gi], R_true[gi], t_true[gj], R_true[gj])

    opts = PCMOptions(tolerance=1.0)
    adj_batch = pairwise_consistency(*args, opts.tolerance, opts.weighted)
    mask_batch = None
    from dpgo_tpu.pcm import max_clique_exact
    mask_batch = max_clique_exact(adj_batch)

    for batching in ("one", "random"):
        solver = PCMSolver(opts)
        m = len(es)
        pos = 0
        while pos < m:
            step = 1 if batching == "one" else int(rng.integers(1, 5))
            sl = slice(pos, min(pos + step, m))
            solver.update(*(a[sl] for a in args))
            pos = sl.stop
        assert solver.num_measurements == m
        np.testing.assert_array_equal(solver.adj, adj_batch)
        mask_inc = solver.solve_exact()
        assert mask_inc.sum() == mask_batch.sum()
        idx = np.nonzero(mask_inc)[0]
        assert all(adj_batch[a, b] for a in idx for b in idx if a != b)
        assert solver.results is not None


def test_pcm_filter_incremental_equals_batch(rng):
    from dpgo_tpu.pcm import pcm_filter_incremental

    meas, t_true, R_true = random_pose_graph(rng, num_poses=40, d=3,
                                             loop_closures=40, noise=0.01)
    part = make_partition(meas.num_poses, 2)
    inter = np.nonzero(part.node_of[meas.i] != part.node_of[meas.j])[0]
    meas.t[inter[:2]] += 10.0
    opts = PCMOptions(tolerance=1.0)
    _, keep_batch = pcm_filter(meas, 2, t_true, R_true, opts)
    for batch in (1, 3):
        _, keep_inc = pcm_filter_incremental(meas, 2, t_true, R_true, opts,
                                             batch=batch)
        # clique SIZE must match; tie-breaking may differ, so compare counts
        # per node pair and validity of the kept set.
        assert keep_inc.sum() == keep_batch.sum()
        assert not keep_inc[inter[:2]].any()
