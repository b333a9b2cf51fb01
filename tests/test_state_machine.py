"""Replay-verification of the AMM-PGO# Nesterov/restart bookkeeping.

Runs the real solver, records the per-node scalar sequences each iteration,
and re-simulates the reference recurrences (DPGOHash.cpp:164-223) scalar-by-
scalar from the recorded fobj values:

  s_{k+1}  = (1 + sqrt(4 s_k^2 + 1)) / 2        (halved at hard restarts)
  gamma_k  = (s_k - 1) / s_{k+1}
  Fk0_k    = (1 - eta0) Fk0_{k-1} + eta0 fobj_k
  Fk1_k    = max(fobj_k, (1 - eta1) Fk1_{k-1} + eta1 fobj_k)
  hits0    = fobj <= Fk1_{k-1}-updated-order bookkeeping per the reference
"""

import jax.numpy as jnp
import numpy as np

from dpgo_tpu.driver import DPGOSolver
from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.solvers.mm import MMOptions

from tests.conftest import dataset_path


def test_nesterov_restart_recurrences():
    meas = read_g2o_file(dataset_path("CSAIL.g2o"))
    opts = MMOptions(accelerated=True)
    solver = DPGOSolver(meas, num_nodes=4, opts=opts)
    st = solver.initialize()

    recs = []

    def snap(s):
        recs.append({k: np.array(v) for k, v in solver.node_stats(s).items()})

    snap(st)
    for k in range(40):
        st = solver._step(st, jnp.asarray(k, jnp.int32))
        snap(st)

    N = 4
    for a in range(N):
        Fk0 = recs[0]["Fk0"][a]
        Fk1 = recs[0]["Fk1"][a]
        hits0 = 0
        s = recs[0]["s"][a]
        for k in range(1, len(recs)):
            fobj = recs[k]["fobj"][a]
            # Nesterov sequence: s_k comes from the previous step's s_next,
            # possibly halved by a hard restart during iterate.
            s_plain = 0.5 + 0.5 * np.sqrt(4.0 * s * s + 1.0)
            s_halved = max(0.5 * s_plain, 1.0)
            s_rec = recs[k]["s"][a]
            assert (abs(s_rec - s_plain) < 1e-10
                    or abs(s_rec - s_halved) < 1e-10), (a, k)
            s_next_expected = 0.5 + 0.5 * np.sqrt(4.0 * s_rec * s_rec + 1.0)
            gamma_expected = (s_rec - 1.0) / s_next_expected
            np.testing.assert_allclose(recs[k]["gamma"][a], gamma_expected,
                                       rtol=1e-10)
            s = s_rec

            # hits0: -2 (floored) on sufficient decrease vs previous Fk1,
            # +1 otherwise; restarts divide by 3 inside iterate, so accept
            # either the plain or the divided value.
            if fobj <= Fk1:
                plain = max(hits0 - 2, 0)
            else:
                plain = hits0 + 1
            rec_h = recs[k]["soft_restart_hits"][0][a]
            assert rec_h in (plain, plain // 3), (a, k, rec_h, plain)
            hits0 = rec_h

            # Exponential reference sequences.
            Fk0 = (1 - opts.eta0) * Fk0 + opts.eta0 * fobj
            Fk1 = max(fobj, (1 - opts.eta1) * Fk1 + opts.eta1 * fobj)
            np.testing.assert_allclose(recs[k]["Fk0"][a], Fk0, rtol=1e-9)
            np.testing.assert_allclose(recs[k]["Fk1"][a], Fk1, rtol=1e-9)


def test_fast_slow_path_equivalence(monkeypatch):
    """Forcing the exceptional (retry/restart/phi) branch to always execute
    must reproduce the fast-path trajectory exactly: the fast branch is the
    slow branch specialized to all-false flags."""
    import jax
    import jax.numpy as real_jnp
    from dpgo_tpu.solvers import mm as mm_mod

    meas = read_g2o_file(dataset_path("CSAIL.g2o"))
    opts = MMOptions(accelerated=True)

    solver = DPGOSolver(meas, num_nodes=4, opts=opts)
    st = solver.initialize()
    states = [st]
    for k in range(25):
        st = solver._step(st, jnp.asarray(k, jnp.int32))
        states.append(st)

    # Patch jnp.any so every scalar cond guard in mm.py sees True (the
    # masked selects inside the branches make this a semantic no-op iff the
    # fast path is correct).
    forced = lambda *a, **kw: real_jnp.asarray(True) if not kw else \
        real_jnp.any(*a, **kw)
    monkeypatch.setattr(mm_mod.jnp, "any", forced)
    try:
        solver2 = DPGOSolver(meas, num_nodes=4, opts=opts)
        st2 = solver2.initialize()
        for k in range(25):
            st2 = solver2._step(st2, jnp.asarray(k, jnp.int32))
    finally:
        monkeypatch.undo()

    for x, y in zip(jax.tree.leaves(states[-1]), jax.tree.leaves(st2)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-12, atol=1e-12)


def test_oscillation_cnt_period_honored():
    """A non-default oscillation_cnt_period sizes the window buffer from the
    option (reference Options::oscillation_cnt_period, DPGO_types.h) and the
    solver runs identically-shaped state through the scan."""
    meas = read_g2o_file(dataset_path("CSAIL.g2o"))
    for period in (5, 15, 25):
        opts = MMOptions(accelerated=True, oscillation_cnt_period=period)
        solver = DPGOSolver(meas, num_nodes=2, opts=opts)
        st = solver.initialize()
        assert st.osc_buf.shape[-1] == period + 2
        st, _, _ = solver.run_steps_history(st, 0, 8)
        f, _ = solver._metrics(st)
        assert np.isfinite(float(f))
    # Window semantics: num_osc counts sign changes within the last `period`
    # entries, so a tiny window saturates lower than a big one on the same
    # oscillating sequence.
    import jax
    from dpgo_tpu.solvers.mm import init_state, update_state

    opts5 = MMOptions(accelerated=True, oscillation_cnt_period=4)
    s5 = DPGOSolver(meas, num_nodes=2, opts=opts5)
    stx = s5.initialize()
    assert stx.osc_buf.shape[-1] == 6
