"""Global second-order polish (solvers/polish.py) and the Anderson scheme.

Oracles: the certified catalog (artifacts/certified_optima.json, GlobalOpt
via our own SE-Sync staircase) and autodiff consistency of the Hessian-vp.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpgo_tpu.driver import DPGOSolver
from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.solvers.mm import MMOptions
from dpgo_tpu.solvers.tnt import TNTParams

DATA = "/root/reference/dataset"
CAT = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "certified_optima.json")


def _cert(name):
    with open(CAT) as fh:
        return json.load(fh)[name]["fxhat_2x"]


@pytest.mark.skipif(not os.path.exists(f"{DATA}/CSAIL.g2o"),
                    reason="dataset missing")
def test_polish_reaches_certified_optimum_csail():
    meas = read_g2o_file(f"{DATA}/CSAIL.g2o")
    fc = _cert("CSAIL.g2o")
    s = DPGOSolver(meas, num_nodes=4,
                   opts=MMOptions(tnt=TNTParams(max_iterations=0)),
                   dtype=jnp.float64)
    st = s.initialize()
    st2, f2x = s.polish(st, outer=20, tcg=300)
    f, g = s._metrics(st2)
    assert float(f) / fc - 1.0 < 1e-8
    assert float(g) < 1e-4
    # the value returned by polish is the (2x) objective at the result
    assert abs(f2x - float(f)) / fc < 1e-9


@pytest.mark.skipif(not os.path.exists(f"{DATA}/MITb.g2o"),
                    reason="dataset missing")
def test_polish_beats_long_amm_tail_mitb():
    """50 AMM iterations + the global polish lands on the certified optimum;
    600 plain AMM iterations only reach ~4e-6 (the long-tail motivation)."""
    meas = read_g2o_file(f"{DATA}/MITb.g2o")
    fc = _cert("MITb.g2o")
    s = DPGOSolver(meas, num_nodes=4,
                   opts=MMOptions(tnt=TNTParams(max_iterations=0)),
                   dtype=jnp.float64)
    st, _ = s.run_steps(s.initialize(), jnp.zeros((), jnp.int32), 50)
    st2, _ = s.polish(st, outer=20, tcg=500)
    f, _ = s._metrics(st2)
    assert float(f) / fc - 1.0 < 1e-9


@pytest.mark.skipif(not os.path.exists(f"{DATA}/MITb.g2o"),
                    reason="dataset missing")
def test_coarse_rigid_preconditioner_tightens_cg():
    """Two-level (node-block + block-rigid coarse) preconditioning reaches a
    much smaller gradient than node-block alone at the same CG budget (the
    cross-node lever-arm modes are exactly the coarse space)."""
    meas = read_g2o_file(f"{DATA}/MITb.g2o")
    fc = _cert("MITb.g2o")
    s = DPGOSolver(meas, num_nodes=4,
                   opts=MMOptions(tnt=TNTParams(max_iterations=0)),
                   dtype=jnp.float64)
    st, _ = s.run_steps(s.initialize(), jnp.zeros((), jnp.int32), 50)
    st_a, _ = s.polish(st, outer=10, tcg=60, coarse=False)
    st_b, _ = s.polish(st, outer=10, tcg=60, coarse=True)
    fa, ga = map(float, s._metrics(st_a))
    fb, gb = map(float, s._metrics(st_b))
    assert fb / fc - 1.0 < 1e-9
    assert gb < 0.1 * ga  # measured ~200x; assert a conservative 10x


@pytest.mark.skipif(not os.path.exists(f"{DATA}/MITb.g2o"),
                    reason="dataset missing")
def test_multilevel_rigid_preconditioner():
    """Multilevel hierarchy (node + finer contiguous segments) stays SPD and
    converges at least as tightly as the two-level at equal budget."""
    meas = read_g2o_file(f"{DATA}/MITb.g2o")
    fc = _cert("MITb.g2o")
    s = DPGOSolver(meas, num_nodes=4,
                   opts=MMOptions(tnt=TNTParams(max_iterations=0)),
                   dtype=jnp.float64)
    st, _ = s.run_steps(s.initialize(), jnp.zeros((), jnp.int32), 50)
    st_m, _ = s.polish(st, outer=10, tcg=60, coarse=True,
                       coarse_segments=(16, 64))
    fm, gm = map(float, s._metrics(st_m))
    assert fm / fc - 1.0 < 1e-9
    assert gm < 1e-5


def test_global_hessian_vp_matches_autodiff():
    """hess_vp == tangent-projected autodiff Hessian of f circ retraction
    (the standard embedded-manifold identity at a stationary-agnostic point:
    Hess = Proj d(grad)[v] - curvature term; verify against jax.jvp of the
    projected gradient field plus the Weingarten correction consistency via
    symmetry <u, Hv> == <v, Hu>)."""
    from dpgo_tpu.objective import EdgeData
    from dpgo_tpu.solvers.polish import global_tnt_model
    from dpgo_tpu.manifold import proj_tangent, project_sod
    rng = np.random.default_rng(0)
    P, m, d = 6, 10, 3
    i = rng.integers(0, P - 1, m).astype(np.int32)
    j = (i + rng.integers(1, P - i, m)).astype(np.int32)
    edges = EdgeData(
        i=jnp.asarray(i), j=jnp.asarray(j),
        R=jnp.asarray(np.linalg.qr(rng.normal(size=(m, d, d)))[0]),
        t=jnp.asarray(rng.normal(size=(m, d))),
        kappa=jnp.asarray(rng.uniform(1, 5, m)),
        tau=jnp.asarray(rng.uniform(1, 5, m)),
        is_inter=jnp.zeros((m,), bool))
    model = global_tnt_model(edges, num_poses=P)
    t = jnp.asarray(rng.normal(size=(P, d)))
    R = project_sod(jnp.asarray(rng.normal(size=(P, d, d))))
    x = (t, R)
    _, nabla = model.grad_and_nabla(x)
    u = (jnp.asarray(rng.normal(size=(P, d))),
         proj_tangent(R, jnp.asarray(rng.normal(size=(P, d, d)))))
    v = (jnp.asarray(rng.normal(size=(P, d))),
         proj_tangent(R, jnp.asarray(rng.normal(size=(P, d, d)))))
    Hu = model.hess_vp(x, nabla, u)
    Hv = model.hess_vp(x, nabla, v)

    def ip(a, b):
        return sum(jnp.sum(p * q) for p, q in zip(a, b))

    # self-adjointness on the tangent space
    assert abs(float(ip(u, Hv)) - float(ip(v, Hu))) < 1e-9
    # tangency of the output
    assert float(jnp.max(jnp.abs(Hv[1] - proj_tangent(R, Hv[1])))) < 1e-10
    # directional derivative of the objective matches <grad, v>
    eps = 1e-7
    f0 = float(model.objective(x))
    x_eps = (t + eps * v[0], project_sod(R + eps * v[1]))
    f1 = float(model.objective(x_eps))
    grad, _ = model.grad_and_nabla(x)
    assert abs((f1 - f0) / eps - float(ip(grad, v))) < 1e-4 * max(1.0, abs(f0))


@pytest.mark.skipif(not os.path.exists(f"{DATA}/CSAIL.g2o"),
                    reason="dataset missing")
def test_eval_G_pair_matches_two_singles():
    """evaluate_G_rel_pair (fast-path fusion sharing the rotation work)
    equals two independent evaluate_G_rel calls."""
    from dpgo_tpu.solvers.mm import (_anchor_residuals_batch, _eval_G_batch,
                                     _eval_G_pair_batch)
    meas = read_g2o_file(f"{DATA}/CSAIL.g2o")
    s = DPGOSolver(meas, num_nodes=4, opts=MMOptions(), dtype=jnp.float64)
    st, _ = s.run_steps(s.initialize(), jnp.zeros((), jnp.int32), 3)
    rng = np.random.default_rng(1)
    t1 = st.Z.t + 0.01 * jnp.asarray(rng.normal(size=st.Z.t.shape))
    t2 = st.Z.t + 0.01 * jnp.asarray(rng.normal(size=st.Z.t.shape))
    R = st.Z.R
    zres = _anchor_residuals_batch(s.probs, st)
    Ga, Gb = _eval_G_pair_batch(s.probs, st, t1, t2, R, zres)
    Ga1 = _eval_G_batch(s.probs, st, t1, R, zres)
    Gb1 = _eval_G_batch(s.probs, st, t2, R, zres)
    np.testing.assert_allclose(np.asarray(Ga), np.asarray(Ga1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(Gb), np.asarray(Gb1), rtol=1e-12)


@pytest.mark.skipif(not os.path.exists(f"{DATA}/CSAIL.g2o"),
                    reason="dataset missing")
def test_anderson_scheme_monotone_and_converges():
    """scheme='aa': monotone global objective (the surrogate safeguard) and
    convergence to a modest gap. (Documented negative result: AA is SLOWER
    than Nesterov-AMM on these graphs — windowed AA is restarted-GMRES-like,
    Nesterov is Chebyshev-like, optimal for the dense near-1 diffusion
    spectrum. Kept as an experimental scheme.)"""
    meas = read_g2o_file(f"{DATA}/CSAIL.g2o")
    fc = _cert("CSAIL.g2o")
    s = DPGOSolver(meas, num_nodes=4,
                   opts=MMOptions(scheme="aa", aa_resolve_t=True,
                                  tnt=TNTParams(max_iterations=0)),
                   dtype=jnp.float64)
    st, _, (fh, _) = s.run_steps_history(s.initialize(),
                                         jnp.zeros((), jnp.int32), 200)
    fh = np.asarray(fh)
    assert np.all(np.diff(fh) <= 1e-9 * np.abs(fh[:-1]))  # monotone
    assert fh[-1] / fc - 1.0 < 1e-3


def test_noise_floor_gate_scoping():
    """The f32 noise-floor gate must be a TNTParams switch: with a
    preconditioner that is blind to the objective's remaining error (the
    global polish's node-block preconditioner at a bulk-converged state),
    gate=True exits before the first iteration while gate=False proceeds
    and minimizes. Regression test for the round-3 polish no-op (city10000
    polish silently returned its input; TNTHistory count=0)."""
    import dataclasses

    from dpgo_tpu.solvers.tnt import TNTModel, TNTParams, tnt_generic

    # Quadratic f(x) = 1/2 x^T A x with a stiff/soft split; the "blind"
    # preconditioner underweights the soft coordinate so severely that
    # 1/2 g^T P g sits below the f32 noise floor at a point whose error is
    # purely soft-direction — yet CG can still (slowly) move it.
    A = jnp.asarray(np.diag([1.0, 1e-6]), jnp.float32)

    def blind_precon(x, v):
        return v * jnp.asarray([1.0, 1e-8], jnp.float32)

    model = TNTModel(
        objective=lambda x: 0.5 * x @ (A @ x),
        grad_and_nabla=lambda x: (A @ x, A @ x),
        hess_vp=lambda x, nabla, v: A @ v,
        precondition=blind_precon,
        retract=lambda x, v: x + v,
    )
    x0 = jnp.asarray([0.0, 300.0], jnp.float32)  # soft-direction error only
    base = TNTParams(max_iterations=8, max_iterations_accepted=8,
                     gradient_tolerance=0.0,
                     preconditioned_gradient_tolerance=0.0,
                     relative_decrease_tolerance=0.0,
                     stepsize_tolerance=0.0, Delta_tolerance=0.0,
                     Delta0=1e4)
    x_on, f_on, _, _, h_on = tnt_generic(
        model, x0, dataclasses.replace(base, noise_floor_gate=True),
        record=True)
    x_off, f_off, _, _, h_off = tnt_generic(
        model, x0, dataclasses.replace(base, noise_floor_gate=False),
        record=True)
    assert int(h_on.count) == 0          # gate trips: no iterations run
    assert int(h_off.count) > 0          # gate off: TNT actually works
    assert float(f_off) < 0.5 * float(model.objective(x0))

    # Round-5 de-footgun: with the default noise_floor_gate=None the gate
    # is DERIVED from the model's declared preconditioner span, so a
    # partial-span model disables it structurally even when the caller
    # forgets to pass noise_floor_gate=False (the round-4 footgun).
    model_partial = model._replace(precon_spans_full_space=False)
    _, f_auto, _, _, h_auto = tnt_generic(model_partial, x0, base,
                                          record=True)
    assert int(h_auto.count) > 0
    assert float(f_auto) < 0.5 * float(model.objective(x0))
    # And a full-span model (the default declaration) keeps the gate on.
    _, _, _, _, h_full = tnt_generic(model, x0, base, record=True)
    assert int(h_full.count) == 0
