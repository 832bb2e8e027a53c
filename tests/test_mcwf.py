"""Monte-Carlo wavefunction (quantum-jump) solver tests.

Physics pins:
  - no jump channels -> trajectories identical to sesolve;
  - 1-qubit pure relaxation with H = 0 -> analytic exp(-gamma t) decay
    and one-jump-per-trajectory statistics;
  - trajectory-averaged projectors reproduce mesolve's density matrix
    (the defining property of the unraveling), deterministic under a
    fixed PRNG key;
  - backend routing: run(solver=MCWF) -> NoisyResults, composes with
    stochastic doppler noise, program cached, eta rejected.

Extends the reference's Lindblad surface (ref backend.py:495-509) —
the reference has no trajectory unraveling at all.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulser_diff_tpu import SimConfig, SolverType, TpuEmulator
from pulser_diff_tpu.cplx import Cplx
from pulser_diff_tpu.core import Pulse, Register, Sequence, MockDevice
from pulser_diff_tpu.simresults import NoisyResults
from pulser_diff_tpu.solvers import TimeGrid, mcsolve

from .conftest import make_simple_sequence


def _mc_inputs(sim):
    h = sim._hamiltonian
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    psi0 = sim._initial_state
    da, db = h.dim**h._a, h.dim**h._b
    p0 = Cplx(psi0.re[:, 0].reshape(da, db), psi0.im[:, 0].reshape(da, db))
    return h, grid, p0


def _psi_np(states: Cplx) -> np.ndarray:
    """(n_eval, R, da, db) -> complex (n_eval, R, dim)."""
    re = np.asarray(jax.device_get(states.re))
    im = np.asarray(jax.device_get(states.im))
    z = re + 1j * im
    return z.reshape(z.shape[0], z.shape[1], -1)


def test_mcwf_no_collapse_matches_sesolve(two_atom_register):
    seq = make_simple_sequence(two_atom_register, duration=160)
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    h, grid, p0 = _mc_inputs(sim)
    mc = mcsolve(
        h._ham_data, p0, h._collapse_ops, h._size, h.dim, grid,
        jax.random.PRNGKey(0), n_traj=3,
    )
    assert int(np.asarray(mc.n_jumps).max()) == 0
    psi = _psi_np(mc.states)  # (n_eval, 3, dim)
    ref = sim.run(fused=False).states  # (n_eval, dim, 1)
    ref_np = (
        np.asarray(jax.device_get(ref.re))
        + 1j * np.asarray(jax.device_get(ref.im))
    )[:, :, 0]
    for r in range(3):
        assert np.abs(psi[:, r] - ref_np).max() < 1e-9


def test_mcwf_relaxation_analytic():
    """H = 0, pure relaxation from |r>: P_r(t) = exp(-gamma t), each
    trajectory jumps exactly once (g is dark)."""
    reg = Register({"q0": jnp.array([0.0, 0.0])})
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(Pulse.ConstantPulse(400, 0.0, 0.0, 0.0), "ryd")
    gamma = 4.0
    cfg = SimConfig(noise="relaxation", relaxation_rate=gamma)
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Full")
    # basis ground-rydberg = [r, g]: |r> = e_0
    sim.set_initial_state(jnp.array([1.0, 0.0]))
    h, grid, p0 = _mc_inputs(sim)
    R = 2000
    mc = mcsolve(
        h._ham_data, p0, h._collapse_ops, h._size, h.dim, grid,
        jax.random.PRNGKey(7), n_traj=R,
    )
    psi = _psi_np(mc.states)  # (n_eval, R, 2)
    pop_r = (np.abs(psi[:, :, 0]) ** 2).mean(axis=1)
    t = np.asarray(jax.device_get(sim.evaluation_times))
    ref = np.exp(-gamma * t)
    assert np.abs(pop_r - ref).max() < 4.0 / np.sqrt(R)
    # jump statistics: each trajectory jumps 0 or 1 times; the mean
    # equals the total decay probability
    nj = np.asarray(mc.n_jumps)
    assert nj.max() <= 1
    p_decay = 1.0 - np.exp(-gamma * t[-1])
    assert abs(nj.mean() - p_decay) < 4.0 / np.sqrt(R)


def test_mcwf_average_matches_mesolve(two_atom_register):
    """E[|psi><psi|] over trajectories = mesolve rho(t) — driven 2-atom
    sequence with dephasing, fixed key (deterministic)."""
    seq = make_simple_sequence(two_atom_register, duration=200)
    cfg = SimConfig(noise="dephasing", dephasing_rate=0.25)
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times=0.1)
    rho_ref = sim.run()  # routed to DP5_ME (pinned vs golden elsewhere)
    ref = np.asarray(jax.device_get(rho_ref.states.re)) + 1j * np.asarray(
        jax.device_get(rho_ref.states.im)
    )
    h, grid, p0 = _mc_inputs(sim)
    R = 600
    mc = mcsolve(
        h._ham_data, p0, h._collapse_ops, h._size, h.dim, grid,
        jax.random.PRNGKey(42), n_traj=R,
    )
    psi = _psi_np(mc.states)  # (n_eval, R, 4)
    rho_avg = np.einsum("trk,trl->tkl", psi, psi.conj()) / R
    assert np.abs(rho_avg - ref).max() < 4.0 / np.sqrt(R)
    # trajectories stay normalized
    norms = (np.abs(psi) ** 2).sum(-1)
    assert np.abs(norms - 1.0).max() < 1e-8


def test_mcwf_f32_average(two_atom_register):
    seq = make_simple_sequence(two_atom_register, duration=160)
    cfg = SimConfig(noise="dephasing", dephasing_rate=0.3)
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    ref_states = sim.run().states
    ref = np.asarray(jax.device_get(ref_states.re)) + 1j * np.asarray(
        jax.device_get(ref_states.im)
    )
    h, grid, p0 = _mc_inputs(sim)
    R = 400
    mc = mcsolve(
        h._ham_data, p0, h._collapse_ops, h._size, h.dim, grid,
        jax.random.PRNGKey(3), n_traj=R, solver=SolverType.DP5_SE_F32,
    )
    assert mc.states.re.dtype == jnp.float32
    psi = _psi_np(mc.states)
    rho_avg = np.einsum("trk,trl->tkl", psi, psi.conj()) / R
    assert np.abs(rho_avg - ref).max() < 5.0 / np.sqrt(R)


def test_mcwf_reproducible(two_atom_register):
    seq = make_simple_sequence(two_atom_register, duration=120)
    cfg = SimConfig(noise="dephasing", dephasing_rate=0.2)
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    h, grid, p0 = _mc_inputs(sim)
    a = mcsolve(h._ham_data, p0, h._collapse_ops, h._size, h.dim, grid,
                jax.random.PRNGKey(11), n_traj=16)
    b = mcsolve(h._ham_data, p0, h._collapse_ops, h._size, h.dim, grid,
                jax.random.PRNGKey(11), n_traj=16)
    assert np.array_equal(np.asarray(a.states.re), np.asarray(b.states.re))
    assert np.array_equal(np.asarray(a.n_jumps), np.asarray(b.n_jumps))


def test_mcwf_run_routing(two_atom_register):
    """run(solver=MCWF): NoisyResults whose populations track mesolve."""
    seq = make_simple_sequence(two_atom_register, duration=200)
    cfg = SimConfig(
        noise="dephasing", dephasing_rate=0.25, runs=100, samples_per_run=40
    )
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times=0.25)
    # regression: runs/samples_per_run must survive the SimConfig ->
    # NoiseModel conversion even for pure Lindblad noise (pulser treats
    # them as irrelevant there, but MCWF consumes them as the trajectory
    # count) — a silent drop to the 15 x 5 defaults once cost a 0.09
    # population bias at the bench's R=1024.
    assert sim.config.runs == 100
    assert sim.config.samples_per_run == 40
    res = sim.run(solver=SolverType.MCWF)
    assert isinstance(res, NoisyResults)
    assert sum(res[-1].bitstring_counts.values()) == 100 * 40
    n_cached = len(sim._njit_cache)
    res2 = sim.run(solver=SolverType.MCWF)
    assert len(sim._njit_cache) == n_cached  # program reused
    rho_mc = np.asarray(jax.device_get(res.states.re))
    rho_ref = sim.run()  # DP5_ME
    ref_diag = np.asarray(
        jax.device_get(
            jnp.diagonal(rho_ref.states.re, axis1=-2, axis2=-1)
        )
    )
    mc_diag = np.diagonal(rho_mc, axis1=-2, axis2=-1)
    # 100 runs x 40 samples: statistical tolerance
    assert np.abs(mc_diag - ref_diag).max() < 0.08
    assert abs(sum(res2.results[-1].values()) - 1.0) < 1e-9


def test_mcwf_with_doppler(two_atom_register):
    """MCWF composes with stochastic Hamiltonian noise (per-trajectory
    doppler draws, vmapped solves)."""
    seq = make_simple_sequence(two_atom_register, duration=120)
    cfg = SimConfig(
        noise=("dephasing", "doppler"),
        dephasing_rate=0.1,
        temperature=60.0,
        runs=8,
        samples_per_run=10,
    )
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    res = sim.run(solver=SolverType.MCWF)
    assert isinstance(res, NoisyResults)
    rho = np.asarray(jax.device_get(res.states.re))
    tr = np.trace(rho, axis1=1, axis2=2)
    assert np.abs(tr - 1).max() < 1e-8


def test_mcwf_leakage_three_level(two_atom_register):
    """MCWF with a leakage channel (with_leakage=True -> qudit d=3):
    trajectory average matches mesolve on the extended space, and the
    leaked population is visibly nonzero."""
    L = np.zeros((3, 3))
    L[2, 1] = 1.0  # |x><g|
    seq = make_simple_sequence(two_atom_register, duration=160)
    cfg = SimConfig(
        noise="eff_noise", eff_noise_rates=(0.6,), eff_noise_opers=(L,),
        with_leakage=True,
    )
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    ref_states = sim.run().states
    ref = np.asarray(jax.device_get(ref_states.re)) + 1j * np.asarray(
        jax.device_get(ref_states.im)
    )
    h, grid, p0 = _mc_inputs(sim)
    assert h.dim == 3
    R = 600
    mc = mcsolve(
        h._ham_data, p0, h._collapse_ops, h._size, h.dim, grid,
        jax.random.PRNGKey(5), n_traj=R,
    )
    psi = _psi_np(mc.states)  # (n_eval, R, 9)
    rho_avg = np.einsum("trk,trl->tkl", psi, psi.conj()) / R
    assert np.abs(rho_avg - ref).max() < 4.0 / np.sqrt(R)
    # leakage actually happened: some trajectories jumped
    assert int(np.asarray(mc.n_jumps).sum()) > 0
    leaked = float(np.trace(ref[-1]).real - 1.0)
    x_pop = sum(
        float(rho_avg[-1, k, k].real)
        for k in range(9)
        if 2 in (k // 3, k % 3)
    )
    assert x_pop > 0.01
    assert abs(leaked) < 1e-6  # mesolve stays trace-preserving


def test_mcwf_fast_rate_warns(two_atom_register):
    """Collapse rates fast relative to the integration step trigger a
    warning (one-jump-per-step resolution would bias the average)."""
    seq = make_simple_sequence(two_atom_register, duration=400)
    cfg = SimConfig(noise="dephasing", dephasing_rate=80.0, runs=2,
                    samples_per_run=2)
    sim = TpuEmulator.from_sequence(
        seq, sampling_rate=0.05, config=cfg, evaluation_times="Minimal"
    )
    with pytest.warns(UserWarning, match="per-step jump probability"):
        sim.run(solver=SolverType.MCWF)
    # a sufficient substeps count silences it
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error", UserWarning)
        sim.run(solver=SolverType.MCWF, substeps=40)


def test_mcwf_xy_mode(two_atom_register):
    """MCWF in the XY (microwave) interaction mode: trajectory average
    matches mesolve on the same dephasing channel."""
    reg = two_atom_register
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("mw", "microwave_global")
    seq.add(Pulse.ConstantPulse(160, 1.8, 0.4, 0.2), "mw")
    cfg = SimConfig(noise="dephasing", dephasing_rate=0.3)
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    ref_states = sim.run().states
    ref = np.asarray(jax.device_get(ref_states.re)) + 1j * np.asarray(
        jax.device_get(ref_states.im)
    )
    h, grid, p0 = _mc_inputs(sim)
    assert h.basis_name == "XY"
    R = 500
    mc = mcsolve(
        h._ham_data, p0, h._collapse_ops, h._size, h.dim, grid,
        jax.random.PRNGKey(9), n_traj=R,
    )
    psi = _psi_np(mc.states)
    rho_avg = np.einsum("trk,trl->tkl", psi, psi.conj()) / R
    assert np.abs(rho_avg - ref).max() < 4.0 / np.sqrt(R)
    assert int(np.asarray(mc.n_jumps).sum()) > 0


def test_mcwf_with_spam_eta(two_atom_register):
    """MCWF composes with SPAM state-prep error: each trajectory draws
    its own bad-atom configuration (the trajectory unraveling of the
    reference's per-run eta Counter); populations track the stochastic
    DP5 path's within sampling tolerance.  Non-ground initial states
    stay rejected."""
    seq = make_simple_sequence(two_atom_register, duration=150)
    cfg = SimConfig(
        noise=("dephasing", "SPAM"), dephasing_rate=0.05, eta=0.4,
        epsilon=0.0, epsilon_prime=0.0, runs=300, samples_per_run=5,
    )
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    res_mc = sim.run(solver=SolverType.MCWF)
    assert isinstance(res_mc, NoisyResults)
    mc_diag = np.diagonal(
        np.asarray(jax.device_get(res_mc.states.re)), axis1=-2, axis2=-1
    )
    # reference behavior: the stochastic (eta Counter) path on the same
    # config — MCWF's only extra effect at this tiny dephasing rate is
    # trajectory/jump noise
    res_st = sim.run(solver=SolverType.DP5_SE)
    st_diag = np.diagonal(
        np.asarray(jax.device_get(res_st.states.re)), axis1=-2, axis2=-1
    )
    tol = 5.0 / np.sqrt(300)
    assert np.abs(mc_diag - st_diag).max() < tol

    # bad atoms actually occur: a strongly-driven single atom (near-pi
    # pulse) ends excited UNLESS badly prepared, so P(r) ~ (1 - eta)
    reg1 = Register({"q0": jnp.array([0.0, 0.0])})
    seq1 = Sequence(reg1, MockDevice)
    seq1.declare_channel("ryd", "rydberg_global")
    from pulser_diff_tpu.core import BlackmanWaveform, ConstantWaveform

    seq1.add(
        Pulse(
            BlackmanWaveform(300, np.pi), ConstantWaveform(300, 0.0), 0.0
        ),
        "ryd",
    )
    eta = 0.4
    R = 600
    cfg1 = SimConfig(
        noise="SPAM", eta=eta, epsilon=0.0, epsilon_prime=0.0,
        runs=R, samples_per_run=5,
    )
    sim1 = TpuEmulator.from_sequence(
        seq1, config=cfg1, evaluation_times="Minimal"
    )
    res1 = sim1.run(solver=SolverType.MCWF)
    p_r = res1.results[-1].get("1", 0.0)
    assert abs(p_r - (1 - eta)) < 5.0 / np.sqrt(R)

    sim.set_initial_state(jnp.ones(4) / 2.0)
    with pytest.raises(NotImplementedError, match="ground"):
        sim.run(solver=SolverType.MCWF)


def test_mcwf_diag_drift_matches_general_path(
    two_atom_register, monkeypatch
):
    """The diagonal-drift fast path (commit 8bb1179: sum_site lift(Q)
    collapsed to one precomputed elementwise diagonal when every Q is
    diagonal) must reproduce the general per-site einsum path."""
    from pulser_diff_tpu.solvers import mcwf as mcwf_mod

    seq = make_simple_sequence(two_atom_register, duration=160)
    cfg = SimConfig(noise="dephasing", dephasing_rate=0.3)
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times=0.2)
    h, grid, p0 = _mc_inputs(sim)
    key = jax.random.PRNGKey(7)
    R = 16

    # dephasing Q = rate * |r><r| is diagonal -> the fast path engages
    groups = mcwf_mod._group_collapse(h._collapse_ops, h._size, h.dim)
    assert (
        mcwf_mod._diag_q_sum(
            groups, h._size, h.dim, p0.re.shape, p0.re.dtype
        )
        is not None
    )

    fast = mcsolve(
        h._ham_data, p0, h._collapse_ops, h._size, h.dim, grid, key,
        n_traj=R,
    )
    monkeypatch.setattr(mcwf_mod, "_diag_q_sum", lambda *a, **k: None)
    general = mcsolve(
        h._ham_data, p0, h._collapse_ops, h._size, h.dim, grid, key,
        n_traj=R,
    )
    psi_f, psi_g = _psi_np(fast.states), _psi_np(general.states)
    assert np.abs(psi_f - psi_g).max() < 1e-10
    # The two paths compute the drift in different summation orders; a
    # ~1e-14 rounding difference exactly at a norm threshold could flip
    # one trajectory's jump count, so allow at most one differing
    # trajectory instead of demanding bit-identical crossings (the psi
    # comparison above stays the primary 1e-10 check).
    nj_f = np.asarray(fast.n_jumps)
    nj_g = np.asarray(general.n_jumps)
    assert (nj_f != nj_g).sum() <= 1


# ----------------------------------------------------------------------
# fixed-realization pathwise gradients (VERDICT round-4 #3)
# ----------------------------------------------------------------------
def _mcwf_model(omega=1.7, rate=0.15, n=2, duration=160, solver="MCWF"):
    from pulser_diff_tpu.model import QuantumModel

    reg = Register.from_coordinates(
        [(9.0 * i, 0.0) for i in range(n)], prefix="q"
    )
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    om = seq.declare_variable("omega")
    seq.add(Pulse.ConstantPulse(duration, om, -0.6, 0.2), "ryd")
    cfg = SimConfig(noise="dephasing", dephasing_rate=rate)
    return QuantumModel(
        seq, {"omega": jnp.asarray(omega)}, noise_config=cfg, solver=solver,
        evaluation_times="Minimal",
    )


def test_mcwf_gradient_pathwise_fd():
    """jax.grad through the fixed-key MCWF estimator must equal the
    central finite difference of the SAME estimator (AD correctness
    through drift + cond-gated jumps + normalizations in the scan)."""
    model = _mcwf_model()
    key = jax.random.PRNGKey(3)
    fn = model.expectation_mcwf_fn(key=key, n_traj=8)

    def loss(om):
        _, vals = fn({"omega": om})
        return vals[-1]

    om0 = jnp.asarray(1.7)
    g = float(jax.grad(loss)(om0))
    eps = 1e-5
    fd = float((loss(om0 + eps) - loss(om0 - eps)) / (2 * eps))
    assert np.isfinite(g)
    assert abs(g - fd) < 1e-5 * max(1.0, abs(fd)), (g, fd)


def test_mcwf_gradient_matches_mesolve():
    """The trajectory-averaged expectation gradient converges to the
    DP5_ME gradient (the unbiased reference) — pins the documented
    fixed-realization estimator at small N (bias + sampling noise inside
    a few 1e-3 at realistic rates)."""
    key = jax.random.PRNGKey(12)
    mc_model = _mcwf_model(rate=0.08)
    fn_mc = mc_model.expectation_mcwf_fn(key=key, n_traj=512)

    me_model = _mcwf_model(rate=0.08, solver="DP5_ME")
    fn_me = me_model.expectation_fn()

    om0 = jnp.asarray(1.7)

    def loss_mc(om):
        return fn_mc({"omega": om})[1][-1]

    def loss_me(om):
        return fn_me({"omega": om})[1][-1]

    v_mc, g_mc = jax.value_and_grad(loss_mc)(om0)
    v_me, g_me = jax.value_and_grad(loss_me)(om0)
    assert abs(float(v_mc) - float(v_me)) < 0.05  # 1/sqrt(R) value floor
    scale = max(1.0, abs(float(g_me)))
    assert abs(float(g_mc) - float(g_me)) < 0.02 * scale, (
        float(g_mc), float(g_me),
    )
