"""Noise-channel parity tests (reference test_noise.py strategy: Lindblad
density matrices vs the golden model, laser-waist damping, stochastic
multi-run results, sparse/dense utility checks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulser_diff_tpu import SimConfig, TpuEmulator
from pulser_diff_tpu.core import MockDevice, Pulse, Register, Sequence
from pulser_diff_tpu.ops import total_magnetization, trace, vn_entropy
from pulser_diff_tpu.simresults import CoherentResults, NoisyResults

from .conftest import make_simple_sequence
from .golden import golden_mesolve
from .metrics import ATOL_NOISE, RTOL_NOISE


def dm_states(results) -> np.ndarray:
    s = results.states
    return np.asarray(jax.device_get(s.re)) + 1j * np.asarray(
        jax.device_get(s.im)
    )


def _lift(op, site, n):
    out = np.array([[1.0 + 0j]])
    for k in range(n):
        out = np.kron(out, op if k == site else np.eye(2, dtype=complex))
    return out


Z = np.diag([1.0, -1.0]).astype(complex)
X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
SGR = np.array([[0, 0], [1, 0]], dtype=complex)  # |g><r| in (r, g) order


@pytest.mark.parametrize("noise", ["dephasing", "depolarizing", "relaxation"])
def test_lindblad_channels_vs_golden(two_atom_register, noise):
    seq = make_simple_sequence(two_atom_register, duration=200)
    rate = 0.12
    kwargs = {
        "dephasing": dict(noise="dephasing", dephasing_rate=rate),
        "depolarizing": dict(noise="depolarizing", depolarizing_rate=rate),
        "relaxation": dict(noise="relaxation", relaxation_rate=rate),
    }[noise]
    cfg = SimConfig(**kwargs)
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times=0.25)
    res = sim.run()
    assert isinstance(res, CoherentResults)
    rho = dm_states(res)

    if noise == "dephasing":
        locs = [np.sqrt(rate / 2) * Z]
    elif noise == "depolarizing":
        locs = [np.sqrt(rate / 4) * m for m in (X, Y, Z)]
    else:
        locs = [np.sqrt(rate) * SGR]
    collapse = [_lift(m, i, 2) for m in locs for i in range(2)]
    t = np.asarray(jax.device_get(sim.evaluation_times))
    ref = golden_mesolve(seq, MockDevice, t, collapse)
    assert np.abs(rho - ref).max() < ATOL_NOISE
    # trace preserved
    tr = np.trace(rho, axis1=1, axis2=2)
    assert np.abs(tr - 1).max() < 1e-8


def test_eff_noise_vs_golden(two_atom_register):
    seq = make_simple_sequence(two_atom_register, duration=180)
    op = np.array([[0.3, 0.4], [0.4, -0.3]])
    cfg = SimConfig(
        noise="eff_noise", eff_noise_rates=(0.2,), eff_noise_opers=(op,)
    )
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times=0.3)
    rho = dm_states(sim.run())
    collapse = [_lift(np.sqrt(0.2) * op.astype(complex), i, 2) for i in range(2)]
    t = np.asarray(jax.device_get(sim.evaluation_times))
    ref = golden_mesolve(seq, MockDevice, t, collapse)
    assert np.abs(rho - ref).max() < ATOL_NOISE


def test_laser_waist_damping(two_atom_register):
    """amplitude noise with amp_sigma=0: deterministic waist damping
    (reference test_noise.py:69-84)."""
    seq = make_simple_sequence(two_atom_register, duration=200)
    w0 = 20.0
    cfg = SimConfig(noise="amplitude", amp_sigma=0.0, laser_waist=w0)
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    res = sim.run()
    assert isinstance(res, CoherentResults)
    psi = dm_states(res)[-1][:, 0]

    # golden: both qubits sit at r=4 um, so the waist damping is a global
    # amplitude rescale by exp(-(r/w0)^2)
    damp = float(np.exp(-((4.0 / w0) ** 2)))
    seq2 = make_simple_sequence(two_atom_register, duration=200, omega=2.0 * damp)
    from .golden import golden_sesolve

    t = np.asarray(jax.device_get(sim.evaluation_times))
    ref = golden_sesolve(seq2, MockDevice, t)[-1]
    assert np.abs(psi - ref).max() < 1e-6


def test_doppler_noisy_results(two_atom_register):
    """Stochastic doppler runs -> NoisyResults with sane statistics
    (reference test_noise.py:92-118)."""
    seq = make_simple_sequence(two_atom_register, duration=200)
    cfg = SimConfig(
        noise="doppler", temperature=80.0, runs=20, samples_per_run=10
    )
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times=0.1)
    res = sim.run()
    assert isinstance(res, NoisyResults)
    states = res.states  # diagonal pseudo-density matrices
    n_eval = states.re.shape[0]
    assert n_eval == len(np.asarray(jax.device_get(sim.evaluation_times)))
    rho = dm_states(res)
    tr = np.trace(rho, axis1=1, axis2=2)
    assert np.abs(tr - 1).max() < 1e-8
    # mixed state has positive entropy
    ent = vn_entropy(res.get_final_state())
    assert float(ent) > 0
    # rough parity with the noiseless populations (doppler is weak)
    sim0 = TpuEmulator.from_sequence(seq, evaluation_times=0.1)
    psi0 = dm_states(sim0.run())[-1][:, 0]
    pop0 = np.abs(psi0) ** 2
    assert np.abs(np.diag(rho[-1]).real - pop0).max() < 0.2


def test_amp_sigma_noisy(two_atom_register):
    seq = make_simple_sequence(two_atom_register, duration=200)
    cfg = SimConfig(
        noise="amplitude",
        amp_sigma=0.05,
        laser_waist=float("inf"),
        runs=10,
        samples_per_run=5,
    )
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    res = sim.run()
    assert isinstance(res, NoisyResults)


def test_spam_measurement_errors_only(two_atom_register):
    """SPAM with eta=0: coherent run with measurement-error projectors
    (reference CoherentResults SPAM path)."""
    seq = make_simple_sequence(two_atom_register, duration=200)
    cfg = SimConfig(noise="SPAM", eta=0.0, epsilon=0.1, epsilon_prime=0.05)
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    res = sim.run()
    assert isinstance(res, CoherentResults)
    # pseudo-density expectation path requires diagonal observables
    obs = total_magnetization(2)
    vals = res.expect([obs])[0]
    assert vals.re.shape[0] == 2
    # sampling applies random bit flips
    c = res.sample_state(float(sim.evaluation_times[-1]), n_samples=500)
    assert sum(c.values()) == 500


def test_spam_state_prep_errors(two_atom_register):
    seq = make_simple_sequence(two_atom_register, duration=200)
    cfg = SimConfig(
        noise="SPAM", eta=0.4, epsilon=0.0, epsilon_prime=0.0, runs=12,
        samples_per_run=5,
    )
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    res = sim.run()
    assert isinstance(res, NoisyResults)
    rho = dm_states(res)
    tr = np.trace(rho, axis1=1, axis2=2)
    assert np.abs(tr - 1).max() < 1e-8


def test_noise_param_gradient(two_atom_register):
    """Differentiability through a Lindblad noise parameter
    (BASELINE.json config #5)."""
    seq = make_simple_sequence(two_atom_register, duration=60)
    obs = total_magnetization(2)

    def f(rate):
        cfg = SimConfig(noise="dephasing", dephasing_rate=rate)
        sim = TpuEmulator.from_sequence(
            seq, config=cfg, evaluation_times="Minimal"
        )
        vals = sim.run().expect([obs])[0]
        return vals.re[-1]

    g = jax.grad(f)(jnp.asarray(0.1))
    eps = 1e-4
    fd = (float(f(jnp.asarray(0.1 + eps))) - float(f(jnp.asarray(0.1 - eps)))) / (
        2 * eps
    )
    assert abs(float(g) - fd) < 1e-6


def test_one_qubit_lindblad(two_atom_register):
    reg = Register({"q0": jnp.array([0.0, 0.0])})
    seq = make_simple_sequence(reg, duration=200)
    cfg = SimConfig(noise="dephasing", dephasing_rate=0.3)
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times=0.25)
    rho = dm_states(sim.run())
    t = np.asarray(jax.device_get(sim.evaluation_times))
    ref = golden_mesolve(seq, MockDevice, t, [np.sqrt(0.15) * Z])
    assert np.abs(rho - ref).max() < ATOL_NOISE


def test_superop_matches_factored_rhs(two_atom_register):
    """The Liouville-vectorized mesolve fast path (dim<=8 default,
    solvers/solver.py _make_me_step_superop) must match the factored
    per-site RHS exactly — ising + two Lindblad channels, and an XY
    sequence (kron-pair terms in the superop stack)."""
    from pulser_diff_tpu.core import ConstantWaveform, RampWaveform

    reg = Register.from_coordinates([(0, 0), (8, 0), (16, 0)], prefix="q")
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        Pulse(RampWaveform(200, 0.5, 2.5), ConstantWaveform(200, -1.0), 0.3),
        "ryd",
    )
    cfg = SimConfig(
        noise=("dephasing", "relaxation"),
        dephasing_rate=0.05,
        relaxation_rate=0.03,
    )
    sim = TpuEmulator.from_sequence(
        seq, sampling_rate=0.5, config=cfg, evaluation_times="Full"
    )
    r1 = dm_states(sim.run(solver="DP5_ME", superop=True))
    r2 = dm_states(sim.run(solver="DP5_ME", superop=False))
    assert np.abs(r1 - r2).max() < 1e-13

    seq2 = Sequence(
        Register.from_coordinates([(0, 0), (7, 0), (3, 6)], prefix="q"),
        MockDevice,
    )
    seq2.declare_channel("mw", "microwave_global")
    seq2.add(
        Pulse(RampWaveform(200, 0.5, 2.0), ConstantWaveform(200, -0.8), 0.2),
        "mw",
    )
    sim2 = TpuEmulator.from_sequence(
        seq2,
        sampling_rate=0.5,
        config=SimConfig(noise="dephasing", dephasing_rate=0.04),
        evaluation_times="Full",
    )
    x1 = dm_states(sim2.run(solver="DP5_ME", superop=True))
    x2 = dm_states(sim2.run(solver="DP5_ME", superop=False))
    assert np.abs(x1 - x2).max() < 1e-13


def test_dense_me_form_matches_other_forms(two_atom_register):
    """The DENSE mesolve form (mid-size default, solvers/solver.py
    _make_me_step_dense: H(t) materialized per stage, RHS = (dim, dim)
    matmuls) must match both the superop and factored forms exactly —
    ising + two channels, XY kron-pair terms, and a noise-rate gradient
    through the dense program."""
    from pulser_diff_tpu.core import ConstantWaveform, RampWaveform

    reg = Register.from_coordinates([(0, 0), (8, 0), (16, 0)], prefix="q")
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(
        Pulse(RampWaveform(200, 0.5, 2.5), ConstantWaveform(200, -1.0), 0.3),
        "ryd",
    )

    def make_sim(rate):
        cfg = SimConfig(
            noise=("dephasing", "relaxation"),
            dephasing_rate=rate,
            relaxation_rate=0.03,
        )
        return TpuEmulator.from_sequence(
            seq, sampling_rate=0.5, config=cfg, evaluation_times="Full"
        )

    sim = make_sim(0.05)
    r_dense = dm_states(sim.run(solver="DP5_ME", me_form="dense"))
    r_sup = dm_states(sim.run(solver="DP5_ME", me_form="superop"))
    r_fac = dm_states(sim.run(solver="DP5_ME", me_form="factored"))
    assert np.abs(r_dense - r_sup).max() < 1e-13
    assert np.abs(r_dense - r_fac).max() < 1e-13

    # XY (kron-pair terms in the dense H build)
    seq2 = Sequence(
        Register.from_coordinates([(0, 0), (7, 0), (3, 6)], prefix="q"),
        MockDevice,
    )
    seq2.declare_channel("mw", "microwave_global")
    seq2.add(
        Pulse(RampWaveform(200, 0.5, 2.0), ConstantWaveform(200, -0.8), 0.2),
        "mw",
    )
    sim2 = TpuEmulator.from_sequence(
        seq2,
        sampling_rate=0.5,
        config=SimConfig(noise="dephasing", dephasing_rate=0.04),
        evaluation_times="Full",
    )
    x_dense = dm_states(sim2.run(solver="DP5_ME", me_form="dense"))
    x_sup = dm_states(sim2.run(solver="DP5_ME", me_form="superop"))
    assert np.abs(x_dense - x_sup).max() < 1e-13

    # differentiable-noise contract through the dense form (ref
    # simconfig.py:15 tensor-valued params)
    def loss(rate, form):
        sim_r = make_sim(rate)
        rho = sim_r.run(solver="DP5_ME", me_form=form).states
        return rho.re[-1, 0, 0]

    g_dense = jax.grad(lambda r: loss(r, "dense"))(jnp.asarray(0.05))
    g_sup = jax.grad(lambda r: loss(r, "superop"))(jnp.asarray(0.05))
    assert np.isfinite(float(g_dense))
    assert abs(float(g_dense) - float(g_sup)) < 1e-10


def test_me_form_auto_routing(monkeypatch):
    """Auto routing: dim<=8 superop, 8<dim<=2048 dense, above
    factored (solvers/solver.py mesolve form selection)."""
    import pulser_diff_tpu.solvers.solver as solver_mod
    from pulser_diff_tpu.core import ConstantWaveform

    picked = {}

    def spy(name, real):
        def wrapper(*a, **k):
            picked["form"] = name
            return real(*a, **k)

        return wrapper

    monkeypatch.setattr(
        solver_mod, "_make_me_step_superop",
        spy("superop", solver_mod._make_me_step_superop),
    )
    monkeypatch.setattr(
        solver_mod, "_make_me_step_dense",
        spy("dense", solver_mod._make_me_step_dense),
    )
    monkeypatch.setattr(
        solver_mod, "_make_me_step", spy("factored", solver_mod._make_me_step)
    )

    def run_n(n):
        reg = Register.from_coordinates(
            [(9.0 * i, 0.0) for i in range(n)], prefix="q"
        )
        seq = Sequence(reg, MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            Pulse(
                ConstantWaveform(60, 1.0), ConstantWaveform(60, -0.5), 0.0
            ),
            "ryd",
        )
        sim = TpuEmulator.from_sequence(
            seq,
            config=SimConfig(noise="dephasing", dephasing_rate=0.05),
            evaluation_times="Minimal",
        )
        sim.run(solver="DP5_ME")
        return picked["form"]

    assert run_n(3) == "superop"  # dim 8 (superop wins: 0.32 vs 0.56 s)
    assert run_n(4) == "dense"  # dim 16 (dense wins from here up)
    assert run_n(6) == "dense"  # dim 64
    # the >2048 factored leg is pinned structurally (no 12-qubit CPU
    # mesolve in CI): the selector itself
    assert solver_mod._SUPEROP_DIM_CAP == 8
    assert solver_mod._DENSE_ME_DIM_CAP == 2048


def test_noisy_pipeline_program_cache(two_atom_register):
    """The noisy run() pipeline compiles ONCE and is reused across calls;
    any config mutation invalidates it (backend.py _run_noisy_batch)."""
    seq = make_simple_sequence(two_atom_register, duration=150)
    cfg = SimConfig(noise="doppler", temperature=60.0, runs=4,
                    samples_per_run=5)
    sim = TpuEmulator.from_sequence(seq, config=cfg,
                                    evaluation_times="Minimal")
    res1 = sim.run()
    assert isinstance(res1, NoisyResults)
    n_cached = len(sim._njit_cache)
    assert n_cached >= 1
    res2 = sim.run()
    # same compiled program reused: no new cache entries
    assert len(sim._njit_cache) == n_cached
    assert abs(sum(res2.results[-1].values()) - 1.0) < 1e-9
    # mutation clears the cache
    sim.set_config(SimConfig(noise="doppler", temperature=90.0, runs=4,
                             samples_per_run=5))
    assert len(sim._njit_cache) == 0
    res3 = sim.run()
    assert abs(sum(res3.results[-1].values()) - 1.0) < 1e-9


def test_deterministic_run_program_cache(two_atom_register):
    """The deterministic run() solve is one cached jitted program too,
    and matches a fresh emulator's states."""
    seq = make_simple_sequence(two_atom_register, duration=150)
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    r1 = sim.run()
    n_cached = len(sim._njit_cache)
    assert n_cached >= 1
    r2 = sim.run()
    assert len(sim._njit_cache) == n_cached
    s1 = np.asarray(jax.device_get(r1.states.re))
    s2 = np.asarray(jax.device_get(r2.states.re))
    assert np.array_equal(s1, s2)
    # eval-times mutation invalidates and recompiles with the new grid
    sim.set_evaluation_times("Full")
    assert len(sim._njit_cache) == 0
    r3 = sim.run()
    assert r3.states.re.shape[0] > s1.shape[0]
