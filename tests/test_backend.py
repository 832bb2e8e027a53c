"""Emulator API semantics tests (reference backend.py behaviours)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulser_diff_tpu import SimConfig, TpuEmulator
from pulser_diff_tpu.core import MockDevice, Pulse, Register, Sequence, sample
from pulser_diff_tpu.cplx import Cplx

from .conftest import make_simple_sequence


def test_from_sequence_validation(two_atom_register):
    seq = Sequence(two_atom_register, MockDevice)
    with pytest.raises(ValueError):
        TpuEmulator.from_sequence(seq)  # no channels
    seq.declare_channel("ryd", "rydberg_global")
    with pytest.raises(ValueError):
        TpuEmulator.from_sequence(seq)  # no instructions
    om = seq.declare_variable("om")
    seq.add(Pulse.ConstantPulse(100, om, 0.0, 0.0), "ryd")
    with pytest.raises(ValueError):
        TpuEmulator.from_sequence(seq)  # parametrized


def test_sampling_rate_validation(simple_seq):
    with pytest.raises(ValueError):
        TpuEmulator.from_sequence(simple_seq, sampling_rate=1.5)
    with pytest.raises(ValueError):
        TpuEmulator.from_sequence(simple_seq, sampling_rate=0.001)


def test_evaluation_times_semantics(simple_seq):
    sim = TpuEmulator.from_sequence(simple_seq)
    T = simple_seq.get_duration() / 1000
    # Full: all sampling times (0 and T included)
    t_full = np.asarray(jax.device_get(sim.evaluation_times))
    assert t_full[0] == 0.0 and abs(t_full[-1] - T) < 1e-12
    # Minimal: only {0, T}
    sim.set_evaluation_times("Minimal")
    t_min = np.asarray(jax.device_get(sim.evaluation_times))
    assert len(t_min) == 2
    # float: subsampling
    sim.set_evaluation_times(0.5)
    t_half = np.asarray(jax.device_get(sim.evaluation_times))
    assert len(t_half) < len(t_full)
    # explicit list with union of {0, T}
    sim.set_evaluation_times([0.1, 0.05])
    t_list = np.asarray(jax.device_get(sim.evaluation_times))
    assert np.allclose(t_list, sorted([0.0, 0.05, 0.1, T]))
    with pytest.raises(ValueError):
        sim.set_evaluation_times([2 * T])
    with pytest.raises(ValueError):
        sim.set_evaluation_times([-0.1])
    with pytest.raises(ValueError):
        sim.set_evaluation_times("garbage")
    with pytest.raises(ValueError):
        sim.set_evaluation_times(1.7)


def test_initial_state_validation(simple_seq):
    sim = TpuEmulator.from_sequence(simple_seq)
    with pytest.raises(ValueError):
        sim.set_initial_state(jnp.zeros(5))
    st = jnp.zeros(4).at[0].set(1.0)
    sim.set_initial_state(st)
    assert sim.initial_state.shape == (4, 1)


def test_get_hamiltonian_bounds(simple_seq):
    sim = TpuEmulator.from_sequence(simple_seq)
    with pytest.raises(ValueError):
        sim.get_hamiltonian(-1)
    with pytest.raises(ValueError):
        sim.get_hamiltonian(10_000)


def test_config_merge(simple_seq):
    sim = TpuEmulator.from_sequence(
        simple_seq, config=SimConfig(noise="dephasing", dephasing_rate=0.07)
    )
    sim.add_config(SimConfig(noise="relaxation", relaxation_rate=0.03))
    cfg = sim.config
    assert set(cfg.noise) == {"dephasing", "relaxation"}
    # former params preserved
    assert float(np.asarray(cfg.dephasing_rate)) == pytest.approx(0.07)
    assert float(np.asarray(cfg.relaxation_rate)) == pytest.approx(0.03)
    sim.reset_config()
    assert sim.config.noise == ()


def test_build_operator(simple_seq):
    sim = TpuEmulator.from_sequence(simple_seq)
    op = sim.build_operator([("sigma_rr", ["q0"])])
    ref = np.kron(np.diag([1.0, 0.0]), np.eye(2))
    assert np.abs(op.to_numpy() - ref).max() < 1e-12
    glob = sim.build_operator([("sigma_rr", "global")])
    ref_g = ref + np.kron(np.eye(2), np.diag([1.0, 0.0]))
    assert np.abs(glob.to_numpy() - ref_g).max() < 1e-12
    with pytest.raises(ValueError):
        sim.build_operator([("sigma_rr", ["q0", "q0"])])
    with pytest.raises(ValueError):
        sim.build_operator([("sigma_rr", ["nope"])])
    with pytest.raises(ValueError):
        sim.build_operator([("bogus", ["q0"])])


def test_endtimes(two_atom_register):
    seq = Sequence(two_atom_register, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
    seq.add(Pulse.ConstantPulse(150, 0.5, 0.0, 0.0), "ryd")
    sim = TpuEmulator.from_sequence(seq)
    ends = sim.endtimes
    assert 0 in ends
    assert 100 in ends and 99 in ends
    assert 250 in ends and 249 in ends


def test_qq_distances(simple_seq):
    sim = TpuEmulator.from_sequence(simple_seq)
    sim.run(dist_grad=True, solver="DP5_SE")
    d = sim.qq_distances
    assert set(d) == {"q0-q1"}
    assert float(d["q0-q1"]) == pytest.approx(8.0)


def test_measurement_basis_selection(two_atom_register):
    seq = make_simple_sequence(two_atom_register)
    seq.measure("ground-rydberg")
    sim = TpuEmulator.from_sequence(seq)
    assert sim._meas_basis == "ground-rydberg"
    # digital-only sequence defaults to digital
    seq2 = Sequence(two_atom_register, MockDevice)
    seq2.declare_channel("ram", "raman_global")
    seq2.add(Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram")
    sim2 = TpuEmulator.from_sequence(seq2)
    assert sim2.basis_name == "digital"
    assert sim2._meas_basis == "digital"


def test_sampling_and_weights(simple_seq):
    sim = TpuEmulator.from_sequence(simple_seq, evaluation_times="Minimal")
    res = sim.run()
    c = res.sample_final_state(2000)
    assert sum(c.values()) == 2000
    # bitstring keys of right length
    assert all(len(k) == 2 for k in c)
    # weights normalised
    w = res[len(res) - 1]._weights()
    assert abs(float(jnp.sum(w)) - 1.0) < 1e-9


def test_solver_routing_dim_cap(two_atom_register, monkeypatch):
    """Default-path routing by state size on accelerator backends: below
    the fused adjoint's VMEM ceiling (dim < 2^18) DP5_SE takes the fused
    kernel, at/above it the HBM-resident f32 XLA stepper (SCALING.md —
    the N=18 fused adjoint cannot compile under 128 MiB/core).  On the
    CPU backend both stay False (interpret-mode Pallas is slower than
    XLA; f32 buys nothing)."""
    seq_small = make_simple_sequence(two_atom_register, duration=60)
    sim_small = TpuEmulator.from_sequence(seq_small)

    reg18 = Register(
        {
            f"q{i}": jnp.array([10.0 * (i % 4), 10.0 * (i // 4)])
            for i in range(18)
        }
    )
    seq18 = Sequence(reg18, MockDevice)
    seq18.declare_channel("ryd", "rydberg_global")
    seq18.add(Pulse.ConstantPulse(60, 1.0, 0.0, 0.0), "ryd")
    sim18 = TpuEmulator.from_sequence(
        seq18, sampling_rate=0.25, evaluation_times="Minimal"
    )

    # CPU backend: neither fast path engages
    assert not sim_small._fused_eligible(sim_small._hamiltonian._ham_data)
    assert not sim18._f32_xla_eligible()

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert sim_small._fused_eligible(sim_small._hamiltonian._ham_data)
    assert not sim_small._f32_xla_eligible()
    assert not sim18._fused_eligible(sim18._hamiltonian._ham_data)
    assert sim18._f32_xla_eligible()


def test_solver_routing_above_cap(two_atom_register, monkeypatch):
    """Routing above the adjoint dim cap (simulated by lowering the cap
    on a 2-atom system with a faked accelerator backend): the default
    DP5_SE goes to the f32 XLA stepper, while an explicit run(fused=True)
    is honored and routes to the fused kernel — never silently
    rerouted to a different numerical path."""
    import pulser_diff_tpu.backend as be
    import pulser_diff_tpu.ops.pallas_evolution as pe
    from pulser_diff_tpu.solvers import SolverType

    seq = make_simple_sequence(two_atom_register, duration=60)
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    hd = sim._hamiltonian._ham_data
    from pulser_diff_tpu.solvers import TimeGrid

    grid = TimeGrid.make(
        sim._hamiltonian.sampling_times, sim._eval_times_array
    )
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(type(sim), "_FUSED_DIM_CAP", 1)

    seen = {}
    real_sesolve = be.sesolve

    def spy_sesolve(ham, psi0, g, solver=SolverType.DP5_SE, **kw):
        seen["solver"] = solver
        return real_sesolve(ham, psi0, g, solver=solver, **kw)

    monkeypatch.setattr(be, "sesolve", spy_sesolve)

    # default (fused unset): f32 XLA above the cap
    sim._solve_states(hd, None, SolverType.DP5_SE, 1, 12, grid)
    assert seen["solver"] == SolverType.DP5_SE_F32

    # fused=False: the f64 parity path, never f32
    sim._solve_states(
        hd, None, SolverType.DP5_SE, 1, 12, grid,
        solver_opts={"fused": False},
    )
    assert seen["solver"] == SolverType.DP5_SE

    # explicit fused=True: the fused kernel, even above the cap
    real_pallas = pe.fused_evolve_states
    called = {}

    def spy_pallas(method, interpret, slots, n_eval, last_slot, data):
        called["method"] = method
        # force interpret on the faked-tpu backend so it runs on CPU
        return real_pallas(method, True, slots, n_eval, last_slot, data)

    monkeypatch.setattr(pe, "fused_evolve_states", spy_pallas)
    sim._solve_states(
        hd, None, SolverType.DP5_SE, 1, 12, grid,
        solver_opts={"fused": True},
    )
    assert called["method"] == "DP5"
