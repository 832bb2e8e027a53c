"""XY-mode SLM mask (time-windowed interaction) and basis-restriction
rules (reference hamiltonian.py:462-482, :98-143)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulser_diff_tpu import SimConfig, TpuEmulator
from pulser_diff_tpu.core import MockDevice, Pulse, Register, Sequence


@pytest.fixture
def xy_masked_sim():
    reg = Register(
        {"a": jnp.array([0.0, 0.0]), "b": jnp.array([8.0, 0.0]),
         "c": jnp.array([0.0, 8.0])}
    )
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("mw", "microwave_global")
    seq.config_slm_mask(["a"])
    seq.add(Pulse.ConstantPulse(120, 1.0, 0.0, 0.0), "mw")
    seq.add(Pulse.ConstantPulse(100, 0.5, 0.0, 0.0), "mw")
    return TpuEmulator.from_sequence(seq, evaluation_times="Minimal")


def _pair_flip_flop_norm(H, i, j, n):
    """Magnitude of the sigma+_i sigma-_j element of a dense H."""
    # |u>=0, |d>=1; flip-flop couples |..u..d..> <-> |..d..u..>
    bra = sum((1 if k == j else 0) << (n - 1 - k) for k in range(n))
    ket = sum((1 if k == i else 0) << (n - 1 - k) for k in range(n))
    return abs(H[bra, ket])


def test_xy_slm_interaction_window(xy_masked_sim):
    sim = xy_masked_sim
    # during the mask window (t < 120 ns): pairs touching 'a' are off
    H_in = sim.get_hamiltonian(60).to_numpy()
    # after the window: full interaction
    H_out = sim.get_hamiltonian(180).to_numpy()
    n = 3
    # pair (a,b): indices 0,1
    assert _pair_flip_flop_norm(H_in, 0, 1, n) < 1e-12
    assert _pair_flip_flop_norm(H_out, 0, 1, n) > 1e-3
    # pair (b,c): unmasked, present in both
    assert _pair_flip_flop_norm(H_in, 1, 2, n) > 1e-3
    assert _pair_flip_flop_norm(H_out, 1, 2, n) > 1e-3
    # hermitian at all times
    assert np.abs(H_in - H_in.conj().T).max() < 1e-12


def test_xy_slm_runs(xy_masked_sim):
    res = xy_masked_sim.run()
    psi = res.states.to_numpy()[-1, :, 0]
    assert abs(np.linalg.norm(psi) - 1) < 1e-8


def test_all_basis_rejects_lindblad(two_atom_register):
    seq = Sequence(two_atom_register, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.declare_channel("ram", "raman_global")
    seq.add(Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
    seq.add(Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram")
    with pytest.raises(NotImplementedError):
        TpuEmulator.from_sequence(
            seq, config=SimConfig(noise="dephasing")
        )


def test_xy_rejects_doppler():
    reg = Register({"a": jnp.array([0.0, 0.0]), "b": jnp.array([8.0, 0.0])})
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("mw", "microwave_global")
    seq.add(Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "mw")
    with pytest.raises(NotImplementedError):
        TpuEmulator.from_sequence(seq, config=SimConfig(noise="doppler"))


def test_digital_basis_no_interaction(two_atom_register):
    seq = Sequence(two_atom_register, MockDevice)
    seq.declare_channel("ram", "raman_global")
    seq.add(Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ram")
    sim = TpuEmulator.from_sequence(seq)
    assert sim.basis_name == "digital"
    H = sim.get_hamiltonian(50).to_numpy()
    # no interaction: H must be a sum of single-qubit terms ->
    # H[0b11, 0b00] (double flip) vanishes
    assert abs(H[3, 0]) < 1e-12
