"""Leakage noise: an extra dark level |x> per qudit (with_leakage).

The reference threads `with_leakage` through its SimConfig/NoiseModel
(reference simconfig.py:77,131) and delegates the physics to
pulser-simulation's "<basis>_with_error" bases; here the extension is
native (hamiltonian.py:_build_basis_and_op_matrices)."""

import numpy as np
import pytest
from scipy.integrate import solve_ivp

import jax
import jax.numpy as jnp

from pulser_diff_tpu import SimConfig, TpuEmulator
from pulser_diff_tpu.core import MockDevice, Pulse, Register, Sequence

from .conftest import make_simple_sequence


def _leak_seq(reg, duration=150, omega=2.0, delta=-0.7, phase=0.4):
    return make_simple_sequence(
        reg, duration=duration, omega=omega, delta=delta, phase=phase
    )


def test_leakage_config_roundtrip():
    L = np.zeros((3, 3))
    L[2, 1] = 1.0  # |x><g| in [r, g, x]
    cfg = SimConfig(
        noise="eff_noise", eff_noise_rates=(0.3,), eff_noise_opers=(L,),
        with_leakage=True,
    )
    assert "leakage" in cfg.noise
    nm = cfg.to_noise_model()
    assert nm.with_leakage and "leakage" in nm.noise_types
    back = SimConfig.from_noise_model(nm)
    assert back.with_leakage

    with pytest.raises(ValueError, match="effective noise operator"):
        SimConfig(noise="leakage").to_noise_model()


def test_leakage_basis_and_operator_shapes():
    reg = Register({"q0": jnp.array([-4.0, 0.0]), "q1": jnp.array([4.0, 0.0])})
    seq = _leak_seq(reg)
    L = np.zeros((3, 3))
    L[2, 1] = 1.0
    cfg = SimConfig(
        noise="eff_noise", eff_noise_rates=(0.2,), eff_noise_opers=(L,),
        with_leakage=True,
    )
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    h = sim._hamiltonian
    assert h.dim == 3
    assert h._basis_labels == ["r", "g", "x"]
    assert "sigma_xx" in h.op_matrix and "sigma_gx" in h.op_matrix
    # wrong-shape operator rejected with the dimension in the message
    bad = np.zeros((2, 2))
    cfg_bad = SimConfig(
        noise="eff_noise", eff_noise_rates=(0.2,), eff_noise_opers=(bad,),
        with_leakage=True,
    )
    with pytest.raises(ValueError, match="Incompatible shape"):
        TpuEmulator.from_sequence(seq, config=cfg_bad)


def test_leakage_single_qubit_vs_scipy_golden():
    """1 qubit, constant pulse, leak |g> -> |x>: the full 3-level Lindblad
    evolution against a hand-built scipy integration."""
    om, det, ph, gam = 2.0, -0.7, 0.4, 0.25
    dur = 150
    reg = Register({"q0": jnp.array([0.0, 0.0])})
    seq = _leak_seq(reg, duration=dur, omega=om, delta=det, phase=ph)
    L = np.zeros((3, 3))
    L[2, 1] = 1.0  # |x><g|
    cfg = SimConfig(
        noise="eff_noise", eff_noise_rates=(gam,), eff_noise_opers=(L,),
        with_leakage=True,
    )
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times=0.3)
    res = sim.run()
    rhos = res.states.to_numpy()  # (n_eval, 3, 3)
    t_eval = np.asarray(jax.device_get(sim.evaluation_times))

    # golden: H in [r, g, x]; drive 0.5 om e^{-i ph} |r><g|? — the
    # framework's convention: coeff 0.5*om*e^{-i ph} on sigma_gr = |g><r|
    # plus h.c., det on -|r><r| (reference hamiltonian.py:420-423)
    H = np.zeros((3, 3), dtype=complex)
    c = 0.5 * om * np.exp(-1j * ph)
    H[1, 0] = c
    H[0, 1] = np.conj(c)
    H[0, 0] = -det
    Lc = np.sqrt(gam) * L.astype(complex)
    M = Lc.conj().T @ Lc

    def rhs(t, y):
        rho = y.reshape(3, 3)
        out = -1j * (H @ rho - rho @ H)
        out += Lc @ rho @ Lc.conj().T - 0.5 * (M @ rho + rho @ M)
        return out.reshape(-1)

    rho0 = np.zeros((3, 3), dtype=complex)
    rho0[1, 1] = 1.0  # |g>
    sol = solve_ivp(
        rhs, (0.0, float(t_eval[-1])), rho0.reshape(-1),
        t_eval=t_eval, method="DOP853", rtol=1e-11, atol=1e-13,
    )
    ref = sol.y.T.reshape(len(t_eval), 3, 3)
    assert np.abs(rhos - ref).max() < 1e-6
    # population actually leaked into |x>
    assert ref[-1, 2, 2].real > 0.01
    # trace preserved
    assert abs(np.trace(rhos[-1]).real - 1) < 1e-8


def test_leakage_sampling_maps_x_to_zero():
    """A fully-leaked state samples as the all-zero bitstring."""
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.result import QuantumResult

    # 2 qubits, both in |x> (index 2 of [r, g, x]): flat index 2*3+2 = 8
    st = np.zeros((9, 1))
    st[8, 0] = 1.0
    qr = QuantumResult(
        ("q0", "q1"), "ground-rydberg",
        Cplx(jnp.asarray(st), jnp.zeros_like(jnp.asarray(st))),
        True, basis_labels=("r", "g", "x"),
    )
    w = np.asarray(jax.device_get(qr._weights()))
    assert w[0] == pytest.approx(1.0)  # "00"
    # and |rx> -> "10": flat index 0*3+2 = 2
    st2 = np.zeros((9, 1))
    st2[2, 0] = 1.0
    qr2 = QuantumResult(
        ("q0", "q1"), "ground-rydberg",
        Cplx(jnp.asarray(st2), jnp.zeros_like(jnp.asarray(st2))),
        True, basis_labels=("r", "g", "x"),
    )
    w2 = np.asarray(jax.device_get(qr2._weights()))
    assert w2[0b10] == pytest.approx(1.0)


def test_leakage_two_qubit_interaction_runs():
    """vdW interaction with the extended basis (occupancy of |r> only)."""
    reg = Register({"q0": jnp.array([-3.0, 0.0]), "q1": jnp.array([3.0, 0.0])})
    seq = _leak_seq(reg)
    L = np.zeros((3, 3))
    L[2, 0] = 1.0  # |x><r| : leak out of rydberg
    cfg = SimConfig(
        noise="eff_noise", eff_noise_rates=(0.15,), eff_noise_opers=(L,),
        with_leakage=True,
    )
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    assert sim.dim == 3
    res = sim.run()
    rho = res.states.to_numpy()[-1]
    assert rho.shape == (9, 9)
    assert abs(np.trace(rho).real - 1) < 1e-8
    # leak populations present
    x_idx = [i * 3 + 2 for i in range(3)] + [2 * 3 + j for j in range(3)]
    assert sum(rho[i, i].real for i in set(x_idx)) > 1e-4
    # sampling end-to-end
    c = res.sample_state(float(sim.evaluation_times[-1]), n_samples=50)
    assert sum(c.values()) == 50
