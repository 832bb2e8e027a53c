"""Pallas fused-evolution kernel vs the XLA f64 solver.

Runs in interpreter mode on CPU (the kernel itself compiles for TPU; the
driver bench exercises the compiled path on hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulser_diff_tpu import TpuEmulator
from pulser_diff_tpu.cplx import Cplx
from pulser_diff_tpu.core import MockDevice
from pulser_diff_tpu.ops.pallas_evolution import pallas_evolve
from pulser_diff_tpu.solvers import SolverType, TimeGrid, sesolve

from .conftest import make_rich_sequence


def test_pallas_evolution_matches_xla(two_atom_register):
    seq = make_rich_sequence(two_atom_register)
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    h = sim._hamiltonian
    hd = h._ham_data
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)

    da, db = h.dim**h._a, h.dim**h._b
    psi0 = sim.initial_state
    p0 = Cplx(psi0.re.T.reshape(1, da, db), psi0.im.T.reshape(1, da, db))

    ref = sesolve(hd, p0, grid, solver=SolverType.RK4_SE)
    ref_final = ref[ref.re.shape[0] - 1]

    out = pallas_evolve(hd, p0, grid.times, interpret=True)
    err = np.abs(out.to_numpy() - ref_final.to_numpy()).max()
    assert err < 5e-5  # f32 kernel vs f64 reference


def test_pallas_rejects_xy():
    import jax.numpy as jnp

    from pulser_diff_tpu.core import Pulse, Register, Sequence

    reg = Register({"a": jnp.array([0.0, 0.0]), "b": jnp.array([8.0, 0.0])})
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("mw", "microwave_global")
    seq.add(Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "mw")
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    h = sim._hamiltonian
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    da, db = h.dim**h._a, h.dim**h._b
    psi0 = sim.initial_state
    p0 = Cplx(psi0.re.T.reshape(1, da, db), psi0.im.T.reshape(1, da, db))
    with pytest.raises(NotImplementedError):
        pallas_evolve(h._ham_data, p0, grid.times, interpret=True)
