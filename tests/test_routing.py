"""Solver routing + options plumbing (VERDICT.md round-2 next-step #2/#9):
RK4_ME reachability, adaptive rtol/atol/max_iters pass-through, the
fused-kernel opt-out, and the time_grad/dist_grad compat warnings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulser_diff_tpu import SimConfig, TpuEmulator
from pulser_diff_tpu.solvers import SolverType

from .conftest import make_simple_sequence


def _sim(two_atom_register, **kw):
    seq = make_simple_sequence(two_atom_register, duration=48)
    return TpuEmulator.from_sequence(
        seq, evaluation_times="Minimal", **kw
    )


def test_rk4_me_routes_to_rk4_stepper(two_atom_register):
    """run(solver=RK4_ME) must reach the RK4 master-equation stepper
    (round 2 silently rerouted it to DP5_ME, backend.py:443-453)."""
    cfg = SimConfig(noise="dephasing", dephasing_rate=0.3)
    sim = _sim(two_atom_register, config=cfg)
    rho_rk4 = sim.run(solver=SolverType.RK4_ME).states.to_numpy()
    rho_dp5 = sim.run(solver=SolverType.DP5_ME).states.to_numpy()
    # same physics, different stepper: close but NOT bit-identical
    assert np.abs(rho_rk4 - rho_dp5).max() < 1e-6
    assert np.abs(rho_rk4 - rho_dp5).max() > 0


def test_adaptive_options_plumbed(two_atom_register):
    """rtol/atol/max_iters reach the adaptive DP5(4) solver through
    run(**options) (reference forwards opaque options to pyqtorch,
    backend.py:430-451).  A coarse grid (sampling_rate 0.05 -> 20 ns
    intervals) makes the step-size control visible: at tight tolerances
    intervals get subdivided, at loose ones they are accepted whole."""
    seq = make_simple_sequence(two_atom_register, duration=240)
    sim = TpuEmulator.from_sequence(
        seq, sampling_rate=0.05, evaluation_times="Minimal"
    )
    ref = sim.run(
        solver=SolverType.DP5_SE, fused=False, substeps=8
    ).states.to_numpy()
    tight = sim.run(
        solver=SolverType.DP5_SE_ADAPTIVE, rtol=1e-12, atol=1e-14
    ).states.to_numpy()
    loose = sim.run(
        solver=SolverType.DP5_SE_ADAPTIVE, rtol=1e-3, atol=1e-3,
        max_iters=8,
    ).states.to_numpy()
    d_tight = np.abs(tight - ref).max()
    d_loose = np.abs(loose - ref).max()
    assert np.abs(tight - loose).max() > 0  # options actually plumbed
    assert d_tight < 1e-9
    assert d_loose > d_tight


def test_run_rejects_removed_nsteps(two_atom_register):
    """The dead reference-era `nsteps` argument is gone (it was accepted
    and ignored in round 2, VERDICT.md weak #3)."""
    sim = _sim(two_atom_register)
    with pytest.raises(TypeError):
        sim.run(nsteps=100)


def test_time_dist_grad_warnings(two_atom_register):
    """run(time_grad=True)/run(dist_grad=True) warn and point to the
    functional APIs (drop-in TorchEmulator users otherwise get silently
    inert flags, VERDICT.md weak #8)."""
    sim = _sim(two_atom_register)
    with pytest.warns(UserWarning, match="expectation_fn_of_times"):
        sim.run(time_grad=True)
    with pytest.warns(UserWarning, match="expectation_fn_of_dists"):
        sim.run(dist_grad=True)
    assert len(sim.dist_dict) == 1  # qq distance exposed
    # drop-in import alias (reference exports TorchEmulator)
    from pulser_diff_tpu import TorchEmulator, TpuEmulator

    assert TorchEmulator is TpuEmulator


def test_fused_optout_matches_f64_on_cpu(two_atom_register):
    """On CPU the DP5_SE default stays on the f64 XLA path (interpret
    mode would be slower); fused=False is also an explicit opt-out."""
    sim = _sim(two_atom_register)
    a = sim.run(solver=SolverType.DP5_SE).states.to_numpy()
    b = sim.run(solver=SolverType.DP5_SE, fused=False).states.to_numpy()
    assert np.abs(a - b).max() == 0.0
    assert a.dtype == np.float64 or a.dtype == np.complex128
