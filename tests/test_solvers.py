"""Physics parity tests: framework vs analytic forms and the scipy golden
model (the reference's analogue is QutipEmulator parity,
test_derivatives.py:55-127)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulser_diff_tpu import SolverType, TpuEmulator
from pulser_diff_tpu.core import (
    BlackmanWaveform,
    ConstantWaveform,
    CustomWaveform,
    InterpolatedWaveform,
    Microwave,
    MockDevice,
    Pulse,
    RampWaveform,
    Register,
    Sequence,
)

from .conftest import make_rich_sequence, make_simple_sequence
from .golden import golden_sesolve
from .metrics import ATOL_EXPV_DP, ATOL_EXPV_KRYLOV, ATOL_WF


def states_matrix(results):
    s = results.states  # Cplx (n_t, dim, 1)
    return np.asarray(jax.device_get(s.re)) + 1j * np.asarray(
        jax.device_get(s.im)
    )


def test_single_qubit_rabi_analytic():
    reg = Register({"q0": jnp.array([0.0, 0.0])})
    om = 2.0
    seq = make_simple_sequence(reg, duration=1000, omega=om, delta=0.0, phase=0.0)
    sim = TpuEmulator.from_sequence(seq, evaluation_times=0.2)
    res = sim.run()
    psi = states_matrix(res)[:, :, 0]
    t = np.asarray(jax.device_get(sim.evaluation_times))
    # |r> is index 0 in the ground-rydberg ordering
    pr = np.abs(psi[:, 0]) ** 2
    assert np.abs(pr - np.sin(om * t / 2) ** 2).max() < 1e-10


def test_detuned_rabi_analytic():
    reg = Register({"q0": jnp.array([0.0, 0.0])})
    om, det = 1.5, 2.0
    seq = make_simple_sequence(reg, duration=800, omega=om, delta=det, phase=0.0)
    sim = TpuEmulator.from_sequence(seq)
    res = sim.run()
    psi = states_matrix(res)[:, :, 0]
    t = np.asarray(jax.device_get(sim.evaluation_times))
    oeff = np.sqrt(om**2 + det**2)
    pr = (om / oeff) ** 2 * np.sin(oeff * t / 2) ** 2
    assert np.abs(np.abs(psi[:, 0]) ** 2 - pr).max() < 1e-9


@pytest.mark.parametrize("solver", [SolverType.DP5_SE, SolverType.KRYLOV_SE])
def test_two_atom_blockade_vs_golden(two_atom_register, solver):
    seq = make_rich_sequence(two_atom_register)
    sim = TpuEmulator.from_sequence(seq, evaluation_times=0.1)
    res = sim.run(solver=solver)
    psi = states_matrix(res)[:, :, 0]
    t = np.asarray(jax.device_get(sim.evaluation_times))
    ref = golden_sesolve(seq, MockDevice, t)
    atol = ATOL_WF if solver == SolverType.DP5_SE else 1e-5
    assert np.abs(psi - ref).max() < atol


def test_phase_matters(two_atom_register):
    seq = make_simple_sequence(two_atom_register, phase=1.0)
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    res = sim.run()
    psi = states_matrix(res)[-1, :, 0]
    t = np.asarray(jax.device_get(sim.evaluation_times))
    ref = golden_sesolve(seq, MockDevice, t)[-1]
    assert np.abs(psi - ref).max() < ATOL_WF


def test_local_channel_vs_golden(two_atom_register):
    seq = Sequence(two_atom_register, MockDevice)
    seq.declare_channel("loc", "rydberg_local", initial_target="q0")
    seq.add(Pulse.ConstantPulse(200, 2.0, -0.5, 0.2), "loc")
    seq.target("q1", "loc")
    seq.add(Pulse(BlackmanWaveform(220, np.pi), RampWaveform(220, 0.5, -0.5), 0.7), "loc")
    sim = TpuEmulator.from_sequence(seq, evaluation_times=0.2)
    res = sim.run()
    psi = states_matrix(res)[:, :, 0]
    t = np.asarray(jax.device_get(sim.evaluation_times))
    ref = golden_sesolve(seq, MockDevice, t)
    assert np.abs(psi - ref).max() < ATOL_WF


def test_three_level_all_basis_vs_golden(two_atom_register):
    seq = Sequence(two_atom_register, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.declare_channel("ram", "raman_global")
    seq.add(Pulse.ConstantPulse(150, 1.2, 0.3, 0.0), "ryd")
    seq.add(Pulse.ConstantPulse(150, 0.8, -0.4, 0.6), "ram")
    sim = TpuEmulator.from_sequence(seq, evaluation_times=0.3)
    assert sim.basis_name == "all"
    assert sim.dim == 3
    res = sim.run()
    psi = states_matrix(res)[:, :, 0]
    t = np.asarray(jax.device_get(sim.evaluation_times))
    ref = golden_sesolve(seq, MockDevice, t)
    assert np.abs(psi - ref).max() < ATOL_WF


def test_xy_mode_vs_golden():
    reg = Register(
        {"q0": jnp.array([0.0, 0.0]), "q1": jnp.array([8.0, 0.0]),
         "q2": jnp.array([0.0, 8.0])}
    )
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("mw", "microwave_global")
    seq.add(Pulse.ConstantPulse(300, 1.0, 0.5, 0.3), "mw")
    sim = TpuEmulator.from_sequence(seq, evaluation_times=0.2)
    assert sim.basis_name == "XY"
    res = sim.run()
    psi = states_matrix(res)[:, :, 0]
    t = np.asarray(jax.device_get(sim.evaluation_times))
    ref = golden_sesolve(seq, MockDevice, t)
    assert np.abs(psi - ref).max() < ATOL_WF


def test_expectation_vs_golden(two_atom_register):
    from pulser_diff_tpu.ops import total_magnetization

    seq = make_rich_sequence(two_atom_register)
    sim = TpuEmulator.from_sequence(seq, evaluation_times=0.1)
    res = sim.run()
    obs = total_magnetization(2)
    exp_val = res.expect([obs])[0]
    t = np.asarray(jax.device_get(sim.evaluation_times))
    ref_states = golden_sesolve(seq, MockDevice, t)
    obs_np = np.asarray(jax.device_get(obs.re))
    ref_exp = np.einsum("ti,ij,tj->t", ref_states.conj(), obs_np, ref_states)
    assert np.abs(np.asarray(jax.device_get(exp_val.re)) - ref_exp.real).max() < ATOL_EXPV_DP


def test_batched_initial_states(two_atom_register):
    """Batched kets (e.g. identity for gate evolution) evolve correctly."""
    from pulser_diff_tpu.cplx import Cplx

    seq = make_simple_sequence(two_atom_register)
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    eye = jnp.eye(4)
    sim.set_initial_state(Cplx(eye, jnp.zeros_like(eye)))
    res = sim.run()
    states = res.states  # (n_t, 4, 4) batch of kets
    U = np.asarray(jax.device_get(states.re))[-1] + 1j * np.asarray(
        jax.device_get(states.im)
    )[-1]
    # unitarity
    assert np.abs(U.conj().T @ U - np.eye(4)).max() < 1e-8
    t = np.asarray(jax.device_get(sim.evaluation_times))
    for b in range(4):
        e = np.zeros(4, dtype=complex)
        e[b] = 1.0
        ref = golden_sesolve(seq, MockDevice, t, psi0=e)[-1]
        assert np.abs(U[:, b] - ref).max() < ATOL_WF


def test_sampling_rate_subsample(two_atom_register):
    seq = make_rich_sequence(two_atom_register)
    sim = TpuEmulator.from_sequence(seq, sampling_rate=0.5, evaluation_times=0.2)
    res = sim.run()
    psi = states_matrix(res)[:, :, 0]
    t = np.asarray(jax.device_get(sim.evaluation_times))
    ref = golden_sesolve(seq, MockDevice, t)
    # subsampled Hamiltonian differs from the full one: loose tolerance
    assert np.abs(psi - ref).max() < 5e-2


def test_get_hamiltonian(two_atom_register):
    seq = make_simple_sequence(two_atom_register, omega=2.0, delta=-1.0, phase=0.5)
    sim = TpuEmulator.from_sequence(seq)
    H = sim.get_hamiltonian(100)
    Hnp = H.to_numpy()
    # hermitian
    assert np.abs(Hnp - Hnp.conj().T).max() < 1e-12
    from .golden import golden_h_of_t

    Href, _, _, _ = golden_h_of_t(seq, MockDevice)
    assert np.abs(Hnp - Href(0.1)).max() < 1e-9


def test_adaptive_dp5_vs_golden(two_atom_register):
    """Adaptive DP5 (bounded while_loop, the reference's solver style)."""
    seq = make_rich_sequence(two_atom_register)
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    res = sim.run(solver=SolverType.DP5_SE_ADAPTIVE)
    psi = states_matrix(res)[-1, :, 0]
    t = np.asarray(jax.device_get(sim.evaluation_times))
    ref = golden_sesolve(seq, MockDevice, t)[-1]
    assert np.abs(psi - ref).max() < 1e-6


def test_segmented_integration_matches_unsegmented():
    """sqrt-checkpointed two-level scan == plain scan (values + grads).
    Fresh interpreter: another of the large grad-of-scan compiles that
    crash XLA's CPU compiler late in a long-lived process."""
    from .conftest import run_isolated

    out = run_isolated("""
import jax
import jax.numpy as jnp
import numpy as np
from pulser_diff_tpu import SolverType, TpuEmulator
from pulser_diff_tpu.core import Register
from pulser_diff_tpu.cplx import Cplx
from pulser_diff_tpu.solvers import TimeGrid
from pulser_diff_tpu.solvers.solver import _integrate, _make_se_step
from tests.conftest import make_simple_sequence

reg = Register({"q0": jnp.array([-4.0, 0.0]), "q1": jnp.array([4.0, 0.0])})
seq = make_simple_sequence(reg, duration=100, omega=2.0, delta=-1.0)
sim = TpuEmulator.from_sequence(seq, evaluation_times=[0.03, 0.07])
h = sim._hamiltonian
grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
psi0 = sim.initial_state
p0 = Cplx(psi0.re.T.reshape(1, 2, 2), psi0.im.T.reshape(1, 2, 2))
step = _make_se_step(h._ham_data, SolverType.DP5_SE, 1, 12, 0.0)


def final_pop(psi_re, n_segments):
    p = Cplx(psi_re, p0.im)
    out = _integrate(step, p, grid, remat=True, n_segments=n_segments)
    return jnp.sum(out.re[-1] ** 2 + out.im[-1] ** 2), out


(v_plain, out_plain), g_plain = jax.value_and_grad(
    lambda x: final_pop(x, None), has_aux=True
)(p0.re)
(v_seg, out_seg), g_seg = jax.value_and_grad(
    lambda x: final_pop(x, 7), has_aux=True  # 7 does not divide n_steps
)(p0.re)
assert abs(float(v_plain) - float(v_seg)) < 1e-12
np.testing.assert_allclose(
    np.asarray(out_plain.re), np.asarray(out_seg.re), atol=1e-12
)
np.testing.assert_allclose(np.asarray(g_plain), np.asarray(g_seg), atol=1e-12)
print("SEGMENTED-OK")
""")
    assert "SEGMENTED-OK" in out


def test_mesolve_segmented_gradient():
    """Noise-rate gradient through the segmented mesolve path matches the
    unsegmented one.

    Runs in a fresh subprocess: this particular grad-of-nested-scan
    program reproducibly crashes XLA's CPU compiler when compiled late in
    a long-lived test process (SIGSEGV/SIGABRT), while always succeeding
    in a fresh interpreter.
    """
    import os
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from pulser_diff_tpu import TpuEmulator
from pulser_diff_tpu.core import MockDevice, Pulse, Register, Sequence
from pulser_diff_tpu.cplx import Cplx
from pulser_diff_tpu.simconfig import SimConfig
from pulser_diff_tpu.solvers import TimeGrid, mesolve

reg = Register({"q0": jnp.array([-4.0, 0.0]), "q1": jnp.array([4.0, 0.0])})
seq = Sequence(reg, MockDevice)
seq.declare_channel("ryd", "rydberg_global")
seq.add(Pulse.ConstantPulse(40, 2.0, 0.0, 0.5), "ryd")


def loss(rate, n_segments):
    cfg = SimConfig(noise="dephasing", dephasing_rate=rate)
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    h = sim._hamiltonian
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    psi0 = sim.initial_state
    rho0 = Cplx(
        psi0.re @ psi0.re.T + psi0.im @ psi0.im.T,
        psi0.im @ psi0.re.T - psi0.re @ psi0.im.T,
    )
    rhos = mesolve(
        h._ham_data, rho0, h._collapse_ops, h._size, h.dim, grid,
        n_segments=n_segments,
    )
    return rhos.re[-1, 0, 0]


r = jnp.asarray(0.25)
v0, g0 = jax.jit(jax.value_and_grad(lambda x: loss(x, 1)))(r)
v1, g1 = jax.jit(jax.value_and_grad(lambda x: loss(x, 3)))(r)
assert abs(float(v0) - float(v1)) < 1e-12, (float(v0), float(v1))
assert abs(float(g0) - float(g1)) < 1e-10, (float(g0), float(g1))
assert abs(float(g0)) > 1e-9
print("SEGMENTED-GRAD-OK")
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "SEGMENTED-GRAD-OK" in proc.stdout



def test_adaptive_dp5_gradient_matches_fixed_step():
    """Continuous-adjoint gradients through the adaptive solver agree
    with the fixed-step (discrete-autodiff) gradients and with finite
    differences (reference parity: autograd through adaptive pyqtorch
    DP5, backend.py:487-494).  Runs in a fresh interpreter (see
    conftest.run_isolated)."""
    from .conftest import run_isolated

    out = run_isolated("""
import jax.numpy as jnp
import numpy as np
from pulser_diff_tpu import SolverType, TpuEmulator
from pulser_diff_tpu.core import Register
from pulser_diff_tpu.cplx import Cplx
from pulser_diff_tpu.ops import total_magnetization
from pulser_diff_tpu.ops.linalg import expect as _expect
from pulser_diff_tpu.solvers import TimeGrid, sesolve
from tests.conftest import make_simple_sequence

reg = Register({"q0": jnp.array([-4.0, 0.0]), "q1": jnp.array([4.0, 0.0])})
obs = total_magnetization(2)


def make_loss(solver):
    def loss(omega):
        seq = make_simple_sequence(reg, duration=80, omega=omega, delta=-1.0)
        sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
        h = sim._hamiltonian
        grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
        psi0 = sim.initial_state
        p0 = Cplx(psi0.re.T.reshape(1, 2, 2), psi0.im.T.reshape(1, 2, 2))
        states = sesolve(h._ham_data, p0, grid, solver=solver, substeps=2)
        n_eval = states.re.shape[0]
        flat = Cplx(
            jnp.transpose(states.re.reshape(n_eval, 1, 4), (0, 2, 1)),
            jnp.transpose(states.im.reshape(n_eval, 1, 4), (0, 2, 1)),
        )
        return _expect(obs, flat).re[-1]

    return loss


import jax

om = jnp.asarray(1.7)
v_fix, g_fix = jax.value_and_grad(make_loss(SolverType.DP5_SE))(om)
v_ad, g_ad = jax.value_and_grad(make_loss(SolverType.DP5_SE_ADAPTIVE))(om)
assert abs(float(v_fix) - float(v_ad)) < 1e-7
assert abs(float(g_fix) - float(g_ad)) < 1e-6
eps = 1e-5
fd = (
    float(make_loss(SolverType.DP5_SE_ADAPTIVE)(om + eps))
    - float(make_loss(SolverType.DP5_SE_ADAPTIVE)(om - eps))
) / (2 * eps)
assert abs(float(g_ad) - fd) < 1e-5
print("ADAPTIVE-GRAD-OK")
""")
    assert "ADAPTIVE-GRAD-OK" in out


def test_adaptive_dp5_time_gradient():
    """Evaluation-time gradients flow through the adaptive path (the
    interval-endpoint cotangents of the continuous adjoint).  Runs in a
    fresh interpreter (see conftest.run_isolated)."""
    from .conftest import run_isolated

    out = run_isolated("""
import jax
import jax.numpy as jnp
import numpy as np
from pulser_diff_tpu import SolverType, TpuEmulator
from pulser_diff_tpu.core import Register
from pulser_diff_tpu.ops import total_magnetization
from tests.conftest import make_simple_sequence

reg = Register({"q0": jnp.array([-4.0, 0.0]), "q1": jnp.array([4.0, 0.0])})
seq = make_simple_sequence(reg, duration=100, omega=2.0, delta=0.0)
sim = TpuEmulator.from_sequence(seq, evaluation_times=[0.04, 0.08])
obs = total_magnetization(2)

fn_ad = sim.expectation_fn_of_times(
    obs, solver=SolverType.DP5_SE_ADAPTIVE, substeps=2
)
fn_fix = sim.expectation_fn_of_times(obs, solver=SolverType.DP5_SE)
times = sim.evaluation_times

g_ad = jax.grad(lambda ts: fn_ad(ts)[-1])(times)
g_fix = jax.grad(lambda ts: fn_fix(ts)[-1])(times)
np.testing.assert_allclose(np.asarray(g_ad), np.asarray(g_fix), atol=1e-6)
assert np.abs(np.asarray(g_fix)).max() > 1e-4
print("ADAPTIVE-TIME-GRAD-OK")
""")
    assert "ADAPTIVE-TIME-GRAD-OK" in out


def test_expm_sym_e1_jvp_degenerate():
    """The Daleckii-Krein custom JVP of the small Lanczos expm is exact
    and NaN-free even for an exactly degenerate spectrum (plain autodiff
    through eigh divides by eigenvalue gaps)."""
    from pulser_diff_tpu.solvers.solver import _expm_sym_e1

    # T with an exact 2x2 degenerate zero block (post-breakdown shape)
    T = jnp.asarray(
        [[1.3, 0.4, 0.0, 0.0],
         [0.4, -0.2, 0.0, 0.0],
         [0.0, 0.0, 0.0, 0.0],
         [0.0, 0.0, 0.0, 0.0]]
    )
    h = jnp.asarray(0.7)

    def loss(T_, h_):
        u_re, u_im = _expm_sym_e1(T_, h_)
        return jnp.sum(u_re**2) + jnp.sum(u_re * u_im)

    gT, gh = jax.grad(loss, argnums=(0, 1))(T, h)
    assert np.isfinite(np.asarray(gT)).all()
    assert np.isfinite(float(gh))
    # finite-difference checks (symmetric perturbations)
    eps = 1e-6
    for i, j in [(0, 0), (0, 1), (2, 2), (1, 2)]:
        dT = jnp.zeros_like(T).at[i, j].add(eps).at[j, i].add(eps)
        fd = (float(loss(T + dT / 2, h)) - float(loss(T - dT / 2, h))) / eps
        g_sym = float(gT[i, j] + gT[j, i]) / (2 if i == j else 1)
        assert abs(g_sym * (2 if i == j else 1) / 2 - fd / 2) < 1e-6, (i, j)
    fd_h = (float(loss(T, h + eps)) - float(loss(T, h - eps))) / (2 * eps)
    assert abs(float(gh) - fd_h) < 1e-6


def test_krylov_gradient_matches_dp5(two_atom_register):
    """Waveform-parameter gradients through KRYLOV_SE agree with DP5
    (the reference runs its gradient tests on both solvers,
    test_derivatives.py parametrization)."""
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.ops import total_magnetization
    from pulser_diff_tpu.solvers import TimeGrid, sesolve

    obs = total_magnetization(2)

    def make_loss(solver):
        def loss(omega):
            # tiny subsampled grid: the reverse-mode Lanczos trace is
            # compile-heavy on the 1-CPU CI machine
            seq = make_simple_sequence(
                two_atom_register, duration=48, omega=omega, delta=-0.6
            )
            sim = TpuEmulator.from_sequence(
                seq, sampling_rate=0.25, evaluation_times="Minimal"
            )
            h = sim._hamiltonian
            grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
            psi0 = sim.initial_state
            p0 = Cplx(
                psi0.re.T.reshape(1, 2, 2), psi0.im.T.reshape(1, 2, 2)
            )
            st = sesolve(
                h._ham_data, p0, grid, solver=solver, krylov_dim=6
            )
            pr = st.re[-1].reshape(4)
            pi = st.im[-1].reshape(4)
            return (
                jnp.einsum("i,ij,j->", pr, obs.re, pr)
                + jnp.einsum("i,ij,j->", pi, obs.re, pi)
            )

        return loss

    om = jnp.asarray(1.9)
    v_dp, g_dp = jax.value_and_grad(make_loss(SolverType.DP5_SE))(om)
    v_kr, g_kr = jax.value_and_grad(make_loss(SolverType.KRYLOV_SE))(om)
    assert np.isfinite(float(g_kr))
    assert abs(float(v_dp) - float(v_kr)) < 1e-6
    assert abs(float(g_dp) - float(g_kr)) < 1e-5


def test_krylov_f32_matches_f64(two_atom_register):
    """KRYLOV_SE_F32 (f32 Lanczos — on TPU the f64 recursion is
    VPU-emulated, measured 3.75 s vs the fused path's 30 ms at N=12)
    tracks the f64 Krylov solve at f32 rounding, runs in f32 end-to-end,
    and routes gradients back to f64 leaves."""
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.solvers import TimeGrid, sesolve

    seq = make_simple_sequence(
        two_atom_register, duration=48, omega=1.7, delta=-0.6
    )
    sim = TpuEmulator.from_sequence(
        seq, sampling_rate=0.25, evaluation_times="Minimal"
    )
    h = sim._hamiltonian
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    psi0 = sim.initial_state
    p0 = Cplx(psi0.re.T.reshape(1, 2, 2), psi0.im.T.reshape(1, 2, 2))
    hd = h._ham_data

    def loss(streams_re, solver):
        hd2 = hd._replace(row_streams=Cplx(streams_re, hd.row_streams.im))
        out = sesolve(hd2, p0, grid, solver=solver, krylov_dim=4)
        assert out.re.dtype == (
            jnp.float32
            if solver == SolverType.KRYLOV_SE_F32
            else jnp.float64
        )
        last = out[out.re.shape[0] - 1]
        return jnp.sum(last.re**2 - last.im)

    s0 = hd.row_streams.re
    v64, g64 = jax.value_and_grad(
        lambda s: loss(s, SolverType.KRYLOV_SE)
    )(s0)
    v32, g32 = jax.value_and_grad(
        lambda s: loss(s, SolverType.KRYLOV_SE_F32)
    )(s0)
    assert g32.dtype == jnp.float64
    assert abs(float(v64 - v32)) < 5e-6
    scale = float(jnp.abs(g64).max())
    assert float(jnp.abs(g64 - g32).max()) < 1e-4 * scale + 1e-8


def test_krylov_f32_near_eigenstate_gradients():
    """Regression (round 4): KRYLOV_SE_F32 gradients through an evolution
    whose amplitude ramps up from ~0 — the all-ground start is then a
    near-eigenstate of the (diagonal-dominated) Hamiltonian, so the early
    Lanczos residual norms beta are small relative to the spectral scale.
    Reverse-mode THROUGH the f32 Lanczos recursion overflows to inf/NaN
    here (the ~1/beta basis-rotation sensitivities only cancel against
    the matching small expm weights in f64; minimal CPU repro: 9 atoms at
    6 um spacing, 120-step grid — N=12 at 10 um on the bench_scaling
    workload is the production shape).  The continuous-adjoint custom
    VJP (solver._krylov_expm_cadj) differentiates the EXACT map instead
    and must match the f64 Krylov discrete adjoint.  The fixed-step DP5
    stepper diverges outright at this interaction scale (||H|| past its
    stability limit at 4 ns steps) — the exponential integrator is the
    only stable fixed-step mode, which is why its gradients must work."""
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.ops.linalg import _interpolate_sine_np
    from pulser_diff_tpu.solvers import TimeGrid, sesolve

    dur, n_params = 480, 4
    coords = [(6.0 * (i % 4), 6.0 * (i // 4)) for i in range(9)]
    reg = Register.from_coordinates(coords, prefix="q")
    M = jnp.asarray(_interpolate_sine_np(n_params, dur))

    def make_loss(solver):
        def loss(p):
            seq = Sequence(reg, MockDevice)
            seq.declare_channel("ryd", "rydberg_global")
            amp = seq.declare_variable("amp", size=dur)
            seq.add(
                Pulse(
                    CustomWaveform(amp, duration=dur),
                    ConstantWaveform(dur, -2.0),
                    0.0,
                ),
                "ryd",
            )
            built = seq.build(amp=M @ p)
            sim = TpuEmulator.from_sequence(
                built, sampling_rate=0.25, evaluation_times="Minimal"
            )
            h = sim._hamiltonian
            grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
            psi0 = sim.initial_state
            p0 = Cplx(
                psi0.re.T.reshape(1, 16, 32), psi0.im.T.reshape(1, 16, 32)
            )
            st = sesolve(h._ham_data, p0, grid, solver=solver)
            last = st[st.re.shape[0] - 1]
            # all-ground population ([r, g] ordering -> last ket index)
            return last.re[0, -1, -1] ** 2 + last.im[0, -1, -1] ** 2

        return loss

    p = jnp.linspace(1.0, 3.0, n_params)
    v64, g64 = jax.value_and_grad(make_loss(SolverType.KRYLOV_SE))(p)
    v32, g32 = jax.value_and_grad(make_loss(SolverType.KRYLOV_SE_F32))(p)
    assert np.isfinite(np.asarray(g32)).all()
    assert abs(float(v64) - float(v32)) < 1e-4
    scale = float(jnp.abs(g64).max())
    assert float(jnp.abs(g64 - g32).max()) < 1e-3 * scale + 1e-8


def test_f32_solver_matches_f64(two_atom_register):
    """DP5_SE_F32 (the HBM-resident gradient path for states past the
    fused kernels' VMEM ceiling, N >= 18) tracks the f64 stepper at f32
    rounding: values ~1e-6, gradients routed back to the caller's f64
    leaves.  Also pins that the stepper really runs in f32 (a silent
    numpy-scalar promotion to f64 would make this mode a slow no-op)."""
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.solvers import TimeGrid, sesolve

    seq = make_rich_sequence(two_atom_register)
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    h = sim._hamiltonian
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    da, db = h.dim**h._a, h.dim**h._b
    psi0 = sim.initial_state
    p0 = Cplx(psi0.re.T.reshape(1, da, db), psi0.im.T.reshape(1, da, db))
    hd = h._ham_data

    def loss(streams_re, solver):
        hd2 = hd._replace(
            row_streams=Cplx(streams_re, hd.row_streams.im)
        )
        out = sesolve(hd2, p0, grid, solver=solver)
        assert out.re.dtype == (
            jnp.float32 if solver == SolverType.DP5_SE_F32 else jnp.float64
        )
        last = out[out.re.shape[0] - 1]
        return jnp.sum(last.re**2 - last.im)

    s0 = hd.row_streams.re
    v64, g64 = jax.value_and_grad(
        lambda s: loss(s, SolverType.DP5_SE)
    )(s0)
    v32, g32 = jax.value_and_grad(
        lambda s: loss(s, SolverType.DP5_SE_F32)
    )(s0)
    assert g32.dtype == jnp.float64  # cotangents cast back to the leaves
    assert abs(float(v64 - v32)) < 5e-6
    scale = float(jnp.abs(g64).max())
    assert float(jnp.abs(g64 - g32).max()) < 1e-4 * scale + 1e-8


def test_f32_mesolve_matches_f64(two_atom_register):
    """DP5_ME_F32 (f32 Lindblad stepper — halves rho's footprint for the
    sharded_mesolve scaling path) tracks the f64 master equation at f32
    rounding on both the superop and factored RHS forms."""
    from pulser_diff_tpu import SimConfig
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.solvers import TimeGrid, mesolve

    cfg = SimConfig(noise="dephasing", dephasing_rate=0.3)
    seq = make_simple_sequence(two_atom_register, duration=80)
    sim = TpuEmulator.from_sequence(
        seq, config=cfg, evaluation_times="Minimal"
    )
    h = sim._hamiltonian
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    psi0 = sim.initial_state
    rho0 = Cplx(
        psi0.re @ psi0.re.T + psi0.im @ psi0.im.T,
        psi0.im @ psi0.re.T - psi0.re @ psi0.im.T,
    )
    for superop in (True, False):
        r64 = mesolve(
            h._ham_data, rho0, h._collapse_ops, h._size, h.dim, grid,
            solver=SolverType.DP5_ME, superop=superop,
        )
        r32 = mesolve(
            h._ham_data, rho0, h._collapse_ops, h._size, h.dim, grid,
            solver=SolverType.DP5_ME_F32, superop=superop,
        )
        assert r32.re.dtype == jnp.float32
        d = np.abs(
            np.asarray(jax.device_get(r64.re))
            - np.asarray(jax.device_get(r32.re))
        ).max()
        assert d < 5e-6, (superop, d)

    # gradient through the f32 ME path routes back to f64 leaves
    def loss(streams_re, solver):
        from pulser_diff_tpu.cplx import Cplx as _C

        hd2 = h._ham_data._replace(
            row_streams=_C(streams_re, h._ham_data.row_streams.im)
        )
        out = mesolve(
            hd2, rho0, h._collapse_ops, h._size, h.dim, grid, solver=solver
        )
        last = out[out.re.shape[0] - 1]
        return jnp.sum(last.re**2)

    s0 = h._ham_data.row_streams.re
    g64 = jax.grad(lambda s: loss(s, SolverType.DP5_ME))(s0)
    g32 = jax.grad(lambda s: loss(s, SolverType.DP5_ME_F32))(s0)
    assert g32.dtype == jnp.float64
    scale = float(jnp.abs(g64).max()) + 1e-12
    assert float(jnp.abs(g64 - g32).max()) < 1e-4 * scale + 1e-8


def test_me_superop_remat_gates_on_liouvillian_size():
    """Form-aware mesolve remat (round-5 hardware OOM regression): the
    superop form's reverse-mode residuals scale with the (dim^2, dim^2)
    Liouvillian per stage, not the rho state — at dim 32 / 166 steps
    storing them is ~16 GB (measured 20 GB HBM OOM on hardware), so the
    auto decision must checkpoint; the dense form at the same size need
    not."""
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.solvers.solver import _me_auto_remat

    dim = 32
    rho = Cplx(jnp.zeros((dim, dim)), jnp.zeros((dim, dim)))
    assert _me_auto_remat("superop", dim, rho, n_steps=166) is True
    assert _me_auto_remat("dense", dim, rho, n_steps=166) is False
    # tiny superop (dim 8) stays residual-stored (fast backward)
    rho8 = Cplx(jnp.zeros((8, 8)), jnp.zeros((8, 8)))
    assert _me_auto_remat("superop", 8, rho8, n_steps=166) is False
    # dense: dim 256 (N=8, ~2 GB residuals) ran on hardware without
    # remat; dim 512 (N=9, ~8 GB) device-faulted — the gate must flip
    # exactly between them (f64 itemsize)
    r256 = Cplx(jnp.zeros((256, 256), jnp.float64),
                jnp.zeros((256, 256), jnp.float64))
    r512 = Cplx(jnp.zeros((512, 512), jnp.float64),
                jnp.zeros((512, 512), jnp.float64))
    assert _me_auto_remat("dense", 256, r256, n_steps=166) is False
    assert _me_auto_remat("dense", 512, r512, n_steps=166) is True
