"""Gradient correctness vs independent oracles (reference
test_derivatives.py strategy: central finite differences for parameters &
coordinates, quintic smoothing spline for time derivatives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulser_diff_tpu import SolverType, TpuEmulator
from pulser_diff_tpu.core import (
    BlackmanWaveform,
    ConstantWaveform,
    MockDevice,
    Pulse,
    RampWaveform,
    Register,
    Sequence,
)
from pulser_diff_tpu.derivative import deriv_param, deriv_time
from pulser_diff_tpu.ops import total_magnetization

from .metrics import (
    ATOL_DERIV_COORD,
    ATOL_DERIV_PARAM,
    ATOL_DERIV_TIME,
    EPS_PARAM,
)

OBS = total_magnetization(2)


def _exp_final(seq_builder, value):
    """Expectation of total magnetization at the final time, as a scalar
    function of one parameter value — the differentiable pipeline:
    value -> sequence -> samples -> Hamiltonian -> solve -> expectation."""
    from pulser_diff_tpu.ops.linalg import expect as _expect

    seq = seq_builder(value)
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    res = sim.run()
    vals = res.expect([OBS])[0]
    return vals.re[-1]


def _fd_grad(f, x0, eps=EPS_PARAM):
    return (f(x0 + eps) - f(x0 - eps)) / (2 * eps)


@pytest.fixture
def reg2():
    return Register({"q0": jnp.array([-4.0, 0.0]), "q1": jnp.array([4.0, 0.0])})


def _const_seq(reg):
    def build(omega):
        seq = Sequence(reg, MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(Pulse.ConstantPulse(220, omega, -0.7, 0.4), "ryd")
        return seq

    return build


def _area_seq(reg):
    def build(area):
        seq = Sequence(reg, MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            Pulse(BlackmanWaveform(240, area), RampWaveform(240, -1.0, 1.0), 0.1),
            "ryd",
        )
        return seq

    return build


def _phase_seq(reg):
    def build(phase):
        seq = Sequence(reg, MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(Pulse.ConstantPulse(200, 1.8, 0.0, 0.0), "ryd")
        seq.add(Pulse.ConstantPulse(200, 1.8, 0.3, phase), "ryd")
        return seq

    return build


@pytest.mark.parametrize(
    "builder,x0",
    [(_const_seq, 1.7), (_area_seq, np.pi / 2), (_phase_seq, 0.8)],
    ids=["const-omega", "blackman-area", "phase"],
)
def test_param_gradient_vs_fd(reg2, builder, x0):
    b = builder(reg2)
    f = lambda v: _exp_final(b, v)
    g_auto = jax.grad(f)(jnp.asarray(x0))
    g_fd = _fd_grad(lambda v: float(f(jnp.asarray(v))), x0)
    assert abs(float(g_auto) - g_fd) < ATOL_DERIV_PARAM


def test_ramp_endpoint_gradients_vs_fd(reg2):
    def f2(start, stop):
        seq = Sequence(reg2, MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(
            Pulse(
                ConstantWaveform(210, 1.5),
                RampWaveform(210, start, stop),
                0.2,
            ),
            "ryd",
        )
        sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
        vals = sim.run().expect([OBS])[0]
        return vals.re[-1]

    g = jax.grad(f2, argnums=(0, 1))(jnp.asarray(-0.9), jnp.asarray(1.1))
    for i, x0 in enumerate([-0.9, 1.1]):
        def f1(v):
            args = [-0.9, 1.1]
            args[i] = v
            return float(f2(jnp.asarray(args[0]), jnp.asarray(args[1])))

        assert abs(float(g[i]) - _fd_grad(f1, x0)) < ATOL_DERIV_PARAM


def test_coordinate_gradient_vs_fd():
    def f(x1):
        reg = Register(
            {"q0": jnp.array([-4.0, 0.0]), "q1": jnp.stack([x1, jnp.asarray(0.0)])}
        )
        seq = Sequence(reg, MockDevice)
        seq.declare_channel("ryd", "rydberg_global")
        seq.add(Pulse.ConstantPulse(220, 2.0, 0.0, 0.0), "ryd")
        sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
        vals = sim.run().expect([OBS])[0]
        return vals.re[-1]

    g_auto = float(jax.grad(f)(jnp.asarray(4.0)))
    g_fd = _fd_grad(lambda v: float(f(jnp.asarray(v))), 4.0, eps=1e-5)
    assert abs(g_auto - g_fd) < ATOL_DERIV_COORD


def test_deriv_time_vs_spline(reg2):
    """df/dt from autodiff vs a quintic smoothing-spline derivative of the
    expectation trace (reference test_derivatives.py:132-171)."""
    from scipy.interpolate import UnivariateSpline

    seq = Sequence(reg2, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(Pulse.ConstantPulse(150, 2.0, -0.5, 0.0), "ryd")
    seq.add(Pulse.ConstantPulse(150, 1.0, 0.5, 0.4), "ryd")
    sim = TpuEmulator.from_sequence(seq)  # Full eval times
    base_times = sim.evaluation_times

    h = sim._hamiltonian
    from pulser_diff_tpu.solvers import TimeGrid, sesolve
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.ops.linalg import expect as _expect

    grid0 = TimeGrid.make(h.sampling_times, base_times)

    def f(times):
        grid = grid0.with_values(times)
        da, db = h.dim**h._a, h.dim**h._b
        psi0 = sim.initial_state
        p = Cplx(psi0.re.T.reshape(1, da, db), psi0.im.T.reshape(1, da, db))
        states = sesolve(h._ham_data, p, grid)
        n_eval = states.re.shape[0]
        st = Cplx(
            states.re.reshape(n_eval, da * db, 1),
            states.im.reshape(n_eval, da * db, 1),
        )
        return _expect(OBS, st).re

    dfdt = deriv_time(f, base_times, pulse_endtimes=sim.endtimes)
    t_np = np.asarray(jax.device_get(base_times))
    f_np = np.asarray(jax.device_get(f(base_times)))
    spl = UnivariateSpline(t_np, f_np, k=5, s=0)
    ref = spl.derivative()(t_np)
    err = np.abs(np.asarray(jax.device_get(dfdt)) - ref)
    # compare away from the boundaries (spline edge effects)
    assert err[3:-3].mean() < ATOL_DERIV_TIME


def test_deriv_param_onehot(reg2):
    b = _const_seq(reg2)

    def f(omega):
        seq = b(omega)
        sim = TpuEmulator.from_sequence(seq, evaluation_times=0.1)
        return sim.run().expect([OBS])[0].re

    om = jnp.asarray(1.7)
    seq = b(om)
    sim = TpuEmulator.from_sequence(seq, evaluation_times=0.1)
    times = sim.evaluation_times
    (g,) = deriv_param(f, [om], times=times, t=None)
    g_ref = jax.grad(lambda v: f(v)[-1])(om)
    assert abs(float(g) - float(g_ref)) < 1e-12


def test_distance_gradient_vs_coordinate_gradient(reg2):
    """d<O>/d(r_q0q1) via the dist-override path must match the chain rule
    through coordinates (reference dist_grad, backend.py:456-460)."""
    from pulser_diff_tpu.core import MockDevice, Pulse, Sequence

    seq = Sequence(reg2, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(Pulse.ConstantPulse(200, 2.0, 0.0, 0.0), "ryd")
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    fn = sim.expectation_fn_of_dists(OBS)
    d0 = jnp.asarray([8.0])
    grad_d = jax.grad(lambda d: fn(d)[-1])(d0)

    # coordinate route: move q1 along x; dr/dx1 = 1 at this geometry
    def f_coord(x1):
        reg = Register(
            {"q0": jnp.array([-4.0, 0.0]), "q1": jnp.stack([x1, jnp.asarray(0.0)])}
        )
        s2 = Sequence(reg, MockDevice)
        s2.declare_channel("ryd", "rydberg_global")
        s2.add(Pulse.ConstantPulse(200, 2.0, 0.0, 0.0), "ryd")
        sim2 = TpuEmulator.from_sequence(s2, evaluation_times="Minimal")
        return sim2.run().expect([OBS])[0].re[-1]

    grad_x = jax.grad(f_coord)(jnp.asarray(4.0))
    assert abs(float(grad_d[0]) - float(grad_x)) < 1e-9


def test_expectation_fn_of_times_matches_deriv_time(reg2):
    from pulser_diff_tpu.core import MockDevice, Pulse, Sequence

    seq = Sequence(reg2, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(Pulse.ConstantPulse(150, 2.0, -0.5, 0.0), "ryd")
    sim = TpuEmulator.from_sequence(seq)
    fn = sim.expectation_fn_of_times(OBS)
    dfdt = deriv_time(fn, sim.evaluation_times)
    # compare against a central difference of the trace itself
    t = np.asarray(jax.device_get(sim.evaluation_times))
    f = np.asarray(jax.device_get(fn(sim.evaluation_times)))
    mid = (f[2:] - f[:-2]) / (t[2:] - t[:-2])
    err = np.abs(np.asarray(jax.device_get(dfdt))[1:-1] - mid)
    assert err[2:-2].mean() < 5e-2
