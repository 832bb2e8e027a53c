"""QuantumModel tests: parameter registration, constraint clamping,
duration bookkeeping and end-to-end training convergence (reference
test_model.py strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pulser_diff_tpu.core import (
    ConstantWaveform,
    CustomWaveform,
    MockDevice,
    Pulse,
    Register,
    Sequence,
)
from pulser_diff_tpu.model import QuantumModel
from pulser_diff_tpu.ops import interpolate_sine, total_magnetization

from .metrics import ATOL_OPTIM


@pytest.fixture
def reg2():
    return Register({"q0": jnp.array([-4.0, 0.0]), "q1": jnp.array([4.0, 0.0])})


def _param_seq(reg):
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    omega = seq.declare_variable("omega")
    det = seq.declare_variable("det")
    seq.add(Pulse.ConstantPulse(240, omega, det, 0.0), "ryd")
    return seq


def test_param_registration(reg2):
    seq = _param_seq(reg2)
    model = QuantumModel(
        seq, {"omega": jnp.asarray(1.5), "det": jnp.asarray(-0.5)}
    )
    assert set(model.params) == {"omega", "det"}
    assert not model.optimize_duration
    assert model.built_seq is not None
    assert not model.built_seq.is_parametrized()
    # nn.Module-parity accessors (reference inherits them from torch)
    named = dict(model.named_parameters())
    assert set(named) == {"omega", "det"}
    assert all(v is model.params[k] for k, v in named.items())
    assert len(list(model.parameters())) == 2


def test_missing_param_value(reg2):
    seq = _param_seq(reg2)
    with pytest.raises((ValueError, TypeError)):
        QuantumModel(seq, {"omega": jnp.asarray(1.5)}).expectation()


def test_unparametrized_passthrough(reg2):
    seq = Sequence(reg2, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(Pulse.ConstantPulse(240, 2.0, 0.0, 0.0), "ryd")
    model = QuantumModel(seq)
    assert model.built_seq is seq
    times, states = model.forward()
    assert states.re.shape[0] == len(np.asarray(jax.device_get(times)))


def test_constraint_clamping(reg2):
    seq = _param_seq(reg2)
    model = QuantumModel(
        seq,
        {"omega": jnp.asarray(5.0), "det": jnp.asarray(0.0)},
        constraints={"omega": {"min": 0.0, "max": 2.0}},
    )
    model.check_constraints()
    assert float(model.params["omega"]) == 2.0


def test_duration_bookkeeping(reg2):
    seq = Sequence(reg2, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    dur = seq.declare_variable("dur", dtype=int)
    omega = seq.declare_variable("omega")
    seq.add(Pulse.ConstantPulse(dur[0], omega, 0.0, 0.0), "ryd")
    model = QuantumModel(
        seq, {"dur": jnp.asarray(0.24), "omega": jnp.asarray(1.5)}
    )
    assert model.optimize_duration
    # 240 ns + 5 padding, rounded up to the 64-ns grid chunk
    assert model._t_max >= 245
    amp, det, phase = model._opt_duration_samples(model.params)
    # plateau amplitude ~ omega inside the pulse, ~0 outside
    assert abs(float(amp[120]) - 1.5) < 1e-3
    assert abs(float(amp[-1])) < 0.2


def test_expectation_matches_direct_run(reg2):
    seq = _param_seq(reg2)
    model = QuantumModel(
        seq, {"omega": jnp.asarray(1.5), "det": jnp.asarray(-0.5)}
    )
    times, exp_model = model.expectation()
    fn = model.expectation_fn()
    times2, exp_fn = fn(model.params)
    assert np.allclose(
        np.asarray(jax.device_get(exp_model.re)),
        np.asarray(jax.device_get(exp_fn)),
        atol=1e-9,
    )


def test_training_pulse_params(reg2):
    """Optimize omega/det to reach a target magnetization (reference
    test_model.py:379-429).  The target is generated from a known
    parameter setting so a solution exists."""
    seq = _param_seq(reg2)
    model = QuantumModel(
        seq, {"omega": jnp.asarray(1.0), "det": jnp.asarray(0.0)}
    )
    _, v_target = model.expectation_fn()(
        {"omega": jnp.asarray(1.6), "det": jnp.asarray(-0.4)}
    )
    target = float(v_target[-1])

    def loss(times, vals):
        return (vals[-1] - target) ** 2

    losses = model.fit(loss, epochs=120, optimizer=optax.adam(5e-2))
    assert losses[-1] < ATOL_OPTIM**2


def test_fit_steps_per_call_matches_per_step(reg2):
    """The on-device scanned loop (steps_per_call>1) must reproduce the
    per-step loop exactly: same losses, same final params — including a
    non-divisible epoch count (10 = 2 full chunks of 4 + remainder 2)
    and constraint clamping inside the scan."""

    def build():
        seq = _param_seq(reg2)
        return QuantumModel(
            seq,
            {"omega": jnp.asarray(1.0), "det": jnp.asarray(0.0)},
            constraints={"omega": {"min": 0.5, "max": 1.2}},
        )

    def loss(times, vals):
        return (vals[-1] - 0.3) ** 2

    m1 = build()
    losses1 = m1.fit(loss, epochs=10, optimizer=optax.adam(5e-2))
    m2 = build()
    calls = []
    losses2 = m2.fit(
        loss,
        epochs=10,
        optimizer=optax.adam(5e-2),
        steps_per_call=4,
        callback=lambda ep, l, p: calls.append(ep),
    )
    assert np.allclose(losses1, losses2, rtol=1e-10, atol=1e-12)
    for k in m1.params:
        assert np.allclose(
            np.asarray(m1.params[k]), np.asarray(m2.params[k]), atol=1e-12
        )
    assert calls == [3, 7, 9]  # chunk boundaries
    assert 0.5 - 1e-9 <= float(m2.params["omega"]) <= 1.2 + 1e-9


def test_training_with_constraints(reg2):
    seq = _param_seq(reg2)
    model = QuantumModel(
        seq,
        {"omega": jnp.asarray(1.0), "det": jnp.asarray(0.0)},
        constraints={"omega": {"min": 0.5, "max": 3.0}},
    )
    target = 0.0

    def loss(times, vals):
        return (vals[-1] - target) ** 2

    model.fit(loss, epochs=40, optimizer=optax.adam(5e-2))
    assert 0.5 - 1e-9 <= float(model.params["omega"]) <= 3.0 + 1e-9


def test_training_coordinates(reg2):
    """Optimize a qubit coordinate (reference test_model.py:477-519)."""
    seq = Sequence(reg2, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(Pulse.ConstantPulse(200, 2.0, 0.0, 0.0), "ryd")
    model = QuantumModel(seq, {"q1": jnp.array([4.0, 0.0])})
    assert model.reconstruct_register
    _, v_target = model.expectation_fn()({"q1": jnp.array([4.4, 0.1])})
    target = float(v_target[-1])

    def loss(times, vals):
        return (vals[-1] - target) ** 2

    losses = model.fit(loss, epochs=120, optimizer=optax.adam(2e-2))
    assert losses[-1] < 1e-3


def test_training_durations(reg2):
    """Optimize pulse duration via tanh envelopes (reference
    test_model.py:434-472)."""
    seq = Sequence(reg2, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    dur = seq.declare_variable("dur", dtype=int)
    seq.add(Pulse.ConstantPulse(dur[0], 2.0, 0.0, 0.0), "ryd")
    model = QuantumModel(seq, {"dur": jnp.asarray(0.2)})
    obs = total_magnetization(2)
    _, v_target = model.expectation_fn(obs)({"dur": jnp.asarray(0.17)})
    target = float(v_target[-1])

    def loss(times, vals):
        return (vals[-1] - target) ** 2

    losses = model.fit(loss, epochs=150, optimizer=optax.adam(5e-3), obs=obs)
    assert losses[-1] < 1e-3
    # duration actually moved
    assert abs(float(model.params["dur"]) - 0.2) > 1e-3


def test_training_custom_waveform(reg2):
    """Custom-waveform callable params (reference test_model.py:586-651):
    sine-interpolated amplitude samples from trainable control values."""
    duration = 256
    seq = Sequence(reg2, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    amp_samples = seq.declare_variable("amp_samples", size=duration)
    seq.add(
        Pulse(
            CustomWaveform(amp_samples, duration=duration),
            ConstantWaveform(duration, 0.0),
            0.0,
        ),
        "ryd",
    )
    interp = interpolate_sine(5, duration)

    def wf_fn(values):
        return interp @ values

    model = QuantumModel(
        seq, {"amp_samples": ((jnp.ones(5),), wf_fn)}
    )
    assert set(model.params) == {"amp_samples_0"}
    _, v_target = model.expectation_fn()(
        {"amp_samples_0": 1.5 * jnp.ones(5)}
    )
    target = float(v_target[-1])

    def loss(times, vals):
        return (vals[-1] - target) ** 2

    losses = model.fit(loss, epochs=120, optimizer=optax.adam(5e-2))
    assert losses[-1] < ATOL_OPTIM**2


def test_population_matches_individual(reg2):
    """expectation_population_fn: the vmapped XLA fallback (CPU default)
    must equal per-candidate expectation_fn exactly, and the fused MC
    route (explicit PALLAS solver, interpret mode on CPU) must match at
    the f32-kernel bar."""
    from pulser_diff_tpu.solvers import SolverType

    seq = _param_seq(reg2)
    model = QuantumModel(
        seq, {"omega": jnp.asarray(1.0), "det": jnp.asarray(0.0)}
    )
    stack = {
        "omega": jnp.asarray([1.0, 1.4, 2.1]),
        "det": jnp.asarray([0.0, -0.4, 0.3]),
    }
    fn1 = model.expectation_fn()
    pfn = model.expectation_population_fn()
    _, vals = jax.jit(pfn)(stack)
    assert vals.shape[0] == 3
    for i in range(3):
        _, vi = fn1({"omega": stack["omega"][i], "det": stack["det"][i]})
        assert np.allclose(
            np.asarray(jax.device_get(vals[i])),
            np.asarray(jax.device_get(vi)),
            atol=1e-9,
        )

    model_f = QuantumModel(
        _param_seq(reg2),
        {"omega": jnp.asarray(1.0), "det": jnp.asarray(0.0)},
        solver=SolverType.DP5_PALLAS,
    )
    _, vals_f = jax.jit(model_f.expectation_population_fn())(stack)
    assert np.abs(
        np.asarray(jax.device_get(vals_f)) - np.asarray(jax.device_get(vals))
    ).max() < 5e-5


def test_population_gradients_independent(reg2):
    """The summed population loss's gradient must separate into the
    per-candidate gradients (candidates don't interact), through the
    fused MC kernel's adjoint."""
    from pulser_diff_tpu.solvers import SolverType

    seq = _param_seq(reg2)
    model = QuantumModel(
        seq,
        {"omega": jnp.asarray(1.0), "det": jnp.asarray(0.0)},
        solver=SolverType.DP5_PALLAS,
    )
    pfn = model.expectation_population_fn()
    fn1 = model.expectation_fn()
    stack = {
        "omega": jnp.asarray([1.1, 1.7]),
        "det": jnp.asarray([-0.2, 0.4]),
    }

    def pop_loss(s):
        _, vals = pfn(s)
        return jnp.sum(vals[:, -1] ** 2)

    g = jax.jit(jax.grad(pop_loss))(stack)

    def one_loss(om, de):
        _, v = fn1({"omega": om, "det": de})
        return v[-1] ** 2

    for i in range(2):
        gi = jax.grad(one_loss, argnums=(0, 1))(
            stack["omega"][i], stack["det"][i]
        )
        assert abs(float(g["omega"][i]) - float(gi[0])) < 5e-4
        assert abs(float(g["det"][i]) - float(gi[1])) < 5e-4


def test_fit_population_improves(reg2):
    """Multi-start training: every candidate's loss decreases, the best
    final candidate is loaded into model.params."""
    seq = _param_seq(reg2)
    model = QuantumModel(
        seq, {"omega": jnp.asarray(1.0), "det": jnp.asarray(0.0)}
    )
    _, v_target = model.expectation_fn()(
        {"omega": jnp.asarray(1.6), "det": jnp.asarray(-0.4)}
    )
    target = float(v_target[-1])

    def loss(times, vals):
        return (vals[-1] - target) ** 2

    stack = {
        "omega": jnp.asarray([0.8, 1.2, 1.9]),
        "det": jnp.asarray([0.2, -0.1, -0.6]),
    }
    losses, final_stack = model.fit_population(
        loss, stack, epochs=60, optimizer=optax.adam(5e-2), steps_per_call=20
    )
    assert len(losses) == 60 and losses[0].shape == (3,)
    assert losses[-1].min() < losses[0].min()
    # the loaded params reproduce the best candidate's loss
    _, v = model.expectation_fn()(model.params)
    assert (float(v[-1]) - target) ** 2 <= losses[-1].min() + 1e-9


def test_trainable_phase_shift_gradient(reg2):
    """A phase_shift with a variable phi flows through build -> sampler
    -> solve differentiably; d<O>/dphi matches central finite
    differences (reference-style FD oracle, eps 1e-4)."""
    seq = Sequence(reg2, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    phi = seq.declare_variable("phi")
    seq.add(Pulse.ConstantPulse(160, 1.5, -0.5, 0.0), "ryd")
    seq.phase_shift(phi, *reg2.qubit_ids, basis="ground-rydberg")
    seq.add(Pulse.ConstantPulse(160, 1.5, -0.5, 0.0), "ryd")
    model = QuantumModel(seq, {"phi": jnp.asarray(0.7)})
    fn = model.expectation_fn()

    def loss(p):
        _, v = fn(p)
        return v[-1]

    g = jax.grad(lambda p: loss(p))({"phi": jnp.asarray(0.7)})["phi"]
    eps = 1e-4
    fd = (
        float(loss({"phi": jnp.asarray(0.7 + eps)}))
        - float(loss({"phi": jnp.asarray(0.7 - eps)}))
    ) / (2 * eps)
    assert abs(float(g) - fd) < 1e-6
    assert abs(float(g)) > 1e-4  # the phase actually matters


def test_trainable_eom_pulse_phase(reg2):
    """A parametrized EOM pulse phase flows through build -> EOM schedule
    -> solve differentiably (gradient matches finite differences)."""
    from dataclasses import replace as _replace

    from pulser_diff_tpu.core import MockDevice
    from pulser_diff_tpu.core.eom import BLUE, RED, RydbergEOM

    eom = RydbergEOM(
        mod_bandwidth=40.0,
        limiting_beam=RED,
        max_limiting_amp=2 * np.pi * 10.0,
        intermediate_detuning=2 * np.pi * 700.0,
        controlled_beams=(BLUE,),
    )
    chans = tuple(
        _replace(ch, eom_config=eom) if ch.name == "rydberg_global" else ch
        for ch in MockDevice.channels
    )
    dev = _replace(MockDevice, channels=chans, name="EomMock")
    seq = Sequence(reg2, dev)
    seq.declare_channel("ryd", "rydberg_global")
    ph = seq.declare_variable("ph")
    seq.enable_eom_mode("ryd", amp_on=2.0, detuning_on=0.0)
    seq.add_eom_pulse("ryd", 120, 0.0)
    seq.delay(40, "ryd")
    seq.add_eom_pulse("ryd", 120, ph)
    seq.disable_eom_mode("ryd")
    model = QuantumModel(seq, {"ph": jnp.asarray(0.4)})
    fn = model.expectation_fn()

    def loss(p):
        _, v = fn(p)
        return v[-1]

    g = float(jax.grad(loss)({"ph": jnp.asarray(0.4)})["ph"])
    eps = 1e-4
    fd = (
        float(loss({"ph": jnp.asarray(0.4 + eps)}))
        - float(loss({"ph": jnp.asarray(0.4 - eps)}))
    ) / (2 * eps)
    assert abs(g - fd) < 1e-6
    assert abs(g) > 1e-4
