"""Sequence/Register/Device/sampler unit tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulser_diff_tpu.core import (
    AnalogDevice,
    MockDevice,
    Pulse,
    Register,
    Sequence,
    sample,
)
from pulser_diff_tpu.core.waveforms import BlackmanWaveform, ConstantWaveform


def test_register_constructors():
    r = Register.rectangle(2, 3, spacing=5.0, prefix="q")
    assert len(r) == 6
    assert r.qubit_ids[0] == "q0"
    # centered
    assert np.abs(np.asarray(r.coords_array).mean(axis=0)).max() < 1e-9
    r2 = Register.triangular_lattice(2, 2, spacing=6.0)
    assert len(r2) == 4
    r3 = Register.linear(4, spacing=7.0)
    d = np.linalg.norm(
        np.asarray(r3.coords_array)[1] - np.asarray(r3.coords_array)[0]
    )
    assert d == pytest.approx(7.0)


def test_device_validation():
    r = Register.linear(30, spacing=6.0)
    with pytest.raises(ValueError):
        AnalogDevice.validate_register(r)  # too many atoms
    r2 = Register.linear(2, spacing=1.0)
    with pytest.raises(ValueError):
        AnalogDevice.validate_register(r2)  # too close
    MockDevice.validate_register(r)  # no constraints


def test_channel_amp_validation():
    r = Register.linear(2, spacing=6.0)
    seq = Sequence(r, AnalogDevice)
    seq.declare_channel("ryd", "rydberg_global")
    with pytest.raises(ValueError):
        seq.add(Pulse.ConstantPulse(100, 100.0, 0.0, 0.0), "ryd")


def test_schedule_protocols():
    r = Register.linear(2, spacing=6.0, prefix="q")
    seq = Sequence(r, MockDevice)
    seq.declare_channel("g", "rydberg_global")
    seq.declare_channel("l", "rydberg_local", initial_target="q0")
    seq.add(Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "g")
    # min-delay: local overlaps targets with global -> waits
    seq.add(Pulse.ConstantPulse(50, 1.0, 0.0, 0.0), "l")
    assert seq.get_duration("l") == 150
    # no-delay starts immediately after channel's own schedule
    seq.add(Pulse.ConstantPulse(50, 1.0, 0.0, 0.0), "l", protocol="no-delay")
    assert seq.get_duration("l") == 200
    seq.delay(30, "g")
    assert seq.get_duration("g") == 130
    # wait-for-all
    seq.add(Pulse.ConstantPulse(10, 1.0, 0.0, 0.0), "g", protocol="wait-for-all")
    assert seq.get_duration("g") == 210


def test_measure_and_slm():
    r = Register.linear(2, spacing=6.0, prefix="q")
    seq = Sequence(r, MockDevice)
    seq.declare_channel("g", "rydberg_global")
    seq.config_slm_mask(["q0"])
    seq.add(Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "g")
    seq.measure("ground-rydberg")
    with pytest.raises(RuntimeError):
        seq.measure()
    ss = sample(seq)
    assert ss._measurement == "ground-rydberg"
    assert ss._slm_mask.targets == {"q0"}
    assert ss._slm_mask.end == 100
    nested = ss.to_nested_dict()
    # SLM forces local representation; masked qubit amp zeroed in window
    amp_q0 = np.asarray(nested["Local"]["ground-rydberg"]["q0"]["amp"])
    amp_q1 = np.asarray(nested["Local"]["ground-rydberg"]["q1"]["amp"])
    assert (amp_q0[:100] == 0).all()
    assert (amp_q1[:100] == 1.0).all()


def test_slm_masked_ising_simulation():
    """Masked qubit sees no drive during the mask window."""
    from pulser_diff_tpu import TpuEmulator
    from .golden import golden_sesolve

    r = Register.linear(2, spacing=20.0, prefix="q")  # weak interaction
    seq = Sequence(r, MockDevice)
    seq.declare_channel("g", "rydberg_global")
    seq.config_slm_mask(["q0"])
    seq.add(Pulse.ConstantPulse(150, 2.0, 0.0, 0.0), "g")
    seq.add(Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "g")
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    res = sim.run()
    psi = (np.asarray(res.states.re) + 1j * np.asarray(res.states.im))[-1, :, 0]
    t = np.asarray(jax.device_get(sim.evaluation_times))
    ref = golden_sesolve(seq, MockDevice, t)[-1]
    assert np.abs(psi - ref).max() < 1e-6


def test_parametrized_sequence_build():
    r = Register.linear(2, spacing=6.0, prefix="q")
    seq = Sequence(r, MockDevice)
    seq.declare_channel("g", "rydberg_global")
    om = seq.declare_variable("om")
    area = seq.declare_variable("area")
    seq.add(Pulse.ConstantPulse(100, om, 0.0, 0.0), "g")
    seq.add(
        Pulse(BlackmanWaveform(100, area), ConstantWaveform(100, om * 0.5), 0.1),
        "g",
    )
    assert seq.is_parametrized()
    with pytest.raises(TypeError):
        seq.build(om=1.0)  # missing area
    built = seq.build(om=1.5, area=np.pi)
    assert built.get_duration() == 200
    nested = sample(built).to_nested_dict()
    amp = np.asarray(nested["Global"]["ground-rydberg"]["amp"])
    assert amp[0] == 1.5
    assert abs(amp[100:].sum() * 1e-3 - np.pi) < 1e-9
    det = np.asarray(nested["Global"]["ground-rydberg"]["det"])
    assert det[150] == 0.75


def test_expr_arithmetic():
    r = Register.linear(1, spacing=6.0, prefix="q")
    seq = Sequence(r, MockDevice)
    seq.declare_channel("g", "rydberg_global")
    x = seq.declare_variable("x")
    expr = (2 * x + 1).tanh() * 3 - x / 2
    val = expr.evaluate({"x": jnp.asarray(0.5)})
    ref = np.tanh(2 * 0.5 + 1) * 3 - 0.25
    assert float(val) == pytest.approx(ref)


def test_phase_forward_fill_and_post_phase_shift():
    r = Register.linear(1, spacing=6.0, prefix="q")
    seq = Sequence(r, MockDevice)
    seq.declare_channel("g", "rydberg_global")
    seq.add(Pulse.ConstantPulse(50, 1.0, 0.0, 0.2, post_phase_shift=0.5), "g")
    seq.delay(20, "g")
    seq.add(Pulse.ConstantPulse(50, 1.0, 0.0, 0.1), "g")
    cs = sample(seq).channel_samples["g"]
    ph = np.asarray(cs.phase)
    assert ph[10] == pytest.approx(0.2)
    assert ph[60] == pytest.approx(0.2)  # forward fill over delay
    assert ph[80] == pytest.approx(0.6)  # 0.1 + accumulated 0.5


def test_phase_shift_refs():
    """phase_shift(): per-(basis, qubit) references (pulser semantics) —
    later pulses pick up the accumulated reference, refs are shared
    across channels of the same basis, and a multi-target pulse on
    mixed references raises."""
    r = Register.linear(2, spacing=6.0, prefix="q")
    seq = Sequence(r, MockDevice)
    seq.declare_channel("g", "rydberg_global")
    seq.declare_channel("l", "rydberg_local", initial_target="q0")
    seq.add(Pulse.ConstantPulse(40, 1.0, 0.0, 0.1), "l")
    seq.phase_shift(0.7, "q0", basis="ground-rydberg")
    assert seq.current_phase_ref("q0", "ground-rydberg") == pytest.approx(0.7)
    assert seq.current_phase_ref("q1", "ground-rydberg") == 0.0
    # local pulse on q0 picks up the 0.7 reference
    seq.add(Pulse.ConstantPulse(40, 1.0, 0.0, 0.2), "l")
    ph_l = np.asarray(sample(seq).channel_samples["l"].phase)
    assert ph_l[60] == pytest.approx(0.9)
    # a global pulse now sees mixed refs (q0: 0.7, q1: 0)
    with pytest.raises(ValueError, match="different phase references"):
        seq.add(Pulse.ConstantPulse(40, 1.0, 0.0, 0.0), "g")
    # equalizing the refs allows it, and the common ref is picked up
    seq.phase_shift(0.7, "q1", basis="ground-rydberg")
    seq.add(Pulse.ConstantPulse(40, 1.0, 0.0, 0.05), "g")
    ph_g = np.asarray(sample(seq).channel_samples["g"].phase)
    assert ph_g[-1] == pytest.approx(0.75)
    # wrong basis: shifts on "digital" don't touch ground-rydberg pulses
    seq2 = Sequence(r, MockDevice)
    seq2.declare_channel("g", "rydberg_global")
    seq2.phase_shift(1.3, "q0", "q1", basis="digital")
    seq2.add(Pulse.ConstantPulse(40, 1.0, 0.0, 0.2), "g")
    assert np.asarray(sample(seq2).channel_samples["g"].phase)[
        -1
    ] == pytest.approx(0.2)
    with pytest.raises(ValueError, match="No phase reference"):
        seq2.phase_shift(0.1, "q0", basis="bogus")
    with pytest.raises(ValueError, match="at least one target"):
        seq2.phase_shift(0.1)


def test_phase_shift_cross_channel_post_phase():
    """post_phase_shift advances the targets' per-qubit refs across
    channels of the same basis (pulser), not a per-channel accumulator:
    a local pulse after a global post_phase_shift picks it up."""
    r = Register.linear(2, spacing=6.0, prefix="q")
    seq = Sequence(r, MockDevice)
    seq.declare_channel("g", "rydberg_global")
    seq.declare_channel("l", "rydberg_local", initial_target="q1")
    seq.add(
        Pulse.ConstantPulse(50, 1.0, 0.0, 0.0, post_phase_shift=0.5), "g"
    )
    seq.add(Pulse.ConstantPulse(50, 1.0, 0.0, 0.3), "l")
    ph = np.asarray(sample(seq).channel_samples["l"].phase)
    assert ph[-1] == pytest.approx(0.8)


def test_phase_shift_parametrized_and_barrier():
    """Deferred phase_shift with a variable phi builds correctly; the
    phase barrier keeps a no-delay pulse from starting before the last
    shift on its targets."""
    r = Register.linear(2, spacing=6.0, prefix="q")
    seq = Sequence(r, MockDevice)
    phi = seq.declare_variable("phi")
    seq.declare_channel("g", "rydberg_global")
    seq.add(Pulse.ConstantPulse(40, 1.0, 0.0, 0.1), "g")
    seq.phase_shift(phi, "q0", "q1", basis="ground-rydberg")
    seq.add(Pulse.ConstantPulse(40, 1.0, 0.0, 0.0), "g")
    built = seq.build(phi=0.25)
    ph = np.asarray(sample(built).channel_samples["g"].phase)
    assert ph[-1] == pytest.approx(0.25)
    assert built.current_phase_ref("q1", "ground-rydberg") == pytest.approx(
        0.25
    )
    # barrier: channel B idle; q0 driven on A (digital) until t=40, the
    # shift is tagged at that last-used time; a no-delay pulse on B
    # targeting q0 must still start at 40, not 0
    seq3 = Sequence(r, MockDevice)
    seq3.declare_channel("a", "raman_local", initial_target="q0")
    seq3.declare_channel("b", "raman_local", initial_target="q0")
    seq3.add(Pulse.ConstantPulse(40, 1.0, 0.0, 0.0), "a")
    seq3.phase_shift(0.4, "q0", basis="digital")
    seq3.add(
        Pulse.ConstantPulse(30, 1.0, 0.0, 0.0), "b", protocol="no-delay"
    )
    slot = seq3._schedule["b"][-1]
    assert slot.ti == 40 and slot.phase_ref == pytest.approx(0.4)
    # post_phase_shift also barriers: it happens AT the pulse's end, so
    # a no-delay pulse on another channel cannot carry it earlier
    seq4 = Sequence(r, MockDevice)
    seq4.declare_channel("a", "raman_local", initial_target="q0")
    seq4.declare_channel("b", "raman_local", initial_target="q0")
    seq4.add(
        Pulse.ConstantPulse(40, 1.0, 0.0, 0.0, post_phase_shift=0.5), "a"
    )
    seq4.add(
        Pulse.ConstantPulse(30, 1.0, 0.0, 0.0), "b", protocol="no-delay"
    )
    slot = seq4._schedule["b"][-1]
    assert slot.ti == 40 and slot.phase_ref == pytest.approx(0.5)


def test_available_channels_xy_mode_and_empty_draw():
    r = Register.linear(2, spacing=6.0, prefix="q")
    seq = Sequence(r, MockDevice)
    # set_magnetic_field enters XY mode with no channel declared yet:
    # only microwave channels may be declared, and available_channels
    # must agree
    seq.set_magnetic_field()
    avail = seq.available_channels
    assert set(avail) == {"microwave_global"}
    with pytest.raises(ValueError, match="non-microwave"):
        seq.declare_channel("g", "rydberg_global")
    # drawing a sequence with no declared channels gives a clear error
    seq2 = Sequence(r, MockDevice)
    with pytest.raises(ValueError, match="Nothing to draw"):
        seq2.draw()


def test_sequence_api_surface():
    """pulser API parity: target_index / phase_shift_index / align /
    available_channels / is_measured / get_measurement_basis."""
    r = Register.linear(3, spacing=6.0, prefix="q")
    seq = Sequence(r, MockDevice)
    seq.declare_channel("g", "rydberg_global")
    seq.declare_channel("l", "rydberg_local", initial_target="q0")
    # index-based targeting
    seq.target_index(2, "l")
    assert seq._last_target["l"] == frozenset({"q2"})
    with pytest.raises(ValueError, match="out of range"):
        seq.target_index(7, "l")
    with pytest.raises(TypeError, match="Indices"):
        seq.target_index("q0", "l")
    # index-based phase shift
    seq.phase_shift_index(0.3, 0, 1, basis="ground-rydberg")
    assert seq.current_phase_ref("q0", "ground-rydberg") == pytest.approx(0.3)
    assert seq.current_phase_ref("q2", "ground-rydberg") == 0.0
    # align pads the shorter channel with a delay
    seq.add(Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "l")
    seq.align("g", "l")
    assert seq.get_duration("g") == seq.get_duration("l")
    with pytest.raises(ValueError, match="at least two"):
        seq.align("g")
    # available_channels: Mock (virtual) keeps everything non-XY here
    avail = seq.available_channels
    assert "rydberg_global" in avail and "microwave_global" not in avail
    # measurement accessors
    assert not seq.is_measured()
    with pytest.raises(RuntimeError, match="not been measured"):
        seq.get_measurement_basis()
    seq.measure("ground-rydberg")
    assert seq.is_measured()
    assert seq.get_measurement_basis() == "ground-rydberg"


def test_register_constructors_extended():
    """hexagon / max_connectivity / rotated / draw (pulser parity)."""
    import matplotlib

    matplotlib.use("Agg")

    hx = Register.hexagon(2, spacing=5.0)
    assert len(hx) == 1 + 3 * 2 * 3  # 1 + 3 L (L+1)
    c = np.asarray(hx.coords_array)
    d = np.linalg.norm(c[None] - c[:, None], axis=-1)
    nn = np.where(d > 0, d, np.inf).min()
    assert nn == pytest.approx(5.0)

    mc = Register.max_connectivity(7, AnalogDevice)
    assert len(mc) == 7
    c = np.asarray(mc.coords_array)
    d = np.linalg.norm(c[None] - c[:, None], axis=-1)
    nn = np.where(d > 0, d, np.inf).min()
    assert nn == pytest.approx(AnalogDevice.min_atom_distance)
    with pytest.raises(ValueError, match="below the device minimum"):
        Register.max_connectivity(4, AnalogDevice, spacing=0.1)

    r = Register.linear(2, spacing=6.0, prefix="q")
    r90 = r.rotated(90.0)
    a, b = (np.asarray(v) for v in r.qubits.values())
    a2, b2 = (np.asarray(v) for v in r90.qubits.values())
    np.testing.assert_allclose(a2, [-a[1], a[0]], atol=1e-12)
    np.testing.assert_allclose(b2, [-b[1], b[0]], atol=1e-12)

    r.draw(blockade_radius=8.0, draw_half_radius=True,
           fig_name="/tmp/_reg_draw_test.png")
    import os

    assert os.path.getsize("/tmp/_reg_draw_test.png") > 0


def test_pulse_arbitrary_phase_and_draw():
    """ArbitraryPhase: detuning = -dφ/dt (rad/µs), carrier phase φ(0).
    A linear phase ramp is exactly a constant detuning."""
    import matplotlib

    matplotlib.use("Agg")
    from pulser_diff_tpu.core.waveforms import RampWaveform

    k = 0.002  # rad/ns over 200 ns
    phase_wf = RampWaveform(200, 0.3, 0.3 + k * 199)
    amp = BlackmanWaveform(200, np.pi)
    p = Pulse.ArbitraryPhase(amp, phase_wf)
    det = np.asarray(p.detuning.samples)
    np.testing.assert_allclose(det, -k * 1e3 * np.ones(200) * (199 / 199),
                               rtol=1e-9)
    assert float(np.asarray(p.phase)) == pytest.approx(0.3)
    # equivalent explicit pulse solves identically
    r = Register.linear(1, spacing=6.0, prefix="q")
    from pulser_diff_tpu import TpuEmulator

    def final_state(pulse):
        seq = Sequence(r, MockDevice)
        seq.declare_channel("g", "rydberg_global")
        seq.add(pulse, "g")
        sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
        return sim.run(fused=False).states.to_numpy()[-1]

    sa = final_state(p)
    sb = final_state(
        Pulse(amp, ConstantWaveform(200, -k * 1e3), 0.3)
    )
    assert np.abs(sa - sb).max() < 1e-9
    with pytest.raises(NotImplementedError, match="parametrized"):
        seq = Sequence(r, MockDevice)
        v = seq.declare_variable("v")
        Pulse.ArbitraryPhase(amp, RampWaveform(200, 0.0, v))
    p.draw(fig_name="/tmp/_pulse_draw_test.png")
    import os

    assert os.path.getsize("/tmp/_pulse_draw_test.png") > 0


def test_waveform_draw_and_modulated_samples():
    import matplotlib

    matplotlib.use("Agg")
    from pulser_diff_tpu.core.channels import Channel

    ch = Channel(
        name="rydberg_global", addressing="Global",
        basis="ground-rydberg", mod_bandwidth=8.0,
    )
    wf = BlackmanWaveform(200, np.pi)
    m = np.asarray(wf.modulated_samples(ch))
    assert m.shape[0] > wf.duration  # extended by the rise/fall tail
    np.testing.assert_allclose(
        m, np.asarray(ch.modulate(wf.samples)), atol=0
    )
    wf.draw(output_channel=ch, fig_name="/tmp/_wf_draw_test.png")
    import os

    assert os.path.getsize("/tmp/_wf_draw_test.png") > 0


def test_switch_device():
    """switch_device replays the build recipe on the new device,
    re-validating constraints; strict mode compares channel timings."""
    from pulser_diff_tpu.core import sample
    from pulser_diff_tpu.core.channels import Channel
    from pulser_diff_tpu.core.devices import Device

    r = Register.linear(2, spacing=6.0, prefix="q")
    seq = Sequence(r, MockDevice)
    seq.declare_channel("g", "rydberg_global")
    seq.add(Pulse.ConstantPulse(100, 2.0, -1.0, 0.2), "g")
    seq.phase_shift(0.4, "q0", "q1", basis="ground-rydberg")
    seq.add(Pulse.ConstantPulse(60, 1.0, 0.0, 0.0), "g")

    dev2 = Device(
        name="Dev2",
        is_virtual=True,
        channels=(
            Channel(
                name="rydberg_global",
                addressing="Global",
                basis="ground-rydberg",
                max_amp=10.0,
            ),
        ),
    )
    seq2 = seq.switch_device(dev2)
    assert seq2.device.name == "Dev2"
    a = sample(seq).channel_samples["g"]
    b = sample(seq2).channel_samples["g"]
    np.testing.assert_array_equal(np.asarray(a.phase), np.asarray(b.phase))
    # constraint violation on the new device is re-checked
    tight = Device(
        name="Tight",
        is_virtual=True,
        channels=(
            Channel(
                name="rydberg_global",
                addressing="Global",
                basis="ground-rydberg",
                max_amp=1.5,
            ),
        ),
    )
    with pytest.raises(ValueError):
        seq.switch_device(tight)
    # strict: differing modulation bandwidth rejected
    moddev = Device(
        name="Mod",
        is_virtual=True,
        channels=(
            Channel(
                name="rydberg_global",
                addressing="Global",
                basis="ground-rydberg",
                mod_bandwidth=4.0,
            ),
        ),
    )
    with pytest.raises(ValueError, match="strict"):
        seq.switch_device(moddev, strict=True)
    assert seq.switch_device(moddev).device.name == "Mod"
    # missing channel id
    nochan = Device(name="NoChan", is_virtual=True, channels=())
    with pytest.raises(ValueError, match="no channel"):
        seq.switch_device(nochan)


def test_output_modulation():
    """with_modulation applies pulser's exact channel transfer function:
    normalized Blackman window of width 2*rise_time, zero-padded for
    amplitude and edge-padded (keep_ends) for detuning/phase, extending
    the samples by the 2*rise_time fall time (reference samples with it
    via with_modulation, backend.py:695-705)."""
    from pulser_diff_tpu.core.channels import Channel
    from pulser_diff_tpu.core.devices import Device

    dev = Device(
        name="ModDevice",
        channels=(
            Channel(
                name="rydberg_global",
                addressing="Global",
                basis="ground-rydberg",
                mod_bandwidth=30.0,  # MHz -> ~16 ns rise time
            ),
        ),
    )
    r = Register.linear(2, spacing=8.0, prefix="q")
    seq = Sequence(r, dev)
    seq.declare_channel("g", "rydberg_global")
    seq.add(Pulse.ConstantPulse(200, 2.0, 0.0, 0.0), "g")
    seq.delay(100, "g")  # room for the falling edge
    raw = sample(seq).channel_samples["g"]
    mod = sample(seq, modulation=True).channel_samples["g"]
    raw_amp = np.asarray(raw.amp)
    mod_amp = np.asarray(mod.amp)
    rise = 16  # int(0.48 / 30 MHz * 1e3)
    # fall-time extension: programmed 300 ns + 2 * rise_time
    assert mod_amp.shape[0] == 300 + 2 * rise
    # normalized window preserves the pulse area exactly
    assert abs(raw_amp.sum() - mod_amp.sum()) < 1e-9 * raw_amp.sum() + 1e-9
    assert mod_amp[0] < 0.6 * raw_amp[100]  # rising edge at the start
    assert abs(mod_amp[100] - 2.0) < 1e-9  # plateau unchanged
    # golden check vs the direct numpy form of pulser's transfer function
    win = np.blackman(2 * rise)
    win = win / win.sum()
    ref = np.convolve(np.pad(raw_amp, rise), win, mode="same")
    ref = np.pad(ref, (0, mod_amp.shape[0] - ref.shape[0]))
    np.testing.assert_allclose(mod_amp, ref[: mod_amp.shape[0]], atol=1e-9)
    # detuning/phase hold their boundary values (keep_ends)
    seq2 = Sequence(r, dev)
    seq2.declare_channel("g", "rydberg_global")
    seq2.add(Pulse.ConstantPulse(200, 1.0, -2.0, 0.4), "g")
    mod2 = sample(seq2, modulation=True).channel_samples["g"]
    assert abs(float(mod2.det[0]) - (-2.0)) < 1e-9
    assert abs(float(mod2.phase[-1]) - 0.4) < 1e-9
    # emulator accepts modulated sampling end-to-end
    from pulser_diff_tpu import TpuEmulator

    sim = TpuEmulator.from_sequence(
        seq, evaluation_times="Minimal", with_modulation=True
    )
    res = sim.run()
    psi = res.states.to_numpy()[-1, :, 0]
    assert abs(np.linalg.norm(psi) - 1) < 1e-8


def test_register_3d():
    """3D registers (cuboid/cubic): full 3D pairwise distances feed the
    vdW interaction — a 3D register solves identically to a 2D register
    with the same distance matrix."""
    from pulser_diff_tpu import TpuEmulator

    r = Register.cuboid(2, 2, 2, spacing=6.0, prefix="q")
    assert len(r) == 8 and r.dimensionality == 3
    assert len(Register.cubic(2, spacing=6.0)) == 8
    c = np.asarray(r.coords_array)
    d = np.linalg.norm(c[None] - c[:, None], axis=-1)
    assert np.where(d > 0, d, np.inf).min() == pytest.approx(6.0)

    reg3 = Register(
        {"a": np.array([0.0, 0.0, 0.0]), "b": np.array([0.0, 0.0, 8.0])}
    )
    reg2 = Register({"a": np.array([0.0, 0.0]), "b": np.array([8.0, 0.0])})

    def final(reg):
        seq = Sequence(reg, MockDevice)
        seq.declare_channel("g", "rydberg_global")
        seq.add(Pulse.ConstantPulse(100, 2.0, -1.0, 0.0), "g")
        sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
        return sim.run(fused=False).states.to_numpy()

    np.testing.assert_allclose(final(reg3), final(reg2), atol=1e-12)
    with pytest.raises(ValueError, match="same dimension"):
        Register({"a": np.zeros(2), "b": np.zeros(3)})
