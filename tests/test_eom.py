"""EOM-mode sequences (native equivalent of pulser's enable_eom_mode /
add_eom_pulse / disable_eom_mode; the reference inherits these through
pulser's `with_modulation` sampling, ref backend.py:695-705)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pulser_diff_tpu import TpuEmulator
from pulser_diff_tpu.core import (
    AnalogDevice,
    BLUE,
    RED,
    MockDevice,
    Pulse,
    Register,
    RydbergEOM,
    Sequence,
    sample,
)
from pulser_diff_tpu.core.waveforms import ConstantWaveform


def _eom_device(buffer_time=None):
    """MockDevice clone whose rydberg_global channel carries an EOM."""
    from dataclasses import replace

    eom = RydbergEOM(
        mod_bandwidth=40.0,
        limiting_beam=RED,
        max_limiting_amp=2 * np.pi * 10.0,
        intermediate_detuning=2 * np.pi * 700.0,
        controlled_beams=(BLUE,),
        custom_buffer_time=buffer_time,
    )
    chans = tuple(
        replace(ch, eom_config=eom) if ch.name == "rydberg_global" else ch
        for ch in MockDevice.channels
    )
    return replace(MockDevice, channels=chans, name="EomMock")


def _reg():
    return Register({"q0": jnp.array([-4.0, 0.0]), "q1": jnp.array([4.0, 0.0])})


def test_detuning_off_physics():
    """Beam amplitudes and off-detuning options follow the two-photon
    light-shift formulas (hand-computed golden values)."""
    eom = RydbergEOM(
        mod_bandwidth=40.0,
        limiting_beam=RED,
        max_limiting_amp=60.0,
        intermediate_detuning=4000.0,
        controlled_beams=(BLUE,),
    )
    # balanced regime: omega_beam = sqrt(2 * 4000 * 2.0) ~ 126.5 > 60
    # -> limited: red = 60, blue = 2*4000*2/60 = 266.67
    amps = eom.beam_amplitudes(2.0)
    assert amps[RED] == pytest.approx(60.0)
    assert amps[BLUE] == pytest.approx(2 * 4000 * 2.0 / 60.0)
    # lightshift(all) = (blue^2 - red^2)/(4*dint)
    ls_all = (amps[BLUE] ** 2 - amps[RED] ** 2) / (4 * 4000.0)
    # switching BLUE off leaves RED on: shift = -red^2/(4*dint)
    ls_red = -(amps[RED] ** 2) / (4 * 4000.0)
    det_on = 1.0
    opts = eom.detuning_off_options(2.0, det_on)
    assert opts == pytest.approx([det_on - ls_all + ls_red])
    assert eom.calculate_detuning_off(2.0, det_on, 0.0) == pytest.approx(
        opts[0]
    )
    # with both beams controllable there are 3 options
    eom2 = RydbergEOM(
        mod_bandwidth=40.0, limiting_beam=RED, max_limiting_amp=60.0,
        intermediate_detuning=4000.0, controlled_beams=(BLUE, RED),
    )
    assert len(eom2.detuning_off_options(2.0, det_on)) == 3


def test_eom_sequence_samples():
    """enable -> pulse -> delay -> pulse -> disable produces square
    amp/det streams with detuning_off during the idle window."""
    dev = _eom_device(buffer_time=4)
    seq = Sequence(_reg(), dev)
    seq.declare_channel("ryd", "rydberg_global")
    assert not seq.is_in_eom_mode("ryd")
    seq.enable_eom_mode("ryd", amp_on=2.0, detuning_on=0.5)
    assert seq.is_in_eom_mode("ryd")
    det_off = seq._eom_state["ryd"][2]
    seq.add_eom_pulse("ryd", 100, 0.0)
    seq.delay(60, "ryd")
    seq.add_eom_pulse("ryd", 40, np.pi / 2)
    seq.disable_eom_mode("ryd")
    assert not seq.is_in_eom_mode("ryd")
    # channel empty at enable -> no leading buffer; closing buffer of 4
    assert seq.get_duration("ryd") == 100 + 60 + 40 + 4

    ss = sample(seq)
    cs = ss.channel_samples["ryd"]
    amp = np.asarray(cs.amp)
    det = np.asarray(cs.det)
    assert np.allclose(amp[:100], 2.0)
    assert np.allclose(amp[100:160], 0.0)
    assert np.allclose(amp[160:200], 2.0)
    assert np.allclose(det[:100], 0.5)
    assert np.allclose(det[100:160], det_off)
    assert np.allclose(det[160:200], 0.5)
    assert cs.eom_blocks == [(0, 200)]
    ph = np.asarray(cs.phase)
    assert np.allclose(ph[160:200], np.pi / 2)


def test_eom_guard_rails():
    dev = _eom_device()
    seq = Sequence(_reg(), dev)
    seq.declare_channel("ryd", "rydberg_global")
    seq.declare_channel("ram", "raman_global")
    # raman channel has no EOM config
    with pytest.raises(TypeError, match="EOM configuration"):
        seq.enable_eom_mode("ram", 1.0, 0.0)
    with pytest.raises(RuntimeError, match="EOM mode"):
        seq.add_eom_pulse("ryd", 100, 0.0)
    seq.enable_eom_mode("ryd", 1.0, 0.0)
    with pytest.raises(RuntimeError, match="already in EOM mode"):
        seq.enable_eom_mode("ryd", 1.0, 0.0)
    # regular pulses are locked out during EOM mode
    with pytest.raises(RuntimeError, match="EOM mode"):
        seq.add(Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "ryd")
    seq.disable_eom_mode("ryd")
    with pytest.raises(RuntimeError, match="not in EOM mode"):
        seq.disable_eom_mode("ryd")


def test_eom_buffer_on_enable_after_output():
    dev = _eom_device(buffer_time=10)
    seq = Sequence(_reg(), dev)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(Pulse.ConstantPulse(50, 1.0, 0.0, 0.0), "ryd")
    seq.enable_eom_mode("ryd", 2.0, 0.0)
    # buffer inserted between the standard pulse and the EOM block
    assert seq._eom_blocks["ryd"][0][0] == 60
    seq.add_eom_pulse("ryd", 30, 0.0)
    assert seq.get_duration("ryd") == 90


def test_eom_evolution_matches_explicit_equivalent():
    """An EOM sequence must evolve identically to the same schedule
    written out as explicit constant pulses."""
    dev = _eom_device(buffer_time=0)
    seq = Sequence(_reg(), dev)
    seq.declare_channel("ryd", "rydberg_global")
    seq.enable_eom_mode("ryd", amp_on=2.0, detuning_on=0.5)
    det_off = seq._eom_state["ryd"][2]
    seq.add_eom_pulse("ryd", 80, 0.3)
    seq.delay(40, "ryd")
    seq.add_eom_pulse("ryd", 60, 1.1)
    seq.disable_eom_mode("ryd")

    ref = Sequence(_reg(), MockDevice)
    ref.declare_channel("ryd", "rydberg_global")
    ref.add(Pulse(ConstantWaveform(80, 2.0), ConstantWaveform(80, 0.5), 0.3),
            "ryd")
    ref.add(Pulse(ConstantWaveform(40, 0.0), ConstantWaveform(40, det_off),
                  0.0), "ryd")
    ref.add(Pulse(ConstantWaveform(60, 2.0), ConstantWaveform(60, 0.5), 1.1),
            "ryd")

    sa = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    sb = TpuEmulator.from_sequence(ref, evaluation_times="Minimal")
    a = sa.run(fused=False).states.to_numpy()
    b = sb.run(fused=False).states.to_numpy()
    assert np.abs(a - b).max() < 1e-12


def test_eom_modulated_sampling():
    """with_modulation: EOM blocks ride the EOM's fast response (square
    edges sharpen vs the standard channel response)."""
    dev = _eom_device()
    eomcfg = dev.channel_objects["rydberg_global"].eom_config
    from dataclasses import replace as _replace

    # give the standard channel a slow response for contrast
    chans = tuple(
        _replace(ch, mod_bandwidth=2.0)
        if ch.name == "rydberg_global"
        else ch
        for ch in dev.channels
    )
    dev = _replace(dev, channels=chans)

    seq = Sequence(_reg(), dev)
    seq.declare_channel("ryd", "rydberg_global")
    seq.enable_eom_mode("ryd", 2.0, 0.0)
    seq.add_eom_pulse("ryd", 100, 0.0)
    seq.disable_eom_mode("ryd")
    ss_eom = sample(seq, modulation=True)
    amp_eom = np.asarray(ss_eom.channel_samples["ryd"].amp)

    ref = Sequence(_reg(), dev)
    ref.declare_channel("ryd", "rydberg_global")
    ref.add(Pulse.ConstantPulse(1000, 2.0, 0.0, 0.0), "ryd")
    amp_std = np.asarray(sample(ref, modulation=True).channel_samples["ryd"].amp)

    # EOM rise time 12 ns vs standard 240 ns: the EOM output must reach
    # 90% of amp_on far sooner
    t90_eom = int(np.argmax(amp_eom >= 0.9 * 2.0))
    t90_std = int(np.argmax(amp_std >= 0.9 * 2.0))
    assert 0 < t90_eom < 30
    assert t90_std > 5 * t90_eom
    assert amp_eom.max() == pytest.approx(2.0, rel=1e-3)


def test_eom_parametrized_build():
    """EOM calls defer and replay through build() when the sequence is
    parametrized."""
    dev = _eom_device(buffer_time=0)
    seq = Sequence(_reg(), dev)
    seq.declare_channel("ryd", "rydberg_global")
    dur = seq.declare_variable("dur")
    seq.add(Pulse.ConstantPulse(40, 1.0, 0.0, 0.0), "ryd")
    seq.enable_eom_mode("ryd", 2.0, 0.5)
    seq.add_eom_pulse("ryd", dur, 0.0)
    seq.disable_eom_mode("ryd")
    built = seq.build(dur=64)
    assert built.get_duration("ryd") == 40 + 64
    cs = sample(built).channel_samples["ryd"]
    assert np.allclose(np.asarray(cs.amp)[40:104], 2.0)


def test_analog_device_has_eom():
    assert AnalogDevice.channel_objects["rydberg_global"].supports_eom_mode


def test_eom_correct_phase_drift():
    """add_eom_pulse(correct_phase_drift=True): the carrier phase shifts
    by -detuning_off * idle_time since the last EOM pulse (or the block
    start) — identical streams to the manually-corrected phase, and the
    corrected phase survives abstract-repr export."""
    import json

    from pulser_diff_tpu.interop import from_abstract_repr, to_abstract_repr

    dev = _eom_device(buffer_time=4)

    def build(phase2, correct):
        seq = Sequence(_reg(), dev)
        seq.declare_channel("ryd", "rydberg_global")
        seq.enable_eom_mode("ryd", amp_on=2.0, detuning_on=0.5)
        seq.add_eom_pulse("ryd", 100, 0.0)
        seq.delay(60, "ryd")
        seq.add_eom_pulse(
            "ryd", 40, phase2, correct_phase_drift=correct
        )
        seq.disable_eom_mode("ryd")
        return seq

    seq_a = build(0.3, correct=True)
    det_off = float(
        [s for s in seq_a._schedule["ryd"] if s.kind == "eom_delay"][0].det_off
    )
    drift = -det_off * 60 * 1e-3
    seq_b = build(0.3 + drift, correct=False)
    pa = np.asarray(sample(seq_a).channel_samples["ryd"].phase)
    pb = np.asarray(sample(seq_b).channel_samples["ryd"].phase)
    np.testing.assert_allclose(pa, pb, atol=1e-12)
    assert abs(drift) > 1e-3  # the correction is non-trivial

    # back-to-back pulses accrue no drift
    seq_c = Sequence(_reg(), dev)
    seq_c.declare_channel("ryd", "rydberg_global")
    seq_c.enable_eom_mode("ryd", amp_on=2.0, detuning_on=0.5)
    seq_c.add_eom_pulse("ryd", 100, 0.0)
    seq_c.add_eom_pulse("ryd", 40, 0.3, correct_phase_drift=True)
    ph_c = np.asarray(sample(seq_c).channel_samples["ryd"].phase)
    assert abs(float(ph_c[120]) - 0.3) < 1e-12

    # export records the CORRECTED phase; round trip reproduces streams
    js = to_abstract_repr(seq_a)
    ops = [o for o in json.loads(js)["operations"] if o["op"] == "add_eom_pulse"]
    assert abs(ops[1]["phase"] - (0.3 + drift)) < 1e-12
    seq_d = from_abstract_repr(js)
    pd = np.asarray(sample(seq_d).channel_samples["ryd"].phase)
    np.testing.assert_allclose(pa, pd, atol=1e-12)
