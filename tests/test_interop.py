"""Interop adapter tests with duck-typed stand-ins for pulser objects
(the real pulser package is not installed in this environment)."""

import numpy as np
import pytest

import jax

from pulser_diff_tpu.interop import (
    from_pulser_device,
    from_pulser_register,
    from_pulser_waveform,
)


class _FakeReg:
    def __init__(self, qubits):
        self.qubits = qubits


class _FakeWf:
    def __init__(self, duration):
        self.duration = duration


class _FakeConstant(_FakeWf):
    def __init__(self, duration, value):
        super().__init__(duration)
        self._value = value


_FakeConstant.__name__ = "ConstantWaveform"


class _FakeBlackman(_FakeWf):
    def __init__(self, duration, area):
        super().__init__(duration)
        self._area = area


_FakeBlackman.__name__ = "BlackmanWaveform"


class _FakeCustom(_FakeWf):
    def __init__(self, samples):
        super().__init__(len(samples))
        self.samples = np.asarray(samples)


_FakeCustom.__name__ = "SomethingExotic"


class _FakeChannel:
    def __init__(self, addressing, basis):
        self.addressing = addressing
        self.basis = basis
        self.max_abs_detuning = None
        self.max_amp = None


class _FakeDevice:
    name = "FakeDevice"
    dimensions = 2
    rydberg_level = 70
    max_atom_num = 10
    max_radial_distance = 50.0
    min_atom_distance = 1.0
    interaction_coeff = 5420158.53
    interaction_coeff_xy = 3700.0
    supports_slm_mask = True
    channels = {"rydberg_global": _FakeChannel("Global", "ground-rydberg")}


def test_register_conversion():
    reg = from_pulser_register(
        _FakeReg({"q0": np.array([0.0, 0.0]), "q1": np.array([5.0, 0.0])})
    )
    assert reg.qubit_ids == ("q0", "q1")


def test_waveform_conversion():
    wf = from_pulser_waveform(_FakeConstant(100, 2.0))
    assert np.allclose(np.asarray(wf.samples), 2.0)
    wf2 = from_pulser_waveform(_FakeBlackman(200, np.pi))
    assert float(wf2.integral) == pytest.approx(np.pi)
    wf3 = from_pulser_waveform(_FakeCustom(np.arange(5.0)))
    assert np.allclose(np.asarray(wf3.samples), np.arange(5.0))


def test_device_conversion():
    dev = from_pulser_device(_FakeDevice())
    assert dev.interaction_coeff == pytest.approx(5420158.53)
    assert "rydberg_global" in dev.channel_objects
    assert dev.supported_bases == {"ground-rydberg"}
