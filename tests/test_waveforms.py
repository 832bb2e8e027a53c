"""Waveform unit tests (sample shapes, areas, PCHIP parity, parametrized
building, envelope mean — reference test_waveform_funcs.py style)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulser_diff_tpu.core import (
    BlackmanWaveform,
    CompositeWaveform,
    ConstantWaveform,
    CustomWaveform,
    InterpolatedWaveform,
    KaiserWaveform,
    RampWaveform,
)
from pulser_diff_tpu.core.variables import Variable
from pulser_diff_tpu.waveform_funcs import constant_waveform

from .metrics import ATOL_ENV


def test_constant():
    wf = ConstantWaveform(100, 2.5)
    s = np.asarray(wf.samples)
    assert s.shape == (100,)
    assert (s == 2.5).all()
    assert float(wf.integral) == pytest.approx(0.25)


def test_ramp():
    wf = RampWaveform(101, -1.0, 1.0)
    s = np.asarray(wf.samples)
    assert s[0] == -1.0 and s[-1] == 1.0
    assert np.allclose(np.diff(s), 0.02)


def test_blackman_area():
    wf = BlackmanWaveform(237, np.pi)
    assert float(wf.integral) == pytest.approx(np.pi, abs=1e-12)
    ref = np.blackman(237)
    mine = np.asarray(wf.samples)
    assert np.allclose(mine / mine.sum(), np.clip(ref, 0, None) / ref.sum(), atol=1e-12)


def test_kaiser_area():
    wf = KaiserWaveform(200, np.pi / 2)
    assert float(wf.integral) == pytest.approx(np.pi / 2, abs=1e-12)
    ref = np.kaiser(200, 14.6)
    mine = np.asarray(wf.samples)
    assert np.allclose(mine / mine.sum(), ref / ref.sum(), atol=1e-9)


def test_custom_and_composite():
    c = CustomWaveform(jnp.asarray([1.0, 2.0, 3.0]))
    assert c.duration == 3
    comp = CompositeWaveform(c, ConstantWaveform(2, 5.0))
    assert comp.duration == 5
    assert np.allclose(np.asarray(comp.samples), [1, 2, 3, 5, 5])


def test_interpolated_vs_scipy():
    from scipy.interpolate import PchipInterpolator

    vals = np.array([0.0, 2.0, 1.0, 3.0, 0.0])
    wf = InterpolatedWaveform(200, jnp.asarray(vals))
    mine = np.asarray(wf.samples)
    x = np.linspace(0, 1, 5) * 199
    ref = PchipInterpolator(x, vals)(np.arange(200))
    assert np.abs(mine - ref).max() < 1e-10


def test_interpolated_gradient():
    vals = jnp.asarray([0.0, 2.0, 1.0, 3.0, 0.0])

    def f(v):
        return jnp.sum(InterpolatedWaveform(100, v).samples)

    g = jax.grad(f)(vals)
    eps = 1e-6
    for i in range(5):
        vp = vals.at[i].add(eps)
        vm = vals.at[i].add(-eps)
        fd = (float(f(vp)) - float(f(vm))) / (2 * eps)
        assert abs(float(g[i]) - fd) < 1e-5


def test_parametrized_waveform_build():
    v = Variable("area")
    wf = BlackmanWaveform(120, v)
    assert wf.is_parametrized
    with pytest.raises(ValueError):
        _ = wf.samples
    built = wf.build({"area": np.pi})
    assert float(built.integral) == pytest.approx(np.pi, abs=1e-12)


def test_tanh_envelope_mean():
    """Smooth boxcar ~= value inside the window (reference
    test_waveform_funcs.py:10-34)."""
    value = 2.0
    env = constant_waveform(0.05, 0.25, value, edge_steepness=1.0)
    t = jnp.arange(300, dtype=jnp.float64)
    samples = env(t)
    inner = np.asarray(samples)[80:220]
    assert abs(inner.mean() - value) < ATOL_ENV
    assert abs(float(samples[0])) < 0.1 * value
    assert abs(float(samples[-1])) < 0.1 * value


def test_from_max_val():
    """Blackman/Kaiser from_max_val: shortest duration whose peak stays
    at or under max_val, preserving the requested area."""
    from pulser_diff_tpu.core.waveforms import KaiserWaveform

    for cls in (BlackmanWaveform, KaiserWaveform):
        wf = cls.from_max_val(2.0, np.pi)
        s = np.asarray(wf.samples)
        assert s.max() <= 2.0 + 1e-9
        assert float(wf.integral) == pytest.approx(np.pi, abs=1e-9)
        # shortest: one sample shorter must exceed the bound
        shorter = cls(wf.duration - 1, np.pi)
        assert np.asarray(shorter.samples).max() > 2.0
    with pytest.raises(ValueError, match="matching signs"):
        KaiserWaveform.from_max_val(-1.0, np.pi)
