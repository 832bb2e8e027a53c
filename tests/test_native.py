"""Native C++ sampling kernels vs the Python/JAX reference paths."""

import numpy as np
import pytest

from pulser_diff_tpu import native


@pytest.fixture(scope="module", autouse=True)
def _needs_native():
    if not native.available():
        pytest.skip("native library unavailable (no g++?)")


def test_blackman_matches_numpy():
    n, area = 237, np.pi
    mine = native.blackman(n, area)
    w = np.clip(np.blackman(n), 0, None)
    ref = w * area / (w.sum() * 1e-3)
    assert np.abs(mine - ref).max() < 1e-10
    assert mine.sum() * 1e-3 == pytest.approx(area)


def test_kaiser_matches_numpy():
    n, area = 200, 1.3
    mine = native.kaiser(n, area)
    w = np.kaiser(n, 14.6)
    ref = w * area / (w.sum() * 1e-3)
    assert np.abs(mine - ref).max() < 1e-9


def test_ramp():
    mine = native.ramp(101, -1.0, 1.0)
    assert np.allclose(mine, np.linspace(-1, 1, 101))


def test_pchip_matches_scipy():
    from scipy.interpolate import PchipInterpolator

    x = np.array([0.0, 10.0, 30.0, 55.0, 99.0])
    y = np.array([0.0, 3.0, -1.0, 2.0, 0.0])
    t = np.linspace(0, 99, 500)
    mine = native.pchip(x, y, t)
    ref = PchipInterpolator(x, y)(t)
    assert np.abs(mine - ref).max() < 1e-12


def test_assemble_channel():
    ti = np.array([10, 50])
    tf = np.array([20, 60])
    seg_amp = np.concatenate([np.full(10, 2.0), np.full(10, 3.0)])
    seg_det = np.concatenate([np.full(10, -1.0), np.full(10, 1.0)])
    seg_phase = np.array([0.5, 0.7])
    amp, det, phase = native.assemble_channel(
        70, ti, tf, seg_amp, seg_det, seg_phase
    )
    assert (amp[:10] == 0).all() and (amp[10:20] == 2.0).all()
    assert (amp[50:60] == 3.0).all() and (amp[60:] == 0).all()
    assert (det[10:20] == -1.0).all() and (det[50:60] == 1.0).all()
    assert (phase[10:20] == 0.5).all()
    assert (phase[20:50] == 0.5).all()  # forward fill
    assert (phase[50:] == 0.7).all()
