"""Unit tests for tensor utilities (reference utils.py behaviours)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulser_diff_tpu.cplx import Cplx, as_cplx, cmatmul, cdot, ckron
from pulser_diff_tpu.ops import (
    HMAT,
    IMAT,
    XMAT,
    YMAT,
    ZMAT,
    basis_state,
    expect,
    interpolate_sine,
    kron,
    s,
    total_magnetization,
    trace,
    vn_entropy,
)


def _np(c: Cplx) -> np.ndarray:
    return c.to_numpy()


def test_pauli_matrices():
    assert np.allclose(_np(XMAT), [[0, 1], [1, 0]])
    assert np.allclose(_np(YMAT), [[0, -1j], [1j, 0]])
    assert np.allclose(_np(ZMAT), [[1, 0], [0, -1]])
    h = _np(HMAT)
    assert np.allclose(h, np.array([[1, 1], [1, -1]]) / np.sqrt(2.0))
    assert np.allclose(h @ h, np.eye(2))


def test_kron_matches_numpy(rng):
    a = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    b = rng.normal(size=(3, 3)) + 1j * rng.normal(size=(3, 3))
    c = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    mine = _np(kron(as_cplx(a), as_cplx(b), as_cplx(c)))
    ref = np.kron(np.kron(a, b), c)
    assert np.abs(mine - ref).max() < 1e-12


def test_total_magnetization():
    n = 3
    tm = _np(total_magnetization(n))
    Z = np.diag([1.0, -1.0])
    I = np.eye(2)
    ref = sum(
        np.kron(np.kron(np.eye(2**i), Z), np.eye(2 ** (n - 1 - i)))
        for i in range(n)
    )
    assert np.abs(tm - ref).max() < 1e-12


def test_total_magnetization_diagonal_form():
    # dense=False returns the 1-D diag(sum_i Z_i); auto switches past N=12
    n = 3
    diag = total_magnetization(n, dense=False)
    assert diag.shape == (2**n,)
    assert np.abs(np.diag(diag.to_numpy()) - _np(total_magnetization(n))).max() == 0
    assert total_magnetization(13).ndim == 1  # auto: diagonal beyond N=12
    assert total_magnetization(13, dense=True).ndim == 2


def test_expect_diagonal_matches_dense(rng):
    """1-D observables are diag(obs) for kets, dms and dm batches."""
    n_t, dim, nb = 4, 8, 3
    d = rng.normal(size=dim) + 1j * rng.normal(size=dim)
    dense, diag = as_cplx(np.diag(d)), as_cplx(d)

    kets = rng.normal(size=(n_t, dim, nb)) + 1j * rng.normal(size=(n_t, dim, nb))
    want = _np(expect(dense, as_cplx(kets)))
    got = _np(expect(diag, as_cplx(kets)))
    assert np.abs(got - want).max() < 1e-10

    rho = rng.normal(size=(n_t, dim, dim)) + 1j * rng.normal(size=(n_t, dim, dim))
    want = _np(expect(dense, as_cplx(rho)))
    got = _np(expect(diag, as_cplx(rho)))
    assert np.abs(got - want).max() < 1e-10

    rho_b = rng.normal(size=(n_t, dim, dim, nb)) + 1j * rng.normal(
        size=(n_t, dim, dim, nb)
    )
    want = _np(expect(dense, as_cplx(rho_b)))
    got = _np(expect(diag, as_cplx(rho_b)))
    assert np.abs(got - want).max() < 1e-10


def test_basis_state():
    k = _np(basis_state(2, 1))
    assert k.shape == (2, 1)
    assert k[1, 0] == 1.0
    k3 = _np(basis_state((2, 3), (1, 2)))
    assert k3.shape == (6, 1)
    assert k3[5, 0] == 1.0


def test_expect_ket_batch(rng):
    """expect on (n_t, dim, n_batch) kets matches the reference's einsum
    semantics (utils.py:81, summing over batch pairs)."""
    n_t, dim, nb = 4, 4, 3
    states = rng.normal(size=(n_t, dim, nb)) + 1j * rng.normal(size=(n_t, dim, nb))
    obs = rng.normal(size=(dim, dim))
    obs = obs + obs.T
    vals = expect(as_cplx(obs), as_cplx(states))
    ref = np.einsum("tji,jk,tkl->t", states.conj(), obs, states)
    assert np.abs(_np(vals) - ref).max() < 1e-10
    # general complex observable pins the imaginary-part convention too
    obs_c = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    vals_c = expect(as_cplx(obs_c), as_cplx(states))
    ref_c = np.einsum("tji,jk,tkl->t", states.conj(), obs_c, states)
    assert np.abs(_np(vals_c) - ref_c).max() < 1e-10


def test_expect_density_batch(rng):
    n_t, dim = 4, 4
    rho = rng.normal(size=(n_t, dim, dim)) + 1j * rng.normal(size=(n_t, dim, dim))
    obs = rng.normal(size=(dim, dim)) + 1j * rng.normal(size=(dim, dim))
    vals = expect(as_cplx(obs), as_cplx(rho))
    ref = np.einsum("ij,tji->t", obs, rho)
    assert np.abs(_np(vals) - ref).max() < 1e-10


def test_trace(rng):
    m = rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))
    assert abs(complex(*map(float, trace(as_cplx(m)))) - np.trace(m)) < 1e-12


def test_vn_entropy(rng):
    # maximally mixed 2-qubit state: entropy = 2 bits
    rho = as_cplx(np.eye(4) / 4)
    assert abs(float(vn_entropy(rho)) - 2.0) < 1e-9
    # pure state: entropy 0
    psi = rng.normal(size=4) + 1j * rng.normal(size=4)
    psi /= np.linalg.norm(psi)
    rho_p = as_cplx(np.outer(psi, psi.conj()))
    assert float(vn_entropy(rho_p)) < 1e-8
    # random mixed state vs numpy eigvalsh
    a = rng.normal(size=(4, 4)) + 1j * rng.normal(size=(4, 4))
    rho_m = a @ a.conj().T
    rho_m /= np.trace(rho_m).real
    ev = np.linalg.eigvalsh(rho_m)
    ref = -(ev[ev > 1e-30] * np.log2(ev[ev > 1e-30])).sum()
    assert abs(float(vn_entropy(as_cplx(rho_m))) - ref) < 1e-8


def test_interpolate_sine_properties():
    m = np.asarray(interpolate_sine(4, 100))
    assert m.shape == (100, 4)
    # rows between control points sum to <= 1 and are non-negative
    assert (m >= -1e-12).all()
    assert (m.sum(axis=1) <= 1 + 1e-12).all()
    assert s(0.0) == pytest.approx(0.0)
    assert s(1.0) == pytest.approx(1.0)
    assert s(0.5) == pytest.approx(0.5)


def test_cplx_arithmetic(rng):
    a = rng.normal(size=(3, 3)) + 1j * rng.normal(size=(3, 3))
    b = rng.normal(size=(3, 3)) + 1j * rng.normal(size=(3, 3))
    ca, cb = as_cplx(a), as_cplx(b)
    assert np.abs(_np(ca * cb) - a * b).max() < 1e-12
    assert np.abs(_np(cmatmul(ca, cb)) - a @ b).max() < 1e-12
    assert np.abs(_np(ca / cb) - a / b).max() < 1e-12
    assert np.abs(_np(ca.mH) - a.conj().T).max() < 1e-12
    assert np.abs(_np(ckron(ca, cb)) - np.kron(a, b)).max() < 1e-12
    d = cdot(as_cplx(a[:, 0]), as_cplx(b[:, 0]))
    assert abs(complex(float(d.re), float(d.im)) - np.vdot(a[:, 0], b[:, 0])) < 1e-12
    assert np.abs(_np(ca.mul_i()) - 1j * a).max() < 1e-14
