"""Split-complex (struct-of-arrays) arithmetic for TPU.

TPU backends (including the one this framework targets) do not support
``complex64``/``complex128`` natively, and even where XLA emulates them the
MXU only consumes real matrices.  Every complex quantity in this framework is
therefore carried as a pair of real arrays ``(re, im)`` wrapped in the
:class:`Cplx` pytree.  This mirrors how high-performance TPU quantum
simulators lay out state vectors, and lets every inner product / matmul hit
the MXU/VPU directly.

Reference parity: the upstream project (pulser-diff) uses torch complex
tensors throughout (e.g. /root/reference/pulser_diff/hamiltonian.py:526-546);
this module is the TPU-native replacement for that representation.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

Scalar = Union[int, float, complex]


class Cplx(NamedTuple):
    """A complex array stored as separate real and imaginary parts."""

    re: jax.Array
    im: jax.Array

    # ------------------------------------------------------------------
    # basic protocol
    # ------------------------------------------------------------------
    @property
    def shape(self) -> tuple[int, ...]:
        return self.re.shape

    @property
    def ndim(self) -> int:
        return self.re.ndim

    @property
    def dtype(self):
        return self.re.dtype

    def __add__(self, other: "Cplx | Scalar") -> "Cplx":
        other = as_cplx(other, like=self)
        return Cplx(self.re + other.re, self.im + other.im)

    __radd__ = __add__

    def __sub__(self, other: "Cplx | Scalar") -> "Cplx":
        other = as_cplx(other, like=self)
        return Cplx(self.re - other.re, self.im - other.im)

    def __rsub__(self, other: "Cplx | Scalar") -> "Cplx":
        other = as_cplx(other, like=self)
        return Cplx(other.re - self.re, other.im - self.im)

    def __mul__(self, other: "Cplx | Scalar | jax.Array") -> "Cplx":
        if isinstance(other, Cplx):
            return Cplx(
                self.re * other.re - self.im * other.im,
                self.re * other.im + self.im * other.re,
            )
        if isinstance(other, complex) or (
            isinstance(other, np.generic) and np.iscomplexobj(other)
        ):
            return self * as_cplx(other, like=self)
        # real scalar / array
        return Cplx(self.re * other, self.im * other)

    __rmul__ = __mul__

    def __truediv__(self, other: "Cplx | Scalar | jax.Array") -> "Cplx":
        if isinstance(other, Cplx):
            den = other.re * other.re + other.im * other.im
            return Cplx(
                (self.re * other.re + self.im * other.im) / den,
                (self.im * other.re - self.re * other.im) / den,
            )
        if isinstance(other, complex):
            return self / as_cplx(other, like=self)
        return Cplx(self.re / other, self.im / other)

    def __neg__(self) -> "Cplx":
        return Cplx(-self.re, -self.im)

    def __getitem__(self, idx: Any) -> "Cplx":
        return Cplx(self.re[idx], self.im[idx])

    # ------------------------------------------------------------------
    # complex ops
    # ------------------------------------------------------------------
    def conj(self) -> "Cplx":
        return Cplx(self.re, -self.im)

    @property
    def T(self) -> "Cplx":
        return Cplx(self.re.T, self.im.T)

    @property
    def mH(self) -> "Cplx":
        """Conjugate transpose (matrix adjoint) over the last two axes."""
        return Cplx(
            jnp.swapaxes(self.re, -1, -2), -jnp.swapaxes(self.im, -1, -2)
        )

    def abs2(self) -> jax.Array:
        return self.re * self.re + self.im * self.im

    def abs(self) -> jax.Array:
        return jnp.sqrt(self.abs2())

    def reshape(self, *shape) -> "Cplx":
        return Cplx(self.re.reshape(*shape), self.im.reshape(*shape))

    def flatten(self) -> "Cplx":
        return Cplx(self.re.reshape(-1), self.im.reshape(-1))

    def transpose(self, *axes) -> "Cplx":
        return Cplx(self.re.transpose(*axes), self.im.transpose(*axes))

    def astype(self, dtype) -> "Cplx":
        return Cplx(self.re.astype(dtype), self.im.astype(dtype))

    def sum(self, axis=None, keepdims=False) -> "Cplx":
        return Cplx(
            jnp.sum(self.re, axis=axis, keepdims=keepdims),
            jnp.sum(self.im, axis=axis, keepdims=keepdims),
        )

    def mul_i(self) -> "Cplx":
        """Multiply by +i (rotates (re, im) -> (-im, re)) without FLOPs."""
        return Cplx(-self.im, self.re)

    def mul_neg_i(self) -> "Cplx":
        """Multiply by -i."""
        return Cplx(self.im, -self.re)

    # ------------------------------------------------------------------
    # conversion
    # ------------------------------------------------------------------
    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.re) + 1j * np.asarray(self.im)


# ----------------------------------------------------------------------
# constructors
# ----------------------------------------------------------------------
def as_cplx(x: Any, like: Cplx | None = None, dtype=None) -> Cplx:
    """Coerce scalars / numpy arrays / jax arrays into a Cplx."""
    if isinstance(x, Cplx):
        return x
    if dtype is None and like is not None:
        dtype = like.dtype
    if isinstance(x, (int, float)):
        r = jnp.asarray(x, dtype=dtype)
        return Cplx(r, jnp.zeros_like(r))
    if isinstance(x, complex) or (
        isinstance(x, np.generic) and np.iscomplexobj(x)
    ):
        return Cplx(
            jnp.asarray(x.real, dtype=dtype), jnp.asarray(x.imag, dtype=dtype)
        )
    x = np.asarray(x) if not isinstance(x, (jax.Array, jnp.ndarray)) else x
    if np.iscomplexobj(x):
        return Cplx(
            jnp.asarray(np.asarray(x).real, dtype=dtype),
            jnp.asarray(np.asarray(x).imag, dtype=dtype),
        )
    r = jnp.asarray(x, dtype=dtype)
    return Cplx(r, jnp.zeros_like(r))


def czeros(shape: Sequence[int] | int, dtype=None) -> Cplx:
    z = jnp.zeros(shape, dtype=dtype)
    return Cplx(z, z)


def cones(shape: Sequence[int] | int, dtype=None) -> Cplx:
    return Cplx(jnp.ones(shape, dtype=dtype), jnp.zeros(shape, dtype=dtype))


def ceye(n: int, dtype=None) -> Cplx:
    return Cplx(jnp.eye(n, dtype=dtype), jnp.zeros((n, n), dtype=dtype))


def cexp_i(theta: jax.Array) -> Cplx:
    """exp(i * theta) for real theta."""
    return Cplx(jnp.cos(theta), jnp.sin(theta))


# ----------------------------------------------------------------------
# linear algebra
# ----------------------------------------------------------------------
def cmatmul(a: Cplx, b: Cplx) -> Cplx:
    """Complex matmul via 4 real matmuls (MXU-friendly).

    For 3-matmul Karatsuba-style variants the extra additions usually cost
    more than the saved matmul at the small sizes this framework uses.
    """
    return Cplx(
        a.re @ b.re - a.im @ b.im,
        a.re @ b.im + a.im @ b.re,
    )


def cmatmul_rc(a: jax.Array, b: Cplx) -> Cplx:
    """Real @ complex."""
    return Cplx(a @ b.re, a @ b.im)


def cmatmul_cr(a: Cplx, b: jax.Array) -> Cplx:
    """Complex @ real."""
    return Cplx(a.re @ b, a.im @ b)


def cdot(a: Cplx, b: Cplx) -> Cplx:
    """<a|b> = sum(conj(a) * b) over all elements."""
    re = jnp.sum(a.re * b.re + a.im * b.im)
    im = jnp.sum(a.re * b.im - a.im * b.re)
    return Cplx(re, im)


def cnorm2(a: Cplx) -> jax.Array:
    return jnp.sum(a.abs2())


def cnorm(a: Cplx) -> jax.Array:
    return jnp.sqrt(cnorm2(a))


def ckron(a: Cplx, b: Cplx) -> Cplx:
    return Cplx(
        jnp.kron(a.re, b.re) - jnp.kron(a.im, b.im),
        jnp.kron(a.re, b.im) + jnp.kron(a.im, b.re),
    )


def cstack(xs: Sequence[Cplx], axis: int = 0) -> Cplx:
    return Cplx(
        jnp.stack([x.re for x in xs], axis=axis),
        jnp.stack([x.im for x in xs], axis=axis),
    )


def cconcat(xs: Sequence[Cplx], axis: int = 0) -> Cplx:
    return Cplx(
        jnp.concatenate([x.re for x in xs], axis=axis),
        jnp.concatenate([x.im for x in xs], axis=axis),
    )


def ceinsum(sub: str, a: Cplx, b: Cplx) -> Cplx:
    """Complex einsum from split re/im parts (4 real einsums)."""
    rr = jnp.einsum(sub, a.re, b.re)
    ii = jnp.einsum(sub, a.im, b.im)
    ri = jnp.einsum(sub, a.re, b.im)
    ir = jnp.einsum(sub, a.im, b.re)
    return Cplx(rr - ii, ri + ir)
