"""Per-time-point result: state + measurement weights + sampling.

Native replacement for the reference's TorchResult
(/root/reference/pulser_diff/result.py:27-191).  The bitstring-probability
logic (ground-rydberg bit-order flip, 3-level projection) is reproduced
with vectorised JAX/numpy ops instead of per-bitstring Python loops.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pulser_diff_tpu.cplx import Cplx


@lru_cache
def _level_projection_matrix(n: int, d: int, one_state: int) -> np.ndarray:
    """(2^n, d^n) 0/1 matrix P with P[b, s] = 1 iff the d-level state s
    maps to bitstring b: digit == one_state -> bit 1, any other digit
    (including a leakage level) -> bit 0.

    Vectorised equivalent of the reference's per-bitstring slice summation
    (result.py:90-114), generalised to any local dimension (3-level 'all'
    basis, leakage-extended bases).
    """
    s = np.arange(d**n)
    digits = np.zeros((d**n, n), dtype=np.int64)
    rem = s.copy()
    for k in range(n - 1, -1, -1):
        digits[:, k] = rem % d
        rem //= d
    bits = (digits == one_state).astype(np.int64)
    b_of_s = np.zeros(d**n, dtype=np.int64)
    for k in range(n):
        b_of_s = b_of_s * 2 + bits[:, k]
    P = np.zeros((2**n, d**n))
    P[b_of_s, s] = 1.0
    return P


def _three_level_projection_matrix(
    n: int, one_state: int, ex0: int, ex1: int
) -> np.ndarray:
    """Backward-compatible 3-level wrapper."""
    return _level_projection_matrix(n, 3, one_state)


# measurement "bright" label per basis (bit value 1)
_ONE_LABEL = {"ground-rydberg": "r", "digital": "h", "XY": "d"}


@dataclass
class QuantumResult:
    """State at one evaluation time (ket or density matrix).

    Args mirror reference result.py:27-44:
      atom_order, meas_basis, state (Cplx (dim,1) ket or (dim,dim) dm),
      matching_meas_basis.
    """

    atom_order: tuple
    meas_basis: str
    state: Cplx
    matching_meas_basis: bool
    basis_labels: Optional[tuple] = None  # set for leakage-extended bases

    @property
    def _size(self) -> int:
        return len(self.atom_order)

    @property
    def _dim(self) -> int:
        full = int(np.prod(self.state.shape))
        if self.state.shape[-1] != 1 and self.state.ndim == 2 and \
           self.state.shape[0] == self.state.shape[1]:
            full = int(round(full**0.5))
        return int(round(full ** (1 / self._size)))

    @property
    def _basis_name(self) -> str:
        if self._dim > 2:
            return "all"
        if self.meas_basis == "XY":
            return "XY"
        if not self.matching_meas_basis:
            return (
                "digital"
                if self.meas_basis == "ground-rydberg"
                else "ground-rydberg"
            )
        return self.meas_basis

    @property
    def sampling_errors(self) -> dict[str, float]:
        return {b: 0.0 for b in self.sampling_dist}

    def _weights(self) -> jax.Array:
        """Measurement probabilities per bitstring (2^n,), differentiable."""
        n = self._size
        st = self.state
        if st.ndim == 2 and st.shape[0] == st.shape[1] and st.shape[0] > 1:
            probs = jnp.abs(jnp.diagonal(st.re))  # dm diagonal is real
        else:
            probs = st.abs2().reshape(-1)

        if self._dim == 2:
            if self.matching_meas_basis:
                # ground-rydberg ordering has r first: flip to bit order
                weights = (
                    probs[::-1]
                    if self.meas_basis == "ground-rydberg"
                    else probs
                )
            else:
                weights = jnp.zeros_like(probs).at[0].set(1.0)
        elif self._dim in (3, 4):
            if self.basis_labels is not None:
                labels = list(self.basis_labels)
            elif self._dim == 3:
                labels = ["r", "g", "h"]  # the 'all' basis
            else:
                raise NotImplementedError(
                    "4-level states need explicit basis_labels."
                )
            one_label = _ONE_LABEL.get(self.meas_basis)
            if one_label is None or one_label not in labels:
                raise RuntimeError(
                    f"Unknown measurement basis '{self.meas_basis}' for a "
                    f"{self._dim}-level system."
                )
            P = jnp.asarray(
                _level_projection_matrix(n, self._dim, labels.index(one_label)),
                probs.dtype,
            )
            weights = P @ probs
        else:
            raise NotImplementedError(
                "Cannot sample systems with single-atom dimension > 4."
            )
        return weights / jnp.sum(weights)

    @property
    def sampling_dist(self) -> dict[str, float]:
        w = np.asarray(jax.device_get(self._weights()))
        n = self._size
        return {
            np.binary_repr(i, width=n): float(w[i])
            for i in np.nonzero(w)[0]
        }

    def get_samples(self, n_samples: int, rng: Optional[np.random.Generator] = None) -> Counter:
        """Sample bitstrings from the measurement distribution."""
        rng = rng or np.random.default_rng()
        w = np.asarray(jax.device_get(self._weights()))
        w = np.clip(w, 0, None)
        w = w / w.sum()
        n = self._size
        counts = rng.multinomial(n_samples, w)
        return Counter(
            {
                np.binary_repr(i, width=n): int(c)
                for i, c in enumerate(counts)
                if c > 0
            }
        )

    def get_state(
        self,
        reduce_to_basis: Optional[str] = None,
        ignore_global_phase: bool = True,
        tol: float = 1e-6,
        normalize: bool = True,
    ) -> Cplx:
        """State with optional global-phase removal and basis reduction.

        (The reference's version is an unimplemented stub, result.py:150;
        here the ket path is implemented natively.)
        """
        st = self.state
        is_dm = st.ndim == 2 and st.shape[0] == st.shape[1] and st.shape[0] > 1
        if ignore_global_phase and not is_dm:
            flat = st.reshape(-1)
            idx = jnp.argmax(flat.abs2())
            mag = jnp.sqrt(flat.abs2()[idx])
            ph_re = flat.re[idx] / jnp.where(mag > 0, mag, 1.0)
            ph_im = -flat.im[idx] / jnp.where(mag > 0, mag, 1.0)
            st = st * Cplx(ph_re, ph_im)
        if reduce_to_basis is None or self._dim != 3:
            if reduce_to_basis not in (None, self._basis_name) and self._dim != 3:
                raise TypeError(
                    f"Can't reduce a system in {self._basis_name} to the "
                    f"{reduce_to_basis} basis."
                )
            return st
        # 3-level reduction: drop the excluded state's levels (kets AND
        # density matrices — the reference stubs this entirely, ref
        # result.py:150)
        if reduce_to_basis == "ground-rydberg":
            ex_digit = 2  # |h>
            keep = (0, 1)
        elif reduce_to_basis == "digital":
            ex_digit = 0  # |r>
            keep = (1, 2)
        else:
            raise ValueError(
                "'reduce_to_basis' must be 'ground-rydberg' or 'digital', "
                f"not '{reduce_to_basis}'."
            )
        n = self._size
        s = np.arange(3**n)
        digits = np.zeros((3**n, n), dtype=np.int64)
        rem = s.copy()
        for k in range(n - 1, -1, -1):
            digits[:, k] = rem % 3
            rem //= 3
        has_ex = (digits == ex_digit).any(axis=1)
        keep_idx = np.where(~has_ex)[0]
        if is_dm:
            # density matrix: excluded population lives on the diagonal
            diag = jnp.diagonal(st.re)
            ex_pop = float(
                np.sum(np.asarray(jax.device_get(diag))[has_ex])
            )
            if ex_pop > tol:
                raise TypeError(
                    "Can't reduce to chosen basis because the population "
                    "of a state to eliminate is above the allowed "
                    "tolerance."
                )
            k = jnp.asarray(keep_idx)
            red = Cplx(st.re[k][:, k], st.im[k][:, k])
            if normalize:
                tr = jnp.trace(red.re)
                red = red * (1.0 / jnp.where(tr > 0, tr, 1.0))
            return red
        flat = st.reshape(-1)
        ex_pop = float(np.sum(np.asarray(jax.device_get(flat.abs2()))[has_ex]))
        if ex_pop > tol:
            raise TypeError(
                "Can't reduce to chosen basis because the population of a "
                "state to eliminate is above the allowed tolerance."
            )
        red = flat[jnp.asarray(keep_idx)]
        if normalize:
            nrm = jnp.sqrt(jnp.sum(red.abs2()))
            red = red * (1.0 / jnp.where(nrm > 0, nrm, 1.0))
        return red.reshape(2**n, 1)
