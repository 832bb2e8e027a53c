"""Simulation results containers (CoherentResults / NoisyResults).

Native replacement for reference simresults.py (SimulationResults ABC
:37, NoisyResults :225, CoherentResults :347).  qutip-free: measurement
projectors and pseudo-densities are built directly in JAX; plotting uses
matplotlib on host.
"""

from __future__ import annotations

import typing
from abc import ABC, abstractmethod
from collections import Counter
from typing import Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pulser_diff_tpu.config import default_dtype
from pulser_diff_tpu.cplx import Cplx, cstack
from pulser_diff_tpu.ops.linalg import expect as _expect
from pulser_diff_tpu.result import QuantumResult


class SampledResult:
    """Counter-of-bitstrings result for one time point (pulser parity)."""

    def __init__(self, atom_order: tuple, meas_basis: str, bitstring_counts: Counter) -> None:
        self.atom_order = atom_order
        self.meas_basis = meas_basis
        self.bitstring_counts = Counter(bitstring_counts)
        total = sum(self.bitstring_counts.values())
        self._total = total

    @property
    def sampling_dist(self) -> dict[str, float]:
        return {
            b: c / self._total for b, c in self.bitstring_counts.items()
        }

    def get_samples(self, n_samples: int) -> Counter:
        rng = np.random.default_rng()
        keys = list(self.bitstring_counts.keys())
        probs = np.array([self.bitstring_counts[k] for k in keys], dtype=float)
        probs /= probs.sum()
        counts = rng.multinomial(n_samples, probs)
        return Counter({k: int(c) for k, c in zip(keys, counts) if c > 0})


class SimulationResults(ABC):
    """Shared results API (reference simresults.py:37-222)."""

    _use_pseudo_dens: bool = False

    def __init__(self, size: int, basis_name: str, sim_times: jax.Array) -> None:
        self._dim = 3 if basis_name == "all" else 2
        self._size = size
        if basis_name not in {"ground-rydberg", "digital", "all", "XY"}:
            raise ValueError(
                "`basis_name` must be 'ground-rydberg', 'digital', 'all' or "
                "'XY'."
            )
        self._basis_name = basis_name
        self._sim_times = sim_times
        self._results: tuple = ()

    # -- container protocol --------------------------------------------
    def __len__(self) -> int:
        return len(self._results)

    def __getitem__(self, i: int):
        return self._results[i]

    def __iter__(self):
        return iter(self._results)

    # -- core API --------------------------------------------------------
    @property
    @abstractmethod
    def states(self) -> Cplx:
        """States at all simulation times."""

    @abstractmethod
    def get_state(self, t: float) -> Cplx:
        ...

    @abstractmethod
    def get_final_state(self) -> Cplx:
        ...

    def expect(self, obs_list: Sequence) -> list[Cplx]:
        """Expectation values of each observable over time.

        Accepts Cplx or array observables of shape (dim^size, dim^size),
        or 1-D diagonals of shape (dim^size,) — the memory-scaling form
        for large systems (pseudo-density path uses 2^size).  Mirrors
        reference simresults.py:81-129, including the diagonal-observable
        restriction on the pseudo-density path.
        """
        if not isinstance(obs_list, (list, tuple)):
            raise TypeError("`obs_list` must be a list of operators.")
        from pulser_diff_tpu.cplx import as_cplx

        dim = self._dim if not self._use_pseudo_dens else 2
        legal = (dim**self._size, dim**self._size)
        out = []
        for obs in obs_list:
            obs = as_cplx(obs, dtype=default_dtype())
            if obs.shape not in (legal, legal[:1]):
                raise ValueError(
                    f"Incompatible shape of observable. Expected {legal} "
                    f"or {legal[:1]}, got {obs.shape}."
                )
            if self._use_pseudo_dens:
                diag_only = obs.ndim == 1 or bool(
                    np.allclose(
                        np.asarray(jax.device_get(obs.re)),
                        np.diag(np.diagonal(np.asarray(jax.device_get(obs.re)))),
                    )
                    and np.allclose(
                        np.asarray(jax.device_get(obs.im)),
                        np.diag(np.diagonal(np.asarray(jax.device_get(obs.im)))),
                    )
                )
                if not diag_only:
                    raise ValueError(f"Observable is non-diagonal.")
                states = self._pseudo_density_states()
            else:
                states = self.states
            out.append(_expect(obs, states))
        return out

    def sample_state(self, t: float, n_samples: int = 1000, t_tol: float = 1e-3) -> Counter:
        t_index = self._get_index_from_time(t, t_tol)
        return self[t_index].get_samples(n_samples)

    def sample_final_state(self, N_samples: int = 1000) -> Counter:
        return self.sample_state(float(self._sim_times[-1]), N_samples)

    def plot(self, op, fmt: str = "", label: str = "") -> None:
        import matplotlib.pyplot as plt

        vals = self.expect([op])[0]
        plt.plot(
            np.asarray(jax.device_get(self._sim_times)),
            np.asarray(jax.device_get(vals.re)),
            fmt,
            label=label,
        )
        plt.xlabel("Time (µs)")
        plt.ylabel("Expectation value")

    def _get_index_from_time(self, t_float: float, tol: float = 1e-3) -> int:
        times = np.asarray(jax.device_get(self._sim_times))
        hits = np.where(np.abs(t_float - times) < tol)[0]
        if len(hits) == 0:
            raise IndexError(
                f"Given time {t_float} is absent from Simulation times "
                f"within tolerance {tol}."
            )
        return int(hits[0])

    # -- pseudo-density machinery (reference simresults.py:187-222) ------
    def _meas_kernel_1q(self) -> np.ndarray:
        """(2, 2) kernel K[state, bit]: probability weight of measuring
        physical state `state` given bit value `bit`."""
        K = np.zeros((2, 2))
        for bit in (0, 1):
            good = 1 - bit if self._basis_name == "ground-rydberg" else bit
            K[good, bit] = 1.0
        return K

    def _pseudo_density_states(self) -> Cplx:
        mats = [self._calc_pseudo_density(i) for i in range(len(self))]
        return cstack(mats)

    def _calc_pseudo_density(self, t_index: int) -> Cplx:
        """Diagonal pseudo-density matrix from measurement weights."""
        w = self._weights_at(t_index)
        K1 = jnp.asarray(self._meas_kernel_1q(), default_dtype())
        K = K1
        for _ in range(self._size - 1):
            K = jnp.kron(K, K1)
        diag = K @ w
        return Cplx(jnp.diag(diag), jnp.zeros((len(diag), len(diag)), diag.dtype))

    def _weights_at(self, t_index: int) -> jax.Array:
        raise NotImplementedError


class NoisyResults(SimulationResults):
    """Results of stochastic (multi-run sampled) simulations
    (reference simresults.py:225-344)."""

    _use_pseudo_dens: bool = True

    def __init__(
        self,
        run_output: typing.Sequence[SampledResult],
        size: int,
        basis_name: str,
        sim_times: jax.Array,
        n_measures: int,
    ) -> None:
        basis_name_ = "digital" if basis_name == "all" else basis_name
        super().__init__(size, basis_name_, sim_times)
        self.n_measures = n_measures
        self._results = tuple(run_output)

    @property
    def states(self) -> Cplx:
        return self._pseudo_density_states()

    @property
    def results(self) -> list[Counter]:
        return [Counter(res.sampling_dist) for res in self]

    def _weights_at(self, t_index: int) -> jax.Array:
        dist = self[t_index].sampling_dist
        w = np.zeros(2**self._size)
        for b, p in dist.items():
            w[int(b, 2)] = p
        return jnp.asarray(w, default_dtype())

    def get_state(self, t: float, t_tol: float = 1e-3) -> Cplx:
        return self._calc_pseudo_density(self._get_index_from_time(t, t_tol))

    def get_final_state(self) -> Cplx:
        return self.get_state(float(self._sim_times[-1]))

    def plot(self, op, fmt: str = ".", label: str = "", error_bars: bool = True) -> None:
        import matplotlib.pyplot as plt

        if error_bars:
            moy = self.expect([op])[0]
            states = self.states
            # var = <O^2> - <O>^2 on the diagonal pseudo-densities
            from pulser_diff_tpu.cplx import as_cplx, cmatmul

            opc = as_cplx(op, dtype=default_dtype())
            # 1-D op is diag(op): O^2 squares elementwise
            o2 = opc * opc if opc.ndim == 1 else cmatmul(opc, opc)
            exp2 = self.expect([o2])[0]
            var = exp2.re - moy.re**2
            st = np.sqrt(
                np.clip(np.asarray(jax.device_get(var)), 0, None) / self.n_measures
            )
            plt.errorbar(
                np.asarray(jax.device_get(self._sim_times)),
                np.asarray(jax.device_get(moy.re)),
                st,
                fmt=fmt,
                lw=1,
                capsize=3,
                label=label,
            )
            plt.xlabel("Time (µs)")
            plt.ylabel("Expectation value")
        else:
            super().plot(op, fmt, label)


class CoherentResults(SimulationResults):
    """Results of deterministic (state-resolving) simulations
    (reference simresults.py:347-540)."""

    def __init__(
        self,
        run_output: typing.Sequence[QuantumResult],
        size: int,
        basis_name: str,
        sim_times: jax.Array,
        meas_basis: str,
        meas_errors: Optional[Mapping[str, float]] = None,
    ) -> None:
        super().__init__(size, basis_name, sim_times)
        if self._basis_name == "all":
            if meas_basis not in {"ground-rydberg", "digital"}:
                raise ValueError(
                    "`meas_basis` must be 'ground-rydberg' or 'digital'."
                )
        elif meas_basis != self._basis_name:
            raise ValueError(
                "`meas_basis` and `basis_name` must have the same value."
            )
        self._meas_basis = meas_basis
        self._results = tuple(run_output)
        if meas_errors is not None:
            if set(meas_errors) != {"epsilon", "epsilon_prime"}:
                raise ValueError(
                    "When defining measurement errors, only values of "
                    "'epsilon' and 'epsilon_prime' must be given."
                )
            self._use_pseudo_dens = True
        self._meas_errors = meas_errors

    @property
    def states(self) -> Cplx:
        return cstack([res.state for res in self])

    def _weights_at(self, t_index: int) -> jax.Array:
        return self[t_index]._weights()

    def _meas_kernel_1q(self) -> np.ndarray:
        if self._meas_errors:
            eps = float(np.asarray(jax.device_get(self._meas_errors["epsilon"])))
            eps_p = float(
                np.asarray(jax.device_get(self._meas_errors["epsilon_prime"]))
            )
            K = np.zeros((2, 2))
            for bit in (0, 1):
                err = eps if bit == 0 else eps_p
                good = 1 - bit if self._basis_name == "ground-rydberg" else bit
                K[good, bit] = 1 - err
                K[1 - good, bit] = err
            return K
        return super()._meas_kernel_1q()

    def get_state(
        self,
        t: float,
        reduce_to_basis: Optional[str] = None,
        ignore_global_phase: bool = True,
        tol: float = 1e-6,
        normalize: bool = True,
        t_tol: float = 1e-3,
    ) -> Cplx:
        t_index = self._get_index_from_time(t, t_tol)
        return self[t_index].get_state(
            reduce_to_basis, ignore_global_phase, tol, normalize
        )

    def get_final_state(
        self,
        reduce_to_basis: Optional[str] = None,
        ignore_global_phase: bool = True,
        tol: float = 1e-6,
        normalize: bool = True,
    ) -> Cplx:
        return self.get_state(
            float(self._sim_times[-1]),
            reduce_to_basis,
            ignore_global_phase,
            tol,
            normalize,
        )

    def sample_state(self, t: float, n_samples: int = 1000, t_tol: float = 1e-3) -> Counter:
        """Sample with optional SPAM measurement-error bit flips
        (reference simresults.py:497-540)."""
        sampled = super().sample_state(t, n_samples, t_tol)
        if self._meas_errors is None:
            return sampled
        eps = float(np.asarray(jax.device_get(self._meas_errors["epsilon"])))
        eps_p = float(
            np.asarray(jax.device_get(self._meas_errors["epsilon_prime"]))
        )
        if eps == 0.0 and eps_p == 0.0:
            return sampled
        rng = np.random.default_rng()
        shots = list(sampled.keys())
        n_det = np.array(list(sampled.values()))
        shot_arr = np.array([[int(c) for c in s] for s in shots], dtype=np.int64)
        flip_probs = np.where(shot_arr == 1, eps_p, eps)
        flip_rep = np.repeat(flip_probs, n_det, axis=0)
        rand = rng.random(flip_rep.shape)
        flips = rand < flip_rep
        new_shots = np.repeat(shot_arr, n_det, axis=0) ^ flips
        out: Counter = Counter(map(tuple, new_shots))
        return Counter({"".join(map(str, k)): v for k, v in out.items()})
