"""Atom register (native replacement for pulser.Register).

Coordinates are JAX arrays (um) and may carry gradients — the reference
enables this with torch tensors + requires_grad (see
/root/reference/pulser_diff/model.py:168-182); here any register whose
coordinates are traced arrays is differentiable automatically.
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from pulser_diff_tpu.config import default_dtype

QubitId = Any


class Register:
    """Associates qubit ids to 2D (or 3D) coordinates in um."""

    def __init__(self, qubits: Mapping[QubitId, Any]) -> None:
        if not qubits:
            raise ValueError("Register cannot be empty.")
        self._coords: dict[QubitId, jax.Array] = {
            qid: jnp.asarray(c, dtype=default_dtype()) for qid, c in qubits.items()
        }
        dims = {int(v.shape[-1]) for v in self._coords.values()}
        if len(dims) != 1:
            raise ValueError("All coordinates must have the same dimension.")
        self._dim = dims.pop()

    # ------------------------------------------------------------------
    @property
    def qubits(self) -> dict[QubitId, jax.Array]:
        return dict(self._coords)

    @property
    def qubit_ids(self) -> tuple[QubitId, ...]:
        return tuple(self._coords.keys())

    @property
    def dimensionality(self) -> int:
        return self._dim

    def __len__(self) -> int:
        return len(self._coords)

    @property
    def coords_array(self) -> jax.Array:
        """(n_qubits, dim) stacked coordinates, in declaration order."""
        return jnp.stack(list(self._coords.values()))

    # ------------------------------------------------------------------
    # constructors (pulser parity)
    # ------------------------------------------------------------------
    @classmethod
    def from_coordinates(
        cls,
        coords: Iterable[Any],
        prefix: str | None = None,
        labels: Iterable[QubitId] | None = None,
        center: bool = False,
    ) -> "Register":
        coords = list(coords)
        if center:
            arr = jnp.stack([jnp.asarray(c, default_dtype()) for c in coords])
            arr = arr - arr.mean(axis=0)
            coords = [arr[i] for i in range(arr.shape[0])]
        if labels is not None:
            ids = list(labels)
            if len(ids) != len(coords):
                raise ValueError("Label count must match coordinate count.")
        elif prefix is not None:
            ids = [f"{prefix}{i}" for i in range(len(coords))]
        else:
            ids = list(range(len(coords)))
        return cls(dict(zip(ids, coords)))

    @classmethod
    def rectangle(
        cls, rows: int, columns: int, spacing: float = 4.0, prefix: str | None = None
    ) -> "Register":
        xs, ys = np.meshgrid(np.arange(columns), np.arange(rows))
        coords = np.stack([xs.ravel(), ys.ravel()], axis=-1) * spacing
        coords = coords - coords.mean(axis=0)
        return cls.from_coordinates(coords, prefix=prefix)

    @classmethod
    def square(cls, side: int, spacing: float = 4.0, prefix: str | None = None) -> "Register":
        return cls.rectangle(side, side, spacing, prefix)

    @classmethod
    def linear(cls, n: int, spacing: float = 4.0, prefix: str | None = None) -> "Register":
        coords = np.stack([np.arange(n) * spacing, np.zeros(n)], axis=-1)
        coords = coords - coords.mean(axis=0)
        return cls.from_coordinates(coords, prefix=prefix)

    @classmethod
    def triangular_lattice(
        cls,
        rows: int,
        atoms_per_row: int,
        spacing: float = 4.0,
        prefix: str | None = None,
    ) -> "Register":
        coords = []
        for r in range(rows):
            for c in range(atoms_per_row):
                x = (c + 0.5 * (r % 2)) * spacing
                y = r * spacing * np.sqrt(3) / 2
                coords.append((x, y))
        arr = np.asarray(coords)
        arr = arr - arr.mean(axis=0)
        return cls.from_coordinates(arr, prefix=prefix)

    def with_coords(self, coords: Mapping[QubitId, Any]) -> "Register":
        """New register with (a subset of) coordinates replaced."""
        new = dict(self._coords)
        for k, v in coords.items():
            new[k] = jnp.asarray(v, default_dtype())
        return Register(new)

    def __repr__(self) -> str:
        return f"Register({self._coords})"
