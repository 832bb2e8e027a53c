"""Global precision / platform configuration.

The driver targets (BASELINE.md) ask for 1e-6 state fidelity and 1e-5
gradient parity, which requires float64 arithmetic for the carried state.
JAX's x64 mode is enabled at package import.  The fast Pallas kernels run
in float32 with compensated accumulation and are opt-in per solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

# Default real dtype used for all state/coefficient arrays.
_DEFAULT_DTYPE = jnp.float64


def set_default_dtype(dtype) -> None:
    global _DEFAULT_DTYPE
    if dtype not in (jnp.float32, jnp.float64):
        raise ValueError("default dtype must be float32 or float64")
    _DEFAULT_DTYPE = dtype


def default_dtype():
    return _DEFAULT_DTYPE
