"""Smooth-envelope factories for duration-differentiable pulses.

Native equivalent of reference waveform_funcs.py:9-27: a boxcar envelope
built from tanh edges, making the pulse *duration* a smooth (hence
differentiable) parameter.  Works on JAX arrays or deferred Exprs.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

from pulser_diff_tpu.core.variables import Expr


def _tanh(x: Any) -> Any:
    return x.tanh() if isinstance(x, Expr) else jnp.tanh(x)


def constant_waveform(
    ti: Any,
    tf: Any,
    value: Any,
    edge_steepness: float = 1.0,
) -> Callable:
    """Returns ``f(t_ns)`` = value * smooth-boxcar(t; ti, tf).

    ti/tf are in us (multiplied by 1000 inside, reference parity); the
    edges are tanh sigmoids of width ~1/edge_steepness ns.  Accepts JAX
    arrays or deferred sequence Exprs for ti/tf/value.
    """

    def pulse_envelope(t: Any) -> Any:
        is_zero = isinstance(ti, (int, float)) and ti == 0
        if is_zero:
            fn = value * 0.5 * (1.0 + _tanh(edge_steepness * (-(t - tf * 1000))))
        else:
            fn = value * (
                0.5 * (1.0 + _tanh(edge_steepness * (t - ti * 1000)))
                + 0.5 * (1.0 + _tanh(edge_steepness * (-(t - tf * 1000))))
                - 1.0
            )
        return fn

    return pulse_envelope
