"""Derivative helpers (native replacement for reference derivative.py).

The reference pulls gradients out of torch's autograd graph after a solve
(derivative.py:26-78); in JAX the same quantities are VJPs of *functions*:

  - :func:`deriv_time`   — d f(t_i) / d t_i for a function of the
    evaluation times (reference deriv_time, derivative.py:26), including
    the pulse-boundary artifact repair (`_fix_border_vals`,
    derivative.py:7-23).
  - :func:`deriv_param`  — VJP of f w.r.t. a list of parameters with a
    one-hot cotangent selecting a single evaluation time (reference
    deriv_param, derivative.py:49).

Both accept a *callable* (the JAX-functional style); `deriv_time` is what
`QuantumModel`/notebook users apply to `lambda times: expectation(times)`.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def _fix_border_vals(
    deriv: np.ndarray, border_indices: Sequence[int], dt: float
) -> np.ndarray:
    """Replace derivative values at pulse boundaries by linear
    extrapolation from neighbouring points (reference derivative.py:7-23).

    Piecewise-continuous pulse profiles make df/dt jump at slot edges; the
    autodiff derivative at the boundary sample mixes both sides, so it is
    rebuilt from the interior samples instead.
    """
    deriv = np.array(deriv, copy=True)
    prev_idx = 0
    for idx in border_indices:
        if idx == 0:
            deriv[0] = deriv[2] - ((deriv[2] - deriv[1]) / dt) * 2 * dt
            prev_idx = idx
        else:
            if (idx - prev_idx) != 1 or idx + 3 >= len(deriv):
                deriv[idx - 1] = (
                    deriv[idx - 3]
                    + ((deriv[idx - 2] - deriv[idx - 3]) / dt) * 2 * dt
                )
                deriv[idx] = (
                    deriv[idx - 2]
                    + ((deriv[idx - 1] - deriv[idx - 2]) / dt) * 2 * dt
                )
            else:
                deriv[idx] = (
                    deriv[idx + 2]
                    - ((deriv[idx + 2] - deriv[idx + 1]) / dt) * 2 * dt
                )
            prev_idx = idx
    return deriv


def deriv_time(
    f: Callable[[jax.Array], jax.Array],
    times: jax.Array,
    pulse_endtimes: Optional[list] = None,
) -> jax.Array:
    """Derivative of a time-indexed output w.r.t. the evaluation times.

    Args:
        f: function mapping evaluation times (n,) -> values (n,), e.g.
           ``lambda ts: emulator_expectation(ts)``.  Real-valued.
        times: evaluation times (us).
        pulse_endtimes: indices of pulse starts/ends in the time grid
           (``TpuEmulator.endtimes``); when given, boundary artifacts are
           repaired by linear extrapolation.

    Returns:
        df/dt at each time (the VJP of f with an all-ones cotangent, the
        exact analogue of reference derivative.py:40).
    """
    val, vjp = jax.vjp(f, times)
    (res,) = vjp(jnp.ones_like(val))
    if pulse_endtimes is not None:
        dt = float(times[1] - times[0])
        res_np = _fix_border_vals(
            np.asarray(jax.device_get(res)), pulse_endtimes, dt
        )
        res = jnp.asarray(res_np, res.dtype)
    return res


def deriv_param(
    f: Callable[..., jax.Array],
    x: Union[Sequence[jax.Array], jax.Array],
    times: Optional[jax.Array] = None,
    t: Optional[Union[int, float, jax.Array]] = None,
) -> tuple:
    """Gradient of f(x...) at one selected evaluation time.

    Args:
        f: function of the parameter list, returning values over the
           evaluation times (n,).  Real-valued.
        x: list of parameters (JAX arrays).
        times: the evaluation-times array; needed when selecting `t`.
        t: time (ns) at which the derivative is taken; defaults to the
           final time.

    Returns:
        Tuple of gradients, one per parameter (reference derivative.py:49).
    """
    xs = list(x) if isinstance(x, (list, tuple)) else [x]
    val, vjp = jax.vjp(lambda *args: f(*args), *xs)
    v = np.zeros(val.shape, dtype=np.asarray(jax.device_get(val)).dtype)
    if times is None:
        v[-1] = 1.0
    else:
        tt = float(times[-1]) if t is None else float(t) / 1000
        idx = int(
            np.abs(np.asarray(jax.device_get(times)) - tt).argmin()
        )
        v[idx] = 1.0
    grads = vjp(jnp.asarray(v, val.dtype))
    return grads
