"""Differentiable waveforms (native replacement for pulser-core waveforms).

The reference consumes pulser's waveforms through ``sampler.sample`` (see
/root/reference/pulser_diff/backend.py:700-705); here the waveforms are
first-class JAX citizens: every shape parameter (value, start/stop, area,
sample arrays, interpolation control points) may be a JAX array or a
deferred :class:`~.variables.Expr`, and ``samples`` is differentiable with
respect to all of them.

Conventions (identical to pulser):
  - ``duration`` is an integer number of nanoseconds (static — shapes in
    XLA must be known at trace time).
  - samples are one value per ns, in rad/us for amplitude/detuning.
  - Blackman/Kaiser waveforms are parametrized by their integrated *area*
    (rad), with ``sum(samples) * 1e-3 == area``.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence as TSequence

import jax
import jax.numpy as jnp
import numpy as np

from pulser_diff_tpu.config import default_dtype
from pulser_diff_tpu.core.variables import Expr, evaluate


def _as_array(x: Any) -> jax.Array:
    return x if isinstance(x, jax.Array) else jnp.asarray(x, default_dtype())


def _concrete_duration(duration: Any) -> int:
    if isinstance(duration, Expr):
        raise ValueError(
            "Waveform duration is still parametrized; call build() first."
        )
    return int(duration)


class Waveform:
    """Base class. Subclasses define `_samples()` over concrete params."""

    _param_names: tuple[str, ...] = ()

    def __init__(self, duration: Any) -> None:
        self._duration = duration

    # ------------------------------------------------------------------
    @property
    def duration(self) -> int:
        return _concrete_duration(self._duration)

    @property
    def is_parametrized(self) -> bool:
        if isinstance(self._duration, Expr):
            return True
        return any(
            isinstance(getattr(self, n), Expr) for n in self._param_names
        )

    def build(self, values: Mapping[str, Any]) -> "Waveform":
        """Substitute variable values, returning a concrete waveform."""
        if not self.is_parametrized:
            return self
        kwargs = {n: evaluate(getattr(self, n), values) for n in self._param_names}
        dur = evaluate(self._duration, values)
        if not isinstance(dur, int):
            dur = int(np.round(np.asarray(jax.device_get(dur))))
        return type(self)(dur, **kwargs)

    @property
    def samples(self) -> jax.Array:
        """One sample per ns; differentiable w.r.t. waveform parameters.

        When every parameter is a plain host scalar (nothing traced, no
        device arrays) the samples come from the native C++ kernels
        (native/sampler.cpp via pulser_diff_tpu.native) — eager jnp
        dispatch would otherwise ship dozens of tiny ops through the
        remote-device tunnel per waveform.  Traced/array parameters always
        take the differentiable JAX path.
        """
        if self.is_parametrized:
            raise ValueError(
                "Cannot sample a parametrized waveform; call build() first."
            )
        if self._host_concrete():
            try:
                out = self._samples_native()
            except Exception:
                out = None
            if out is not None:
                return jnp.asarray(out, default_dtype())
        return self._samples()

    def _host_concrete(self) -> bool:
        """True when no parameter is a JAX array (incl. tracers)."""
        for n in self._param_names:
            v = getattr(self, n)
            if isinstance(v, jax.Array):
                return False
            if isinstance(v, (list, tuple)) and any(
                isinstance(x, jax.Array) for x in v
            ):
                return False
        return True

    def _samples_native(self):
        """Native (C++) sample computation; None = no native kernel."""
        return None

    def _samples(self) -> jax.Array:
        raise NotImplementedError

    @property
    def first_value(self) -> jax.Array:
        return self.samples[0]

    @property
    def last_value(self) -> jax.Array:
        return self.samples[-1]

    @property
    def integral(self) -> jax.Array:
        """Waveform integral in [rad] (samples are rad/us, steps are ns)."""
        return jnp.sum(self.samples) * 1e-3

    def change_duration(self, new_duration: int) -> "Waveform":
        raise NotImplementedError(
            f"{type(self).__name__} cannot be stretched/contracted."
        )

    def modulated_samples(self, channel) -> jax.Array:
        """Samples after the channel's modulation-bandwidth transfer
        function, extended by the rise/fall tail (pulser's
        ``Waveform.modulated_samples``)."""
        return channel.modulate(self.samples)

    def draw(
        self,
        output_channel=None,
        fig_name: str | None = None,
        kwargs_savefig: dict = {},
    ) -> None:
        """Plot the waveform (pulser's ``Waveform.draw``); with an
        ``output_channel``, overlay the modulated output."""
        import matplotlib.pyplot as plt

        s = np.asarray(jax.device_get(self.samples))
        fig, ax = plt.subplots(figsize=(8, 3))
        ax.plot(np.arange(s.shape[0]), s, color="darkgreen", label="input")
        if output_channel is not None:
            m = np.asarray(jax.device_get(self.modulated_samples(output_channel)))
            ax.plot(
                np.arange(m.shape[0]), m, color="crimson", linestyle="--",
                label="modulated output",
            )
            ax.legend()
        ax.set_xlabel("t (ns)")
        ax.set_ylabel("value (rad/µs)")
        if fig_name is not None:
            plt.savefig(fig_name, **kwargs_savefig)
        plt.show()

    def __eq__(self, other: object) -> bool:  # pragma: no cover - debug aid
        if not isinstance(other, Waveform):
            return NotImplemented
        try:
            return self.duration == other.duration and bool(
                jnp.allclose(self.samples, other.samples)
            )
        except ValueError:
            return NotImplemented

    def __hash__(self) -> int:
        return id(self)


class ConstantWaveform(Waveform):
    """Constant-valued waveform (pulser ConstantWaveform)."""

    _param_names = ("value",)

    def __init__(self, duration: Any, value: Any) -> None:
        super().__init__(duration)
        self.value = value

    def _samples(self) -> jax.Array:
        v = _as_array(self.value)
        return jnp.broadcast_to(v, (self.duration,)).astype(default_dtype())

    def change_duration(self, new_duration: int) -> "ConstantWaveform":
        return ConstantWaveform(new_duration, self.value)

    def __repr__(self) -> str:
        return f"ConstantWaveform({self._duration}, {self.value})"


class RampWaveform(Waveform):
    """Linear ramp from ``start`` to ``stop`` (pulser RampWaveform)."""

    _param_names = ("start", "stop")

    def __init__(self, duration: Any, start: Any, stop: Any) -> None:
        super().__init__(duration)
        self.start = start
        self.stop = stop

    def _samples(self) -> jax.Array:
        d = self.duration
        start = _as_array(self.start)
        stop = _as_array(self.stop)
        frac = jnp.arange(d, dtype=default_dtype()) / max(d - 1, 1)
        return start + (stop - start) * frac

    def _samples_native(self):
        from pulser_diff_tpu import native

        if not native.available():
            return None
        return native.ramp(
            self.duration, float(self.start), float(self.stop)
        )

    @property
    def slope(self) -> jax.Array:
        return (_as_array(self.stop) - _as_array(self.start)) / (
            (self.duration - 1) * 1e-3
        )

    def __repr__(self) -> str:
        return f"RampWaveform({self._duration}, {self.start}, {self.stop})"


def _blackman_window(n: int) -> jax.Array:
    if n == 1:
        return jnp.ones((1,), default_dtype())
    k = jnp.arange(n, dtype=default_dtype())
    x = 2.0 * jnp.pi * k / (n - 1)
    return 0.42 - 0.5 * jnp.cos(x) + 0.08 * jnp.cos(2 * x)


class BlackmanWaveform(Waveform):
    """Blackman window scaled to a target pulse area (pulser equivalent)."""

    _param_names = ("area",)

    def __init__(self, duration: Any, area: Any) -> None:
        super().__init__(duration)
        self.area = area

    @classmethod
    def from_max_val(cls, max_val: float, area: Any) -> "BlackmanWaveform":
        """Shortest Blackman waveform of the given area whose peak stays
        at or below ``max_val`` (pulser parity; exact search)."""
        area_f = float(np.asarray(jax.device_get(_as_array(area))))
        if area_f * max_val < 0:
            raise ValueError("area and max_val must have matching signs")
        # pure-numpy window for the host-side search: avoids a device
        # dispatch per bisection probe (tests pin _blackman_window
        # against np.blackman)
        duration = _shortest_duration_for_peak(
            lambda d: np.clip(np.blackman(d), 0.0, None), area_f, max_val
        )
        return cls(duration, area)

    def _samples(self) -> jax.Array:
        w = jnp.clip(_blackman_window(self.duration), 0.0, None)
        area = _as_array(self.area)
        return w * (area / (jnp.sum(w) * 1e-3))

    def _samples_native(self):
        from pulser_diff_tpu import native

        if not native.available() or self.duration == 1:
            return None
        return native.blackman(self.duration, float(self.area))

    def change_duration(self, new_duration: int) -> "BlackmanWaveform":
        return BlackmanWaveform(new_duration, self.area)

    def __repr__(self) -> str:
        return f"BlackmanWaveform({self._duration}, {self.area})"


def _shortest_duration_for_peak(
    window_np, area_f: float, max_val: float
) -> int:
    """Smallest duration whose area-normalized window peak
    ``max(w) * |area| / (sum(w) * 1e-3)`` stays at or below
    ``|max_val|`` — peak scales ~1/duration, so bracket by doubling and
    bisect."""

    def peak(duration: int) -> float:
        w = window_np(duration)
        s = float(w.sum())
        if s <= 0.0:
            return float("inf")  # degenerate (e.g. 1-sample) window
        return float(w.max()) * abs(area_f) / (s * 1e-3)

    hi = 1
    while peak(hi) > abs(max_val):
        hi *= 2
        if hi > 10_000_000:
            raise ValueError(
                "area/max_val combination needs an unreasonable duration."
            )
    lo = hi // 2  # peak(lo) > bound (or lo == 0)
    while hi - lo > 1:
        mid = (lo + hi) // 2
        if mid == 0 or peak(mid) > abs(max_val):
            lo = mid
        else:
            hi = mid
    return hi


def _kaiser_window(n: int, beta: float) -> jax.Array:
    if n == 1:
        return jnp.ones((1,), default_dtype())
    k = jnp.arange(n, dtype=default_dtype())
    r = 2.0 * k / (n - 1) - 1.0
    num = jax.scipy.special.i0(beta * jnp.sqrt(jnp.clip(1 - r * r, 0.0, None)))
    return num / jax.scipy.special.i0(jnp.asarray(beta, default_dtype()))


class KaiserWaveform(Waveform):
    """Kaiser window scaled to a target pulse area (pulser equivalent)."""

    _param_names = ("area",)

    def __init__(self, duration: Any, area: Any, beta: float = 14.6) -> None:
        super().__init__(duration)
        self.area = area
        self.beta = beta

    def build(self, values: Mapping[str, Any]) -> "KaiserWaveform":
        if not self.is_parametrized:
            return self
        dur = evaluate(self._duration, values)
        if not isinstance(dur, int):
            dur = int(np.round(np.asarray(jax.device_get(dur))))
        return KaiserWaveform(dur, evaluate(self.area, values), self.beta)

    def _samples(self) -> jax.Array:
        w = _kaiser_window(self.duration, self.beta)
        area = _as_array(self.area)
        return w * (area / (jnp.sum(w) * 1e-3))

    def _samples_native(self):
        from pulser_diff_tpu import native

        if not native.available() or self.duration == 1:
            return None
        return native.kaiser(
            self.duration, float(self.area), float(self.beta)
        )

    @classmethod
    def from_max_val(
        cls, max_val: float, area: Any, beta: float = 14.6
    ) -> "KaiserWaveform":
        """Shortest Kaiser waveform of the given area whose peak value
        does not exceed ``max_val`` (pulser's
        ``KaiserWaveform.from_max_val``; sign of ``max_val`` bounds the
        signed area)."""
        area_f = float(np.asarray(jax.device_get(area)))
        if max_val * area_f < 0:
            raise ValueError("max_val and area must have matching signs.")
        # pure-numpy window for the host-side search (pinned against
        # _kaiser_window by tests) — no device dispatch per probe
        duration = _shortest_duration_for_peak(
            lambda d: np.kaiser(d, beta), area_f, max_val
        )
        return cls(duration, area, beta)

    def change_duration(self, new_duration: int) -> "KaiserWaveform":
        return KaiserWaveform(new_duration, self.area, self.beta)

    def __repr__(self) -> str:
        return f"KaiserWaveform({self._duration}, {self.area}, beta={self.beta})"


class CustomWaveform(Waveform):
    """Waveform from an explicit per-ns sample array."""

    _param_names = ("_sample_arr",)

    def __init__(self, samples: Any, duration: Any = None) -> None:
        self._sample_arr = samples
        if duration is None:
            if isinstance(samples, Expr):
                raise ValueError(
                    "CustomWaveform with a variable sample array needs an "
                    "explicit duration."
                )
            duration = len(samples)
        super().__init__(duration)

    def build(self, values: Mapping[str, Any]) -> "CustomWaveform":
        if not self.is_parametrized:
            return self
        arr = evaluate(self._sample_arr, values)
        return CustomWaveform(_as_array(arr))

    def _samples(self) -> jax.Array:
        return _as_array(self._sample_arr).astype(default_dtype())

    def __repr__(self) -> str:
        return f"CustomWaveform(<{self._duration} samples>)"


def pchip_interpolate(
    x: jax.Array, y: jax.Array, t: jax.Array
) -> jax.Array:
    """Differentiable PCHIP (Fritsch-Carlson monotone cubic) interpolation.

    Matches scipy.interpolate.PchipInterpolator's derivative rules, so
    samples agree with pulser's InterpolatedWaveform to float precision.
    Differentiable w.r.t. ``y`` (and ``x`` almost everywhere).
    """
    x = _as_array(x)
    y = _as_array(y)
    n = x.shape[0]
    if n == 1:
        return jnp.broadcast_to(y[0], t.shape)
    h = jnp.diff(x)
    m = jnp.diff(y) / h

    if n == 2:
        d = jnp.stack([m[0], m[0]])
    else:
        # interior derivatives: weighted harmonic mean where slopes agree
        w1 = 2 * h[1:] + h[:-1]
        w2 = h[1:] + 2 * h[:-1]
        whmean = (w1 + w2) / (w1 / jnp.where(m[:-1] == 0, 1.0, m[:-1])
                              + w2 / jnp.where(m[1:] == 0, 1.0, m[1:]))
        cond = (jnp.sign(m[:-1]) * jnp.sign(m[1:])) > 0
        d_int = jnp.where(cond, whmean, 0.0)

        def _edge(h0, h1, m0, m1):
            d0 = ((2 * h0 + h1) * m0 - h0 * m1) / (h0 + h1)
            d0 = jnp.where(jnp.sign(d0) != jnp.sign(m0), 0.0, d0)
            d0 = jnp.where(
                (jnp.sign(m0) != jnp.sign(m1)) & (jnp.abs(d0) > 3 * jnp.abs(m0)),
                3 * m0,
                d0,
            )
            return d0

        d0 = _edge(h[0], h[1], m[0], m[1])
        dn = _edge(h[-1], h[-2], m[-1], m[-2])
        d = jnp.concatenate([d0[None], d_int, dn[None]])

    idx = jnp.clip(jnp.searchsorted(x, t, side="right") - 1, 0, n - 2)
    xk = x[idx]
    hk = h[idx]
    s_ = (t - xk) / hk
    yk, yk1 = y[idx], y[idx + 1]
    dk, dk1 = d[idx], d[idx + 1]
    # cubic Hermite basis
    h00 = (1 + 2 * s_) * (1 - s_) ** 2
    h10 = s_ * (1 - s_) ** 2
    h01 = s_ * s_ * (3 - 2 * s_)
    h11 = s_ * s_ * (s_ - 1)
    return h00 * yk + h10 * hk * dk + h01 * yk1 + h11 * hk * dk1


class InterpolatedWaveform(Waveform):
    """PCHIP interpolation through control values (pulser equivalent).

    This is the waveform used by the reference's headline gate-optimization
    workload (BASELINE.json config #3); gradients flow through ``values``.
    """

    _param_names = ("values", "times")

    def __init__(self, duration: Any, values: Any, times: Any = None) -> None:
        super().__init__(duration)
        self.values = values
        self.times = times

    def build(self, values_map: Mapping[str, Any]) -> "InterpolatedWaveform":
        if not self.is_parametrized:
            return self
        dur = evaluate(self._duration, values_map)
        if not isinstance(dur, int):
            dur = int(np.round(np.asarray(jax.device_get(dur))))
        return InterpolatedWaveform(
            dur,
            evaluate(self.values, values_map),
            evaluate(self.times, values_map) if self.times is not None else None,
        )

    def _samples(self) -> jax.Array:
        vals = _as_array(self.values)
        n = vals.shape[0]
        if self.times is None:
            tfrac = jnp.linspace(0.0, 1.0, n).astype(default_dtype())
        else:
            tfrac = _as_array(self.times)
        x = tfrac * (self.duration - 1)
        t = jnp.arange(self.duration, dtype=default_dtype())
        return pchip_interpolate(x, vals, t)

    def _samples_native(self):
        from pulser_diff_tpu import native

        if not native.available():
            return None
        vals = np.asarray(self.values, dtype=np.float64)
        n = vals.shape[0]
        if self.times is None:
            tfrac = np.linspace(0.0, 1.0, n)
        else:
            tfrac = np.asarray(self.times, dtype=np.float64)
        x = tfrac * (self.duration - 1)
        t = np.arange(self.duration, dtype=np.float64)
        return native.pchip(x, vals, t)

    def change_duration(self, new_duration: int) -> "InterpolatedWaveform":
        return InterpolatedWaveform(new_duration, self.values, self.times)

    def __repr__(self) -> str:
        return f"InterpolatedWaveform({self._duration}, {self.values})"


class CompositeWaveform(Waveform):
    """Concatenation of waveforms (pulser CompositeWaveform)."""

    def __init__(self, *waveforms: Waveform) -> None:
        if not waveforms:
            raise ValueError("CompositeWaveform needs at least one waveform.")
        self._waveforms = list(waveforms)
        super().__init__(None)

    @property
    def waveforms(self) -> list[Waveform]:
        return list(self._waveforms)

    @property
    def duration(self) -> int:
        return sum(w.duration for w in self._waveforms)

    @property
    def is_parametrized(self) -> bool:
        return any(w.is_parametrized for w in self._waveforms)

    def build(self, values: Mapping[str, Any]) -> "CompositeWaveform":
        return CompositeWaveform(*[w.build(values) for w in self._waveforms])

    @property
    def samples(self) -> jax.Array:
        return jnp.concatenate([w.samples for w in self._waveforms])

    def __repr__(self) -> str:
        return f"CompositeWaveform({self._waveforms})"
