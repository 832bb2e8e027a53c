"""Channel specifications (native replacement for pulser.channels).

A channel couples a pair of atomic levels and is addressed either globally
(all atoms of the register) or locally (explicit targets).  The basis names
follow pulser exactly, since they drive the Hamiltonian basis selection in
the reference (/root/reference/pulser_diff/hamiltonian.py:288-318):
  - Rydberg   -> "ground-rydberg"
  - Raman     -> "digital"
  - Microwave -> "XY"
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional


@dataclass(frozen=True)
class Channel:
    name: str = ""
    addressing: str = "Global"  # "Global" | "Local"
    basis: str = "ground-rydberg"
    max_abs_detuning: Optional[float] = None  # rad/us
    max_amp: Optional[float] = None  # rad/us
    min_retarget_interval: int = 0  # ns
    fixed_retarget_t: int = 0  # ns
    max_targets: Optional[int] = None
    clock_period: int = 1  # ns
    min_duration: int = 1  # ns
    max_duration: Optional[int] = None  # ns
    mod_bandwidth: Optional[float] = None  # MHz
    eom_config: Optional["RydbergEOM"] = None  # core.eom.RydbergEOM

    @property
    def supports_eom_mode(self) -> bool:
        return self.eom_config is not None

    def validate_pulse(self, amp_max: float, det_max: float, duration: int) -> None:
        if self.max_amp is not None and amp_max > self.max_amp + 1e-9:
            raise ValueError(
                f"Pulse amplitude {amp_max} exceeds channel maximum {self.max_amp}."
            )
        if (
            self.max_abs_detuning is not None
            and det_max > self.max_abs_detuning + 1e-9
        ):
            raise ValueError(
                f"Pulse |detuning| {det_max} exceeds channel maximum "
                f"{self.max_abs_detuning}."
            )
        if duration < self.min_duration:
            raise ValueError(
                f"Pulse duration {duration} below channel minimum "
                f"{self.min_duration} ns."
            )
        if self.max_duration is not None and duration > self.max_duration:
            raise ValueError(
                f"Pulse duration {duration} above channel maximum "
                f"{self.max_duration} ns."
            )

    @property
    def is_global(self) -> bool:
        return self.addressing == "Global"

    # -- output modulation (pulser base_channel semantics) ---------------
    @property
    def rise_time(self) -> int:
        """Standard rise time (90% output) in ns:
        MODBW_TO_TR / mod_bandwidth, MODBW_TO_TR = 0.48."""
        if self.mod_bandwidth:
            return int(0.48 / self.mod_bandwidth * 1e3)
        return 0

    @property
    def fall_time(self) -> int:
        """Extra time for the output to ramp down after the programmed
        end (2x the rise time, matching pulser's duration extension)."""
        return 2 * self.rise_time

    @staticmethod
    def apply_modulation(input_samples, rise_time: int, keep_ends: bool = False):
        """Channel output response: convolution with a normalized Blackman
        window of width 2*rise_time (pulser's exact transfer function —
        the reference samples with it via ``with_modulation``, reference
        backend.py:695-705).

        keep_ends=True edge-pads first (used for detuning/phase, which
        hold their boundary values instead of decaying to zero).  Output
        length = len(input) + 2*rise_time.  Differentiable (jnp ops).
        """
        import jax.numpy as jnp
        import numpy as np

        if not rise_time:
            return input_samples
        window = np.blackman(2 * rise_time)
        norm_window = jnp.asarray(
            window / np.sum(window), input_samples.dtype
        )
        if keep_ends:
            samples = jnp.pad(input_samples, 2 * rise_time, mode="edge")
        else:
            samples = jnp.pad(input_samples, rise_time)
        mod_samples = jnp.convolve(samples, norm_window, mode="same")
        if keep_ends:
            mod_samples = mod_samples[rise_time:-rise_time]
        return mod_samples

    def modulate(self, input_samples, keep_ends: bool = False):
        """Modulate the input with this channel's response."""
        return self.apply_modulation(input_samples, self.rise_time, keep_ends)


class _ChannelFamily:
    basis: str = ""

    @classmethod
    def Global(cls, max_abs_detuning: Optional[float] = None,
               max_amp: Optional[float] = None, **kwargs) -> Channel:
        return Channel(
            name=f"{cls.__name__.lower()}_global",
            addressing="Global",
            basis=cls.basis,
            max_abs_detuning=max_abs_detuning,
            max_amp=max_amp,
            **kwargs,
        )

    @classmethod
    def Local(cls, max_abs_detuning: Optional[float] = None,
              max_amp: Optional[float] = None, **kwargs) -> Channel:
        return Channel(
            name=f"{cls.__name__.lower()}_local",
            addressing="Local",
            basis=cls.basis,
            max_abs_detuning=max_abs_detuning,
            max_amp=max_amp,
            **kwargs,
        )


class Rydberg(_ChannelFamily):
    basis = "ground-rydberg"


class Raman(_ChannelFamily):
    basis = "digital"


class Microwave(_ChannelFamily):
    basis = "XY"

    @classmethod
    def Local(cls, *args, **kwargs) -> Channel:  # pragma: no cover
        raise ValueError("Microwave channels only support Global addressing.")
