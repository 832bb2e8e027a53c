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
