"""Optional interop with the real `pulser` package.

Converts pulser objects (Register, Waveform, Pulse, built Sequence) into
their pulser_diff_tpu equivalents so existing pulser programs can run on
this backend unchanged:

    import pulser
    from pulser_diff_tpu.interop import from_pulser_sequence
    seq = from_pulser_sequence(pulser_seq)
    sim = TpuEmulator.from_sequence(seq)

pulser is imported lazily and is NOT a dependency (the reference depends
on pulser-core at a pinned commit, pyproject.toml:29-34; here the native
front-end in pulser_diff_tpu.core is the primary path and this adapter is
the compatibility bridge).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from pulser_diff_tpu.core import (
    BlackmanWaveform,
    CompositeWaveform,
    ConstantWaveform,
    CustomWaveform,
    InterpolatedWaveform,
    KaiserWaveform,
    MockDevice,
    Pulse,
    RampWaveform,
    Register,
    Sequence,
)
from pulser_diff_tpu.core.devices import C6_DICT, Device
from pulser_diff_tpu.core.channels import Channel


def _require_pulser():
    try:
        import pulser  # noqa: F401

        return pulser
    except ImportError as e:  # pragma: no cover - environment dependent
        raise ImportError(
            "The `pulser` package is not installed; interop conversion "
            "requires it. The native front-end (pulser_diff_tpu.core) "
            "does not."
        ) from e


def from_pulser_register(preg: Any) -> Register:
    return Register(
        {qid: np.asarray(c, dtype=float) for qid, c in preg.qubits.items()}
    )


def from_pulser_waveform(wf: Any):
    name = type(wf).__name__
    if name == "ConstantWaveform":
        return ConstantWaveform(wf.duration, float(wf._value))
    if name == "RampWaveform":
        return RampWaveform(wf.duration, float(wf._start), float(wf._stop))
    if name == "BlackmanWaveform":
        return BlackmanWaveform(wf.duration, float(wf._area))
    if name == "KaiserWaveform":
        return KaiserWaveform(
            wf.duration, float(wf._area), float(getattr(wf, "_beta", 14.6))
        )
    if name == "InterpolatedWaveform":
        times = np.asarray(wf._times, dtype=float) / max(wf.duration - 1, 1)
        return InterpolatedWaveform(
            wf.duration, np.asarray(wf._values, dtype=float), times
        )
    if name == "CompositeWaveform":
        return CompositeWaveform(
            *[from_pulser_waveform(w) for w in wf._waveforms]
        )
    # fall back to raw samples (exact)
    return CustomWaveform(np.asarray(wf.samples, dtype=float))


def from_pulser_device(pdev: Any) -> Device:
    """Map a pulser device onto a native Device spec."""
    channels = []
    for ch_id, ch in pdev.channels.items():
        channels.append(
            Channel(
                name=ch_id,
                addressing=ch.addressing,
                basis=ch.basis,
                max_abs_detuning=getattr(ch, "max_abs_detuning", None),
                max_amp=getattr(ch, "max_amp", None),
                min_retarget_interval=getattr(ch, "min_retarget_interval", 0)
                or 0,
                fixed_retarget_t=getattr(ch, "fixed_retarget_t", 0) or 0,
                max_targets=getattr(ch, "max_targets", None),
                clock_period=getattr(ch, "clock_period", 1),
                min_duration=getattr(ch, "min_duration", 1),
                max_duration=getattr(ch, "max_duration", None),
                mod_bandwidth=getattr(ch, "mod_bandwidth", None),
            )
        )
    level = getattr(pdev, "rydberg_level", 70)
    if level not in C6_DICT:
        # install the device's own interaction coefficient
        C6_DICT[level] = float(pdev.interaction_coeff)
    return Device(
        name=pdev.name,
        dimensions=getattr(pdev, "dimensions", 2),
        rydberg_level=level,
        max_atom_num=getattr(pdev, "max_atom_num", None),
        max_radial_distance=getattr(pdev, "max_radial_distance", None),
        min_atom_distance=getattr(pdev, "min_atom_distance", 0.0) or 0.0,
        interaction_coeff_xy=getattr(pdev, "interaction_coeff_xy", None),
        supports_slm_mask=getattr(pdev, "supports_slm_mask", False),
        channels=tuple(channels),
    )


def from_pulser_sequence(pseq: Any) -> Sequence:
    """Convert a BUILT pulser.Sequence into a native Sequence by replaying
    its schedule (pulses, delays, targets, measurement, SLM mask)."""
    _require_pulser()
    if pseq.is_parametrized():
        raise ValueError(
            "Convert built sequences only (call .build() first)."
        )
    reg = from_pulser_register(pseq.register)
    dev = from_pulser_device(pseq.device)
    seq = Sequence(reg, dev)
    for name, ch in pseq.declared_channels.items():
        ch_id = pseq._schedule[name].channel_id if hasattr(
            pseq._schedule[name], "channel_id"
        ) else None
        # find the device channel id by object identity/name
        cid = None
        for dev_id, dev_ch in pseq.device.channels.items():
            if dev_ch == ch:
                cid = dev_id
                break
        seq.declare_channel(name, cid or ch.name)
    if getattr(pseq, "_slm_mask_targets", None):
        seq.config_slm_mask(pseq._slm_mask_targets)
    for name in pseq.declared_channels:
        for slot in pseq._schedule[name].slots:
            if slot.ti < 0:
                continue
            if isinstance(slot.type, str):
                if slot.type == "delay":
                    seq.delay(slot.tf - slot.ti, name)
                elif slot.type == "target":
                    seq.target(sorted(slot.targets), name)
            else:  # a pulser Pulse
                p = slot.type
                seq.add(
                    Pulse(
                        from_pulser_waveform(p.amplitude),
                        from_pulser_waveform(p.detuning),
                        float(p.phase),
                        float(getattr(p, "post_phase_shift", 0.0)),
                    ),
                    name,
                    protocol="no-delay",
                )
    if getattr(pseq, "_measurement", None):
        seq.measure(pseq._measurement)
    return seq
