"""Sequence sampling: Sequence -> per-channel amp/det/phase arrays.

Native replacement for pulser.sampler (consumed by the reference at
/root/reference/pulser_diff/backend.py:700-705 and hamiltonian.py:170-219).
Arrays are JAX arrays built by concatenating per-slot waveform samples, so
the whole sampling step is differentiable w.r.t. pulse parameters.

Units: 1 sample per ns; amplitude/detuning in rad/us; phase in rad.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pulser_diff_tpu.config import default_dtype
from pulser_diff_tpu.core.channels import Channel
from pulser_diff_tpu.core.register import QubitId
from pulser_diff_tpu.core.sequence import Sequence


@dataclass
class _PulseTargetSlot:
    ti: int
    tf: int
    targets: frozenset


@dataclass
class _SlmMask:
    targets: frozenset = frozenset()
    end: int = 0


@dataclass
class ChannelSamples:
    """Sampled arrays for one channel."""

    amp: jax.Array
    det: jax.Array
    phase: jax.Array
    slots: list[_PulseTargetSlot]
    addressing: str
    basis: str
    # closed [ti, tf) EOM-mode intervals (ns) — drive modulated with the
    # EOM's bandwidth instead of the channel's inside these windows
    eom_blocks: list = None

    @property
    def duration(self) -> int:
        return int(self.amp.shape[0])

    def extend_duration(
        self, new_duration: int, hold_edge: bool = False
    ) -> "ChannelSamples":
        """Pad samples to ``new_duration``.

        ``hold_edge=True`` repeats the final sample instead of zero-padding
        amp/det.  The emulator uses this for its +1 closing sample so the
        drive stays on through the nominal pulse end — the clean equivalent
        of the reference's interpolation rule that holds H constant over
        the final interval (hamiltonian.py:533 never indexes the padded
        sample).
        """
        T = self.duration
        if new_duration < T:
            raise ValueError("Cannot shrink samples.")
        if new_duration == T:
            return self
        pad = new_duration - T
        if T > 0 and hold_edge:
            pad_amp = jnp.broadcast_to(self.amp[-1], (pad,))
            pad_det = jnp.broadcast_to(self.det[-1], (pad,))
        else:
            pad_amp = pad_det = jnp.zeros((pad,), self.amp.dtype)
        last_phase = self.phase[-1] if T > 0 else jnp.asarray(0.0, default_dtype())
        return replace(
            self,
            amp=jnp.concatenate([self.amp, pad_amp]),
            det=jnp.concatenate([self.det, pad_det]),
            phase=jnp.concatenate(
                [self.phase, jnp.broadcast_to(last_phase, (pad,))]
            ),
        )


@dataclass
class SequenceSamples:
    """All channels of a sampled sequence + sequence-level metadata."""

    channel_samples: dict[str, ChannelSamples]
    _measurement: Optional[str]
    _slm_mask: _SlmMask
    _magnetic_field: np.ndarray
    _in_xy: bool
    qubit_ids: tuple[QubitId, ...]

    @property
    def max_duration(self) -> int:
        return max(
            (cs.duration for cs in self.channel_samples.values()), default=0
        )

    @property
    def used_bases(self) -> set[str]:
        return {
            cs.basis
            for cs in self.channel_samples.values()
            if cs.slots
        }

    def extend_duration(
        self, new_duration: int, hold_edge: bool = False
    ) -> "SequenceSamples":
        return replace(
            self,
            channel_samples={
                k: v.extend_duration(new_duration, hold_edge)
                for k, v in self.channel_samples.items()
            },
        )

    def globalize(self, qubit_ids: tuple[QubitId, ...]) -> "SequenceSamples":
        """Replace Global channels' slot targets with the full register
        (reference backend.py:103-112)."""
        new = {}
        for name, cs in self.channel_samples.items():
            if cs.addressing == "Global":
                new[name] = replace(
                    cs,
                    slots=[
                        _PulseTargetSlot(s.ti, s.tf, frozenset(qubit_ids))
                        for s in cs.slots
                    ],
                )
            else:
                new[name] = cs
        return replace(self, channel_samples=new, qubit_ids=tuple(qubit_ids))

    def to_nested_dict(self, all_local: bool = False) -> dict:
        """{"Global": {basis: {amp,det,phase}}, "Local": {basis: {qid: ...}}}.

        Mirrors pulser's SequenceSamples.to_nested_dict with
        samples_type="tensor" (used at reference hamiltonian.py:177).
        SLM-masked qubits in ising mode get their amplitude zeroed during
        the mask window (which forces the local representation).
        """
        T = self.max_duration
        dt = default_dtype()
        zeros = jnp.zeros((T,), dt)

        slm_on = self._slm_mask.end > 0 and not self._in_xy
        out: dict[str, Any] = {"Global": {}, "Local": {}}

        def _add(d: dict, basis: str, key_chain: list, amp, det, phase):
            node = d.setdefault(basis, {})
            for k in key_chain[:-1]:
                node = node.setdefault(k, {})
            leaf = key_chain[-1] if key_chain else None
            if leaf is None:
                tgt = node
            else:
                tgt = node.setdefault(leaf, {})
            if not tgt:
                tgt["amp"] = zeros
                tgt["det"] = zeros
                tgt["phase"] = zeros
            tgt["amp"] = tgt["amp"] + amp
            tgt["det"] = tgt["det"] + det
            # phase cannot be summed meaningfully; keep where amp active
            tgt["phase"] = jnp.where(amp != 0, phase, tgt["phase"])

        for name, cs in self.channel_samples.items():
            if not cs.slots:
                continue
            force_local = (
                cs.addressing == "Local"
                or all_local
                or (slm_on and cs.addressing == "Global")
            )
            if not force_local:
                _add(out["Global"], cs.basis, [], cs.amp, cs.det, cs.phase)
            else:
                # scatter per-qubit; slots carry targets
                all_targets = (
                    set().union(*(s.targets for s in cs.slots))
                    if cs.addressing == "Local"
                    else set(self.qubit_ids)
                )
                for qid in sorted(all_targets, key=str):
                    if cs.addressing == "Global":
                        amp_q, det_q, phase_q = cs.amp, cs.det, cs.phase
                    else:
                        mask = np.zeros(T, dtype=bool)
                        for s in cs.slots:
                            if qid in s.targets:
                                mask[s.ti : s.tf] = True
                        m = jnp.asarray(mask)
                        amp_q = jnp.where(m, cs.amp, 0.0)
                        det_q = jnp.where(m, cs.det, 0.0)
                        phase_q = jnp.where(m, cs.phase, 0.0)
                    if slm_on and qid in self._slm_mask.targets:
                        mask_win = np.zeros(T, dtype=bool)
                        mask_win[: self._slm_mask.end] = True
                        amp_q = jnp.where(jnp.asarray(mask_win), 0.0, amp_q)
                    _add(out["Local"], cs.basis, [qid], amp_q, det_q, phase_q)

        return out


def _sample_channel(
    seq: Sequence, name: str, ch: Channel, total: int
) -> ChannelSamples:
    dt = default_dtype()
    segments_amp: list[jax.Array] = []
    segments_det: list[jax.Array] = []
    segments_phase: list[jax.Array] = []
    slots: list[_PulseTargetSlot] = []
    cursor = 0
    last_phase = jnp.asarray(0.0, dt)

    for slot in seq._schedule[name]:
        gap = slot.ti - cursor
        if gap > 0:
            segments_amp.append(jnp.zeros((gap,), dt))
            segments_det.append(jnp.zeros((gap,), dt))
            segments_phase.append(jnp.broadcast_to(last_phase, (gap,)))
            cursor = slot.ti
        n = slot.tf - slot.ti
        if slot.kind == "pulse" and slot.pulse is not None:
            p = slot.pulse
            amp = p.amplitude.samples.astype(dt)
            det = p.detuning.samples.astype(dt)
            # per-(basis, qubit) phase reference captured at add time
            # (advanced by phase_shift() and post_phase_shift across all
            # channels of the basis — pulser semantics, Sequence.add)
            ph = jnp.asarray(p.phase, dt) + jnp.asarray(slot.phase_ref, dt)
            segments_amp.append(amp)
            segments_det.append(det)
            segments_phase.append(jnp.broadcast_to(ph, (n,)))
            last_phase = ph
            slots.append(_PulseTargetSlot(slot.ti, slot.tf, slot.targets))
        else:
            if n > 0:
                segments_amp.append(jnp.zeros((n,), dt))
                # EOM-mode waits idle at the locked off-detuning
                det_val = slot.det_off if slot.kind == "eom_delay" else 0.0
                segments_det.append(jnp.full((n,), det_val, dt))
                segments_phase.append(jnp.broadcast_to(last_phase, (n,)))
        cursor = slot.tf

    if cursor < total:
        gap = total - cursor
        segments_amp.append(jnp.zeros((gap,), dt))
        segments_det.append(jnp.zeros((gap,), dt))
        segments_phase.append(jnp.broadcast_to(last_phase, (gap,)))

    if segments_amp:
        amp = jnp.concatenate(segments_amp)
        det = jnp.concatenate(segments_det)
        phase = jnp.concatenate(segments_phase)
    else:
        amp = det = phase = jnp.zeros((total,), dt)

    blocks = []
    for blk in seq._eom_blocks.get(name, []):
        ti, tf = blk
        blocks.append((int(ti), int(tf) if tf is not None else total))

    return ChannelSamples(
        amp=amp,
        det=det,
        phase=phase,
        slots=slots,
        addressing=ch.addressing,
        basis=ch.basis,
        eom_blocks=blocks,
    )


def _modulate(cs: ChannelSamples, ch: Channel) -> ChannelSamples:
    """Channel output modulation: pulser's exact transfer function — a
    normalized Blackman window of width 2*rise_time convolved with the
    programmed samples (Channel.apply_modulation).  Amplitude decays to
    zero past the programmed end (zero padding); detuning and phase hold
    their boundary values (edge padding, pulser's keep_ends).  The
    modulated samples extend by the 2*rise_time fall time.

    EOM + standard modulation combine by MASKED COMPOSITION, pulser's
    per-block design (the reference consumes it through pulser's sampler
    at ref backend.py:695-705): the FULL programmed amp/det streams are
    modulated twice — once with the channel's standard bandwidth and
    once with the EOM's (much faster) bandwidth — and the output takes
    the EOM-modulated samples inside each EOM block plus its
    ``2*eom_rise_time`` fall-time extension window (overlapping decay
    tail after a closed block; the whole remaining tail after an
    open-ended block), and the standard-modulated samples everywhere
    else.  Because BOTH convolutions see the full stream, transitions at
    block boundaries are smooth responses to the same underlying signal
    rather than artificial edges toward zero (which the pre-round-4
    disjoint-support dual-window sum produced).  Phase always goes
    through the standard response (pulser modulates phase with the
    channel bandwidth regardless of EOM state).

    Pinned against an independent pure-numpy implementation of the same
    composition at 1e-9 (tests/fixtures/gen_modulated_fixtures.py,
    ``eom_*`` programs); exact equivalence with a live pulser install
    cannot be validated in this environment (pulser not installable)."""
    eom = ch.eom_config
    std_rise = ch.rise_time
    if cs.eom_blocks and eom is not None:
        T = cs.duration
        eom_rise = eom.rise_time
        eom_fall = 2 * eom_rise

        def _extend(a, n, keep_ends):
            pad = n - a.shape[0]
            if pad <= 0:
                return a
            if keep_ends and a.shape[0] > 0:
                return jnp.concatenate(
                    [a, jnp.broadcast_to(a[-1], (pad,))]
                )
            return jnp.pad(a, (0, pad))

        def comp(x, keep_ends):
            mod_std = (
                Channel.apply_modulation(x, std_rise, keep_ends)
                if std_rise
                else x
            )
            mod_eom = (
                Channel.apply_modulation(x, eom_rise, keep_ends)
                if eom_rise
                else x
            )
            n = max(mod_std.shape[0], mod_eom.shape[0])
            mod_std = _extend(mod_std, n, keep_ends)
            mod_eom = _extend(mod_eom, n, keep_ends)
            mask_np = np.zeros(n, dtype=bool)
            for ti, tf in cs.eom_blocks:
                mask_np[ti:tf] = True
                if tf < T:  # closed block: EOM decay rides its fall time
                    mask_np[tf : min(tf + eom_fall, n)] = True
                else:  # sequence ends in EOM mode: tail stays EOM
                    mask_np[tf:] = True
            return jnp.where(jnp.asarray(mask_np), mod_eom, mod_std)

        return replace(
            cs,
            amp=comp(cs.amp, False),
            det=comp(cs.det, True),
            phase=Channel.apply_modulation(cs.phase, std_rise, True)
            if std_rise
            else cs.phase,
        )
    if ch.mod_bandwidth is None or std_rise == 0:
        return cs
    return replace(
        cs,
        amp=ch.modulate(cs.amp, keep_ends=False),
        det=ch.modulate(cs.det, keep_ends=True),
        phase=ch.modulate(cs.phase, keep_ends=True),
    )


def sample(
    seq: Sequence,
    modulation: bool = False,
    extended_duration: Optional[int] = None,
) -> SequenceSamples:
    """Sample a (concrete) Sequence into per-channel arrays."""
    if seq.is_parametrized():
        raise ValueError("Cannot sample a parametrized sequence; build() it.")
    total = seq.get_duration()
    chs: dict[str, ChannelSamples] = {}
    for name, ch in seq.declared_channels.items():
        cs = _sample_channel(seq, name, ch, total)
        if modulation:
            cs = _modulate(cs, ch)
        chs[name] = cs
    if modulation:
        # normalize all channels to the fall-time-extended duration
        # (pulser truncates modulated samples to this common length)
        max_t = seq.get_duration(include_fall_time=True)
        for name, cs in chs.items():
            if cs.duration > max_t:
                cs = replace(
                    cs,
                    amp=cs.amp[:max_t],
                    det=cs.det[:max_t],
                    phase=cs.phase[:max_t],
                )
            elif cs.duration < max_t:
                cs = cs.extend_duration(max_t)
            chs[name] = cs

    # SLM mask window = duration of the first pulse in the sequence
    mask_end = 0
    if seq._slm_mask_targets:
        first_tf = [
            cs.slots[0].tf for cs in chs.values() if cs.slots
        ]
        mask_end = min(first_tf) if first_tf else 0

    ss = SequenceSamples(
        channel_samples=chs,
        _measurement=seq._measurement,
        _slm_mask=_SlmMask(seq._slm_mask_targets, mask_end),
        _magnetic_field=seq.magnetic_field,
        _in_xy=seq._in_xy,
        qubit_ids=seq.register.qubit_ids,
    )
    if extended_duration is not None:
        ss = ss.extend_duration(extended_duration)
    return ss
