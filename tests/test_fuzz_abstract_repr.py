"""Seeded fuzz of the abstract-repr JSON dialect round trip
(VERDICT round-4 next-step #6).

Random NATIVE sequences — channel mixes, all seven waveform families,
delays / retargets / phase shifts / SLM masks / EOM blocks / XY /
measurement — are exported with ``to_abstract_repr`` and re-imported
with ``from_abstract_repr``; the two sequences must produce identical
sampled streams at 1e-12.  This is the class of check the vendored
fixtures (tests/test_interop.py) cannot give: format quirks such as the
int-qubit-id TypeError (commit 517c4a3) only surface on inputs nobody
hand-picked.  The reference gets this surface for free from pulser's
own serializer (reference pyproject.toml:29-34); here it is product
code and needs property-style coverage.

Scheduling-semantics fuzz (same op language vs an independent numpy
scheduler) lives in tests/test_fuzz_schedule.py; this file reuses its
generator so every program is semantically valid by construction.
"""

import numpy as np
import pytest

from pulser_diff_tpu.core import (
    AnalogDevice,
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
from pulser_diff_tpu.core.sampler import sample
from pulser_diff_tpu.interop import from_abstract_repr, to_abstract_repr

from .test_fuzz_schedule import _random_program
from .test_sequence_fixtures import _build_sequence


def _assert_stream_parity(seq1: Sequence, seq2: Sequence) -> None:
    """Identical sampled per-qubit streams (and SLM window) at 1e-12."""
    ss1, ss2 = sample(seq1), sample(seq2)
    assert ss1.max_duration == ss2.max_duration
    if ss1._slm_mask is not None or ss2._slm_mask is not None:
        assert ss1._slm_mask.end == ss2._slm_mask.end
        assert set(ss1._slm_mask.targets) == set(ss2._slm_mask.targets)
    n1 = ss1.to_nested_dict(all_local=True)["Local"]
    n2 = ss2.to_nested_dict(all_local=True)["Local"]
    assert set(n1) == set(n2)
    for basis in n1:
        assert set(n1[basis]) == set(n2[basis])
        for qid in n1[basis]:
            for key in ("amp", "det", "phase"):
                a = np.asarray(n1[basis][qid][key])
                b = np.asarray(n2[basis][qid][key])
                assert a.shape == b.shape, (basis, qid, key)
                np.testing.assert_allclose(
                    a, b, rtol=0, atol=1e-12,
                    err_msg=f"{basis}/{qid}/{key}",
                )


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_schedule_program_round_trip(seed):
    """Random schedule programs (global+local channels over two bases,
    protocols, retargets, phase shifts, SLM masks) survive
    to_abstract_repr -> from_abstract_repr with stream equality."""
    # the generator can emit programs the product LEGITIMATELY rejects
    # (mixed phase references — test_fuzz_schedule asserts the raise);
    # walk sub-seeds until a buildable program comes up
    seq1 = None
    for attempt in range(10):
        try:
            seq1 = _build_sequence(_random_program(seed * 97 + attempt))
            break
        except ValueError:
            continue
    assert seq1 is not None, "no buildable program in 10 attempts"
    seq2 = from_abstract_repr(to_abstract_repr(seq1))
    _assert_stream_parity(seq1, seq2)
    # and the export itself is a fixed point (stable re-serialization)
    assert to_abstract_repr(seq2) == to_abstract_repr(
        from_abstract_repr(to_abstract_repr(seq2))
    )


def _random_waveform(rng, duration):
    k = int(rng.integers(0, 7))
    if k == 0:
        return ConstantWaveform(duration, float(rng.uniform(-2, 3)))
    if k == 1:
        return RampWaveform(
            duration, float(rng.uniform(-2, 2)), float(rng.uniform(-2, 2))
        )
    if k == 2:
        return BlackmanWaveform(duration, float(rng.uniform(0.5, 4.0)))
    if k == 3:
        return KaiserWaveform(
            duration, float(rng.uniform(0.5, 4.0)), beta=float(rng.uniform(8, 18))
        )
    if k == 4:
        n_pts = int(rng.integers(2, 7))
        if rng.random() < 0.5:
            times = None
        else:
            times = np.sort(rng.uniform(0.0, 1.0, n_pts))
            times[0], times[-1] = 0.0, 1.0
        return InterpolatedWaveform(
            duration, rng.uniform(-2, 3, n_pts), times=times
        )
    if k == 5:
        return CustomWaveform(rng.uniform(-2, 3, duration))
    # composite of 2-3 simple parts summing to `duration`
    n_parts = int(rng.integers(2, 4))
    cuts = np.sort(rng.integers(16, duration - 16, n_parts - 1))
    bounds = [0, *cuts.tolist(), duration]
    parts = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        d = max(int(hi - lo), 16)
        parts.append(
            ConstantWaveform(d, float(rng.uniform(-1, 2)))
            if rng.random() < 0.5
            else RampWaveform(d, float(rng.uniform(-1, 1)), float(rng.uniform(-1, 1)))
        )
    return CompositeWaveform(*parts)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_waveform_zoo_round_trip(seed):
    """Every waveform family (constant/ramp/blackman/kaiser/interpolated/
    custom/composite) with random parameters, random phases and
    measurement, through the round trip."""
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(2, 5))
    reg = Register.from_coordinates(
        [(7.0 * i, float(rng.uniform(-2, 2))) for i in range(n)], prefix="q"
    )
    seq1 = Sequence(reg, MockDevice)
    seq1.declare_channel("g", "rydberg_global")
    for _ in range(int(rng.integers(2, 5))):
        dur = int(rng.integers(60, 260))
        seq1.add(
            Pulse(
                _random_waveform(rng, dur),
                _random_waveform(rng, dur),
                float(rng.uniform(0, 2 * np.pi)),
                post_phase_shift=float(rng.choice([0.0, rng.uniform(0, 1)])),
            ),
            "g",
        )
    if rng.random() < 0.5:
        seq1.measure("ground-rydberg")
    seq2 = from_abstract_repr(to_abstract_repr(seq1))
    _assert_stream_parity(seq1, seq2)
    assert seq2.is_measured() == seq1.is_measured()


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_eom_round_trip(seed):
    """EOM blocks (enable / square pulses / in-block delays / disable)
    on AnalogDevice's EOM channel, mixed with regular pulses."""
    rng = np.random.default_rng(2000 + seed)
    reg = Register.from_coordinates([(0.0, 0.0), (0.0, 6.0)], prefix="q")
    seq1 = Sequence(reg, AnalogDevice)
    seq1.declare_channel("ryd", "rydberg_global")
    clock = 4
    if rng.random() < 0.6:
        seq1.add(
            Pulse.ConstantPulse(
                int(rng.integers(4, 40)) * clock,
                float(rng.uniform(0.5, 2.0)),
                float(rng.uniform(-2, 2)),
                float(rng.uniform(0, 2 * np.pi)),
            ),
            "ryd",
        )
    seq1.enable_eom_mode(
        "ryd",
        amp_on=float(rng.uniform(0.5, 2.0)),
        detuning_on=float(rng.uniform(-1.0, 1.0)),
        optimal_detuning_off=float(rng.uniform(-40.0, 0.0)),
    )
    for _ in range(int(rng.integers(1, 4))):
        seq1.add_eom_pulse(
            "ryd",
            int(rng.integers(4, 30)) * clock,
            float(rng.uniform(0, 2 * np.pi)),
            post_phase_shift=float(rng.choice([0.0, rng.uniform(0, 0.5)])),
        )
        if rng.random() < 0.5:
            seq1.delay(int(rng.integers(2, 20)) * clock, "ryd")
    seq1.disable_eom_mode("ryd")
    if rng.random() < 0.5:
        seq1.add(
            Pulse.ConstantPulse(
                int(rng.integers(4, 30)) * clock,
                float(rng.uniform(0.5, 2.0)),
                0.0,
                0.0,
            ),
            "ryd",
        )
    seq2 = from_abstract_repr(to_abstract_repr(seq1))
    _assert_stream_parity(seq1, seq2)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_xy_round_trip(seed):
    """XY (microwave) sequences with a random magnetic field."""
    rng = np.random.default_rng(3000 + seed)
    n = int(rng.integers(2, 5))
    reg = Register.from_coordinates(
        [(8.0 * i, 3.0 * ((-1) ** i)) for i in range(n)], prefix="q"
    )
    seq1 = Sequence(reg, MockDevice)
    b = rng.uniform(-1, 1, 3)
    b = 30.0 * b / np.linalg.norm(b)
    seq1.set_magnetic_field(*[float(x) for x in b])
    seq1.declare_channel("mw", "microwave_global")
    for _ in range(int(rng.integers(1, 4))):
        dur = int(rng.integers(60, 200))
        seq1.add(
            Pulse(
                _random_waveform(rng, dur),
                ConstantWaveform(dur, 0.0),
                float(rng.uniform(0, 2 * np.pi)),
            ),
            "mw",
        )
    seq2 = from_abstract_repr(to_abstract_repr(seq1))
    _assert_stream_parity(seq1, seq2)
    np.testing.assert_allclose(
        np.asarray(seq2.magnetic_field), np.asarray(seq1.magnetic_field),
        atol=1e-12,
    )
