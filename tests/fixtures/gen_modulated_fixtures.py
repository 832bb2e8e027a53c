"""Generator for the frozen modulated-sample fixtures.

Implements pulser-core's channel output modulation independently of the
product code (pure numpy, no pulser_diff_tpu imports), following the
published algorithm in pulser/channels/base_channel.py::Channel.modulate:

  - rise_time = int(MODBW_TO_TR / mod_bandwidth * 1e3), MODBW_TO_TR=0.48
  - amplitude: zero-pad by rise_time on both sides, convolve with a
    normalized numpy.blackman(2 * rise_time) window, mode="same"
    (output length = input + 2*rise_time)
  - detuning/phase (keep_ends): edge-pad by 2*rise_time, convolve,
    crop rise_time from both ends
  - a sequence's modulated duration extends by the channel fall time
    (2 * rise_time)

The JSON fixtures freeze input programmed streams and expected modulated
outputs for several waveform shapes.  tests/test_sequence.py replays the
same programs through the product sampler and asserts 1e-9 parity —
regression-pinning the modulation path against an implementation that
shares no code with it.  (pulser itself is not installable in this
environment; the reference exercises the identical algorithm through
pulser's sampler, /root/reference/pulser_diff/backend.py:695-705.)

Run:  python tests/fixtures/gen_modulated_fixtures.py
"""

import json
import os

import numpy as np

MODBW_TO_TR = 0.48


def rise_time(mod_bandwidth):
    return int(MODBW_TO_TR / mod_bandwidth * 1e3)


def modulate(samples, tr, keep_ends=False):
    samples = np.asarray(samples, dtype=float)
    if tr == 0:
        return samples
    window = np.blackman(2 * tr)
    window = window / window.sum()
    if keep_ends:
        padded = np.pad(samples, 2 * tr, mode="edge")
    else:
        padded = np.pad(samples, tr)
    out = np.convolve(padded, window, mode="same")
    if keep_ends:
        out = out[tr:-tr]
    return out


def blackman_wf(duration, area):
    """Blackman window with integral `area` rad (samples rad/us, 1 ns
    steps -> sample sum = area * 1000, matching pulser's waveform)."""
    w = np.blackman(duration)
    return w * (area * 1000.0 / w.sum())


def programs():
    """Each program: channel mod_bandwidth + programmed amp/det/phase
    streams (1 sample per ns) built from elementary shapes."""
    out = {}

    # 1. constant pulse + trailing delay (rising and falling edges)
    amp = np.concatenate([np.full(300, 2.0), np.zeros(100)])
    det = np.concatenate([np.full(300, -1.5), np.zeros(100)])
    ph = np.concatenate([np.full(300, 0.4), np.full(100, 0.4)])
    out["constant_30MHz"] = dict(mod_bandwidth=30.0, amp=amp, det=det, phase=ph)

    # 2. blackman amplitude + ramp detuning, slower channel
    amp = np.concatenate([blackman_wf(240, np.pi), np.zeros(60)])
    det = np.concatenate([np.linspace(-2.0, 2.0, 240), np.zeros(60)])
    ph = np.zeros(300)
    out["blackman_ramp_8MHz"] = dict(mod_bandwidth=8.0, amp=amp, det=det, phase=ph)

    # 3. two pulses with a gap and a phase jump
    amp = np.concatenate(
        [np.full(120, 1.2), np.zeros(80), np.full(100, 2.4)]
    )
    det = np.concatenate(
        [np.full(120, 0.5), np.zeros(80), np.full(100, -0.7)]
    )
    ph = np.concatenate(
        [np.full(120, 0.0), np.full(80, 0.0), np.full(100, 1.1)]
    )
    out["two_pulse_gap_20MHz"] = dict(mod_bandwidth=20.0, amp=amp, det=det, phase=ph)

    return out


def main():
    fixtures = {}
    for name, prog in programs().items():
        tr = rise_time(prog["mod_bandwidth"])
        fixtures[name] = dict(
            mod_bandwidth=prog["mod_bandwidth"],
            rise_time=tr,
            amp_in=list(prog["amp"]),
            det_in=list(prog["det"]),
            phase_in=list(prog["phase"]),
            amp_mod=list(modulate(prog["amp"], tr, keep_ends=False)),
            det_mod=list(modulate(prog["det"], tr, keep_ends=True)),
            phase_mod=list(modulate(prog["phase"], tr, keep_ends=True)),
        )
    path = os.path.join(os.path.dirname(__file__), "modulated_samples.json")
    with open(path, "w") as f:
        json.dump(fixtures, f)
    print(f"wrote {path}: {list(fixtures)}")


if __name__ == "__main__":
    main()
