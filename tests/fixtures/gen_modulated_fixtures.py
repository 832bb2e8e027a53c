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


# ----------------------------------------------------------------------
# EOM section: independent reimplementation of the two-photon beam
# physics (core/eom.py formulas re-derived here, no product import), the
# Sequence EOM stream assembly (buffers, square pulses, in-block delays
# idling at detuning_off), and the masked per-block EOM+standard
# modulation composition.
# ----------------------------------------------------------------------
def eom_detuning_off(amp_on, det_on, d_int, max_lim, limiting="RED",
                     controlled=("BLUE",), optimal=0.0):
    """Achievable off-detuning closest to `optimal` (two-photon light
    shifts; BLUE shifts +w^2/(4 d_int), RED shifts -)."""
    base = np.sqrt(2 * d_int * amp_on)
    if base <= max_lim:
        amps = {"RED": base, "BLUE": base}
    else:
        other = 2 * d_int * amp_on / max_lim
        amps = {"RED": other, "BLUE": other}
        amps[limiting] = max_lim
    sign = {"BLUE": 1.0, "RED": -1.0}

    def ls(*beams):
        return sum(sign[b] * amps[b] ** 2 / (4 * d_int) for b in beams)

    offset = det_on - ls("RED", "BLUE")
    if len(controlled) == 1:
        still_on = tuple(b for b in ("RED", "BLUE") if b not in controlled)
        opts = [ls(*still_on)]
    else:
        opts = [ls("RED"), ls("BLUE"), 0.0]
    opts = np.array(opts) + offset
    return float(opts[np.argmin(np.abs(opts - optimal))])


def eom_compose(x, std_tr, eom_tr, blocks, T, keep_ends):
    """Masked composition: modulate the FULL stream with both bandwidths;
    take the EOM response inside each block + its 2*eom_tr fall window
    (whole tail for a block ending at T), the standard response elsewhere."""
    mod_std = modulate(x, std_tr, keep_ends)
    mod_eom = modulate(x, eom_tr, keep_ends)
    n = max(len(mod_std), len(mod_eom))

    def ext(a):
        if len(a) >= n:
            return a
        fill = a[-1] if (keep_ends and len(a)) else 0.0
        return np.concatenate([a, np.full(n - len(a), fill)])

    mod_std, mod_eom = ext(mod_std), ext(mod_eom)
    mask = np.zeros(n, dtype=bool)
    for ti, tf in blocks:
        mask[ti:tf] = True
        if tf < T:
            mask[tf : min(tf + 2 * eom_tr, n)] = True
        else:
            mask[tf:] = True
    return np.where(mask, mod_eom, mod_std)


def eom_programs():
    """EOM-block programs.  Each mirrors a product Sequence build
    (std pulses, enable_eom_mode buffer, add_eom_pulse squares, in-block
    delays at detuning_off, disable buffer) assembled here by hand."""
    out = {}
    TWO_PI = 2 * np.pi

    # shared hardware numbers (MockDevice-style EOM)
    d_int = TWO_PI * 700.0
    max_lim = TWO_PI * 10.0

    # 1. std pulse -> closed EOM block (2 squares + idle) -> std pulse
    std_bw, eom_bw = 10.0, 40.0
    std_tr, eom_tr = rise_time(std_bw), rise_time(eom_bw)
    buf = 2 * eom_tr
    amp_on, det_on = 2.0, 0.0
    det_off = eom_detuning_off(amp_on, det_on, d_int, max_lim)
    amp = np.concatenate([
        np.full(240, 1.0), np.zeros(buf), np.full(100, amp_on),
        np.zeros(60), np.full(80, amp_on), np.zeros(buf), np.full(120, 1.5),
    ])
    det = np.concatenate([
        np.full(240, -0.5), np.zeros(buf), np.full(100, det_on),
        np.full(60, det_off), np.full(80, det_on), np.zeros(buf),
        np.full(120, 0.3),
    ])
    ph = np.concatenate([
        np.full(240 + buf, 0.2), np.full(100 + 60 + 80 + buf, 1.0),
        np.full(120, 0.7),
    ])
    T = len(amp)
    blocks = [(240 + buf, 240 + buf + 240)]
    out["eom_closed_block"] = dict(
        mod_bandwidth=std_bw, eom_bandwidth=eom_bw, amp=amp, det=det,
        phase=ph, blocks=blocks, T=T, std_tr=std_tr, eom_tr=eom_tr,
        eom_params=dict(amp_on=amp_on, detuning_on=det_on,
                        detuning_off=det_off, custom_buffer_time=None),
    )

    # 2. std pulse -> EOM block open until the sequence end
    amp_on, det_on = 1.2, -0.4
    det_off = eom_detuning_off(amp_on, det_on, d_int, max_lim)
    amp = np.concatenate([
        np.full(200, 0.9), np.zeros(buf), np.full(120, amp_on), np.zeros(80),
    ])
    det = np.concatenate([
        np.full(200, 0.6), np.zeros(buf), np.full(120, det_on),
        np.full(80, det_off),
    ])
    ph = np.concatenate([np.full(200 + buf, 0.0), np.full(200, 0.5)])
    T = len(amp)
    blocks = [(200 + buf, T)]
    out["eom_open_end"] = dict(
        mod_bandwidth=std_bw, eom_bandwidth=eom_bw, amp=amp, det=det,
        phase=ph, blocks=blocks, T=T, std_tr=std_tr, eom_tr=eom_tr,
        eom_params=dict(amp_on=amp_on, detuning_on=det_on,
                        detuning_off=det_off, custom_buffer_time=None),
    )

    # 3. custom buffer time + both beams controllable + optimal det_off
    std_bw, eom_bw, cbuf = 12.0, 50.0, 16
    std_tr, eom_tr = rise_time(std_bw), rise_time(eom_bw)
    amp_on, det_on = 1.5, 0.5
    det_off = eom_detuning_off(
        amp_on, det_on, d_int, max_lim,
        controlled=("BLUE", "RED"), optimal=-5.0,
    )
    amp = np.concatenate([
        np.full(150, 0.8), np.zeros(cbuf), np.full(90, amp_on),
        np.zeros(40), np.full(50, amp_on), np.zeros(cbuf), np.zeros(60),
    ])
    det = np.concatenate([
        np.full(150, 0.1), np.zeros(cbuf), np.full(90, det_on),
        np.full(40, det_off), np.full(50, det_on), np.zeros(cbuf),
        np.zeros(60),
    ])
    ph = np.concatenate([
        np.full(150 + cbuf, 0.0), np.full(90 + 40 + 50 + cbuf + 60, 0.9),
    ])
    T = len(amp)
    blocks = [(150 + cbuf, 150 + cbuf + 180)]
    out["eom_custom_buffer"] = dict(
        mod_bandwidth=std_bw, eom_bandwidth=eom_bw, amp=amp, det=det,
        phase=ph, blocks=blocks, T=T, std_tr=std_tr, eom_tr=eom_tr,
        eom_params=dict(amp_on=amp_on, detuning_on=det_on,
                        detuning_off=det_off, custom_buffer_time=cbuf,
                        controlled_beams=("BLUE", "RED"),
                        optimal_detuning_off=-5.0),
    )
    return out


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
    for name, prog in eom_programs().items():
        std_tr, eom_tr = prog["std_tr"], prog["eom_tr"]
        blocks, T = prog["blocks"], prog["T"]
        # final duration normalization mirrors sample(): all channels go
        # to seq duration + the channel's standard fall time (2*std_tr)
        final = T + 2 * std_tr

        def norm(a, keep_ends):
            if len(a) > final:
                return a[:final]
            fill = a[-1] if (keep_ends and len(a)) else 0.0
            return np.concatenate([a, np.full(final - len(a), fill)])

        fixtures[name] = dict(
            mod_bandwidth=prog["mod_bandwidth"],
            eom_bandwidth=prog["eom_bandwidth"],
            rise_time=std_tr,
            eom_rise_time=eom_tr,
            eom_blocks=[list(b) for b in blocks],
            eom_params={
                k: v for k, v in prog["eom_params"].items() if v is not None
            },
            amp_in=list(prog["amp"]),
            det_in=list(prog["det"]),
            phase_in=list(prog["phase"]),
            amp_mod=list(norm(
                eom_compose(prog["amp"], std_tr, eom_tr, blocks, T, False),
                False,
            )),
            det_mod=list(norm(
                eom_compose(prog["det"], std_tr, eom_tr, blocks, T, True),
                True,
            )),
            phase_mod=list(norm(
                modulate(prog["phase"], std_tr, keep_ends=True), True
            )),
        )
    path = os.path.join(os.path.dirname(__file__), "modulated_samples.json")
    with open(path, "w") as f:
        json.dump(fixtures, f)
    print(f"wrote {path}: {list(fixtures)}")


if __name__ == "__main__":
    main()
