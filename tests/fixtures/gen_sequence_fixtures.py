"""Generator for the frozen sequence-SCHEDULING fixtures.

Round-3 VERDICT weak #5: tests/golden.py builds its Hamiltonian from the
*product sampler's* output, so slot timing, target switches, phase
accumulation and SLM-window assembly were only self-tested.  This module
reimplements, in pure numpy with ZERO product imports, the published
pulser scheduling + sampling semantics the product follows:

  - ``add(pulse, ch, protocol)`` start times:
      min-delay     start at the channel's end, pushed to the latest end
                    among OTHER channels whose current targets intersect
                    this channel's current targets;
      wait-for-all  pushed to the latest end among ALL channels;
      no-delay      starts at the channel's own end.
  - ``target()`` occupies ``max(fixed_retarget_t, min_retarget_interval)``
    ns (the min interval only once the channel has output).
  - phase streams: a pulse holds ``phase + phase_ref`` over its window,
    where ``phase_ref`` is the targets' accumulated per-(basis, qubit)
    phase reference at add time (pulser's ``_basis_ref``): advanced by
    ``phase_shift()`` and by each pulse's ``post_phase_shift`` on its
    OWN targets, shared across channels of the same basis; a pulse whose
    targets carry different references is an error; a pulse cannot start
    before the last phase shift registered on its targets (the phase
    barrier, tagged at the qubit's last-used time); delays/gaps hold the
    LAST pulse's phase.
  - per-qubit assembly (pulser SequenceSamples.to_nested_dict): channels
    in declaration order; amplitudes and detunings ADD on shared qubits;
    phase takes the latest channel's value wherever that channel's amp is
    non-zero; a LOCAL channel contributes only inside its pulse slots
    targeting the qubit (zero elsewhere, including phase); SLM-masked
    qubits (ising modes only) have their amplitude zeroed during the mask
    window = min over channels of the first pulse's end time.

tests/test_sequence_fixtures.py replays the same declarative programs
through the product Sequence/sample()/to_nested_dict stack and pins
1e-12 parity.  (Reference consumes these semantics through pulser's
sampler, /root/reference/pulser_diff/backend.py:695-705 and
hamiltonian.py:170-219.)

Run:  python tests/fixtures/gen_sequence_fixtures.py
"""

import json
import os

import numpy as np


# ----------------------------------------------------------------------
# waveform shapes (must mirror the product's published formulas, which
# tests/test_waveforms.py pins against numpy/scipy separately)
# ----------------------------------------------------------------------
def wf_samples(spec):
    kind = spec["kind"]
    d = spec["duration"]
    if kind == "constant":
        return np.full(d, float(spec["value"]))
    if kind == "ramp":
        frac = np.arange(d, dtype=float) / max(d - 1, 1)
        return spec["start"] + (spec["stop"] - spec["start"]) * frac
    if kind == "blackman":
        # the product clips the window to >= 0 (amplitudes are physical):
        # np.blackman endpoints are -1.4e-17, and the exact zero matters
        # for the per-qubit assembly's `amp != 0` phase masking
        w = np.clip(np.blackman(d), 0.0, None)
        return w * (spec["area"] * 1000.0 / w.sum())
    raise ValueError(kind)


# ----------------------------------------------------------------------
# independent mini-scheduler
# ----------------------------------------------------------------------
class _Chan:
    def __init__(self, spec, qubit_ids):
        self.spec = spec
        self.addressing = spec["addressing"]
        self.basis = spec["basis"]
        self.slots = []  # (kind, ti, tf, targets, payload)
        if self.addressing == "Global":
            self.target = frozenset(qubit_ids)
        else:
            self.target = frozenset(spec.get("initial_target", []))

    @property
    def end(self):
        return self.slots[-1][2] if self.slots else 0


def schedule(program, qubit_ids):
    chans = {}
    slm_targets = frozenset(program.get("slm_mask", []))
    refs = {}  # (basis, qubit) -> accumulated phase reference
    shift_t = {}  # (basis, qubit) -> time of last phase_shift (barrier)
    last_used = {}  # (basis, qubit) -> last driven time
    for op in program["ops"]:
        kind = op[0]
        if kind == "declare":
            _, name, spec = op
            chans[name] = _Chan(spec, qubit_ids)
        elif kind == "phase_shift":
            _, phi, targets, basis = op
            for q in targets:
                refs[(basis, q)] = refs.get((basis, q), 0.0) + phi
                shift_t[(basis, q)] = last_used.get((basis, q), 0)
        elif kind == "pulse":
            _, name, amp, det, phase, pps, protocol = op
            ch = chans[name]
            tgt_refs = {refs.get((ch.basis, q), 0.0) for q in ch.target}
            assert len(tgt_refs) <= 1, "mixed phase references"
            ref = tgt_refs.pop() if tgt_refs else 0.0
            d = amp["duration"]
            t0 = ch.end
            if protocol == "wait-for-all":
                t0 = max([t0] + [c.end for c in chans.values()])
            elif protocol == "min-delay":
                for oname, oc in chans.items():
                    if oname == name or not oc.slots:
                        continue
                    if oc.target & ch.target:
                        t0 = max(t0, oc.end)
            for q in ch.target:
                t0 = max(t0, shift_t.get((ch.basis, q), 0))
            ch.slots.append(
                ("pulse", t0, t0 + d, ch.target, (amp, det, phase, ref))
            )
            for q in ch.target:
                last_used[(ch.basis, q)] = t0 + d
                if pps:
                    refs[(ch.basis, q)] = refs.get((ch.basis, q), 0.0) + pps
                    # a post-shift happens AT the pulse end: it barriers
                    # later pulses on these targets like phase_shift does
                    shift_t[(ch.basis, q)] = t0 + d
        elif kind == "delay":
            _, name, d = op
            ch = chans[name]
            ch.slots.append(("delay", ch.end, ch.end + d, ch.target, None))
        elif kind == "target":
            _, name, qubits = op
            ch = chans[name]
            spec = ch.spec
            t0 = ch.end
            retarget = max(
                spec.get("fixed_retarget_t", 0),
                spec.get("min_retarget_interval", 0) if t0 > 0 else 0,
            )
            ch.target = frozenset(qubits)
            ch.slots.append(("target", t0, t0 + retarget, ch.target, None))
        else:
            raise ValueError(kind)
    total = max((c.end for c in chans.values()), default=0)
    return chans, total, slm_targets


def sample_channel(ch, total):
    amp = np.zeros(total)
    det = np.zeros(total)
    phase = np.zeros(total)
    pulse_slots = []
    last_phase = 0.0
    cursor = 0
    for kind, ti, tf, targets, payload in ch.slots:
        if ti > cursor:  # gap holds last phase, zero drive
            phase[cursor:ti] = last_phase
        if kind == "pulse":
            a, d, ph, ref = payload
            amp[ti:tf] = wf_samples(a)
            det[ti:tf] = wf_samples(d)
            cur = ph + ref
            phase[ti:tf] = cur
            last_phase = cur
            pulse_slots.append((ti, tf, targets))
        else:
            phase[ti:tf] = last_phase
        cursor = tf
    if cursor < total:
        phase[cursor:] = last_phase
    return amp, det, phase, pulse_slots


def assemble(program, qubit_ids):
    """Per-qubit nested assembly -> {basis: {qid: {amp, det, phase}}}
    (the all_local=True view) and the mask window end."""
    chans, total, slm_targets = schedule(program, qubit_ids)
    in_xy = any(c.basis == "XY" for c in chans.values())
    sampled = {
        name: sample_channel(c, total) for name, c in chans.items()
    }
    # mask window = min over channels (with pulses) of first pulse end
    mask_end = min((s[3][0][1] for s in sampled.values() if s[3]), default=0)
    slm_on = bool(slm_targets) and mask_end > 0 and not in_xy

    out = {}
    for name, ch in chans.items():  # declaration order
        amp, det, phase, pulse_slots = sampled[name]
        if not pulse_slots:
            continue
        basis = out.setdefault(ch.basis, {})
        qids = (
            qubit_ids
            if ch.addressing == "Global"
            else sorted(
                set().union(*(t for _, _, t in pulse_slots)), key=str
            )
        )
        for qid in qids:
            if ch.addressing == "Global":
                amp_q, det_q, phase_q = amp.copy(), det.copy(), phase.copy()
            else:
                m = np.zeros(total, dtype=bool)
                for ti, tf, targets in pulse_slots:
                    if qid in targets:
                        m[ti:tf] = True
                amp_q = np.where(m, amp, 0.0)
                det_q = np.where(m, det, 0.0)
                phase_q = np.where(m, phase, 0.0)
            if slm_on and qid in slm_targets:
                amp_q = amp_q.copy()
                amp_q[:mask_end] = 0.0
            leaf = basis.setdefault(
                qid, {"amp": np.zeros(total), "det": np.zeros(total),
                      "phase": np.zeros(total)}
            )
            leaf["amp"] = leaf["amp"] + amp_q
            leaf["det"] = leaf["det"] + det_q
            leaf["phase"] = np.where(amp_q != 0, phase_q, leaf["phase"])
    return out, total, mask_end


# ----------------------------------------------------------------------
# programs
# ----------------------------------------------------------------------
def cwf(d, v):
    return {"kind": "constant", "duration": d, "value": v}


def rwf(d, a, b):
    return {"kind": "ramp", "duration": d, "start": a, "stop": b}


def bwf(d, area):
    return {"kind": "blackman", "duration": d, "area": area}


GLOBAL_RYD = {"addressing": "Global", "basis": "ground-rydberg"}
GLOBAL_RAMAN = {"addressing": "Global", "basis": "digital"}
GLOBAL_MW = {"addressing": "Global", "basis": "XY"}


def programs():
    out = {}

    # 1. global + local rydberg: min-delay cross-channel waits, target
    #    switch with a retarget interval, post_phase_shift accumulation,
    #    explicit delay, trailing gap
    local_ryd = {
        "addressing": "Local", "basis": "ground-rydberg",
        "initial_target": ["q0"], "min_retarget_interval": 220,
        "fixed_retarget_t": 0,
    }
    out["global_local_retarget"] = {
        "qubits": ["q0", "q1", "q2"],
        "ops": [
            ["declare", "g", GLOBAL_RYD],
            ["declare", "l", local_ryd],
            # local pulse on q0 first (starts at 0)
            ["pulse", "l", cwf(120, 1.5), cwf(120, -0.4), 0.3, 0.0,
             "min-delay"],
            # global pulse must wait for the local one (targets overlap)
            ["pulse", "g", bwf(200, np.pi / 2), rwf(200, -2.0, 2.0), 0.0,
             0.5, "min-delay"],
            # retarget l to q2 (220 ns retarget interval; channel has
            # output so min_retarget_interval applies)
            ["target", "l", ["q2"]],
            # this local pulse waits on the global one (q2 in global's
            # targets); q2's reference carries the global pulse's 0.5
            # post_phase_shift (refs are per-qubit, shared across
            # channels of the basis), so it emits 1.1 + 0.5
            ["pulse", "l", rwf(80, 0.0, 2.2), cwf(80, 0.7), 1.1, 0.0,
             "min-delay"],
            ["delay", "g", 60],
            # second global pulse: phase 0.2 + accumulated 0.5 offset
            ["pulse", "g", cwf(100, 2.0), cwf(100, 0.0), 0.2, 0.0,
             "min-delay"],
        ],
    }

    # 2. protocols: disjoint local targets don't wait under min-delay;
    #    no-delay overlaps on purpose; wait-for-all syncs everything
    local_raman = {
        "addressing": "Local", "basis": "digital",
        "initial_target": ["q1"],
    }
    local_raman2 = {
        "addressing": "Local", "basis": "digital",
        "initial_target": ["q0"],
    }
    out["protocols_disjoint_targets"] = {
        "qubits": ["q0", "q1"],
        "ops": [
            ["declare", "r1", local_raman],
            ["declare", "r2", local_raman2],
            ["pulse", "r1", cwf(150, 1.0), cwf(150, 0.0), 0.0, 0.0,
             "min-delay"],
            # disjoint target -> starts at 0 despite min-delay
            ["pulse", "r2", cwf(100, 0.8), cwf(100, -0.2), 0.4, 0.0,
             "min-delay"],
            # no-delay: starts right where r2 ended (t=100) even though
            # r1 runs until 150
            ["target", "r2", ["q1"]],
            ["pulse", "r2", cwf(120, 0.6), cwf(120, 0.1), 0.9, 0.0,
             "no-delay"],
            # wait-for-all on r1: starts at max end over all channels
            ["pulse", "r1", rwf(90, 1.0, 0.0), cwf(90, 0.0), 0.0, 0.0,
             "wait-for-all"],
        ],
    }

    # 3. SLM mask on a global channel: per-qubit zeroing during the
    #    first-pulse window for masked qubits only
    out["slm_masked_global"] = {
        "qubits": ["q0", "q1", "q2", "q3"],
        "slm_mask": ["q1", "q3"],
        "ops": [
            ["declare", "g", GLOBAL_RYD],
            ["pulse", "g", bwf(180, np.pi), cwf(180, -1.0), 0.0, 0.0,
             "min-delay"],
            ["delay", "g", 40],
            ["pulse", "g", cwf(140, 1.8), rwf(140, 1.0, -1.0), 0.6, 0.0,
             "min-delay"],
        ],
    }

    # 4. XY (microwave) global: phase jump via post_phase_shift, delay
    #    idles, SLM configured but NOT applied to samples in XY mode
    out["xy_global_phase"] = {
        "qubits": ["q0", "q1"],
        "slm_mask": ["q0"],
        "ops": [
            ["declare", "mw", GLOBAL_MW],
            ["pulse", "mw", cwf(160, 1.2), cwf(160, 0.0), 0.0, np.pi / 4,
             "min-delay"],
            ["delay", "mw", 80],
            ["pulse", "mw", rwf(120, 0.0, 1.9), cwf(120, 0.5), 0.3, 0.0,
             "min-delay"],
        ],
    }

    # 5. two GLOBAL channels on different bases: independent schedules
    #    (full-register target overlap forces min-delay serialization),
    #    summed per qubit only within each basis
    out["two_bases_global"] = {
        "qubits": ["q0", "q1"],
        "ops": [
            ["declare", "ryd", GLOBAL_RYD],
            ["declare", "ram", GLOBAL_RAMAN],
            ["pulse", "ryd", cwf(100, 2.0), cwf(100, -0.5), 0.0, 0.0,
             "min-delay"],
            # same register -> waits for ryd despite different basis
            ["pulse", "ram", cwf(130, 1.1), cwf(130, 0.8), 0.7, 0.0,
             "min-delay"],
            ["pulse", "ryd", rwf(60, 2.0, 0.0), cwf(60, 0.0), 0.1, 0.0,
             "no-delay"],
        ],
    }

    # 6. explicit phase_shift(): a subset shift picked up by a local
    #    pulse; equal shifts on ALL qubits picked up by a global pulse
    #    (mixed refs on a global pulse would be an error); a shift on an
    #    idle channel's target exercises the phase barrier tagging
    local_ryd2 = {
        "addressing": "Local", "basis": "ground-rydberg",
        "initial_target": ["q1"], "min_retarget_interval": 0,
        "fixed_retarget_t": 0,
    }
    out["phase_shift_refs"] = {
        "qubits": ["q0", "q1"],
        "ops": [
            ["declare", "g", GLOBAL_RYD],
            ["declare", "l", local_ryd2],
            ["pulse", "l", cwf(100, 1.0), cwf(100, 0.0), 0.2, 0.0,
             "min-delay"],
            # shift only q1: the next local pulse on q1 emits 0.4 + 0.9
            ["phase_shift", 0.9, ["q1"], "ground-rydberg"],
            ["pulse", "l", cwf(80, 1.5), cwf(80, 0.3), 0.4, 0.0,
             "min-delay"],
            # equalize the refs (shift q0 by the same amount), then a
            # global pulse picks up the common 0.9 reference
            ["phase_shift", 0.9, ["q0"], "ground-rydberg"],
            ["pulse", "g", cwf(120, 2.0), cwf(120, -0.4), 0.1, 0.25,
             "min-delay"],
            # the global post_phase_shift advanced both refs to 1.15
            ["pulse", "l", cwf(60, 1.2), cwf(60, 0.0), 0.0, 0.0,
             "min-delay"],
        ],
    }

    return out


class _Encoder(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, np.ndarray):
            return list(o)
        if isinstance(o, (np.floating, np.integer)):
            return float(o)
        return super().default(o)


def main():
    fixtures = {}
    for name, prog in programs().items():
        nested, total, mask_end = assemble(prog, prog["qubits"])
        fixtures[name] = {
            "program": prog,
            "total": total,
            "mask_end": mask_end,
            "expected": {
                basis: {
                    qid: {k: list(v) for k, v in leaf.items()}
                    for qid, leaf in per_q.items()
                }
                for basis, per_q in nested.items()
            },
        }
    path = os.path.join(os.path.dirname(__file__), "sequence_samples.json")
    with open(path, "w") as f:
        json.dump(fixtures, f, cls=_Encoder)
    print(f"wrote {path}: {list(fixtures)}")


if __name__ == "__main__":
    main()
