"""Seeded fuzz parity: random SCHEDULING programs vs the independent
pure-numpy scheduler (tests/fixtures/gen_sequence_fixtures.py).

The frozen fixtures pin six hand-written programs; this fuzzes the same
declarative op language — random channel mixes, protocols, delays,
retargets, post_phase_shifts and phase_shift ops — and demands 1e-12
stream parity between the product Sequence/sample() stack and the
zero-product-import reimplementation.  Catches scheduling divergences
(phase barriers, reference accumulation, min-delay waits) that fixed
fixtures never reach.
"""

import numpy as np
import pytest

from pulser_diff_tpu.core import sample

from .fixtures.gen_sequence_fixtures import assemble
from .test_sequence_fixtures import _build_sequence

GLOBAL_RYD = {"addressing": "Global", "basis": "ground-rydberg"}
GLOBAL_RAMAN = {"addressing": "Global", "basis": "digital"}


def cwf(d, v):
    return {"kind": "constant", "duration": int(d), "value": float(v)}


def rwf(d, a, b):
    return {"kind": "ramp", "duration": int(d), "start": float(a),
            "stop": float(b)}


def bwf(d, area):
    return {"kind": "blackman", "duration": int(d), "area": float(area)}


def _random_wf(rng, dur):
    k = rng.integers(0, 3)
    if k == 0:
        return cwf(dur, rng.uniform(0.2, 2.5))
    if k == 1:
        return rwf(dur, rng.uniform(-1, 2), rng.uniform(-1, 2))
    return bwf(dur, rng.uniform(0.5, 3.0))


def _random_program(seed: int) -> dict:
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 5))
    qubits = [f"q{i}" for i in range(n)]
    chans = []
    ops = []
    # 1 global + up to 2 local channels over two bases
    basis_of = {}
    gbasis = "ground-rydberg" if rng.random() < 0.7 else "digital"
    ops.append(["declare", "g",
                GLOBAL_RYD if gbasis == "ground-rydberg" else GLOBAL_RAMAN])
    chans.append("g")
    basis_of["g"] = gbasis
    local_names = []
    for i in range(int(rng.integers(0, 3))):
        basis = "ground-rydberg" if rng.random() < 0.5 else "digital"
        name = f"l{i}"
        spec = {
            "addressing": "Local", "basis": basis,
            "initial_target": [qubits[int(rng.integers(0, n))]],
            "min_retarget_interval": int(rng.choice([0, 120, 220])),
            "fixed_retarget_t": int(rng.choice([0, 50])),
        }
        ops.append(["declare", name, spec])
        chans.append(name)
        local_names.append(name)
        basis_of[name] = basis

    shifted = set()  # (basis, qubit) with a pending subset shift
    for _ in range(int(rng.integers(4, 10))):
        r = rng.random()
        if r < 0.5:
            # pulse on a random channel; avoid mixed refs on the global
            # channel by only shifting subsets between LOCAL pulses
            ch = chans[int(rng.integers(0, len(chans)))]
            if ch == "g" and any(b == basis_of["g"] for b, _ in shifted):
                # equalize first: shift the missing qubits by 0 is not
                # enough (amounts differ) — just skip the global pulse
                ch = local_names[0] if local_names else None
                if ch is None:
                    continue
            dur = int(rng.integers(16, 200))
            pps = float(rng.choice([0.0, 0.0, 0.3, -0.7]))
            protocol = str(
                rng.choice(["min-delay", "no-delay", "wait-for-all"])
            )
            ops.append([
                "pulse", ch, _random_wf(rng, dur), _random_wf(rng, dur),
                float(rng.uniform(-np.pi, np.pi)), pps, protocol,
            ])
        elif r < 0.65:
            ch = chans[int(rng.integers(0, len(chans)))]
            ops.append(["delay", ch, int(rng.integers(8, 120))])
        elif r < 0.8 and local_names:
            ch = local_names[int(rng.integers(0, len(local_names)))]
            tgt = qubits[int(rng.integers(0, n))]
            ops.append(["target", ch, [tgt]])
        else:
            basis = str(rng.choice(["ground-rydberg", "digital"]))
            if rng.random() < 0.5:
                tgt = list(qubits)  # uniform shift: global pulses stay OK
            else:
                tgt = [qubits[int(rng.integers(0, n))]]
                shifted.add((basis, tgt[0]))
            ops.append([
                "phase_shift", float(rng.uniform(-1.5, 1.5)), tgt, basis
            ])
    # guarantee at least one pulse per declared channel so assembly has
    # slots to compare
    for ch in chans:
        ops.append([
            "pulse", ch, cwf(40, 1.0), cwf(40, 0.1), 0.05, 0.0, "no-delay"
        ])
    return {"qubits": qubits, "ops": ops}


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_schedule_parity(seed):
    prog = _random_program(seed)
    try:
        expected, total, _ = assemble(prog, prog["qubits"])
        independent_rejects = None
    except AssertionError:
        independent_rejects = "mixed phase references"

    if independent_rejects is not None:
        with pytest.raises(ValueError, match="different phase references"):
            sample(_build_sequence(prog))
        return

    seq = _build_sequence(prog)
    ss = sample(seq)
    assert ss.max_duration == total, prog
    got = ss.to_nested_dict(all_local=True)["Local"]
    assert set(got) == set(expected)
    for basis, per_q in expected.items():
        assert set(got[basis]) == set(per_q)
        for qid, leaf in per_q.items():
            for key in ("amp", "det", "phase"):
                np.testing.assert_allclose(
                    np.asarray(got[basis][qid][key]),
                    np.asarray(leaf[key]),
                    rtol=0, atol=1e-12,
                    err_msg=f"seed {seed}: {basis}/{qid}/{key}",
                )
