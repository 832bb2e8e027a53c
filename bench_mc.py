"""Hardware Monte-Carlo runs-axis bench: the noisy multi-run path.

The reference executes stochastic noise realizations (doppler /
amplitude) as a serial Python loop — one fresh Hamiltonian + full solve
per run (/root/reference/pulser_diff/backend.py:573-595), so R runs cost
R x the single-solve wall-clock.  Here the runs axis is the fused Pallas
kernel's grid (ops/pallas_evolution.py pallas_evolve_mc): ONE launch
evolves the whole Monte-Carlo batch, so per-run cost amortizes both the
dispatch floor and the kernel's fixed overheads.

Times `TpuEmulator.run()` end-to-end (solve + on-device bitstring
sampling + NoisyResults assembly) for the bench.py 12-atom workload with
doppler + amplitude noise at several R.  Not part of the driver bench
contract; run manually: python bench_mc.py [N] [R1,R2,...].
"""

from __future__ import annotations

import json
import os
import sys
import time

DURATION = 660
N_PARAMS = 8
SAMPLING_RATE = 0.25
DET0 = -2.0
SPACING = 10.0


def build_sim(n_qubits: int, runs: int):
    import jax.numpy as jnp

    from pulser_diff_tpu import SimConfig, TpuEmulator
    from pulser_diff_tpu.core import (
        ConstantWaveform,
        CustomWaveform,
        MockDevice,
        Pulse,
        Register,
        Sequence,
    )
    from pulser_diff_tpu.ops.linalg import _interpolate_sine_np

    coords = [(SPACING * (i % 4), SPACING * (i // 4)) for i in range(n_qubits)]
    reg = Register.from_coordinates(coords, prefix="q")
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    M = _interpolate_sine_np(N_PARAMS, DURATION)
    import numpy as np

    amp = jnp.asarray(M @ np.linspace(1.0, 3.0, N_PARAMS))
    seq.add(
        Pulse(
            CustomWaveform(amp, duration=DURATION),
            ConstantWaveform(DURATION, DET0),
            0.0,
        ),
        "ryd",
    )
    sim = TpuEmulator.from_sequence(
        seq, sampling_rate=SAMPLING_RATE, evaluation_times="Minimal"
    )
    sim.set_config(
        SimConfig(
            noise=("doppler", "amplitude"),
            runs=runs,
            samples_per_run=5,
            temperature=50.0,
            amp_sigma=0.05,
        )
    )
    return sim


def time_runs(n_qubits: int, runs: int, n_timings: int = 3):
    sim = build_sim(n_qubits, runs)
    t0 = time.perf_counter()
    res = sim.run()
    t_first = time.perf_counter() - t0
    ts = []
    for _ in range(n_timings):
        t0 = time.perf_counter()
        res = sim.run()
        ts.append(time.perf_counter() - t0)
    # sanity: NoisyResults with normalized sampling distribution
    final = res.results[-1]  # Counter of bitstring probabilities
    total = sum(final.values())
    assert abs(total - 1.0) < 1e-6, total
    return t_first, min(ts)


def main():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rs = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [1, 8, 32]
    )
    rows = []
    for r in rs:
        t_first, t_best = time_runs(n, r)
        rows.append(
            {
                "runs": r,
                "wall_s": round(t_best, 4),
                "per_run_ms": round(t_best / r * 1e3, 2),
                "first_call_s": round(t_first, 1),
            }
        )
        print(f"[mc] N={n} R={r}: {t_best*1e3:.1f} ms "
              f"({t_best/r*1e3:.2f} ms/run)", file=sys.stderr)
    print(json.dumps({"n_qubits": n, "rows": rows}))


if __name__ == "__main__":
    main()
