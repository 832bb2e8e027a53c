"""Hardware MCWF (quantum-jump) bench: Lindblad noise at statevector cost.

The reference reaches Lindblad channels only through the full density
matrix (/root/reference/pulser_diff/backend.py:495-509 forces DP5_ME
routing), so its state costs dim^2 memory and dim^2-sized stage math.
The MCWF unraveling (solvers/mcwf.py) reproduces the same master
equation as an average over R statevector trajectories solved in ONE
lax.scan with R as the MXU batch axis — run(solver=MCWF) is one cached
jitted program including on-device bitstring sampling.

Two measurements:
  A) 3-atom parity anchor: populations of run(solver=MCWF, n_traj=R)
     vs the DP5_ME density-matrix path (the superop fast path), plus
     both wall-clocks.  Checks the unraveling ON HARDWARE against the
     solver the CPU suite pins to the scipy golden model.
  B) scaling rows: N = 10 (f64 drift) and N = 12 (f32 drift) with
     dephasing — sizes where the reference architecture's rho
     (dim^2 = 10^6..10^7 complex) makes density-matrix solves
     impractical, while trajectories stay statevector-sized.

Not part of the driver bench contract; run manually:
    python bench_mcwf.py            # TPU (or whatever axon gives)
    PDT_BENCH_CPU=1 python bench_mcwf.py   # CPU mechanism test
Prints one JSON line on stdout; progress on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

DURATION = 400
DET0 = -1.0
SPACING = 9.0
DEPHASING_RATE = 0.05


def _build_sim(n_qubits: int, runs: int, samples_per_run: int = 40):
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
    M = _interpolate_sine_np(4, DURATION)
    amp = jnp.asarray(M @ np.linspace(1.0, 2.5, 4))
    seq.add(
        Pulse(
            CustomWaveform(amp, duration=DURATION),
            ConstantWaveform(DURATION, DET0),
            0.0,
        ),
        "ryd",
    )
    sim = TpuEmulator.from_sequence(
        seq,
        sampling_rate=0.5,
        evaluation_times=0.25,
        config=SimConfig(
            noise="dephasing",
            dephasing_rate=DEPHASING_RATE,
            runs=runs,
            samples_per_run=samples_per_run,
        ),
    )
    return sim


def _time(fn, n_timings: int = 3):
    t0 = time.perf_counter()
    out = fn()
    t_first = time.perf_counter() - t0
    ts = []
    for _ in range(n_timings):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return t_first, min(ts), out


def parity_anchor():
    """3-atom MCWF vs DP5_ME populations + both wall-clocks."""
    import jax

    from pulser_diff_tpu import SolverType

    sim = _build_sim(3, runs=1024, samples_per_run=40)
    t_me_first, t_me, res_me = _time(lambda: sim.run())
    print(
        f"[mcwf-bench] 3-atom DP5_ME: {t_me*1e3:.1f} ms "
        f"(first {t_me_first:.1f} s)",
        file=sys.stderr,
    )
    t_mc_first, t_mc, res_mc = _time(
        lambda: sim.run(solver=SolverType.MCWF)
    )
    print(
        f"[mcwf-bench] 3-atom MCWF R=1024: {t_mc*1e3:.1f} ms "
        f"(first {t_mc_first:.1f} s)",
        file=sys.stderr,
    )
    ref_diag = np.asarray(
        jax.device_get(
            np.diagonal(
                np.asarray(jax.device_get(res_me.states.re)),
                axis1=-2,
                axis2=-1,
            )
        )
    )
    mc_diag = np.diagonal(
        np.asarray(jax.device_get(res_mc.states.re)), axis1=-2, axis2=-1
    )
    diff = float(np.abs(mc_diag - ref_diag).max())
    print(f"[mcwf-bench] max |pop_MCWF - pop_ME| = {diff:.4f}", file=sys.stderr)
    return {
        "t_me_s": round(t_me, 4),
        "t_mcwf_s": round(t_mc, 4),
        "pop_diff": round(diff, 5),
    }


def scaling_row(n_qubits: int, runs: int, solver_name: str):
    from pulser_diff_tpu import SolverType

    sim = _build_sim(n_qubits, runs=runs, samples_per_run=10)
    solver = getattr(SolverType, solver_name)
    t_first, t_best, res = _time(lambda: sim.run(solver=solver))
    final = res.results[-1]
    assert abs(sum(final.values()) - 1.0) < 1e-6
    print(
        f"[mcwf-bench] N={n_qubits} {solver_name} R={runs}: "
        f"{t_best*1e3:.1f} ms ({t_best/runs*1e3:.2f} ms/traj, "
        f"first {t_first:.1f} s)",
        file=sys.stderr,
    )
    return {
        "n_qubits": n_qubits,
        "solver": solver_name,
        "runs": runs,
        "wall_s": round(t_best, 4),
        "per_traj_ms": round(t_best / runs * 1e3, 3),
        "first_call_s": round(t_first, 1),
    }


def main():
    import jax

    if os.environ.get("PDT_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass

    cpu = bool(os.environ.get("PDT_BENCH_CPU"))
    out = {"anchor": parity_anchor(), "rows": []}
    rows = [(6, 64, "MCWF")] if cpu else [(10, 64, "MCWF"), (12, 64, "MCWF_F32")]
    for n, r, s in rows:
        out["rows"].append(scaling_row(n, r, s))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
