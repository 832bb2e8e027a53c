"""Population/multi-start probe: P candidate parameter sets, fwd+grad
through expectation_population_fn (ONE fused MC-kernel launch) vs P
sequential single-candidate steps.

Manual probe (bench.py stays the ONE-json-line driver artifact):
    python bench_population.py [N] [P]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

DURATION = 660
N_PARAMS = 8
SAMPLING_RATE = 0.25
DET0 = -2.0
SPACING = 10.0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
    import jax.numpy as jnp

    from pulser_diff_tpu.core import (
        ConstantWaveform, CustomWaveform, MockDevice, Pulse, Register,
        Sequence,
    )
    from pulser_diff_tpu.model import QuantumModel
    from pulser_diff_tpu.ops.linalg import _interpolate_sine_np

    coords = [(SPACING * (i % 4), SPACING * (i // 4)) for i in range(n)]
    reg = Register.from_coordinates(coords, prefix="q")
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    amp_var = seq.declare_variable("amp_samples", size=DURATION)
    seq.add(
        Pulse(
            CustomWaveform(amp_var, duration=DURATION),
            ConstantWaveform(DURATION, DET0),
            0.0,
        ),
        "ryd",
    )
    M = jnp.asarray(_interpolate_sine_np(N_PARAMS, DURATION))
    model = QuantumModel(
        seq,
        {"amp_samples": ((jnp.linspace(1.0, 3.0, N_PARAMS),), lambda v: M @ v)},
        sampling_rate=SAMPLING_RATE,
        evaluation_times="Minimal",
    )

    key = jax.random.PRNGKey(0)
    stack = {
        "amp_samples_0": jnp.linspace(1.0, 3.0, N_PARAMS)[None, :]
        + 0.3 * jax.random.normal(key, (P, N_PARAMS))
    }

    pfn = model.expectation_population_fn()

    def pop_loss(s):
        _, vals = pfn(s)
        return jnp.sum(vals[:, -1] ** 2)

    vag_pop = jax.jit(jax.value_and_grad(pop_loss))
    t0 = time.perf_counter()
    v, g = vag_pop(stack)
    jax.block_until_ready((v, g))
    c_pop = time.perf_counter() - t0
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = vag_pop(stack)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    t_pop = min(ts)

    # sequential single-candidate baseline (the shape a user would write
    # without the population path): P independent jitted steps
    fn1 = model.expectation_fn()

    def one_loss(p):
        _, vals = fn1({"amp_samples_0": p})
        return vals[-1] ** 2

    vag_one = jax.jit(jax.value_and_grad(one_loss))
    p0 = stack["amp_samples_0"][0]
    v1, g1 = vag_one(p0)
    jax.block_until_ready((v1, g1))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [vag_one(stack["amp_samples_0"][i]) for i in range(P)]
        jax.block_until_ready(outs)
        ts.append(time.perf_counter() - t0)
    t_seq = min(ts)

    # parity: population losses vs per-candidate losses
    _, vals = jax.jit(pfn)(stack)
    per_pop = np.asarray(jax.device_get(vals[:, -1]))
    per_one = np.array(
        [
            float(jax.device_get(fn1({"amp_samples_0": stack["amp_samples_0"][i]})[1][-1]))
            for i in range(P)
        ]
    )
    dv = float(np.abs(per_pop - per_one).max())

    print(
        f"[population] N={n} P={P}: pop fwd+grad {t_pop*1e3:.1f} ms "
        f"(compile {c_pop:.1f}s) vs sequential {t_seq*1e3:.1f} ms "
        f"({t_seq/t_pop:.1f}x); |dv|={dv:.3g}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "n_qubits": n,
                "population": P,
                "pop_step_s": round(t_pop, 6),
                "seq_step_s": round(t_seq, 6),
                "speedup": round(t_seq / t_pop, 2),
                "value_diff": dv,
            }
        )
    )


if __name__ == "__main__":
    main()
