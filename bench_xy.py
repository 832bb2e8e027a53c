"""Hardware probe: the XY (dipole flip-flop) fused kron-pair path.

The fused kernel applies XY interactions as kron-pair terms
z_k (R_k (x) C_k) + h.c. (R @ Psi @ C^T matmuls inside the kernel), with
the adjoint emitting cotangents for the kron PART MATRICES so qubit-
coordinate gradients flow through the fused path
(ops/pallas_evolution.py).  That machinery is pinned in interpret mode
(tests/test_pallas.py); this probe runs it on REAL hardware: timing +
fused-vs-f64 value/grad parity for a 12-atom XY sequence whose gradient
includes both the 8 waveform parameters and one qubit's coordinates
(the kron-cotangent path).

Reference surface: XY C3(1-3cos^2 theta)/r^3 interactions,
/root/reference/pulser_diff/hamiltonian.py:346-366; coordinate
gradients backend.py:456-460.  Run manually: python bench_xy.py [N].
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

DURATION = 400
N_PARAMS = 8
SAMPLING_RATE = 0.25
SPACING = 8.0


def run(n_qubits: int, fused: bool, n_timings: int = 3):
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass
    import jax.numpy as jnp

    from pulser_diff_tpu.core import (
        ConstantWaveform,
        CustomWaveform,
        MockDevice,
        Pulse,
        Register,
        Sequence,
    )
    from pulser_diff_tpu.model import QuantumModel
    from pulser_diff_tpu.ops import total_magnetization
    from pulser_diff_tpu.ops.linalg import _interpolate_sine_np

    coords = [(SPACING * (i % 4), SPACING * (i // 4)) for i in range(n_qubits)]
    reg = Register.from_coordinates(coords, prefix="q")
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("mw", "microwave_global")
    amp_var = seq.declare_variable("amp_samples", size=DURATION)
    seq.add(
        Pulse(
            CustomWaveform(amp_var, duration=DURATION),
            ConstantWaveform(DURATION, 0.0),
            0.0,
        ),
        "mw",
    )
    M = jnp.asarray(_interpolate_sine_np(N_PARAMS, DURATION))
    model = QuantumModel(
        seq,
        {
            "amp_samples": ((jnp.linspace(0.5, 2.0, N_PARAMS),), lambda v: M @ v),
            # one trainable qubit coordinate: the gradient flows through
            # the XY kron part matrices inside the fused kernel
            "q1": jnp.asarray(coords[1]),
        },
        sampling_rate=SAMPLING_RATE,
        evaluation_times="Minimal",
        fused=fused,
    )
    obs = total_magnetization(n_qubits, dense=False)
    exp_fn = model.expectation_fn(obs)

    def loss(p, c1):
        _, vals = exp_fn({"amp_samples_0": p, "q1": c1})
        return vals[-1]

    vag = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    p = jnp.linspace(0.5, 2.0, N_PARAMS)
    c1 = jnp.asarray(coords[1])
    t0 = time.perf_counter()
    v, (gp, gc) = vag(p, c1)
    jax.block_until_ready((v, gp, gc))
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(n_timings):
        t0 = time.perf_counter()
        out = vag(p, c1)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return (
        t_compile,
        min(ts),
        float(v),
        np.asarray(jax.device_get(gp)),
        np.asarray(jax.device_get(gc)),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    c1, t_fused, v_fused, gp_f, gc_f = run(n, fused=True)
    print(
        f"[xy] N={n} fused: compile={c1:.1f}s step={t_fused*1e3:.2f}ms "
        f"value={v_fused:.9f} |gcoord|={np.abs(gc_f).max():.6f}",
        file=sys.stderr,
    )
    c2, t_f64, v_f64, gp_6, gc_6 = run(n, fused=False)
    print(
        f"[xy] N={n} f64:   compile={c2:.1f}s step={t_f64*1e3:.2f}ms "
        f"value={v_f64:.9f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "n_qubits": n,
                "mode": "XY",
                "fused_step_s": round(t_fused, 6),
                "f64_step_s": round(t_f64, 6),
                "value_diff": float(abs(v_fused - v_f64)),
                "param_grad_diff": float(np.abs(gp_f - gp_6).max()),
                "coord_grad_diff": float(np.abs(gc_f - gc_6).max()),
            }
        )
    )


if __name__ == "__main__":
    main()
