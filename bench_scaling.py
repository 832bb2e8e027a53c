"""Scaling probe: fused-kernel evolution + adjoint grad beyond the
12-atom headline (bench.py).

Runs the bench.py workload shape at N atoms (default 16 -> 65,536-dim
state, da=db=256 factor matrices) through the fused DP5 Pallas kernel
and the f64 XLA path, reporting wall-clock and fused-vs-f64 accuracy.
The torch-CPU reference architecture is architecturally unable to touch
this size (the 12-atom workload already costs it 137+ s; the sparse
term-list closure scales ~16x per added atom pair) — so this probe has
no live baseline column, it demonstrates headroom.

Not part of the driver bench contract (bench.py stays the ONE-json-line
artifact); run manually: python bench_scaling.py [N].
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

DURATION = 660
N_PARAMS = 8
SAMPLING_RATE = 0.25
DET0 = -2.0
SPACING = 10.0


def run(n_qubits: int, fused: bool, n_timings: int = 3, solver: str | None = None,
        ckpt: bool | None = None):
    import os

    import jax

    # Env vars are a no-op under the axon sitecustomize (jax imports at
    # interpreter start); config.update is the effective switch.
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

    coords = [
        (SPACING * (i % 4), SPACING * (i // 4)) for i in range(n_qubits)
    ]
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
    extra = {}
    if solver is not None:
        from pulser_diff_tpu.solvers import SolverType

        extra["solver"] = getattr(SolverType, solver)
    if ckpt is not None:
        extra["ckpt"] = ckpt
    model = QuantumModel(
        seq,
        {"amp_samples": ((jnp.linspace(1.0, 3.0, N_PARAMS),), lambda v: M @ v)},
        sampling_rate=SAMPLING_RATE,
        evaluation_times="Minimal",
        fused=fused,
        **extra,
    )
    obs = total_magnetization(n_qubits, dense=False)
    exp_fn = model.expectation_fn(obs)

    def loss(p):
        _, vals = exp_fn({"amp_samples_0": p})
        return vals[-1]

    vag = jax.jit(jax.value_and_grad(loss))
    p = jnp.linspace(1.0, 3.0, N_PARAMS)
    t0 = time.perf_counter()
    v, g = vag(p)
    jax.block_until_ready((v, g))
    t_compile = time.perf_counter() - t0
    ts = []
    for _ in range(n_timings):
        t0 = time.perf_counter()
        out = vag(p)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return (
        t_compile,
        min(ts),
        float(v),
        np.asarray(jax.device_get(g)),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    # Optional path selector: "fused" / "f64" / "both" (default) /
    # "rk4" (fused RK4 stages) / "krylov" (KRYLOV_SE, f64 XLA) /
    # "krylov32" (KRYLOV_SE_F32, f32 Lanczos on the MXU) /
    # "f32" (DP5_SE_F32, the HBM-resident stepper for N >= 18) /
    # "f32vs64" (f32 and f64 back-to-back with value/grad diffs).
    # At N >= 18 prefer "f32": the f64 path costs minutes per probe.
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    out = {"n_qubits": n, "dim": 2**n}
    if which in ("ckpt", "ckpt_noauto"):
        # HBM-checkpointed fused adjoint probe (the N=18 wall attack):
        # DP5_PALLAS forces the fused path; ckpt=True selects the
        # checkpointed forward + reconstruction-free adjoint
        ck, t_c, v_c, g_c = run(
            n, fused=True, solver="DP5_PALLAS",
            ckpt=(which == "ckpt"),
        )
        print(
            f"[scaling] N={n} {which}: compile={ck:.1f}s "
            f"step={t_c*1e3:.2f}ms value={v_c:.9f}",
            file=sys.stderr,
        )
        out["ckpt_step_s"] = round(t_c, 6)
        out["ckpt_compile_s"] = round(ck, 1)
        out["ckpt_value"] = v_c
        out["ckpt_grad"] = [float(x) for x in np.asarray(g_c).ravel()[:8]]
        print(json.dumps(out))
        return
    if which == "rk4":
        ck, t_rk, v_rk, g_rk = run(n, fused=True, solver="RK4_PALLAS")
        print(
            f"[scaling] N={n} rk4-fused: compile={ck:.1f}s "
            f"step={t_rk*1e3:.2f}ms value={v_rk:.9f}",
            file=sys.stderr,
        )
        out["rk4_step_s"] = round(t_rk, 6)
        out["rk4_compile_s"] = round(ck, 1)
        out["rk4_value"] = v_rk
        print(json.dumps(out))
        return
    if which == "f32":
        # HBM-resident f32 XLA stepper: the gradient path past the fused
        # kernels' VMEM ceiling (N >= 18); optionally compare vs fused
        # forward accuracy by running "fused" separately
        ck, t_32, v_32, g_32 = run(n, fused=False, solver="DP5_SE_F32")
        print(
            f"[scaling] N={n} f32-xla: compile={ck:.1f}s "
            f"step={t_32*1e3:.2f}ms value={v_32:.9f}",
            file=sys.stderr,
        )
        out["f32_step_s"] = round(t_32, 6)
        out["f32_compile_s"] = round(ck, 1)
        out["f32_value"] = v_32
        out["f32_grad"] = [float(x) for x in np.asarray(g_32).ravel()[:8]]
        print(json.dumps(out))
        return
    if which == "f32vs64":
        c32, t_32, v_32, g_32 = run(n, fused=False, solver="DP5_SE_F32")
        c64, t_64, v_64, g_64 = run(n, fused=False)
        print(
            f"[scaling] N={n} f32 {t_32*1e3:.2f}ms vs f64 {t_64*1e3:.2f}ms "
            f"(x{t_64/t_32:.1f}); |dv|={abs(v_32-v_64):.3g} "
            f"|dg|={np.abs(g_32-g_64).max():.3g}",
            file=sys.stderr,
        )
        out["f32_step_s"] = round(t_32, 6)
        out["f64_step_s"] = round(t_64, 6)
        out["value_diff"] = float(abs(v_32 - v_64))
        out["grad_diff"] = float(np.abs(g_32 - g_64).max())
        print(json.dumps(out))
        return
    if which == "krylov32":
        # f32 Lanczos (KRYLOV_SE_F32): the MXU-speed Krylov mode; value
        # comparable offline against the f64 probes' printed value
        ck, t_k32, v_k32, g_k32 = run(n, fused=False, solver="KRYLOV_SE_F32")
        print(
            f"[scaling] N={n} krylov-f32: compile={ck:.1f}s "
            f"step={t_k32*1e3:.2f}ms value={v_k32:.9f}",
            file=sys.stderr,
        )
        out["krylov32_step_s"] = round(t_k32, 6)
        out["krylov32_compile_s"] = round(ck, 1)
        out["krylov32_value"] = v_k32
        out["krylov32_grad"] = [
            float(x) for x in np.asarray(g_k32).ravel()[:8]
        ]
        print(json.dumps(out))
        return
    if which == "krylov":
        ck, t_kr, v_kr, g_kr = run(n, fused=False, solver="KRYLOV_SE")
        print(
            f"[scaling] N={n} krylov: compile={ck:.1f}s "
            f"step={t_kr*1e3:.2f}ms value={v_kr:.9f}",
            file=sys.stderr,
        )
        out["krylov_step_s"] = round(t_kr, 6)
        out["krylov_compile_s"] = round(ck, 1)
        out["krylov_value"] = v_kr
        print(json.dumps(out))
        return
    t_fused = v_fused = g_fused = None
    if which in ("both", "fused"):
        c1, t_fused, v_fused, g_fused = run(n, fused=True)
        print(
            f"[scaling] N={n} fused: compile={c1:.1f}s step={t_fused*1e3:.2f}ms "
            f"value={v_fused:.9f}",
            file=sys.stderr,
        )
        out["fused_step_s"] = round(t_fused, 6)
        out["fused_compile_s"] = round(c1, 1)
    if which in ("both", "f64"):
        c2, t_f64, v_f64, g_f64 = run(n, fused=False)
        print(
            f"[scaling] N={n} f64:   compile={c2:.1f}s step={t_f64*1e3:.2f}ms "
            f"value={v_f64:.9f}",
            file=sys.stderr,
        )
        out["f64_step_s"] = round(t_f64, 6)
        out["f64_compile_s"] = round(c2, 1)
        if t_fused is not None:
            out["value_diff"] = float(abs(v_fused - v_f64))
            out["grad_diff"] = float(np.abs(g_fused - g_f64).max())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
