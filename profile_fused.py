"""Decompose the fused model-API step time (bench.py workload).

Times three jitted programs on the current backend:
  A. full model step: value_and_grad through sampler -> Hamiltonian
     build -> fused Pallas solve -> expectation (the bench headline);
  B. solve-only: value_and_grad from CONCRETE Hamiltonian streams
     through staging + the fused kernel + a diagonal expectation
     (what the kernel + its adjoint actually cost);
  C. prep-only: value_and_grad of the params -> FactoredHamiltonian
     pipeline (sampler + build_data), no solve.

A - (B + C) ~ the XLA glue between them (stream interpolation chaining,
transposes, f64<->f32 casts, result reshuffling).  Run manually on TPU:
python profile_fused.py [n_qubits].
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(n_qubits: int = 12) -> None:
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

    if os.environ.get("PDT_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from pulser_diff_tpu.core import (
        ConstantWaveform,
        CustomWaveform,
        MockDevice,
        Pulse,
        Register,
        Sequence,
    )
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.model import QuantumModel
    from pulser_diff_tpu.ops import total_magnetization
    from pulser_diff_tpu.ops.linalg import (
        _interpolate_sine_np,
        total_magnetization_diag,
    )
    from pulser_diff_tpu.ops.pallas_evolution import pallas_evolve_states
    from pulser_diff_tpu.solvers import TimeGrid

    DURATION, N_PARAMS, RATE, DET0, SPACING = 660, 8, 0.25, -2.0, 10.0
    coords = [(SPACING * (i % 4), SPACING * (i // 4)) for i in range(n_qubits)]
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
        sampling_rate=RATE,
        evaluation_times="Minimal",
        fused=True,
    )
    obs = total_magnetization(n_qubits, dense=False)
    exp_fn = model.expectation_fn(obs)
    p = jnp.linspace(1.0, 3.0, N_PARAMS)

    def loss_full(pp):
        _, vals = exp_fn({"amp_samples_0": pp})
        return vals[-1]

    # --- concrete pieces for the decomposition --------------------------
    sim = model._make_emulator({"amp_samples_0": p})
    h = sim._hamiltonian
    substeps = int(
        model.options.get("substeps", model._default_substeps())
    )
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array).refined(
        substeps
    )
    hd0 = h._ham_data
    psi0 = sim._initial_state
    nb = psi0.shape[1]
    da, db = h.dim**h._a, h.dim**h._b
    p3 = Cplx(
        psi0.re.T.reshape(nb, da, db), psi0.im.T.reshape(nb, da, db)
    )
    zdiag = jnp.asarray(
        total_magnetization_diag(n_qubits), jnp.float32
    ).reshape(da, db)
    interpret = jax.default_backend() == "cpu"

    def loss_solve(streams):
        hd = hd0._replace(
            row_streams=Cplx(streams["rr"], streams["ri"]),
            col_streams=Cplx(streams["cr"], streams["ci"]),
            int_diag=streams["d"],
        )
        states = pallas_evolve_states(
            hd, p3, grid, method="DP5", interpret=interpret
        )
        st = states[-1]
        return jnp.sum(zdiag * (st.re[0] ** 2 + st.im[0] ** 2))

    streams0 = {
        "rr": hd0.row_streams.re, "ri": hd0.row_streams.im,
        "cr": hd0.col_streams.re, "ci": hd0.col_streams.im,
        "d": hd0.int_diag,
    }

    def loss_prep(pp):
        simp = model._make_emulator({"amp_samples_0": pp})
        hdp = simp._hamiltonian._ham_data
        return (
            hdp.row_streams.re.sum() + hdp.row_streams.im.sum()
            + hdp.col_streams.re.sum() + hdp.col_streams.im.sum()
            + hdp.int_diag.sum()
        )

    def timed(name, fn, arg, n=5):
        f = jax.jit(jax.value_and_grad(fn))
        t0 = time.perf_counter()
        out = f(arg)
        jax.block_until_ready(out)
        tc = time.perf_counter() - t0
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = f(arg)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        print(
            f"[profile] {name}: compile={tc:.1f}s step={min(ts)*1e3:.2f}ms",
            file=sys.stderr,
        )
        return min(ts)

    tA = timed("A full model step   ", loss_full, p)
    tB = timed("B solve-only (kernel)", loss_solve, streams0)
    tC = timed("C prep-only (sampler)", loss_prep, p)

    # D: trivial program — measures the fixed per-execution cost of this
    # backend (dispatch + any remote-tunnel round trip), the floor every
    # jitted step pays regardless of its content.
    def loss_trivial(pp):
        return jnp.sum(jnp.sin(pp))

    tD = timed("D trivial jitted fn  ", loss_trivial, p)
    print(
        f"[profile] residual A-(B+C) = {(tA - tB - tC)*1e3:.2f} ms; "
        f"dispatch floor D = {tD*1e3:.2f} ms",
        file=sys.stderr,
    )

    # E: K solve+adjoint iterations chained inside ONE jitted program
    # (lax.scan; each iteration perturbs the streams by eps*grad so no
    # iteration can be hoisted or dead-coded).  Amortizes the dispatch
    # floor: per-iter = (t_E - t_D) / K is the honest kernel+adjoint
    # cost, the number to use when A/B-testing kernel variants (e.g.
    # PDT_KERNEL_HOIST) whose effect is smaller than the floor.
    K_AMORT = int(os.environ.get("PDT_PROFILE_AMORTIZE", "8"))

    def chained(streams):
        def step(s, _):
            l, g = jax.value_and_grad(loss_solve)(s)
            s = jax.tree.map(lambda a, b: a + 1e-12 * b, s, g)
            return s, l
        _, ls = jax.lax.scan(step, streams, None, length=K_AMORT)
        return ls.sum()

    fE = jax.jit(chained)
    t0 = time.perf_counter()
    jax.block_until_ready(fE(streams0))
    tcE = time.perf_counter() - t0
    tsE = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fE(streams0))
        tsE.append(time.perf_counter() - t0)
    tE = min(tsE)
    print(
        f"[profile] E solve+adjoint x{K_AMORT} in one jit: compile={tcE:.1f}s "
        f"total={tE*1e3:.2f}ms per-iter=({tE*1e3:.2f}-{tD*1e3:.2f})/{K_AMORT}"
        f" = {(tE - tD)/K_AMORT*1e3:.2f} ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
