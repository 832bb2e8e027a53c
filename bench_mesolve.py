"""Mesolve decision benchmark: XLA Lindblad path vs torch reference arch.

Backs the deliberate no-fused-mesolve scope decision (STATUS.md) with a
measured number (VERDICT.md round-3 next-step #5): the reference's ME
workloads are small-N deterministic solves (2-3 atoms in its tests,
reference backend.py:495-509 routes `run()` to pyqtorch mesolve when
collapse ops exist; it never benchmarks mesolve), so the question is
whether the XLA scan stepper is already fast enough there to make a
Pallas mesolve kernel pointless.

Workload: 3 atoms in a line, 400 ns, 4-parameter sine-interpolated
amplitude, constant detuning, dephasing noise (rate 0.05) -> Lindblad
evolution of the 8x8 density matrix with DP5 stages; loss = final total
magnetization; gradient w.r.t. the 4 waveform parameters.

Baseline: the same math built the way the upstream stack is built —
sparse term-list H(t) closure evaluated per stage, dense rho, autograd
through the unrolled DP5 loop (torch CPU, f64).

Round-5 extension (VERDICT round-4 #2): the MID-SIZE regime.  The
superop stack cannot be built past dim ~64 ((dim^2)^2 entries), so
6-10 atom differentiable mesolve runs the DENSE form
(solvers/solver.py _make_me_step_dense: H(t) materialized per stage,
RHS = (dim, dim) matmuls on the MXU).  This bench parametrizes the
atom count / solver / form so the decision table covers dim 8-256.

Usage:  python bench_mesolve.py            # TPU (or whatever axon gives)
        PDT_BENCH_CPU=1 python bench_mesolve.py   # CPU mechanism test
        PDT_MESOLVE_N=6 PDT_MESOLVE_SOLVER=DP5_ME_F32 \
            PDT_MESOLVE_SKIP_TORCH=1 python bench_mesolve.py
Env knobs: PDT_MESOLVE_N (atoms, default 3), PDT_MESOLVE_SOLVER
(DP5_ME / DP5_ME_F32), PDT_MESOLVE_FORM (me_form override),
PDT_MESOLVE_SKIP_TORCH (reuse a recorded torch number: at N>=6 the
baseline takes minutes per run).
Prints one JSON line {"n", "solver", "form", "torch_s", "jax_s",
"ratio", "value_diff", "grad_diff"} on stdout; breakdown on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
from math import pi, sin

import numpy as np

N_QUBITS = int(os.environ.get("PDT_MESOLVE_N", "3"))
DURATION = 400
N_PARAMS = 4
SAMPLING_RATE = 0.5
SPACING = 8.0
DET0 = -1.0
DEPHASING_RATE = 0.05
SOLVER = os.environ.get("PDT_MESOLVE_SOLVER", "DP5_ME")
ME_FORM = os.environ.get("PDT_MESOLVE_FORM") or None


def _coords():
    # line for <=4 atoms, 4-wide grid above (keeps interactions sane)
    return [
        (SPACING * (i % 4), SPACING * (i // 4)) for i in range(N_QUBITS)
    ]


def _interp_matrix():
    """(T, P) sine-interpolation matrix — pure numpy (no jax import)."""
    step = DURATION / (N_PARAMS + 1)
    mat = np.zeros((DURATION, N_PARAMS))
    for k in range(DURATION):
        idx, r = divmod(k, step)
        idx = int(idx)
        h = r / step
        se = (1 + sin(pi * h - pi / 2)) / 2
        if idx > 0:
            mat[k, idx - 1] = 1 - se
        if idx < N_PARAMS:
            mat[k, idx] = se
    return mat


# ----------------------------------------------------------------------
# torch CPU reference-architecture baseline (term-list closure + DP5)
# ----------------------------------------------------------------------
def torch_baseline(params0: np.ndarray, n_timings: int = 3):
    import torch

    dtype = torch.complex128
    n, dim = N_QUBITS, 2**N_QUBITS
    M = torch.tensor(_interp_matrix(), dtype=torch.float64)

    def lift_sum(op: np.ndarray) -> torch.Tensor:
        out = None
        for i in range(n):
            m = np.array([[1.0]])
            for k in range(n):
                m = np.kron(m, op if k == i else np.eye(2))
            t = torch.tensor(m, dtype=dtype).to_sparse_coo()
            out = t if out is None else out + t
        return out.coalesce()

    sig_gr = np.array([[0, 0], [1.0, 0]])  # |g><r|, r first
    n_op = np.array([[1.0, 0], [0, 0]])
    amp_mat = lift_sum(sig_gr)
    det_mat = lift_sum(n_op)

    coords = np.asarray(_coords())
    C6 = 5420158.53
    occ = [(np.arange(dim) >> (n - 1 - i)) & 1 == 0 for i in range(n)]
    int_diag = np.zeros(dim)
    for i in range(n):
        for j in range(i + 1, n):
            r = np.linalg.norm(coords[i] - coords[j])
            int_diag += (C6 / r**6) * (occ[i] & occ[j])
    int_mat = torch.sparse_coo_tensor(
        np.stack([np.arange(dim), np.arange(dim)]),
        torch.tensor(int_diag, dtype=dtype),
        (dim, dim),
    ).coalesce()

    # per-site dephasing collapse: L_i = sqrt(rate/2) Z_i (Z = +1 on r)
    z_diags = [
        torch.tensor(np.where(occ[i], 1.0, -1.0), dtype=dtype)
        * np.sqrt(DEPHASING_RATE / 2)
        for i in range(n)
    ]

    n_keep = int(SAMPLING_RATE * (DURATION + 1))
    idx = np.linspace(0, DURATION, n_keep).astype(int)
    dt_c = 0.001 / SAMPLING_RATE

    params = torch.tensor(params0, dtype=torch.float64, requires_grad=True)

    def build_and_run():
        amp_full = M @ params
        amp_ext = torch.cat([amp_full, amp_full[-1:]])
        amp = amp_ext[idx]
        c_amp = 0.5 * amp
        c_det = torch.full((n_keep,), -0.5 * DET0, dtype=torch.float64)

        def H_t(t: float) -> torch.Tensor:
            i1 = max(min(int(np.floor(t / dt_c)), n_keep - 2), 0)
            i2 = i1 + 1
            w = (t - i1 * dt_c) / dt_c
            ca = c_amp[i1] + (c_amp[i2] - c_amp[i1]) * w
            cd = c_det[i1] + (c_det[i2] - c_det[i1]) * w
            ham = 2 * int_mat * 0.5
            m = amp_mat * (ca + 0.0j)
            ham = ham + m + m.adjoint()
            d = det_mat * (cd + 0.0j)
            ham = ham + d + d.adjoint()
            return ham.to_dense()

        def lindblad(t, rho):
            H = H_t(t)
            out = -1j * (H @ rho - rho @ H)
            for z in z_diags:
                out = out + (
                    z[:, None] * rho * z[None, :].conj()
                    - 0.5 * (z.abs() ** 2)[:, None] * rho
                    - 0.5 * rho * (z.abs() ** 2)[None, :]
                )
            return out

        A = [
            [],
            [1 / 5],
            [3 / 40, 9 / 40],
            [44 / 45, -56 / 15, 32 / 9],
            [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
            [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
        ]
        B = [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]
        C = [0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0]

        rho = torch.zeros((dim, dim), dtype=dtype)
        rho[dim - 1, dim - 1] = 1.0  # all-ground
        t_pts = idx / 1000.0
        for k in range(n_keep - 1):
            t0, h = t_pts[k], t_pts[k + 1] - t_pts[k]
            if h == 0:
                continue
            ks = []
            for s in range(6):
                y = rho
                for j, a in enumerate(A[s]):
                    if a != 0.0:
                        y = y + (a * h) * ks[j]
                ks.append(lindblad(t0 + C[s] * h, y))
            for s in range(6):
                if B[s] != 0.0:
                    rho = rho + (B[s] * h) * ks[s]

        zdiag = torch.tensor(
            sum(np.where(occ[i], 1.0, -1.0) for i in range(n)),
            dtype=torch.float64,
        )
        return torch.sum(zdiag * torch.diagonal(rho).real)

    times = []
    for _ in range(n_timings):
        if params.grad is not None:
            params.grad = None
        t0 = time.perf_counter()
        val = build_and_run()
        val.backward()
        times.append(time.perf_counter() - t0)
    return min(times), float(val.detach()), params.grad.detach().numpy()


# ----------------------------------------------------------------------
# JAX side: QuantumModel -> DP5_ME (XLA scan stepper, f64)
# ----------------------------------------------------------------------
def jax_side(params0: np.ndarray, n_timings: int = 3):
    import os

    import jax

    if os.environ.get("PDT_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pulser_diff_tpu import SimConfig
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

    reg = Register.from_coordinates(_coords(), prefix="q")
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
    M = jnp.asarray(_interp_matrix())
    extra = {"me_form": ME_FORM} if ME_FORM else {}
    model = QuantumModel(
        seq,
        {"amp_samples": ((jnp.asarray(params0),), lambda v: M @ v)},
        sampling_rate=SAMPLING_RATE,
        solver=SOLVER,
        noise_config=SimConfig(
            noise="dephasing", dephasing_rate=DEPHASING_RATE
        ),
        evaluation_times="Minimal",
        **extra,
    )
    obs = total_magnetization(N_QUBITS)
    exp_fn = model.expectation_fn(obs)

    def loss(p):
        _, vals = exp_fn({"amp_samples_0": p})
        return vals[-1]

    vag = jax.jit(jax.value_and_grad(loss))
    p = jnp.asarray(params0)
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
        {"compile": t_compile, "step": min(ts)},
        float(v),
        np.asarray(jax.device_get(g)),
    )


def main():
    params0 = np.linspace(1.0, 2.5, N_PARAMS)
    if os.environ.get("PDT_MESOLVE_SKIP_TORCH"):
        t_torch, v_t, g_t = float("nan"), None, None
        print("[mesolve-bench] torch baseline skipped", file=sys.stderr)
    else:
        t_torch, v_t, g_t = torch_baseline(
            params0, n_timings=3 if N_QUBITS <= 4 else 1
        )
        print(
            f"[mesolve-bench] torch/CPU reference arch: {t_torch*1e3:.1f} ms"
            f"  value={v_t:.9f}",
            file=sys.stderr,
        )
    times, v_j, g_j = jax_side(params0)
    print(
        f"[mesolve-bench] jax {SOLVER} (N={N_QUBITS}"
        f"{', form=' + ME_FORM if ME_FORM else ''}): "
        f"compile={times['compile']:.1f} s  "
        f"step={times['step']*1e3:.2f} ms  value={v_j:.9f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "n": N_QUBITS,
                "solver": SOLVER,
                "form": ME_FORM or "auto",
                "torch_s": round(t_torch, 6) if v_t is not None else None,
                "jax_s": round(times["step"], 6),
                "ratio": (
                    round(t_torch / times["step"], 2)
                    if v_t is not None
                    else None
                ),
                "value_diff": (
                    float(abs(v_t - v_j)) if v_t is not None else None
                ),
                "grad_diff": (
                    float(np.abs(g_t - g_j).max())
                    if v_t is not None
                    else None
                ),
                "value": float(v_j),
            }
        )
    )


if __name__ == "__main__":
    main()
