"""Headline benchmark: 12-atom (4096-dim) evolution + adjoint gradient step.

Compares this framework (JAX, one jitted value_and_grad over the whole
evolution, factorized Hamiltonian) on the TPU against a PyTorch-CPU
reference implementation built the way the upstream stack
(pulser-diff + pyqtorch) is built: a sparse-COO term-list Hamiltonian
closure evaluated per solver stage, a Dormand-Prince 5 stepper, and
autograd through the unrolled evolution.  pyqtorch itself is not
installable in this container, so the baseline reproduces its
architecture 1:1 on the same step grid (fixed-step DP5, which if anything
favours the baseline — no rejected steps).

Workload (BASELINE.json north star): 12 atoms on a 3x4 lattice, a
sine-interpolated 8-parameter amplitude waveform (gate-optimization
style), 660 ns, sampling_rate 0.25; loss = final total magnetization;
gradient w.r.t. the 8 waveform parameters.

TPU paths, in the order they are attempted (round-5 ladder):
  - the DEFAULT path: the fused DP5-stage Pallas kernel (compensated-f32
    arithmetic; run(solver=DP5_SE) auto-routes here on TPU) — this is
    the headline number;
  - the f32 XLA stepper (DP5_SE_F32, ~10 s warm compile) — first
    fallback if the fused compile cannot land;
  - the f64 XLA path (fused=False) — second fallback, and (when the
    fused number lands) the parity anchor vs the torch baseline
    (values ~1e-13, grads ~1e-14) and the accuracy reference for the
    fused kernel (|dv| ~2e-7, |dgrad| ~5e-6 — inside the BASELINE.md
    1e-6 / 1e-5 bars);
  - jax/CPU f64 as the honest last resort when the tunnel is down for
    the whole window.

Ordering (round-4 postmortem): the TPU attempt comes FIRST and the JSON
line is emitted as soon as any TPU timing exists, with the conservative
recorded torch denominator; the live torch baseline (~3 min) runs AFTER
emission purely as a parity diagnostic, so baseline cost can never
starve the TPU capture.

AOT note (VERDICT round-4 #1e, evaluated): `jax.export` artifacts
(utils/export.py) serialize StableHLO, which is *re-compiled* by the
backend at load time — on this tunnel that still goes through the remote
compile helper, so AOT does not remove the remote-compile dependency.
The effective mechanism is the persistent compilation cache
(.jax_cache), which stores the *compiled TPU executable*: the builder
warms it with this exact program each round, so the driver's capture is
a cache hit (~10 s child) unless product code changed the HLO.

Prints ONE json line: {"metric", "value" (TPU seconds, default path),
"unit", "vs_baseline" (torch_time / tpu_time)} and a per-phase
compile/forward/forward+grad breakdown on stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_QUBITS = 12
DURATION = 660
N_PARAMS = 8
SAMPLING_RATE = 0.25
SPACING = 10.0
DET0 = -2.0


def _coords():
    return [
        (SPACING * (i % 4), SPACING * (i // 4)) for i in range(N_QUBITS)
    ]


def _interp_matrix():
    """Static (T, P) sine-interpolation matrix — pure numpy, NO jax.

    Deliberately inlined from ops/linalg.py:_interpolate_sine_np
    (parity-checked by tests/test_misc.py::test_bench_interp_matrix):
    importing any pulser_diff_tpu module initializes JAX under the axon
    sitecustomize, and a TPU-tunnel outage must never be able to kill
    the CPU torch baseline (round-3 failure mode)."""
    from math import pi, sin

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
# torch CPU reference (reference-architecture: sparse term-list closure)
# ----------------------------------------------------------------------
def torch_baseline(params0: np.ndarray, n_timings: int = 1):
    import torch

    torch.set_num_threads(torch.get_num_threads())  # default all cores
    dtype = torch.complex128

    n = N_QUBITS
    dim = 2**n
    M = torch.tensor(_interp_matrix(), dtype=torch.float64)

    # sparse lifted operators, built with sparse kron as the reference does
    def lift_sum(op: np.ndarray) -> torch.Tensor:
        out = None
        for i in range(n):
            m = np.array([[1.0]])
            for k in range(n):
                m = np.kron(m, op if k == i else np.eye(2))
            t = torch.tensor(m, dtype=dtype).to_sparse_coo()
            out = t if out is None else out + t
        return out.coalesce()

    sig_gr = np.array([[0, 0], [1.0, 0]])  # |g><r| with r first
    n_op = np.array([[1.0, 0], [0, 0]])
    amp_mat = lift_sum(sig_gr)
    det_mat = lift_sum(n_op)

    # interaction diagonal
    coords = np.asarray(_coords())
    C6 = 5420158.53
    int_diag = np.zeros(dim)
    occ = [(np.arange(dim) >> (n - 1 - i)) & 1 == 0 for i in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            r = np.linalg.norm(coords[i] - coords[j])
            int_diag += (C6 / r**6) * (occ[i] & occ[j])
    int_mat = torch.sparse_coo_tensor(
        np.stack([np.arange(dim), np.arange(dim)]),
        torch.tensor(int_diag, dtype=dtype),
        (dim, dim),
    ).coalesce()

    # subsampled coefficient streams (reference hamiltonian.py:83-91)
    n_keep = int(SAMPLING_RATE * (DURATION + 1))
    idx = np.linspace(0, DURATION, n_keep).astype(int)
    dt_c = 0.001 / SAMPLING_RATE

    params = torch.tensor(params0, dtype=torch.float64, requires_grad=True)

    def build_and_run():
        amp_full = M @ params  # (DURATION,)
        amp_ext = torch.cat([amp_full, amp_full[-1:]])  # +1 hold sample
        amp = amp_ext[idx]
        c_amp = 0.5 * amp * torch.exp(torch.tensor(-0.0j))  # phase 0
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
            return ham

        # DP5 fixed-step over the subsampled grid (pyqtorch-style stages)
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

        psi = torch.zeros(dim, dtype=dtype)
        psi[dim - 1] = 1.0  # all-ground (g = index 1 per site)
        t_pts = idx / 1000.0
        for k in range(n_keep - 1):
            t0, h = t_pts[k], t_pts[k + 1] - t_pts[k]
            if h == 0:
                continue
            ks = []
            for s in range(6):
                y = psi
                for j, a in enumerate(A[s]):
                    if a != 0.0:
                        y = y + (a * h) * ks[j]
                ks.append(-1j * torch.sparse.mm(H_t(t0 + C[s] * h), y.unsqueeze(1)).squeeze(1))
            for s in range(6):
                if B[s] != 0.0:
                    psi = psi + (B[s] * h) * ks[s]

        # observable: total magnetization
        zdiag = torch.tensor(
            sum(
                np.where(occ[i], 1.0, -1.0) for i in range(n)
            ),
            dtype=torch.float64,
        )
        exp_val = torch.sum(zdiag * (psi.conj() * psi).real)
        return exp_val

    # timing: forward + backward
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
# JAX / TPU side (one builder, three solver configurations)
# ----------------------------------------------------------------------
def jax_tpu(params0: np.ndarray, mode: str, n_timings: int = 3):
    """Run the workload through QuantumModel.

    mode="fused": the default TPU path (DP5-stage fused Pallas kernel).
    mode="f32":   the f32 XLA stepper (DP5_SE_F32) — cheap-compile
                  fallback when the fused compile cannot land.
    mode="f64":   the f64 XLA stepper (parity anchor).
    Returns (times_dict, value, grad): times_dict has 'compile',
    'forward', 'step' (forward+grad) wall-clock seconds.
    """
    import os

    import jax

    # explicit config update: the axon sitecustomize may import jax
    # before main() exports the env vars, in which case the env route
    # is a no-op
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
                ),
            ),
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

    model_kwargs: dict = {"fused": True}
    if mode == "f64":
        model_kwargs = {"fused": False}
    elif mode == "f32":
        model_kwargs = {"solver": "DP5_SE_F32", "fused": False}
    model = QuantumModel(
        seq,
        {"amp_samples": ((jnp.asarray(params0),), lambda v: M @ v)},
        sampling_rate=SAMPLING_RATE,
        evaluation_times="Minimal",
        **model_kwargs,
    )
    obs = total_magnetization(N_QUBITS, dense=False)
    exp_fn = model.expectation_fn(obs)

    def loss(p):
        _, vals = exp_fn({"amp_samples_0": p})
        return vals[-1]

    fwd = jax.jit(loss)
    vag = jax.jit(jax.value_and_grad(loss))
    p = jnp.asarray(params0)
    t0 = time.perf_counter()
    v, g = vag(p)
    jax.block_until_ready((v, g))
    t_compile = time.perf_counter() - t0
    jax.block_until_ready(fwd(p))

    def _time(fn):
        ts = []
        for _ in range(n_timings):
            t0 = time.perf_counter()
            out = fn(p)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_fwd = _time(fwd)
    t_step = _time(vag)
    v, g = vag(p)
    times = {"compile": t_compile, "forward": t_fwd, "step": t_step}
    return times, float(v), np.asarray(jax.device_get(g))


class _ChildTimeout(RuntimeError):
    """The child subprocess had to be killed at its timeout.

    Killing a JAX process mid-compile wedges the remote TPU compile
    server for ~15 min (CLAUDE.md), so a timeout is TERMINAL for TPU
    attempts until a cooldown window has passed (main() sleeps the
    wedge out once if the budget allows)."""


def jax_tpu_subprocess(
    params0: np.ndarray, mode: str, n_timings: int, timeout: float = 1800
):
    """Run jax_tpu in a FRESH interpreter and parse its one-line JSON.

    Necessary for retry semantics: jax caches a failed backend init
    per-process (xla_bridge records the platform error), so when the
    remote TPU tunnel is transiently unavailable an in-process retry can
    never succeed — observed during round 3 as a ~30 min UNAVAILABLE
    window.  A subprocess per attempt re-initializes the backend from
    scratch."""
    import os
    import subprocess

    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--child",
        mode,
        str(n_timings),
        json.dumps(list(np.asarray(params0, dtype=float))),
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            err = e.stderr if isinstance(e.stderr, str) else e.stderr.decode()
            sys.stderr.write(err[-2000:])
        raise _ChildTimeout(f"TPU child killed at {timeout:.0f}s timeout")
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        raise RuntimeError(
            f"TPU child exited rc={proc.returncode}: "
            f"{proc.stdout[-400:]} {proc.stderr[-400:]}"
        )
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    return out["times"], out["value"], np.asarray(out["grad"])


def tpu_probe_subprocess(timeout: float = 300.0) -> bool:
    """Tunnel-health probe: backend init + ONE trivial jitted compile.

    Round-4 postmortem: the init-only probe (`jax.devices()`) passed
    while the remote *compile* server was wedged, and the first fused
    attempt then burned its whole 780 s child timeout discovering that.
    This probe compiles and runs a trivial jitted fn with a run-unique
    constant (cache-busting salt), so it exercises the live remote
    compile path end-to-end.  A healthy tunnel answers in well under a
    minute; a wedged one costs ONE probe timeout.  Killing this child
    mid-compile is an accepted risk: if the trivial compile has hung
    for minutes the server is already unserviceable, and main() only
    retries after a full cooldown window anyway."""
    import os
    import subprocess

    # PDT_BENCH_CPU routes the probe to the CPU backend (mechanism tests;
    # the axon sitecustomize overrides JAX_PLATFORMS, so an explicit
    # config update is the only reliable way off the tunnel, CLAUDE.md)
    code = (
        "import os, jax\n"
        "import jax.numpy as jnp\n"
        "if os.environ.get('PDT_BENCH_CPU'):\n"
        "    jax.config.update('jax_platforms', 'cpu')\n"
        "salt = float(os.environ.get('PDT_PROBE_SALT', '1'))\n"
        "f = jax.jit(lambda x: (x * salt + 1.0).sum())\n"
        "v = float(f(jnp.arange(8.0)))\n"
        "d = jax.devices()\n"
        "print('PROBE_OK', d[0].platform, len(d), v)\n"
    )
    env = dict(os.environ, PDT_PROBE_SALT=str(int(time.time()) % 100000))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        print(
            f"[bench] TPU compile-probe timed out at {timeout:.0f}s — "
            "tunnel down or compile server wedged",
            file=sys.stderr,
        )
        return False
    ok = proc.returncode == 0 and "PROBE_OK" in proc.stdout
    print(
        f"[bench] TPU compile-probe: {'up' if ok else 'DOWN'} "
        f"({proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else proc.stderr[-200:]})",
        file=sys.stderr,
    )
    return ok


def jax_cpu_fallback_subprocess(params0: np.ndarray, timeout: float):
    """Run the f64 XLA path on the CPU backend (honest last resort when
    the TPU tunnel is down for the whole bench window: the driver still
    gets a measured number for THIS framework on THIS workload, just on
    the wrong device — flagged in the metric string)."""
    import os
    import subprocess

    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--child",
        "f64",
        "1",
        json.dumps(list(np.asarray(params0, dtype=float))),
    ]
    env = dict(os.environ, PDT_BENCH_CPU="1")
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    sys.stderr.write(proc.stderr[-2000:])
    if proc.returncode != 0:
        raise RuntimeError(f"cpu fallback child rc={proc.returncode}")
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    return out["times"], out["value"], np.asarray(out["grad"])


def torch_baseline_subprocess(params0: np.ndarray, timeout: float):
    """Run the torch-CPU baseline in a JAX-free child so a crash or a
    timeout never takes the parent down (round-3 weak #2)."""
    import os
    import subprocess

    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--child",
        "torch",
        "1",
        json.dumps(list(np.asarray(params0, dtype=float))),
    ]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        raise RuntimeError(f"torch child rc={proc.returncode}: {proc.stderr[-400:]}")
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    return out["time"], out["value"], np.asarray(out["grad"])


def _child_main(which: str, n_timings: int, params_json: str) -> None:
    import os

    params0 = np.asarray(json.loads(params_json), dtype=float)
    if which == "torch":  # JAX-free CPU baseline child
        t, v, g = torch_baseline(params0, n_timings)
        print(json.dumps({"time": t, "value": v, "grad": list(map(float, g))}))
        return
    if os.environ.get("PDT_BENCH_CPU"):  # mechanism test without a TPU
        import jax

        jax.config.update("jax_platforms", "cpu")
    times, v, g = jax_tpu(params0, mode=which, n_timings=n_timings)
    print(json.dumps({"times": times, "value": v, "grad": list(map(float, g))}))


# torch-CPU baseline recorded from full runs of torch_baseline() on this
# container (rounds 1-4: 136.6-199.5 s; the host is shared, so live runs
# jitter).  The reported denominator is the recorded MINIMUM: conservative
# (can only under-state the speedup) and stable across reruns
# (VERDICT.md round-2 weak #7).  The live baseline now runs AFTER the
# JSON line is emitted (parity diagnostic only), so it can no longer
# starve the TPU attempt of budget.
_RECORDED_TORCH_BASELINE_S = 136.6


# ----------------------------------------------------------------------
# Global wall-clock budget (round-3 postmortem: the driver killed bench
# at its own timeout, rc=124, and the JSON line was never printed even
# though partial results existed).  Every phase below is bounded by the
# remaining budget, and the JSON line is emitted AS SOON AS a TPU timing
# exists — the f64 anchor, torch baseline and cross-checks are
# best-effort diagnostics.
# ----------------------------------------------------------------------
_T0 = time.monotonic()
_BUDGET_S = 1200.0  # overridden by $PDT_BENCH_BUDGET_S in main()
_EMITTED = False
_TPU_WEDGED = False  # set after a child timeout-kill: further attempts hang


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T0)


def _emit(
    t_report: float,
    t_torch: float,
    note: str = "",
    metric: str = "12-atom evolution + adjoint grad step wall-clock",
) -> None:
    """Print the ONE driver-parsed JSON line (at most once)."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(t_report, 6),
                "unit": "s",
                "vs_baseline": round(t_torch / t_report, 2),
            }
        ),
        flush=True,
    )
    if note:
        print(f"[bench] emitted ({note})", file=sys.stderr)


def _tpu_with_retries(fn, what: str, attempts: int = 6,
                      backoffs=(10, 30, 60, 120, 240)):
    """Deadline-aware retries for transient remote-compile / HTTP /
    tunnel-unavailable errors (round 1: a single 'response body closed
    before all bytes were read'; round 3: a ~30 min backend-init
    UNAVAILABLE window).  Each attempt is a fresh subprocess so backend
    init is actually re-tried.  Two hard rules:
      - never start an attempt without enough budget left for a
        plausible compile (the child gets the remaining budget minus a
        closing margin as its timeout);
      - a child TIMEOUT marks the remote compile server wedged
        (~15 min, CLAUDE.md): no further TPU attempts here — main()
        owns the one post-cooldown retry.
    fn(timeout) -> result."""
    global _TPU_WEDGED
    last = None
    for i in range(attempts):
        if _TPU_WEDGED:
            raise last or RuntimeError(
                "TPU unavailable (probe failed or compile server wedged)"
            )
        budget = _remaining() - 45  # closing margin for emission/diags
        if budget < 150:
            raise last or RuntimeError(
                f"{what}: out of budget before attempt {i + 1}"
            )
        try:
            return fn(min(780.0, budget))
        except _ChildTimeout as e:
            _TPU_WEDGED = True
            print(
                f"[bench] {what} attempt {i + 1}: {e} — treating the "
                f"remote compile server as wedged",
                file=sys.stderr,
            )
            raise
        except Exception as e:  # noqa: BLE001 — any transient infra error
            last = e
            print(
                f"[bench] {what} attempt {i + 1}/{attempts} failed: {e!r}"
                f"  (budget left {_remaining():.0f}s)",
                file=sys.stderr,
            )
            if i + 1 < attempts:
                wait = backoffs[min(i, len(backoffs) - 1)]
                if _remaining() - wait < 200:
                    raise last
                print(f"[bench] retrying in {wait}s", file=sys.stderr)
                time.sleep(wait)
    raise last


_MODE_LABEL = {
    "fused": "fused DP5 kernel (default)",
    "f32": "f32 XLA stepper (DP5_SE_F32)",
    "f64": "f64 XLA stepper",
}


def _try_tpu_mode(params0, mode: str, n_timings: int, t_torch: float,
                  attempts: int = 6, emit: bool = True):
    """One rung of the TPU ladder: attempt `mode` with retries; emit the
    JSON line on success (first success wins — _emit is once-only)."""
    try:
        t, v, g = _tpu_with_retries(
            lambda to: jax_tpu_subprocess(
                params0, mode=mode, n_timings=n_timings, timeout=to
            ),
            f"jax/TPU {mode}", attempts=attempts,
        )
    except Exception as e:  # noqa: BLE001
        print(f"[bench] {mode} path failed: {e!r}", file=sys.stderr)
        return None
    print(
        f"[bench] jax/TPU {_MODE_LABEL[mode]}: {t['step']*1e3:.2f} ms"
        f"  value={v:.9f}",
        file=sys.stderr,
    )
    if emit:
        metric = "12-atom evolution + adjoint grad step wall-clock"
        if mode != "fused":
            metric += f" ({mode.upper()} XLA fallback — fused compile did not land)"
        _emit(t["step"], t_torch, note=f"{mode} path", metric=metric)
    return t, v, g


def main():
    # Persistent compilation cache: the TPU compiles (2-3 min each for
    # the fused + f64 programs) hit the disk cache on driver re-runs,
    # making the recorded timing reflect execution, not compile jitter.
    import os

    global _BUDGET_S, _TPU_WEDGED
    _BUDGET_S = float(os.environ.get("PDT_BENCH_BUDGET_S", "1200"))

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

    params0 = np.linspace(1.0, 3.0, N_PARAMS)
    t_torch = _RECORDED_TORCH_BASELINE_S

    # 1. Tunnel-health compile-probe (trivial jitted fn, cache-busting
    #    salt): verifies the remote COMPILE server end-to-end, not just
    #    backend init (round-4 postmortem: init-only probe passed while
    #    compiles hung).  A dead tunnel costs one probe timeout.
    probe_to = min(300.0, max(_remaining() - 300, 120.0))
    tpu_up = tpu_probe_subprocess(timeout=probe_to)

    # 2. TPU ladder, best path first.  The JSON line is emitted
    #    IMMEDIATELY on the first success (conservative recorded torch
    #    denominator) — everything after is diagnostics.
    fused = f32 = f64 = None
    if not tpu_up:
        _TPU_WEDGED = True
    if not _TPU_WEDGED:
        fused = _try_tpu_mode(params0, "fused", 10, t_torch)
    if fused is None and not _TPU_WEDGED:
        # fused failed on a real error (not a wedge): cheap-compile rungs
        f32 = _try_tpu_mode(params0, "f32", 5, t_torch, attempts=3)
        if f32 is None and not _TPU_WEDGED:
            f64 = _try_tpu_mode(params0, "f64", 3, t_torch, attempts=2)

    # 3. One post-cooldown retry: the compile-server wedge clears in
    #    ~15 min (CLAUDE.md).  If the budget still allows a sleep + probe
    #    + warm-cache attempt, take it instead of giving up on the TPU.
    if _TPU_WEDGED and not _EMITTED and _remaining() > 1000:
        cooldown = min(900.0, _remaining() - 420.0)
        print(
            f"[bench] wedged — sleeping {cooldown:.0f}s to let the remote "
            "compile server recover, then retrying once",
            file=sys.stderr,
        )
        time.sleep(cooldown)
        if tpu_probe_subprocess(timeout=min(240.0, _remaining() - 200)):
            _TPU_WEDGED = False
            fused = _try_tpu_mode(params0, "fused", 10, t_torch, attempts=1)
            if fused is None and not _TPU_WEDGED:
                f32 = _try_tpu_mode(params0, "f32", 3, t_torch, attempts=1)

    # 4. Honest last resort: no TPU timing landed (tunnel down for the
    #    whole window) — measure the same workload's f64 XLA path on the
    #    CPU backend so the driver still records a real number for THIS
    #    framework, clearly flagged in the metric string.  Warm-cache
    #    child takes ~10 s; a cold compile a few minutes.
    t_cpu = v_cpu = g_cpu = None
    if not _EMITTED:
        fallback_to = _remaining() - 240 if _remaining() > 420 else _remaining() - 20
        if fallback_to > 60:
            try:
                t_cpu, v_cpu, g_cpu = jax_cpu_fallback_subprocess(
                    params0, timeout=fallback_to
                )
                print(
                    f"[bench] jax/CPU f64 fallback: {t_cpu['step']*1e3:.1f} ms"
                    f"  value={v_cpu:.9f}",
                    file=sys.stderr,
                )
                _emit(
                    t_cpu["step"], t_torch,
                    note="CPU fallback — TPU unavailable",
                    metric=(
                        "12-atom evolution + adjoint grad step wall-clock "
                        "(CPU FALLBACK — TPU tunnel down; hardware-verified "
                        "TPU fused number is 0.026-0.031 s, see STATUS.md)"
                    ),
                )
            except Exception as e:  # noqa: BLE001
                print(f"[bench] cpu fallback failed: {e!r}", file=sys.stderr)

    # 5. Post-emission diagnostics, best-effort within the budget:
    #    f64 anchor (fused parity bars) then the live torch baseline
    #    (value/grad ground truth + live vs_baseline figure).
    if fused is not None and f64 is None and not _TPU_WEDGED and _remaining() > 300:
        f64 = _try_tpu_mode(params0, "f64", 3, t_torch, attempts=2, emit=False)

    v_torch = g_torch = None
    torch_timeout = min(420.0, _remaining() - 30)
    if _EMITTED and torch_timeout > 150:
        try:
            t_torch_live, v_torch, g_torch = torch_baseline_subprocess(
                params0, timeout=torch_timeout
            )
            print(
                f"[bench] torch/CPU: {t_torch_live*1e3:.1f} ms  "
                f"value={v_torch:.9f}  (recorded denominator "
                f"{_RECORDED_TORCH_BASELINE_S}s is the conservative one)",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001
            print(f"[bench] torch baseline skipped/failed: {e!r}", file=sys.stderr)
    elif not _EMITTED:
        print("[bench] skipping torch baseline (nothing emitted)", file=sys.stderr)
    else:
        print(
            f"[bench] skipping live torch baseline ({_remaining():.0f}s left); "
            f"recorded {_RECORDED_TORCH_BASELINE_S}s denominator already used",
            file=sys.stderr,
        )

    # 6. accuracy cross-checks + per-phase breakdown (stderr)
    anchor = f64 or f32  # best XLA reference that ran
    if anchor is not None and v_torch is not None:
        print(
            f"[bench] xla vs torch: |value diff|={abs(anchor[1] - v_torch):.3e}"
            f"  |grad diff|={np.abs(anchor[2] - g_torch).max():.3e}",
            file=sys.stderr,
        )
    if v_cpu is not None and v_torch is not None:
        print(
            f"[bench] cpu-f64 vs torch: |value diff|={abs(v_cpu - v_torch):.3e}"
            f"  |grad diff|={np.abs(g_cpu - g_torch).max():.3e}",
            file=sys.stderr,
        )
    if fused is not None and f64 is not None:
        print(
            f"[bench] fused vs f64: |value diff|={abs(fused[1] - f64[1]):.3e}"
            f"  |grad diff|={np.abs(fused[2] - f64[2]).max():.3e}"
            f"  (bars: 1e-6 / 1e-5)",
            file=sys.stderr,
        )
    for name, r in (("fused", fused), ("f32", f32), ("f64", f64)):
        if r is not None:
            t = r[0]
            print(
                f"[bench] breakdown {name}: compile={t['compile']:.1f} s  "
                f"forward={t['forward']*1e3:.2f} ms  "
                f"forward+grad={t['step']*1e3:.2f} ms  "
                f"(adjoint overhead {t['step']/max(t['forward'],1e-9):.2f}x)",
                file=sys.stderr,
            )

    if not _EMITTED:
        print("[bench] no timing succeeded at all", file=sys.stderr)
        raise SystemExit(1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child_main(sys.argv[2], int(sys.argv[3]), sys.argv[4])
    else:
        main()
