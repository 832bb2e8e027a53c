"""Checkpointing, profiling, SimConfig conversions, result post-processing."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulser_diff_tpu import NoiseModel, SimConfig
from pulser_diff_tpu.cplx import Cplx, as_cplx
from pulser_diff_tpu.result import QuantumResult
from pulser_diff_tpu.utils import load_params, save_params, timed


def test_checkpoint_roundtrip(tmp_path):
    params = {"omega": jnp.asarray(1.5), "coords": jnp.array([1.0, 2.0])}
    path = save_params(str(tmp_path / "ckpt"), params)
    restored = load_params(path)
    assert set(restored) == set(params)
    for k in params:
        assert np.allclose(
            np.asarray(jax.device_get(restored[k])),
            np.asarray(jax.device_get(params[k])),
        )


def test_timed_context():
    out = {}
    with timed("block", out):
        _ = jnp.ones(10) + 1
    assert out["block"] >= 0


def test_simconfig_noise_model_roundtrip():
    cfg = SimConfig(
        noise=("dephasing", "SPAM"),
        dephasing_rate=jnp.asarray(0.123),
        eta=0.01,
        epsilon=0.02,
        epsilon_prime=0.03,
    )
    nm = cfg.to_noise_model()
    assert set(nm.noise_types) == {"dephasing", "SPAM"}
    assert float(np.asarray(jax.device_get(nm.dephasing_rate))) == pytest.approx(0.123)
    back = SimConfig.from_noise_model(nm)
    assert set(back.noise) == {"dephasing", "SPAM"}
    concrete = cfg.to_pulser()
    assert isinstance(concrete.dephasing_rate, float)


def test_noise_model_validation():
    with pytest.raises(ValueError):
        NoiseModel(noise_types=("bogus",))
    with pytest.raises(ValueError):
        NoiseModel(noise_types=("eff_noise",))  # no operators
    with pytest.raises(ValueError):
        NoiseModel(
            noise_types=("eff_noise",),
            eff_noise_rates=(0.1,),
            eff_noise_opers=(np.zeros(3),),  # not square 2D
        )


def test_result_get_state_global_phase():
    psi = np.array([0.6 * np.exp(1j * 0.7), 0.8 * np.exp(1j * 0.7)])
    res = QuantumResult(("q0",), "ground-rydberg", as_cplx(psi.reshape(2, 1)), True)
    st = res.get_state(ignore_global_phase=True).to_numpy().ravel()
    # largest component made real
    assert abs(st[1].imag) < 1e-12
    assert st[1].real > 0


def test_result_reduce_to_basis():
    # 1-qubit, 3-level state with negligible |h> population
    psi = np.zeros(3, dtype=complex)
    psi[0] = 1 / np.sqrt(2)  # r
    psi[1] = 1 / np.sqrt(2)  # g
    res = QuantumResult(("q0",), "ground-rydberg", as_cplx(psi.reshape(3, 1)), True)
    red = res.get_state(reduce_to_basis="ground-rydberg")
    arr = red.to_numpy().ravel()
    assert arr.shape == (2,)
    assert np.allclose(np.abs(arr), [1 / np.sqrt(2)] * 2)
    # populated |h> -> error
    psi2 = np.ones(3, dtype=complex) / np.sqrt(3)
    res2 = QuantumResult(("q0",), "ground-rydberg", as_cplx(psi2.reshape(3, 1)), True)
    with pytest.raises(TypeError):
        res2.get_state(reduce_to_basis="ground-rydberg")


def test_result_reduce_to_basis_density_matrix():
    """3-level density-matrix basis reduction (beyond parity: the
    reference stubs the whole get_state reduction, ref result.py:150).
    The reduced rho of a pure low-population-|h> state equals the outer
    product of the reduced ket."""
    psi = np.zeros(9, dtype=complex)  # 2 qubits, 3 levels (r, g, h)
    psi[0 * 3 + 1] = 1 / np.sqrt(2)   # |r g>
    psi[1 * 3 + 1] = 1j / np.sqrt(2)  # |g g>
    rho = np.outer(psi, psi.conj())
    res = QuantumResult(
        ("q0", "q1"), "ground-rydberg", as_cplx(rho), True
    )
    red = res.get_state(reduce_to_basis="ground-rydberg")
    arr = red.to_numpy()
    assert arr.shape == (4, 4)
    assert abs(np.trace(arr) - 1.0) < 1e-12
    # ket-path reference
    resk = QuantumResult(
        ("q0", "q1"), "ground-rydberg", as_cplx(psi.reshape(9, 1)), True
    )
    k = resk.get_state(
        reduce_to_basis="ground-rydberg", ignore_global_phase=False
    ).to_numpy().ravel()
    assert np.abs(arr - np.outer(k, k.conj())).max() < 1e-12
    # populated |h> -> error
    psih = np.ones(9, dtype=complex) / 3.0
    rhoh = np.outer(psih, psih.conj())
    resh = QuantumResult(("q0", "q1"), "ground-rydberg", as_cplx(rhoh), True)
    with pytest.raises(TypeError):
        resh.get_state(reduce_to_basis="ground-rydberg")


def test_weights_three_level():
    # |g r> in 3-level basis (r=0, g=1, h=2): index 1*3+0 = 3
    psi = np.zeros(9, dtype=complex)
    psi[3] = 1.0
    res = QuantumResult(
        ("q0", "q1"), "ground-rydberg", as_cplx(psi.reshape(9, 1)), False
    )
    w = np.asarray(jax.device_get(res._weights()))
    # q0 in g -> bit 0; q1 in r -> bit 1 => bitstring "01" = index 1
    assert w[1] == pytest.approx(1.0)


def test_plotting_smoke(tmp_path):
    """SimulationResults.plot / NoisyResults error bars / emulator.draw
    (reference simresults.py:159-169, :314-344; backend.py:613-649)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax.numpy as jnp
    from pulser_diff_tpu import SimConfig, TpuEmulator
    from pulser_diff_tpu.core import MockDevice, Pulse, Register, Sequence
    from pulser_diff_tpu.ops import total_magnetization

    reg = Register({"q0": jnp.array([-4.0, 0.0]), "q1": jnp.array([4.0, 0.0])})
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(Pulse.ConstantPulse(100, 1.5, -0.5, 0.2), "ryd")
    sim = TpuEmulator.from_sequence(seq, evaluation_times=0.2)
    res = sim.run()
    obs = total_magnetization(2)
    res.plot(obs)
    plt.close("all")
    # noisy results with error bars
    cfg = SimConfig(noise="doppler", temperature=50.0, runs=4, samples_per_run=3)
    sim2 = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    nres = sim2.run()
    nres.plot(obs, error_bars=True)
    plt.close("all")
    # emulator sample drawing
    fig_path = tmp_path / "draw.png"
    plt.ioff()
    sim.draw(draw_phase_curve=True, fig_name=str(fig_path))
    plt.close("all")
    assert fig_path.exists()
    # phase-area annotations + phase-shift markers actually render
    # (reference delegates to pulser draw_samples, backend.py:613-649)
    seq2 = Sequence(reg, MockDevice)
    seq2.declare_channel("ryd", "rydberg_global")
    seq2.add(Pulse.ConstantPulse(100, 1.5, -0.5, 0.2), "ryd")
    seq2.add(Pulse.ConstantPulse(80, 2.0, 0.0, 0.9), "ryd")
    sim3 = TpuEmulator.from_sequence(seq2, evaluation_times="Minimal")
    sim3.draw(draw_phase_area=True, draw_phase_shifts=True)
    fig = plt.gcf()
    ax_amp = fig.axes[0]
    texts = [t.get_text() for t in ax_amp.texts]
    assert any("A:" in t for t in texts)  # area labels
    assert any("φ" in t for t in texts)  # phase label on the 2nd pulse
    assert any(
        ln.get_linestyle() == "--" for ln in ax_amp.lines
    )  # phase-shift marker
    plt.close("all")


def test_bench_tpu_child_subprocess():
    """The bench driver artifact's per-attempt TPU subprocess: the child
    must emit one parseable JSON line (mechanism-tested on CPU via
    PDT_BENCH_CPU; on hardware the same child runs against the TPU)."""
    import json
    import subprocess
    import sys

    env = dict(os.environ, PDT_BENCH_CPU="1")
    proc = subprocess.run(
        [
            sys.executable, "/root/repo/bench.py", "--child", "f64", "1",
            json.dumps(list(np.linspace(1.0, 3.0, 8))),
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert set(out) == {"times", "value", "grad"}
    assert len(out["grad"]) == 8
    assert np.isfinite(out["value"])


def test_bench_probe_and_cpu_fallback_mechanisms():
    """Outage resilience mechanisms (round-4: a tunnel outage must still
    produce a driver-parseable JSON line): the tunnel probe subprocess
    reports a boolean without raising, and the CPU-fallback child emits
    the same JSON contract as the TPU child."""
    import importlib.util
    import json as _json
    import subprocess
    import sys

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # probe: under PDT_BENCH_CPU the child pins the CPU backend (the
    # axon sitecustomize overrides JAX_PLATFORMS, CLAUDE.md), so this
    # exercises the subprocess/parse mechanism without the tunnel.
    os.environ["PDT_BENCH_CPU"] = "1"
    try:
        t0 = __import__("time").monotonic()
        up = bench.tpu_probe_subprocess(timeout=120)
        assert up is True
        assert __import__("time").monotonic() - t0 < 120
    finally:
        os.environ.pop("PDT_BENCH_CPU", None)

    # CPU fallback child: same contract as the TPU child
    out_times, value, grad = bench.jax_cpu_fallback_subprocess(
        np.linspace(1.0, 3.0, 8), timeout=600
    )
    assert {"compile", "forward", "step"} <= set(out_times)
    assert np.isfinite(value) and grad.shape == (8,)


def test_export_step_roundtrip(tmp_path, two_atom_register):
    """AOT export of a compiled value_and_grad step: serialize ->
    deserialize -> identical value and gradient, no Python front-end."""
    import optax  # noqa: F401  (ensures model deps present)

    from pulser_diff_tpu.model import QuantumModel
    from pulser_diff_tpu.ops import total_magnetization
    from pulser_diff_tpu.utils import export_step, load_meta, load_step
    from .conftest import make_simple_sequence
    from pulser_diff_tpu.core import Sequence, Pulse, MockDevice

    seq = Sequence(two_atom_register, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    om = seq.declare_variable("om")
    seq.add(Pulse.ConstantPulse(200, om, -1.0, 0.0), "ryd")
    model = QuantumModel(seq, {"om": jnp.asarray(1.8)})
    obs = total_magnetization(2)
    exp_fn = model.expectation_fn(obs)

    def loss(p):
        _, vals = exp_fn(p)
        return vals[-1].real

    step = jax.jit(jax.value_and_grad(loss))
    p0 = {"om": jnp.asarray(1.8)}
    v_ref, g_ref = step(p0)

    path = export_step(step, (p0,), str(tmp_path / "step.bin"))
    meta = load_meta(path)
    assert meta["platforms"] and meta["nr_args"] == 1
    loaded = load_step(path)
    v2, g2 = loaded(p0)
    assert abs(float(v2) - float(v_ref)) < 1e-12
    assert abs(float(g2["om"]) - float(g_ref["om"])) < 1e-12


def test_load_step_platform_check(tmp_path):
    from pulser_diff_tpu.utils import export_step, load_step

    def f(x):
        return (x * x).sum()

    path = export_step(f, (jnp.ones((4,)),), str(tmp_path / "f.bin"))
    fn = load_step(path)  # same platform: fine
    assert float(fn(jnp.ones((4,)))) == 4.0
    with pytest.raises(ValueError):
        # doctor the sidecar/platforms by exporting for another platform
        path2 = export_step(
            f, (jnp.ones((4,)),), str(tmp_path / "g.bin"),
            platforms=["tpu"],
        )
        load_step(path2)


def test_bench_interp_matrix_is_jax_free_and_parity():
    """bench.py inlines the sine-interpolation matrix in pure numpy so
    the torch baseline never initializes JAX (a TPU-tunnel outage must
    not kill the CPU baseline).  Pin the inline copy to the product's."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from pulser_diff_tpu.ops.linalg import _interpolate_sine_np

    got = bench._interp_matrix()
    want = _interpolate_sine_np(bench.N_PARAMS, bench.DURATION)
    assert np.abs(got - want).max() < 1e-15

    # and the torch child must run with jax made unimportable
    import json
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent(
        """
        import json, sys
        sys.modules["jax"] = None  # any import -> TypeError
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "bench", "/root/repo/bench.py")
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        m = bench._interp_matrix()  # the torch baseline's only helper
        print(json.dumps({"ok": True, "sum": float(m.sum())}))
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-800:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["ok"] and np.isfinite(out["sum"])


def test_export_step_f32_solver(tmp_path, two_atom_register):
    """The f32 XLA stepper (the N>=18 gradient path) is pure StableHLO —
    it must export/reload like the f64 path."""
    from pulser_diff_tpu import SolverType
    from pulser_diff_tpu.model import QuantumModel
    from pulser_diff_tpu.ops import total_magnetization
    from pulser_diff_tpu.utils import export_step, load_step
    from pulser_diff_tpu.core import MockDevice, Pulse, Sequence

    seq = Sequence(two_atom_register, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    om = seq.declare_variable("om")
    seq.add(Pulse.ConstantPulse(200, om, -1.0, 0.0), "ryd")
    model = QuantumModel(
        seq, {"om": jnp.asarray(1.8)}, solver=SolverType.DP5_SE_F32
    )
    obs = total_magnetization(2)
    exp_fn = model.expectation_fn(obs)

    def loss(p):
        _, vals = exp_fn(p)
        return vals[-1].real

    step = jax.jit(jax.value_and_grad(loss))
    p0 = {"om": jnp.asarray(1.8)}
    v_ref, g_ref = step(p0)
    path = export_step(step, (p0,), str(tmp_path / "step32.bin"))
    loaded = load_step(path)
    v2, g2 = loaded(p0)
    assert abs(float(v2) - float(v_ref)) < 1e-12
    assert abs(float(g2["om"]) - float(g_ref["om"])) < 1e-12
