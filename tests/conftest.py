"""Test fixtures.

Tests run on CPU with 8 virtual devices so the sharding/parallel paths are
exercised without TPU hardware (the driver separately dry-runs multichip).
The golden model for physics parity is an independent numpy/scipy
implementation (tests/golden.py) — the reference uses pulser-simulation's
QutipEmulator for the same purpose (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

# Persistent compilation cache: the suite is XLA-CPU-compile-bound (the
# big grad-of-scan programs take 10-60 s each to compile), and the
# `run_isolated` subprocess guards recompile from scratch every run.
# Caching compiled executables on disk makes reruns and the subprocess
# tests skip those compiles entirely.  NOTE: env vars alone do NOT work
# here — the axon sitecustomize imports jax at interpreter start, before
# this file runs, so jax's config has already read (and missed) them.
# The effective switch is jax.config.update below; the env var is kept
# only as the shared path constant.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)

# XLA's CPU backend compiles large grad-of-scan programs with deep
# recursion on the calling thread; with the default 8 MB stack rlimit the
# compiler overflows the MAIN-thread stack when invoked late in the suite
# (deep pytest frames underneath) — observed as SIGSEGV/SIGABRT in
# backend_compile_and_load.  Raise the limit; the main-thread stack grows
# dynamically up to the rlimit on Linux.
import resource

try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(
        resource.RLIMIT_STACK, (resource.RLIM_INFINITY, resource.RLIM_INFINITY)
    )
except (ValueError, OSError):  # pragma: no cover - non-root fallback
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
    except Exception:
        pass

import numpy as np
import pytest

import jax

# The container's axon sitecustomize force-sets jax_platforms="axon,cpu"
# (remote TPU tunnel).  Tests must run on local CPU: override before any
# backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from pulser_diff_tpu.core import (
    BlackmanWaveform,
    ConstantWaveform,
    KaiserWaveform,
    MockDevice,
    Pulse,
    RampWaveform,
    Register,
    Sequence,
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def two_atom_register():
    # 2-atom rectangle at blockade-ish distance
    return Register({"q0": jnp.array([-4.0, 0.0]), "q1": jnp.array([4.0, 0.0])})


@pytest.fixture
def duration(rng):
    return int(rng.integers(200, 300))


def make_simple_sequence(reg, duration=240, omega=2.0, delta=-1.0, phase=0.5):
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(Pulse.ConstantPulse(duration, omega, delta, phase), "ryd")
    return seq


def make_rich_sequence(reg, duration=240, area=np.pi, phase=0.3):
    """Constant + Blackman/Ramp + Kaiser pulses on a global channel."""
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(Pulse.ConstantPulse(duration, 1.5, -0.8, phase), "ryd")
    seq.add(
        Pulse(
            BlackmanWaveform(duration, area),
            RampWaveform(duration, -1.0, 1.0),
            0.0,
        ),
        "ryd",
    )
    seq.add(
        Pulse(
            KaiserWaveform(duration, area / 2),
            ConstantWaveform(duration, 0.5),
            1.1,
        ),
        "ryd",
    )
    return seq


@pytest.fixture
def simple_seq(two_atom_register):
    return make_simple_sequence(two_atom_register)


@pytest.fixture
def rich_seq(two_atom_register):
    return make_rich_sequence(two_atom_register)


def run_isolated(code: str, timeout: int = 900) -> str:
    """Run a physics/gradient check in a FRESH interpreter.

    The handful of largest grad-of-scan compiles reproducibly crash
    XLA's CPU compiler (SIGSEGV/SIGABRT inside backend_compile_and_load)
    when they are the first big compile late in a long-lived test
    process, while always succeeding in a fresh one.  Tests wrap only the
    fragile compile in a subprocess; everything else runs in-process.
    """
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    pre = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        # Env-var cache config is a no-op under the axon sitecustomize
        # (jax imports before the env reaches it); set it explicitly so
        # subprocess reruns hit the persistent cache.
        f"jax.config.update('jax_compilation_cache_dir', {_CACHE_DIR!r})\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)\n"
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", pre + code],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The XLA CPU backend segfaults/aborts inside `backend_compile_and_load`
    once a long-lived process has accumulated a few hundred compiled
    programs (the crash is positional — it strikes whichever sizable
    compile comes next, reproducibly around test ~120 of the suite).
    Dropping the executable caches between modules keeps the process
    young; within-module cache reuse is preserved.
    """
    yield
    jax.clear_caches()
