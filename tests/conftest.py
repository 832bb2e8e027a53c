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

import numpy as np
import pytest

import jax

# The container's axon sitecustomize force-sets jax_platforms="axon,cpu"
# (remote TPU tunnel).  Tests must run on local CPU: override before any
# backend is initialized.
jax.config.update("jax_platforms", "cpu")

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
