# %% [markdown]
# # Multi-start optimization (population training)
#
# Pulse-level loss landscapes are non-convex: a single Adam run can park
# in a local minimum, and the usual cure — restarting from several
# initial guesses — multiplies the training cost by the number of
# restarts.  On this framework it doesn't: a whole population of
# parameter candidates evolves in ONE fused kernel launch (the
# population rides the Monte-Carlo kernel's runs-axis grid), so P
# restarts cost ~P x the per-candidate kernel time but only ONE
# host->device dispatch per step.  Hardware (TPU v5e): the 12-atom
# headline workload runs an 8-candidate population forward+grad step in
# 46.9 ms — 5.9 ms per candidate vs 25.8 ms for a single-candidate step
# (SCALING.md).
#
# The reference has no population machinery (its training loop rebuilds
# one torch graph per step, reference model.py:405-431); this is a
# TPU-native extension.

# %%
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pulser_diff_tpu import QuantumModel
from pulser_diff_tpu.core import (
    ConstantWaveform,
    CustomWaveform,
    MockDevice,
    Pulse,
    Register,
    Sequence,
)
from pulser_diff_tpu.ops import interpolate_sine

CI = bool(int(os.environ.get("PDT_DOCS_CI", "0")))

# %% [markdown]
# ## A parametrized sequence
#
# Two atoms, a sine-interpolated amplitude envelope (the reference's
# custom-waveform parametrization) and a constant detuning, both
# trainable.

# %%
N_PARAMS = 6
DURATION = 384

reg = Register(
    {"q0": jnp.array([-5.0, 0.0]), "q1": jnp.array([5.0, 0.0])}
)
seq = Sequence(reg, MockDevice)
seq.declare_channel("ryd", "rydberg_global")
amp_samples = seq.declare_variable("amp_samples", size=DURATION)
det = seq.declare_variable("det")
seq.add(
    Pulse(
        CustomWaveform(amp_samples, duration=DURATION),
        ConstantWaveform(DURATION, det),
        0.0,
    ),
    "ryd",
)

M = interpolate_sine(N_PARAMS, DURATION)
model = QuantumModel(
    seq,
    {
        "amp_samples": ((jnp.ones(N_PARAMS),), lambda v: M @ v),
        "det": jnp.asarray(0.0),
    },
    sampling_rate=0.5,
    evaluation_times="Minimal",
)

# %% [markdown]
# ## Target and loss
#
# Drive the final total magnetization to a target generated from a known
# parameter set (so a perfect solution exists and "success" is
# unambiguous).

# %%
true_amp = jnp.asarray(2.0 * np.sin(np.linspace(0.3, np.pi, N_PARAMS)))
_, v_target = model.expectation_fn()(
    {"amp_samples_0": true_amp, "det": jnp.asarray(-0.8)}
)
target = float(v_target[-1])


def loss(times, vals):
    return (vals[-1] - target) ** 2


# %% [markdown]
# ## A population of restarts
#
# P candidates drawn around a neutral guess.  `fit_population` advances
# all of them in lock-step — one fused launch per step — tracking the
# best candidate ever seen, which it loads into `model.params` at the
# end.

# %%
P = 4 if CI else 8
EPOCHS = 40 if CI else 200
key = jax.random.PRNGKey(7)
k1, k2 = jax.random.split(key)
stack = {
    "amp_samples_0": jnp.ones((P, N_PARAMS))
    + 0.8 * jax.random.normal(k1, (P, N_PARAMS)),
    "det": 0.5 * jax.random.normal(k2, (P,)),
}

losses, final_stack = model.fit_population(
    loss,
    stack,
    epochs=EPOCHS,
    optimizer=optax.adam(5e-2),
    steps_per_call=EPOCHS // 2,
)

first, last = losses[0], losses[-1]
print(f"initial losses: {np.round(np.asarray(first), 4)}")
print(f"final   losses: {np.round(np.asarray(last), 6)}")

_, v = model.expectation_fn()(model.params)
print(f"loaded best candidate loss: {(float(v[-1]) - target) ** 2:.3g}")

# %% [markdown]
# Every restart trains simultaneously; the spread of final losses shows
# which basins the restarts found, and the best one is already loaded.
# For the 12-atom workload the same call runs the fused MC kernel with
# the population as its grid axis — see bench_population.py for the
# hardware numbers.
