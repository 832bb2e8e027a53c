# %% [markdown]
# # State preparation
#
# Port of the reference's `state_preparation.ipynb` workload: prepare the
# antiferromagnetic-like |r...r> target on a Rydberg register by optimizing
# an interpolated amplitude/detuning sweep (adiabatic passage), with
# gradients through the full dynamics.

# %%
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pulser_diff_tpu import TpuEmulator
from pulser_diff_tpu.core import (
    CustomWaveform,
    MockDevice,
    Pulse,
    Register,
    Sequence,
)
from pulser_diff_tpu.ops import interpolate_sine

N_QUBITS = 6
N_PARAMS = 15  # 15 amp + 15 det = the reference's 30-param anchor (state_preparation.ipynb cell 13)
DURATION = 1100
SAMPLING_RATE = 0.25

reg = Register.linear(N_QUBITS, spacing=12.0, prefix="q")
M = interpolate_sine(N_PARAMS, DURATION)

# target: all atoms in |r> (index 0 per site -> global index 0)
TARGET_INDEX = 0


def fidelity(amp_params, det_params):
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    amp = jax.nn.relu(M @ amp_params)  # amplitudes must be >= 0
    det = M @ det_params
    seq.add(Pulse(CustomWaveform(amp), CustomWaveform(det), 0.0), "ryd")
    sim = TpuEmulator.from_sequence(
        seq, sampling_rate=SAMPLING_RATE, evaluation_times="Minimal"
    )
    states = sim.run().states
    last = states[states.re.shape[0] - 1]
    return last.abs2()[TARGET_INDEX, 0]


if __name__ == "__main__":
    # adiabatic-sweep initialisation: ramp amplitude up/down, detuning
    # from below resonance to above
    amp_p = jnp.asarray(3.0 * np.sin(np.linspace(0, np.pi, N_PARAMS)))
    det_p = jnp.asarray(np.linspace(-6.0, 6.0, N_PARAMS))

    loss_fn = lambda a, d: 1.0 - fidelity(a, d)
    vag = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))

    def adam_phase(params, epochs, lr, label):
        opt = optax.adam(lr)
        state = opt.init(params)
        best = (1.0, params)
        for ep in range(epochs):
            loss, grads = vag(*params)
            upd, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, upd)
            if float(loss) < best[0]:
                best = (float(loss), params)
            if ep % 250 == 0:
                print(f"{label} epoch {ep}: infidelity {float(loss):.7f}")
        return best

    # staged Adam: explore at 1e-2, settle at 1e-3
    best = adam_phase((amp_p, det_p), 1500, 1e-2, "adam-1")
    best = adam_phase(best[1], 2500, 1e-3, "adam-2")

    # L-BFGS polish: the 30-dim landscape near the optimum is smooth and
    # locally quadratic — quasi-Newton converges far past where Adam stalls
    loss_flat = lambda p: 1.0 - fidelity(p["a"], p["d"])
    vg = jax.jit(jax.value_and_grad(loss_flat))
    p = {"a": best[1][0], "d": best[1][1]}
    opt = optax.lbfgs()
    state = opt.init(p)
    best_l = (best[0], p)
    for ep in range(120):
        loss, grads = vg(p)
        upd, state = opt.update(
            grads, state, p, value=loss, grad=grads, value_fn=loss_flat
        )
        p = optax.apply_updates(p, upd)
        if float(loss) < best_l[0]:
            best_l = (float(loss), p)
        if ep % 20 == 0:
            print(f"lbfgs epoch {ep}: infidelity {float(loss):.8f}")
    print(f"final state fidelity: {100 * (1 - best_l[0]):.4f}%")
