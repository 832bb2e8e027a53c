# %% [markdown]
# # 9-atom adiabatic antiferromagnetic state preparation
#
# BASELINE.json config #4: prepare the antiferromagnetic ordered state
# |rgrgrgrgr> on a 9-atom chain in the Rydberg-blockade regime by
# optimizing an interpolated amplitude + detuning sweep with
# adjoint gradients through the full dynamics.
# Reaches 99.95% fidelity (scanned staged-Adam schedule below, ~2 min
# warm on one TPU v5e chip; the earlier eager 1200-epoch loop landed at
# 99.57%).

# %%
import numpy as np, jax, jax.numpy as jnp
import optax
from pulser_diff_tpu import TpuEmulator
from pulser_diff_tpu.core import CustomWaveform, MockDevice, Pulse, Register, Sequence
from pulser_diff_tpu.ops import interpolate_sine

N = 9
SPACING = 7.0   # blockade regime for NN (C6/r^6 = 46 rad/us >> Omega)
N_PARAMS = 15
DURATION = 1500
RATE = 0.25

reg = Register.linear(N, spacing=SPACING, prefix="q")
M = interpolate_sine(N_PARAMS, DURATION)
# target |rgrgrgrgr>: r=bit0 per site in index ordering (r first)
tbits = [0 if i % 2 == 0 else 1 for i in range(N)]
TARGET = 0
for b in tbits:
    TARGET = TARGET * 2 + b

def fidelity(amp_p, det_p):
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    amp = jax.nn.relu(M @ amp_p)
    det = M @ det_p
    seq.add(Pulse(CustomWaveform(amp), CustomWaveform(det), 0.0), "ryd")
    sim = TpuEmulator.from_sequence(seq, sampling_rate=RATE, evaluation_times="Minimal")
    st = sim.run().states
    last = st[st.re.shape[0] - 1]
    return last.abs2()[TARGET, 0]

if __name__ == "__main__":
    # stronger sweep initialisation (hardware-selected over 3 restarts:
    # this one lands at infidelity 5.0e-4, the 4.0-amp init at 5.1e-4)
    amp_p = jnp.asarray(5.5 * np.sin(np.linspace(0, np.pi, N_PARAMS)))
    det_p = jnp.asarray(np.linspace(-12.0, 14.0, N_PARAMS))

    loss_flat = lambda p: 1.0 - fidelity(p["a"], p["d"])

    # staged Adam, each phase one jitted on-device lax.scan with
    # best-so-far tracking (see docs/state_preparation.py for the
    # pattern rationale): 10,000 steps in ~2 min warm
    def make_phase(lr, K):
        opt = optax.adam(lr)

        @jax.jit
        def phase(p):
            st = opt.init(p)

            def body(carry, _):
                p, st, best_l, best_p = carry
                l, g = jax.value_and_grad(loss_flat)(p)
                upd, st = opt.update(g, st, p)
                p2 = optax.apply_updates(p, upd)
                better = l < best_l
                best_l = jnp.where(better, l, best_l)
                best_p = jax.tree.map(
                    lambda b, n: jnp.where(better, n, b), best_p, p
                )
                return (p2, st, best_l, best_p), None

            (p, st, bl, bp), _ = jax.lax.scan(
                body, (p, st, jnp.asarray(1.0), p), None, length=K
            )
            return p, bl, bp

        return phase

    p = {"a": amp_p, "d": det_p}
    best = (1.0, p)
    for lr, K in ((1e-2, 3000), (3e-3, 3000), (1e-3, 4000)):
        p, bl, bp = make_phase(lr, K)(p)
        print(f"adam lr={lr}: best infidelity {float(bl):.3e}", flush=True)
        if float(bl) < best[0]:
            best = (float(bl), bp)
    print(f"final 9-atom AFM fidelity: {100 * (1 - best[0]):.4f}%", flush=True)
