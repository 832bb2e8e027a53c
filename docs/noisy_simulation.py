# %% [markdown]
# # Noisy simulation
#
# Every noise channel of the reference framework, TPU-native:
# Lindblad channels (dephasing / relaxation / depolarizing / effective
# noise incl. leakage) solved with the density-matrix integrator,
# stochastic doppler/amplitude noise as a vmapped Monte-Carlo batch,
# SPAM state-preparation and detection errors, and gradients with
# respect to the (traced) noise parameters themselves.
#
# Reference parity: pulser-diff's noisy run loop
# (/root/reference/pulser_diff/backend.py:430-611) and its tensor-valued
# SimConfig (/root/reference/pulser_diff/simconfig.py).

# %%
import os

import jax
import jax.numpy as jnp
import numpy as np

from pulser_diff_tpu import SimConfig, TpuEmulator
from pulser_diff_tpu.core import MockDevice, Pulse, Register, Sequence
from pulser_diff_tpu.ops import total_magnetization

CI = bool(int(os.environ.get("PDT_DOCS_CI", "0")))
DUR = 80 if CI else 400

reg = Register({"q0": jnp.array([-4.0, 0.0]), "q1": jnp.array([4.0, 0.0])})


def make_seq():
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    seq.add(Pulse.ConstantPulse(DUR, 2.0, -1.0, 0.0), "ryd")
    return seq


# %% [markdown]
# ## Lindblad channels (deterministic density-matrix path)
# Any of dephasing / relaxation / depolarizing / eff_noise routes the
# solve to `mesolve`; the result holds density matrices.

# %%
cfg = SimConfig(noise=("dephasing", "relaxation"), dephasing_rate=0.1,
                relaxation_rate=0.05)
sim = TpuEmulator.from_sequence(make_seq(), config=cfg,
                                evaluation_times=0.2)
res = sim.run()
rho_final = res.states[len(res._sim_times) - 1]
print("trace:", float(jnp.trace(rho_final.re)))

obs = total_magnetization(2)
exp_vals = res.expect([obs])[0]
print("final <Sz>:", float(exp_vals.re[-1]))

# %% [markdown]
# ## Gradients w.r.t. noise parameters
# SimConfig parameters stay traced end-to-end, so `jax.grad` through the
# whole noisy simulation works (the reference's tensor-valued SimConfig).


# %%
def loss(rate):
    cfg_r = SimConfig(noise="dephasing", dephasing_rate=rate)
    sim_r = TpuEmulator.from_sequence(make_seq(), config=cfg_r,
                                      evaluation_times="Minimal")
    out = sim_r.run()
    vals = out.expect([obs])[0]
    return vals.re[-1]


g = jax.grad(loss)(jnp.asarray(0.1))
print("d<Sz>/d(dephasing_rate) =", float(g))

# %% [markdown]
# ## Leakage
# `with_leakage=True` adds a dark level |x> per atom; effective-noise
# operators then act on the extended (here 3-level) space.

# %%
L = np.zeros((3, 3))
L[2, 1] = 1.0  # |x><g|
cfg_leak = SimConfig(noise="eff_noise", eff_noise_rates=(0.2,),
                     eff_noise_opers=(L,), with_leakage=True)
sim_leak = TpuEmulator.from_sequence(make_seq(), config=cfg_leak,
                                     evaluation_times="Minimal")
res_leak = sim_leak.run()
rho = res_leak.states[len(res_leak._sim_times) - 1]
x_pop = float(rho.re[2 * 3 + 2, 2 * 3 + 2] + rho.re[2, 2]
              + rho.re[1 * 3 + 2, 1 * 3 + 2] + rho.re[2 * 3 + 1, 2 * 3 + 1])
print("leaked population (diagonal x-terms):", x_pop)

# %% [markdown]
# ## Stochastic noise (Monte-Carlo) + SPAM
# Doppler detuning draws and amplitude fluctuations run as a vmapped
# batch of PRNG-keyed realizations — one device program for all runs —
# and detection errors (epsilon / epsilon') are applied as batched bit
# flips on device during sampling.

# %%
cfg_mc = SimConfig(noise=("doppler", "SPAM"), temperature=50.0,
                   runs=4 if CI else 50, samples_per_run=30,
                   eta=0.0, epsilon=0.03, epsilon_prime=0.01)
sim_mc = TpuEmulator.from_sequence(make_seq(), config=cfg_mc,
                                   evaluation_times="Minimal")
res_mc = sim_mc.run()
final_counts = res_mc._results[-1].bitstring_counts
print("sampled bitstrings:", dict(final_counts))

# %% [markdown]
# ## Lindblad at statevector cost: quantum-jump trajectories (MCWF)
# `run(solver="MCWF")` solves the SAME master equation as the
# density-matrix path, but as an average over R statevector
# trajectories (Dalibard–Castin–Mølmer unraveling): between jumps the
# state evolves under the non-Hermitian drift H - (i/2)ΣL†L, and jumps
# fire branchlessly inside one `lax.scan` when the squared norm drops
# below a uniform threshold.  The R-trajectory axis is the MXU batch
# axis, so R trajectories cost barely more than one solve — and the
# state stays dim-sized where the density matrix needs dim².  Beyond
# ~13 atoms this is the ONLY way to reach Lindblad physics (at 16 atoms
# a density matrix would be 4.3e9 complex entries).

# %%
cfg_mcwf = SimConfig(noise="dephasing", dephasing_rate=0.1,
                     runs=8 if CI else 200, samples_per_run=30)
sim_mcwf = TpuEmulator.from_sequence(make_seq(), config=cfg_mcwf,
                                     evaluation_times=0.2)
res_mcwf = sim_mcwf.run(solver="MCWF")       # NoisyResults
rho_me = sim_mcwf.run()                      # DP5_ME density matrices
mc_pops = np.diagonal(np.asarray(res_mcwf.states.re),
                      axis1=-2, axis2=-1)
me_pops = np.diagonal(np.asarray(rho_me.states.re), axis1=-2, axis2=-1)
print("max |pop_MCWF - pop_ME|:", float(np.abs(mc_pops - me_pops).max()),
      f"(statistical, ~1/sqrt(R={cfg_mcwf.runs}))")

# %% [markdown]
# MCWF composes with the stochastic noises: doppler / amplitude draws
# give each trajectory its own Hamiltonian, and SPAM state-prep error
# (`eta`) gives each trajectory its own bad-atom configuration — the
# trajectory unraveling of the per-run eta Counter.  Trajectories shard
# over a device mesh with `parallel.sharded_mcwf_states`.

# %%
cfg_eta = SimConfig(noise=("dephasing", "SPAM"), dephasing_rate=0.1,
                    eta=0.2, epsilon=0.0, epsilon_prime=0.0,
                    runs=8 if CI else 200, samples_per_run=30)
sim_eta = TpuEmulator.from_sequence(make_seq(), config=cfg_eta,
                                    evaluation_times="Minimal")
res_eta = sim_eta.run(solver="MCWF")
print("with eta=0.2:", dict(res_eta.results[-1]))

# %% [markdown]
# ## Mid-size Lindblad: the dense-matmul mesolve form
# Between the Liouville-superop fast path (dim ≤ 32) and the sharded
# big-ρ regime, `mesolve` auto-selects the DENSE form: H(t) is
# materialized as one (dim, dim) matrix per RK stage from precomputed
# lifted part stacks, and the whole right-hand side — commutator,
# dissipator drift and jump terms — evaluates as MXU-shaped (dim, dim)
# matmuls.  On hardware this makes a fully differentiable 6/7/8-atom
# Lindblad solve 23.6x / 74.4x / 106.7x faster than the torch-CPU
# reference architecture at f64 parity ~1e-14 (SCALING.md), with the
# f32 modes (DP5_ME_F32) another ~20x beyond.  `me_form=` overrides the
# routing ("superop" / "dense" / "factored").

# %%
N_MID = 3 if CI else 6
reg_mid = Register.from_coordinates(
    [(9.0 * i, 0.0) for i in range(N_MID)], prefix="q"
)
seq_mid = Sequence(reg_mid, MockDevice)
seq_mid.declare_channel("ryd", "rydberg_global")
seq_mid.add(Pulse.ConstantPulse(DUR, 1.5, -0.8, 0.0), "ryd")
sim_mid = TpuEmulator.from_sequence(
    seq_mid,
    config=SimConfig(noise="dephasing", dephasing_rate=0.05),
    evaluation_times="Minimal",
)
rho_dense = sim_mid.run(solver="DP5_ME", me_form="dense")
print(
    f"{N_MID}-atom dense-form mesolve trace:",
    float(np.trace(np.asarray(rho_dense.states.re)[-1])),
)

# %% [markdown]
# ## Differentiating through trajectories: MCWF pathwise gradients
# `QuantumModel.expectation_mcwf_fn(key=..., n_traj=R)` returns a
# jittable pure function whose gradient flows through the trajectory
# average with the jump realizations pinned by the PRNG key (the
# "fixed-realization pathwise" estimator).  The discrete jump decisions
# carry no tangent, so the estimator misses the dependence of jump
# statistics on the parameters — a bias that vanishes with the per-step
# jump probability and is pinned against unbiased DP5_ME gradients in
# the test suite.  Use it to train drive parameters under Lindblad
# noise at sizes where ρ (dim²) no longer fits; for noise-RATE
# gradients prefer the ME forms above.

# %%
from pulser_diff_tpu.model import QuantumModel

seq_g = Sequence(reg, MockDevice)
seq_g.declare_channel("ryd", "rydberg_global")
om_var = seq_g.declare_variable("omega")
seq_g.add(Pulse.ConstantPulse(DUR, om_var, -0.6, 0.2), "ryd")
model_g = QuantumModel(
    seq_g, {"omega": jnp.asarray(1.7)},
    noise_config=SimConfig(noise="dephasing", dephasing_rate=0.08),
    evaluation_times="Minimal",
)
fn_mcwf = model_g.expectation_mcwf_fn(
    key=jax.random.PRNGKey(7), n_traj=8 if CI else 256
)
val, grad = jax.value_and_grad(
    lambda om: fn_mcwf({"omega": om})[1][-1]
)(jnp.asarray(1.7))
print("MCWF pathwise d<Sz>/domega:", float(grad), " value:", float(val))
