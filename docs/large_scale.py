# %% [markdown]
# # Scaling to large systems
#
# The reference framework's docs stop at 6 atoms
# (/root/reference/docs/state_preparation.ipynb); its architecture
# (sparse term-list closures + autograd through the unrolled ODE loop)
# cannot represent 16+ qubit statevectors in practice.  This tutorial
# shows the three regimes of pulser_diff_tpu on TPU (SCALING.md holds
# the hardware numbers):
#
# | state size | default path | how |
# |---|---|---|
# | dim < 2^18 (N <= 17) | fused Pallas DP5 kernel | automatic for `DP5_SE` |
# | dim >= 2^18 (N >= 18) | f32 XLA stepper (`DP5_SE_F32`) | automatic; `fused=False` restores f64 |
# | beyond one chip's HBM | `sharded_sesolve` over a device mesh | explicit mesh |
#
# Hardware anchors (one v5e chip, 660 ns / 8-param workload):
# N=12 25.8 ms, N=16 68.6 ms, N=17 152 ms (fused fwd+grad);
# N=18 329 ms, N=19 1.06 s, N=20 (million-dim) 2.58 s (f32 XLA fwd+grad).

# %%
import os

import jax
import jax.numpy as jnp
import numpy as np

from pulser_diff_tpu import TpuEmulator, SolverType
from pulser_diff_tpu.core import (
    ConstantWaveform,
    CustomWaveform,
    MockDevice,
    Pulse,
    Register,
    Sequence,
)
from pulser_diff_tpu.ops import total_magnetization
from pulser_diff_tpu.ops.linalg import _interpolate_sine_np

# CI mode keeps everything CPU-sized; run on TPU with PDT_DOCS_CI unset
# and N_ATOMS as large as you like (18+ engages the f32 XLA route).
CI = bool(int(os.environ.get("PDT_DOCS_CI", "0")))
N_ATOMS = 6 if CI else int(os.environ.get("N_ATOMS", "18"))
DURATION = 120 if CI else 660
N_PARAMS = 4 if CI else 8

# %% [markdown]
# ## One model, every regime
#
# Nothing about the model changes with size: the emulator picks the
# right solve for the state dimension (`backend._fused_eligible` /
# `_f32_xla_eligible`).  You can always force a path explicitly:
# `run(solver=SolverType.DP5_SE_F32)`, `run(fused=False)` (f64 XLA),
# or `run(solver=SolverType.DP5_PALLAS)` (fused forward, N <= 18).

# %%
coords = [(10.0 * (i % 4), 10.0 * (i // 4)) for i in range(N_ATOMS)]
reg = Register.from_coordinates(coords, prefix="q")
seq = Sequence(reg, MockDevice)
seq.declare_channel("ryd", "rydberg_global")
amp = seq.declare_variable("amp", size=DURATION)
seq.add(
    Pulse(
        CustomWaveform(amp, duration=DURATION),
        ConstantWaveform(DURATION, -2.0),
        0.0,
    ),
    "ryd",
)

# sine-interpolated drive: N_PARAMS trainable knots -> DURATION samples
M = jnp.asarray(_interpolate_sine_np(N_PARAMS, DURATION))
from pulser_diff_tpu.model import QuantumModel

model = QuantumModel(
    seq,
    {"amp": ((jnp.linspace(1.0, 3.0, N_PARAMS),), lambda v: M @ v)},
    sampling_rate=0.25,
    evaluation_times="Minimal",
)
obs = total_magnetization(N_ATOMS, dense=False)  # diagonal 1-D form
exp_fn = model.expectation_fn(obs)


def loss(knots):
    _, vals = exp_fn({"amp_0": knots})
    return vals[-1]


knots = jnp.linspace(1.0, 3.0, N_PARAMS)
val, grads = jax.jit(jax.value_and_grad(loss))(knots)
print(f"N={N_ATOMS} (dim {2**N_ATOMS:,}): <M>={float(val):.6f}, "
      f"|grad|={float(jnp.abs(grads).max()):.4f}")

# %% [markdown]
# ## Explicit f32 XLA solve
#
# At any size you can run the HBM-resident f32 stepper directly — it is
# the same code path the emulator auto-selects at dim >= 2^18.  Values
# track f64 at ~1e-6, gradients at ~1e-6 absolute (hardware-pinned at
# N=18, SCALING.md).

# %%
sim = model._make_emulator({"amp_0": knots})
res32 = sim.run(solver=SolverType.DP5_SE_F32)
final = res32.get_final_state()
print("f32 solve final-state norm:",
      float((final.re**2 + final.im**2).sum()))

# %% [markdown]
# ## Past one chip: shard the statevector over a mesh
#
# `sharded_sesolve` splits the state's row-group axis over a
# `jax.sharding.Mesh`; the row matmul of the factorized H application
# becomes a distributed matmul over ICI (XLA inserts the collectives).
# It composes with the f32 mode — `solver=SolverType.DP5_SE_F32` — for
# 2x memory headroom and MXU-speed matmuls.

# %%
n_dev = len(jax.devices())
from pulser_diff_tpu.cplx import Cplx
from pulser_diff_tpu.parallel import make_mesh, sharded_sesolve
from pulser_diff_tpu.solvers import TimeGrid

h = sim._hamiltonian
da, db = h.dim**h._a, h.dim**h._b
if da % n_dev == 0 and n_dev > 1:
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    p0 = sim.initial_state
    psi0 = Cplx(p0.re.T.reshape(1, da, db), p0.im.T.reshape(1, da, db))
    mesh = make_mesh({"state": n_dev})
    out = sharded_sesolve(
        h._ham_data, psi0, grid, mesh, solver=SolverType.DP5_SE_F32
    )
    n_placed = len({s.device for s in out.re.addressable_shards})
    print(f"sharded f32 solve over {n_placed} devices: "
          f"norm={float(out.abs2()[-1].sum()):.9f}")
else:
    print(f"(mesh demo skipped: da={da} not divisible by {n_dev} devices)")

# %% [markdown]
# ## Amortizing the dispatch floor in training loops
#
# On a remote-TPU tunnel each dispatch costs ~25 ms; the in-kernel cost
# of a 12-atom fused step is ~3 ms.  `fit(steps_per_call=K)` fuses K
# optimizer steps into one jitted `lax.scan`, paying the floor once per
# K steps (see QuantumModel.fit).
