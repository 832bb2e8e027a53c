# %% [markdown]
# # Basic usage
#
# Port of the reference's `basic_usage.ipynb` workflow to pulser_diff_tpu:
# build a sequence, simulate it, compute expectation values, and take
# gradients of the dynamics with respect to pulse parameters and time.

# %%
import jax
import jax.numpy as jnp
import numpy as np

from pulser_diff_tpu import TpuEmulator, SolverType
from pulser_diff_tpu.core import (
    BlackmanWaveform,
    MockDevice,
    Pulse,
    RampWaveform,
    Register,
    Sequence,
)
from pulser_diff_tpu.derivative import deriv_param, deriv_time
from pulser_diff_tpu.ops import total_magnetization

# %% [markdown]
# ## Building a sequence
# Two atoms 8 um apart, driven by a global Rydberg channel.

# %%
reg = Register({"q0": jnp.array([-4.0, 0.0]), "q1": jnp.array([4.0, 0.0])})
seq = Sequence(reg, MockDevice)
seq.declare_channel("ryd", "rydberg_global")
seq.add(Pulse.ConstantPulse(300, 2.0, -1.0, 0.0), "ryd")
seq.add(Pulse(BlackmanWaveform(300, np.pi), RampWaveform(300, -2.0, 2.0), 0.3), "ryd")

# %% [markdown]
# ## Simulating

# %%
sim = TpuEmulator.from_sequence(seq)
results = sim.run(solver=SolverType.DP5_SE)
obs = total_magnetization(len(reg))
exp_val = results.expect([obs])[0]
times = np.asarray(jax.device_get(sim.evaluation_times))
print("final magnetization:", float(exp_val.re[-1]))

# %% [markdown]
# ## Gradient w.r.t. a pulse parameter
# Rebuild the pipeline as a pure function of the parameter and use
# jax.grad / deriv_param.

# %%
def magnetization_trace(omega):
    s2 = Sequence(reg, MockDevice)
    s2.declare_channel("ryd", "rydberg_global")
    s2.add(Pulse.ConstantPulse(300, omega, -1.0, 0.0), "ryd")
    s2.add(
        Pulse(BlackmanWaveform(300, np.pi), RampWaveform(300, -2.0, 2.0), 0.3),
        "ryd",
    )
    sim2 = TpuEmulator.from_sequence(s2)
    return sim2.run().expect([obs])[0].re


(grad_at_final,) = deriv_param(
    magnetization_trace, [jnp.asarray(2.0)], times=sim.evaluation_times
)
print("d<M>(T)/d omega =", float(grad_at_final))

# %% [markdown]
# ## Time derivative of the expectation trace

# %%
from pulser_diff_tpu.cplx import Cplx
from pulser_diff_tpu.ops.linalg import expect as _expect
from pulser_diff_tpu.solvers import TimeGrid, sesolve

h = sim._hamiltonian
grid0 = TimeGrid.make(h.sampling_times, sim._eval_times_array)


def trace_of_times(ts):
    grid = grid0.with_values(ts)
    da, db = h.dim**h._a, h.dim**h._b
    psi0 = sim.initial_state
    p = Cplx(psi0.re.T.reshape(1, da, db), psi0.im.T.reshape(1, da, db))
    states = sesolve(h._ham_data, p, grid)
    n_eval = states.re.shape[0]
    st = Cplx(
        states.re.reshape(n_eval, da * db, 1),
        states.im.reshape(n_eval, da * db, 1),
    )
    return _expect(obs, st).re


dMdt = deriv_time(trace_of_times, sim.evaluation_times, pulse_endtimes=sim.endtimes)
print("max |d<M>/dt| =", float(jnp.abs(dMdt).max()))
