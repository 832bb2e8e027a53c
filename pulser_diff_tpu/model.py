"""QuantumModel: trainable pulse sequences (reference model.py:30-431).

TPU-native re-design: instead of a torch ``nn.Module`` whose autograd graph
is rebuilt every iteration, the model owns a *params pytree* and exposes
pure functions ``params -> states / expectation`` that JAX jits and
differentiates.  One compiled program is reused across the whole training
loop (the reference re-traces sequence building, sampling, Hamiltonian
assembly and every solver step per epoch, SURVEY.md §3.4).

Feature parity:
  - trainable sequence variables (pulse amplitudes/detunings/phases/areas,
    custom sample arrays)                      [model.py:109-119]
  - trainable register coordinates             [model.py:121-128, 168-182]
  - custom-waveform callables: (params, fn)    [model.py:79-89, 157-163]
  - pulse-duration optimization via smooth tanh boxcar envelopes on a
    padded static grid                         [model.py:139-143, 184-206,
                                                301-368; waveform_funcs]
  - constraint clamping                        [model.py:370-374]
  - update_sequence / forward / expectation    [model.py:376-431]
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Mapping, Optional, Union
from uuid import uuid4

import jax
import jax.numpy as jnp
import numpy as np

from pulser_diff_tpu.backend import TpuEmulator
from pulser_diff_tpu.config import default_dtype
from pulser_diff_tpu.cplx import Cplx, as_cplx
from pulser_diff_tpu.core.register import Register
from pulser_diff_tpu.core.sampler import (
    ChannelSamples,
    SequenceSamples,
    _PulseTargetSlot,
    _SlmMask,
)
from pulser_diff_tpu.core.sequence import Sequence
from pulser_diff_tpu.core.variables import Variable, VariableItem
from pulser_diff_tpu.core.waveforms import ConstantWaveform
from pulser_diff_tpu.ops.linalg import expect as _expect
from pulser_diff_tpu.ops.linalg import total_magnetization
from pulser_diff_tpu.simconfig import SimConfig
from pulser_diff_tpu.solvers import SolverType, TimeGrid
from pulser_diff_tpu.waveform_funcs import constant_waveform


@dataclass
class Parameter:
    """Bookkeeping record for one model parameter (reference model.py:22)."""

    name: str
    value: Union[int, float, jax.Array, None] = None
    trainable: bool = False
    type: str = ""


def _pad_duration(total_ns: int, chunk: int = 64) -> int:
    """Round the optimization grid up to a chunk multiple so that small
    duration updates do not change array shapes (no per-epoch recompiles —
    the reference rebuilds everything each step instead)."""
    return int(np.ceil(total_ns / chunk) * chunk)


class QuantumModel:
    def __init__(
        self,
        seq: Sequence,
        trainable_param_values: Optional[Mapping[str, Any]] = None,
        constraints: Optional[Mapping[str, Any]] = None,
        sampling_rate: float = 1.0,
        solver: str = SolverType.DP5_SE,
        initial_state: Optional[Cplx] = None,
        noise_config: Optional[SimConfig] = None,
        time_grad: bool = False,
        dist_grad: bool = False,
        evaluation_times: Any = "Full",
        **options: Any,
    ) -> None:
        trainable_param_values = dict(trainable_param_values or {})
        self.constraints = dict(constraints or {})
        self.device = seq.device
        self.sampling_rate = sampling_rate
        self.solver = solver
        self.initial_state = initial_state
        self.noise_config = noise_config
        self.time_grad = time_grad
        self.dist_grad = dist_grad
        self.evaluation_times = evaluation_times
        self.options = options
        self._substeps_cache: Optional[int] = None
        self._seq = seq
        self.register = seq.register

        # -- split out custom-waveform callables (reference :79-89) -----
        self.callable_params: dict[str, tuple] = {
            n: v[0]
            for n, v in trainable_param_values.items()
            if isinstance(v, tuple) and len(v) == 2 and callable(v[1])
        }
        self.callables: dict[str, Callable] = {
            n: v[1]
            for n, v in trainable_param_values.items()
            if isinstance(v, tuple) and len(v) == 2 and callable(v[1])
        }
        for n in self.callables:
            trainable_param_values.pop(n)

        # -- abstract repr & duration-opt detection (reference :208-299) -
        (
            self.seq_abs_repr,
            self.optimize_duration,
            self.seq_params,
        ) = self._get_abstract_repr(seq)

        # -- register params (reference :168-175) ------------------------
        self.register_params: dict[str, Parameter] = {}
        for qid, coord in seq.register.qubits.items():
            self.register_params[str(qid)] = Parameter(
                str(qid),
                coord,
                str(qid) in trainable_param_values,
                type="coord",
            )
        self.reconstruct_register = any(
            p.trainable for p in self.register_params.values()
        )

        # -- trainable leaves --------------------------------------------
        self.params: dict[str, jax.Array] = {}
        self._fixed_values: dict[str, Any] = {}

        declared = set(seq.declared_variables)
        for name, val in trainable_param_values.items():
            if name in self.register_params and self.register_params[name].trainable:
                self.params[name] = jnp.asarray(val, default_dtype())
            elif name in declared:
                self.params[name] = jnp.asarray(val, default_dtype())
            else:
                raise ValueError(
                    f"'{name}' is neither a declared sequence variable nor "
                    "a register qubit id."
                )
        # trainable params without provided values -> error (reference :117)
        for name, rec in self.seq_params.items():
            if rec.trainable and name not in self.params and name not in self.callables:
                raise ValueError(
                    f"No value for trainable sequence parameter {name} is given."
                )
        for name, ptuple in self.callable_params.items():
            for i, v in enumerate(ptuple):
                self.params[f"{name}_{i}"] = jnp.asarray(v, default_dtype())

        # -- static grid for duration optimization ----------------------
        if self.optimize_duration:
            self._t_max = _pad_duration(
                self._get_total_duration(self.params)
            )
        self.update_sequence()

    # ------------------------------------------------------------------
    # abstract representation (reference model.py:208-299)
    # ------------------------------------------------------------------
    def _get_abstract_repr(
        self, seq: Sequence
    ) -> tuple[list[dict], bool, dict[str, Parameter]]:
        pulses: list[dict] = []
        for call in list(seq._calls) + list(seq._to_build_calls):
            if call.name != "add":
                continue
            pulse = call.args[0]
            pulses.append(
                {
                    "amplitude": pulse.amplitude,
                    "detuning": pulse.detuning,
                    "phase": pulse.phase,
                }
            )

        def _dur_expr(wf) -> Any:
            return wf._duration

        optimize_duration = any(
            isinstance(_dur_expr(p["amplitude"]), (Variable, VariableItem))
            for p in pulses
        )

        params: dict[str, Parameter] = {}

        def _record(value: Any, kind: str) -> Parameter:
            if isinstance(value, (Variable, VariableItem)):
                rec = Parameter(value.var.name, trainable=True, type=kind)
            else:
                rec = Parameter(
                    f"{kind[:4]}_var_{uuid4()}",
                    value=value,
                    trainable=False,
                    type=kind,
                )
            params[rec.name] = rec
            return rec

        abs_repr = []
        for p in pulses:
            rec: dict[str, Any] = {}
            dur = _dur_expr(p["amplitude"])
            if optimize_duration:
                if isinstance(dur, (Variable, VariableItem)):
                    d_rec = Parameter(dur.var.name, trainable=True, type="duration")
                else:
                    d_rec = Parameter(
                        f"dur_var_{uuid4()}",
                        value=float(dur) / 1000,  # ns -> us (reference :254)
                        trainable=False,
                        type="duration",
                    )
                params[d_rec.name] = d_rec
                rec["duration"] = d_rec
            amp_wf, det_wf = p["amplitude"], p["detuning"]
            if isinstance(amp_wf, ConstantWaveform):
                rec["amplitude"] = _record(amp_wf.value, "amplitude")
            elif optimize_duration:
                raise NotImplementedError(
                    f"amplitude waveform type {type(amp_wf).__name__} is not "
                    "supported with duration optimization."
                )
            if isinstance(det_wf, ConstantWaveform):
                rec["detuning"] = _record(det_wf.value, "detuning")
            elif optimize_duration:
                raise NotImplementedError(
                    f"detuning waveform type {type(det_wf).__name__} is not "
                    "supported with duration optimization."
                )
            rec["phase"] = _record(p["phase"], "phase")
            abs_repr.append(rec)

        return abs_repr, optimize_duration, params

    # ------------------------------------------------------------------
    # values / register assembly
    # ------------------------------------------------------------------
    def _param_value(self, rec: Parameter, params: Mapping[str, Any]) -> Any:
        if rec.trainable:
            return params[rec.name]
        return rec.value

    def _build_values(self, params: Mapping[str, Any]) -> dict[str, Any]:
        """Values for Sequence.build: trainable leaves + callables."""
        values = {
            n: v
            for n, v in params.items()
            if n in self._seq.declared_variables
        }
        for name, fn in self.callables.items():
            args = []
            i = 0
            while f"{name}_{i}" in params:
                args.append(params[f"{name}_{i}"])
                i += 1
            values[name] = fn(*args)
        return values

    def _construct_register(self, params: Mapping[str, Any]) -> Register:
        coords = {}
        for qid, rec in self.register_params.items():
            coords[qid] = params[qid] if rec.trainable else rec.value
        return Register(coords)

    def _get_total_duration(self, params: Mapping[str, Any]) -> int:
        total = 0
        for rec in self.seq_abs_repr:
            d = rec["duration"]
            val = params[d.name] if d.trainable else d.value
            total += int(float(np.asarray(jax.device_get(val))) * 1000)
        return total + 5  # +5 ns convergence margin (reference :320)

    # ------------------------------------------------------------------
    # duration-optimization sampling (reference :184-206 rebuilt 1-ns
    # pulses; here: direct envelope synthesis on a static padded grid)
    # ------------------------------------------------------------------
    def _opt_duration_samples(self, params: Mapping[str, Any]):
        dt = default_dtype()
        t = jnp.arange(self._t_max, dtype=dt)
        amp = jnp.zeros((self._t_max,), dt)
        det = jnp.zeros((self._t_max,), dt)
        phase = jnp.zeros((self._t_max,), dt)
        ti: Any = 0
        for rec in self.seq_abs_repr:
            dur = self._param_value(rec["duration"], params)
            tf = ti + dur
            amp = amp + constant_waveform(
                ti, tf, self._param_value(rec["amplitude"], params)
            )(t)
            det = det + constant_waveform(
                ti, tf, self._param_value(rec["detuning"], params)
            )(t)
            phase = phase + constant_waveform(
                ti, tf, self._param_value(rec["phase"], params)
            )(t)
            ti = tf
        return amp, det, phase

    def _opt_duration_samples_obj(
        self, params: Mapping[str, Any], register: Register
    ) -> SequenceSamples:
        amp, det, phase = self._opt_duration_samples(params)
        ch = self._seq.declared_channels
        name, chan = next(iter(ch.items())) if ch else (
            "rydberg_global",
            None,
        )
        from pulser_diff_tpu.core.channels import Rydberg

        chan = chan or Rydberg.Global()
        cs = ChannelSamples(
            amp=amp,
            det=det,
            phase=phase,
            slots=[
                _PulseTargetSlot(0, self._t_max, frozenset(register.qubit_ids))
            ],
            addressing="Global",
            basis=chan.basis,
        )
        return SequenceSamples(
            channel_samples={name: cs},
            _measurement=None,
            _slm_mask=_SlmMask(),
            _magnetic_field=np.array([0.0, 0.0, 30.0]),
            _in_xy=chan.basis == "XY",
            qubit_ids=register.qubit_ids,
        )

    # ------------------------------------------------------------------
    # emulator construction (pure in params)
    # ------------------------------------------------------------------
    def _make_emulator(self, params: Mapping[str, Any]) -> TpuEmulator:
        register = self._construct_register(params)
        if self.optimize_duration:
            ss = self._opt_duration_samples_obj(params, register)
            sim = TpuEmulator(
                ss,
                register,
                self.device,
                sampling_rate=self.sampling_rate,
                evaluation_times=self.evaluation_times,
            )
        else:
            seq = self._seq
            if self.reconstruct_register:
                seq = self._clone_with_register(register)
            built = (
                seq.build(**self._build_values(params))
                if seq.is_parametrized()
                else seq
            )
            sim = TpuEmulator.from_sequence(
                built,
                sampling_rate=self.sampling_rate,
                evaluation_times=self.evaluation_times,
            )
        if self.initial_state is not None:
            sim.set_initial_state(self.initial_state)
        if self.noise_config is not None:
            sim.set_config(self.noise_config)
        return sim

    def _clone_with_register(self, register: Register) -> Sequence:
        new = Sequence(register, self.device)
        new._magnetic_field = self._seq._magnetic_field.copy()
        new._in_xy = self._seq._in_xy
        new._variables = dict(self._seq._variables)
        for call in self._seq._calls:
            getattr(new, call.name)(*call.args, **call.kwargs)
        new._to_build_calls = list(self._seq._to_build_calls)
        return new

    def _default_substeps(self) -> int:
        """Stability-driven substep count, computed once from the current
        (concrete) parameters on the host and cached; the traced path then
        uses it as a static constant."""
        if self._substeps_cache is None:
            try:
                sim = self._make_emulator(self.params)
                self._substeps_cache = sim._auto_substeps({})
            except Exception:
                self._substeps_cache = 1
        return self._substeps_cache

    # ------------------------------------------------------------------
    # pure functional solves
    # ------------------------------------------------------------------
    def _states_fn(
        self, params: Mapping[str, Any], force_no_fused: bool = False
    ):
        """(eval_times, states) as a pure function of params (jittable).

        ``force_no_fused`` pins the XLA stepper: used when this function
        is wrapped in ``jax.vmap`` (population fallback) — vmap-of-
        pallas_call does not lower on this backend (CLAUDE.md)."""
        sim = self._make_emulator(params)
        h = sim._hamiltonian
        noise = set(h.config.noise_types)
        solver = self.solver
        from pulser_diff_tpu.backend import _LINDBLAD_NOISES

        if noise & _LINDBLAD_NOISES and solver not in (
            SolverType.DP5_ME,
            SolverType.RK4_ME,
            SolverType.DP5_ME_F32,
            SolverType.RK4_ME_F32,
        ):
            solver = SolverType.DP5_ME
        substeps = int(self.options.get("substeps", self._default_substeps()))
        krylov_dim = int(self.options.get("krylov_dim", 12))
        grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
        opts = self.options
        if force_no_fused:
            opts = {**dict(opts), "fused": False}
        states = sim._solve_states(
            h._ham_data, None, solver, substeps, krylov_dim, grid,
            solver_opts=opts,
        )
        return sim._eval_times_array, states

    def expectation_fn(
        self, obs: Optional[Cplx] = None
    ) -> Callable[[Mapping[str, Any]], tuple]:
        """Pure fn: params -> (eval_times, real expectation values)."""
        if obs is None:
            # default observable in its diagonal (1-D) form: identical
            # values, but the dense (dim, dim) f64 matrix costs tens of
            # ms per step on TPU (VPU-emulated f64 matvec + its VJP)
            obs = total_magnetization(len(self.register.qubit_ids), dense=False)
        obs = as_cplx(obs, dtype=default_dtype())

        def fn(params):
            times, states = self._states_fn(params)
            vals = _expect(obs, states)
            return times, vals.re

        return fn

    def expectation_mcwf_fn(
        self,
        obs: Optional[Cplx] = None,
        *,
        key: jax.Array,
        n_traj: int,
        substeps: Optional[int] = None,
    ) -> Callable[[Mapping[str, Any]], tuple]:
        """Pure fn: params -> (eval_times, (n_eval,) trajectory-averaged
        expectation values) via quantum-jump (MCWF) trajectories — the
        differentiable Lindblad path at STATEVECTOR cost.

        Gradient semantics (fixed-realization pathwise estimator): the
        PRNG ``key`` pins the jump realizations, so ``jax.grad`` through
        this function differentiates the drift evolution, jump
        applications and normalizations exactly while holding the
        discrete jump times/channel draws constant.  The estimator bias
        (the missing dependence of jump statistics on the parameters)
        vanishes with the per-step jump probability; it is validated
        against DP5_ME gradients at small N in
        tests/test_mcwf.py::test_mcwf_gradient_matches_mesolve.  Use the
        ME forms (``solver="DP5_ME"``; dense matmul RHS up to dim 2048)
        when unbiased noise-rate gradients are required — MCWF's value
        is the regime where rho (dim^2) no longer fits (N >= 12).

        The reference has no trajectory unraveling at all (Lindblad goes
        through pyqtorch mesolve, ref backend.py:495-509).
        """
        from pulser_diff_tpu.solvers.mcwf import mcsolve

        if obs is None:
            obs = total_magnetization(len(self.register.qubit_ids), dense=False)
        obs = as_cplx(obs, dtype=default_dtype())
        drift = (
            SolverType.DP5_SE_F32
            if self.solver == SolverType.MCWF_F32
            else SolverType.DP5_SE
        )

        def fn(params):
            sim = self._make_emulator(params)
            h = sim._hamiltonian
            grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
            ss = (
                int(substeps)
                if substeps is not None
                else int(self.options.get("substeps", self._default_substeps()))
            )
            psi0 = sim._initial_state  # (dim, nb)
            if psi0.re.shape[1] != 1:
                raise ValueError(
                    "expectation_mcwf_fn requires a single (non-batched) "
                    "initial state."
                )
            da, db = h.dim**h._a, h.dim**h._b
            p0 = Cplx(psi0.re[:, 0].reshape(da, db), psi0.im[:, 0].reshape(da, db))
            res = mcsolve(
                h._ham_data, p0, h._collapse_ops, h._size, h.dim, grid,
                key, n_traj, solver=drift, substeps=ss,
            )
            st = res.states  # (n_eval, R, da, db)
            n_eval, R = st.re.shape[:2]
            dim = da * db
            # (R, n_eval, dim, 1) -> per-trajectory expectation -> mean
            traj = Cplx(
                jnp.transpose(st.re.reshape(n_eval, R, dim), (1, 0, 2))[..., None],
                jnp.transpose(st.im.reshape(n_eval, R, dim), (1, 0, 2))[..., None],
            )
            vals = jax.vmap(lambda s: _expect(obs, s).re)(traj)  # (R, n_eval)
            return sim._eval_times_array, jnp.mean(vals, axis=0)

        return fn

    def expectation_population_fn(
        self, obs: Optional[Cplx] = None
    ) -> Callable[[Mapping[str, Any]], tuple]:
        """Pure fn: a STACK of parameter candidates -> (eval_times,
        (P, n_eval) expectation values) — the population/multi-start
        evaluation path.

        Every leaf of the input dict carries a leading population axis P
        (P independent candidate parameter sets).  On an accelerator
        below the fused adjoint cap, the P candidate Hamiltonians are
        built under ``jax.vmap`` and solved in ONE fused kernel launch —
        the population rides the Monte-Carlo kernel's runs-axis grid
        (ops/pallas_evolution.pallas_evolve_mc).  vmap-of-pallas does not
        lower on this backend, and P sequential solves would each pay
        the ~25 ms remote-tunnel dispatch floor, so this is the only
        shape that makes population evaluation cheap.  Elsewhere (CPU,
        above the cap, Lindblad noise) the XLA stepper is vmapped.

        Differentiable: the gradient of a per-candidate loss summed over
        the population yields independent per-candidate gradients in one
        backward pass (candidates do not interact).

        The reference has no population machinery (its training loop
        rebuilds one torch graph per step, reference model.py:405-431);
        this is a TPU-native extension in the SURVEY.md §2.4 family of
        batched axes.
        """
        if obs is None:
            obs = total_magnetization(len(self.register.qubit_ids), dense=False)
        obs = as_cplx(obs, dtype=default_dtype())

        def fn(param_stack):
            first = {k: v[0] for k, v in param_stack.items()}
            sim = self._make_emulator(first)
            h = sim._hamiltonian
            noise = set(h.config.noise_types)
            from pulser_diff_tpu.backend import _LINDBLAD_NOISES

            solver = self.solver
            fused_opt = self.options.get("fused", None)
            use_fused = (
                solver in TpuEmulator._PALLAS_METHODS
                or (
                    solver == SolverType.DP5_SE
                    and fused_opt is not False
                    and sim._fused_eligible(h._ham_data)
                )
            ) and not (noise & _LINDBLAD_NOISES)
            if not use_fused:
                # vmapped XLA stepper (CPU / above the fused cap /
                # Lindblad): fused pinned off so vmap never sees a
                # pallas_call
                times = sim._eval_times_array
                states = jax.vmap(
                    lambda p: self._states_fn(p, force_no_fused=True)[1]
                )(param_stack)
                vals = jax.vmap(lambda s: _expect(obs, s).re)(states)
                return times, vals

            from pulser_diff_tpu.ops.pallas_evolution import pallas_evolve_mc

            substeps = int(
                self.options.get("substeps", self._default_substeps())
            )
            grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
            hams = jax.vmap(
                lambda p: self._make_emulator(p)._hamiltonian._ham_data
            )(param_stack)
            psi0 = sim._initial_state  # (dim, nb)
            nb = psi0.shape[1]
            da, db = h.dim**h._a, h.dim**h._b
            dim = da * db
            p0 = Cplx(
                psi0.re.T.reshape(nb, da, db), psi0.im.T.reshape(nb, da, db)
            )
            method = TpuEmulator._PALLAS_METHODS.get(solver, "DP5")
            # population evaluation is fwd+grad: at dim >= 2^16 the
            # HBM-checkpointed adjoint wins (SCALING.md round-5 A/B)
            ckpt = self.options.get("ckpt")
            if ckpt is None:
                ckpt = dim >= TpuEmulator._CKPT_DIM_THRESHOLD
            st = pallas_evolve_mc(
                hams, p0, grid.refined(substeps), method=method,
                interpret=jax.default_backend() == "cpu",
                ckpt=bool(ckpt),
            )  # (P, n_eval, nb, da, db)
            P, n_eval = st.re.shape[:2]
            states = Cplx(
                jnp.transpose(
                    st.re.reshape(P, n_eval, nb, dim), (0, 1, 3, 2)
                ),
                jnp.transpose(
                    st.im.reshape(P, n_eval, nb, dim), (0, 1, 3, 2)
                ),
            )
            vals = jax.vmap(lambda s: _expect(obs, s).re)(states)
            return sim._eval_times_array, vals

        return fn

    # ------------------------------------------------------------------
    # public API (reference model.py:370-431)
    # ------------------------------------------------------------------
    def named_parameters(self):
        """Iterate over ``(name, value)`` pairs of the trainable leaves.

        torch ``nn.Module`` API parity: the reference's QuantumModel
        inherits this from ``nn.Module`` and the docs iterate it to
        inspect/optimize parameters (reference model.py:30, notebooks).

        Snapshot semantics (unlike torch's mutable ``nn.Parameter``
        handles): jnp arrays are immutable, so the yielded values are
        current only at iteration time — ``fit()`` /
        ``check_constraints()`` REBIND ``self.params`` entries rather
        than mutating them in place.  Re-iterate after an update to see
        the new values.
        """
        yield from self.params.items()

    def parameters(self):
        """Iterate over the trainable leaf values (nn.Module parity)."""
        yield from self.params.values()

    def check_constraints(self) -> None:
        """Clamp trainable parameters to their constraint intervals."""
        for name, p in self.params.items():
            base = name
            if base in self.constraints:
                c = self.constraints[base]
                self.params[name] = jnp.clip(p, c["min"], c["max"])

    def update_sequence(self) -> None:
        """Re-materialize register/sequence from the current params."""
        if self.reconstruct_register:
            self.register = self._construct_register(self.params)
        if self.optimize_duration:
            # refresh the padded grid only when the total outgrows it
            total = self._get_total_duration(self.params)
            if total > self._t_max:
                self._t_max = _pad_duration(total)
            self.built_seq = None  # samples are synthesised directly
            return
        seq = self._seq
        if self.reconstruct_register:
            seq = self._clone_with_register(self.register)
        self.built_seq = (
            seq.build(**self._build_values(self.params))
            if seq.is_parametrized()
            else seq
        )

    def _run(self):
        self._sim = self._make_emulator(self.params)
        results = self._sim.run(
            time_grad=self.time_grad,
            dist_grad=self.dist_grad,
            solver=self.solver,
            **self.options,
        )
        return self._sim.evaluation_times, results

    def forward(self) -> tuple[jax.Array, Cplx]:
        evaluation_times, results = self._run()
        return evaluation_times, results.states

    __call__ = forward

    def expectation(self, obs: Optional[Cplx] = None) -> tuple[jax.Array, Cplx]:
        evaluation_times, results = self._run()
        if obs is None:
            obs = total_magnetization(len(self.register.qubit_ids), dense=False)
        exp_val = results.expect([as_cplx(obs, dtype=default_dtype())])[0]
        return evaluation_times, exp_val

    # ------------------------------------------------------------------
    # training loop
    # ------------------------------------------------------------------
    def fit(
        self,
        loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
        epochs: int = 50,
        optimizer: Any = None,
        obs: Optional[Cplx] = None,
        verbose: bool = False,
        callback: Optional[Callable] = None,
        steps_per_call: int = 1,
    ) -> list[float]:
        """Optimize the trainable parameters.

        Args:
            loss_fn: (eval_times, expectation_values) -> scalar loss.
            optimizer: an optax GradientTransformation (default adam(1e-2)).
            steps_per_call: number of optimizer steps fused into ONE
                jitted device program via `lax.scan`. Each host->device
                dispatch carries a fixed latency floor (~25 ms through
                the remote-TPU tunnel), so K steps per call divide that
                floor by K. With K > 1, `verbose`/`callback` fire per
                chunk (params are only materialized at chunk
                boundaries); per-epoch losses are still all returned.

        One jitted value_and_grad program is reused for all epochs (the
        TPU-native answer to the reference's per-epoch graph rebuild).
        """
        import optax

        optimizer = optimizer or optax.adam(1e-2)
        exp_fn = self.expectation_fn(obs)

        def loss_of(params):
            times, vals = exp_fn(params)
            return loss_fn(times, vals)

        # constraint clamping (reference check_constraints, :370-374);
        # key set is static, so this traces cleanly inside scan.
        clamped = {
            name: (c["min"], c["max"]) for name, c in self.constraints.items()
        }

        def clamp(params):
            return {
                name: (
                    jnp.clip(v, *clamped[name]) if name in clamped else v
                )
                for name, v in params.items()
            }

        def one_step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = clamp(optax.apply_updates(params, updates))
            return (params, opt_state), loss

        opt_state = optimizer.init(self.params)
        losses: list[float] = []
        params = dict(self.params)

        if steps_per_call <= 1:
            vag = jax.jit(jax.value_and_grad(loss_of))
            for ep in range(epochs):
                loss, grads = vag(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = clamp(optax.apply_updates(params, updates))
                losses.append(float(loss))
                if verbose:
                    print(f"epoch {ep}: loss={float(loss):.6f}")
                if callback is not None:
                    callback(ep, float(loss), params)
        else:
            # chunked on-device loop: epochs = n_full*K + remainder;
            # at most two compiled programs (K-length and remainder).
            @partial(jax.jit, static_argnames="length")
            def scan_k(carry, length):
                return jax.lax.scan(one_step, carry, None, length=length)

            carry = (params, opt_state)
            done = 0
            while done < epochs:
                k = min(steps_per_call, epochs - done)
                carry, chunk_losses = scan_k(carry, length=k)
                chunk = [float(x) for x in jax.device_get(chunk_losses)]
                losses.extend(chunk)
                done += k
                if verbose:
                    print(f"epoch {done - 1}: loss={chunk[-1]:.6f}")
                if callback is not None:
                    callback(done - 1, chunk[-1], carry[0])
            params = dict(carry[0])

        self.params = dict(params)
        self.update_sequence()
        return losses

    def fit_population(
        self,
        loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
        param_stack: Mapping[str, jax.Array],
        epochs: int = 50,
        optimizer: Any = None,
        obs: Optional[Cplx] = None,
        verbose: bool = False,
        steps_per_call: int = 1,
    ) -> tuple[list, dict[str, jax.Array]]:
        """Multi-start optimization: P parameter candidates advance in
        lock-step, each epoch solving ALL candidates in one fused kernel
        launch (``expectation_population_fn``) and applying independent
        optimizer updates (the summed loss's gradient separates per
        candidate; optax moments are elementwise, so the stacked state
        is P independent optimizers).

        Args:
            loss_fn: (eval_times, (n_eval,) expectations) -> scalar —
                the SAME signature as ``fit``; it is vmapped over the
                population.
            param_stack: dict of trainable leaves, each with a leading
                population axis P (e.g. P random restarts around an
                initial guess).
            steps_per_call: optimizer steps fused into one jitted
                ``lax.scan`` program (same dispatch-floor amortization
                as ``fit``).

        Returns ``(losses, final_stack)`` where ``losses`` is one (P,)
        array per epoch; the best candidate SEEN AT ANY EPOCH (tracked
        inside the scan, like the staged-Adam docs schedules) is loaded
        into ``self.params``.
        """
        import optax

        optimizer = optimizer or optax.adam(1e-2)
        pop_fn = self.expectation_population_fn(obs)

        def total_loss(stack):
            times, vals = pop_fn(stack)
            per = jax.vmap(lambda v: loss_fn(times, v))(vals)
            return jnp.sum(per), per

        clamped = {
            name: (c["min"], c["max"]) for name, c in self.constraints.items()
        }

        def clamp(stack):
            return {
                name: (
                    jnp.clip(v, *clamped[name]) if name in clamped else v
                )
                for name, v in stack.items()
            }

        def one_step(carry, _):
            stack, opt_state, best_loss, best_stack = carry
            (_, per), grads = jax.value_and_grad(total_loss, has_aux=True)(
                stack
            )
            # best-EVER tracking per candidate, inside the scan (the
            # pre-update params produced `per`, so compare before the
            # update — non-convex restarts can overshoot at the end)
            improved = per < best_loss
            best_loss = jnp.where(improved, per, best_loss)
            best_stack = {
                k: jnp.where(
                    improved.reshape((-1,) + (1,) * (v.ndim - 1)),
                    stack[k],
                    v,
                )
                for k, v in best_stack.items()
            }
            updates, opt_state = optimizer.update(grads, opt_state, stack)
            new_stack = clamp(optax.apply_updates(stack, updates))
            # also emit the PRE-update stack: the loop below runs
            # epochs + 1 steps so the final stack's loss is evaluated by
            # the same compiled program (no separate jit(total_loss)
            # forward compile), and the last emitted pre-update stack IS
            # the stack after `epochs` updates.
            return (new_stack, opt_state, best_loss, best_stack), (
                per,
                stack,
            )

        stack = {k: jnp.asarray(v, default_dtype()) for k, v in param_stack.items()}
        opt_state = optimizer.init(stack)
        losses: list = []

        @partial(jax.jit, static_argnames="length")
        def scan_k(carry, length):
            return jax.lax.scan(one_step, carry, None, length=length)

        P = next(iter(stack.values())).shape[0]
        carry = (
            stack,
            opt_state,
            jnp.full((P,), jnp.inf, default_dtype()),
            {k: v for k, v in stack.items()},
        )
        done = 0
        final_stack = stack
        # remainder chunk FIRST: at most two distinct static scan
        # lengths get compiled (one when steps_per_call divides
        # epochs + 1), instead of a trailing length-1 program
        k0 = max(steps_per_call, 1)
        rem = (epochs + 1) % k0
        plan = ([rem] if rem else []) + [k0] * ((epochs + 1) // k0)
        for k in plan:
            carry, (chunk, pre) = scan_k(carry, length=k)
            chunk = np.asarray(jax.device_get(chunk))  # (k, P)
            losses.extend(list(chunk))
            final_stack = {name: v[-1] for name, v in pre.items()}
            done += k
            if verbose:
                print(
                    f"epoch {done - 1}: best={chunk[-1].min():.6f} "
                    f"median={np.median(chunk[-1]):.6f}"
                )
        # step epochs+1's loss evaluation covered the final stack, so
        # best-ever tracking already includes it; drop that extra entry
        # from the reported per-epoch losses
        losses = losses[:epochs]
        _, _, best_loss, best_stack = carry
        best_loss = np.asarray(jax.device_get(best_loss))
        i_ever = int(np.argmin(best_loss))
        self.params = {k: v[i_ever] for k, v in dict(best_stack).items()}
        self.update_sequence()
        return losses, dict(final_stack)
