"""Emulator orchestration (native replacement for reference backend.py).

`TpuEmulator` mirrors the reference's `TorchEmulator` API
(/root/reference/pulser_diff/backend.py:35-711): construction from a
sampled sequence or a Sequence, config management, initial state,
evaluation times, solver routing, SPAM handling and the stochastic
noise path.

TPU-native differences:
  - the solve is one jitted program over a static-structure time grid;
  - the reference's serial Monte-Carlo loop over noisy runs
    (backend.py:573-595) becomes a `jax.vmap` over PRNG keys — all runs
    integrate in parallel on the chip (shardable over a device mesh via
    pulser_diff_tpu.parallel);
  - gradients are taken functionally (see derivative.py / model.py)
    instead of mutating requires_grad flags.
"""

from __future__ import annotations

from collections import Counter
from typing import Any, Mapping, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from pulser_diff_tpu.config import default_dtype
from pulser_diff_tpu.cplx import Cplx
from pulser_diff_tpu.core.devices import Device
from pulser_diff_tpu.core.register import Register
from pulser_diff_tpu.core.sampler import SequenceSamples, sample
from pulser_diff_tpu.core.sequence import Sequence
from pulser_diff_tpu.hamiltonian import (
    Hamiltonian,
    NoiseDraws,
    draw_noise,
    zero_noise_draws,
)
from pulser_diff_tpu.result import QuantumResult
from pulser_diff_tpu.simconfig import NoiseModel, SimConfig
from pulser_diff_tpu.simresults import (
    CoherentResults,
    NoisyResults,
    SampledResult,
    SimulationResults,
)
from pulser_diff_tpu.solvers import SolverType, TimeGrid, mesolve, sesolve

_LINDBLAD_NOISES = {"dephasing", "relaxation", "depolarizing", "eff_noise"}
_DETERMINISTIC_NOISES = _LINDBLAD_NOISES | {"SPAM", "amplitude", "leakage"}

# solver options accepted by run(**options) — the JAX analogue of the
# reference's opaque pass-through to pyqtorch (ref backend.py:430-451);
# unknown keys (e.g. the dead reference-era `nsteps`) are rejected
_RUN_OPTIONS = {
    "substeps", "max_step", "krylov_dim", "krylov_tol",
    "rtol", "atol", "max_iters", "fused", "superop", "me_form",
    "remat", "n_segments", "n_traj", "ckpt",
}


class TpuEmulator:
    """Differentiable emulator of a sampled pulse sequence on TPU."""

    def __init__(
        self,
        sampled_seq: SequenceSamples,
        register: Register,
        device: Device,
        sampling_rate: float = 1.0,
        config: SimConfig | None = None,
        evaluation_times: Union[float, str, Any] = "Full",
    ) -> None:
        if not isinstance(sampled_seq, SequenceSamples):
            raise TypeError(
                "The provided sequence has to be a valid SequenceSamples "
                "instance."
            )
        if sampled_seq.max_duration == 0:
            raise ValueError("SequenceSamples is empty.")
        device.validate_register(register)
        # compiled noisy-pipeline programs (build -> solve -> weights ->
        # sample, ONE jitted launch); invalidated on any config/state/
        # eval-times mutation.  Initialized FIRST: the constructor itself
        # calls the invalidating setters below.
        self._njit_cache: dict = {}
        self._register = register
        if sampled_seq._slm_mask.end > 0 and not device.supports_slm_mask:
            raise ValueError(
                "Samples use SLM mask but device does not have one."
            )
        if not sampled_seq.used_bases <= device.supported_bases:
            raise ValueError(
                "Bases used in samples should be supported by device."
            )
        if not sampled_seq._slm_mask.targets <= set(register.qubit_ids):
            raise ValueError(
                "The ids of qubits targeted in SLM mask should be defined "
                "in register."
            )
        for name, cs in sampled_seq.channel_samples.items():
            if cs.addressing == "Local":
                tg = set().union(*(s.targets for s in cs.slots)) if cs.slots else set()
                if not tg <= set(register.qubit_ids):
                    raise ValueError(
                        "The ids of qubits targeted in Local channels "
                        "should be defined in register."
                    )
        # globalize Global channels to the register & extend duration by 1
        sampled_seq = sampled_seq.globalize(register.qubit_ids)
        self._tot_duration = sampled_seq.max_duration
        self.samples_obj = sampled_seq.extend_duration(
            self._tot_duration + 1, hold_edge=True
        )

        if not (0 < sampling_rate <= 1.0):
            raise ValueError(
                f"The sampling rate (`sampling_rate` = {sampling_rate}) must"
                " be greater than 0 and less than or equal to 1."
            )
        if int(self._tot_duration * sampling_rate) < 4:
            raise ValueError(
                "`sampling_rate` is too small, less than 4 data points."
            )

        noise_model = (
            config.to_noise_model() if config else SimConfig().to_noise_model()
        )
        self._hamiltonian = Hamiltonian(
            self.samples_obj,
            self._register.qubits,
            device,
            sampling_rate,
            noise_model,
        )
        self._eval_times_array: np.ndarray  # host-side (static under jit)
        self.set_evaluation_times(evaluation_times)

        if self.samples_obj._measurement:
            self._meas_basis = self.samples_obj._measurement
        else:
            if self._hamiltonian.basis_name in {"digital", "all"}:
                self._meas_basis = "digital"
            else:
                self._meas_basis = self._hamiltonian.basis_name
        self.set_initial_state("all-ground")
        self.dist_dict: dict[str, jax.Array] = {}
        self._rng = np.random.default_rng()

    # ------------------------------------------------------------------
    # properties (reference backend.py:153-181)
    # ------------------------------------------------------------------
    @property
    def sampling_times(self) -> jax.Array:
        return self._hamiltonian.sampling_times

    @property
    def _sampling_rate(self) -> float:
        return self._hamiltonian._sampling_rate

    @property
    def dim(self) -> int:
        return self._hamiltonian.dim

    @property
    def basis_name(self) -> str:
        return self._hamiltonian.basis_name

    @property
    def basis(self) -> dict[str, Any]:
        return self._hamiltonian.basis

    @property
    def config(self) -> SimConfig:
        return SimConfig.from_noise_model(self._hamiltonian.config)

    def set_config(self, cfg: SimConfig) -> None:
        if not isinstance(cfg, SimConfig):
            raise ValueError(f"Object {cfg} is not a valid `SimConfig`.")
        not_supported = (
            set(cfg.noise)
            - cfg.supported_noises[self._hamiltonian._interaction]
        )
        if not_supported:
            raise NotImplementedError(
                f"Interaction mode '{self._hamiltonian._interaction}' does "
                "not support simulation of noise types: "
                f"{', '.join(not_supported)}."
            )
        self._hamiltonian.set_config(cfg.to_noise_model())
        self._njit_cache.clear()

    def add_config(self, config: SimConfig) -> None:
        """Merge-in noise params of another config (reference :200-238)."""
        if not isinstance(config, SimConfig):
            raise ValueError(f"Object {config} is not a valid `SimConfig`")
        not_supported = (
            set(config.noise)
            - config.supported_noises[self._hamiltonian._interaction]
        )
        if not_supported:
            raise NotImplementedError(
                f"Interaction mode '{self._hamiltonian._interaction}' does "
                "not support simulation of noise types: "
                f"{', '.join(not_supported)}."
            )
        old = self._hamiltonian.config
        new_nm = config.to_noise_model()
        old_noises = set(old.noise_types)
        diff = set(new_nm.noise_types) - old_noises
        from dataclasses import asdict

        params = asdict(old)
        params["noise_types"] = tuple(old_noises | set(new_nm.noise_types))
        relevant = NoiseModel._find_relevant_params(
            diff,
            new_nm.state_prep_error,
            new_nm.amp_sigma,
            new_nm.laser_waist,
        )
        for p in relevant:
            params[p] = getattr(new_nm, p)
        self._hamiltonian.set_config(NoiseModel(**params))
        self._njit_cache.clear()

    def show_config(self, solver_options: bool = False) -> None:
        print(self.config.__str__(solver_options))

    def reset_config(self) -> None:
        self._hamiltonian.set_config(SimConfig().to_noise_model())
        self._njit_cache.clear()

    # ------------------------------------------------------------------
    # initial state (reference backend.py:248-280)
    # ------------------------------------------------------------------
    @property
    def initial_state(self) -> Cplx:
        return self._initial_state

    def set_initial_state(self, state: Union[str, Cplx, Any]) -> None:
        self._njit_cache.clear()
        h = self._hamiltonian
        if isinstance(state, str) and state == "all-ground":
            g_label = "u" if h._interaction == "XY" else "g"
            idx = h._basis_labels.index(g_label)
            # |g...g> has index sum_k idx * d^k
            pos = 0
            for _ in range(h._size):
                pos = pos * h.dim + idx
            dt = default_dtype()
            ket = jnp.zeros((h.dim**h._size, 1), dt).at[pos, 0].set(1.0)
            self._initial_state = Cplx(ket, jnp.zeros_like(ket))
            self._initial_is_ground = True
            return
        from pulser_diff_tpu.cplx import as_cplx

        st = state if isinstance(state, Cplx) else as_cplx(state, dtype=default_dtype())
        legal = h.dim**h._size
        if st.shape[0] != legal:
            raise ValueError(
                "Incompatible shape of initial state. "
                f"Expected {legal}, got {st.shape[0]}."
            )
        if st.ndim == 1:
            st = st.reshape(legal, 1)
        self._initial_state = st
        self._initial_is_ground = False

    # ------------------------------------------------------------------
    # evaluation times (reference backend.py:282-375)
    # ------------------------------------------------------------------
    @property
    def evaluation_times(self) -> jax.Array:
        return jnp.asarray(self._eval_times_array, default_dtype())

    @property
    def qq_distances(self) -> dict[str, jax.Array]:
        return self.dist_dict

    @property
    def endtimes(self) -> list:
        """Pulse-boundary indices in the subsampled grid (reference
        backend.py:291-310), used to clean time-derivative artifacts."""
        end_ts = [0]
        remaining = np.linspace(
            0,
            self._tot_duration,
            int(self._sampling_rate * (self._tot_duration + 1)),
        ).astype(int)
        for cs in self.samples_obj.channel_samples.values():
            for sl in cs.slots:
                pos = int(np.searchsorted(remaining, sl.tf, side="left"))
                end_ts += [pos - 1, pos]
        return sorted(end_ts)

    def set_evaluation_times(self, value: Union[str, float, Any]) -> None:
        self._njit_cache.clear()
        h = self._hamiltonian
        if isinstance(value, str):
            if value == "Full":
                eval_times = np.asarray(jax.device_get(h.sampling_times))
            elif value == "Minimal":
                eval_times = np.array([])
            else:
                raise ValueError(
                    "Wrong evaluation time label. It should be `Full`, "
                    "`Minimal`, an array of times or a float between 0 and 1."
                )
        elif isinstance(value, float):
            if value > 1 or value <= 0:
                raise ValueError(
                    "evaluation_times float must be between 0 and 1."
                )
            st = np.asarray(jax.device_get(h.sampling_times))
            indices = np.linspace(
                0, len(st) - 1, int(value * len(st))
            ).astype(int)
            eval_times = st[indices]
        elif isinstance(value, (list, tuple, np.ndarray, jax.Array)):
            arr = np.asarray(jax.device_get(jnp.asarray(value)))
            if arr.size and arr.max() > self._tot_duration / 1000:
                raise ValueError(
                    "Provided evaluation-time list extends further than "
                    "sequence duration."
                )
            if arr.size and arr.min() < 0:
                raise ValueError(
                    "Provided evaluation-time list contains negative values."
                )
            eval_times = arr
        else:
            raise ValueError(
                "Wrong evaluation time label. It should be `Full`, "
                "`Minimal`, an array of times or a float between 0 and 1."
            )
        full = np.unique(
            np.concatenate(
                [eval_times, np.array([0.0, self._tot_duration / 1000])]
            )
        )
        self._eval_times_array = full  # numpy: grid structure stays static
        self._eval_times_instruction = value

    # ------------------------------------------------------------------
    # operators / hamiltonian introspection
    # ------------------------------------------------------------------
    def build_operator(self, operations: Union[list, tuple]) -> Cplx:
        return self._hamiltonian.build_operator(operations)

    def get_hamiltonian(self, time: float) -> Cplx:
        """Dense H at `time` (ns) — reference backend.py:401-427."""
        if time > self._tot_duration:
            raise ValueError(
                f"Provided time (`time` = {time}) must be less than or "
                f"equal to the sequence duration ({self._tot_duration})."
            )
        if time < 0:
            raise ValueError(
                f"Provided time (`time` = {time}) must be greater than or "
                "equal to 0."
            )
        return self._hamiltonian._hamiltonian(time / 1000)

    # ------------------------------------------------------------------
    # the solve
    # ------------------------------------------------------------------
    def _auto_substeps(self, options: Mapping[str, Any]) -> int:
        if "substeps" in options:
            return int(options["substeps"])
        if "max_step" in options:
            # reference-style max_step (us): enforce h_sub <= max_step
            dt_grid = 0.001 / self._sampling_rate
            return max(1, int(np.ceil(dt_grid / float(options["max_step"]))))
        # stability/accuracy heuristic: ||H|| * h_sub <= ~0.5
        try:
            hd = self._hamiltonian._ham_data
            zmax = 0.0
            for streams, parts in (
                (hd.row_streams, hd.row_parts),
                (hd.col_streams, hd.col_parts),
            ):
                s = np.asarray(jax.device_get(streams.re)) + 1j * np.asarray(
                    jax.device_get(streams.im)
                )
                p = np.asarray(jax.device_get(parts))
                pn = np.linalg.norm(p, ord=2, axis=(1, 2))
                zmax += 2 * float(np.max(np.abs(s), axis=1) @ pn) if s.size else 0.0
            dmax = float(
                np.max(np.abs(np.asarray(jax.device_get(hd.int_diag))))
            )
            if hd.kron_row is not None:
                kr = np.asarray(jax.device_get(hd.kron_row))
                kc = np.asarray(jax.device_get(hd.kron_col))
                zs = np.abs(
                    np.asarray(jax.device_get(hd.kron_streams.re))
                    + 1j * np.asarray(jax.device_get(hd.kron_streams.im))
                ).max(axis=1)
                zmax += 2 * float(
                    sum(
                        z * np.linalg.norm(r, 2) * np.linalg.norm(c, 2)
                        for z, r, c in zip(zs, kr, kc)
                    )
                )
            hnorm = zmax + dmax
            dt_grid = 0.001 / self._sampling_rate
            # DP5 is stable to |H| h ~ 3.2 on the imaginary axis and keeps
            # ~1e-9 local error at |H| h ~ 1.2 (verified against the torch
            # baseline at 1e-13 agreement)
            return max(1, int(np.ceil(hnorm * dt_grid / 1.2)))
        except Exception:
            return 1

    _PALLAS_METHODS = {"RK4_PALLAS": "RK4", "DP5_PALLAS": "DP5"}

    # Hardware-verified single-chip ceiling of the fused ADJOINT kernel:
    # at dim = 2^18 (N=18 qubits, 512x512 factors) Mosaic's register
    # allocator spills ~155 MiB past the 128 MiB/core VMEM regardless of
    # kernel scheduling (SCALING.md).  At/above this size the default
    # DP5_SE solve routes to the HBM-resident f32 XLA stepper instead —
    # same f32-accuracy class, no VMEM wall (N=18: 0.33 s vs f64's 8.3 s).
    # The FORWARD kernels (incl. the Monte-Carlo grid, which never runs
    # the adjoint inside run()) keep going one size further: N=18 forward
    # is hardware-verified at 98.5 ms (SCALING.md).
    _FUSED_DIM_CAP = 2**18
    _FUSED_FWD_DIM_CAP = 2**19
    # fused-adjoint form switch: in-kernel reverse reconstruction below,
    # HBM-checkpointed (exact stored states, no mirror pass) at/above
    _CKPT_DIM_THRESHOLD = 2**16

    def _fused_backend_ok(self) -> bool:
        from pulser_diff_tpu.ops.pallas_evolution import _NB_MAX

        return (
            jax.default_backend() != "cpu"
            and int(self._initial_state.shape[1]) <= _NB_MAX
        )

    def _fused_eligible(self, ham_data, forward_only: bool = False) -> bool:
        """Whether the fused Pallas kernel should take this solve by
        DEFAULT: any interaction kind on an accelerator backend (on CPU
        the kernel only runs interpreted, far slower than the XLA path),
        below the adjoint VMEM ceiling (_FUSED_DIM_CAP) — or the
        forward-only ceiling for paths that never differentiate (the
        noisy run() sampling batch).
        XY sequences route through the kernel's kron-pair terms; since
        round 3 the adjoint also emits kron PART-MATRIX cotangents, so
        qubit-distance gradients flow through the fused path too
        (tests/test_pallas.py::test_pallas_xy_distance_grad_end_to_end).
        Opt out with run(..., fused=False); run(fused=True) or
        DP5_PALLAS force the fused path above the default cap."""
        h = self._hamiltonian
        cap = self._FUSED_FWD_DIM_CAP if forward_only else self._FUSED_DIM_CAP
        return self._fused_backend_ok() and (h.dim ** h._size) < cap

    def _f32_xla_eligible(self) -> bool:
        """Above the fused ceiling the f32 XLA stepper is the default
        fast path on accelerators (fused=False restores f64)."""
        h = self._hamiltonian
        return (
            jax.default_backend() != "cpu"
            and (h.dim ** h._size) >= self._FUSED_DIM_CAP
        )

    def _solve_states(
        self,
        ham_data,
        draws: Optional[NoiseDraws],
        solver: str,
        substeps: int,
        krylov_dim: int,
        grid: TimeGrid,
        solver_opts: Optional[Mapping[str, Any]] = None,
    ) -> Cplx:
        """Run the appropriate solver, returning (n_eval, dim, nb) kets or
        (n_eval, dim, dim) density matrices."""
        h = self._hamiltonian
        da, db = h.dim**h._a, h.dim**h._b
        opts = dict(solver_opts or {})
        fused = opts.pop("fused", None)
        if solver == SolverType.DP5_SE and fused is not False:
            if fused is True and self._fused_backend_ok():
                # explicit opt-IN: honor it regardless of the adjoint dim
                # cap (forward-only use above the cap works — N=18 fused
                # forward is 98.5 ms; a grad above the cap fails at
                # compile with Mosaic's VMEM error rather than being
                # silently rerouted to a different numerical path)
                solver = SolverType.DP5_PALLAS
            elif self._fused_eligible(ham_data):
                # TPU default: the DP5-stage fused kernel matches the f64
                # XLA stepper to ~1e-6 (compensated f32 arithmetic) at
                # kernel speed — the reference's default solver is DP5
                # (reference backend.py:487-494).  Opt out with
                # run(..., fused=False).
                solver = SolverType.DP5_PALLAS
            elif self._f32_xla_eligible():
                # past the fused adjoint's VMEM ceiling: HBM-resident
                # f32 stepper (N=18: 0.33 s fwd+grad vs f64's 8.3 s,
                # |dv| 3.4e-6 / |dg| 1.6e-6 — SCALING.md)
                solver = SolverType.DP5_SE_F32
        if solver in (
            SolverType.DP5_SE,
            SolverType.RK4_SE,
            SolverType.KRYLOV_SE,
            SolverType.KRYLOV_SE_F32,
            SolverType.DP5_SE_ADAPTIVE,
            SolverType.DP5_SE_F32,
            SolverType.RK4_SE_F32,
        ):
            psi0 = self._initial_state  # (dim, nb)
            nb = psi0.shape[1]
            p = Cplx(
                psi0.re.T.reshape(nb, da, db), psi0.im.T.reshape(nb, da, db)
            )
            states = sesolve(
                ham_data, p, grid, solver=solver, substeps=substeps,
                krylov_dim=krylov_dim,
                **{
                    k: opts[k]
                    for k in (
                        "rtol", "atol", "max_iters", "krylov_tol",
                        "remat", "n_segments",
                    )
                    if k in opts
                },
            )  # (n_eval, nb, da, db)
            n_eval = states.re.shape[0]
            dim = da * db
            return Cplx(
                jnp.transpose(states.re.reshape(n_eval, nb, dim), (0, 2, 1)),
                jnp.transpose(states.im.reshape(n_eval, nb, dim), (0, 2, 1)),
            )
        elif solver in self._PALLAS_METHODS:
            # fused single-kernel f32 path — every evaluation-time
            # state, differentiable via the Pallas states-adjoint kernel
            from pulser_diff_tpu.ops.pallas_evolution import (
                pallas_evolve_states,
            )

            interpret = jax.default_backend() == "cpu"
            psi0 = self._initial_state
            nb = psi0.shape[1]
            dim = da * db
            p = Cplx(
                psi0.re.T.reshape(nb, da, db), psi0.im.T.reshape(nb, da, db)
            )
            # HBM-checkpointed adjoint: hardware A/B (SCALING.md round 5)
            # shows it beats the in-kernel reverse-reconstruction form at
            # the big fused sizes (N=16: 65.5 vs 70.0 ms, N=17: 130.4 vs
            # 156.1 ms — it drops the mirror-side reconstruction work),
            # while below 2^16 the extra HBM round trip buys nothing.
            # run(..., ckpt=True/False) overrides.
            ckpt = opts.get("ckpt")
            if ckpt is None:
                ckpt = dim >= self._CKPT_DIM_THRESHOLD
            states = pallas_evolve_states(
                ham_data, p, grid.refined(substeps),
                method=self._PALLAS_METHODS[solver], interpret=interpret,
                ckpt=bool(ckpt),
            )
            n_eval = states.re.shape[0]
            return Cplx(
                jnp.transpose(states.re.reshape(n_eval, nb, dim), (0, 2, 1)),
                jnp.transpose(states.im.reshape(n_eval, nb, dim), (0, 2, 1)),
            )
        elif solver in (
            SolverType.DP5_ME,
            SolverType.RK4_ME,
            SolverType.DP5_ME_F32,
            SolverType.RK4_ME_F32,
        ):
            psi0 = self._initial_state
            rho0 = Cplx(
                psi0.re @ psi0.re.T + psi0.im @ psi0.im.T,
                psi0.im @ psi0.re.T - psi0.re @ psi0.im.T,
            )
            collapse = h._collapse_ops
            return mesolve(
                ham_data, rho0, collapse, h._size, h.dim, grid,
                solver=solver, substeps=substeps,
                superop=opts.get("superop"),
                me_form=opts.get("me_form"),
            )
        raise ValueError(f"Solver {solver} not available.")

    def _wrap_coherent(
        self, states: Cplx, meas_errors: Optional[Mapping[str, float]]
    ) -> CoherentResults:
        h = self._hamiltonian
        results = []
        n_eval = states.re.shape[0]
        for i in range(n_eval):
            st = states[i]
            if st.ndim == 3 and st.shape[-1] == 1:
                st = st.reshape(st.shape[0], 1)
            results.append(
                QuantumResult(
                    tuple(h._qdict),
                    self._meas_basis,
                    st,
                    self._meas_basis == h.basis_name,
                    basis_labels=tuple(h._basis_labels),
                )
            )
        return CoherentResults(
            results,
            h._size,
            h.basis_name,
            self._eval_times_array,
            self._meas_basis,
            meas_errors,
        )

    # ------------------------------------------------------------------
    # functional gradient helpers (the JAX form of the reference's
    # time_grad / dist_grad flags, backend.py:453-460)
    # ------------------------------------------------------------------
    def expectation_fn_of_dists(self, obs, solver: str = SolverType.DP5_SE,
                                **options: Any):
        """Pure fn: distance values -> expectation trace (n_eval,).

        The returned function takes a (n_pairs,) array ordered like
        `sorted(self.qq_distance_keys)` and re-assembles the interaction
        with those inter-qubit distances (the reference's `dist_grad`
        leaves, hamiltonian.py:341-342); differentiate it with jax.grad /
        deriv_param.
        """
        from pulser_diff_tpu.cplx import as_cplx
        from pulser_diff_tpu.hamiltonian import zero_noise_draws
        from pulser_diff_tpu.ops.linalg import expect as _expect

        obs = as_cplx(obs, dtype=default_dtype())
        h = self._hamiltonian
        keys = self.qq_distance_keys
        substeps = int(options.get("substeps", self._auto_substeps(options)))
        krylov_dim = int(options.get("krylov_dim", 12))
        grid = TimeGrid.make(h.sampling_times, self._eval_times_array)
        draws = zero_noise_draws(h._size, h._count_noise_slots())

        def fn(dist_values):
            h._dist_override = dict(zip(keys, dist_values))
            try:
                hd = h.build_data(draws)
            finally:
                h._dist_override = {}
            states = self._solve_states(
                hd, None, solver, substeps, krylov_dim, grid,
                solver_opts=options,
            )
            return _expect(obs, states).re

        return fn

    @property
    def qq_distance_keys(self) -> list:
        """Pair keys 'q1-q2' in the canonical order used by
        expectation_fn_of_dists."""
        import itertools

        qids = list(self._hamiltonian._qdict)
        return [
            f"{q1}-{q2}" for q1, q2 in itertools.combinations(qids, 2)
        ]

    def expectation_fn_of_times(self, obs, solver: str = SolverType.DP5_SE,
                                **options: Any):
        """Pure fn: evaluation times -> expectation trace — feed to
        derivative.deriv_time (the reference's time_grad path)."""
        from pulser_diff_tpu.cplx import as_cplx
        from pulser_diff_tpu.ops.linalg import expect as _expect

        obs = as_cplx(obs, dtype=default_dtype())
        h = self._hamiltonian
        substeps = int(options.get("substeps", self._auto_substeps(options)))
        krylov_dim = int(options.get("krylov_dim", 12))
        grid0 = TimeGrid.make(h.sampling_times, self._eval_times_array)

        def fn(times):
            grid = grid0.with_values(times)
            # fused=False: evaluation-time gradients flow through the
            # grid's step sizes, which the fused kernel treats as
            # structural constants — the XLA path differentiates them
            states = self._solve_states(
                h._ham_data, None, solver, substeps, krylov_dim, grid,
                solver_opts={**options, "fused": False},
            )
            return _expect(obs, states).re

        return fn

    def run(
        self,
        time_grad: bool = False,
        dist_grad: bool = False,
        solver: str = SolverType.DP5_SE,
        **options: Any,
    ) -> SimulationResults:
        """Simulate the sequence (reference backend.py:430-611).

        time_grad/dist_grad are accepted for API parity; in the functional
        JAX design gradients are obtained through derivative.deriv_time /
        deriv_param or jax.grad over QuantumModel losses — running with
        these flags exposes `qq_distances` for inspection.

        Solver options (reference forwards opaque ``**options`` to
        pyqtorch, backend.py:430-451): ``substeps``/``max_step``
        (fixed-step refinement), ``krylov_dim``/``krylov_tol``,
        ``rtol``/``atol``/``max_iters`` (adaptive DP5(4)), and
        ``fused=False`` to opt out of the TPU fused-kernel default.
        """
        import warnings

        cfg_nm = self._hamiltonian.config
        noise = set(cfg_nm.noise_types)
        h = self._hamiltonian

        if time_grad:
            warnings.warn(
                "run(time_grad=True) only exposes metadata in the JAX "
                "design: gradients w.r.t. evaluation times flow through "
                "the pure function returned by expectation_fn_of_times() "
                "(see derivative.deriv_time).",
                UserWarning,
                stacklevel=2,
            )
        if dist_grad:
            warnings.warn(
                "run(dist_grad=True) only exposes qq_distances: gradients "
                "w.r.t. inter-qubit distances flow through the pure "
                "function returned by expectation_fn_of_dists().",
                UserWarning,
                stacklevel=2,
            )
            for k, v in h._dist_dict.items():
                self.dist_dict[k] = v

        meas_errors: Optional[Mapping[str, float]] = None
        if "SPAM" in noise:
            meas_errors = {
                "epsilon": cfg_nm.p_false_pos,
                "epsilon_prime": cfg_nm.p_false_neg,
            }
            if _f(cfg_nm.state_prep_error) > 0 and not self._initial_is_ground:
                raise NotImplementedError(
                    "Can't combine state preparation errors with an initial "
                    "state different from the ground."
                )

        unknown = set(options) - _RUN_OPTIONS
        if unknown:
            raise TypeError(
                f"Unknown run() option(s) {sorted(unknown)}; supported: "
                f"{sorted(_RUN_OPTIONS)}."
            )

        if noise & _LINDBLAD_NOISES and solver not in (
            SolverType.DP5_ME,
            SolverType.RK4_ME,
            SolverType.DP5_ME_F32,
            SolverType.RK4_ME_F32,
            SolverType.MCWF,
            SolverType.MCWF_F32,
        ):
            solver = SolverType.DP5_ME

        substeps = self._auto_substeps(options)
        krylov_dim = int(options.get("krylov_dim", 12))
        grid = TimeGrid.make(h.sampling_times, self._eval_times_array)

        if solver in (SolverType.MCWF, SolverType.MCWF_F32):
            return self._run_mcwf(
                solver, substeps, grid, options, meas_errors, noise, cfg_nm
            )

        # batched solves (vmapped over noise configs/draws) cannot route
        # through vmap-of-pallas (does not lower on this backend); fused
        # batches instead go through the MC kernel's run-axis grid
        fused_mc = solver in self._PALLAS_METHODS or (
            solver == SolverType.DP5_SE
            and options.get("fused", None) is not False
            # run()'s noisy batch never differentiates, so the MC kernel
            # is gated by the FORWARD VMEM ceiling, not the adjoint one
            and self._fused_eligible(h._ham_data, forward_only=True)
        )
        fused_method = self._PALLAS_METHODS.get(solver, "DP5")

        def _solve_mc_fused(hams) -> Cplx:
            """(R, ...) ham stack -> (R, n_eval, dim, nb) via the fused
            MC kernel (one launch, runs axis = kernel grid)."""
            from pulser_diff_tpu.ops.pallas_evolution import pallas_evolve_mc

            psi0 = self._initial_state
            nb = psi0.shape[1]
            da, db = h.dim**h._a, h.dim**h._b
            dim = da * db
            p = Cplx(
                psi0.re.T.reshape(nb, da, db), psi0.im.T.reshape(nb, da, db)
            )
            st = pallas_evolve_mc(
                hams, p, grid.refined(substeps), method=fused_method,
                interpret=jax.default_backend() == "cpu",
            )  # (R, n_eval, nb, da, db)
            R, n_eval = st.re.shape[:2]
            return Cplx(
                jnp.transpose(st.re.reshape(R, n_eval, nb, dim), (0, 1, 3, 2)),
                jnp.transpose(st.im.reshape(R, n_eval, nb, dim), (0, 1, 3, 2)),
            )

        def _run_solver(ham_data) -> CoherentResults:
            # ONE jitted program for the deterministic solve (cached on
            # the emulator like the noisy pipeline): a bare run() call
            # otherwise dispatches each prep op eagerly, which on the
            # remote-TPU tunnel costs ~25 ms per op.  ham_data is closed
            # over (it is the emulator's static _ham_data; any mutation
            # path clears _njit_cache).
            cache_key = (
                "det", str(solver), int(substeps), int(krylov_dim),
                tuple(sorted((k, str(v)) for k, v in options.items())),
            )
            prog = self._njit_cache.get(cache_key)
            if prog is None:
                prog = jax.jit(
                    lambda: self._solve_states(
                        ham_data, None, solver, substeps, krylov_dim,
                        grid, solver_opts=options,
                    )
                )
                self._njit_cache[cache_key] = prog
            return self._wrap_coherent(prog(), meas_errors)

        deterministic = noise <= _DETERMINISTIC_NOISES and (
            "amplitude" not in noise or _f(cfg_nm.amp_sigma) == 0.0
        )
        if deterministic:
            if "SPAM" not in noise or _f(cfg_nm.state_prep_error) == 0:
                return _run_solver(h._ham_data)
            # SPAM eta > 0: enumerate random bad-atom configurations
            eta = _f(cfg_nm.state_prep_error)
            configs = Counter(
                "".join(
                    str(int(x))
                    for x in (self._rng.random(h._size) < eta)
                )
                for _ in range(cfg_nm.runs)
            ).most_common()
            bad_stack = jnp.asarray(
                np.array(
                    [[float(c) for c in cfg] for cfg, _ in configs]
                ),
                default_dtype(),
            )
            reps = [r for _, r in configs]
            n_slots = h._count_noise_slots()

            def build_one(bad):
                draws = zero_noise_draws(h._size, n_slots)._replace(
                    bad_atoms=bad
                )
                return h.build_data(draws)

            return self._run_noisy_batch(
                build_one, bad_stack, reps, cfg_nm.samples_per_run,
                cfg_nm.runs, meas_errors, fused_mc, _solve_mc_fused,
                solver, substeps, krylov_dim, grid, options, "spam",
            )

        # stochastic path: vmapped Monte-Carlo over runs
        loop_runs = cfg_nm.runs
        n_slots = h._count_noise_slots()
        keys = jax.random.split(
            jax.random.PRNGKey(self._rng.integers(0, 2**31 - 1)), loop_runs
        )

        def build_from_key(k):
            return h.build_data(draw_noise(k, cfg_nm, h._size, n_slots))

        return self._run_noisy_batch(
            build_from_key, keys, [1] * loop_runs, cfg_nm.samples_per_run,
            cfg_nm.runs, meas_errors, fused_mc, _solve_mc_fused,
            solver, substeps, krylov_dim, grid, options, "stoch",
        )

    def _run_mcwf(
        self,
        solver: str,
        substeps: int,
        grid: TimeGrid,
        options: Mapping[str, Any],
        meas_errors: Optional[Mapping[str, float]],
        noise: set,
        cfg_nm,
    ) -> NoisyResults:
        """Quantum-jump (MCWF) trajectory path: Lindblad noise at
        STATEVECTOR cost (solvers/mcwf.py).

        The reference can only reach these channels through the full
        density matrix (ref backend.py:495-509, forced DP5_ME routing);
        the unraveling reproduces the same master equation as an average
        over R = ``n_traj`` trajectories (default ``config.runs``) whose
        drift stage math is one MXU-batched statevector solve.  Composes
        with the stochastic Hamiltonian noises (doppler / amplitude
        sigma > 0): each trajectory then draws its own Hamiltonian, and
        the per-trajectory solves are vmapped (XLA stepper — never
        vmap-of-pallas).  Bitstring sampling + SPAM detection flips run
        on device; the whole pipeline is ONE jitted program cached on
        the emulator, like the other noisy paths.
        """
        from pulser_diff_tpu.solvers.mcwf import mcsolve

        h = self._hamiltonian
        psi0 = self._initial_state  # (dim, nb)
        if psi0.shape[1] != 1:
            raise ValueError(
                "MCWF requires a single (non-batched) initial state."
            )
        n_traj = int(options.get("n_traj", cfg_nm.runs))
        drift = (
            SolverType.DP5_SE
            if solver == SolverType.MCWF
            else SolverType.DP5_SE_F32
        )
        da, db = h.dim**h._a, h.dim**h._b
        dim = da * db
        p0 = Cplx(
            psi0.re[:, 0].reshape(da, db), psi0.im[:, 0].reshape(da, db)
        )
        collapse = h._collapse_ops
        eta = _f(cfg_nm.state_prep_error)
        if eta > 0 and not self._initial_is_ground:
            raise NotImplementedError(
                "Can't combine state preparation errors with an initial "
                "state different from the ground."
            )
        if collapse.ops is not None:
            # MCWF resolves at most one jump per integration step, so the
            # per-step jump probability must stay small for the average
            # to track mesolve. Warn (host-side, concrete values) when
            # the rate bound sum_m lambda_max(L_m^+ L_m) times the step
            # exceeds 10%.
            import warnings

            lz = np.asarray(
                jax.device_get(collapse.ops.re)
            ) + 1j * np.asarray(jax.device_get(collapse.ops.im))
            q = np.einsum("mji,mjk->mik", lz.conj(), lz)
            rate_bound = float(
                sum(np.linalg.eigvalsh(qm).max() for qm in q)
            )
            t_np = np.asarray(jax.device_get(grid.times), dtype=np.float64)
            dt_max = float(np.diff(t_np).max()) / max(int(substeps), 1)
            p_step = rate_bound * dt_max
            if p_step > 0.1:
                rec = int(np.ceil(p_step / 0.05)) * max(int(substeps), 1)
                warnings.warn(
                    f"MCWF per-step jump probability bound is "
                    f"{p_step:.2f} (> 0.1): the one-jump-per-step "
                    f"resolution will bias trajectory averages away from "
                    f"the master equation. Pass run(substeps={rec}) or "
                    f"use the density-matrix solvers.",
                    UserWarning,
                    stacklevel=3,
                )
        # per-trajectory Hamiltonian draws: doppler detunings, amplitude
        # fluctuations, AND SPAM state-prep errors (each trajectory draws
        # its own bad-atom configuration — the trajectory unraveling of
        # the reference's per-run eta Counter, ref backend.py:550-561;
        # badly-prepared atoms are removed from the dynamics and detected
        # in the ground state)
        stochastic = (
            ("doppler" in noise)
            or ("amplitude" in noise and _f(cfg_nm.amp_sigma) > 0)
            or eta > 0
        )
        eps = eps_p = 0.0
        if meas_errors is not None:
            eps = _f(meas_errors["epsilon"])
            eps_p = _f(meas_errors["epsilon_prime"])
        samples_per_run = cfg_nm.samples_per_run
        n_per_run = jnp.full((n_traj,), samples_per_run, jnp.int32)
        n_max = int(samples_per_run)
        n_slots = h._count_noise_slots()

        cache_key = (
            "mcwf", str(solver), int(substeps), n_traj, stochastic,
            float(eps), float(eps_p),
            tuple(sorted((k, str(v)) for k, v in options.items())),
        )
        prog = self._njit_cache.get(cache_key)
        if prog is None:
            ham_data = h._ham_data

            def _counts(key_):
                k_h, k_mc, k_s = jax.random.split(key_, 3)
                if stochastic:
                    hams = jax.vmap(
                        lambda k: h.build_data(
                            draw_noise(k, cfg_nm, h._size, n_slots)
                        )
                    )(jax.random.split(k_h, n_traj))
                    st = jax.vmap(
                        lambda hd, kk: mcsolve(
                            hd, p0, collapse, h._size, h.dim, grid, kk,
                            1, drift, substeps,
                        ).states
                    )(hams, jax.random.split(k_mc, n_traj))
                    # (R, n_eval, 1, da, db) -> (R, n_eval, dim, 1)
                    n_eval = st.re.shape[1]
                    states = Cplx(
                        st.re.reshape(n_traj, n_eval, dim)[..., None],
                        st.im.reshape(n_traj, n_eval, dim)[..., None],
                    )
                else:
                    mc = mcsolve(
                        ham_data, p0, collapse, h._size, h.dim, grid,
                        k_mc, n_traj, drift, substeps,
                    )
                    st = mc.states  # (n_eval, R, da, db)
                    n_eval = st.re.shape[0]
                    states = Cplx(
                        jnp.transpose(
                            st.re.reshape(n_eval, n_traj, dim), (1, 0, 2)
                        )[..., None],
                        jnp.transpose(
                            st.im.reshape(n_eval, n_traj, dim), (1, 0, 2)
                        )[..., None],
                    )
                weights = self._batched_weights(states)
                return _device_sample_counts(
                    weights, n_per_run, n_max, k_s, h._size, eps, eps_p
                )

            prog = jax.jit(_counts)
            self._njit_cache[cache_key] = prog
        key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))
        counts_np = np.asarray(jax.device_get(prog(key)))
        return self._noisy_from_counts(counts_np, n_traj, samples_per_run)

    # -- noisy sampling: fully on device, one host transfer --------------
    def _batched_weights(self, states_all: Cplx) -> jax.Array:
        """Measurement bitstring probabilities for a (R, n_eval, ...) state
        batch — the vectorised form of QuantumResult._weights (result.py).

        Returns (R, n_eval, 2^n), normalised along the last axis.
        """
        h = self._hamiltonian
        n = h._size
        dim = h.dim
        full = dim**n
        re, im = states_all.re, states_all.im
        is_dm = re.ndim == 4 and re.shape[-2] == re.shape[-1] == full
        if is_dm:
            probs = jnp.abs(
                jnp.diagonal(re, axis1=-2, axis2=-1)
            )  # (R, n_eval, full)
        else:
            probs = (re**2 + im**2).reshape(re.shape[0], re.shape[1], -1)

        matching = self._meas_basis == h.basis_name
        if dim == 2:
            if matching:
                if self._meas_basis == "ground-rydberg":
                    probs = probs[..., ::-1]  # r-first ordering -> bit order
            else:
                probs = jnp.zeros_like(probs).at[..., 0].set(1.0)
            weights = probs
        elif dim in (3, 4):
            from pulser_diff_tpu.result import (
                _ONE_LABEL,
                _level_projection_matrix,
            )

            labels = list(h._basis_labels)
            one_label = _ONE_LABEL.get(self._meas_basis)
            if one_label is None or one_label not in labels:
                raise RuntimeError(
                    f"Unknown measurement basis '{self._meas_basis}' for a "
                    f"{dim}-level system."
                )
            P = jnp.asarray(
                _level_projection_matrix(n, dim, labels.index(one_label)),
                probs.dtype,
            )
            weights = jnp.einsum("ks,rts->rtk", P, probs)
        else:
            raise NotImplementedError(
                "Cannot sample systems with single-atom dimension > 4."
            )
        weights = jnp.clip(weights, 0.0, None)
        return weights / jnp.sum(weights, axis=-1, keepdims=True)

    def _run_noisy_batch(
        self,
        build_fn,
        stack: jax.Array,
        reps: list,
        samples_per_run: int,
        runs: int,
        meas_errors: Optional[Mapping[str, float]],
        fused_mc: bool,
        solve_mc_fused,
        solver,
        substeps: int,
        krylov_dim: int,
        grid,
        options: Mapping,
        tag: str,
    ) -> NoisyResults:
        """ONE compiled program for the whole noisy batch: per-run
        Hamiltonian build (from PRNG keys or bad-atom configs via
        ``build_fn``) -> batched solve (fused MC kernel, runs axis =
        Pallas grid, or vmapped XLA stepper) -> measurement weights ->
        on-device categorical sampling with SPAM detection flips.

        The jitted program is cached on the emulator (invalidated by any
        config / initial-state / eval-times mutation), so repeated
        ``run()`` calls cost ONE device dispatch instead of one per eager
        op — on the remote-TPU tunnel this is the difference between
        ~4 s and ~0.15 s per noisy run() call (bench_mc.py).  Replaces
        the reference's serial per-run host loop (ref backend.py:573-595).
        """
        h = self._hamiltonian
        n_per_run = np.asarray(reps, dtype=np.int64) * samples_per_run
        n_max = int(n_per_run.max())
        eps = eps_p = 0.0
        if meas_errors is not None:
            eps = _f(meas_errors["epsilon"])
            eps_p = _f(meas_errors["epsilon_prime"])
        cache_key = (
            tag, fused_mc, str(solver), int(substeps), int(krylov_dim),
            tuple(stack.shape), n_max, float(eps), float(eps_p),
            tuple(sorted((k, str(v)) for k, v in options.items())),
        )
        prog = self._njit_cache.get(cache_key)
        if prog is None:

            # vmapped fallback: fused=False dodges vmap-of-pallas (does
            # not lower); past the forward VMEM ceiling the per-run solve
            # still deserves the f32 stepper, not VPU-emulated f64 —
            # unless the user explicitly asked for f64 with fused=False
            fb_solver = solver
            if (
                not fused_mc
                and solver == SolverType.DP5_SE
                and options.get("fused", None) is not False
                and self._f32_xla_eligible()
            ):
                fb_solver = SolverType.DP5_SE_F32

            def _counts(stack_, n_per_run_, key_):
                hams = jax.vmap(build_fn)(stack_)
                if fused_mc:
                    states = solve_mc_fused(hams)
                else:
                    states = jax.vmap(
                        lambda hd: self._solve_states(
                            hd, None, fb_solver, substeps, krylov_dim,
                            grid, solver_opts={**options, "fused": False},
                        )
                    )(hams)
                weights = self._batched_weights(states)
                return _device_sample_counts(
                    weights, n_per_run_, n_max, key_, h._size, eps, eps_p
                )

            prog = jax.jit(_counts)
            self._njit_cache[cache_key] = prog
        key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))
        counts_np = np.asarray(
            jax.device_get(prog(stack, jnp.asarray(n_per_run, jnp.int32), key))
        )
        return self._noisy_from_counts(counts_np, runs, samples_per_run)

    def _noisy_from_counts(
        self, counts_np: np.ndarray, runs: int, samples_per_run: int
    ) -> NoisyResults:
        """Host-side Counter/NoisyResults assembly from a (n_eval, 2^n)
        integer counts array (the single device->host transfer)."""
        h = self._hamiltonian
        n = h._size
        n_eval = counts_np.shape[0]
        results = []
        for t in range(n_eval):
            nz = np.nonzero(counts_np[t])[0]
            counter = Counter(
                {
                    np.binary_repr(int(i), width=n): int(counts_np[t, i])
                    for i in nz
                }
            )
            results.append(
                SampledResult(tuple(h._qdict), self._meas_basis, counter)
            )
        return NoisyResults(
            results,
            h._size,
            h.basis_name,
            self._eval_times_array,
            runs * samples_per_run,
        )

    def _sample_noisy(
        self,
        states_all: Cplx,
        reps: list,
        samples_per_run: int,
        runs: int,
        meas_errors: Optional[Mapping[str, float]] = None,
    ) -> NoisyResults:
        """Bitstring statistics for an already-solved batch of noisy runs
        (states path; the compiled end-to-end pipeline above is the run()
        route).

        The reference samples each run serially on the host
        (backend.py:573-595, simresults.py:497-540 for the SPAM flips);
        here sampling AND the detection-error bit flips run as one batched
        device program — a single (n_eval, 2^n) counts transfer comes back.
        """
        h = self._hamiltonian
        n = h._size
        n_per_run = np.asarray(reps, dtype=np.int64) * samples_per_run
        n_max = int(n_per_run.max())
        key = jax.random.PRNGKey(int(self._rng.integers(0, 2**31 - 1)))

        weights = self._batched_weights(states_all)  # (R, n_eval, K)
        eps = eps_p = 0.0
        if meas_errors is not None:
            eps = _f(meas_errors["epsilon"])
            eps_p = _f(meas_errors["epsilon_prime"])

        counts = _device_sample_counts(
            weights,
            jnp.asarray(n_per_run, jnp.int32),
            n_max,
            key,
            n,
            eps,
            eps_p,
        )  # (n_eval, K) int
        counts_np = np.asarray(jax.device_get(counts))
        return self._noisy_from_counts(counts_np, runs, samples_per_run)

    # ------------------------------------------------------------------
    def draw(
        self,
        draw_phase_area: bool = False,
        draw_phase_shifts: bool = False,
        draw_phase_curve: bool = False,
        fig_name: str | None = None,
        kwargs_savefig: dict = {},
    ) -> None:
        """Plot the sampled amp/det(/phase) per channel (reference
        backend.py:613-649 delegates to pulser's draw_samples; here a
        native matplotlib rendering shared with Sequence.draw,
        core/drawing.py)."""
        from pulser_diff_tpu.core.drawing import draw_channel_samples

        draw_channel_samples(
            self.samples_obj.channel_samples,
            draw_phase_area=draw_phase_area,
            draw_phase_shifts=draw_phase_shifts,
            draw_phase_curve=draw_phase_curve,
            fig_name=fig_name,
            kwargs_savefig=kwargs_savefig,
        )

    # ------------------------------------------------------------------
    @classmethod
    def from_sequence(
        cls,
        sequence: Sequence,
        sampling_rate: float = 1.0,
        config: Optional[SimConfig] = None,
        evaluation_times: Union[float, str, Any] = "Full",
        with_modulation: bool = False,
    ) -> "TpuEmulator":
        """Build an emulator straight from a Sequence (reference
        backend.py:651-711)."""
        if not isinstance(sequence, Sequence):
            raise TypeError(
                "The provided sequence has to be a valid Sequence instance."
            )
        if sequence.is_parametrized() or sequence.is_register_mappable():
            raise ValueError(
                "The provided sequence needs to be built to be simulated. "
                "Call `Sequence.build()` with the necessary parameters."
            )
        if not sequence._schedule:
            raise ValueError("The provided sequence has no declared channels.")
        if all(
            not slots or slots[-1].tf == 0
            for slots in sequence._schedule.values()
        ):
            raise ValueError(
                "No instructions given for the channels in the sequence."
            )
        if with_modulation and sequence._slm_mask_targets:
            raise NotImplementedError(
                "Simulation of sequences combining an SLM mask and output "
                "modulation is not supported."
            )
        return cls(
            sample(
                sequence,
                modulation=with_modulation,
                extended_duration=sequence.get_duration(
                    include_fall_time=with_modulation
                ),
            ),
            sequence.register,
            sequence.device,
            sampling_rate,
            config,
            evaluation_times,
        )


def _f(x: Any) -> float:
    return float(np.asarray(jax.device_get(x)))


from functools import partial as _partial


@_partial(jax.jit, static_argnums=(2, 4, 5, 6))
def _device_sample_counts(
    weights: jax.Array,
    n_per_run: jax.Array,
    n_max: int,
    key: jax.Array,
    n_qubits: int,
    eps: float,
    eps_p: float,
) -> jax.Array:
    """Categorical bitstring sampling + SPAM detection flips, on device.

    weights: (R, n_eval, K) probabilities; n_per_run: (R,) sample counts
    (padded draws beyond each run's count are masked out of the bincount).
    Returns integer counts (n_eval, K) summed over runs.
    """
    R, n_eval, K = weights.shape
    logits = jnp.log(jnp.clip(weights, 1e-300, None))
    k_draw, k_flip = jax.random.split(key)
    samples = jax.random.categorical(
        k_draw, logits[:, :, None, :], axis=-1,
        shape=(R, n_eval, n_max),
    )  # int (R, n_eval, n_max)

    if eps > 0.0 or eps_p > 0.0:
        # detection errors: per-bit flip with p = eps (0->1) / eps_p (1->0)
        # (reference simresults.py:497-540 does this per-shot on the host)
        u = jax.random.uniform(
            k_flip, (R, n_eval, n_max, n_qubits), weights.dtype
        )
        bit_pos = jnp.arange(n_qubits, dtype=samples.dtype)
        bits = (samples[..., None] >> bit_pos) & 1
        p_flip = jnp.where(bits == 1, eps_p, eps)
        flips = (u < p_flip).astype(samples.dtype)
        flip_mask = jnp.sum(flips << bit_pos, axis=-1)
        samples = samples ^ flip_mask

    mask = (
        jnp.arange(n_max, dtype=jnp.int32)[None, :]
        < n_per_run[:, None]
    ).astype(jnp.float32)  # (R, n_max)

    def count_cell(s_rt, w_r):
        return jnp.bincount(s_rt, weights=w_r, length=K)

    # vmap over runs and eval times; sum the run axis
    per_cell = jax.vmap(
        lambda s_r, w_r: jax.vmap(lambda s_rt: count_cell(s_rt, w_r))(s_r)
    )(samples, mask)  # (R, n_eval, K)
    return jnp.sum(per_cell, axis=0).astype(jnp.int32)


# Reference-name alias: a drop-in for users migrating from pulser-diff.
TorchEmulator = TpuEmulator
