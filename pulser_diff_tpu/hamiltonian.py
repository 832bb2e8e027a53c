"""Time-dependent Rydberg/XY Hamiltonian assembly (TPU-native).

Functional re-design of the reference Hamiltonian builder
(/root/reference/pulser_diff/hamiltonian.py:23-548).  Instead of a Python
closure summing sparse torch tensors per solver call, the sampled sequence
is compiled once into a :class:`~pulser_diff_tpu.ops.apply.FactoredHamiltonian`
pytree: static stacks of small real part-matrices (row-group / column-group
lifts) plus complex coefficient streams, consumed by jitted solvers with a
few MXU-sized matmuls per step.

Physics preserved exactly (reference line cites):
  - amplitude coeff 0.5*amp*exp(-i*phase) on the lowering op, hermitized
    (hamiltonian.py:420-423, 537-544)
  - detuning coeff -0.5*det on the occupation projector, hermitized
    (net -det * n)   (hamiltonian.py:421-423)
  - van der Waals C6/r^6 * n_i n_j with the x2 interaction factor
    (hamiltonian.py:343, :536)
  - XY dipole C3*(1-3cos^2(theta))/r^3 flip-flop with the magnetic-field
    angle (hamiltonian.py:346-366); built hermitian (sigma+sigma- + h.c.)
  - SLM-masked, time-windowed XY interaction (hamiltonian.py:462-482)
  - basis/projector tables (hamiltonian.py:288-318)
  - noise injection: doppler detuning, amplitude damping (laser waist +
    amp_sigma), bad-atom zeroing (hamiltonian.py:170-219, 270-286)
  - collapse operators for dephasing / relaxation / depolarizing /
    eff_noise (hamiltonian.py:98-143)

Units: durations ns, times us, H in rad/us.
"""

from __future__ import annotations

import itertools
from collections import defaultdict
from functools import reduce
from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from pulser_diff_tpu.config import default_dtype
from pulser_diff_tpu.cplx import Cplx, as_cplx
from pulser_diff_tpu.core.devices import Device
from pulser_diff_tpu.core.register import QubitId
from pulser_diff_tpu.core.sampler import SequenceSamples
from pulser_diff_tpu.ops.apply import FactoredHamiltonian
from pulser_diff_tpu.ops.linalg import XMAT, YMAT, ZMAT, basis_state, kron
from pulser_diff_tpu.simconfig import (
    SUPPORTED_NOISES,
    NoiseModel,
    doppler_sigma,
)

# ----------------------------------------------------------------------
# basis tables (reference hamiltonian.py:288-318)
# ----------------------------------------------------------------------
_BASIS_TABLE = {
    "XY": (2, ["u", "d"], ["uu", "du", "ud", "dd"]),
    "ground-rydberg": (2, ["r", "g"], ["gr", "rr", "gg"]),
    "digital": (2, ["g", "h"], ["hg", "hh", "gg"]),
    "all": (3, ["r", "g", "h"], ["gr", "hg", "rr", "gg", "hh"]),
}

# operator ids per sampled basis (reference hamiltonian.py:410-416)
_OP_IDS = {
    "ground-rydberg": ("sigma_gr", "sigma_rr"),
    "digital": ("sigma_hg", "sigma_gg"),
    "XY": ("sigma_du", "sigma_uu"),
}


def _local_op_np(dim: int, basis: list[str], name: str) -> np.ndarray:
    """|b1><b2| as a dense real numpy matrix from a 'sigma_xy' name."""
    if name == "I":
        return np.eye(dim)
    assert name.startswith("sigma_")
    b1, b2 = name[6], name[7]
    m = np.zeros((dim, dim))
    m[basis.index(b1), basis.index(b2)] = 1.0
    return m


class CollapseOps(NamedTuple):
    """Structured single-site collapse operators: site index + local op."""

    sites: tuple[int, ...]  # static
    ops: Optional[Cplx]  # (M, d, d); already sqrt(rate)-scaled


class NoiseDraws(NamedTuple):
    """Random draws for one stochastic run (traceable pytree)."""

    bad_atoms: jax.Array  # (n,) float 0/1
    doppler: jax.Array  # (n,) rad/us
    amp_factors: jax.Array  # (n_slots_total,) >= 0


def zero_noise_draws(n_qubits: int, n_slots: int) -> NoiseDraws:
    dt = default_dtype()
    return NoiseDraws(
        bad_atoms=jnp.zeros((n_qubits,), dt),
        doppler=jnp.zeros((n_qubits,), dt),
        amp_factors=jnp.ones((max(n_slots, 1),), dt),
    )


def draw_noise(
    key: jax.Array, config: NoiseModel, n_qubits: int, n_slots: int
) -> NoiseDraws:
    """Sample the per-run random noise (reference hamiltonian.py:270-286
    and the per-slot amplitude draw at :189), as a pure function of a PRNG
    key — this is what lets the stochastic runs loop become a vmap."""
    dt = default_dtype()
    k1, k2, k3 = jax.random.split(key, 3)
    draws = zero_noise_draws(n_qubits, n_slots)
    if "SPAM" in config.noise_types:
        bad = (
            jax.random.uniform(k1, (n_qubits,), dt)
            < jnp.asarray(config.state_prep_error, dt)
        ).astype(dt)
        draws = draws._replace(bad_atoms=bad)
    if "doppler" in config.noise_types:
        temp_k = jnp.asarray(config.temperature, dt) * 1e-6  # uK -> K
        draws = draws._replace(
            doppler=doppler_sigma(temp_k)
            * jax.random.normal(k2, (n_qubits,), dt)
        )
    if "amplitude" in config.noise_types:
        draws = draws._replace(
            amp_factors=jnp.clip(
                1.0
                + jnp.asarray(config.amp_sigma, dt)
                * jax.random.normal(k3, (max(n_slots, 1),), dt),
                0.0,
                None,
            )
        )
    return draws


class Hamiltonian:
    """Builds and holds the factorized Hamiltonian for a sampled sequence.

    Stateful wrapper mirroring the reference class API
    (/root/reference/pulser_diff/hamiltonian.py:23); the heavy lifting is in
    the pure builder methods so that noisy vmapped runs can re-build the
    traced parts from fresh :class:`NoiseDraws` without Python-side state.
    """

    def __init__(
        self,
        samples_obj: SequenceSamples,
        qdict: dict[QubitId, jax.Array],
        device: Device,
        sampling_rate: float,
        config: NoiseModel,
    ) -> None:
        self.samples_obj = samples_obj
        self._qdict = {k: jnp.asarray(v, default_dtype()) for k, v in qdict.items()}
        self._device = device
        self._sampling_rate = sampling_rate

        self._bad_atoms: dict[QubitId, bool] = {}
        self._doppler_detune: dict[QubitId, float] = {}
        self._dist_dict: dict[str, jax.Array] = {}
        self._dist_override: dict[str, jax.Array] = {}

        self._interaction = "XY" if samples_obj._in_xy else "ising"
        self._size = len(self._qdict)
        self._qid_index = {qid: i for i, qid in enumerate(self._qdict)}

        self._duration = samples_obj.max_duration
        # host-side numpy: grid structure must stay concrete under jit
        self.sampling_times = (
            np.arange(self._duration, dtype=np.float64)[
                self._subsample_indices(self._duration)
            ]
            / 1000
        )

        # row/column split of the qubit index (TPU factorization)
        self._a = self._size // 2
        self._b = self._size - self._a

        self.operators: dict[str, Any] = {
            addr: defaultdict(dict) for addr in ["Global", "Local"]
        }
        self._collapse_ops: CollapseOps = CollapseOps((), None)
        self._np_rng = np.random.default_rng()

        self.set_config(config)

    # ------------------------------------------------------------------
    # sampling-rate machinery (reference hamiltonian.py:83-91)
    # ------------------------------------------------------------------
    def _subsample_indices(self, length: int) -> np.ndarray:
        n_keep = int(self._sampling_rate * self._duration)
        return np.linspace(0, length - 1, n_keep).astype(int)

    def _adapt_to_sampling_rate(self, arr: jax.Array) -> jax.Array:
        return arr[self._subsample_indices(arr.shape[0])]

    # ------------------------------------------------------------------
    @property
    def config(self) -> NoiseModel:
        return self._config

    def set_config(self, cfg: NoiseModel) -> None:
        if not isinstance(cfg, NoiseModel):
            raise ValueError(f"Object {cfg} is not a valid `NoiseModel`.")
        not_supported = set(cfg.noise_types) - SUPPORTED_NOISES[self._interaction]
        if not_supported:
            raise NotImplementedError(
                f"Interaction mode '{self._interaction}' does not support "
                f"simulation of noise types: {', '.join(not_supported)}."
            )
        want_leak = "leakage" in cfg.noise_types
        if not hasattr(self, "basis_name") or want_leak != self._with_leakage:
            self._build_basis_and_op_matrices(with_leakage=want_leak)
        self._build_collapse_operators(cfg)
        self._config = cfg
        self._construct_hamiltonian()

    # ------------------------------------------------------------------
    # basis / operator tables
    # ------------------------------------------------------------------
    def _build_basis_and_op_matrices(self, with_leakage: bool = False) -> None:
        if self._interaction == "XY":
            self.basis_name = "XY"
        else:
            used = self.samples_obj.used_bases
            if "digital" not in used:
                self.basis_name = "ground-rydberg"
            elif "ground-rydberg" not in used:
                self.basis_name = "digital"
            else:
                self.basis_name = "all"
        dim, basis, projectors = _BASIS_TABLE[self.basis_name]
        self._with_leakage = with_leakage
        if with_leakage:
            # leakage noise: one extra (dark, undriven) level |x> per
            # qudit; collapse operators may couple into it.  Equivalent of
            # pulser-simulation's "<basis>_with_error" bases — the
            # reference threads the flag through its NoiseModel
            # (reference simconfig.py:77,131) and delegates the physics
            # to pulser-simulation; here it is native.
            dim += 1
            basis = basis + ["x"]
            projectors = [
                b1 + b2 for b1 in basis for b2 in basis
            ]
        self.dim = dim
        self._basis_labels = basis
        self.basis = {b: basis_state(dim, i) for i, b in enumerate(basis)}
        self.op_matrix: dict[str, Cplx] = {
            "I": as_cplx(np.eye(dim), dtype=default_dtype())
        }
        for proj in projectors:
            self.op_matrix["sigma_" + proj] = as_cplx(
                _local_op_np(dim, basis, "sigma_" + proj), dtype=default_dtype()
            )

    # ------------------------------------------------------------------
    # collapse operators (reference hamiltonian.py:98-143)
    # ------------------------------------------------------------------
    def _build_collapse_operators(self, config: NoiseModel) -> None:
        def basis_check(noise_type: str) -> None:
            if self.basis_name == "all":
                raise NotImplementedError(
                    f"Cannot include {noise_type} noise in all-basis."
                )

        dt = default_dtype()

        def _embed2(op2: Cplx) -> Cplx:
            """Lift a 2x2 operator to self.dim (leakage level untouched)."""
            if self.dim == 2:
                return op2
            re = jnp.zeros((self.dim, self.dim), dt).at[:2, :2].set(op2.re)
            im = jnp.zeros((self.dim, self.dim), dt).at[:2, :2].set(op2.im)
            return Cplx(re, im)

        local_ops: list[Cplx] = []
        if "dephasing" in config.noise_types:
            basis_check("dephasing")
            rate = (
                config.hyperfine_dephasing_rate
                if self.basis_name == "digital"
                else config.dephasing_rate
            )
            local_ops.append(
                _embed2(ZMAT) * jnp.sqrt(jnp.asarray(rate, dt) / 2)
            )
        if "relaxation" in config.noise_types:
            if "sigma_gr" not in self.op_matrix:
                raise ValueError(
                    "'relaxation' noise requires addressing of the "
                    "'ground-rydberg' basis."
                )
            local_ops.append(
                self.op_matrix["sigma_gr"]
                * jnp.sqrt(jnp.asarray(config.relaxation_rate, dt))
            )
        if "depolarizing" in config.noise_types:
            basis_check("depolarizing")
            coeff = jnp.sqrt(jnp.asarray(config.depolarizing_rate, dt) / 4)
            local_ops += [
                _embed2(XMAT) * coeff,
                _embed2(YMAT) * coeff,
                _embed2(ZMAT) * coeff,
            ]
        if "eff_noise" in config.noise_types:
            basis_check("effective")
            for rate, op in zip(config.eff_noise_rates, config.eff_noise_opers):
                op_c = as_cplx(op, dtype=dt)
                if op_c.shape != (self.dim, self.dim):
                    raise ValueError(
                        f"Incompatible shape {op_c.shape} of effective "
                        f"noise operator: expected ({self.dim}, "
                        f"{self.dim}) for basis '{self.basis_name}'"
                        + (" with leakage" if self._with_leakage else "")
                        + "."
                    )
                local_ops.append(
                    op_c * jnp.sqrt(jnp.asarray(rate, dt))
                )

        if not local_ops:
            self._collapse_ops = CollapseOps((), None)
            return
        sites = []
        mats_re, mats_im = [], []
        for op in local_ops:
            for qid, idx in self._qid_index.items():
                sites.append(idx)
                mats_re.append(op.re)
                mats_im.append(op.im)
        self._collapse_ops = CollapseOps(
            tuple(sites),
            Cplx(jnp.stack(mats_re), jnp.stack(mats_im)),
        )

    # ------------------------------------------------------------------
    # public operator builder (reference hamiltonian.py:221-268)
    # ------------------------------------------------------------------
    def build_operator(self, operations: Union[list, tuple]) -> Cplx:
        """Dense lifted operator from [(op_or_name, qubits), ...];
        ``(op, 'global')`` sums over all qubits."""
        if not isinstance(operations, list):
            operations = [operations]
        op_list = [self.op_matrix["I"] for _ in range(self._size)]
        for operator, qubits in operations:
            if qubits == "global":
                total = None
                for q_id in self._qdict:
                    term = self.build_operator([(operator, [q_id])])
                    total = term if total is None else total + term
                return total
            qubits_set = set(qubits)
            if len(qubits_set) < len(qubits):
                raise ValueError("Duplicate atom ids in argument list.")
            if not qubits_set.issubset(self._qdict.keys()):
                raise ValueError(
                    f"Invalid qubit names: {qubits_set - self._qdict.keys()}"
                )
            if isinstance(operator, str):
                if operator not in self.op_matrix:
                    raise ValueError(f"{operator} is not a valid operator")
                operator = self.op_matrix[operator]
            else:
                operator = as_cplx(operator, dtype=default_dtype())
            for qubit in qubits:
                op_list[self._qid_index[qubit]] = operator
        return kron(*op_list)

    # ------------------------------------------------------------------
    # distances & interaction weights (differentiable)
    # ------------------------------------------------------------------
    def _pair_distance(self, q1: QubitId, q2: QubitId) -> jax.Array:
        keyname = f"{q1}-{q2}"
        if keyname in self._dist_override:
            return self._dist_override[keyname]
        return jnp.linalg.norm(self._qdict[q1] - self._qdict[q2])

    def _interaction_weights(self, good: jax.Array) -> jax.Array:
        """(n, n) upper-triangular pair weights W_ij (rad/us), zeroed for
        bad atoms.  ising: C6/r^6.  XY: C3 (1-3cos^2 theta)/r^3.

        Fully vectorised over qubit pairs: the O(n^2) per-pair Python loop
        emitted ~8 XLA ops per pair (530 sequential tiny fusions at n=12)
        and dominated the jitted Hamiltonian-build wall-clock on TPU.
        Per-pair scalars still land in `_dist_dict` (as gathers of the
        distance matrix — dead-code-eliminated when unused) and
        `_dist_override` entries are scattered in with one update."""
        n = self._size
        dt = default_dtype()
        qids = list(self._qdict)
        coords = jnp.stack([self._qdict[q] for q in qids]).astype(dt)
        diff = coords[:, None, :] - coords[None, :, :]  # (n, n, dim)
        d2 = jnp.sum(diff * diff, axis=-1)
        # grad-safe diagonal only: sqrt'(0) is inf, and the diagonal is
        # masked out below; coincident off-diagonal atoms still produce
        # inf exactly like the per-pair norm did
        eye = np.eye(n, dtype=bool)
        dist = jnp.sqrt(jnp.where(eye, 1.0, d2))

        if self._dist_override:
            ii, jj, vals = [], [], []
            for i in range(n):
                for j in range(i + 1, n):
                    key = f"{qids[i]}-{qids[j]}"
                    if key in self._dist_override:
                        ii.append(i)
                        jj.append(j)
                        vals.append(
                            jnp.asarray(self._dist_override[key], dt)
                        )
            if vals:
                dist = dist.at[jnp.asarray(ii), jnp.asarray(jj)].set(
                    jnp.stack(vals)
                )

        for i in range(n):
            for j in range(i + 1, n):
                self._dist_dict[f"{qids[i]}-{qids[j]}"] = dist[i, j]

        if self._interaction == "ising":
            w = self._device.interaction_coeff / dist**6
        else:
            coords_dim = coords.shape[-1]
            mag = jnp.asarray(
                self.samples_obj._magnetic_field[:coords_dim], dt
            )
            mag_norm = jnp.linalg.norm(mag)
            # double-where: a plain where still propagates the
            # unselected branch's NaN through the GRADIENT when
            # mag_norm == 0 (the default out-of-plane field),
            # poisoning every distance/coordinate gradient
            degenerate = mag_norm < 1e-8
            safe_denom = jnp.where(degenerate, 1.0, dist * mag_norm)
            cosine = jnp.where(
                degenerate, 0.0, (diff @ mag) / safe_denom
            )
            w = (
                self._device.interaction_coeff_xy
                * (1 - 3 * cosine**2)
                / dist**3
            )
        tri = jnp.asarray(np.triu(np.ones((n, n)), k=1), dt)
        return w * tri * (good[:, None] * good[None, :])

    # ------------------------------------------------------------------
    # noise update (host-side, reference hamiltonian.py:270-286)
    # ------------------------------------------------------------------
    def _count_noise_slots(self) -> int:
        return sum(
            len(cs.slots) for cs in self.samples_obj.channel_samples.values()
        )

    def _update_noise(self) -> NoiseDraws:
        key = jax.random.PRNGKey(self._np_rng.integers(0, 2**31 - 1))
        draws = draw_noise(
            key, self._config, self._size, self._count_noise_slots()
        )
        if not (
            "SPAM" in self._config.noise_types
            and _host_float(self._config.state_prep_error) > 0
        ):
            draws = draws._replace(bad_atoms=jnp.zeros_like(draws.bad_atoms))
        try:  # host-side bookkeeping; skipped for traced draws
            self._bad_atoms = {
                qid: bool(b)
                for qid, b in zip(
                    self._qid_index,
                    np.asarray(jax.device_get(draws.bad_atoms)) > 0.5,
                )
            }
            self._doppler_detune = {
                qid: float(v)
                for qid, v in zip(
                    self._qid_index,
                    np.asarray(jax.device_get(draws.doppler)),
                )
            }
        except Exception:
            pass
        return draws

    # ------------------------------------------------------------------
    # sample extraction with noise (reference hamiltonian.py:170-219)
    # ------------------------------------------------------------------
    def _extract_samples(self, draws: NoiseDraws) -> dict:
        cfg = self._config
        local_noises = True
        if set(cfg.noise_types).issubset(
            {"dephasing", "relaxation", "SPAM", "depolarizing", "eff_noise"}
        ):
            local_noises = (
                "SPAM" in cfg.noise_types
                and _host_float(cfg.state_prep_error) > 0
            )
        samples = self.samples_obj.to_nested_dict(all_local=local_noises)
        dt = default_dtype()
        T = self.samples_obj.max_duration

        if local_noises:
            slot_idx = 0
            for ch, cs in self.samples_obj.channel_samples.items():
                is_global = cs.addressing == "Global"
                basis = cs.basis
                sdict = samples["Local"].get(basis, {})
                for slot in cs.slots:
                    win = np.zeros(T, dtype=bool)
                    win[slot.ti : slot.tf] = True
                    if slot.tf == T - 1:
                        # the +1 hold sample extends the final slot
                        win[slot.tf] = True
                    winj = jnp.asarray(win)
                    amp_base = draws.amp_factors[slot_idx]
                    for qid in slot.targets:
                        if qid not in sdict:
                            continue
                        i = self._qid_index[qid]
                        if "doppler" in cfg.noise_types:
                            sdict[qid]["det"] = jnp.where(
                                winj,
                                sdict[qid]["det"] + draws.doppler[i],
                                sdict[qid]["det"],
                            )
                        if "amplitude" in cfg.noise_types and is_global:
                            amp_fraction = jnp.asarray(1.0, dt)
                            if cfg.laser_waist is not None:
                                r = jnp.linalg.norm(self._qdict[qid])
                                w0 = jnp.asarray(cfg.laser_waist, dt)
                                amp_fraction = jnp.exp(-((r / w0) ** 2))
                            noise_amp = amp_base * amp_fraction
                            sdict[qid]["amp"] = jnp.where(
                                winj,
                                sdict[qid]["amp"] * noise_amp,
                                sdict[qid]["amp"],
                            )
                    slot_idx += 1
            # bad atoms: zero every local stream of badly prepared qubits
            for basis in samples["Local"]:
                for qid, qs in samples["Local"][basis].items():
                    goodf = 1.0 - draws.bad_atoms[self._qid_index[qid]]
                    qs["amp"] = qs["amp"] * goodf
                    qs["det"] = qs["det"] * goodf
                    qs["phase"] = qs["phase"] * goodf
        return samples

    # ------------------------------------------------------------------
    # the main builder
    # ------------------------------------------------------------------
    def _construct_hamiltonian(
        self, update: bool = True, draws: Optional[NoiseDraws] = None
    ) -> None:
        if draws is None:
            if update:
                draws = self._update_noise()
            else:
                draws = zero_noise_draws(self._size, self._count_noise_slots())
                draws = draws._replace(
                    bad_atoms=jnp.asarray(
                        [
                            float(self._bad_atoms.get(q, False))
                            for q in self._qid_index
                        ],
                        default_dtype(),
                    ),
                    doppler=jnp.asarray(
                        [
                            self._doppler_detune.get(q, 0.0)
                            for q in self._qid_index
                        ],
                        default_dtype(),
                    ),
                )
        self._ham_data = self.build_data(draws)

    def build_data(self, draws: NoiseDraws) -> FactoredHamiltonian:
        """Pure(ish) builder: nested samples + draws -> FactoredHamiltonian."""
        samples = self._extract_samples(draws)
        self.samples = samples
        dt = default_dtype()
        n, d, a, b = self._size, self.dim, self._a, self._b
        da, db = d**a, d**b
        good = 1.0 - draws.bad_atoms

        # --- time-dependent single-site terms -> row/col parts ---------
        row_parts, col_parts = [], []
        row_streams, col_streams = [], []

        def _lift_group(op: np.ndarray, sites: list[int], group: str) -> np.ndarray:
            g = a if group == "row" else b
            out = np.zeros((d**g, d**g))
            for s_ in sites:
                loc = s_ if group == "row" else s_ - a
                out += np.kron(
                    np.kron(np.eye(d**loc), op), np.eye(d ** (g - loc - 1))
                )
            return out

        def add_term(op_name: str, sites: list[int], amp_stream: Cplx | None,
                     det_stream: jax.Array | None, det_op_name: str) -> None:
            """One (amp, det) stream pair acting on ``sites``."""
            op_np = _local_op_np(d, self._basis_labels, op_name)
            det_np = _local_op_np(d, self._basis_labels, det_op_name)
            rsites = [s_ for s_ in sites if s_ < a]
            csites = [s_ for s_ in sites if s_ >= a]
            if amp_stream is not None:
                if rsites:
                    row_parts.append(_lift_group(op_np, rsites, "row"))
                    row_streams.append(amp_stream)
                if csites:
                    col_parts.append(_lift_group(op_np, csites, "col"))
                    col_streams.append(amp_stream)
            if det_stream is not None:
                zs = Cplx(det_stream, jnp.zeros_like(det_stream))
                if rsites:
                    row_parts.append(_lift_group(det_np, rsites, "row"))
                    row_streams.append(zs)
                if csites:
                    col_parts.append(_lift_group(det_np, csites, "col"))
                    col_streams.append(zs)

        def _coeffs(qty: dict) -> tuple[Cplx | None, jax.Array | None]:
            amp, det, phase = qty["amp"], qty["det"], qty["phase"]
            amp_stream = None
            det_stream = None
            if _maybe_nonzero(amp):
                half = 0.5 * amp
                amp_stream = Cplx(
                    half * jnp.cos(phase), -half * jnp.sin(phase)
                )
                amp_stream = Cplx(
                    self._adapt_to_sampling_rate(amp_stream.re),
                    self._adapt_to_sampling_rate(amp_stream.im),
                )
            if _maybe_nonzero(det):
                det_stream = self._adapt_to_sampling_rate(-0.5 * det)
            return amp_stream, det_stream

        for addr in samples:
            for basis_key in samples[addr]:
                if not samples[addr][basis_key]:
                    continue
                amp_op, det_op = _OP_IDS[basis_key]
                if addr == "Global":
                    amp_s, det_s = _coeffs(samples[addr][basis_key])
                    add_term(amp_op, list(range(n)), amp_s, det_s, det_op)
                else:
                    for qid, qty in samples[addr][basis_key].items():
                        amp_s, det_s = _coeffs(qty)
                        if amp_s is None and det_s is None:
                            continue
                        add_term(
                            amp_op, [self._qid_index[qid]], amp_s, det_s, det_op
                        )

        # stream sample count & dt (reference hamiltonian.py:522-524)
        n_samples = int(self._sampling_rate * self._duration)
        sample_dt = jnp.asarray(0.001 / self._sampling_rate, dt)

        def _stack_parts(parts, streams, g):
            if not parts:
                return (
                    jnp.zeros((1, d**g if g else 1, d**g if g else 1), dt),
                    Cplx(
                        jnp.zeros((1, n_samples), dt),
                        jnp.zeros((1, n_samples), dt),
                    ),
                )
            return (
                jnp.asarray(np.stack(parts), dt),
                Cplx(
                    jnp.stack([s_.re for s_ in streams]),
                    jnp.stack([s_.im for s_ in streams]),
                ),
            )

        rp, rs = _stack_parts(row_parts, row_streams, a)
        cp, cs = _stack_parts(col_parts, col_streams, b)

        # --- interaction ------------------------------------------------
        int_diag = jnp.zeros((da, db), dt)
        kron_row: Optional[jax.Array] = None
        kron_col: Optional[jax.Array] = None
        kron_streams: Optional[Cplx] = None

        eff_size_ok = n > 1 and self.basis_name != "digital"
        if eff_size_ok:
            W = self._interaction_weights(good)
            if self._interaction == "ising":
                int_diag = self._ising_diag(W)
            else:
                kron_row, kron_col, kron_streams = self._xy_kron_terms(
                    W, n_samples
                )

        return FactoredHamiltonian(
            row_parts=rp,
            col_parts=cp,
            row_streams=rs,
            col_streams=cs,
            int_diag=int_diag,
            kron_row=kron_row,
            kron_col=kron_col,
            kron_streams=kron_streams,
            sample_dt=sample_dt,
            n_samples=n_samples,
        )

    # -- ising diagonal: sum_{i<j} W_ij n_i n_j over the (da, db) grid ----
    def _ising_diag(self, W: jax.Array) -> jax.Array:
        n, d, a, b = self._size, self.dim, self._a, self._b
        dt = default_dtype()
        # occupancy (|r><r| diagonal) per site: r is index 0 in both the
        # 'ground-rydberg' and 'all' bases (_BASIS_TABLE)
        occ_site = np.zeros((d,))
        occ_site[self._basis_labels.index("r")] = 1.0

        def occ_table(g: int) -> np.ndarray:
            # (g, d^g) table: occ of site k in group of size g
            out = np.zeros((g, d**g)) if g else np.zeros((0, 1))
            for k in range(g):
                pattern = np.ones((1,))
                pattern = np.kron(
                    np.kron(np.ones(d**k), occ_site), np.ones(d ** (g - k - 1))
                )
                out[k] = pattern
            return out

        Or = jnp.asarray(occ_table(a), dt)  # (a, da)
        Oc = jnp.asarray(occ_table(b), dt)  # (b, db)
        W_rr = W[:a, :a]
        W_cc = W[a:, a:]
        W_rc = W[:a, a:]
        diag_r = jnp.einsum("ij,ix,jx->x", W_rr, Or, Or) if a else jnp.zeros((1,), dt)
        diag_c = jnp.einsum("ij,ix,jx->x", W_cc, Oc, Oc) if b else jnp.zeros((1,), dt)
        cross = (
            jnp.einsum("ij,ix,jy->xy", W_rc, Or, Oc)
            if (a and b)
            else jnp.zeros((d**self._a, d**self._b), dt)
        )
        return diag_r[:, None] + diag_c[None, :] + cross

    # -- XY interaction as kron-pair terms (+ SLM time windowing) ---------
    def _xy_kron_terms(
        self, W: jax.Array, n_samples: int
    ) -> tuple[jax.Array, jax.Array, Cplx]:
        """Factor the XY dipole flip-flop interaction
        sum_{i<j} W_ij (sigma_ud^i sigma_du^j + h.c.)
        (reference hamiltonian.py:346-366) into kron-pair terms
        z_k(t) (R_k (x) C_k) + h.c. applied as R @ Psi @ C^T
        (ops/apply.py) — no dim x dim matrix is ever built:

          - within-row-group pairs  -> (sum_{i<j<a} W_ij s+_i s-_j, I_db)
          - within-col-group pairs  -> (I_da, sum_{a<=i<j} W_ij s+_i s-_j)
          - cross pairs, grouped by row site i -> (s+_i lift,
            sum_{j>=a} W_ij s-_j lift)

        W is traced (qubit-distance differentiable); the SLM mask
        (hamiltonian.py reference :462-482) time-windows the terms with
        on/off streams over full vs masked weight matrices.
        """
        n, d, a, b = self._size, self.dim, self._a, self._b
        da, db = d**a, d**b
        dt = default_dtype()
        sig_ud = _local_op_np(d, self._basis_labels, "sigma_ud")
        sig_du = _local_op_np(d, self._basis_labels, "sigma_du")

        def lift(op: np.ndarray, loc: int, g: int) -> np.ndarray:
            return np.kron(
                np.kron(np.eye(d**loc), op), np.eye(d ** (g - loc - 1))
            )

        # static lift stacks
        ud_row = np.stack([lift(sig_ud, i, a) for i in range(a)]) if a else None
        du_row = np.stack([lift(sig_du, i, a) for i in range(a)]) if a else None
        ud_col = np.stack([lift(sig_ud, j, b) for j in range(b)]) if b else None
        du_col = np.stack([lift(sig_du, j, b) for j in range(b)]) if b else None
        eye_a = jnp.eye(da, dtype=dt)
        eye_b = jnp.eye(db, dtype=dt)

        masked_q = {
            self._qid_index[q] for q in self.samples_obj._slm_mask.targets
        }
        unmask = np.ones(n)
        for q in masked_q:
            unmask[q] = 0.0

        def build_set(Wset: jax.Array) -> tuple[list, list]:
            rows, cols = [], []
            # within-row pairs: sum_{i<j<a} W_ij (s+_i s-_j lifted)
            if a >= 2:
                m = jnp.zeros((da, da), dt)
                for i in range(a):
                    for j in range(i + 1, a):
                        pm = jnp.asarray(ud_row[i] @ du_row[j], dt)
                        m = m + Wset[i, j] * pm
                rows.append(m)
                cols.append(eye_b)
            # within-col pairs
            if b >= 2:
                m = jnp.zeros((db, db), dt)
                for i in range(b):
                    for j in range(i + 1, b):
                        pm = jnp.asarray(ud_col[i] @ du_col[j], dt)
                        m = m + Wset[a + i, a + j] * pm
                rows.append(eye_a)
                cols.append(m)
            # cross pairs grouped by row site
            if a and b:
                du_col_j = jnp.asarray(du_col, dt)  # (b, db, db)
                for i in range(a):
                    ct = jnp.einsum("j,jcd->cd", Wset[i, a:], du_col_j)
                    rows.append(jnp.asarray(ud_row[i], dt))
                    cols.append(ct)
            return rows, cols

        mask_end = self.samples_obj._slm_mask.end
        if mask_end > 0:
            W_masked = W * jnp.asarray(np.outer(unmask, unmask), dt)
            coeff = np.ones(self._duration - 1)
            coeff[:mask_end] = 0.0
            on = self._adapt_to_sampling_rate(jnp.asarray(coeff, dt))
            on = on[:n_samples]
            off = 1.0 - on
            rows_f, cols_f = build_set(W)
            rows_m, cols_m = build_set(W_masked)
            rows = rows_f + rows_m
            cols = cols_f + cols_m
            streams_re = [on] * len(rows_f) + [off] * len(rows_m)
        else:
            rows, cols = build_set(W)
            streams_re = [jnp.ones((n_samples,), dt)] * len(rows)

        kr = jnp.stack(rows)
        kc = jnp.stack(cols)
        zs = jnp.stack(streams_re)
        return kr, kc, Cplx(zs, jnp.zeros_like(zs))

    # ------------------------------------------------------------------
    # dense H(t) for introspection (reference hamiltonian.py:499-548)
    # ------------------------------------------------------------------
    @property
    def _hamiltonian(self) -> Callable[[Any], Cplx]:
        from pulser_diff_tpu.ops.apply import h_matrix

        def H_t(t: Any) -> Cplx:
            return h_matrix(self._ham_data, jnp.asarray(t, default_dtype()))

        return H_t


def _host_float(x: Any) -> float:
    if isinstance(x, jax.core.Tracer):
        return 1.0  # conservatively nonzero under tracing
    return float(np.asarray(jax.device_get(x)))


def _maybe_nonzero(arr: jax.Array) -> bool:
    """True unless the (concrete) array is provably all-zero; traced arrays
    conservatively count as nonzero."""
    if isinstance(arr, jax.core.Tracer):
        return True
    return bool(np.any(np.asarray(jax.device_get(arr)) != 0))
