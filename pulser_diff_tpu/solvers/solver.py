"""Time-evolution solvers: Schrodinger (sesolve) and Lindblad (mesolve).

TPU-native replacement for pyqtorch's sesolve/mesolve used by the
reference (/root/reference/pulser_diff/backend.py:20-21, :485-509).
Design choices vs the reference:

  - Fixed-step integration on the (static-shape) merged grid of
    Hamiltonian sampling times and requested evaluation times, inside a
    single jitted ``lax.scan`` — no data-dependent control flow, so XLA
    compiles the whole evolution into one on-device loop.  The reference's
    adaptive DP5 makes host-side step decisions per step.
  - Solvers: "DP5_SE" (Dormand-Prince 5th-order stepper), "RK4_SE",
    "KRYLOV_SE" (Lanczos expm-multiply), "DP5_ME" / "RK4_ME" (Lindblad).
  - The step function is wrapped in ``jax.checkpoint``: reverse-mode
    differentiation stores one state per step and rematerialises the
    stage math, replacing torch's full autograd graph over all stages
    (the main memory cost called out in SURVEY.md §5).
  - Evaluation-time states are written into a preallocated output buffer
    with ``.at[slot].set`` (drop-mode) — memory stays
    O(n_eval * state + n_steps * state).

Gradients w.r.t. evaluation times (the reference's ``time_grad``,
backend.py:453-455) come for free: the grid *values* are traced while the
grid *structure* (sort permutation, write slots) is static, precomputed
host-side in :class:`TimeGrid`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pulser_diff_tpu.config import default_dtype
from pulser_diff_tpu.cplx import Cplx, cstack
from pulser_diff_tpu.hamiltonian import CollapseOps
from pulser_diff_tpu.ops.apply import (
    FactoredHamiltonian,
    apply_local_left,
    apply_local_right,
    h_apply_batched,
    interp_streams,
)


class SolverType:
    """Solver identifiers (parity with pyqtorch's SolverType enum used at
    reference backend.py:434)."""

    DP5_SE = "DP5_SE"
    KRYLOV_SE = "KRYLOV_SE"
    DP5_ME = "DP5_ME"
    RK4_SE = "RK4_SE"
    RK4_ME = "RK4_ME"
    # fused single-kernel f32 modes (ops/pallas_evolution.py): RK4 or
    # DP5 stage sets; DP5_PALLAS is the TPU default accuracy+speed path
    RK4_PALLAS = "RK4_PALLAS"
    DP5_PALLAS = "DP5_PALLAS"
    # adaptive-step DP5 with embedded 4th-order error control (the
    # reference's pyqtorch solver is adaptive); bounded lax.while_loop
    # with a continuous-adjoint custom VJP (differentiable)
    DP5_SE_ADAPTIVE = "DP5_SE_ADAPTIVE"
    # f32 XLA steppers (HBM-resident, matmuls pinned to HIGHEST
    # precision): the gradient path for states past the fused kernels'
    # single-chip VMEM ceiling (N >= 18 qubits, SCALING.md) — everything
    # the f64 stepper does at ~f32-rounding accuracy and MXU speed
    DP5_SE_F32 = "DP5_SE_F32"
    RK4_SE_F32 = "RK4_SE_F32"
    # f32 CF4-Magnus Krylov: the Lanczos recursion is matvec-dominated,
    # so f64 runs VPU-emulated — the f32 cast rides the MXU instead
    KRYLOV_SE_F32 = "KRYLOV_SE_F32"
    # f32 master-equation steppers: halve rho's memory footprint (the
    # binding constraint for 10+-atom density matrices / sharded_mesolve)
    # and run the superop/factored RHS matmuls at MXU speed
    DP5_ME_F32 = "DP5_ME_F32"
    RK4_ME_F32 = "RK4_ME_F32"
    # Monte-Carlo wavefunction (quantum-jump) unraveling of the Lindblad
    # equation: open-system dynamics at STATEVECTOR cost, trajectories
    # batched on the MXU (solvers/mcwf.py) — the scaling path past
    # mesolve's dim^2 memory wall
    MCWF = "MCWF"
    MCWF_F32 = "MCWF_F32"


@dataclass(frozen=True)
class TimeGrid:
    """Merged integration grid with static structure and traced values."""

    times: jax.Array  # (n_grid,) sorted, traced values allowed
    write_slots: np.ndarray  # (n_grid,) int: eval slot per grid point, or n_eval
    n_eval: int
    sampling_times: Optional[jax.Array] = None  # kept for with_values()
    perm: Optional[np.ndarray] = None  # static sort permutation

    @staticmethod
    def make(sampling_times: jax.Array, eval_times: jax.Array) -> "TimeGrid":
        """Build the grid host-side.  `eval_times` must be sorted & unique
        (the emulator guarantees this, reference backend.py:363-373).
        The sort permutation is computed from *concrete* values, so this
        must be called outside jit; re-bind traced evaluation times with
        :meth:`with_values` (the `time_grad` path).
        """
        s_np = np.asarray(jax.device_get(sampling_times), dtype=np.float64)
        e_np = np.asarray(jax.device_get(eval_times), dtype=np.float64)
        merged = np.concatenate([s_np, e_np])
        perm = np.argsort(merged, kind="stable")  # eval entries after equal sampling entries
        n_s = len(s_np)
        n_eval = len(e_np)
        src_slot = np.concatenate(
            [np.full(n_s, n_eval, dtype=np.int32), np.arange(n_eval, dtype=np.int32)]
        )
        write_slots = src_slot[perm]
        times = jnp.concatenate(
            [
                jnp.asarray(sampling_times, default_dtype()),
                jnp.asarray(eval_times, default_dtype()),
            ]
        )[perm]
        return TimeGrid(
            times=times,
            write_slots=write_slots,
            n_eval=n_eval,
            sampling_times=jnp.asarray(sampling_times, default_dtype()),
            perm=perm,
        )

    def refined(self, substeps: int) -> "TimeGrid":
        """Insert ``substeps - 1`` equally-spaced non-writing grid points
        into every interval — how the fused Pallas kernels honour the
        stability substep count (the XLA steppers substep inside the
        interval instead, :func:`_make_se_step`)."""
        if substeps <= 1:
            return self
        t = self.times
        n = t.shape[0]
        w = jnp.arange(1, substeps, dtype=t.dtype) / substeps
        # (n-1, substeps-1) interior points, interleaved with the grid
        interior = t[:-1, None] + (t[1:] - t[:-1])[:, None] * w[None, :]
        merged = jnp.concatenate(
            [
                jnp.concatenate(
                    [t[:-1, None], interior], axis=1
                ).reshape(-1),
                t[-1:],
            ]
        )
        slots = np.full((n - 1, substeps), self.n_eval, dtype=np.int32)
        slots[:, 0] = np.asarray(self.write_slots[:-1], np.int32)
        write_slots = np.concatenate(
            [slots.reshape(-1), np.asarray(self.write_slots[-1:], np.int32)]
        )
        return TimeGrid(
            times=merged,
            write_slots=write_slots,
            n_eval=self.n_eval,
            sampling_times=None,
            perm=None,
        )

    def with_values(self, eval_times: jax.Array) -> "TimeGrid":
        """Same static structure, traced evaluation-time *values* — the
        differentiable-time path (reference time_grad, backend.py:453).
        ``eval_times`` must stay infinitesimally close to the values the
        grid was built with (the sort permutation is fixed)."""
        if self.sampling_times is None or self.perm is None:
            raise ValueError("TimeGrid was not built by TimeGrid.make().")
        times = jnp.concatenate(
            [self.sampling_times, jnp.asarray(eval_times, default_dtype())]
        )[self.perm]
        return TimeGrid(
            times=times,
            write_slots=self.write_slots,
            n_eval=self.n_eval,
            sampling_times=self.sampling_times,
            perm=self.perm,
        )


# ----------------------------------------------------------------------
# steppers (statevector): psi is a batched Cplx (nb, da, db)
# ----------------------------------------------------------------------
# Dormand-Prince 5(4) tableau (c nodes, a coefficients, 5th-order b weights)
_DP5_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0])
_DP5_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
]
_DP5_B = np.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84])

_RK4_C = np.array([0.0, 0.5, 0.5, 1.0])
_RK4_A = [[], [0.5], [0.0, 0.5], [0.0, 0.0, 1.0]]
_RK4_B = np.array([1 / 6, 1 / 3, 1 / 3, 1 / 6])


def _se_rhs(ham: FactoredHamiltonian, t: jax.Array, psi: Cplx) -> Cplx:
    """dpsi/dt = -i H(t) psi."""
    zr, zc, zd = interp_streams(ham, t)
    return h_apply_batched(ham, zr, zc, zd, psi).mul_neg_i()


def _explicit_rk_step(rhs, t0, h, y, c_nodes, a_coeffs, b_weights):
    """Generic explicit Runge-Kutta step over Cplx pytrees.

    Tableau constants are cast to Python floats: numpy f64 scalars are
    strongly typed under x64 and would silently promote an f32 carry
    (the DP5_SE_F32/RK4_SE_F32 modes) back to f64."""
    ks = []
    for i, ci in enumerate(c_nodes):
        yi = y
        for j, aij in enumerate(a_coeffs[i]):
            if aij != 0.0:
                yi = yi + ks[j] * (float(aij) * h)
        ks.append(rhs(t0 + float(ci) * h, yi))
    out = y
    for bi, ki in zip(b_weights, ks):
        if bi != 0.0:
            out = out + ki * (float(bi) * h)
    return out


def _make_se_step(ham, solver: str, substeps: int, krylov_dim: int,
                  krylov_tol: float, rtol: float = 1e-8,
                  atol: float = 1e-10, max_iters: int = 256):
    if solver in (SolverType.DP5_SE, SolverType.RK4_SE):
        c, A, B = (
            (_DP5_C, _DP5_A, _DP5_B)
            if solver == SolverType.DP5_SE
            else (_RK4_C, _RK4_A, _RK4_B)
        )

        def step(psi: Cplx, t0, t1):
            h = (t1 - t0) / substeps
            def sub(i, p):
                return _explicit_rk_step(
                    partial(_se_rhs, ham), t0 + i * h, h, p, c, A, B
                )
            if substeps == 1:
                return sub(0, psi)
            return jax.lax.fori_loop(0, substeps, sub, psi)

        return step

    if solver == SolverType.DP5_SE_ADAPTIVE:
        return _make_se_step_adaptive(ham, substeps, rtol, atol, max_iters)

    if solver == SolverType.KRYLOV_SE:
        # 4th-order commutator-free Magnus (CF4, Blanes-Moan): two Lanczos
        # exponentials per step built from the two Gauss-point Hamiltonians.
        # Python floats (weak-typed), NOT np.float64 scalars: numpy
        # scalars are strongly typed and would promote the whole f32
        # Lanczos recursion back to f64 under KRYLOV_SE_F32
        sq3 = float(np.sqrt(3.0))
        c1, c2 = 0.5 - sq3 / 6, 0.5 + sq3 / 6
        a1, a2 = (3 - 2 * sq3) / 12, (3 + 2 * sq3) / 12

        def _mix(za: Cplx, zb: Cplx, wa: float, wb: float) -> Cplx:
            return Cplx(wa * za.re + wb * zb.re, wa * za.im + wb * zb.im)

        def _mix_opt(za, zb, wa, wb):
            if za is None or zb is None:
                return None
            return _mix(za, zb, wa, wb)

        def one(psi: Cplx, t0, t1):
            """Single batch column (1, da, db): independent Krylov
            subspace per column, but one shared integration grid — the
            batch axis is vmapped around this function so the scan over
            grid intervals runs once for the whole batch."""
            h = (t1 - t0) / substeps
            # f32 (KRYLOV_SE_F32): reverse-mode through the Lanczos
            # recursion overflows in f32 — use the continuous-adjoint
            # custom VJP; f64 keeps the exact discrete adjoint (verified
            # against DP5 gradients to 4e-5)
            cadj = psi.re.dtype == jnp.float32
            parts = _ApplyParts(
                ham.row_parts, ham.col_parts, ham.int_diag,
                ham.kron_row, ham.kron_col,
            )

            def sub(i, p):
                ts = t0 + i * h
                zr1, zc1, zd1 = interp_streams(ham, ts + c1 * h)
                zr2, zc2, zd2 = interp_streams(ham, ts + c2 * h)
                # right factor first (earlier times act first)
                for wa, wb in ((2 * a2, 2 * a1), (2 * a1, 2 * a2)):
                    zr = _mix(zr1, zr2, wa, wb)
                    zc = _mix(zc1, zc2, wa, wb)
                    zd = _mix_opt(zd1, zd2, wa, wb)
                    if cadj:
                        p = _krylov_expm_cadj(
                            krylov_dim, krylov_tol, parts, zr, zc, zd,
                            h / 2, p,
                        )
                    else:
                        apply = lambda v: h_apply_batched(ham, zr, zc, zd, v)
                        p = _krylov_expm(
                            apply, p, h / 2, krylov_dim, krylov_tol
                        )
                return p

            if substeps == 1:
                return sub(0, psi)
            return jax.lax.fori_loop(0, substeps, sub, psi)

        def step(psi: Cplx, t0, t1):
            nb = psi.re.shape[0]
            if nb == 1:
                return one(psi, t0, t1)
            return jax.vmap(
                lambda p: one(p.reshape((1,) + p.shape), t0, t1).reshape(
                    p.shape
                )
            )(psi)

        return step

    raise ValueError(f"Unknown statevector solver '{solver}'.")


# embedded 4th-order weights for the DP5 error estimate (needs the FSAL
# 7th stage k7 = f(t+h, y5))
_DP5_B4 = np.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
     187 / 2100, 1 / 40]
)


def _tree_axpy(y, k, c):
    """y + c * k over matching pytrees."""
    return jax.tree.map(lambda a, b: a + c * b, y, k)


def _adaptive_dp5_pytree(rhs, y0, span, h0, rtol, atol, max_iters):
    """Adaptive DP5(4) over an arbitrary pytree state: integrate
    dy/ds = rhs(s, y) from s=0 to s=span (span >= 0) inside a bounded
    ``lax.while_loop``.  Componentwise error scale atol + rtol*|y|,
    RMS-normed over every leaf element."""
    n_elems = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(y0)) or 1

    def cond(carry):
        s, y, h, i = carry
        return jnp.logical_and(s < span - 1e-15, i < max_iters)

    def body(carry):
        s, y, h, i = carry
        h_eff = jnp.minimum(h, span - s)
        ks = []
        for st, cs in enumerate(_DP5_C):
            yi = y
            for j, a in enumerate(_DP5_A[st]):
                if a != 0.0:
                    yi = _tree_axpy(yi, ks[j], a * h_eff)
            ks.append(rhs(s + cs * h_eff, yi))
        y5 = y
        for bi, ki in zip(_DP5_B, ks):
            if bi != 0.0:
                y5 = _tree_axpy(y5, ki, bi * h_eff)
        ks.append(rhs(s + h_eff, y5))  # FSAL 7th stage
        err = None
        b5_ext = list(_DP5_B) + [0.0]
        for b5i, b4i, ki in zip(b5_ext, _DP5_B4, ks):
            d = b5i - b4i
            if d != 0.0:
                err = (
                    jax.tree.map(lambda k_: (d * h_eff) * k_, ki)
                    if err is None
                    else _tree_axpy(err, ki, d * h_eff)
                )
        sq_sum = sum(
            jnp.sum((e / (atol + rtol * jnp.abs(yv))) ** 2)
            for e, yv in zip(jax.tree.leaves(err), jax.tree.leaves(y))
        )
        err_norm = jnp.sqrt(sq_sum / n_elems)
        accept = err_norm <= 1.0
        y_new = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), y5, y
        )
        s_new = jnp.where(accept, s + h_eff, s)
        factor = jnp.clip(
            0.9 * jnp.where(err_norm > 0, err_norm, 1e-10) ** -0.2, 0.2, 5.0
        )
        return (s_new, y_new, h_eff * factor, i + 1)

    _, y_f, _, _ = jax.lax.while_loop(
        cond, body, (span * 0.0, y0, h0, jnp.int32(0))
    )
    return y_f


def _rebuild_ham(parts, streams, n_samples: int) -> FactoredHamiltonian:
    row_parts, col_parts, sample_dt = parts
    (row_streams, col_streams, int_diag, kron_row, kron_col,
     kron_streams) = streams
    return FactoredHamiltonian(
        row_parts=row_parts,
        col_parts=col_parts,
        row_streams=row_streams,
        col_streams=col_streams,
        int_diag=int_diag,
        kron_row=kron_row,
        kron_col=kron_col,
        kron_streams=kron_streams,
        sample_dt=sample_dt,
        n_samples=n_samples,
    )


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _adaptive_evolve(cfg, parts, streams, psi: Cplx, t0, t1):
    """Adaptive DP5(4) evolution over [t0, t1] with a continuous-adjoint
    custom VJP (the reference differentiates through pyqtorch's adaptive
    DP5 by unrolled autograd, backend.py:487-494; here the backward pass
    is its own adaptive sweep over the augmented (psi, costate,
    parameter-cotangent) system — O(1) memory in the step count).

    cfg = (n_samples, rtol, atol, max_iters) static.
    Differentiable in streams (coefficients/diagonal/dense terms), psi
    and the interval endpoints; parts (operator structure) are constant.
    """
    n_samples, rtol, atol, max_iters = cfg
    ham = _rebuild_ham(parts, streams, n_samples)
    span = t1 - t0

    def rhs(s, p):
        return _se_rhs(ham, t0 + s, p)

    return _adaptive_dp5_pytree(rhs, psi, span, span, rtol, atol, max_iters)


def _adaptive_evolve_fwd(cfg, parts, streams, psi, t0, t1):
    psi1 = _adaptive_evolve(cfg, parts, streams, psi, t0, t1)
    return psi1, (parts, streams, psi1, t0, t1)


def _adaptive_evolve_bwd(cfg, res, lam1):
    n_samples, rtol, atol, max_iters = cfg
    parts, streams, psi1, t0, t1 = res
    span = t1 - t0

    def f(streams_, t, psi_):
        return _se_rhs(_rebuild_ham(parts, streams_, n_samples), t, psi_)

    def aug_rhs(s, y):
        psi_, lam, _ = y
        t = t1 - s
        f_val, pull = jax.vjp(lambda st_, p_: f(st_, t, p_), streams, psi_)
        st_bar, psi_bar = pull(lam)
        # dpsi/ds = -f;  dlam/ds = +(df/dpsi)^T lam;  dtheta/ds = +(df/dth)^T lam
        return (
            jax.tree.map(jnp.negative, f_val),
            psi_bar,
            st_bar,
        )

    hbar0 = jax.tree.map(jnp.zeros_like, streams)
    y0 = (psi1, lam1, hbar0)
    psi0, lam0, hbar = _adaptive_dp5_pytree(
        aug_rhs, y0, span, span, rtol, atol, max_iters
    )

    def inner(l: Cplx, v: Cplx):
        return jnp.sum(l.re * v.re) + jnp.sum(l.im * v.im)

    f1 = f(streams, t1, psi1)
    f0 = f(streams, t0, psi0)
    t1_bar = inner(lam1, f1)
    t0_bar = -inner(lam0, f0)
    parts_bar = jax.tree.map(jnp.zeros_like, parts)
    return (parts_bar, hbar, lam0, t0_bar, t1_bar)


_adaptive_evolve.defvjp(_adaptive_evolve_fwd, _adaptive_evolve_bwd)


def _make_se_step_adaptive(ham, substeps: int, rtol: float = 1e-8,
                           atol: float = 1e-10, max_iters: int = 256):
    """Adaptive DP5(4) per grid interval, differentiable through the
    continuous-adjoint custom VJP (:func:`_adaptive_evolve`)."""
    cfg = (int(ham.n_samples), float(rtol), float(atol), int(max_iters))
    parts = (ham.row_parts, ham.col_parts, ham.sample_dt)
    streams = (
        ham.row_streams,
        ham.col_streams,
        ham.int_diag,
        ham.kron_row,
        ham.kron_col,
        ham.kron_streams,
    )

    def step(psi: Cplx, t0, t1):
        return _adaptive_evolve(cfg, parts, streams, psi, t0, t1)

    return step


_KRYLOV_F32_REL_TOL = 3e-4  # ~5x sqrt(f32 eps): floor for beta/scale


def _krylov_expm(apply, psi: Cplx, h, m: int, tol: float = 1e-12) -> Cplx:
    """exp(-i h H) psi via an m-dimensional Lanczos subspace.

    H hermitian => real symmetric tridiagonal T; the small expm uses an
    eigendecomposition of T (m x m, on-device).  Each new Lanczos vector
    is fully reorthogonalized against all previous ones (small m, cheap;
    prevents the loss-of-orthogonality drift of the bare three-term
    recurrence).  ``tol`` is the happy-breakdown threshold: once
    ||w|| <= tol the recursion has exhausted the Krylov space and all
    later vectors/couplings are masked to zero, so exp(T) decouples from
    the garbage block instead of dividing by a denormal.

    In f32 the breakdown threshold is additionally RELATIVE to the local
    spectral scale (running max of |alpha|, beta): the Lanczos residual
    bottoms out at ~eps * ||H|| (rounding noise), which for production
    Hamiltonian scales sits far ABOVE any fixed absolute tol — near an
    eigenstate (e.g. the all-ground start of a pulse while the amplitude
    ramp is still ~0) the residual is pure f32 noise, and reverse-mode
    through q = w/||w|| amplifies cotangents by ~||H||/beta per masked-
    too-late direction: the backward sweep overflows to inf/NaN within a
    few steps (diagnosed at N=12, 120-step grids).  Masking relative to
    scale kills exactly the directions whose computed values are noise.
    f64 keeps the absolute threshold unchanged: its noise floor
    (~1e-14 * scale) sits below the 1e-12 default tol for this problem
    class, and the golden-model pins (1e-11) depend on where breakdown
    fires.

    One state per subspace: batch is handled by vmap upstream.
    """
    dt = psi.dtype
    rel_tol = _KRYLOV_F32_REL_TOL if dt == jnp.float32 else 0.0
    nrm = jnp.sqrt(jnp.sum(psi.abs2()))
    safe_nrm = jnp.where(nrm > 0, nrm, 1.0)
    q = psi * (1.0 / safe_nrm)

    # rolled Lanczos (lax.scan over the subspace index): the recursion
    # used to be a Python-unrolled double loop, whose traced graph blew
    # up reverse-mode compile times; here the full reorthogonalization is
    # ONE masked contraction against the whole basis buffer per step.
    Q_re0 = jnp.zeros((m,) + q.shape, dt).at[0].set(q.re)
    Q_im0 = jnp.zeros((m,) + q.shape, dt).at[0].set(q.im)
    state_axes = tuple(range(1, q.re.ndim + 1))

    def body(carry, j):
        Q_re, Q_im, beta_prev, alive, scale = carry
        qj = Cplx(Q_re[j], Q_im[j])
        w = apply(qj)
        alpha = jnp.sum(w.re * qj.re + w.im * qj.im)
        scale = jnp.maximum(scale, jnp.maximum(jnp.abs(alpha), beta_prev))
        w = w - qj * alpha
        jprev = jnp.maximum(j - 1, 0)
        prev = Cplx(Q_re[jprev], Q_im[jprev])
        w = w - prev * jnp.where(j > 0, beta_prev, 0.0)
        # full reorthogonalization against all built vectors (k <= j)
        mask = (jnp.arange(m) <= j).astype(dt)
        ov_re = (
            jnp.sum(Q_re * w.re, axis=state_axes)
            + jnp.sum(Q_im * w.im, axis=state_axes)
        ) * mask
        ov_im = (
            jnp.sum(Q_re * w.im, axis=state_axes)
            - jnp.sum(Q_im * w.re, axis=state_axes)
        ) * mask
        w = Cplx(
            w.re
            - jnp.tensordot(ov_re, Q_re, axes=1)
            + jnp.tensordot(ov_im, Q_im, axes=1),
            w.im
            - jnp.tensordot(ov_re, Q_im, axes=1)
            - jnp.tensordot(ov_im, Q_re, axes=1),
        )
        # happy-breakdown-safe norm: sqrt of a ~0 sum has an unbounded
        # derivative (1/(2*sqrt)), so mask BEFORE the sqrt — otherwise
        # reverse-mode produces NaN whenever the Krylov space exhausts
        # (guaranteed when m exceeds the state dimension)
        s2 = jnp.sum(w.abs2())
        thr2 = jnp.maximum(
            jnp.asarray(tol * tol, dt), (rel_tol * scale) ** 2
        )
        ok = (s2 > thr2).astype(dt)
        beta = jnp.sqrt(jnp.where(s2 > thr2, s2, 1.0)) * ok
        alive = alive * ok
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        q_next = w * (alive / safe_beta)
        jn = jnp.minimum(j + 1, m - 1)
        keep = (j + 1 < m).astype(dt)
        Q_re = Q_re.at[jn].set(
            keep * q_next.re + (1.0 - keep) * Q_re[jn]
        )
        Q_im = Q_im.at[jn].set(
            keep * q_next.im + (1.0 - keep) * Q_im[jn]
        )
        return (Q_re, Q_im, beta, alive, scale), (alpha, beta * alive)

    (Q_re, Q_im, _, _, _), (alphas, betas) = jax.lax.scan(
        body,
        (
            Q_re0,
            Q_im0,
            jnp.asarray(0.0, dt),
            jnp.asarray(1.0, dt),
            jnp.asarray(0.0, dt),
        ),
        jnp.arange(m),
    )
    qs_c = Cplx(Q_re, Q_im)
    # T: symmetric tridiagonal (alphas diag, betas[:-1] off-diag)
    T = jnp.diag(alphas) + jnp.diag(betas[:-1], 1) + jnp.diag(betas[:-1], -1)
    u_re, u_im = _expm_sym_e1(T, h)
    out_re = jnp.einsum("k,k...->...", u_re, qs_c.re) - jnp.einsum(
        "k,k...->...", u_im, qs_c.im
    )
    out_im = jnp.einsum("k,k...->...", u_re, qs_c.im) + jnp.einsum(
        "k,k...->...", u_im, qs_c.re
    )
    return Cplx(out_re, out_im) * nrm


@jax.custom_jvp
def _expm_sym_e1(T: jax.Array, h) -> tuple[jax.Array, jax.Array]:
    """(re, im) of expm(-i h T) @ e1 for small symmetric T.

    Carries a custom JVP via the Daleckii-Krein divided-difference
    formula: plain autodiff through ``eigh`` divides by eigenvalue gaps
    and produces NaN gradients whenever T's spectrum (near-)degenerates —
    which the Lanczos happy-breakdown masking makes EXACT (decoupled zero
    blocks).  The reference differentiates through pyqtorch's KRYLOV_SE
    (test_derivatives.py parametrization); this is the TPU-native
    equivalent with safe derivatives.
    """
    lam, V = jnp.linalg.eigh(T)
    phase = lam * (-h)
    v0 = V[0, :]
    return V @ (jnp.cos(phase) * v0), V @ (jnp.sin(phase) * v0)


@_expm_sym_e1.defjvp
def _expm_sym_e1_jvp(primals, tangents):
    T, h = primals
    dT, dh = tangents
    lam, V = jnp.linalg.eigh(T)
    phase = lam * (-h)
    f_re = jnp.cos(phase)
    f_im = jnp.sin(phase)
    v0 = V[0, :]
    u_re = V @ (f_re * v0)
    u_im = V @ (f_im * v0)

    # divided differences F_ij = (f(li) - f(lj)) / (li - lj), with the
    # derivative f'(l) = -i h f(l) on (near-)degenerate pairs, evaluated
    # at the midpoint (li+lj)/2 for accuracy:
    #   f'(mu) = -i h e^{-i h mu} = h sin(m) - i h cos(m),  m = -h mu
    dl = lam[:, None] - lam[None, :]
    scale = jnp.maximum(jnp.max(jnp.abs(lam)), 1.0)
    near = jnp.abs(dl) < 1e-10 * scale
    safe_dl = jnp.where(near, 1.0, dl)
    num_re = f_re[:, None] - f_re[None, :]
    num_im = f_im[:, None] - f_im[None, :]
    mid = 0.5 * (lam[:, None] + lam[None, :]) * (-h)
    F_re = jnp.where(near, h * jnp.sin(mid), num_re / safe_dl)
    F_im = jnp.where(near, -h * jnp.cos(mid), num_im / safe_dl)

    M = V.T @ dT @ V
    du_re = V @ ((F_re * M) @ v0)
    du_im = V @ ((F_im * M) @ v0)
    # dh term: d/dh e^{-i h l} = -i l e^{-i h l} -> re = l f_im, im = -l f_re
    g_re = lam * f_im
    g_im = -lam * f_re
    du_re = du_re + (V @ (g_re * v0)) * dh
    du_im = du_im + (V @ (g_im * v0)) * dh
    return (u_re, u_im), (du_re, du_im)


# ----------------------------------------------------------------------
# Continuous-adjoint Krylov exponential (the f32 gradient path)
# ----------------------------------------------------------------------
# Reverse-mode THROUGH the Lanczos recursion is numerically fragile in
# f32: near an eigenstate (e.g. the all-ground start of a pulse while the
# amplitude ramp is ~0) the early residual norms beta are small relative
# to the spectral scale, and the basis-rotation sensitivities ~1/beta
# only cancel against the matching small expm weights through the
# reorthogonalization's cross terms — a cancellation f64 carries out to
# ~1e-13 but f32 loses entirely, overflowing the backward sweep to
# inf/NaN within a few steps (diagnosed at N=12, 120-step grids: the f64
# discrete adjoint matches DP5 gradients to 4e-5 on the same problem
# while f32 hits inf).  The f32 path therefore differentiates the EXACT
# map instead of the algorithm:
#
#   cot_psi = exp(+i h H) ct                      (unitary adjoint)
#   <ct, d exp(-i h H) psi> = h * Int_0^1 Im( u(s)^H dH v(s) ) ds,
#       v(s) = exp(-i h s H) psi,  u(s) = exp(-i h s H) cot_psi
#
# with the s-integral evaluated by fixed Gauss-Legendre quadrature.  The
# bias is O(Krylov truncation error) + O(quadrature error) — both far
# below the f32 rounding floor for production step sizes.
_KRYLOV_ADJ_NODES = (0.5 - np.sqrt(15) / 10, 0.5, 0.5 + np.sqrt(15) / 10)
_KRYLOV_ADJ_WEIGHTS = (5 / 18, 4 / 9, 5 / 18)


class _ApplyParts(NamedTuple):
    """The FactoredHamiltonian fields h_apply_batched actually reads."""

    row_parts: jax.Array
    col_parts: jax.Array
    int_diag: jax.Array
    kron_row: Optional[jax.Array]
    kron_col: Optional[jax.Array]


def _apply_parts(parts: _ApplyParts, zr: Cplx, zc: Cplx,
                 zk: Optional[Cplx], v: Cplx) -> Cplx:
    return h_apply_batched(parts, zr, zc, zk, v)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _krylov_expm_cadj(
    m: int, tol: float, parts: _ApplyParts, zr: Cplx, zc: Cplx,
    zk: Optional[Cplx], h, psi: Cplx,
) -> Cplx:
    apply = lambda v: _apply_parts(parts, zr, zc, zk, v)
    return _krylov_expm(apply, psi, h, m, tol)


def _krylov_expm_cadj_fwd(m, tol, parts, zr, zc, zk, h, psi):
    out = _krylov_expm_cadj(m, tol, parts, zr, zc, zk, h, psi)
    return out, (parts, zr, zc, zk, h, psi, out)


def _krylov_expm_cadj_bwd(m, tol, res, ct):
    parts, zr, zc, zk, h, psi, out = res
    apply = lambda v: _apply_parts(parts, zr, zc, zk, v)
    # unitary adjoint: VJP w.r.t. psi of the exact map is exp(+i h H) ct
    lam = _krylov_expm(apply, ct, -h, m, tol)
    g_ops = None
    for s, wq in zip(_KRYLOV_ADJ_NODES, _KRYLOV_ADJ_WEIGHTS):
        v_s = _krylov_expm(apply, psi, h * s, m, tol)
        u_s = _krylov_expm(apply, lam, h * s, m, tol)
        _, vjp_f = jax.vjp(
            lambda p_, a_, b_, c_: _apply_parts(p_, a_, b_, c_, v_s),
            parts, zr, zc, zk,
        )
        # <ct_F, X> == wq * h * Im(u_s^H X)
        g = vjp_f(Cplx(-(wq * h) * u_s.im, (wq * h) * u_s.re))
        g_ops = g if g_ops is None else jax.tree.map(
            lambda a, b: a + b, g_ops, g
        )
    g_parts, g_zr, g_zc, g_zk = g_ops
    # d/dh exp(-i h H) psi = -i H out  ->  <ct, .> = Im(ct^H (H out))
    z = apply(out)
    g_h = jnp.sum(ct.re * z.im - ct.im * z.re)
    return (g_parts, g_zr, g_zc, g_zk, g_h, lam)


_krylov_expm_cadj.defvjp(_krylov_expm_cadj_fwd, _krylov_expm_cadj_bwd)


# ----------------------------------------------------------------------
# Lindblad RHS (mesolve)
# ----------------------------------------------------------------------
def _group_collapse(collapse: CollapseOps, n: int, d: int):
    """Group the (M, d, d) collapse-op stack by site (static structure).

    Returns a list of (site, L, Q) with L a Cplx (m, d, d) stack of the
    ops acting at that site and Q = sum_m L_m^+ L_m (d, d).  This turns
    the reference-shaped per-operator Python loop (M = n_ops * n lifted
    ops per RHS call) into one batched contraction per *site*.
    """
    if collapse.ops is None:
        return []
    by_site: dict[int, list[int]] = {}
    for k, s in enumerate(collapse.sites):
        by_site.setdefault(int(s), []).append(k)
    groups = []
    for site in sorted(by_site):
        idx = np.asarray(by_site[site], dtype=np.int64)
        L = Cplx(collapse.ops.re[idx], collapse.ops.im[idx])  # (m, d, d)
        q_re = jnp.einsum("mji,mjk->ik", L.re, L.re) + jnp.einsum(
            "mji,mjk->ik", L.im, L.im
        )
        q_im = jnp.einsum("mji,mjk->ik", L.re, L.im) - jnp.einsum(
            "mji,mjk->ik", L.im, L.re
        )
        groups.append((site, L, Cplx(q_re, q_im)))
    return groups


def _dissipator(groups, n: int, d: int, rho: Cplx) -> Cplx:
    """sum_k L_k rho L_k^+ - 1/2 {L_k^+ L_k, rho}, batched per site."""
    from pulser_diff_tpu.cplx import ceinsum

    out = None
    dim = d**n
    for site, L, Q in groups:
        lead = d**site
        trail = dim // (lead * d)
        rho6 = rho.reshape(lead, d, trail, lead, d, trail)
        # sum_m L_m rho L_m^+ with the m axis kept through both einsums
        t1 = ceinsum("mxi,aibcje->maxbcje", L, rho6)
        diss = ceinsum("maxbcje,myj->axbcye", t1, L.conj()).reshape(dim, dim)
        q_rho = apply_local_left(Q, site, n, d, rho)
        rho_q = apply_local_right(Q, site, n, d, rho)
        term = diss - (q_rho + rho_q) * 0.5
        out = term if out is None else out + term
    return out


def _me_rhs(
    ham: FactoredHamiltonian,
    groups,
    n: int,
    d: int,
    t: jax.Array,
    rho: Cplx,
) -> Cplx:
    """drho/dt = -i[H, rho] + sum_k L_k rho L_k^+ - 1/2 {L_k^+ L_k, rho}."""
    from pulser_diff_tpu.ops.apply import h_apply_rho_left

    zr, zc, zd = interp_streams(ham, t)
    hrho = h_apply_rho_left(ham, zr, zc, zd, rho)
    # -i (H rho - (H rho)^H): H and rho hermitian => rho H = (H rho)^H
    comm = Cplx(hrho.re - hrho.re.T, hrho.im + hrho.im.T)
    out = comm.mul_neg_i()

    if groups:
        out = out + _dissipator(groups, n, d, rho)
    return out


def _make_me_step(ham, collapse, n, d, solver, substeps):
    c, A, B = (
        (_DP5_C, _DP5_A, _DP5_B)
        if solver in (SolverType.DP5_ME,)
        else (_RK4_C, _RK4_A, _RK4_B)
    )
    groups = _group_collapse(collapse, n, d)

    def step(rho: Cplx, t0, t1):
        h = (t1 - t0) / substeps
        def sub(i, p):
            return _explicit_rk_step(
                partial(_me_rhs, ham, groups, n, d), t0 + i * h, h, p, c, A, B
            )
        if substeps == 1:
            return sub(0, rho)
        return jax.lax.fori_loop(0, substeps, sub, rho)

    return step


# ----------------------------------------------------------------------
# Liouville-space (superoperator) mesolve fast path
# ----------------------------------------------------------------------
# Reference-scale master-equation workloads are SMALL (2-3 atoms in the
# reference's tests; ref backend.py:495-509 routes run() to mesolve when
# collapse ops exist but never benchmarks it).  At small dims the
# factored per-site RHS above degrades on TPU: every Lindblad term is a
# tiny multi-axis einsum that defeats the VPU's (8, 128) tiling — the
# measured 3-atom step was 4x SLOWER than the torch-CPU baseline
# (bench_mesolve.py).  The TPU-native answer for small dims is Liouville
# vectorization: the RHS is LINEAR in the real stream components w_j(t),
#     d vec(rho)/dt = (S0 + sum_j w_j(t) S_j) vec(rho),
# with a static superoperator stack S built once per solve, so each RK
# stage is ONE (dim^2, dim^2) matmul instead of ~40 tiny einsums.
# Row-major vec convention: vec(A rho B) = (A (x) B^T) vec(rho).
# Round-5 hardware boundary sweep (bench_mesolve, fwd+grad): superop
# 0.32 s vs dense 0.56 s at dim 8, but dense already wins at dim 16
# (0.67 vs 0.74 s) and crushes at dim 32 (0.84 s vs 36.6 s — the
# superop's reverse-mode residuals are per-stage (dim^2, dim^2)
# Liouvillians, forcing per-step recompute there).  So the superop form
# is the default only at dim <= 8; me_form="superop" forces it anywhere
# (remat-guarded by _me_auto_remat).
_SUPEROP_DIM_CAP = 8


def _superop_terms(ham: FactoredHamiltonian, collapse: CollapseOps,
                   n: int, d: int):
    """Build (S0, S, J): static Cplx (dim2, dim2) + stacked Cplx
    (J, dim2, dim2) superoperators matching the w-vector layout of
    `_superop_w` (x/y interleaved per part, row then col then kron).

    Part matrices are REAL (phases live in the streams), so each part P
    contributes two hermitian generators:
      x-component: M = P + P^T      -> -i[M, .] = -i(M(x)I - I(x)M)
      y-component: M = i(P - P^T)   -> -i[M, .] =  K(x)I + I(x)K,
                                        K = P - P^T (real antisymmetric)
    """
    da, db, dim = ham.da, ham.db, ham.dim
    dt_ = ham.int_diag.dtype
    eye_a = jnp.eye(da, dtype=dt_)
    eye_b = jnp.eye(db, dtype=dt_)
    eye = jnp.eye(dim, dtype=dt_)

    def comm_sym(m):
        s = jnp.kron(m, eye) - jnp.kron(eye, m)
        return Cplx(jnp.zeros_like(s), -s)

    def comm_asym(k):
        s = jnp.kron(k, eye) + jnp.kron(eye, k)
        return Cplx(s, jnp.zeros_like(s))

    stack: list[Cplx] = []

    def add_part(lift):
        stack.append(comm_sym(lift + lift.T))
        stack.append(comm_asym(lift - lift.T))

    for p in range(ham.row_parts.shape[0]):
        add_part(jnp.kron(ham.row_parts[p], eye_b))
    for p in range(ham.col_parts.shape[0]):
        add_part(jnp.kron(eye_a, ham.col_parts[p]))
    if ham.kron_row is not None:
        for k in range(ham.kron_row.shape[0]):
            add_part(jnp.kron(ham.kron_row[k], ham.kron_col[k]))

    # static part: -i[diag(U), .] + dissipator
    s0 = comm_sym(jnp.diag(ham.int_diag.reshape(-1)))
    if collapse.ops is not None:
        for m, site in enumerate(collapse.sites):
            lead, trail = d**int(site), dim // (d ** (int(site) + 1))
            il = jnp.eye(lead, dtype=dt_)
            it = jnp.eye(trail, dtype=dt_)
            lr = jnp.kron(il, jnp.kron(collapse.ops.re[m], it))
            li = jnp.kron(il, jnp.kron(collapse.ops.im[m], it))
            # vec(L rho L^+) = (L (x) conj(L)) vec(rho)
            t_re = jnp.kron(lr, lr) + jnp.kron(li, li)
            t_im = jnp.kron(li, lr) - jnp.kron(lr, li)
            # -1/2 {Q, rho}, Q = L^+ L hermitian (Q^T = conj(Q))
            q_re = lr.T @ lr + li.T @ li
            q_im = lr.T @ li - li.T @ lr
            a_re = -0.5 * (jnp.kron(q_re, eye) + jnp.kron(eye, q_re))
            a_im = -0.5 * (jnp.kron(q_im, eye) - jnp.kron(eye, q_im))
            s0 = s0 + Cplx(t_re + a_re, t_im + a_im)

    if not stack:
        return s0, None
    S = Cplx(
        jnp.stack([s.re for s in stack]), jnp.stack([s.im for s in stack])
    )
    return s0, S


def _superop_w(zr: Cplx, zc: Cplx, zk: Optional[Cplx]) -> jax.Array:
    """Real coefficient vector matching `_superop_terms`' stack order:
    (x_0, y_0, x_1, y_1, ...) per part, row parts then col then kron."""
    ws = [
        jnp.stack([zr.re, zr.im], -1).reshape(-1),
        jnp.stack([zc.re, zc.im], -1).reshape(-1),
    ]
    if zk is not None:
        ws.append(jnp.stack([zk.re, zk.im], -1).reshape(-1))
    return jnp.concatenate(ws)


def _make_me_step_superop(ham, collapse, n, d, solver, substeps):
    c, A, B = (
        (_DP5_C, _DP5_A, _DP5_B)
        if solver in (SolverType.DP5_ME,)
        else (_RK4_C, _RK4_A, _RK4_B)
    )
    S0, S = _superop_terms(ham, collapse, n, d)
    dim = ham.dim
    dim2 = dim * dim

    def rhs(t, v):
        zr, zc, zk = interp_streams(ham, t)
        lt_re, lt_im = S0.re, S0.im
        if S is not None:
            w = _superop_w(zr, zc, zk)
            lt_re = lt_re + jnp.einsum("j,jab->ab", w, S.re)
            lt_im = lt_im + jnp.einsum("j,jab->ab", w, S.im)
        return Cplx(
            lt_re @ v.re - lt_im @ v.im, lt_re @ v.im + lt_im @ v.re
        )

    def step(rho: Cplx, t0, t1):
        v = rho.reshape(dim2)
        h = (t1 - t0) / substeps

        def sub(i, p):
            return _explicit_rk_step(rhs, t0 + i * h, h, p, c, A, B)

        if substeps == 1:
            v = sub(0, v)
        else:
            v = jax.lax.fori_loop(0, substeps, sub, v)
        return v.reshape(dim, dim)

    return step


# ----------------------------------------------------------------------
# Dense-matrix mesolve path (mid-size rho: 32 < dim <= 2048)
# ----------------------------------------------------------------------
# Between the superop fast path (whose (dim^2, dim^2) stack stops being
# buildable past dim ~64: at dim=256 one superoperator is 4.3e9 complex
# entries) and the sharded big-rho regime sits the reference-class 6-10
# atom Lindblad workload (ref backend.py:495-509).  The factored
# per-site RHS is einsum-tiny there (measured 0.37x vs torch-CPU at 3
# atoms, STATUS.md) — the TPU-native mid-size form is DENSE matmuls:
# materialize H(t) as one (dim, dim) Cplx per stage from precomputed
# lifted part stacks (2 small einsums), lift the collapse ops to dense
# (M, dim, dim) once per solve, and evaluate the whole RHS as
# MXU-shaped (dim, dim) matmuls:
#     -i[H, rho]            -> U = H rho;  -i(U - U^H)      (4 real mm)
#     -1/2 {G, rho}, G=sum L^+L -> W = G rho;  -(W + W^H)/2  (4 real mm)
#     sum_m L_m rho L_m^+   -> T = L rho (batched);  sum T L^+ (8 real
#                              batched mm over the m axis)
# Memory: stacks are (J + M + 2)(dim^2) reals — ~100 MB f64 at the
# dim=2048 cap, trivially resident.
_DENSE_ME_DIM_CAP = 2048


def _dense_h_stacks(ham: FactoredHamiltonian):
    """Precompute the dense Hermitian generator stacks.

    Each real part P enters H as z(t) P + h.c. = x (P+P^T) + y i(P-P^T)
    (x = Re z, y = Im z), so H(t) = diag(int) + sum_j x_j Sym_j
    + i sum_j y_j Asym_j with Sym/Asym real (J, dim, dim) stacks in the
    same part order as `interp_streams` (rows, cols, kron pairs).
    """
    da, db = ham.da, ham.db
    dt_ = ham.int_diag.dtype
    eye_a = jnp.eye(da, dtype=dt_)
    eye_b = jnp.eye(db, dtype=dt_)
    syms, asyms = [], []

    def add_part(lift):
        syms.append(lift + lift.T)
        asyms.append(lift - lift.T)

    for p in range(ham.row_parts.shape[0]):
        add_part(jnp.kron(ham.row_parts[p], eye_b))
    for p in range(ham.col_parts.shape[0]):
        add_part(jnp.kron(eye_a, ham.col_parts[p]))
    if ham.kron_row is not None:
        for k in range(ham.kron_row.shape[0]):
            add_part(jnp.kron(ham.kron_row[k], ham.kron_col[k]))
    diag = jnp.diag(ham.int_diag.reshape(-1))
    if not syms:
        return diag, None, None
    return diag, jnp.stack(syms), jnp.stack(asyms)


def _dense_collapse(collapse: CollapseOps, n: int, d: int):
    """Lift the per-site collapse ops to dense (M, dim, dim) Cplx, plus
    G = sum_m L_m^+ L_m (dim, dim) Cplx."""
    if collapse.ops is None:
        return None, None
    dim = d**n
    ls_re, ls_im = [], []
    for m, site in enumerate(collapse.sites):
        lead, trail = d ** int(site), dim // (d ** (int(site) + 1))
        il = jnp.eye(lead, dtype=collapse.ops.re.dtype)
        it = jnp.eye(trail, dtype=collapse.ops.re.dtype)
        ls_re.append(jnp.kron(il, jnp.kron(collapse.ops.re[m], it)))
        ls_im.append(jnp.kron(il, jnp.kron(collapse.ops.im[m], it)))
    L = Cplx(jnp.stack(ls_re), jnp.stack(ls_im))
    g_re = jnp.einsum("mca,mcb->ab", L.re, L.re) + jnp.einsum(
        "mca,mcb->ab", L.im, L.im
    )
    g_im = jnp.einsum("mca,mcb->ab", L.re, L.im) - jnp.einsum(
        "mca,mcb->ab", L.im, L.re
    )
    return L, Cplx(g_re, g_im)


def _make_me_step_dense(ham, collapse, n, d, solver, substeps):
    c, A, B = (
        (_DP5_C, _DP5_A, _DP5_B)
        if solver in (SolverType.DP5_ME,)
        else (_RK4_C, _RK4_A, _RK4_B)
    )
    diag, Sym, Asym = _dense_h_stacks(ham)
    L, G = _dense_collapse(collapse, n, d)

    def rhs(t, rho: Cplx) -> Cplx:
        zr, zc, zk = interp_streams(ham, t)
        xs = [zr.re, zc.re] + ([zk.re] if zk is not None else [])
        ys = [zr.im, zc.im] + ([zk.im] if zk is not None else [])
        h_re = diag
        h_im = None
        if Sym is not None:
            x = jnp.concatenate(xs)
            y = jnp.concatenate(ys)
            h_re = h_re + jnp.einsum("j,jab->ab", x, Sym)
            h_im = jnp.einsum("j,jab->ab", y, Asym)
        # U = H rho;  -i[H, rho] = -i(U - U^H)  (H, rho hermitian)
        u_re = h_re @ rho.re
        u_im = h_re @ rho.im
        if h_im is not None:
            u_re = u_re - h_im @ rho.im
            u_im = u_im + h_im @ rho.re
        out = Cplx(u_re - u_re.T, u_im + u_im.T).mul_neg_i()
        if L is not None:
            # drift: W = G rho; -(W + W^H)/2
            w_re = G.re @ rho.re - G.im @ rho.im
            w_im = G.re @ rho.im + G.im @ rho.re
            out = out - Cplx(w_re + w_re.T, w_im - w_im.T) * 0.5
            # jumps: T = L rho (batched), sum_m T_m L_m^+
            t_re = jnp.einsum("mab,bc->mac", L.re, rho.re) - jnp.einsum(
                "mab,bc->mac", L.im, rho.im
            )
            t_im = jnp.einsum("mab,bc->mac", L.re, rho.im) + jnp.einsum(
                "mab,bc->mac", L.im, rho.re
            )
            j_re = jnp.einsum("mac,mbc->ab", t_re, L.re) + jnp.einsum(
                "mac,mbc->ab", t_im, L.im
            )
            j_im = jnp.einsum("mac,mbc->ab", t_im, L.re) - jnp.einsum(
                "mac,mbc->ab", t_re, L.im
            )
            out = out + Cplx(j_re, j_im)
        return out

    def step(rho: Cplx, t0, t1):
        h = (t1 - t0) / substeps

        def sub(i, p):
            return _explicit_rk_step(rhs, t0 + i * h, h, p, c, A, B)

        if substeps == 1:
            return sub(0, rho)
        return jax.lax.fori_loop(0, substeps, sub, rho)

    return step


# ----------------------------------------------------------------------
# the scan driver (shared by sesolve / mesolve)
# ----------------------------------------------------------------------
# Residual-storage budget for reverse-mode: below it, store solver-stage
# values (bwd ~1.3x fwd); between it and segments, store one state/step
# (jax.checkpoint per step); above it, sqrt-segment.  4 GiB fits v5e's
# 16 GiB HBM with room for streams/outputs and is hardware-measured
# faster at the big-N f32 sizes (N=18 331->308 ms, N=19 1067->824 ms,
# identical values); PDT_REMAT_MB overrides for smaller-memory targets.
_REMAT_BYTES_THRESHOLD = (
    int(__import__("os").environ.get("PDT_REMAT_MB", str(4 * 1024)))
    * 1024 * 1024
)


def _auto_remat(y0: Cplx, n_steps: int, stages: int = 6) -> bool:
    """Rematerialize solver stages only when storing them for backward
    would exceed the memory threshold; otherwise full residual storage is
    much faster (no 2x recompute in the backward pass)."""
    state_bytes = 2 * y0.re.size * y0.re.dtype.itemsize
    return n_steps * stages * state_bytes > _REMAT_BYTES_THRESHOLD


def _me_auto_remat(me_form: str, dim: int, rho0: Cplx, n_steps: int) -> bool:
    """Form-aware remat decision for mesolve.  Reverse-mode residuals
    scale with what each RK stage MATERIALIZES, not with rho alone:
      - superop: the full (dim^2, dim^2) Liouvillian per stage — at
        dim 32 that is ~100 MB/step x n_steps, a measured 20 GB HBM OOM
        (round-5 boundary probe);
      - dense: H(t) re/im + the stage rho per stage (~4 dim^2 words) —
        at dim 512 that is ~8 GB over the solve, a measured runtime
        device fault at N=9 while N=8 (~2 GB) ran fine.
    Gate on the per-stage materialization size, not just the state."""
    remat = _auto_remat(rho0, n_steps)
    if remat:
        return True
    itemsize = rho0.re.dtype.itemsize
    if me_form == "superop":
        stage_bytes = 2 * (dim**4) * itemsize
    elif me_form == "dense":
        stage_bytes = 4 * (dim**2) * itemsize
    else:
        return False
    return n_steps * 6 * stage_bytes > _REMAT_BYTES_THRESHOLD


def _auto_segments(y0: Cplx, n_steps: int) -> Optional[int]:
    """Pick sqrt-checkpointing segment count when even one-state-per-step
    residual storage would blow the memory threshold (large density
    matrices / many steps)."""
    state_bytes = 2 * y0.re.size * y0.re.dtype.itemsize
    if n_steps * state_bytes > _REMAT_BYTES_THRESHOLD:
        return max(2, int(np.ceil(np.sqrt(n_steps))))
    return None


def _integrate(
    step,
    y0: Cplx,
    grid: TimeGrid,
    remat: bool = True,
    n_segments: Optional[int] = None,
) -> Cplx:
    """Scan over grid intervals, writing eval-slot states into a buffer.

    ``n_segments``: optional sqrt-checkpointing — the step sequence is
    split into segments, each wrapped in ``jax.checkpoint``; reverse-mode
    then stores O(n_segments + seg_len) states instead of one state per
    step (choose n_segments ~ sqrt(n_steps)).  This is how large-state
    (10+ atom mesolve) gradients fit in HBM; the reference keeps torch's
    full autograd graph over all steps (SURVEY.md §5 "long-context").
    """
    n_grid = grid.times.shape[0]
    n_eval = grid.n_eval
    out = Cplx(
        jnp.zeros((n_eval,) + y0.shape, y0.dtype),
        jnp.zeros((n_eval,) + y0.shape, y0.dtype),
    )
    # grid point 0 may itself be an eval time
    slot0 = int(grid.write_slots[0])
    out = Cplx(
        out.re.at[slot0].set(y0.re, mode="drop"),
        out.im.at[slot0].set(y0.im, mode="drop"),
    )

    step_f = jax.checkpoint(step) if remat else step

    slots = jnp.asarray(grid.write_slots[1:], jnp.int32)
    t0s = grid.times[:-1]
    t1s = grid.times[1:]

    def body(carry, xs):
        y, buf = carry
        t0, t1, slot = xs
        y = step_f(y, t0, t1)
        buf = Cplx(
            buf.re.at[slot].set(y.re, mode="drop"),
            buf.im.at[slot].set(y.im, mode="drop"),
        )
        return (y, buf), None

    n_steps = n_grid - 1
    if n_segments is None or n_segments <= 1 or n_steps < 4:
        (_, out), _ = jax.lax.scan(body, (y0, out), (t0s, t1s, slots))
        return out

    # sqrt-checkpointed two-level scan: pad with zero-length intervals
    # (t0 == t1 == T, slot == n_eval -> dropped write) to a rectangle
    n_segments = min(n_segments, n_steps)
    seg_len = -(-n_steps // n_segments)
    pad = n_segments * seg_len - n_steps
    if pad:
        t_last = grid.times[-1]
        t0s = jnp.concatenate([t0s, jnp.full((pad,), 1.0) * t_last])
        t1s = jnp.concatenate([t1s, jnp.full((pad,), 1.0) * t_last])
        slots = jnp.concatenate(
            [slots, jnp.full((pad,), n_eval, jnp.int32)]
        )
    xs_seg = (
        t0s.reshape(n_segments, seg_len),
        t1s.reshape(n_segments, seg_len),
        slots.reshape(n_segments, seg_len),
    )

    # inside a checkpointed segment the steps are NOT individually
    # rematerialized: double-nested checkpoint transposes blow up the XLA
    # compiler (observed stack-overflow segfaults); memory during a
    # segment's backward is O(seg_len * stages * state), which with
    # seg_len ~ sqrt(n_steps) keeps the asymptotic win
    def body_plain(carry, xs):
        y, buf = carry
        t0, t1, slot = xs
        y = step(y, t0, t1)
        buf = Cplx(
            buf.re.at[slot].set(y.re, mode="drop"),
            buf.im.at[slot].set(y.im, mode="drop"),
        )
        return (y, buf), None

    @jax.checkpoint
    def seg_fn(carry, xs):
        carry, _ = jax.lax.scan(body_plain, carry, xs)
        return carry

    def outer(carry, xs):
        return seg_fn(carry, xs), None

    (_, out), _ = jax.lax.scan(outer, (y0, out), xs_seg)
    return out


# f32 solver aliases -> the underlying f64-machinery stepper they run
_F32_SOLVERS = {
    SolverType.DP5_SE_F32: SolverType.DP5_SE,
    SolverType.RK4_SE_F32: SolverType.RK4_SE,
    SolverType.KRYLOV_SE_F32: SolverType.KRYLOV_SE,
}
_F32_ME_SOLVERS = {
    SolverType.DP5_ME_F32: SolverType.DP5_ME,
    SolverType.RK4_ME_F32: SolverType.RK4_ME,
}


def _cast_ham(ham: FactoredHamiltonian, dtype) -> FactoredHamiltonian:
    """Cast every float leaf of the factored Hamiltonian (linear, so
    autodiff routes cotangents back to the original dtype exactly)."""

    def c(x):
        if x is None:
            return None
        if isinstance(x, Cplx):
            return Cplx(x.re.astype(dtype), x.im.astype(dtype))
        return jnp.asarray(x).astype(dtype)

    return ham._replace(
        row_parts=c(ham.row_parts),
        col_parts=c(ham.col_parts),
        row_streams=c(ham.row_streams),
        col_streams=c(ham.col_streams),
        int_diag=c(ham.int_diag),
        kron_row=c(ham.kron_row),
        kron_col=c(ham.kron_col),
        kron_streams=c(ham.kron_streams),
        sample_dt=c(ham.sample_dt),
    )


def sesolve(
    ham: FactoredHamiltonian,
    psi0: Cplx,
    grid: TimeGrid,
    solver: str = SolverType.DP5_SE,
    substeps: int = 1,
    krylov_dim: int = 12,
    krylov_tol: float = 1e-12,
    rtol: float = 1e-8,
    atol: float = 1e-10,
    max_iters: int = 256,
    remat: Optional[bool] = None,
    n_segments: Optional[int] = None,
) -> Cplx:
    """Integrate i dpsi/dt = H(t) psi.

    psi0: Cplx of shape (nb, da, db).  Returns (n_eval, nb, da, db).
    rtol/atol/max_iters control the adaptive DP5(4) solver (parity with
    the reference's opaque solver-options pass-through to pyqtorch,
    reference backend.py:430-451); remat=None picks checkpointing
    automatically from memory footprint; n_segments=None auto-enables
    sqrt-checkpointing for large states.

    DP5_SE_F32 / RK4_SE_F32 / KRYLOV_SE_F32 run the same steppers with
    every operand cast to f32 and matmuls pinned at
    Precision.HIGHEST — the HBM-resident
    gradient path for states past the fused Pallas kernels' VMEM ceiling
    (the N=18 fused adjoint spills past 128 MiB/core regardless of
    scheduling, SCALING.md).  TPU f64 matmuls are VPU-emulated and slow;
    f32 rides the MXU.  Rounding random-walks at ~1e-6 over reference-
    scale grids (166 steps), the same accuracy class as the fused kernel.
    """
    if solver in _F32_SOLVERS:
        f32 = jnp.float32
        ham32 = _cast_ham(ham, f32)
        psi32 = Cplx(psi0.re.astype(f32), psi0.im.astype(f32))
        grid32 = TimeGrid(
            times=grid.times.astype(f32),
            write_slots=grid.write_slots,
            n_eval=grid.n_eval,
        )
        # a happy-breakdown threshold below f32 eps never fires (tol^2
        # underflows), leaving denormal Lanczos betas unmasked — clamp it
        # to the f32-meaningful floor
        krylov_tol32 = max(krylov_tol, 1e-7)
        # DEFAULT f32 matmul precision on TPU is bf16-pass based (~1e-3
        # relative) — pin every dot traced in the solve to HIGHEST
        with jax.default_matmul_precision("highest"):
            return sesolve(
                ham32, psi32, grid32, _F32_SOLVERS[solver], substeps,
                krylov_dim, krylov_tol32, rtol, atol, max_iters,
                remat, n_segments,
            )
    n_steps = grid.times.shape[0] * substeps
    if remat is None:
        remat = _auto_remat(psi0, n_steps)
    if n_segments is None:
        n_segments = _auto_segments(psi0, n_steps)
    step = _make_se_step(
        ham, solver, substeps, krylov_dim, krylov_tol, rtol, atol, max_iters
    )
    return _integrate(step, psi0, grid, remat, n_segments)


def mesolve(
    ham: FactoredHamiltonian,
    rho0: Cplx,
    collapse: CollapseOps,
    n_qudits: int,
    qudit_dim: int,
    grid: TimeGrid,
    solver: str = SolverType.DP5_ME,
    substeps: int = 1,
    remat: Optional[bool] = None,
    n_segments: Optional[int] = None,
    superop: Optional[bool] = None,
    me_form: Optional[str] = None,
) -> Cplx:
    """Integrate the Lindblad master equation.

    rho0: Cplx (dim, dim).  Returns (n_eval, dim, dim).
    remat / n_segments as in :func:`sesolve` (sqrt-checkpointing keeps
    10+-atom density-matrix gradients inside HBM).

    RHS form selection (auto by dim unless overridden; boundaries are
    hardware-measured, see _SUPEROP_DIM_CAP comment):
      - dim <= 8: Liouville-vectorized superop stepper (one
        (dim^2, dim^2) matmul per RK stage — measured 3.75x torch-CPU
        at 3 atoms);
      - 8 < dim <= 2048: DENSE form (H(t) materialized per stage,
        RHS = (dim, dim) matmuls on the MXU — wins from dim 16 up;
        23.6x/74.4x/106.7x over torch-CPU at 6/7/8 atoms);
      - above: factored per-site RHS (pairs with sharded_mesolve).
    ``me_form`` in {"superop", "dense", "factored"} forces a form;
    legacy ``superop=True/False`` forces superop / factored.
    """
    if solver in _F32_ME_SOLVERS:
        f32 = jnp.float32
        ham32 = _cast_ham(ham, f32)
        rho32 = Cplx(rho0.re.astype(f32), rho0.im.astype(f32))
        col32 = collapse._replace(
            ops=None if collapse.ops is None else Cplx(
                collapse.ops.re.astype(f32), collapse.ops.im.astype(f32)
            )
        )
        grid32 = TimeGrid(
            times=grid.times.astype(f32),
            write_slots=grid.write_slots,
            n_eval=grid.n_eval,
        )
        with jax.default_matmul_precision("highest"):
            return mesolve(
                ham32, rho32, col32, n_qudits, qudit_dim, grid32,
                _F32_ME_SOLVERS[solver], substeps, remat, n_segments,
                superop, me_form,
            )
    n_steps = grid.times.shape[0] * substeps
    if me_form is None:
        if superop is True:
            me_form = "superop"
        elif superop is False:
            me_form = "factored"
        elif ham.dim <= _SUPEROP_DIM_CAP:
            me_form = "superop"
        elif ham.dim <= _DENSE_ME_DIM_CAP:
            me_form = "dense"
        else:
            me_form = "factored"
    if remat is None:
        remat = _me_auto_remat(me_form, ham.dim, rho0, n_steps)
    if n_segments is None:
        n_segments = _auto_segments(rho0, n_steps)
    makers = {
        "superop": _make_me_step_superop,
        "dense": _make_me_step_dense,
        "factored": _make_me_step,
    }
    if me_form not in makers:
        raise ValueError(
            f"me_form must be one of {sorted(makers)}, got {me_form!r}"
        )
    step = makers[me_form](ham, collapse, n_qudits, qudit_dim, solver, substeps)
    return _integrate(step, rho0, grid, remat, n_segments)
