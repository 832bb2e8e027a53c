"""Pallas fused time-evolution kernels (TPU) with custom-VJP adjoints.

The entire Schrodinger evolution runs inside ONE Pallas kernel: the
(batched) state lives in VMEM for the whole solve, per-stage Hamiltonian
side-matrices are assembled on the fly from part stacks (VPU FMAs), and
each stage's application is a handful of MXU matmuls.  This removes all
XLA per-op overhead from the sequential hot loop.

Structure (round 2):
  - Every kernel carries a leading **runs axis R** mapped onto the Pallas
    grid: coefficient streams are (R, n_steps, S, P), states
    (R, nb, da, db).  This is the in-kernel Monte-Carlo batching that
    replaces the reference's serial noisy-runs loop
    (/root/reference/pulser_diff/backend.py:573-595) — vmap-of-pallas_call
    does not lower on this backend (see CLAUDE.md), so the run axis lives
    INSIDE the launch as grid programs.  R=1 recovers the plain case.
  - `fused_evolve` (final state) and `fused_evolve_states` (all
    evaluation-time states) both carry `jax.custom_vjp`s whose backward
    passes are Pallas kernels implementing the *discrete adjoint* of the
    RK4 step: the state is reconstructed by reverse-time integration
    (unitary dynamics; O(h^5) reconstruction error), the costate follows
    the exact transpose of the stage recursion, and cotangents are
    accumulated for the per-stage coefficient stacks, the interaction
    diagonal and the initial state.  The states-adjoint additionally
    *reloads* the stored forward state at every grid point that has an
    evaluation slot, resetting reconstruction drift.
  - State accumulation uses Kahan compensated summation, pushing the f32
    fast mode's additive rounding error from O(n_steps * eps) to O(eps).

Chaining to waveform parameters happens outside (the coefficient
interpolation is ordinary differentiable JAX).

Scope: float32, 'ising' Hamiltonians (no dense XY terms), fixed-step RK4.
The f64 XLA solver (solvers/solver.py) remains the default accuracy path;
this is the fast mode (validated in tests/test_pallas.py).

See /opt/skills/guides/pallas_guide.md for the kernel-language rules
followed here (VMEM residency, static shapes, i32 fori_loop bounds, no
scalar VMEM stores — scalars are packed as broadcast (1, 128) rows).
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# tracing the fused kernels under jit+vjp builds deep Python call chains
sys.setrecursionlimit(max(sys.getrecursionlimit(), 10_000))

from pulser_diff_tpu.cplx import Cplx
from pulser_diff_tpu.ops.apply import FactoredHamiltonian, interp_streams

_RK4_C = np.array([0.0, 0.5, 0.5, 1.0])

# MXU f32 matmuls default to single-pass bf16 (~1e-3 relative error per
# product); HIGHEST runs the multi-pass decomposition for true-f32
# accuracy — together with the Kahan accumulation this keeps the fast
# mode's state error at the ~1e-5 bar (BASELINE.md).
_PRECISION = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32, precision=_PRECISION
    )


def _precompute_stage_z(ham: FactoredHamiltonian, grid_times: jax.Array,
                        c_nodes: np.ndarray = _RK4_C):
    """Interpolate all coefficient streams at every (step, stage) time,
    vectorised OUTSIDE the kernel.  Returns (zr, zc, hs) with z shapes
    (n_steps, S, P)."""
    t0s = grid_times[:-1]
    t1s = grid_times[1:]
    hs = t1s - t0s
    ts = t0s[:, None] + hs[:, None] * jnp.asarray(c_nodes)[None, :]
    zr, zc, _ = interp_streams(ham, ts)
    return zr, zc, hs


# ----------------------------------------------------------------------
# shared in-kernel helpers (operate on VALUES, not refs)
# ----------------------------------------------------------------------
def _assemble(parts, partsT, z_re, z_im, p_count):
    """H = sum_p z_p P_p + h.c. from real part stacks:
    re: sum z_re (P + P^T); im: sum z_im (P - P^T)."""
    h_re = z_re[0] * (parts[0] + partsT[0])
    h_im = z_im[0] * (parts[0] - partsT[0])
    for p in range(1, p_count):
        h_re += z_re[p] * (parts[p] + partsT[p])
        h_im += z_im[p] * (parts[p] - partsT[p])
    return h_re, h_im


def _apply_minus_iH(hr_re, hr_im, gc_re, gc_im, diag, xs, ys, nb):
    """k = -i H psi for psi=(xs,ys) of shape (nb, da, db).

    H psi = Hrow@psi + psi@Gc + diag*psi with Gc = Hcol^T."""
    kx, ky = [], []
    for b in range(nb):
        xb, yb = xs[b], ys[b]
        h_re = (
            _dot(hr_re, xb)
            - _dot(hr_im, yb)
            + _dot(xb, gc_re)
            - _dot(yb, gc_im)
            + diag * xb
        )
        h_im = (
            _dot(hr_re, yb)
            + _dot(hr_im, xb)
            + _dot(xb, gc_im)
            + _dot(yb, gc_re)
            + diag * yb
        )
        kx.append(h_im)
        ky.append(-h_re)
    return jnp.stack(kx), jnp.stack(ky)


def _apply_iH_transpose(hr_re, hr_im, gc_re, gc_im, diag, vx, vy, nb):
    """F^T v for the real linear map F = (-iH): the exact transpose used
    by the costate recursion.
      F^T(v)_x = -Him vx - (Hre + D) vy
      F^T(v)_y =  (Hre + D) vx - Him vy
    Row matrices act from the left (transposed), column matrices from the
    right (transposed): Hre row-sym / Him row-antisym structure is already
    encoded by passing hr_re (sym) and hr_im (antisym)."""
    ox, oy = [], []
    for b in range(nb):
        xb, yb = vx[b], vy[b]

        def hre_apply(u):
            return _dot(hr_re, u) + _dot(u, gc_re) + diag * u

        def him_apply(u):
            return _dot(hr_im, u) + _dot(u, gc_im)

        ox.append(-him_apply(xb) - hre_apply(yb))
        oy.append(hre_apply(xb) - him_apply(yb))
    return jnp.stack(ox), jnp.stack(oy)


def _rk4_stages(f, x, y, h):
    """The four RK4 stage evaluations and the summed increment."""
    k1x, k1y = f(0, x, y)
    k2x, k2y = f(1, x + 0.5 * h * k1x, y + 0.5 * h * k1y)
    k3x, k3y = f(2, x + 0.5 * h * k2x, y + 0.5 * h * k2y)
    k4x, k4y = f(3, x + h * k3x, y + h * k3y)
    dx = (h / 6.0) * (k1x + 2 * k2x + 2 * k3x + k4x)
    dy = (h / 6.0) * (k1y + 2 * k2y + 2 * k3y + k4y)
    return dx, dy


def _kahan_add(x, c, dx):
    """One compensated accumulation step: returns (x', c')."""
    y = dx - c
    t = x + y
    c_new = (t - x) - y
    return t, c_new


# ----------------------------------------------------------------------
# forward kernels (leading grid axis = run)
# ----------------------------------------------------------------------
def _fwd_kernel(
    psi_re_ref, psi_im_ref,
    rp_ref, rpt_ref, cp_ref, cpt_ref,
    zr_re_ref, zr_im_ref, zc_re_ref, zc_im_ref,
    hs_ref, diag_ref,
    out_re_ref, out_im_ref,
    *, n_steps: int, pr: int, pc: int, nb: int,
):
    diag = diag_ref[...]
    rp, rpt = rp_ref[...], rpt_ref[...]
    cp, cpt = cp_ref[...], cpt_ref[...]

    def body(k, carry):
        x, y, cx, cy = carry
        zrr, zri = zr_re_ref[k], zr_im_ref[k]  # (4, Pr)
        zcr, zci = zc_re_ref[k], zc_im_ref[k]
        h = hs_ref[k, 0]

        def stage(s, xs, ys):
            hr_re, hr_im = _assemble(rp, rpt, zrr[s], zri[s], pr)
            gc_re, gim = _assemble(cp, cpt, zcr[s], zci[s], pc)
            return _apply_minus_iH(hr_re, hr_im, gc_re, -gim, diag, xs, ys, nb)

        dx, dy = _rk4_stages(stage, x, y, h)
        x, cx = _kahan_add(x, cx, dx)
        y, cy = _kahan_add(y, cy, dy)
        return (x, y, cx, cy)

    # i32 loop bounds: under jax_enable_x64 fori_loop counters default to
    # i64, which Mosaic cannot convert for (SMEM) store indices
    x0 = psi_re_ref[...]
    y0 = psi_im_ref[...]
    x, y, _, _ = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_steps), body,
        (x0, y0, jnp.zeros_like(x0), jnp.zeros_like(y0)),
    )
    out_re_ref[...] = x
    out_im_ref[...] = y


def _fwd_states_kernel(
    psi_re_ref, psi_im_ref,
    rp_ref, rpt_ref, cp_ref, cpt_ref,
    zr_re_ref, zr_im_ref, zc_re_ref, zc_im_ref,
    hs_ref, diag_ref, slots_ref,
    out_re_ref, out_im_ref,
    *, n_steps: int, pr: int, pc: int, nb: int,
):
    """Forward RK4 evolution emitting states at evaluation slots.

    slots_ref: (n_steps + 1,) i32 in SMEM — eval-slot index per grid
    point (n_eval = dropped).  out: (1, n_eval, nb, da, db) per program.
    """
    from jax.experimental import pallas as pl

    diag = diag_ref[...]
    rp, rpt = rp_ref[...], rpt_ref[...]
    cp, cpt = cp_ref[...], cpt_ref[...]
    n_eval = out_re_ref.shape[0]

    def write(gridpoint, x, y):
        slot = slots_ref[gridpoint]

        @pl.when(slot < n_eval)
        def _():
            out_re_ref[slot] = x
            out_im_ref[slot] = y

    def body(k, carry):
        x, y, cx, cy = carry
        zrr, zri = zr_re_ref[k], zr_im_ref[k]
        zcr, zci = zc_re_ref[k], zc_im_ref[k]
        h = hs_ref[k, 0]

        def stage(s, xs, ys):
            hr_re, hr_im = _assemble(rp, rpt, zrr[s], zri[s], pr)
            gc_re, gim = _assemble(cp, cpt, zcr[s], zci[s], pc)
            return _apply_minus_iH(hr_re, hr_im, gc_re, -gim, diag, xs, ys, nb)

        dx, dy = _rk4_stages(stage, x, y, h)
        x, cx = _kahan_add(x, cx, dx)
        y, cy = _kahan_add(y, cy, dy)
        write(k + 1, x, y)
        return (x, y, cx, cy)

    x0 = psi_re_ref[...]
    y0 = psi_im_ref[...]
    write(jnp.int32(0), x0, y0)
    jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_steps), body,
        (x0, y0, jnp.zeros_like(x0), jnp.zeros_like(y0)),
    )


# ----------------------------------------------------------------------
# adjoint kernels
# ----------------------------------------------------------------------
def _bwd_interval(
    k, x1, y1, lx, ly, dbar,
    rp, rpt, cp, cpt, diag,
    zr_re_ref, zr_im_ref, zc_re_ref, zc_im_ref, hs_ref,
    pr, pc, nb, zbar_ref,
):
    """Reverse one RK4 interval: reconstruct the start state, run the
    exact transpose of the stage recursion on the costate, and write the
    packed per-step coefficient cotangents.  Returns (x0, y0, lx', ly',
    dbar')."""
    zrr, zri = zr_re_ref[k], zr_im_ref[k]
    zcr, zci = zc_re_ref[k], zc_im_ref[k]
    h = hs_ref[k, 0]

    sides = []
    for s in range(4):
        hr_re, hr_im = _assemble(rp, rpt, zrr[s], zri[s], pr)
        gc_re, gim = _assemble(cp, cpt, zcr[s], zci[s], pc)
        sides.append((hr_re, hr_im, gc_re, -gim))

    def f(s, xs, ys):
        hr_re, hr_im, gc_re, gc_im = sides[s]
        return _apply_minus_iH(hr_re, hr_im, gc_re, gc_im, diag, xs, ys, nb)

    def fT(s, vx, vy):
        hr_re, hr_im, gc_re, gc_im = sides[s]
        return _apply_iH_transpose(
            hr_re, hr_im, gc_re, gc_im, diag, vx, vy, nb
        )

    # --- reconstruct y_k by reverse-time RK4 from y_{k+1} ----------
    # (we simply integrate the same ODE backward; O(h^5) local mismatch)
    b1x, b1y = f(3, x1, y1)
    b2x, b2y = f(2, x1 - 0.5 * h * b1x, y1 - 0.5 * h * b1y)
    b3x, b3y = f(1, x1 - 0.5 * h * b2x, y1 - 0.5 * h * b2y)
    b4x, b4y = f(0, x1 - h * b3x, y1 - h * b3y)
    x0 = x1 - (h / 6.0) * (b1x + 2 * b2x + 2 * b3x + b4x)
    y0 = y1 - (h / 6.0) * (b1y + 2 * b2y + 2 * b3y + b4y)

    # --- recompute forward stage inputs from y_k --------------------
    k1x, k1y = f(0, x0, y0)
    u2x, u2y = x0 + 0.5 * h * k1x, y0 + 0.5 * h * k1y
    k2x, k2y = f(1, u2x, u2y)
    u3x, u3y = x0 + 0.5 * h * k2x, y0 + 0.5 * h * k2y
    k3x, k3y = f(2, u3x, u3y)
    u4x, u4y = x0 + h * k3x, y0 + h * k3y

    # --- exact transpose of the stage recursion ---------------------
    kb4x, kb4y = (h / 6.0) * lx, (h / 6.0) * ly
    t4x, t4y = fT(3, kb4x, kb4y)
    kb3x = (h / 3.0) * lx + h * t4x
    kb3y = (h / 3.0) * ly + h * t4y
    t3x, t3y = fT(2, kb3x, kb3y)
    kb2x = (h / 3.0) * lx + 0.5 * h * t3x
    kb2y = (h / 3.0) * ly + 0.5 * h * t3y
    t2x, t2y = fT(1, kb2x, kb2y)
    kb1x = (h / 6.0) * lx + 0.5 * h * t2x
    kb1y = (h / 6.0) * ly + 0.5 * h * t2y
    t1x, t1y = fT(0, kb1x, kb1y)
    lx_new = lx + t1x + t2x + t3x + t4x
    ly_new = ly + t1y + t2y + t3y + t4y

    # --- coefficient cotangents per stage ---------------------------
    stage_data = (
        (0, kb1x, kb1y, x0, y0),
        (1, kb2x, kb2y, u2x, u2y),
        (2, kb3x, kb3y, u3x, u3y),
        (3, kb4x, kb4y, u4x, u4y),
    )
    # scalars cannot be stored to VMEM and SMEM outputs pad each scalar
    # to a full word line — so all per-step scalar cotangents are packed
    # as broadcast (1, 128) rows into one VMEM tile per step.
    rows = []
    for s, kbx, kby, ux, uy in stage_data:
        # row side: W = sum_b kbx_b uy_b^T - kby_b ux_b^T  (da, da)
        #           V = sum_b kbx_b ux_b^T + kby_b uy_b^T
        W = jnp.zeros_like(rp[0])
        V = jnp.zeros_like(rp[0])
        for b in range(nb):
            W += _dot(kbx[b], uy[b].T)
            W -= _dot(kby[b], ux[b].T)
            V += _dot(kbx[b], ux[b].T)
            V += _dot(kby[b], uy[b].T)
        for p in range(pr):
            g_sym = rp[p] + rpt[p]
            g_asym = rp[p] - rpt[p]
            rows.append(jnp.broadcast_to(jnp.sum(g_sym * W), (1, 128)))
            rows.append(jnp.broadcast_to(jnp.sum(g_asym * V), (1, 128)))
        # column side: Wc = sum_b uy_b^T kbx_b - ux_b^T kby_b (db, db)
        #              Vc = sum_b ux_b^T kbx_b + uy_b^T kby_b
        Wc = jnp.zeros_like(cp[0])
        Vc = jnp.zeros_like(cp[0])
        for b in range(nb):
            Wc += _dot(uy[b].T, kbx[b])
            Wc -= _dot(ux[b].T, kby[b])
            Vc += _dot(ux[b].T, kbx[b])
            Vc += _dot(uy[b].T, kby[b])
        for p in range(pc):
            g_sym_t = cpt[p] + cp[p]  # (P + P^T)^T layout for Gc
            g_asym_t = cpt[p] - cp[p]
            rows.append(jnp.broadcast_to(jnp.sum(g_sym_t * Wc), (1, 128)))
            rows.append(jnp.broadcast_to(jnp.sum(g_asym_t * Vc), (1, 128)))
        # diagonal cotangent: dH/dD = identity diagonal, same pattern
        dstage = jnp.zeros_like(diag)
        for b in range(nb):
            dstage += kbx[b] * uy[b] - kby[b] * ux[b]
        dbar = dbar + dstage

    r_used = len(rows)
    r_pad = zbar_ref.shape[1]
    if r_used < r_pad:
        rows.append(jnp.zeros((r_pad - r_used, 128), jnp.float32))
    zbar_ref[k] = jnp.concatenate(rows, axis=0)

    return x0, y0, lx_new, ly_new, dbar


def _bwd_kernel(
    psiF_re_ref, psiF_im_ref,  # final state (forward output)
    lamF_re_ref, lamF_im_ref,  # incoming cotangent of the final state
    rp_ref, rpt_ref, cp_ref, cpt_ref,
    zr_re_ref, zr_im_ref, zc_re_ref, zc_im_ref,
    hs_ref, diag_ref,
    # outputs
    lam0_re_ref, lam0_im_ref,  # cotangent of psi0
    zbar_ref,  # (1, n_steps, R_pad, 128): packed scalar rows
    dbar_ref,  # (1, da, db)
    *, n_steps: int, pr: int, pc: int, nb: int,
):
    diag = diag_ref[...]
    rp, rpt = rp_ref[...], rpt_ref[...]
    cp, cpt = cp_ref[...], cpt_ref[...]

    def body(i, carry):
        x1, y1, lx, ly, dbar = carry
        k = jnp.asarray(n_steps - 1, jnp.int32) - i
        return _bwd_interval(
            k, x1, y1, lx, ly, dbar, rp, rpt, cp, cpt, diag,
            zr_re_ref, zr_im_ref, zc_re_ref, zc_im_ref, hs_ref,
            pr, pc, nb, zbar_ref,
        )

    x0, y0, lx, ly, dbar = jax.lax.fori_loop(
        jnp.int32(0),
        jnp.int32(n_steps),
        body,
        (
            psiF_re_ref[...],
            psiF_im_ref[...],
            lamF_re_ref[...],
            lamF_im_ref[...],
            jnp.zeros_like(diag),
        ),
    )
    lam0_re_ref[...] = lx
    lam0_im_ref[...] = ly
    dbar_ref[...] = dbar


def _bwd_states_kernel(
    states_re_ref, states_im_ref,  # (1, n_eval, nb, da, db) fwd outputs
    lam_re_ref, lam_im_ref,  # (1, n_eval, nb, da, db) incoming cotangents
    rp_ref, rpt_ref, cp_ref, cpt_ref,
    zr_re_ref, zr_im_ref, zc_re_ref, zc_im_ref,
    hs_ref, diag_ref, slots_ref,
    # outputs
    lam0_re_ref, lam0_im_ref,
    zbar_ref,
    dbar_ref,
    *, n_steps: int, pr: int, pc: int, nb: int, last_slot: int,
):
    """Adjoint of the states kernel.

    Walks the grid in reverse from the final state (= states[last_slot]:
    the last grid point is always an evaluation time, the emulator unions
    {0, T} into eval times, reference backend.py:363-375).  At every grid
    point k with an eval slot the *stored* forward state replaces the
    reconstruction (resetting drift) and the slot's cotangent is added to
    the costate.
    """
    n_eval = states_re_ref.shape[0]
    diag = diag_ref[...]
    rp, rpt = rp_ref[...], rpt_ref[...]
    cp, cpt = cp_ref[...], cpt_ref[...]

    def body(i, carry):
        x1, y1, lx, ly, dbar = carry
        k = jnp.asarray(n_steps - 1, jnp.int32) - i
        x0, y0, lx, ly, dbar = _bwd_interval(
            k, x1, y1, lx, ly, dbar, rp, rpt, cp, cpt, diag,
            zr_re_ref, zr_im_ref, zc_re_ref, zc_im_ref, hs_ref,
            pr, pc, nb, zbar_ref,
        )
        # grid point k: reload the stored state / add the slot cotangent
        slot = slots_ref[k]
        valid = slot < n_eval
        safe = jnp.where(valid, slot, jnp.int32(0))
        x0 = jnp.where(valid, states_re_ref[safe], x0)
        y0 = jnp.where(valid, states_im_ref[safe], y0)
        addx = jnp.where(valid, lam_re_ref[safe], jnp.zeros_like(lx))
        addy = jnp.where(valid, lam_im_ref[safe], jnp.zeros_like(ly))
        return (x0, y0, lx + addx, ly + addy, dbar)

    x0, y0, lx, ly, dbar = jax.lax.fori_loop(
        jnp.int32(0),
        jnp.int32(n_steps),
        body,
        (
            # i32 indices: python ints become i64 under x64, which
            # Mosaic's convert helper cannot lower (infinite recursion)
            states_re_ref[jnp.int32(last_slot)],
            states_im_ref[jnp.int32(last_slot)],
            lam_re_ref[jnp.int32(last_slot)],
            lam_im_ref[jnp.int32(last_slot)],
            jnp.zeros_like(diag),
        ),
    )
    lam0_re_ref[...] = lx
    lam0_im_ref[...] = ly
    dbar_ref[...] = dbar


# ----------------------------------------------------------------------
# pallas_call wrappers (grid over the run axis)
# ----------------------------------------------------------------------
def _specs(n_runs: int):
    """BlockSpecs: per-run blocks for run-major operands.

    Index maps return i32 scalars explicitly: under jax_enable_x64 the
    literal 0s become i64 block indices, which Mosaic cannot legalize
    (`func.return (i32, i64, ...)`; same family as the i64 fori_loop
    issue in CLAUDE.md).  The run axis is SQUEEZED out of each block
    (block dim None) so the kernel bodies index exactly like the
    un-batched round-1 form.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _z():
        return jnp.zeros((), jnp.int32)

    def run_block(shape):
        rest = shape[1:]
        n_rest = len(rest)
        return pl.BlockSpec(
            (None,) + tuple(rest),
            lambda r: (jnp.asarray(r, jnp.int32),) + (_z(),) * n_rest,
            memory_space=pltpu.VMEM,
        )

    def shared_block(shape):
        n = len(shape)
        return pl.BlockSpec(
            tuple(shape), lambda r: (_z(),) * n,
            memory_space=pltpu.VMEM,
        )

    def smem_shared(shape):
        n = len(shape)
        return pl.BlockSpec(
            tuple(shape), lambda r: (_z(),) * n,
            memory_space=pltpu.SMEM,
        )

    return run_block, shared_block, smem_shared


def _unpack_zbar(zbar_packed, n_steps, pr, pc):
    """(R, n_steps, r_pad, 128) packed rows -> per-stream cotangents."""
    r_used = 4 * (2 * pr + 2 * pc)
    flat = zbar_packed[:, :, :r_used, 0].reshape(
        zbar_packed.shape[0], n_steps, 4, 2 * pr + 2 * pc
    )
    zbar_rr = flat[..., 0 : 2 * pr : 2]
    zbar_ri = flat[..., 1 : 2 * pr : 2]
    zbar_cr = flat[..., 2 * pr :: 2]
    zbar_ci = flat[..., 2 * pr + 1 :: 2]
    return zbar_rr, zbar_ri, zbar_cr, zbar_ci


def _fused_core(zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag, psi_re, psi_im,
                interpret=False):
    """Final-state forward launch.  Run-major operands: z* (R, n_steps,
    4, P), diag (R, da, db), psi (R, nb, da, db)."""
    from jax.experimental import pallas as pl

    R = int(psi_re.shape[0])
    n_steps = int(hs.shape[0])
    pr, pc, nb = int(rp.shape[0]), int(cp.shape[0]), int(psi_re.shape[1])
    rpt = jnp.swapaxes(rp, -1, -2)
    cpt = jnp.swapaxes(cp, -1, -2)
    kern = partial(_fwd_kernel, n_steps=n_steps, pr=pr, pc=pc, nb=nb)
    run_block, shared, _ = _specs(R)
    return pl.pallas_call(
        kern,
        grid=(R,),
        out_shape=(
            jax.ShapeDtypeStruct(psi_re.shape, jnp.float32),
            jax.ShapeDtypeStruct(psi_im.shape, jnp.float32),
        ),
        in_specs=[
            run_block(psi_re.shape), run_block(psi_im.shape),
            shared(rp.shape), shared(rpt.shape),
            shared(cp.shape), shared(cpt.shape),
            run_block(zr_re.shape), run_block(zr_im.shape),
            run_block(zc_re.shape), run_block(zc_im.shape),
            shared((n_steps, 1)), run_block(diag.shape),
        ],
        out_specs=(run_block(psi_re.shape), run_block(psi_im.shape)),
        interpret=interpret,
    )(psi_re, psi_im, rp, rpt, cp, cpt, zr_re, zr_im, zc_re, zc_im,
      hs.reshape(n_steps, 1), diag)


@partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_evolve(zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag,
                 psi_re, psi_im, interpret=False):
    """Fused f32 RK4 evolution (final state) with adjoint gradients.

    Run-major batch: all of zr/zc (R, n_steps, 4, P), diag (R, da, db) and
    psi (R, nb, da, db) carry a leading Monte-Carlo runs axis mapped onto
    the kernel grid.  Differentiable in the stage coefficients, the
    interaction diagonal and the initial state; hs / part stacks constant.
    """
    return _fused_core(zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag,
                       psi_re, psi_im, interpret)


def _fused_fwd(zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag, psi_re, psi_im,
               interpret):
    out = _fused_core(zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag,
                      psi_re, psi_im, interpret)
    res = (zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag, out[0], out[1])
    return out, res


def _fused_bwd(interpret, res, cot):
    from jax.experimental import pallas as pl

    zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag, outF_re, outF_im = res
    lamF_re, lamF_im = cot
    R = int(outF_re.shape[0])
    n_steps = int(hs.shape[0])
    pr, pc, nb = int(rp.shape[0]), int(cp.shape[0]), int(outF_re.shape[1])
    rpt = jnp.swapaxes(rp, -1, -2)
    cpt = jnp.swapaxes(cp, -1, -2)
    kern = partial(_bwd_kernel, n_steps=n_steps, pr=pr, pc=pc, nb=nb)
    run_block, shared, _ = _specs(R)
    f32 = jnp.float32
    r_used = 4 * (2 * pr + 2 * pc)
    r_pad = int(np.ceil(r_used / 8) * 8)  # (8, 128) f32 tiling
    zbar_shape = (R, n_steps, r_pad, 128)
    (lam0_re, lam0_im, zbar_packed, dbar) = pl.pallas_call(
        kern,
        grid=(R,),
        out_shape=(
            jax.ShapeDtypeStruct(outF_re.shape, f32),
            jax.ShapeDtypeStruct(outF_im.shape, f32),
            jax.ShapeDtypeStruct(zbar_shape, f32),
            jax.ShapeDtypeStruct(diag.shape, f32),
        ),
        in_specs=[
            run_block(outF_re.shape), run_block(outF_im.shape),
            run_block(lamF_re.shape), run_block(lamF_im.shape),
            shared(rp.shape), shared(rpt.shape),
            shared(cp.shape), shared(cpt.shape),
            run_block(zr_re.shape), run_block(zr_im.shape),
            run_block(zc_re.shape), run_block(zc_im.shape),
            shared((n_steps, 1)), run_block(diag.shape),
        ],
        out_specs=(
            run_block(outF_re.shape), run_block(outF_im.shape),
            run_block(zbar_shape), run_block(diag.shape),
        ),
        interpret=interpret,
    )(
        outF_re, outF_im, lamF_re, lamF_im,
        rp, rpt, cp, cpt, zr_re, zr_im, zc_re, zc_im,
        hs.reshape(n_steps, 1), diag,
    )
    zbar_rr, zbar_ri, zbar_cr, zbar_ci = _unpack_zbar(
        zbar_packed, n_steps, pr, pc
    )
    return (
        zbar_rr, zbar_ri, zbar_cr, zbar_ci, jnp.zeros_like(hs),
        jnp.zeros_like(rp), jnp.zeros_like(cp),
        dbar, lam0_re, lam0_im,
    )


fused_evolve.defvjp(_fused_fwd, _fused_bwd)


# ----------------------------------------------------------------------
# eval-time states with adjoint
# ----------------------------------------------------------------------
def _fused_states_core(zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag,
                       psi_re, psi_im, slots, n_eval, interpret=False):
    from jax.experimental import pallas as pl

    R = int(psi_re.shape[0])
    n_steps = int(hs.shape[0])
    pr, pc, nb = int(rp.shape[0]), int(cp.shape[0]), int(psi_re.shape[1])
    rpt = jnp.swapaxes(rp, -1, -2)
    cpt = jnp.swapaxes(cp, -1, -2)
    kern = partial(_fwd_states_kernel, n_steps=n_steps, pr=pr, pc=pc, nb=nb)
    run_block, shared, smem = _specs(R)
    out_shape = (R, n_eval) + tuple(psi_re.shape[1:])
    slots_arr = jnp.asarray(slots, jnp.int32)
    return pl.pallas_call(
        kern,
        grid=(R,),
        out_shape=(
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
            jax.ShapeDtypeStruct(out_shape, jnp.float32),
        ),
        in_specs=[
            run_block(psi_re.shape), run_block(psi_im.shape),
            shared(rp.shape), shared(rpt.shape),
            shared(cp.shape), shared(cpt.shape),
            run_block(zr_re.shape), run_block(zr_im.shape),
            run_block(zc_re.shape), run_block(zc_im.shape),
            shared((n_steps, 1)), run_block(diag.shape),
            smem(slots_arr.shape),
        ],
        out_specs=(run_block(out_shape), run_block(out_shape)),
        interpret=interpret,
    )(
        psi_re, psi_im, rp, rpt, cp, cpt, zr_re, zr_im, zc_re, zc_im,
        hs.reshape(n_steps, 1), diag, slots_arr,
    )


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def fused_evolve_states(zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag,
                        psi_re, psi_im, slots, n_eval, last_slot,
                        interpret=False):
    """Fused f32 RK4 evolution emitting every evaluation-slot state, with
    adjoint gradients (run-major batch like :func:`fused_evolve`).

    slots: static tuple of ints, length n_steps+1 (grid write slots);
    n_eval: number of evaluation slots; last_slot: the final grid point's
    slot (always valid — T is an eval time).
    Returns (R, n_eval, nb, da, db) re/im.
    """
    return _fused_states_core(
        zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag, psi_re, psi_im,
        slots, n_eval, interpret,
    )


def _fused_states_fwd(zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag,
                      psi_re, psi_im, slots, n_eval, last_slot, interpret):
    out = _fused_states_core(
        zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag, psi_re, psi_im,
        slots, n_eval, interpret,
    )
    res = (zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag, out[0], out[1])
    return out, res


def _fused_states_bwd(slots, n_eval, last_slot, interpret, res, cot):
    from jax.experimental import pallas as pl

    zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag, states_re, states_im = res
    lam_re, lam_im = cot
    R = int(states_re.shape[0])
    n_steps = int(hs.shape[0])
    pr, pc, nb = int(rp.shape[0]), int(cp.shape[0]), int(states_re.shape[2])
    rpt = jnp.swapaxes(rp, -1, -2)
    cpt = jnp.swapaxes(cp, -1, -2)
    kern = partial(
        _bwd_states_kernel, n_steps=n_steps, pr=pr, pc=pc, nb=nb,
        last_slot=int(last_slot),
    )
    run_block, shared, smem = _specs(R)
    f32 = jnp.float32
    r_used = 4 * (2 * pr + 2 * pc)
    r_pad = int(np.ceil(r_used / 8) * 8)
    zbar_shape = (R, n_steps, r_pad, 128)
    psi_shape = (R,) + tuple(states_re.shape[2:])
    slots_arr = jnp.asarray(slots, jnp.int32)
    (lam0_re, lam0_im, zbar_packed, dbar) = pl.pallas_call(
        kern,
        grid=(R,),
        out_shape=(
            jax.ShapeDtypeStruct(psi_shape, f32),
            jax.ShapeDtypeStruct(psi_shape, f32),
            jax.ShapeDtypeStruct(zbar_shape, f32),
            jax.ShapeDtypeStruct(diag.shape, f32),
        ),
        in_specs=[
            run_block(states_re.shape), run_block(states_im.shape),
            run_block(lam_re.shape), run_block(lam_im.shape),
            shared(rp.shape), shared(rpt.shape),
            shared(cp.shape), shared(cpt.shape),
            run_block(zr_re.shape), run_block(zr_im.shape),
            run_block(zc_re.shape), run_block(zc_im.shape),
            shared((n_steps, 1)), run_block(diag.shape),
            smem(slots_arr.shape),
        ],
        out_specs=(
            run_block(psi_shape), run_block(psi_shape),
            run_block(zbar_shape), run_block(diag.shape),
        ),
        interpret=interpret,
    )(
        states_re, states_im, lam_re, lam_im,
        rp, rpt, cp, cpt, zr_re, zr_im, zc_re, zc_im,
        hs.reshape(n_steps, 1), diag, slots_arr,
    )
    zbar_rr, zbar_ri, zbar_cr, zbar_ci = _unpack_zbar(
        zbar_packed, n_steps, pr, pc
    )
    return (
        zbar_rr, zbar_ri, zbar_cr, zbar_ci, jnp.zeros_like(hs),
        jnp.zeros_like(rp), jnp.zeros_like(cp),
        dbar, lam0_re, lam0_im,
    )


fused_evolve_states.defvjp(_fused_states_fwd, _fused_states_bwd)


# ----------------------------------------------------------------------
# public entry points
# ----------------------------------------------------------------------
def _check_ising(ham: FactoredHamiltonian) -> None:
    if ham.dense_mats is not None:
        raise NotImplementedError(
            "pallas kernels support diagonal-interaction (ising) "
            "Hamiltonians only."
        )


def _as_run_major(ham: FactoredHamiltonian, psi0: Cplx, grid_times):
    """Stage-precompute + cast to f32 with a leading R=1 run axis."""
    f32 = jnp.float32
    zr, zc, hs = _precompute_stage_z(ham, grid_times)
    args = dict(
        zr_re=zr.re.astype(f32)[None],
        zr_im=zr.im.astype(f32)[None],
        zc_re=zc.re.astype(f32)[None],
        zc_im=zc.im.astype(f32)[None],
        hs=hs.astype(f32),
        rp=ham.row_parts.astype(f32),
        cp=ham.col_parts.astype(f32),
        diag=ham.int_diag.astype(f32)[None],
        psi_re=psi0.re.astype(f32)[None],
        psi_im=psi0.im.astype(f32)[None],
    )
    return args


def pallas_evolve(
    ham: FactoredHamiltonian,
    psi0: Cplx,
    grid_times: jax.Array,
    interpret: bool = False,
) -> Cplx:
    """Evolve psi0 (nb, da, db) over grid_times with the fused RK4 kernel.

    Returns the FINAL state only (f32), differentiable w.r.t. the
    Hamiltonian coefficient streams / interaction diagonal / psi0 via the
    Pallas adjoint kernel.  ising Hamiltonians only.
    """
    _check_ising(ham)
    a = _as_run_major(ham, psi0, grid_times)
    out_re, out_im = fused_evolve(
        a["zr_re"], a["zr_im"], a["zc_re"], a["zc_im"], a["hs"],
        a["rp"], a["cp"], a["diag"], a["psi_re"], a["psi_im"], interpret,
    )
    return Cplx(out_re[0], out_im[0])


def pallas_evolve_states(
    ham: FactoredHamiltonian,
    psi0: Cplx,
    grid,
    interpret: bool = False,
) -> Cplx:
    """Fused evolution emitting states at the grid's evaluation slots:
    (n_eval, nb, da, db), f32 — DIFFERENTIABLE via the states-adjoint
    kernel (the backward sweep reloads stored eval states, so with dense
    evaluation times the reconstruction is exact)."""
    _check_ising(ham)
    a = _as_run_major(ham, psi0, grid.times)
    slots = tuple(int(s) for s in np.asarray(grid.write_slots))
    last_slot = slots[-1]
    if last_slot >= grid.n_eval:
        raise ValueError(
            "The final grid point must carry an evaluation slot (the "
            "emulator always unions {0, T} into evaluation times)."
        )
    out_re, out_im = fused_evolve_states(
        a["zr_re"], a["zr_im"], a["zc_re"], a["zc_im"], a["hs"],
        a["rp"], a["cp"], a["diag"], a["psi_re"], a["psi_im"],
        slots, int(grid.n_eval), last_slot, interpret,
    )
    return Cplx(out_re[0], out_im[0])


def pallas_evolve_mc(
    hams: FactoredHamiltonian,
    psi0: Cplx,
    grid,
    interpret: bool = False,
) -> Cplx:
    """Monte-Carlo batched fused evolution: ``hams`` carries a leading
    runs axis R on its streams/diagonal (build with
    ``jax.vmap(h.build_data)(draws)``), psi0 is (nb, da, db) shared or
    (R, nb, da, db) per-run.  Returns (R, n_eval, nb, da, db) states,
    differentiable.  The runs axis is the kernel grid — one launch for
    the whole Monte-Carlo batch."""
    if hams.dense_mats is not None:
        raise NotImplementedError(
            "pallas kernels support diagonal-interaction (ising) "
            "Hamiltonians only."
        )
    f32 = jnp.float32
    R = int(hams.row_streams.re.shape[0])
    rp = hams.row_parts[0] if hams.row_parts.ndim == 4 else hams.row_parts
    cp = hams.col_parts[0] if hams.col_parts.ndim == 4 else hams.col_parts
    sdt = (
        hams.sample_dt.reshape(-1)[0] if hams.sample_dt.ndim
        else hams.sample_dt
    )

    def stage_one(rs_re, rs_im, cs_re, cs_im, diag):
        h1 = hams._replace(
            row_streams=Cplx(rs_re, rs_im),
            col_streams=Cplx(cs_re, cs_im),
            int_diag=diag,
            row_parts=rp,
            col_parts=cp,
            sample_dt=sdt,
            # vmap batches the int n_samples leaf into an array; the
            # static value is just the stream length
            n_samples=int(hams.row_streams.re.shape[-1]),
        )
        zr, zc, hs = _precompute_stage_z(h1, grid.times)
        return zr.re, zr.im, zc.re, zc.im, hs

    zr_re, zr_im, zc_re, zc_im, hs_all = jax.vmap(
        lambda a, b, c, d, e: stage_one(a, b, c, d, e)
    )(
        hams.row_streams.re, hams.row_streams.im,
        hams.col_streams.re, hams.col_streams.im,
        hams.int_diag,
    )
    hs = hs_all[0]
    if psi0.re.ndim == 3:
        psi_re = jnp.broadcast_to(
            psi0.re.astype(f32)[None], (R,) + tuple(psi0.re.shape)
        )
        psi_im = jnp.broadcast_to(
            psi0.im.astype(f32)[None], (R,) + tuple(psi0.im.shape)
        )
    else:
        psi_re = psi0.re.astype(f32)
        psi_im = psi0.im.astype(f32)
    slots = tuple(int(s) for s in np.asarray(grid.write_slots))
    last_slot = slots[-1]
    out_re, out_im = fused_evolve_states(
        zr_re.astype(f32), zr_im.astype(f32),
        zc_re.astype(f32), zc_im.astype(f32),
        hs.astype(f32), rp.astype(f32), cp.astype(f32),
        hams.int_diag.astype(f32),
        psi_re, psi_im, slots, int(grid.n_eval), last_slot, interpret,
    )
    return Cplx(out_re, out_im)
