"""Pallas fused time-evolution kernels (TPU) with a custom-VJP adjoint.

The entire Schrodinger evolution runs inside ONE Pallas kernel: the
(batched) state lives in VMEM for the whole solve, per-stage Hamiltonian
side-matrices are assembled on the fly from part stacks (VPU FMAs), and
each stage's application is a handful of MXU matmuls.  This removes all
XLA per-op overhead from the sequential hot loop.

Gradients: `fused_evolve` carries a `jax.custom_vjp` whose backward pass
is a second Pallas kernel implementing the *discrete adjoint* of the RK4
step — the state is reconstructed by reverse-time integration (unitary
dynamics; O(h^5) reconstruction error), the costate follows the exact
transpose of the stage recursion, and cotangents are accumulated for the
per-stage coefficient stacks, the interaction diagonal and the initial
state.  Chaining to waveform parameters happens outside (the coefficient
interpolation is ordinary differentiable JAX).

Scope (round 1): float32, 'ising' Hamiltonians (no dense XY terms),
fixed-step RK4, batched states, final-state output.  The f64 XLA solver
(solvers/solver.py) remains the default accuracy path; this is the fast
mode (~1e-4 state error, validated in tests/test_pallas.py).

See /opt/skills/guides/pallas_guide.md for the kernel-language rules
followed here (VMEM residency, static shapes, fori_loop).
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
            jnp.dot(hr_re, xb, preferred_element_type=jnp.float32)
            - jnp.dot(hr_im, yb, preferred_element_type=jnp.float32)
            + jnp.dot(xb, gc_re, preferred_element_type=jnp.float32)
            - jnp.dot(yb, gc_im, preferred_element_type=jnp.float32)
            + diag * xb
        )
        h_im = (
            jnp.dot(hr_re, yb, preferred_element_type=jnp.float32)
            + jnp.dot(hr_im, xb, preferred_element_type=jnp.float32)
            + jnp.dot(xb, gc_im, preferred_element_type=jnp.float32)
            + jnp.dot(yb, gc_re, preferred_element_type=jnp.float32)
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
            return (
                jnp.dot(hr_re, u, preferred_element_type=jnp.float32)
                + jnp.dot(u, gc_re, preferred_element_type=jnp.float32)
                + diag * u
            )

        def him_apply(u):
            return jnp.dot(hr_im, u, preferred_element_type=jnp.float32) + jnp.dot(
                u, gc_im, preferred_element_type=jnp.float32
            )

        ox.append(-him_apply(xb) - hre_apply(yb))
        oy.append(hre_apply(xb) - him_apply(yb))
    return jnp.stack(ox), jnp.stack(oy)


# ----------------------------------------------------------------------
# forward kernel
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
        x, y = carry
        zrr, zri = zr_re_ref[k], zr_im_ref[k]  # (4, Pr)
        zcr, zci = zc_re_ref[k], zc_im_ref[k]
        h = hs_ref[k, 0]

        def stage(s, xs, ys):
            hr_re, hr_im = _assemble(rp, rpt, zrr[s], zri[s], pr)
            gc_re, gim = _assemble(cp, cpt, zcr[s], zci[s], pc)
            return _apply_minus_iH(hr_re, hr_im, gc_re, -gim, diag, xs, ys, nb)

        k1x, k1y = stage(0, x, y)
        k2x, k2y = stage(1, x + 0.5 * h * k1x, y + 0.5 * h * k1y)
        k3x, k3y = stage(2, x + 0.5 * h * k2x, y + 0.5 * h * k2y)
        k4x, k4y = stage(3, x + h * k3x, y + h * k3y)
        x = x + (h / 6.0) * (k1x + 2 * k2x + 2 * k3x + k4x)
        y = y + (h / 6.0) * (k1y + 2 * k2y + 2 * k3y + k4y)
        return (x, y)

    # i32 loop bounds: under jax_enable_x64 fori_loop counters default to
    # i64, which Mosaic cannot convert for (SMEM) store indices
    x, y = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_steps), body,
        (psi_re_ref[...], psi_im_ref[...]),
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
    point (n_eval = dropped).  out: (n_eval, nb, da, db).
    """
    diag = diag_ref[...]
    rp, rpt = rp_ref[...], rpt_ref[...]
    cp, cpt = cp_ref[...], cpt_ref[...]
    n_eval = out_re_ref.shape[0]

    def write(gridpoint, x, y):
        slot = slots_ref[gridpoint]
        from jax.experimental import pallas as pl

        @pl.when(slot < n_eval)
        def _():
            out_re_ref[slot] = x
            out_im_ref[slot] = y

    def body(k, carry):
        x, y = carry
        zrr, zri = zr_re_ref[k], zr_im_ref[k]
        zcr, zci = zc_re_ref[k], zc_im_ref[k]
        h = hs_ref[k, 0]

        def stage(s, xs, ys):
            hr_re, hr_im = _assemble(rp, rpt, zrr[s], zri[s], pr)
            gc_re, gim = _assemble(cp, cpt, zcr[s], zci[s], pc)
            return _apply_minus_iH(hr_re, hr_im, gc_re, -gim, diag, xs, ys, nb)

        k1x, k1y = stage(0, x, y)
        k2x, k2y = stage(1, x + 0.5 * h * k1x, y + 0.5 * h * k1y)
        k3x, k3y = stage(2, x + 0.5 * h * k2x, y + 0.5 * h * k2y)
        k4x, k4y = stage(3, x + h * k3x, y + h * k3y)
        x = x + (h / 6.0) * (k1x + 2 * k2x + 2 * k3x + k4x)
        y = y + (h / 6.0) * (k1y + 2 * k2y + 2 * k3y + k4y)
        write(k + 1, x, y)
        return (x, y)

    x0 = psi_re_ref[...]
    y0 = psi_im_ref[...]
    write(jnp.int32(0), x0, y0)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_steps), body, (x0, y0))


def pallas_evolve_states(
    ham: FactoredHamiltonian,
    psi0: Cplx,
    grid,
    interpret: bool = False,
) -> Cplx:
    """Forward-only fused evolution emitting states at the grid's
    evaluation slots: (n_eval, nb, da, db), f32.  Not differentiable —
    use `pallas_evolve` (final state) or the XLA solver for gradients."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if ham.dense_mats is not None:
        raise NotImplementedError(
            "pallas kernels support diagonal-interaction (ising) "
            "Hamiltonians only."
        )
    f32 = jnp.float32
    zr, zc, hs = _precompute_stage_z(ham, grid.times)
    n_steps = int(hs.shape[0])
    pr = int(ham.row_parts.shape[0])
    pc = int(ham.col_parts.shape[0])
    nb = int(psi0.re.shape[0])
    n_eval = int(grid.n_eval)

    rp = ham.row_parts.astype(f32)
    rpt = jnp.swapaxes(rp, -1, -2)
    cp = ham.col_parts.astype(f32)
    cpt = jnp.swapaxes(cp, -1, -2)
    slots = jnp.asarray(grid.write_slots, jnp.int32)

    kern = partial(
        _fwd_states_kernel, n_steps=n_steps, pr=pr, pc=pc, nb=nb
    )
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = (n_eval,) + tuple(psi0.re.shape)
    out_re, out_im = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(out_shape, f32),
            jax.ShapeDtypeStruct(out_shape, f32),
        ),
        in_specs=[vm] * 12 + [sm],
        out_specs=(vm, vm),
        interpret=interpret,
    )(
        psi0.re.astype(f32),
        psi0.im.astype(f32),
        rp, rpt, cp, cpt,
        zr.re.astype(f32), zr.im.astype(f32),
        zc.re.astype(f32), zc.im.astype(f32),
        hs.astype(f32).reshape(n_steps, 1),
        ham.int_diag.astype(f32),
        slots,
    )
    return Cplx(out_re, out_im)


# ----------------------------------------------------------------------
# adjoint kernel
# ----------------------------------------------------------------------
def _bwd_kernel(
    psiF_re_ref, psiF_im_ref,  # final state (forward output)
    lamF_re_ref, lamF_im_ref,  # incoming cotangent of the final state
    rp_ref, rpt_ref, cp_ref, cpt_ref,
    zr_re_ref, zr_im_ref, zc_re_ref, zc_im_ref,
    hs_ref, diag_ref,
    # outputs
    lam0_re_ref, lam0_im_ref,  # cotangent of psi0
    zbar_ref,  # (n_steps, R_pad, 128): packed scalar rows (see _fused_bwd)
    dbar_ref,  # (da, db)
    *, n_steps: int, pr: int, pc: int, nb: int,
):
    diag = diag_ref[...]
    rp, rpt = rp_ref[...], rpt_ref[...]
    cp, cpt = cp_ref[...], cpt_ref[...]

    dbar_acc0 = jnp.zeros_like(diag)

    def body(i, carry):
        x1, y1, lx, ly, dbar = carry  # state at step k+1, costate, diag cot
        k = jnp.asarray(n_steps - 1, jnp.int32) - i
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
        # (RK4 with step -h and stage order 4,3,3,1 mirrored: we simply
        # integrate the same ODE backward; O(h^5) local mismatch)
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
                W += jnp.dot(kbx[b], uy[b].T, preferred_element_type=jnp.float32)
                W -= jnp.dot(kby[b], ux[b].T, preferred_element_type=jnp.float32)
                V += jnp.dot(kbx[b], ux[b].T, preferred_element_type=jnp.float32)
                V += jnp.dot(kby[b], uy[b].T, preferred_element_type=jnp.float32)
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
                Wc += jnp.dot(uy[b].T, kbx[b], preferred_element_type=jnp.float32)
                Wc -= jnp.dot(ux[b].T, kby[b], preferred_element_type=jnp.float32)
                Vc += jnp.dot(ux[b].T, kbx[b], preferred_element_type=jnp.float32)
                Vc += jnp.dot(uy[b].T, kby[b], preferred_element_type=jnp.float32)
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

        return (x0, y0, lx_new, ly_new, dbar)

    x0, y0, lx, ly, dbar = jax.lax.fori_loop(
        jnp.int32(0),
        jnp.int32(n_steps),
        body,
        (
            psiF_re_ref[...],
            psiF_im_ref[...],
            lamF_re_ref[...],
            lamF_im_ref[...],
            dbar_acc0,
        ),
    )
    lam0_re_ref[...] = lx
    lam0_im_ref[...] = ly
    dbar_ref[...] = dbar


# ----------------------------------------------------------------------
# custom-vjp primitive over the precomputed stage coefficients
# ----------------------------------------------------------------------
def _fused_core(zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag, psi_re, psi_im,
                interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_steps = int(hs.shape[0])
    pr, pc, nb = int(rp.shape[0]), int(cp.shape[0]), int(psi_re.shape[0])
    rpt = jnp.swapaxes(rp, -1, -2)
    cpt = jnp.swapaxes(cp, -1, -2)
    kern = partial(_fwd_kernel, n_steps=n_steps, pr=pr, pc=pc, nb=nb)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(psi_re.shape, jnp.float32),
            jax.ShapeDtypeStruct(psi_im.shape, jnp.float32),
        ),
        in_specs=[vm] * 12,
        out_specs=(vm, vm),
        interpret=interpret,
    )(psi_re, psi_im, rp, rpt, cp, cpt, zr_re, zr_im, zc_re, zc_im,
      hs.reshape(n_steps, 1), diag)


@partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_evolve(zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag,
                 psi_re, psi_im, interpret=False):
    """Fused f32 RK4 evolution with adjoint gradients.

    Differentiable in the stage coefficients (zr/zc), the interaction
    diagonal and the initial state; hs / part stacks are treated constant.
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
    from jax.experimental.pallas import tpu as pltpu

    zr_re, zr_im, zc_re, zc_im, hs, rp, cp, diag, outF_re, outF_im = res
    lamF_re, lamF_im = cot
    n_steps = int(hs.shape[0])
    pr, pc, nb = int(rp.shape[0]), int(cp.shape[0]), int(outF_re.shape[0])
    rpt = jnp.swapaxes(rp, -1, -2)
    cpt = jnp.swapaxes(cp, -1, -2)
    kern = partial(_bwd_kernel, n_steps=n_steps, pr=pr, pc=pc, nb=nb)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jnp.float32
    r_used = 4 * (2 * pr + 2 * pc)
    r_pad = int(np.ceil(r_used / 8) * 8)  # (8, 128) f32 tiling
    (lam0_re, lam0_im, zbar_packed, dbar) = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(outF_re.shape, f32),
            jax.ShapeDtypeStruct(outF_im.shape, f32),
            jax.ShapeDtypeStruct((n_steps, r_pad, 128), f32),
            jax.ShapeDtypeStruct(diag.shape, f32),
        ),
        in_specs=[vm] * 14,
        out_specs=(vm,) * 4,
        interpret=interpret,
    )(
        outF_re, outF_im, lamF_re, lamF_im,
        rp, rpt, cp, cpt, zr_re, zr_im, zc_re, zc_im,
        hs.reshape(n_steps, 1), diag,
    )
    # unpack the per-step scalar rows (stage-major, then
    # [zrr_p..., zri_p..., zcr_p..., zci_p...] within each stage)
    flat = zbar_packed[:, :r_used, 0].reshape(n_steps, 4, 2 * pr + 2 * pc)
    zbar_rr = flat[:, :, 0 : 2 * pr : 2]
    zbar_ri = flat[:, :, 1 : 2 * pr : 2]
    zbar_cr = flat[:, :, 2 * pr :: 2]
    zbar_ci = flat[:, :, 2 * pr + 1 :: 2]
    zeros_hs = jnp.zeros_like(hs)
    zeros_rp = jnp.zeros_like(rp)
    zeros_cp = jnp.zeros_like(cp)
    return (
        zbar_rr, zbar_ri, zbar_cr, zbar_ci, zeros_hs, zeros_rp, zeros_cp,
        dbar, lam0_re, lam0_im,
    )


fused_evolve.defvjp(_fused_fwd, _fused_bwd)


# ----------------------------------------------------------------------
# public entry point
# ----------------------------------------------------------------------
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
    if ham.dense_mats is not None:
        raise NotImplementedError(
            "pallas_evolve supports diagonal-interaction (ising) "
            "Hamiltonians only."
        )
    f32 = jnp.float32
    zr, zc, hs = _precompute_stage_z(ham, grid_times)
    out_re, out_im = fused_evolve(
        zr.re.astype(f32),
        zr.im.astype(f32),
        zc.re.astype(f32),
        zc.im.astype(f32),
        hs.astype(f32),
        ham.row_parts.astype(f32),
        ham.col_parts.astype(f32),
        ham.int_diag.astype(f32),
        psi0.re.astype(f32),
        psi0.im.astype(f32),
        interpret,
    )
    return Cplx(out_re, out_im)
