"""Pallas fused time-evolution kernel (TPU).

The entire Schrodinger evolution runs inside ONE Pallas kernel: the
(batched) state lives in VMEM for the whole solve, per-stage Hamiltonian
side-matrices are assembled on the fly from part stacks (VPU FMAs), and
each stage's application is a handful of MXU matmuls.  This removes all
XLA per-op overhead from the sequential hot loop — the step cost
approaches the raw matmul latency.

Scope (round 1): float32 forward evolution, 'ising' Hamiltonians (no
dense XY terms), fixed-step RK4, batched states.  Used for the
forward-only Monte-Carlo sampling paths; the differentiable paths use the
f64 XLA solver (solvers/solver.py).  Precision: ~1e-5 state error vs the
f64 reference — validated in tests/test_pallas.py.

See /opt/skills/guides/pallas_guide.md for the kernel-language rules
followed here (VMEM residency, static shapes, fori_loop).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pulser_diff_tpu.cplx import Cplx
from pulser_diff_tpu.ops.apply import FactoredHamiltonian, interp_streams

_RK4_C = np.array([0.0, 0.5, 0.5, 1.0])


def _precompute_stage_z(ham: FactoredHamiltonian, grid_times: jax.Array,
                        c_nodes: np.ndarray):
    """Interpolate all coefficient streams at every (step, stage) time,
    vectorised OUTSIDE the kernel.  Returns (zr, zc, hs) with z shapes
    (n_steps, S, P)."""
    t0s = grid_times[:-1]
    t1s = grid_times[1:]
    hs = t1s - t0s
    ts = t0s[:, None] + hs[:, None] * jnp.asarray(c_nodes)[None, :]
    zr, zc, _ = interp_streams(ham, ts)
    return zr, zc, hs


def _evolution_kernel(
    psi_re_ref, psi_im_ref,
    rp_ref, rpt_ref, cp_ref, cpt_ref,
    zr_re_ref, zr_im_ref, zc_re_ref, zc_im_ref,
    hs_ref, diag_ref,
    out_re_ref, out_im_ref,
    *, n_steps: int, pr: int, pc: int, nb: int,
):
    """RK4 evolution, everything VMEM-resident.

    psi: (nb, da, db) f32 x2; rp/rpt: (Pr, da, da) parts + transposes;
    cp/cpt: (Pc, db, db); z*: (n_steps, 4, P); hs: (n_steps, 1);
    diag: (da, db).
    """
    diag = diag_ref[...]
    rp = rp_ref[...]
    rpt = rpt_ref[...]
    cp = cp_ref[...]
    cpt = cpt_ref[...]

    def body(k, carry):
        x, y = carry  # (nb, da, db)
        z_re_r = zr_re_ref[k]  # (4, Pr)
        z_im_r = zr_im_ref[k]
        z_re_c = zc_re_ref[k]
        z_im_c = zc_im_ref[k]
        h = hs_ref[k, 0]

        def stage(s, xs, ys):
            # assemble H = sum_p z_p P_p + h.c. =>
            #   re: sum z_re (P + P^T); im: sum z_im (P - P^T)
            hr_re = z_re_r[s, 0] * (rp[0] + rpt[0])
            hr_im = z_im_r[s, 0] * (rp[0] - rpt[0])
            for p in range(1, pr):
                hr_re += z_re_r[s, p] * (rp[p] + rpt[p])
                hr_im += z_im_r[s, p] * (rp[p] - rpt[p])
            # column side, already transposed: Gc = Hcol^T = conj(Hcol)
            gc_re = z_re_c[s, 0] * (cp[0] + cpt[0])
            gc_im = -(z_im_c[s, 0] * (cp[0] - cpt[0]))
            for p in range(1, pc):
                gc_re += z_re_c[s, p] * (cp[p] + cpt[p])
                gc_im += -(z_im_c[s, p] * (cp[p] - cpt[p]))

            outs_x = []
            outs_y = []
            for b in range(nb):
                xb, yb = xs[b], ys[b]
                rx = (
                    jnp.dot(hr_re, xb, preferred_element_type=jnp.float32)
                    - jnp.dot(hr_im, yb, preferred_element_type=jnp.float32)
                    + jnp.dot(xb, gc_re, preferred_element_type=jnp.float32)
                    - jnp.dot(yb, gc_im, preferred_element_type=jnp.float32)
                    + diag * xb
                )
                ry = (
                    jnp.dot(hr_re, yb, preferred_element_type=jnp.float32)
                    + jnp.dot(hr_im, xb, preferred_element_type=jnp.float32)
                    + jnp.dot(xb, gc_im, preferred_element_type=jnp.float32)
                    + jnp.dot(yb, gc_re, preferred_element_type=jnp.float32)
                    + diag * yb
                )
                # k = -i H psi
                outs_x.append(ry)
                outs_y.append(-rx)
            return jnp.stack(outs_x), jnp.stack(outs_y)

        k1x, k1y = stage(0, x, y)
        k2x, k2y = stage(1, x + 0.5 * h * k1x, y + 0.5 * h * k1y)
        k3x, k3y = stage(2, x + 0.5 * h * k2x, y + 0.5 * h * k2y)
        k4x, k4y = stage(3, x + h * k3x, y + h * k3y)
        x = x + (h / 6.0) * (k1x + 2 * k2x + 2 * k3x + k4x)
        y = y + (h / 6.0) * (k1y + 2 * k2y + 2 * k3y + k4y)
        return (x, y)

    x0 = psi_re_ref[...]
    y0 = psi_im_ref[...]
    x, y = jax.lax.fori_loop(0, n_steps, body, (x0, y0))
    out_re_ref[...] = x
    out_im_ref[...] = y


def pallas_evolve(
    ham: FactoredHamiltonian,
    psi0: Cplx,
    grid_times: jax.Array,
    interpret: bool = False,
) -> Cplx:
    """Evolve psi0 (nb, da, db) over grid_times with the fused RK4 kernel.

    Returns the FINAL state only (f32).  ising Hamiltonians only.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if ham.dense_mats is not None:
        raise NotImplementedError(
            "pallas_evolve supports diagonal-interaction (ising) "
            "Hamiltonians only."
        )
    f32 = jnp.float32
    zr, zc, hs = _precompute_stage_z(ham, grid_times, _RK4_C)
    n_steps = int(hs.shape[0])
    pr = int(ham.row_parts.shape[0])
    pc = int(ham.col_parts.shape[0])
    nb = int(psi0.re.shape[0])

    rp = ham.row_parts.astype(f32)
    rpt = jnp.swapaxes(rp, -1, -2)
    cp = ham.col_parts.astype(f32)
    cpt = jnp.swapaxes(cp, -1, -2)
    hs32 = hs.astype(f32).reshape(n_steps, 1)
    diag = ham.int_diag.astype(f32)

    kern = partial(_evolution_kernel, n_steps=n_steps, pr=pr, pc=pc, nb=nb)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_re, out_im = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct(psi0.re.shape, f32),
            jax.ShapeDtypeStruct(psi0.im.shape, f32),
        ),
        in_specs=[vm] * 12,
        out_specs=(vm, vm),
        interpret=interpret,
    )(
        psi0.re.astype(f32),
        psi0.im.astype(f32),
        rp,
        rpt,
        cp,
        cpt,
        zr.re.astype(f32),
        zr.im.astype(f32),
        zc.re.astype(f32),
        zc.im.astype(f32),
        hs32,
        diag,
    )
    return Cplx(out_re, out_im)
