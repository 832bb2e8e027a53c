"""Pallas fused time-evolution kernels (TPU) with custom-VJP adjoints.

The entire Schrodinger evolution runs inside ONE Pallas kernel: the
(batched) state lives in VMEM for the whole solve, per-stage Hamiltonian
side-matrices are assembled on the fly from part stacks (VPU FMAs), and
each stage's application is a handful of MXU matmuls.  This removes all
XLA per-op overhead from the sequential hot loop.

Structure (round 3):
  - The stepper is TABLEAU-PARAMETERIZED: the same kernel bodies run the
    classic RK4 or the Dormand-Prince 5 stage set (the reference's
    default solver is adaptive DP5, /root/reference/pulser_diff/
    backend.py:487-494).  ``method="DP5"`` is the accuracy path: on the
    driver workload RK4's truncation error (3.6e-5) dominated the f32
    rounding error (4e-7) a hundredfold, so DP5 stages alone bring the
    fused kernel to the f64 solver's accuracy class at kernel speed
    (measured on hardware: |dv| 2.8e-7, |dgrad| 4.8e-6, 88 ms vs the
    f64 path's 554 ms on the 12-atom bench).
  - Compensated arithmetic keeps the f32 kernel's *systematic* rounding
    at the 1e-8 level: the interaction diagonal and the per-step b_i*h
    update weights are carried as two-word (hi, lo) f32 pairs split from
    f64, the coefficient streams get an extra low-word assembly pass, and
    the state accumulates with Kahan summation.  Stochastic per-matmul
    rounding (~5e-7/dot at Precision.HIGHEST) random-walks well below
    the 1e-6 driver bar.
  - XY (dipole flip-flop) interactions enter as KRON-PAIR terms
    z_k(t) (R_k (x) C_k) + h.c. applied as R @ Psi @ C^T inside the
    kernel (ops/apply.py holds the matching XLA form) — no dim x dim
    matrix is ever materialised, so XY sequences run fused at any size
    the ising path handles.  The adjoint kernel emits cotangents for the
    kron PART MATRICES as well as the streams (_kron_matrix_cotangents),
    so qubit-distance gradients — the W_ij weights are folded into
    R_k/C_k at build time — flow through the fused path.
  - Every kernel carries a leading **runs axis R** mapped onto the Pallas
    grid: coefficient streams are (R, n_steps, S, P), states
    (R, nb, da, db).  This is the in-kernel Monte-Carlo batching that
    replaces the reference's serial noisy-runs loop
    (/root/reference/pulser_diff/backend.py:573-595) — vmap-of-pallas_call
    does not lower on this backend (see CLAUDE.md), so the run axis lives
    INSIDE the launch as grid programs.  R=1 recovers the plain case.
  - The state batch axis ``nb`` (batched initial states / gate-matrix
    evolution, reference utils.py:79-84) is applied with unrolled
    matmuls for small nb and a ``fori_loop`` of dynamically-sliced
    matmuls beyond, so large nb no longer explodes the kernel body.
  - `fused_evolve` (final state) and `fused_evolve_states` (all
    evaluation-time states) both carry `jax.custom_vjp`s whose backward
    passes are Pallas kernels implementing the *discrete adjoint* of the
    ERK step: the state is reconstructed by reverse-time integration
    using dedicated mirror-node coefficient streams (unitary dynamics;
    O(h^6) reconstruction error for DP5), the costate follows the exact
    transpose of the stage recursion, and cotangents are accumulated for
    the per-stage coefficient stacks, the interaction diagonal and the
    initial state.  The states-adjoint additionally *reloads* the stored
    forward state at every grid point that has an evaluation slot,
    resetting reconstruction drift.

Chaining to waveform parameters happens outside (the coefficient
interpolation is ordinary differentiable JAX).

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

# ----------------------------------------------------------------------
# tableaus (static python/numpy constants; unrolled at trace time)
# ----------------------------------------------------------------------
_RK4_C = np.array([0.0, 0.5, 0.5, 1.0])
_RK4_A = ((), (0.5,), (0.0, 0.5), (0.0, 0.0, 1.0))
_RK4_B = np.array([1 / 6, 1 / 3, 1 / 3, 1 / 6])

_DP5_C = np.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0])
_DP5_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
)
_DP5_B = np.array(
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84]
)

_TABLEAUS = {
    "RK4": (_RK4_C, _RK4_A, _RK4_B),
    "DP5": (_DP5_C, _DP5_A, _DP5_B),
}

# state-batch cap for the fused kernels: the adjoint's per-state outer
# products are Python-unrolled (Mosaic cannot lower dynamic_slice on
# loop-carried values, and batch-contracted dot_generals fail
# verification — probed on hardware); beyond this the XLA path is the
# right tool anyway (full gate-matrix batches don't fit VMEM)
_NB_MAX = 32

# MXU f32 matmuls default to single-pass bf16 (~1e-3 relative error per
# product); HIGHEST runs the multi-pass decomposition for true-f32
# accuracy — together with the compensated accumulation this keeps the
# fused kernel's state error at the ~1e-6 bar (BASELINE.md).
# Hardware probes (round 3): DEFAULT vs HIGHEST is timing-neutral on the
# 12-atom workload (the kernel is latency-bound, not MXU-bound), so
# HIGHEST costs nothing; Precision.HIGH does not lower in Mosaic; and
# SMEM-resident coefficient streams OOM (each scalar pads to a full SMEM
# line: 5.4 MB > the 1 MB budget), so streams stay in VMEM.
_PRECISION = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32, precision=_PRECISION
    )


def _precompute_stage_z(ham: FactoredHamiltonian, grid_times: jax.Array,
                        c_nodes: np.ndarray = _RK4_C):
    """Interpolate all coefficient streams at every (step, stage) time,
    vectorised OUTSIDE the kernel.  Returns (zr, zc, zk, hs) with z
    shapes (n_steps, S, P)."""
    t0s = grid_times[:-1]
    t1s = grid_times[1:]
    hs = t1s - t0s
    ts = t0s[:, None] + hs[:, None] * jnp.asarray(c_nodes)[None, :]
    zr, zc, zk = interp_streams(ham, ts)
    return zr, zc, zk, hs


def _split_hi_lo(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Two-word f32 split of a (possibly f64) array: hi = f32(x),
    lo = f32(x - hi).  Linear, so autodiff routes cotangents through both
    words and recombines them exactly."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(x.dtype)).astype(jnp.float32)
    return hi, lo


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


def _assemble_hl(parts, partsT, zh_re, zh_im, zl_re, zl_im, p_count):
    """Two-word assembly: the low words fold in before the final
    rounding, removing the systematic f64->f32 stream-cast error."""
    h_re, h_im = _assemble(parts, partsT, zh_re, zh_im, p_count)
    l_re, l_im = _assemble(parts, partsT, zl_re, zl_im, p_count)
    return h_re + l_re, h_im + l_im


def _bdot_left(m, u):
    """(g, g) @ (nb, g, k) batched matmul (probed: lowers on Mosaic)."""
    return jnp.einsum(
        "ij,bjk->bik", m, u,
        preferred_element_type=jnp.float32, precision=_PRECISION,
    )


def _bdot_right(u, m):
    """(nb, j, g) @ (g, g) batched matmul."""
    return jnp.einsum(
        "bij,jk->bik", u, m,
        preferred_element_type=jnp.float32, precision=_PRECISION,
    )


class _Side:
    """One stage's assembled Hamiltonian pieces (values, not refs).

    hr_re symmetric / hr_im antisymmetric row matrices, gc_* the
    transposed column matrices, diag two words, and the kron-pair data
    (part stacks + per-stage scalars za/zb) when present.

    The complex application uses the BLOCK-REAL form: the (2da, 2da)
    matrix [[hr_re, -hr_im], [hr_im, hr_re]] acts on the stacked state
    [x; y] in ONE batched MXU matmul (full 128-lane tiles at da=64)
    instead of four small ones; same on the column side.
    """

    def __init__(self, hr_re, hr_im, gc_re, gc_im, diag, diag_lo, kron):
        self.hr_re, self.hr_im = hr_re, hr_im
        self.gc_re, self.gc_im = gc_re, gc_im
        self.diag, self.diag_lo = diag, diag_lo
        self.kron = kron  # None | (kr, krt, kc, kct, za[list], zb[list])
        self._blocks = {}

    def _block(self, name):
        if name in self._blocks:
            return self._blocks[name]
        if name == "row":  # forward: (hre x - him y, him x + hre y)
            m = jnp.concatenate(
                [
                    jnp.concatenate([self.hr_re, -self.hr_im], axis=1),
                    jnp.concatenate([self.hr_im, self.hr_re], axis=1),
                ],
                axis=0,
            )
        elif name == "col":  # right side for [x | y] columns
            m = jnp.concatenate(
                [
                    jnp.concatenate([self.gc_re, self.gc_im], axis=1),
                    jnp.concatenate([-self.gc_im, self.gc_re], axis=1),
                ],
                axis=0,
            )
        elif name == "rowT":  # transpose map row piece
            m = jnp.concatenate(
                [
                    jnp.concatenate([-self.hr_im, -self.hr_re], axis=1),
                    jnp.concatenate([self.hr_re, -self.hr_im], axis=1),
                ],
                axis=0,
            )
        else:  # "colT"
            m = jnp.concatenate(
                [
                    jnp.concatenate([-self.gc_im, self.gc_re], axis=1),
                    jnp.concatenate([-self.gc_re, -self.gc_im], axis=1),
                ],
                axis=0,
            )
        self._blocks[name] = m
        return m

    def _kron_products(self, u):
        """Per-pair two-sided products (R u C^T, R^T u C) for a batched
        (nb, da, db) operand."""
        kr, krt, kc, kct, _, _ = self.kron
        out = []
        for k in range(kr.shape[0]):
            p1 = _bdot_right(_bdot_left(kr[k], u), kct[k])
            p2 = _bdot_right(_bdot_left(krt[k], u), kc[k])
            out.append((p1, p2))
        return out

    @property
    def _use_blocks(self) -> bool:
        # tiny side matrices break Mosaic's concat on sliced values
        # ("offset mismatch on non-concat dimension", observed at
        # da=db=2 on hardware) and gain nothing from 128-wide tiles —
        # fall back to direct per-state matmuls there.  PDT_KERNEL_DIRECT
        # forces the direct form everywhere: the (2da, 2da) block
        # compositions are the largest VMEM intermediates at big factors
        # (4 MiB apiece at da=512), so the direct form buys headroom
        # toward the 128 MiB/core ceiling (see SCALING.md, N=18).
        if _FORCE_DIRECT:
            return False
        da, db = self.hr_re.shape[0], self.gc_re.shape[0]
        # At >=131072-dim states (N>=17 qubits) the block compositions
        # alone exceed the VMEM budget — the direct form is required
        # (hardware: N=17 fused works direct-only, 155.6 ms; N=16 is
        # timing-neutral between the forms.  SCALING.md).
        if da * db >= 131072:
            return False
        return da >= 8 and db >= 8

    def _apply_direct(self, x, y, nb):
        """Per-state direct matmul form (small-dim fallback)."""
        hxs, hys = [], []
        for b in range(nb):
            xb, yb = x[b], y[b]
            h_re = (
                _dot(self.hr_re, xb) - _dot(self.hr_im, yb)
                + _dot(xb, self.gc_re) - _dot(yb, self.gc_im)
                + self.diag * xb + self.diag_lo * xb
            )
            h_im = (
                _dot(self.hr_re, yb) + _dot(self.hr_im, xb)
                + _dot(xb, self.gc_im) + _dot(yb, self.gc_re)
                + self.diag * yb + self.diag_lo * yb
            )
            hxs.append(h_re)
            hys.append(h_im)
        return jnp.stack(hxs), jnp.stack(hys)

    def _transpose_direct(self, vx, vy, nb):
        oxs, oys = [], []
        for b in range(nb):
            xb, yb = vx[b], vy[b]

            def sym(u):
                return (
                    _dot(self.hr_re, u) + _dot(u, self.gc_re)
                    + self.diag * u + self.diag_lo * u
                )

            def asym(u):
                return _dot(self.hr_im, u) + _dot(u, self.gc_im)

            oxs.append(-asym(xb) - sym(yb))
            oys.append(sym(xb) - asym(yb))
        return jnp.stack(oxs), jnp.stack(oys)

    def apply_minus_iH(self, x, y, nb):
        """k = -i H psi for psi=(x, y) of shape (nb, da, db)."""
        da = self.hr_re.shape[0]
        db = self.gc_re.shape[0]
        if self._use_blocks:
            XY = jnp.concatenate([x, y], axis=1)  # (nb, 2da, db)
            R = _bdot_left(self._block("row"), XY)
            XYc = jnp.concatenate([x, y], axis=2)  # (nb, da, 2db)
            C = _bdot_right(XYc, self._block("col"))
            h_re = (
                R[:, :da] + C[:, :, :db]
                + self.diag * x + self.diag_lo * x
            )
            h_im = (
                R[:, da:] + C[:, :, db:]
                + self.diag * y + self.diag_lo * y
            )
        else:
            h_re, h_im = self._apply_direct(x, y, nb)
        if self.kron is not None:
            # sum_k z_k (R (x) C) + h.c. with T1 = RuC^T + R^TuC
            # (self-adjoint), T2 = RuC^T - R^TuC (anti-self-adjoint):
            #   re += za T1(x) - zb T2(y); im += za T1(y) + zb T2(x)
            za, zb = self.kron[4], self.kron[5]
            px = self._kron_products(x)
            py = self._kron_products(y)
            for k, ((x1, x2), (y1, y2)) in enumerate(zip(px, py)):
                h_re += za[k] * (x1 + x2) - zb[k] * (y1 - y2)
                h_im += za[k] * (y1 + y2) + zb[k] * (x1 - x2)
        return h_im, -h_re

    def apply_iH_transpose(self, vx, vy, nb):
        """F^T v for the real linear map F = (-iH): the exact transpose
        used by the costate recursion.
          F^T(v)_x = -A(vx) - S(vy);  F^T(v)_y = S(vx) - A(vy)
        with S the self-adjoint piece (Hre + D + kron T1 terms) and A
        the anti-self-adjoint piece (Him + kron T2 terms)."""
        da = self.hr_re.shape[0]
        db = self.gc_re.shape[0]
        if self._use_blocks:
            XY = jnp.concatenate([vx, vy], axis=1)
            R = _bdot_left(self._block("rowT"), XY)
            XYc = jnp.concatenate([vx, vy], axis=2)
            C = _bdot_right(XYc, self._block("colT"))
            ox = (
                R[:, :da] + C[:, :, :db]
                - self.diag * vy - self.diag_lo * vy
            )
            oy = (
                R[:, da:] + C[:, :, db:]
                + self.diag * vx + self.diag_lo * vx
            )
        else:
            ox, oy = self._transpose_direct(vx, vy, nb)
        if self.kron is not None:
            za, zb = self.kron[4], self.kron[5]
            px = self._kron_products(vx)
            py = self._kron_products(vy)
            for k in range(len(px)):
                t1x = px[k][0] + px[k][1]
                t2x = px[k][0] - px[k][1]
                t1y = py[k][0] + py[k][1]
                t2y = py[k][0] - py[k][1]
                ox += -zb[k] * t2x - za[k] * t1y
                oy += za[k] * t1x - zb[k] * t2y
        return ox, oy


def _kahan_add(x, c, dx):
    """One compensated accumulation step: returns (x', c')."""
    y = dx - c
    t = x + y
    c_new = (t - x) - y
    return t, c_new


def _erk_increment(stage, x, y, h, bh, bl, A, B_np, S):
    """One explicit-RK interval: evaluate the S stages and return the
    summed increment.  ``bh``/``bl`` are the two-word h*b_s update
    weights (traced scalars); stage-input combinations use plain
    ``a_sj * h`` (their rounding perturbs the solution at second order
    only)."""
    kxs, kys = [], []
    for s in range(S):
        xs_, ys_ = x, y
        for j in range(s):
            a = A[s][j]
            if a != 0.0:
                c = a * h
                xs_ = xs_ + c * kxs[j]
                ys_ = ys_ + c * kys[j]
        kx, ky = stage(s, xs_, ys_)
        kxs.append(kx)
        kys.append(ky)
    dx = dy = None
    for s in range(S):
        if B_np[s] == 0.0:
            continue
        if dx is None:
            dx = bh[s] * kxs[s]
            dy = bh[s] * kys[s]
        else:
            dx = dx + bh[s] * kxs[s]
            dy = dy + bh[s] * kys[s]
    for s in range(S):
        if B_np[s] == 0.0:
            continue
        dx = dx + bl[s] * kxs[s]
        dy = dy + bl[s] * kys[s]
    return dx, dy


# ----------------------------------------------------------------------
# ref schemas: the kernels take a *flat* ref list whose composition
# depends on (K > 0, states-mode, fwd/bwd); _Refs unpacks it
# ----------------------------------------------------------------------
class _Refs:
    def __init__(self, refs, *, K, bwd, states, ckpt=False):
        it = iter(refs)
        if bwd:
            self.in_re = next(it)
            self.in_im = next(it)
            if ckpt:  # interval start states come from the HBM checkpoint
                self.psi_re = next(it)
                self.psi_im = next(it)
            self.lam_re = next(it)
            self.lam_im = next(it)
        else:
            self.psi_re = next(it)
            self.psi_im = next(it)
        self.rp, self.rpt = next(it), next(it)
        self.cp, self.cpt = next(it), next(it)
        self.zf = [next(it) for _ in range(8)]  # fwd-node hi/lo streams
        if bwd and not ckpt:
            self.zb = [next(it) for _ in range(4)]  # mirror-node streams
        if K:
            self.kr, self.krt = next(it), next(it)
            self.kc, self.kct = next(it), next(it)
            self.zkf = [next(it) for _ in range(4)]
            if bwd and not ckpt:
                self.zkb = [next(it) for _ in range(2)]
        self.hb_hi, self.hb_lo, self.hs = next(it), next(it), next(it)
        self.diag, self.diag_lo = next(it), next(it)
        if states:
            self.slots = next(it)
        # outputs
        if bwd:
            self.lam0_re, self.lam0_im = next(it), next(it)
            self.zbar, self.dbar = next(it), next(it)
            if K:
                self.krbar, self.kcbar = next(it), next(it)
        else:
            self.out_re, self.out_im = next(it), next(it)
            if ckpt:  # loop-carried state words persist in constant blocks
                self.car_x, self.car_y = next(it), next(it)
                self.car_cx, self.car_cy = next(it), next(it)
        rest = list(it)
        assert not rest, f"unconsumed refs: {len(rest)}"

    def load_step(self, k, *, K, bwd=False):
        """Hoisted per-step loads (one dynamic slice per stream array per
        STEP instead of per stage; stages then index the loaded values at
        static positions).  Enabled by _HOIST_STEP_LOADS."""
        d = {"zf": [z[k] for z in self.zf]}
        if bwd:
            d["zb"] = [z[k] for z in self.zb]
        if K:
            d["zkf"] = [z[k] for z in self.zkf]
            if bwd:
                d["zkb"] = [z[k] for z in self.zkb]
        return d

    def side(self, k, s, *, K, pr, pc, mirror=False, zstep=None):
        """Assemble one stage's _Side from the streams at (step k,
        stage s); ``mirror=True`` uses the reverse-time reconstruction
        node streams (hi-word only).  With ``zstep`` (from load_step),
        stream values come from the hoisted per-step loads and ``k`` is
        unused."""
        if zstep is not None:
            zf = zstep["zf"]
            zb = zstep.get("zb")
            zkf = zstep.get("zkf")
            zkb = zstep.get("zkb")

            def f(i):
                return zf[i][s]

            def b(i):
                return zb[i][s]

            def kf(i, j):
                return zkf[i][s, j]

            def kb_(i, j):
                return zkb[i][s, j]
        else:
            def f(i):
                return self.zf[i][k, s]

            def b(i):
                return self.zb[i][k, s]

            def kf(i, j):
                return self.zkf[i][k, s, j]

            def kb_(i, j):
                return self.zkb[i][k, s, j]

        if mirror:
            hr_re, hr_im = _assemble(self.rp, self.rpt, b(0), b(1), pr)
            gc_re, gim = _assemble(self.cp, self.cpt, b(2), b(3), pc)
        else:
            hr_re, hr_im = _assemble_hl(
                self.rp, self.rpt, f(0), f(1), f(2), f(3), pr
            )
            gc_re, gim = _assemble_hl(
                self.cp, self.cpt, f(4), f(5), f(6), f(7), pc
            )
        kron = None
        if K:
            if mirror:
                za = [kb_(0, j) for j in range(K)]
                zb_ = [kb_(1, j) for j in range(K)]
            else:
                za = [kf(0, j) + kf(2, j) for j in range(K)]
                zb_ = [kf(1, j) + kf(3, j) for j in range(K)]
            kron = (self.kr, self.krt, self.kc, self.kct, za, zb_)
        return _Side(
            hr_re, hr_im, gc_re, -gim,
            self.diag_v, self.diag_lo_v, kron,
        )


def _load_consts(r: _Refs):
    """Materialise the shared VMEM operands once per program."""
    r.rp, r.rpt = r.rp[...], r.rpt[...]
    r.cp, r.cpt = r.cp[...], r.cpt[...]
    # one load per program instead of two per stage
    r.diag_v, r.diag_lo_v = r.diag[...], r.diag_lo[...]
    if hasattr(r, "kr"):
        r.kr, r.krt = r.kr[...], r.krt[...]
        r.kc, r.kct = r.kc[...], r.kct[...]


# Hoist the per-step stream loads out of the stage loop (one dynamic
# VMEM slice per array per STEP; stages index the loaded block
# statically).  Hardware A/B (SCALING.md): a wash at N=12 (3.30 vs
# 3.29 ms/iter), ~5 % at N=16 (44.0 vs 41.9 ms) — so the default is
# dim-based: hoisted at dim >= 2^16, plain below (PDT_KERNEL_HOIST=0/1
# forces either everywhere).  The decision is a pure function of the
# state shape, so jit caching stays consistent.
_HOIST_ENV = __import__("os").environ.get("PDT_KERNEL_HOIST", "")
_HOIST_DIM_THRESHOLD = 2**16


def _hoist_default(dim: int) -> bool:
    if _HOIST_ENV in ("0", "1"):
        return _HOIST_ENV == "1"
    return dim >= _HOIST_DIM_THRESHOLD

# Force the direct 4-matmul stage form (no 2da-block composition) — VMEM
# headroom lever for the largest fused sizes; parity-pinned in interpret
# mode (tests/test_pallas.py)
_FORCE_DIRECT = bool(int(__import__("os").environ.get("PDT_KERNEL_DIRECT", "0")))

# Restore the wide (round-3) adjoint interval form: all 2S stage sides
# assembled up front and the cotangent pass run as a separate phase.
# The default (lean) form assembles sides on demand and fuses the
# cotangent accumulation into the reversed transpose recursion, roughly
# halving the adjoint's VMEM live set (the N=18 fused adjoint spilled
# 143-158 MiB > the 128 MiB/core ceiling in the wide form; SCALING.md).
_WIDE_ADJ = bool(int(__import__("os").environ.get("PDT_KERNEL_WIDE_ADJ", "0")))


# ----------------------------------------------------------------------
# forward kernels (leading grid axis = run)
# ----------------------------------------------------------------------
def _fwd_kernel(*refs, n_steps, pr, pc, nb, A, B_np, S, K, states,
                n_eval=0, hoist=False):
    from jax.experimental import pallas as pl

    r = _Refs(refs, K=K, bwd=False, states=states)
    _load_consts(r)

    def write(gridpoint, x, y):
        slot = r.slots[gridpoint]

        @pl.when(slot < n_eval)
        def _():
            r.out_re[slot] = x
            r.out_im[slot] = y

    def body(k, carry):
        x, y, cx, cy = carry
        h = r.hs[k, 0]
        if hoist:
            hbk, blk = r.hb_hi[k], r.hb_lo[k]
            bh = [hbk[s] for s in range(S)]
            bl = [blk[s] for s in range(S)]
            zstep = r.load_step(k, K=K)
        else:
            bh = [r.hb_hi[k, s] for s in range(S)]
            bl = [r.hb_lo[k, s] for s in range(S)]
            zstep = None

        def stage(s, xs, ys):
            return r.side(
                k, s, K=K, pr=pr, pc=pc, zstep=zstep
            ).apply_minus_iH(xs, ys, nb)

        dx, dy = _erk_increment(stage, x, y, h, bh, bl, A, B_np, S)
        x, cx = _kahan_add(x, cx, dx)
        y, cy = _kahan_add(y, cy, dy)
        if states:
            write(k + 1, x, y)
        return (x, y, cx, cy)

    # i32 loop bounds: under jax_enable_x64 fori_loop counters default to
    # i64, which Mosaic cannot convert for (SMEM) store indices
    x0 = r.psi_re[...]
    y0 = r.psi_im[...]
    if states:
        write(jnp.int32(0), x0, y0)
    x, y, _, _ = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_steps), body,
        (x0, y0, jnp.zeros_like(x0), jnp.zeros_like(y0)),
    )
    if not states:
        r.out_re[...] = x
        r.out_im[...] = y


# ----------------------------------------------------------------------
# adjoint kernels
# ----------------------------------------------------------------------
def _outer_accumulate(kbx, kby, ux, uy, nb, like_row, like_col):
    """Per-stage cotangent outer products, summed over the state batch:
      row side:  W = sum_b kbx_b uy_b^T - kby_b ux_b^T   (da, da)
                 V = sum_b kbx_b ux_b^T + kby_b uy_b^T
      col side:  Wc = sum_b uy_b^T kbx_b - ux_b^T kby_b  (db, db)
                 Vc = sum_b ux_b^T kbx_b + uy_b^T kby_b
    """
    # Python-unrolled over the (capped) state batch: Mosaic can lower
    # neither dynamic slices of loop-carried values nor batch-contracted
    # dot_generals (probed on hardware)
    W = jnp.zeros_like(like_row)
    V = jnp.zeros_like(like_row)
    Wc = jnp.zeros_like(like_col)
    Vc = jnp.zeros_like(like_col)
    for b in range(nb):
        W += _dot(kbx[b], uy[b].T) - _dot(kby[b], ux[b].T)
        V += _dot(kbx[b], ux[b].T) + _dot(kby[b], uy[b].T)
        Wc += _dot(uy[b].T, kbx[b]) - _dot(ux[b].T, kby[b])
        Vc += _dot(ux[b].T, kbx[b]) + _dot(uy[b].T, kby[b])
    return W, V, Wc, Vc


def _diag_cotangent(kbx, kby, ux, uy):
    """dbar contribution: sum_b kbx_b * uy_b - kby_b * ux_b (elementwise
    on the (da, db) grid, reduced over the batch)."""
    return jnp.sum(kbx * uy - kby * ux, axis=0)


def _kron_cotangents(side: _Side, kbx, kby, ux, uy):
    """Stream cotangents of the kron pairs at one stage (full batched
    reductions):
      za_bar_k = sum_b <T1_k(kbx), uy> - <T1_k(kby), ux>
      zb_bar_k = sum_b <T2_k(kbx), ux> + <T2_k(kby), uy>
    """
    px = side._kron_products(kbx)
    py = side._kron_products(kby)
    za_bar, zb_bar = [], []
    for (x1, x2), (y1, y2) in zip(px, py):
        za_bar.append(
            jnp.sum((x1 + x2) * uy) - jnp.sum((y1 + y2) * ux)
        )
        zb_bar.append(
            jnp.sum((x1 - x2) * ux) + jnp.sum((y1 - y2) * uy)
        )
    return za_bar, zb_bar


def _kron_matrix_cotangents(side: _Side, kbx, kby, ux, uy, nb,
                            krbar, kcbar):
    """Accumulate cotangents of the kron PART MATRICES (R_k, C_k) at one
    stage — this is what makes qubit-distance gradients flow through the
    fused XY path (the interaction weights W_ij are folded into the kron
    matrices at build time, hamiltonian._xy_kron_terms).

    The kron term maps u -> za (R u C^T + R^T u C) + zb (R u C^T - R^T u C)
    split over re/im as in apply_minus_iH; with the stage-output cotangent
    (kbx, kby) of (h_im, -h_re) the coefficient fields are
        B1 = zb kbx - za kby   (of R ux C^T)   D1 = za kbx + zb kby
        B2 = -zb kbx - za kby  (of R^T ux C)   D2 = za kbx - zb kby
    and the matrix-calculus identities
        d/dR <B, R u C^T> = B C u^T      d/dC <B, R u C^T> = B^T R u
        d/dR <B, R^T u C> = u C B^T      d/dC <B, R^T u C> = u^T R B
    give per-batch accumulations of small matmul chains.
    """
    kr, _, kc, _, za, zb = side.kron
    Kn = kr.shape[0]
    krbar_new, kcbar_new = list(krbar), list(kcbar)
    for k in range(Kn):
        R_, C_ = kr[k], kc[k]
        dR = krbar[k]
        dC = kcbar[k]
        for b in range(nb):
            B1 = zb[k] * kbx[b] - za[k] * kby[b]
            B2 = -zb[k] * kbx[b] - za[k] * kby[b]
            D1 = za[k] * kbx[b] + zb[k] * kby[b]
            D2 = za[k] * kbx[b] - zb[k] * kby[b]
            uxC = _dot(ux[b], C_)
            uyC = _dot(uy[b], C_)
            dR = (
                dR
                + _dot(_dot(B1, C_), ux[b].T) + _dot(uxC, B2.T)
                + _dot(_dot(D1, C_), uy[b].T) + _dot(uyC, D2.T)
            )
            Rux = _dot(R_, ux[b])
            Ruy = _dot(R_, uy[b])
            dC = (
                dC
                + _dot(B1.T, Rux) + _dot(ux[b].T, _dot(R_, B2))
                + _dot(D1.T, Ruy) + _dot(uy[b].T, _dot(R_, D2))
            )
        krbar_new[k] = dR
        kcbar_new[k] = dC
    return tuple(krbar_new), tuple(kcbar_new)


def _bwd_interval(r: _Refs, k, x1, y1, lx, ly, dbar, krbar, kcbar,
                  *, pr, pc, nb, A, B_np, S, K, hoist=False):
    """Reverse one ERK interval: reconstruct the start state from the
    mirror-node streams, run the exact transpose of the stage recursion
    on the costate, and write the packed per-step coefficient cotangents.
    Returns (x0, y0, lx', ly', dbar', krbar', kcbar').

    Dispatches to the lean form (default: sides assembled on demand,
    cotangent accumulation fused into the reversed recursion — the
    low-VMEM-live-set form that fits the N=18 adjoint under the 128 MiB
    ceiling) or the wide round-3 form (PDT_KERNEL_WIDE_ADJ=1)."""
    fn = _bwd_interval_wide if _WIDE_ADJ else _bwd_interval_lean
    return fn(
        r, k, x1, y1, lx, ly, dbar, krbar, kcbar,
        pr=pr, pc=pc, nb=nb, A=A, B_np=B_np, S=S, K=K, hoist=hoist,
    )


def _bwd_step_prelude(r: _Refs, k, *, S, K, hoist=False):
    """Per-step h, two-word b-weights and (optionally hoisted) stream
    loads, shared by both adjoint interval forms."""
    h = r.hs[k, 0]
    if hoist:
        hbk, blk = r.hb_hi[k], r.hb_lo[k]
        bh = [hbk[s] for s in range(S)]
        bl = [blk[s] for s in range(S)]
        zstep = r.load_step(k, K=K, bwd=True)
    else:
        bh = [r.hb_hi[k, s] for s in range(S)]
        bl = [r.hb_lo[k, s] for s in range(S)]
        zstep = None
    bhl = [bh[s] + bl[s] for s in range(S)]
    return h, bhl, zstep


def _stage_cotangent_rows(r: _Refs, side, kbx, kby, ux, uy,
                          *, pr, pc, nb, K, krbar, kcbar):
    """One stage's packed scalar cotangent rows + kron-matrix updates
    (shared by both adjoint forms; identical arithmetic)."""
    W, V, Wc, Vc = _outer_accumulate(
        kbx, kby, ux, uy, nb, r.rp[0], r.cp[0]
    )
    rows = []
    for p in range(pr):
        g_sym = r.rp[p] + r.rpt[p]
        g_asym = r.rp[p] - r.rpt[p]
        rows.append(jnp.broadcast_to(jnp.sum(g_sym * W), (1, 128)))
        rows.append(jnp.broadcast_to(jnp.sum(g_asym * V), (1, 128)))
    for p in range(pc):
        g_sym_t = r.cpt[p] + r.cp[p]  # (P + P^T)^T layout for Gc
        g_asym_t = r.cpt[p] - r.cp[p]
        rows.append(jnp.broadcast_to(jnp.sum(g_sym_t * Wc), (1, 128)))
        rows.append(jnp.broadcast_to(jnp.sum(g_asym_t * Vc), (1, 128)))
    if K:
        za_bar, zb_bar = _kron_cotangents(side, kbx, kby, ux, uy)
        for k_ in range(K):
            rows.append(jnp.broadcast_to(za_bar[k_], (1, 128)))
            rows.append(jnp.broadcast_to(zb_bar[k_], (1, 128)))
        krbar, kcbar = _kron_matrix_cotangents(
            side, kbx, kby, ux, uy, nb, krbar, kcbar
        )
    return rows, krbar, kcbar


def _bwd_interval_lean(r: _Refs, k, x1, y1, lx, ly, dbar, krbar, kcbar,
                       *, pr, pc, nb, A, B_np, S, K, hoist=False):
    """Lean adjoint interval: identical math to the wide form, scheduled
    for a minimal VMEM live set.

    - Stage sides are assembled ON DEMAND (one live at a time) instead of
      all 2S up front — side re-assembly is P x da^2 VPU FMAs, noise next
      to the da^3 MXU matmuls it saves from spilling.
    - The per-stage cotangent work (outer products, kron/diag cotangents)
      runs INSIDE the reversed transpose recursion, so stage costates
      kb_s are consumed immediately instead of accumulating as a list.
    - The last forward stage application is skipped: fk[S-1] feeds no
      stage input (A is strictly lower triangular) and the transpose pass
      recomputes nothing from it.

    Only the cross-stage accumulation ORDER of dbar / kron-matrix
    cotangents changes (f32 reassociation ~1e-7); every per-value FMA
    chain is unchanged, so interpret-mode parity with the wide form holds
    at roundoff."""
    h, bhl, zstep = _bwd_step_prelude(r, k, S=S, K=K, hoist=hoist)

    def make_side(s, mirror=False):
        return r.side(k, s, K=K, pr=pr, pc=pc, mirror=mirror, zstep=zstep)

    # --- reconstruct y_k by reverse-time ERK from y_{k+1} (mirror sides
    # built per stage, never held) -------------------------------------
    rkx, rky = [], []
    for s in range(S):
        xs_, ys_ = x1, y1
        for j in range(s):
            a = A[s][j]
            if a != 0.0:
                c = a * h
                xs_ = xs_ - c * rkx[j]
                ys_ = ys_ - c * rky[j]
        kx, ky = make_side(s, mirror=True).apply_minus_iH(xs_, ys_, nb)
        rkx.append(kx)
        rky.append(ky)
    x0, y0 = x1, y1
    for s in range(S):
        if B_np[s] == 0.0:
            continue
        x0 = x0 - bhl[s] * rkx[s]
        y0 = y0 - bhl[s] * rky[s]

    lx_new, ly_new, dbar, krbar, kcbar, rows = _adjoint_core(
        r, x0, y0, lx, ly, dbar, krbar, kcbar, h, bhl, make_side,
        pr=pr, pc=pc, nb=nb, A=A, B_np=B_np, S=S, K=K,
    )
    r_used = len(rows)
    r_pad = r.zbar.shape[1]
    if r_used < r_pad:
        rows.append(jnp.zeros((r_pad - r_used, 128), jnp.float32))
    r.zbar[k] = jnp.concatenate(rows, axis=0)

    return x0, y0, lx_new, ly_new, dbar, krbar, kcbar


def _adjoint_core(r, x0, y0, lx, ly, dbar, krbar, kcbar, h, bhl, make_side,
                  *, pr, pc, nb, A, B_np, S, K):
    """Phases 2+3 of the lean adjoint interval, from the interval START
    state: forward stage recompute + reversed transpose recursion with
    fused cotangent work.  Shared by the in-kernel reverse-reconstruction
    form (_bwd_interval_lean) and the HBM-checkpointed form
    (_bwd_ckpt_kernel), so their per-stage arithmetic is identical.
    Returns (lx', ly', dbar', krbar', kcbar', rows)."""
    # --- recompute forward stage inputs u_s from y_k (fk[S-1] unused) --
    us = []
    fkx, fky = [], []
    for s in range(S):
        xs_, ys_ = x0, y0
        for j in range(s):
            a = A[s][j]
            if a != 0.0:
                c = a * h
                xs_ = xs_ + c * fkx[j]
                ys_ = ys_ + c * fky[j]
        us.append((xs_, ys_))
        if s < S - 1:
            kx, ky = make_side(s).apply_minus_iH(xs_, ys_, nb)
            fkx.append(kx)
            fky.append(ky)

    # --- reversed transpose recursion with fused cotangent work --------
    w = [None] * S
    rows_by_stage = [None] * S
    for s in reversed(range(S)):
        if B_np[s] != 0.0:
            gx = bhl[s] * lx
            gy = bhl[s] * ly
        else:
            gx = jnp.zeros_like(lx)
            gy = jnp.zeros_like(ly)
        for rr in range(s + 1, S):
            a = A[rr][s]
            if a != 0.0:
                c = a * h
                gx = gx + c * w[rr][0]
                gy = gy + c * w[rr][1]
        side_s = make_side(s)
        w[s] = side_s.apply_iH_transpose(gx, gy, nb)
        ux, uy = us[s]
        rows_by_stage[s], krbar, kcbar = _stage_cotangent_rows(
            r, side_s, gx, gy, ux, uy,
            pr=pr, pc=pc, nb=nb, K=K, krbar=krbar, kcbar=kcbar,
        )
        dbar = dbar + _diag_cotangent(gx, gy, ux, uy)
    lx_new, ly_new = lx, ly
    for s in range(S):
        lx_new = lx_new + w[s][0]
        ly_new = ly_new + w[s][1]

    rows = [row for srows in rows_by_stage for row in srows]
    return lx_new, ly_new, dbar, krbar, kcbar, rows


def _bwd_interval_wide(r: _Refs, k, x1, y1, lx, ly, dbar, krbar, kcbar,
                       *, pr, pc, nb, A, B_np, S, K, hoist=False):
    """Wide (round-3) adjoint interval: all stage sides assembled up
    front, cotangent pass as a separate phase.  Kept behind
    PDT_KERNEL_WIDE_ADJ=1 as the A/B reference for the lean form."""
    h, bhl, zstep = _bwd_step_prelude(r, k, S=S, K=K, hoist=hoist)

    sides = [r.side(k, s, K=K, pr=pr, pc=pc, zstep=zstep)
             for s in range(S)]
    sides_b = [r.side(k, s, K=K, pr=pr, pc=pc, mirror=True, zstep=zstep)
               for s in range(S)]

    # --- reconstruct y_k by reverse-time ERK from y_{k+1}: same tableau
    # with step -h, stages at the mirror nodes t1 - c_s h (dedicated
    # mirror streams); O(h^{p+1}) local reconstruction error -----------
    rkx, rky = [], []
    for s in range(S):
        xs_, ys_ = x1, y1
        for j in range(s):
            a = A[s][j]
            if a != 0.0:
                c = a * h
                xs_ = xs_ - c * rkx[j]
                ys_ = ys_ - c * rky[j]
        kx, ky = sides_b[s].apply_minus_iH(xs_, ys_, nb)
        rkx.append(kx)
        rky.append(ky)
    x0, y0 = x1, y1
    for s in range(S):
        if B_np[s] == 0.0:
            continue
        x0 = x0 - bhl[s] * rkx[s]
        y0 = y0 - bhl[s] * rky[s]

    # --- recompute forward stage inputs u_s from y_k ------------------
    us = []
    fkx, fky = [], []
    for s in range(S):
        xs_, ys_ = x0, y0
        for j in range(s):
            a = A[s][j]
            if a != 0.0:
                c = a * h
                xs_ = xs_ + c * fkx[j]
                ys_ = ys_ + c * fky[j]
        us.append((xs_, ys_))
        kx, ky = sides[s].apply_minus_iH(xs_, ys_, nb)
        fkx.append(kx)
        fky.append(ky)

    # --- exact transpose of the stage recursion -----------------------
    #   kb_s = h b_s lam' + sum_{r>s} h a_rs (F_r^T kb_r)
    #   lam  = lam' + sum_s F_s^T kb_s
    kb = [None] * S
    w = [None] * S
    for s in reversed(range(S)):
        if B_np[s] != 0.0:
            gx = bhl[s] * lx
            gy = bhl[s] * ly
        else:
            gx = jnp.zeros_like(lx)
            gy = jnp.zeros_like(ly)
        for rr in range(s + 1, S):
            a = A[rr][s]
            if a != 0.0:
                c = a * h
                gx = gx + c * w[rr][0]
                gy = gy + c * w[rr][1]
        kb[s] = (gx, gy)
        w[s] = sides[s].apply_iH_transpose(gx, gy, nb)
    lx_new, ly_new = lx, ly
    for s in range(S):
        lx_new = lx_new + w[s][0]
        ly_new = ly_new + w[s][1]

    # --- coefficient cotangents per stage -----------------------------
    # scalars cannot be stored to VMEM and SMEM outputs pad each scalar
    # to a full word line — so all per-step scalar cotangents are packed
    # as broadcast (1, 128) rows into one VMEM tile per step.
    rows = []
    for s in range(S):
        kbx, kby = kb[s]
        ux, uy = us[s]
        srows, krbar, kcbar = _stage_cotangent_rows(
            r, sides[s], kbx, kby, ux, uy,
            pr=pr, pc=pc, nb=nb, K=K, krbar=krbar, kcbar=kcbar,
        )
        rows.extend(srows)
        dbar = dbar + _diag_cotangent(kbx, kby, ux, uy)

    r_used = len(rows)
    r_pad = r.zbar.shape[1]
    if r_used < r_pad:
        rows.append(jnp.zeros((r_pad - r_used, 128), jnp.float32))
    r.zbar[k] = jnp.concatenate(rows, axis=0)

    return x0, y0, lx_new, ly_new, dbar, krbar, kcbar


def _bwd_kernel(*refs, n_steps, pr, pc, nb, A, B_np, S, K, states,
                n_eval=0, last_slot=0, hoist=False):
    r = _Refs(refs, K=K, bwd=True, states=states)
    _load_consts(r)

    # kron-matrix cotangent accumulators (tuples of per-term matrices:
    # Mosaic cannot lower dynamic slices of loop-carried values, so the
    # K axis is a static pytree, not an array dimension)
    def _kron_zero():
        if not K:
            return ((), ())
        da_, db_ = r.kr.shape[1], r.kc.shape[1]
        return (
            tuple(jnp.zeros((da_, da_), jnp.float32) for _ in range(K)),
            tuple(jnp.zeros((db_, db_), jnp.float32) for _ in range(K)),
        )

    def body(i, carry):
        x1, y1, lx, ly, dbar, krbar, kcbar = carry
        k = jnp.asarray(n_steps - 1, jnp.int32) - i
        x0, y0, lx, ly, dbar, krbar, kcbar = _bwd_interval(
            r, k, x1, y1, lx, ly, dbar, krbar, kcbar,
            pr=pr, pc=pc, nb=nb, A=A, B_np=B_np, S=S, K=K, hoist=hoist,
        )
        if states:
            # grid point k: reload the stored state / add slot cotangent
            slot = r.slots[k]
            valid = slot < n_eval
            safe = jnp.where(valid, slot, jnp.int32(0))
            x0 = jnp.where(valid, r.in_re[safe], x0)
            y0 = jnp.where(valid, r.in_im[safe], y0)
            lx = lx + jnp.where(valid, r.lam_re[safe], jnp.zeros_like(lx))
            ly = ly + jnp.where(valid, r.lam_im[safe], jnp.zeros_like(ly))
        return (x0, y0, lx, ly, dbar, krbar, kcbar)

    if states:
        # i32 indices: python ints become i64 under x64, which Mosaic's
        # convert helper cannot lower (infinite recursion)
        init = (
            r.in_re[jnp.int32(last_slot)],
            r.in_im[jnp.int32(last_slot)],
            r.lam_re[jnp.int32(last_slot)],
            r.lam_im[jnp.int32(last_slot)],
            jnp.zeros_like(r.diag[...]),
        ) + _kron_zero()
    else:
        init = (
            r.in_re[...],
            r.in_im[...],
            r.lam_re[...],
            r.lam_im[...],
            jnp.zeros_like(r.diag[...]),
        ) + _kron_zero()
    x0, y0, lx, ly, dbar, krbar, kcbar = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n_steps), body, init
    )
    r.lam0_re[...] = lx
    r.lam0_im[...] = ly
    r.dbar[...] = dbar
    if K:
        for k_ in range(K):
            r.krbar[k_] = krbar[k_]
            r.kcbar[k_] = kcbar[k_]


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


def _unpack_zbar(zbar_packed, n_steps, pr, pc, K, S):
    """(R, n_steps, r_pad, 128) packed rows -> per-stream cotangents."""
    width = 2 * pr + 2 * pc + 2 * K
    r_used = S * width
    flat = zbar_packed[:, :, :r_used, 0].reshape(
        zbar_packed.shape[0], n_steps, S, width
    )
    zbar_rr = flat[..., 0 : 2 * pr : 2]
    zbar_ri = flat[..., 1 : 2 * pr : 2]
    zbar_cr = flat[..., 2 * pr : 2 * pr + 2 * pc : 2]
    zbar_ci = flat[..., 2 * pr + 1 : 2 * pr + 2 * pc : 2]
    if K:
        zbar_kr = flat[..., 2 * pr + 2 * pc :: 2]
        zbar_ki = flat[..., 2 * pr + 2 * pc + 1 :: 2]
    else:
        zbar_kr = zbar_ki = None
    return zbar_rr, zbar_ri, zbar_cr, zbar_ci, zbar_kr, zbar_ki


# data-dict keys for the staged streams, in kernel order
_ZF_KEYS = (
    "zrh_re", "zrh_im", "zrl_re", "zrl_im",
    "zch_re", "zch_im", "zcl_re", "zcl_im",
)
_ZB_KEYS = ("zbr_re", "zbr_im", "zbc_re", "zbc_im")
_ZKF_KEYS = ("zkh_re", "zkh_im", "zkl_re", "zkl_im")
_ZKB_KEYS = ("zkb_re", "zkb_im")


def _dims(data):
    R = int(data["psi_re"].shape[0])
    n_steps = int(data["hs"].shape[0])
    pr = int(data["rp"].shape[0])
    pc = int(data["cp"].shape[0])
    nb = int(data["psi_re"].shape[1])
    K = int(data["kr"].shape[1]) if "kr" in data else 0
    return R, n_steps, pr, pc, nb, K


def _tableau(method: str):
    C, A, B = _TABLEAUS[method]
    return tuple(tuple(row) for row in A), tuple(float(b) for b in B), len(C)


def _build_call(data, method, interpret, *, bwd, states, slots=None,
                n_eval=0, last_slot=0, extra_in=()):
    """Assemble the pallas_call for any of the four kernel variants."""
    from jax.experimental import pallas as pl

    R, n_steps, pr, pc, nb, K = _dims(data)
    A, B_np, S = _tableau(method)
    rp, cp = data["rp"], data["cp"]
    rpt = jnp.swapaxes(rp, -1, -2)
    cpt = jnp.swapaxes(cp, -1, -2)
    run_block, shared, smem = _specs(R)
    f32 = jnp.float32
    psi_shape = data["psi_re"].shape  # (R, nb, da, db)

    args = []
    specs = []

    def add(x, spec):
        args.append(x)
        specs.append(spec)

    if bwd:
        in_re, in_im, lam_re, lam_im = extra_in
        for x in (in_re, in_im, lam_re, lam_im):
            add(x, run_block(x.shape))
    else:
        add(data["psi_re"], run_block(psi_shape))
        add(data["psi_im"], run_block(psi_shape))
    for x in (rp, rpt, cp, cpt):
        add(x, shared(x.shape))
    for k in _ZF_KEYS:
        add(data[k], run_block(data[k].shape))
    if bwd:
        for k in _ZB_KEYS:
            add(data[k], run_block(data[k].shape))
    if K:
        kr, kc = data["kr"], data["kc"]
        krt = jnp.swapaxes(kr, -1, -2)
        kct = jnp.swapaxes(kc, -1, -2)
        for x in (kr, krt, kc, kct):
            add(x, run_block(x.shape))
        for k in _ZKF_KEYS:
            add(data[k], run_block(data[k].shape))
        if bwd:
            for k in _ZKB_KEYS:
                add(data[k], run_block(data[k].shape))
    add(data["hb_hi"], shared((n_steps, S)))
    add(data["hb_lo"], shared((n_steps, S)))
    add(data["hs"].reshape(n_steps, 1), shared((n_steps, 1)))
    add(data["diag"], run_block(data["diag"].shape))
    add(data["diag_lo"], run_block(data["diag_lo"].shape))
    if states:
        slots_arr = jnp.asarray(slots, jnp.int32)
        add(slots_arr, smem(slots_arr.shape))

    kern = partial(
        _bwd_kernel if bwd else _fwd_kernel,
        n_steps=n_steps, pr=pr, pc=pc, nb=nb,
        A=A, B_np=B_np, S=S, K=K, states=states, n_eval=n_eval,
        hoist=_hoist_default(psi_shape[-2] * psi_shape[-1]),
        **({"last_slot": int(last_slot)} if bwd else {}),
    )

    if bwd:
        r_used = S * (2 * pr + 2 * pc + 2 * K)
        r_pad = int(np.ceil(r_used / 8) * 8)  # (8, 128) f32 tiling
        zbar_shape = (R, n_steps, r_pad, 128)
        out_shape = (
            jax.ShapeDtypeStruct(psi_shape, f32),
            jax.ShapeDtypeStruct(psi_shape, f32),
            jax.ShapeDtypeStruct(zbar_shape, f32),
            jax.ShapeDtypeStruct(data["diag"].shape, f32),
        )
        out_specs = (
            run_block(psi_shape), run_block(psi_shape),
            run_block(zbar_shape), run_block(data["diag"].shape),
        )
        if K:
            kr_shape = data["kr"].shape  # (R, K, da, da)
            kc_shape = data["kc"].shape
            out_shape = out_shape + (
                jax.ShapeDtypeStruct(kr_shape, f32),
                jax.ShapeDtypeStruct(kc_shape, f32),
            )
            out_specs = out_specs + (
                run_block(kr_shape), run_block(kc_shape),
            )
    else:
        oshape = (
            (R, n_eval) + tuple(psi_shape[1:]) if states else psi_shape
        )
        out_shape = (
            jax.ShapeDtypeStruct(oshape, f32),
            jax.ShapeDtypeStruct(oshape, f32),
        )
        out_specs = (run_block(oshape), run_block(oshape))

    if interpret:
        compiler_params = None
    else:
        # Mosaic's default scoped-VMEM cap is 16 MiB; at N=16 atoms the
        # DP5 stage set (state + 7 stage buffers at da=db=256, re+im,
        # hi/lo words) needs ~17.2 MiB and the compile fails with
        # "Ran out of memory in memory space vmem".  v5e has 128 MiB of
        # VMEM per core — raise the cap (it is a limit, not an
        # allocation; small kernels are unaffected).  125 MiB leaves a
        # sliver for XLA's own windows; the RK4 adjoint at N=18
        # (118.3 MiB of register-spill scratch) fits under it where the
        # old 100 MiB cap rejected it (SCALING.md).
        from jax.experimental.pallas import tpu as pltpu

        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=125 * 1024 * 1024
        )
    return pl.pallas_call(
        kern,
        grid=(R,),
        out_shape=out_shape,
        in_specs=specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=compiler_params,
    )(*args)


def _zero_like_aux(data, zbar, dbar, lam0_re, lam0_im,
                   krbar=None, kcbar=None):
    """Assemble the cotangent dict: streams/diag/psi/kron-matrices carry
    gradients, everything structural (parts, step sizes, mirror streams)
    is zero."""
    zbar_rr, zbar_ri, zbar_cr, zbar_ci, zbar_kr, zbar_ki = zbar
    out = {k: jnp.zeros_like(v) for k, v in data.items()}
    # hi and lo words are summed in-kernel -> identical cotangents; the
    # linear hi/lo split recombines them exactly under autodiff
    out["zrh_re"], out["zrh_im"] = zbar_rr, zbar_ri
    out["zrl_re"], out["zrl_im"] = zbar_rr, zbar_ri
    out["zch_re"], out["zch_im"] = zbar_cr, zbar_ci
    out["zcl_re"], out["zcl_im"] = zbar_cr, zbar_ci
    if zbar_kr is not None:
        out["zkh_re"], out["zkh_im"] = zbar_kr, zbar_ki
        out["zkl_re"], out["zkl_im"] = zbar_kr, zbar_ki
    if krbar is not None:
        out["kr"], out["kc"] = krbar, kcbar
    out["diag"] = dbar
    out["diag_lo"] = dbar
    out["psi_re"], out["psi_im"] = lam0_re, lam0_im
    return out


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_evolve(method, interpret, data):
    """Fused f32 ERK evolution (final state) with adjoint gradients.

    ``data`` is the dict built by :func:`prepare_fused_inputs` — all of
    z*/diag*/psi* carry a leading Monte-Carlo runs axis mapped onto the
    kernel grid.  Differentiable in the stage coefficients (hi+lo), the
    interaction diagonal, the initial state and the kron part matrices
    (XY qubit-distance gradients); step sizes / row-col part stacks /
    mirror-node streams are constant.
    """
    return _build_call(data, method, interpret, bwd=False, states=False)


def _fused_fwd(method, interpret, data):
    out = _build_call(data, method, interpret, bwd=False, states=False)
    return out, (data, out[0], out[1])


def _fused_bwd(method, interpret, res, cot):
    data, outF_re, outF_im = res
    lamF_re, lamF_im = cot
    R, n_steps, pr, pc, nb, K = _dims(data)
    _, _, S = _tableau(method)
    outs = _build_call(
        data, method, interpret, bwd=True, states=False,
        extra_in=(outF_re, outF_im, lamF_re, lamF_im),
    )
    lam0_re, lam0_im, zbar_packed, dbar = outs[:4]
    krbar, kcbar = (outs[4], outs[5]) if K else (None, None)
    zbar = _unpack_zbar(zbar_packed, n_steps, pr, pc, K, S)
    return (
        _zero_like_aux(data, zbar, dbar, lam0_re, lam0_im, krbar, kcbar),
    )


fused_evolve.defvjp(_fused_fwd, _fused_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def fused_evolve_states(method, interpret, slots, n_eval, last_slot, data):
    """Fused f32 ERK evolution emitting every evaluation-slot state, with
    adjoint gradients (run-major batch like :func:`fused_evolve`).

    slots: static tuple of ints, length n_steps+1 (grid write slots);
    n_eval: number of evaluation slots; last_slot: the final grid point's
    slot (always valid — T is an eval time).
    Returns (R, n_eval, nb, da, db) re/im.
    """
    return _build_call(
        data, method, interpret, bwd=False, states=True,
        slots=slots, n_eval=n_eval,
    )


def _fused_states_fwd(method, interpret, slots, n_eval, last_slot, data):
    out = _build_call(
        data, method, interpret, bwd=False, states=True,
        slots=slots, n_eval=n_eval,
    )
    return out, (data, out[0], out[1])


def _fused_states_bwd(method, interpret, slots, n_eval, last_slot, res, cot):
    data, states_re, states_im = res
    lam_re, lam_im = cot
    R, n_steps, pr, pc, nb, K = _dims(data)
    _, _, S = _tableau(method)
    outs = _build_call(
        data, method, interpret, bwd=True, states=True,
        slots=slots, n_eval=n_eval, last_slot=last_slot,
        extra_in=(states_re, states_im, lam_re, lam_im),
    )
    lam0_re, lam0_im, zbar_packed, dbar = outs[:4]
    krbar, kcbar = (outs[4], outs[5]) if K else (None, None)
    zbar = _unpack_zbar(zbar_packed, n_steps, pr, pc, K, S)
    return (
        _zero_like_aux(data, zbar, dbar, lam0_re, lam0_im, krbar, kcbar),
    )


fused_evolve_states.defvjp(_fused_states_fwd, _fused_states_bwd)


# ----------------------------------------------------------------------
# HBM-checkpointed fused adjoint (the N=18 fused-gradient path)
# ----------------------------------------------------------------------
# The in-kernel adjoint reconstructs the reverse trajectory inside ONE
# grid step per run, so Mosaic schedules the whole 166-step recursion as
# a single straight-line loop body and spills ~155 MiB of reordered live
# values at dim 2^18 (SCALING.md: byte-identical across the wide/lean/
# hoist forms — a compiler-scheduling wall, not a dataflow wall).  The
# checkpointed form changes the STRUCTURE instead of the schedule:
#   - the forward kernel runs with grid (R, n_steps), carrying the state
#     in constant-index output blocks (revisited blocks persist in VMEM
#     across grid steps) and writing EVERY step state to an HBM-resident
#     per-step output block ((R, n_steps, nb, da, db) — 332 MB at N=18,
#     trivially HBM);
#   - the adjoint kernel also runs with grid (R, n_steps), REVERSED via
#     its index maps: each grid step DMAs one stored start state in,
#     skips the reverse-time reconstruction entirely (no mirror sides,
#     no rkx/rky stage set) and runs only the forward-stage recompute +
#     transpose recursion (_adjoint_core — arithmetic shared with the
#     lean form, so parity is structural).
# Per-grid-step VMEM is one interval minus the reconstruction phase
# (~2/3 of the dataflow live set), and stored states double as EXACT
# interval starts (the in-kernel form's reverse reconstruction is only
# O(h^{p+1}) accurate).  Two DMAs of ~1-2 MB per step ride under the
# ~0.6 ms/step compute at N=18.
def _specs_ckpt(n_steps: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _z():
        return jnp.zeros((), jnp.int32)

    def _i(v):
        return jnp.asarray(v, jnp.int32)

    def run_const(shape):
        rest = shape[1:]
        return pl.BlockSpec(
            (None,) + tuple(rest),
            lambda r, k: (_i(r),) + (_z(),) * len(rest),
            memory_space=pltpu.VMEM,
        )

    def shared(shape):
        n = len(shape)
        return pl.BlockSpec(
            tuple(shape), lambda r, k: (_z(),) * n,
            memory_space=pltpu.VMEM,
        )

    def step_block(shape, rev=False, shift=False):
        rest = shape[2:]

        def imap(r, k):
            step = (_i(n_steps - 1) - _i(k)) if rev else _i(k)
            if shift:
                step = jnp.maximum(step - 1, _z())
            return (_i(r), step) + (_z(),) * len(rest)

        return pl.BlockSpec(
            (None, None) + tuple(rest), imap, memory_space=pltpu.VMEM
        )

    return run_const, shared, step_block


def _fwd_ckpt_kernel(*refs, n_steps, pr, pc, nb, A, B_np, S, K):
    from jax.experimental import pallas as pl

    r = _Refs(refs, K=K, bwd=False, states=False, ckpt=True)
    _load_consts(r)
    k = jnp.asarray(pl.program_id(1), jnp.int32)

    @pl.when(k == jnp.int32(0))
    def _():
        r.car_x[...] = r.psi_re[...]
        r.car_y[...] = r.psi_im[...]
        r.car_cx[...] = jnp.zeros_like(r.psi_re[...])
        r.car_cy[...] = jnp.zeros_like(r.psi_im[...])

    x, y = r.car_x[...], r.car_y[...]
    cx, cy = r.car_cx[...], r.car_cy[...]
    h = r.hs[k, 0]
    bh = [r.hb_hi[k, s] for s in range(S)]
    bl = [r.hb_lo[k, s] for s in range(S)]

    def stage(s, xs, ys):
        return r.side(k, s, K=K, pr=pr, pc=pc).apply_minus_iH(xs, ys, nb)

    dx, dy = _erk_increment(stage, x, y, h, bh, bl, A, B_np, S)
    x, cx = _kahan_add(x, cx, dx)
    y, cy = _kahan_add(y, cy, dy)
    r.out_re[...] = x
    r.out_im[...] = y
    r.car_x[...], r.car_y[...] = x, y
    r.car_cx[...], r.car_cy[...] = cx, cy


def _bwd_ckpt_kernel(*refs, n_steps, pr, pc, nb, A, B_np, S, K):
    from jax.experimental import pallas as pl

    r = _Refs(refs, K=K, bwd=True, states=False, ckpt=True)
    _load_consts(r)
    i = jnp.asarray(pl.program_id(1), jnp.int32)
    k = jnp.asarray(n_steps - 1, jnp.int32) - i  # reverse-time step

    @pl.when(i == jnp.int32(0))
    def _():
        r.lam0_re[...] = jnp.zeros_like(r.lam_re[...])
        r.lam0_im[...] = jnp.zeros_like(r.lam_im[...])
        r.dbar[...] = jnp.zeros_like(r.diag_v)
        if K:
            for k_ in range(K):
                r.krbar[k_] = jnp.zeros_like(r.kr[k_])
                r.kcbar[k_] = jnp.zeros_like(r.kc[k_])

    # inject the cotangent of the state at grid point k+1 (= stored[k]):
    # lam is a per-step block, so eval-time cotangents arrive exactly at
    # their steps and a final-state-only loss is just a one-hot lam
    lx = r.lam0_re[...] + r.lam_re[...]
    ly = r.lam0_im[...] + r.lam_im[...]
    dbar = r.dbar[...]
    krbar = tuple(r.krbar[k_] for k_ in range(K)) if K else ()
    kcbar = tuple(r.kcbar[k_] for k_ in range(K)) if K else ()

    # interval start state: stored[k-1] (the block's index map clamps
    # k-1 to 0, so the DMA is always in range); psi0 at k == 0
    use0 = k == jnp.int32(0)
    x0 = jnp.where(use0, r.psi_re[...], r.in_re[...])
    y0 = jnp.where(use0, r.psi_im[...], r.in_im[...])

    h = r.hs[k, 0]
    bh = [r.hb_hi[k, s] for s in range(S)]
    bl = [r.hb_lo[k, s] for s in range(S)]
    bhl = [bh[s] + bl[s] for s in range(S)]

    def make_side(s, mirror=False):
        return r.side(k, s, K=K, pr=pr, pc=pc)

    lx, ly, dbar, krbar, kcbar, rows = _adjoint_core(
        r, x0, y0, lx, ly, dbar, krbar, kcbar, h, bhl, make_side,
        pr=pr, pc=pc, nb=nb, A=A, B_np=B_np, S=S, K=K,
    )
    r_used = len(rows)
    r_pad = r.zbar.shape[0]
    if r_used < r_pad:
        rows.append(jnp.zeros((r_pad - r_used, 128), jnp.float32))
    r.zbar[...] = jnp.concatenate(rows, axis=0)
    r.lam0_re[...], r.lam0_im[...] = lx, ly
    r.dbar[...] = dbar
    if K:
        for k_ in range(K):
            r.krbar[k_] = krbar[k_]
            r.kcbar[k_] = kcbar[k_]


def _build_ckpt_call(data, method, interpret, *, bwd, extra_in=()):
    """pallas_call for the checkpointed forward/adjoint kernels
    (grid (R, n_steps); per-step stored-state blocks, constant-index
    carry blocks)."""
    from jax.experimental import pallas as pl

    R, n_steps, pr, pc, nb, K = _dims(data)
    A, B_np, S = _tableau(method)
    rp, cp = data["rp"], data["cp"]
    rpt = jnp.swapaxes(rp, -1, -2)
    cpt = jnp.swapaxes(cp, -1, -2)
    run_const, shared, step_block = _specs_ckpt(n_steps)
    f32 = jnp.float32
    psi_shape = data["psi_re"].shape  # (R, nb, da, db)
    states_shape = (R, n_steps) + tuple(psi_shape[1:])

    args, specs = [], []

    def add(x, spec):
        args.append(x)
        specs.append(spec)

    if bwd:
        st_re, st_im, lam_re, lam_im = extra_in
        add(st_re, step_block(states_shape, rev=True, shift=True))
        add(st_im, step_block(states_shape, rev=True, shift=True))
        add(data["psi_re"], run_const(psi_shape))
        add(data["psi_im"], run_const(psi_shape))
        # per-step cotangents (R, n_steps, nb, da, db), reversed with k
        add(lam_re, step_block(states_shape, rev=True))
        add(lam_im, step_block(states_shape, rev=True))
    else:
        add(data["psi_re"], run_const(psi_shape))
        add(data["psi_im"], run_const(psi_shape))
    for x in (rp, rpt, cp, cpt):
        add(x, shared(x.shape))
    for key in _ZF_KEYS:
        add(data[key], run_const(data[key].shape))
    if K:
        kr, kc = data["kr"], data["kc"]
        krt = jnp.swapaxes(kr, -1, -2)
        kct = jnp.swapaxes(kc, -1, -2)
        for x in (kr, krt, kc, kct):
            add(x, run_const(x.shape))
        for key in _ZKF_KEYS:
            add(data[key], run_const(data[key].shape))
    add(data["hb_hi"], shared((n_steps, S)))
    add(data["hb_lo"], shared((n_steps, S)))
    add(data["hs"].reshape(n_steps, 1), shared((n_steps, 1)))
    add(data["diag"], run_const(data["diag"].shape))
    add(data["diag_lo"], run_const(data["diag_lo"].shape))

    kern = partial(
        _bwd_ckpt_kernel if bwd else _fwd_ckpt_kernel,
        n_steps=n_steps, pr=pr, pc=pc, nb=nb,
        A=A, B_np=B_np, S=S, K=K,
    )

    if bwd:
        r_used = S * (2 * pr + 2 * pc + 2 * K)
        r_pad = int(np.ceil(r_used / 8) * 8)
        zbar_shape = (R, n_steps, r_pad, 128)
        out_shape = (
            jax.ShapeDtypeStruct(psi_shape, f32),
            jax.ShapeDtypeStruct(psi_shape, f32),
            jax.ShapeDtypeStruct(zbar_shape, f32),
            jax.ShapeDtypeStruct(data["diag"].shape, f32),
        )
        out_specs = (
            run_const(psi_shape), run_const(psi_shape),
            step_block(zbar_shape, rev=True), run_const(data["diag"].shape),
        )
        if K:
            kr_shape, kc_shape = data["kr"].shape, data["kc"].shape
            out_shape = out_shape + (
                jax.ShapeDtypeStruct(kr_shape, f32),
                jax.ShapeDtypeStruct(kc_shape, f32),
            )
            out_specs = out_specs + (
                run_const(kr_shape), run_const(kc_shape),
            )
    else:
        out_shape = (
            jax.ShapeDtypeStruct(states_shape, f32),
            jax.ShapeDtypeStruct(states_shape, f32),
        ) + (jax.ShapeDtypeStruct(psi_shape, f32),) * 4
        out_specs = (
            step_block(states_shape), step_block(states_shape),
        ) + (run_const(psi_shape),) * 4

    if interpret:
        compiler_params = None
    else:
        from jax.experimental.pallas import tpu as pltpu

        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=125 * 1024 * 1024
        )
    return pl.pallas_call(
        kern,
        grid=(R, n_steps),
        out_shape=out_shape,
        in_specs=specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=compiler_params,
    )(*args)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_evolve_ckpt(method, interpret, data):
    """Fused f32 ERK evolution emitting EVERY step state
    ((R, n_steps, nb, da, db) re/im — state after step k at index k),
    with the HBM-checkpointed adjoint: the backward sweep reads exact
    per-step states from the HBM buffer instead of reconstructing them
    in reverse, and accepts cotangents at every step — the form whose
    adjoint fits VMEM at dim 2^18 (N=18).  Slice [:, -1] for the final
    state; gather eval slots for the states contract."""
    outs = _build_ckpt_call(data, method, interpret, bwd=False)
    return outs[0], outs[1]


def _fused_ckpt_fwd(method, interpret, data):
    outs = _build_ckpt_call(data, method, interpret, bwd=False)
    st_re, st_im = outs[0], outs[1]
    return (st_re, st_im), (data, st_re, st_im)


def _fused_ckpt_bwd(method, interpret, res, cot):
    data, st_re, st_im = res
    lam_re, lam_im = cot
    R, n_steps, pr, pc, nb, K = _dims(data)
    _, _, S = _tableau(method)
    outs = _build_ckpt_call(
        data, method, interpret, bwd=True,
        extra_in=(st_re, st_im, lam_re, lam_im),
    )
    lam0_re, lam0_im, zbar_packed, dbar = outs[:4]
    krbar, kcbar = (outs[4], outs[5]) if K else (None, None)
    zbar = _unpack_zbar(zbar_packed, n_steps, pr, pc, K, S)
    return (
        _zero_like_aux(data, zbar, dbar, lam0_re, lam0_im, krbar, kcbar),
    )


fused_evolve_ckpt.defvjp(_fused_ckpt_fwd, _fused_ckpt_bwd)


# ----------------------------------------------------------------------
# public entry points
# ----------------------------------------------------------------------
def _stage_all(ham: FactoredHamiltonian, grid_times, method: str):
    """Forward-node (hi/lo split) + mirror-node staged streams."""
    C, _, B = _TABLEAUS[method]
    zr, zc, zk, hs = _precompute_stage_z(ham, grid_times, C)
    zbr, zbc, zbk, _ = _precompute_stage_z(ham, grid_times, 1.0 - C)
    hb = hs[:, None] * jnp.asarray(B, hs.dtype)[None, :]
    f32 = jnp.float32
    out = {}
    for key_hi, key_lo, arr in (
        ("zrh_re", "zrl_re", zr.re), ("zrh_im", "zrl_im", zr.im),
        ("zch_re", "zcl_re", zc.re), ("zch_im", "zcl_im", zc.im),
    ):
        hi, lo = _split_hi_lo(arr)
        out[key_hi], out[key_lo] = hi, lo
    out["zbr_re"] = zbr.re.astype(f32)
    out["zbr_im"] = zbr.im.astype(f32)
    out["zbc_re"] = zbc.re.astype(f32)
    out["zbc_im"] = zbc.im.astype(f32)
    if zk is not None:
        for key_hi, key_lo, arr in (
            ("zkh_re", "zkl_re", zk.re), ("zkh_im", "zkl_im", zk.im),
        ):
            hi, lo = _split_hi_lo(arr)
            out[key_hi], out[key_lo] = hi, lo
        out["zkb_re"] = zbk.re.astype(f32)
        out["zkb_im"] = zbk.im.astype(f32)
    hb_hi, hb_lo = _split_hi_lo(hb)
    out["hb_hi"], out["hb_lo"] = hb_hi, hb_lo
    out["hs"] = hs.astype(f32)
    return out


def prepare_fused_inputs(
    ham: FactoredHamiltonian,
    psi0: Cplx,
    grid_times: jax.Array,
    method: str = "DP5",
) -> dict:
    """Stage-precompute + two-word f32 casts, with a leading R=1 run axis.

    Builds everything the fused kernels consume: forward-node stream
    values split hi/lo, mirror-node (1-c) stream values for the adjoint's
    reverse-time reconstruction, two-word h*b_s update weights, the
    two-word interaction diagonal, and the kron-pair term data (XY).
    """
    if int(psi0.re.shape[0]) > _NB_MAX:
        raise ValueError(
            f"Fused kernels support state batches up to nb={_NB_MAX} "
            "(the adjoint unrolls per-state outer products); use the XLA "
            "path (fused=False) for full gate-matrix batches."
        )
    f32 = jnp.float32
    staged = _stage_all(ham, grid_times, method)
    data = {}
    for k, v in staged.items():
        if k in ("hb_hi", "hb_lo", "hs"):
            data[k] = v
        else:
            data[k] = v[None]
    diag, diag_lo = _split_hi_lo(ham.int_diag)
    data["rp"] = ham.row_parts.astype(f32)
    data["cp"] = ham.col_parts.astype(f32)
    data["diag"] = diag[None]
    data["diag_lo"] = diag_lo[None]
    data["psi_re"] = psi0.re.astype(f32)[None]
    data["psi_im"] = psi0.im.astype(f32)[None]
    if ham.kron_row is not None:
        data["kr"] = ham.kron_row.astype(f32)[None]
        data["kc"] = ham.kron_col.astype(f32)[None]
    return data


def pallas_evolve(
    ham: FactoredHamiltonian,
    psi0: Cplx,
    grid_times: jax.Array,
    method: str = "DP5",
    interpret: bool = False,
    ckpt: bool = False,
) -> Cplx:
    """Evolve psi0 (nb, da, db) over grid_times with the fused ERK kernel.

    Returns the FINAL state only (f32), differentiable w.r.t. the
    Hamiltonian coefficient streams / interaction diagonal / psi0 via the
    Pallas adjoint kernel.  ``ckpt=True`` selects the HBM-checkpointed
    adjoint (per-step states stored by a (R, n_steps)-grid forward, the
    backward sweep skips reverse reconstruction) — the form for sizes
    where the in-kernel adjoint's register spill exceeds VMEM (N=18).
    """
    data = prepare_fused_inputs(ham, psi0, grid_times, method)
    if ckpt:
        st_re, st_im = fused_evolve_ckpt(method, interpret, data)
        return Cplx(st_re[0, -1], st_im[0, -1])
    out_re, out_im = fused_evolve(method, interpret, data)
    return Cplx(out_re[0], out_im[0])


def pallas_evolve_states(
    ham: FactoredHamiltonian,
    psi0: Cplx,
    grid,
    method: str = "DP5",
    interpret: bool = False,
    ckpt: bool = False,
) -> Cplx:
    """Fused evolution emitting states at the grid's evaluation slots:
    (n_eval, nb, da, db), f32 — DIFFERENTIABLE via the states-adjoint
    kernel (the backward sweep reloads stored eval states, so with dense
    evaluation times the reconstruction is exact).

    ``ckpt=True``: the HBM-checkpointed form — the kernel stores EVERY
    step state, the eval slots are XLA-side gathers (their cotangents
    scatter back into the per-step lam buffer automatically), and the
    adjoint needs no in-kernel reverse reconstruction (the N=18 path).
    """
    data = prepare_fused_inputs(ham, psi0, grid.times, method)
    slots = tuple(int(s) for s in np.asarray(grid.write_slots))
    last_slot = slots[-1]
    if last_slot >= grid.n_eval:
        raise ValueError(
            "The final grid point must carry an evaluation slot (the "
            "emulator always unions {0, T} into evaluation times)."
        )
    if ckpt:
        st_re, st_im = fused_evolve_ckpt(method, interpret, data)
        # grid point g (0..n_steps) carries slot s when slots[g] = s <
        # n_eval; state at g is psi0 for g = 0, stored[g-1] otherwise
        by_slot = {s: g for g, s in enumerate(slots) if s < grid.n_eval}
        res, ims = [], []
        for s in range(grid.n_eval):
            g = by_slot[s]
            if g == 0:
                res.append(data["psi_re"][0])
                ims.append(data["psi_im"][0])
            else:
                res.append(st_re[0, g - 1])
                ims.append(st_im[0, g - 1])
        return Cplx(jnp.stack(res), jnp.stack(ims))
    out_re, out_im = fused_evolve_states(
        method, interpret, slots, int(grid.n_eval), last_slot, data
    )
    return Cplx(out_re[0], out_im[0])


def pallas_evolve_mc(
    hams: FactoredHamiltonian,
    psi0: Cplx,
    grid,
    method: str = "DP5",
    interpret: bool = False,
    ckpt: bool = False,
) -> Cplx:
    """Monte-Carlo batched fused evolution: ``hams`` carries a leading
    runs axis R on its streams/diagonal (build with
    ``jax.vmap(h.build_data)(draws)``), psi0 is (nb, da, db) shared or
    (R, nb, da, db) per-run.  Returns (R, n_eval, nb, da, db) states,
    differentiable.  The runs axis is the kernel grid — one launch for
    the whole Monte-Carlo batch.  ``ckpt=True`` uses the
    HBM-checkpointed form (grid (R, n_steps), eval slots gathered
    XLA-side) — same dim >= 2^16 rationale as pallas_evolve_states."""
    f32 = jnp.float32
    R = int(hams.row_streams.re.shape[0])
    rp = hams.row_parts[0] if hams.row_parts.ndim == 4 else hams.row_parts
    cp = hams.col_parts[0] if hams.col_parts.ndim == 4 else hams.col_parts
    sdt = (
        hams.sample_dt.reshape(-1)[0] if hams.sample_dt.ndim
        else hams.sample_dt
    )
    has_kron = hams.kron_row is not None

    def stage_one(leaves):
        h1 = hams._replace(
            row_streams=Cplx(leaves["rs_re"], leaves["rs_im"]),
            col_streams=Cplx(leaves["cs_re"], leaves["cs_im"]),
            int_diag=leaves["diag"],
            kron_row=leaves.get("kron_row"),
            kron_col=leaves.get("kron_col"),
            kron_streams=(
                Cplx(leaves["ks_re"], leaves["ks_im"])
                if has_kron else None
            ),
            row_parts=rp,
            col_parts=cp,
            sample_dt=sdt,
            # vmap batches the int n_samples leaf into an array; the
            # static value is just the stream length
            n_samples=int(hams.row_streams.re.shape[-1]),
        )
        return _stage_all(h1, grid.times, method)

    leaves = dict(
        rs_re=hams.row_streams.re, rs_im=hams.row_streams.im,
        cs_re=hams.col_streams.re, cs_im=hams.col_streams.im,
        diag=hams.int_diag,
    )
    if has_kron:
        leaves["kron_row"] = hams.kron_row
        leaves["kron_col"] = hams.kron_col
        leaves["ks_re"] = hams.kron_streams.re
        leaves["ks_im"] = hams.kron_streams.im
    staged = jax.vmap(stage_one)(leaves)
    data = {}
    for k, v in staged.items():
        if k in ("hb_hi", "hb_lo", "hs"):
            data[k] = v[0]
        else:
            data[k] = v
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
    diag, diag_lo = _split_hi_lo(hams.int_diag)
    data["rp"] = rp.astype(f32)
    data["cp"] = cp.astype(f32)
    data["diag"] = diag
    data["diag_lo"] = diag_lo
    data["psi_re"] = psi_re
    data["psi_im"] = psi_im
    if has_kron:
        kr = hams.kron_row
        kc = hams.kron_col
        if kr.ndim == 3:  # shared across runs
            kr = jnp.broadcast_to(kr[None], (R,) + tuple(kr.shape))
            kc = jnp.broadcast_to(kc[None], (R,) + tuple(kc.shape))
        data["kr"] = kr.astype(f32)
        data["kc"] = kc.astype(f32)
    slots = tuple(int(s) for s in np.asarray(grid.write_slots))
    last_slot = slots[-1]
    if ckpt:
        st_re, st_im = fused_evolve_ckpt(method, interpret, data)
        by_slot = {s: g for g, s in enumerate(slots) if s < grid.n_eval}
        res, ims = [], []
        for s in range(grid.n_eval):
            g = by_slot[s]
            if g == 0:
                res.append(data["psi_re"])
                ims.append(data["psi_im"])
            else:
                res.append(st_re[:, g - 1])
                ims.append(st_im[:, g - 1])
        # stack along a new eval axis AFTER the runs axis
        return Cplx(jnp.stack(res, axis=1), jnp.stack(ims, axis=1))
    out_re, out_im = fused_evolve_states(
        method, interpret, slots, int(grid.n_eval), last_slot, data
    )
    return Cplx(out_re, out_im)
