"""Monte-Carlo wavefunction (quantum-jump) unraveling of the Lindblad
master equation.

TPU-native extension beyond the reference: the reference can only treat
Lindblad noise (dephasing / relaxation / depolarizing / eff_noise) by
integrating the full density matrix (pyqtorch ``mesolve``, reference
backend.py:495-509), whose state costs ``dim^2`` memory — at 12 atoms a
4096 x 4096 complex rho (256 MB in f64) per stored step.  The standard
stochastic unraveling (Dalibard-Castin-Molmer / qutip's ``mcsolve``)
reproduces the SAME master equation as an average over quantum
trajectories that are plain statevectors:

  - between jumps, evolve the unnormalized state under the non-Hermitian
    effective Hamiltonian  H_eff = H(t) - (i/2) sum_k L_k^+ L_k,  so
    d psi/dt = -i H(t) psi - (1/2) (sum_k L_k^+ L_k) psi;
  - the squared norm ||psi(t)||^2 is the no-jump survival probability:
    a jump fires when it drops below a threshold r ~ U(0,1);
  - at a jump, channel k is drawn with probability ||L_k psi||^2 / sum,
    the state becomes L_k psi / ||L_k psi||, and a fresh threshold is
    drawn.

  E[ |psi><psi| / ||psi||^2 ] over trajectories = rho(t) of mesolve.

TPU-first design decisions:

  - The R-trajectory batch IS the statevector batch axis of the factored
    Hamiltonian application (``ops/apply.h_apply_batched``): one shared
    H(t) means the drift stage math is (da, da) x (R*da... ) batched
    matmuls on the MXU — R trajectories cost barely more than one.
  - Fixed-step stage math inside one ``lax.scan`` over the (refined)
    merged time grid; the jump test/application is branchless
    (``jnp.where`` + one-hot channel selection), so the whole solve is a
    single compiled program — no data-dependent control flow, no
    host-side jump loop (qutip bisects step-by-step on the host).
  - Jump times are resolved at step boundaries: the sampling error is
    O(dt) in the jump time (weak first order), controlled by
    ``substeps`` exactly like the deterministic steppers' stability
    refinement.  Collapse rates in this problem family (~1e-3..1 rad/us)
    against ~ns steps put that error far below the trajectory-sampling
    noise floor of any realistic R.
  - Jump-channel weights ||L_m psi||^2 are computed from the per-site
    reduced density matrix G = tr_env |psi><psi| (an (R, d, d) einsum),
    never materializing M candidate states; the selected jump applies
    ONE per-trajectory (d, d) site-local matrix assembled by the one-hot.

Reference surface this extends: run()'s Lindblad routing
(/root/reference/pulser_diff/backend.py:477-509) and the stochastic
noisy loop (backend.py:573-595).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pulser_diff_tpu.cplx import Cplx
from pulser_diff_tpu.hamiltonian import CollapseOps
from pulser_diff_tpu.ops.apply import FactoredHamiltonian
from pulser_diff_tpu.solvers.solver import (
    SolverType,
    TimeGrid,
    _cast_ham,
    _DP5_A,
    _DP5_B,
    _DP5_C,
    _RK4_A,
    _RK4_B,
    _RK4_C,
    _explicit_rk_step,
    _group_collapse,
    _se_rhs,
)


class McwfResult(NamedTuple):
    states: Cplx  # (n_eval, R, da, db) normalized trajectory states
    n_jumps: jax.Array  # (R,) int32 jump count per trajectory


def _apply_site_ket(op: Cplx, site: int, n: int, d: int, psi: Cplx) -> Cplx:
    """lift(op, site) @ psi for a trajectory batch psi of shape
    (R, da, db) (row-major Hilbert index over the n sites)."""
    shape = psi.shape
    R = shape[0]
    lead = d**site
    trail = d**n // (lead * d)
    x = psi.reshape(R, lead, d, trail)
    out_re = jnp.einsum("ji,rlit->rljt", op.re, x.re) - jnp.einsum(
        "ji,rlit->rljt", op.im, x.im
    )
    out_im = jnp.einsum("ji,rlit->rljt", op.re, x.im) + jnp.einsum(
        "ji,rlit->rljt", op.im, x.re
    )
    return Cplx(out_re, out_im).reshape(shape)


def _apply_site_ket_traj(
    op: Cplx, site: int, n: int, d: int, psi: Cplx
) -> Cplx:
    """Per-trajectory site-local op: op is (R, d, d), psi (R, da, db)."""
    shape = psi.shape
    R = shape[0]
    lead = d**site
    trail = d**n // (lead * d)
    x = psi.reshape(R, lead, d, trail)
    out_re = jnp.einsum("rji,rlit->rljt", op.re, x.re) - jnp.einsum(
        "rji,rlit->rljt", op.im, x.im
    )
    out_im = jnp.einsum("rji,rlit->rljt", op.re, x.im) + jnp.einsum(
        "rji,rlit->rljt", op.im, x.re
    )
    return Cplx(out_re, out_im).reshape(shape)


def _site_rdm(site: int, n: int, d: int, psi: Cplx) -> Cplx:
    """Single-site reduced density matrix G[r, i, i'] = sum_env
    conj(psi)[.., i, ..] psi[.., i', ..] for a (R, da, db) batch."""
    R = psi.re.shape[0]
    lead = d**site
    trail = d**n // (lead * d)
    x = psi.re.reshape(R, lead, d, trail)
    y = psi.im.reshape(R, lead, d, trail)
    g_re = jnp.einsum("rlit,rljt->rij", x, x) + jnp.einsum(
        "rlit,rljt->rij", y, y
    )
    g_im = jnp.einsum("rlit,rljt->rij", x, y) - jnp.einsum(
        "rlit,rljt->rij", y, x
    )
    return Cplx(g_re, g_im)


def _diag_q_sum(groups, n: int, d: int, state_shape, dtype):
    """sum_site lift(Q_site) as a dense (da, db) diagonal when every
    site's Q = sum_m L^+L is (numerically) diagonal — true for the
    standard dephasing/relaxation/depolarizing channels.  Returns None
    (general per-site path) for non-diagonal or traced Q."""
    if not groups:
        return None
    try:
        qdiags = {}
        for site, _L, Q in groups:
            qre = np.asarray(jax.device_get(Q.re))
            qim = np.asarray(jax.device_get(Q.im))
            if (
                np.abs(qre - np.diag(np.diag(qre))).max() > 1e-12
                or np.abs(qim).max() > 1e-12
            ):
                return None
            qdiags[site] = np.diag(qre)
    except Exception:  # noqa: BLE001 - traced Q inside jit
        return None
    full = np.zeros([d] * n) if n > 1 else np.zeros([d])
    for site, qd in qdiags.items():
        shape = [1] * n
        shape[site] = d
        full = full + qd.reshape(shape)
    return jnp.asarray(full.reshape(state_shape), dtype)


def _norm2(psi: Cplx) -> jax.Array:
    """(R,) squared norms of a (R, da, db) batch."""
    return jnp.sum(
        psi.re**2 + psi.im**2, axis=tuple(range(1, psi.re.ndim))
    )


def mcsolve(
    ham: FactoredHamiltonian,
    psi0: Cplx,
    collapse: CollapseOps,
    n_qudits: int,
    qudit_dim: int,
    grid: TimeGrid,
    key: jax.Array,
    n_traj: int,
    solver: str = SolverType.DP5_SE,
    substeps: int = 1,
    remat: Optional[bool] = None,
) -> McwfResult:
    """Integrate the Lindblad equation by quantum-jump trajectories.

    Differentiability (fixed-realization pathwise estimator): with a
    fixed ``key`` the whole solve is one differentiable program —
    ``jax.grad`` of a trajectory-averaged expectation flows through the
    non-Hermitian drift, the jump applications and the normalizations,
    while the DISCRETE stochastic decisions (threshold crossings,
    channel draws) are held constant (integer comparisons carry no
    tangent).  The estimator is therefore *biased*: it misses the
    dependence of jump times/channel probabilities on the parameters.
    For drive-parameter gradients at realistic rates the bias is small
    (most steps are jump-free and the no-jump path is differentiated
    exactly — validated against DP5_ME gradients in
    tests/test_mcwf.py::test_mcwf_gradient_matches_mesolve); for
    noise-RATE gradients prefer the ME forms (mesolve routes dim<=2048
    through superop/dense matmul RHS).  ``remat`` checkpoints each RK
    step in reverse mode (auto above the residual budget).

    Args:
        psi0: Cplx (da, db) initial pure state (shared by all
            trajectories), or (R, da, db) per-trajectory initial states
            with R == n_traj.
        collapse: site-local sqrt(rate)-scaled jump operators (the same
            structure mesolve consumes).
        key: PRNG key; fixed key -> bit-reproducible trajectories.
        n_traj: number of stochastic trajectories R.
        solver: DP5_SE / RK4_SE stage set for the non-Hermitian drift;
            the *_F32 aliases run the whole solve in f32 with matmuls
            pinned to Precision.HIGHEST (the MXU path for large dim).
        substeps: per-interval refinement, as in sesolve.

    Returns:
        McwfResult(states=(n_eval, R, da, db) normalized states,
        n_jumps=(R,) jump counts).  E over trajectories of the state
        projectors reproduces mesolve's rho(t); sampling measurement
        bitstrings per trajectory reproduces NoisyResults semantics.
    """
    f32_alias = {
        SolverType.DP5_SE_F32: SolverType.DP5_SE,
        SolverType.RK4_SE_F32: SolverType.RK4_SE,
    }
    if solver in f32_alias:
        f32 = jnp.float32
        ham32 = _cast_ham(ham, f32)
        psi32 = Cplx(psi0.re.astype(f32), psi0.im.astype(f32))
        col32 = collapse._replace(
            ops=None
            if collapse.ops is None
            else Cplx(collapse.ops.re.astype(f32), collapse.ops.im.astype(f32))
        )
        grid32 = TimeGrid(
            times=grid.times.astype(f32),
            write_slots=grid.write_slots,
            n_eval=grid.n_eval,
        )
        with jax.default_matmul_precision("highest"):
            return mcsolve(
                ham32, psi32, col32, n_qudits, qudit_dim, grid32, key,
                n_traj, f32_alias[solver], substeps, remat,
            )
    if solver == SolverType.DP5_SE:
        c, A, B = _DP5_C, _DP5_A, _DP5_B
    elif solver == SolverType.RK4_SE:
        c, A, B = _RK4_C, _RK4_A, _RK4_B
    else:
        raise ValueError(
            f"mcsolve drift solver must be DP5_SE/RK4_SE(_F32), got "
            f"'{solver}'."
        )

    n, d = n_qudits, qudit_dim
    R = int(n_traj)
    dtype = psi0.re.dtype
    groups = _group_collapse(collapse, n, d)
    # op order inside the flat one-hot = group order (site-sorted), op
    # order within a group as grouped
    if psi0.re.ndim == 2:
        psi = Cplx(
            jnp.broadcast_to(psi0.re, (R,) + psi0.re.shape),
            jnp.broadcast_to(psi0.im, (R,) + psi0.im.shape),
        )
    else:
        if psi0.re.shape[0] != R:
            raise ValueError(
                f"psi0 leading axis {psi0.re.shape[0]} != n_traj {R}."
            )
        psi = psi0
    psi = Cplx(jnp.asarray(psi.re, dtype), jnp.asarray(psi.im, dtype))

    # the anti-Hermitian drift term -(1/2) sum_site lift(Q_site): for the
    # standard channels (dephasing/relaxation/depolarizing) every
    # Q = sum_m L^+L is DIAGONAL, so the n per-site einsums per RK stage
    # collapse into ONE precomputed (da, db) elementwise diagonal
    qdiag = _diag_q_sum(groups, n, d, psi.re.shape[1:], dtype)

    if qdiag is not None:
        half_q = qdiag * 0.5

        def drift_rhs(t, p):
            out = _se_rhs(ham, t, p)
            return Cplx(
                out.re - half_q * p.re, out.im - half_q * p.im
            )

    else:

        def drift_rhs(t, p):
            out = _se_rhs(ham, t, p)
            for site, _L, Q in groups:
                out = out - _apply_site_ket(Q, site, n, d, p) * 0.5
            return out

    g = grid.refined(substeps)
    n_steps = g.times.shape[0] - 1
    n_eval = g.n_eval

    if not groups:
        # no jump channels: plain (norm-preserving) Schrodinger
        # trajectories — identical states, zero jumps
        from pulser_diff_tpu.solvers.solver import sesolve

        states = sesolve(ham, psi, grid, solver=solver, substeps=substeps)
        return McwfResult(states, jnp.zeros((R,), jnp.int32))

    M = sum(L.re.shape[0] for _, L, _ in groups)

    k_sel, k_thr, k_0 = jax.random.split(key, 3)
    u_sel = jax.random.uniform(k_sel, (n_steps, R), dtype)
    u_thr = jax.random.uniform(k_thr, (n_steps, R), dtype)
    thr0 = jax.random.uniform(k_0, (R,), dtype)

    out = Cplx(
        jnp.zeros((n_eval,) + psi.shape, dtype),
        jnp.zeros((n_eval,) + psi.shape, dtype),
    )
    slot0 = int(g.write_slots[0])
    nrm0 = jnp.sqrt(_norm2(psi)).reshape((R,) + (1,) * (psi.re.ndim - 1))
    out = Cplx(
        out.re.at[slot0].set(psi.re / nrm0, mode="drop"),
        out.im.at[slot0].set(psi.im / nrm0, mode="drop"),
    )

    slots = jnp.asarray(g.write_slots[1:], jnp.int32)
    tiny = jnp.asarray(np.finfo(np.float32).tiny, dtype)

    def apply_jumps(args):
        """Channel weights + categorical draw + jump application — only
        evaluated on steps where SOME trajectory crossed its threshold
        (the lax.cond below), so the per-site reduced-density-matrix
        einsums are skipped on the (at realistic rates, vast) majority
        of steps."""
        p, thr, nj, crossed, us, ut = args
        # jump-channel weights w[m, r] = ||L_m p||^2 = tr(L^+L G_site)
        ws = []
        for site, L, _Q in groups:
            G = _site_rdm(site, n, d, p)  # (R, d, d)
            # tr(L_m^+ L_m G) = sum_{j,i,i'} conj(L[j,i]) L[j,i'] G[i,i']
            w_re = (
                jnp.einsum("mji,mjk,rik->mr", L.re, L.re, G.re)
                + jnp.einsum("mji,mjk,rik->mr", L.im, L.im, G.re)
                - jnp.einsum("mji,mjk,rik->mr", L.re, L.im, G.im)
                + jnp.einsum("mji,mjk,rik->mr", L.im, L.re, G.im)
            )
            ws.append(w_re)
        w = jnp.concatenate(ws, axis=0)  # (M, R) real >= 0 up to rounding
        w = jnp.clip(w, 0.0, None)
        tot = jnp.sum(w, axis=0)  # (R,)

        jumped = crossed & (tot > tiny)
        # categorical channel draw
        cum = jnp.cumsum(w, axis=0)
        kstar = jnp.sum(
            (cum < (us * tot)[None, :]).astype(jnp.int32), axis=0
        )
        # f32 guard: tree-reduced sum(w) can exceed cumsum(w)[-1] by an
        # ulp, making every `cum < us*tot` true and kstar == M — which
        # would select an all-zero one-hot and zero the trajectory
        # permanently. Clip to the last channel instead.
        kstar = jnp.minimum(kstar, M - 1)  # (R,) in [0, M-1]
        onehot = (
            jnp.arange(M, dtype=jnp.int32)[:, None] == kstar[None, :]
        ).astype(dtype)  # (M, R)

        # selected jump state: per-trajectory (d, d) matrix per site
        pj = None
        off = 0
        for site, L, _Q in groups:
            m = L.re.shape[0]
            sel = onehot[off : off + m]  # (m, R)
            op_r = jnp.einsum("mr,mij->rij", sel, L.re)
            op_i = jnp.einsum("mr,mij->rij", sel, L.im)
            contrib = _apply_site_ket_traj(
                Cplx(op_r, op_i), site, n, d, p
            )
            pj = contrib if pj is None else pj + contrib
            off += m
        nj_norm = jnp.sqrt(jnp.maximum(_norm2(pj), tiny))
        scale = 1.0 / nj_norm
        pj = Cplx(
            pj.re * scale.reshape((R,) + (1,) * (pj.re.ndim - 1)),
            pj.im * scale.reshape((R,) + (1,) * (pj.im.ndim - 1)),
        )

        jb = jumped.reshape((R,) + (1,) * (p.re.ndim - 1))
        p = Cplx(jnp.where(jb, pj.re, p.re), jnp.where(jb, pj.im, p.im))
        thr = jnp.where(jumped, ut, thr)
        nj = nj + jumped.astype(jnp.int32)
        return p, thr, nj

    from pulser_diff_tpu.solvers.solver import _auto_remat

    if remat is None:
        remat = _auto_remat(psi, n_steps, stages=len(c))

    def drift_step(p, t0, t1):
        return _explicit_rk_step(drift_rhs, t0, t1 - t0, p, c, A, B)

    if remat:
        drift_step = jax.checkpoint(drift_step)

    def body(carry, xs):
        p, thr, nj, buf = carry
        t0, t1, slot, us, ut = xs
        p = drift_step(p, t0, t1)
        norm2 = _norm2(p)  # (R,) survival probability
        crossed = norm2 < thr
        p, thr, nj = jax.lax.cond(
            jnp.any(crossed),
            apply_jumps,
            lambda args: (args[0], args[1], args[2]),
            (p, thr, nj, crossed, us, ut),
        )

        nrm = jnp.sqrt(jnp.maximum(_norm2(p), tiny)).reshape(
            (R,) + (1,) * (p.re.ndim - 1)
        )
        buf = Cplx(
            buf.re.at[slot].set(p.re / nrm, mode="drop"),
            buf.im.at[slot].set(p.im / nrm, mode="drop"),
        )
        return (p, thr, nj, buf), None

    xs = (g.times[:-1], g.times[1:], slots, u_sel, u_thr)
    (_, _, n_jumps, out), _ = jax.lax.scan(
        body, (psi, thr0, jnp.zeros((R,), jnp.int32), out), xs
    )
    return McwfResult(out, n_jumps)
