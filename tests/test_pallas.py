"""Pallas fused-evolution kernel vs the XLA f64 solver.

Runs in interpreter mode on CPU (the kernel itself compiles for TPU; the
driver bench exercises the compiled path on hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulser_diff_tpu import TpuEmulator
from pulser_diff_tpu.cplx import Cplx
from pulser_diff_tpu.core import MockDevice
from pulser_diff_tpu.ops.pallas_evolution import pallas_evolve
from pulser_diff_tpu.solvers import SolverType, TimeGrid, sesolve

from .conftest import make_rich_sequence


def test_pallas_evolution_matches_xla(two_atom_register):
    seq = make_rich_sequence(two_atom_register)
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    h = sim._hamiltonian
    hd = h._ham_data
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)

    da, db = h.dim**h._a, h.dim**h._b
    psi0 = sim.initial_state
    p0 = Cplx(psi0.re.T.reshape(1, da, db), psi0.im.T.reshape(1, da, db))

    ref = sesolve(hd, p0, grid, solver=SolverType.RK4_SE)
    ref_final = ref[ref.re.shape[0] - 1]

    out = pallas_evolve(hd, p0, grid.times, interpret=True)
    err = np.abs(out.to_numpy() - ref_final.to_numpy()).max()
    assert err < 5e-5  # f32 kernel vs f64 reference


def test_pallas_adjoint_grad_matches_autodiff(two_atom_register):
    """The custom-VJP adjoint kernel vs plain autodiff through an
    equivalent XLA f32 evolution."""
    from pulser_diff_tpu.ops.pallas_evolution import (
        _precompute_stage_z,
        fused_evolve,
    )

    seq = make_rich_sequence(two_atom_register)
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    h = sim._hamiltonian
    hd = h._ham_data
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    da, db = h.dim**h._a, h.dim**h._b
    psi0 = sim.initial_state
    p0 = Cplx(psi0.re.T.reshape(1, da, db), psi0.im.T.reshape(1, da, db))

    zr, zc, hs = _precompute_stage_z(hd, grid.times)
    f32 = jnp.float32
    consts = dict(
        zc_re=zc.re.astype(f32)[None], zc_im=zc.im.astype(f32)[None],
        hs=hs.astype(f32), rp=hd.row_parts.astype(f32),
        cp=hd.col_parts.astype(f32), diag=hd.int_diag.astype(f32)[None],
        pr=p0.re.astype(f32)[None], pi=p0.im.astype(f32)[None],
    )

    def loss(zr_re, zr_im):
        o_re, o_im = fused_evolve(
            zr_re, zr_im, consts["zc_re"], consts["zc_im"], consts["hs"],
            consts["rp"], consts["cp"], consts["diag"], consts["pr"],
            consts["pi"], True,
        )
        return jnp.sum(o_re**2 - o_im)

    g = jax.grad(loss, argnums=(0, 1))(
        zr.re.astype(f32)[None], zr.im.astype(f32)[None]
    )
    # finite-difference spot checks
    eps = 1e-2
    z0 = zr.re.astype(f32)[None]
    z1 = zr.im.astype(f32)[None]
    for idx in [(0, 10, 1, 0), (0, 50, 3, 0)]:
        lp = float(loss(z0.at[idx].add(eps), z1))
        lm = float(loss(z0.at[idx].add(-eps), z1))
        fd = (lp - lm) / (2 * eps)
        assert abs(float(g[0][idx]) - fd) < max(5e-3, 0.05 * abs(fd) + 1e-4)


def test_run_with_pallas_solver(two_atom_register):
    """SolverType.RK4_PALLAS through the emulator run() path (interpret
    mode on CPU)."""
    seq = make_rich_sequence(two_atom_register)
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    res_ref = sim.run(solver=SolverType.DP5_SE)
    res_fast = sim.run(solver=SolverType.RK4_PALLAS)
    ref = res_ref.states.to_numpy()
    fast = res_fast.states.to_numpy()
    assert np.abs(ref - fast).max() < 5e-5
    # Full evaluation times: forward-only states kernel
    sim.set_evaluation_times("Full")
    res_full_ref = sim.run(solver=SolverType.DP5_SE)
    res_full_fast = sim.run(solver=SolverType.RK4_PALLAS)
    err = np.abs(
        res_full_ref.states.to_numpy() - res_full_fast.states.to_numpy()
    ).max()
    assert err < 5e-5


def test_pallas_rejects_xy():
    import jax.numpy as jnp

    from pulser_diff_tpu.core import Pulse, Register, Sequence

    reg = Register({"a": jnp.array([0.0, 0.0]), "b": jnp.array([8.0, 0.0])})
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("mw", "microwave_global")
    seq.add(Pulse.ConstantPulse(100, 1.0, 0.0, 0.0), "mw")
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    h = sim._hamiltonian
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    da, db = h.dim**h._a, h.dim**h._b
    psi0 = sim.initial_state
    p0 = Cplx(psi0.re.T.reshape(1, da, db), psi0.im.T.reshape(1, da, db))
    with pytest.raises(NotImplementedError):
        pallas_evolve(h._ham_data, p0, grid.times, interpret=True)


def test_pallas_states_adjoint_grad(two_atom_register):
    """Gradients through the eval-time states kernel (custom VJP with
    stored-state reloads) vs finite differences."""
    from pulser_diff_tpu.ops.pallas_evolution import (
        _precompute_stage_z,
        fused_evolve_states,
    )

    seq = make_rich_sequence(two_atom_register)
    sim = TpuEmulator.from_sequence(seq, evaluation_times=[0.05, 0.12])
    h = sim._hamiltonian
    hd = h._ham_data
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    da, db = h.dim**h._a, h.dim**h._b
    psi0 = sim.initial_state
    p0 = Cplx(psi0.re.T.reshape(1, da, db), psi0.im.T.reshape(1, da, db))

    zr, zc, hs = _precompute_stage_z(hd, grid.times)
    f32 = jnp.float32
    slots = tuple(int(x) for x in np.asarray(grid.write_slots))
    n_eval = int(grid.n_eval)
    consts = dict(
        zc_re=zc.re.astype(f32)[None], zc_im=zc.im.astype(f32)[None],
        hs=hs.astype(f32), rp=hd.row_parts.astype(f32),
        cp=hd.col_parts.astype(f32), diag=hd.int_diag.astype(f32)[None],
        pr=p0.re.astype(f32)[None], pi=p0.im.astype(f32)[None],
    )

    def loss(zr_re, zr_im):
        o_re, o_im = fused_evolve_states(
            zr_re, zr_im, consts["zc_re"], consts["zc_im"], consts["hs"],
            consts["rp"], consts["cp"], consts["diag"], consts["pr"],
            consts["pi"], slots, n_eval, slots[-1], True,
        )
        # weight every eval state (mid-trajectory gradients included)
        w = jnp.arange(1.0, n_eval + 1.0, dtype=f32)[None, :, None, None, None]
        return jnp.sum(w * o_re**2) + jnp.sum(w * o_im**2) * 0.5

    g = jax.grad(loss, argnums=(0, 1))(
        zr.re.astype(f32)[None], zr.im.astype(f32)[None]
    )
    eps = 1e-2
    z0 = zr.re.astype(f32)[None]
    z1 = zr.im.astype(f32)[None]
    for idx in [(0, 10, 1, 0), (0, 50, 3, 0), (0, 90, 0, 0)]:
        lp = float(loss(z0.at[idx].add(eps), z1))
        lm = float(loss(z0.at[idx].add(-eps), z1))
        fd = (lp - lm) / (2 * eps)
        assert abs(float(g[0][idx]) - fd) < max(5e-3, 0.05 * abs(fd) + 1e-4)
    # psi0 cotangent flows too
    def loss_psi(pr):
        o_re, o_im = fused_evolve_states(
            z0, z1, consts["zc_re"], consts["zc_im"], consts["hs"],
            consts["rp"], consts["cp"], consts["diag"], pr,
            consts["pi"], slots, n_eval, slots[-1], True,
        )
        return jnp.sum(o_re[:, -1] ** 2)

    gp = jax.grad(loss_psi)(consts["pr"])
    assert np.isfinite(np.asarray(gp)).all()
    assert np.abs(np.asarray(gp)).max() > 1e-6


def test_pallas_mc_matches_vmapped_xla(two_atom_register):
    """In-kernel Monte-Carlo batching (grid over the runs axis) vs the
    vmapped XLA solver on the same noise draws."""
    from pulser_diff_tpu import SimConfig
    from pulser_diff_tpu.hamiltonian import draw_noise
    from pulser_diff_tpu.ops.pallas_evolution import pallas_evolve_mc

    seq = make_rich_sequence(two_atom_register)
    cfg = SimConfig(noise="doppler", temperature=80.0, runs=3)
    sim = TpuEmulator.from_sequence(
        seq, config=cfg, evaluation_times=[0.05, 0.12]
    )
    h = sim._hamiltonian
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    n_slots = h._count_noise_slots()
    keys = jax.random.split(jax.random.PRNGKey(11), 3)
    draws = jax.vmap(
        lambda k: draw_noise(k, h.config, h._size, n_slots)
    )(keys)
    hams = jax.vmap(h.build_data)(draws)

    da, db = h.dim**h._a, h.dim**h._b
    psi0 = sim.initial_state
    p0 = Cplx(psi0.re.T.reshape(1, da, db), psi0.im.T.reshape(1, da, db))

    mc = pallas_evolve_mc(hams, p0, grid, interpret=True)

    # reference: per-run XLA RK4 on the same draws
    def one(i):
        hd = h.build_data(
            jax.tree.map(lambda x: x[i], draws)
        )
        return sesolve(hd, p0, grid, solver=SolverType.RK4_SE)

    for r in range(3):
        ref = one(r)
        err = np.abs(mc[r].to_numpy() - ref.to_numpy()).max()
        assert err < 5e-5
    # runs actually differ
    assert (
        np.abs(mc[0].to_numpy() - mc[1].to_numpy()).max() > 1e-6
    )


def test_run_noisy_with_pallas_solver(two_atom_register):
    """run() with stochastic noise + RK4_PALLAS goes through the fused
    MC kernel and returns NoisyResults."""
    from pulser_diff_tpu import SimConfig

    seq = make_rich_sequence(two_atom_register)
    cfg = SimConfig(noise="doppler", temperature=60.0, runs=4,
                    samples_per_run=25)
    sim = TpuEmulator.from_sequence(
        seq, config=cfg, evaluation_times="Minimal"
    )
    res = sim.run(solver=SolverType.RK4_PALLAS)
    tot = sum(sum(r.bitstring_counts.values()) for r in res._results)
    assert tot == 4 * 25 * len(res._sim_times)


def test_pallas_mc_noisy_gradient_matches_xla(two_atom_register):
    """Gradient of a noisy Monte-Carlo loss (doppler draws, fixed keys)
    through the fused MC kernel matches the vmapped XLA solver path."""
    from pulser_diff_tpu import SimConfig
    from pulser_diff_tpu.hamiltonian import draw_noise
    from pulser_diff_tpu.ops.pallas_evolution import pallas_evolve_mc
    from pulser_diff_tpu.ops import total_magnetization
    from pulser_diff_tpu.ops.linalg import expect as _expect
    from .conftest import make_simple_sequence

    cfg = SimConfig(noise="doppler", temperature=70.0, runs=3)
    obs = total_magnetization(2)
    keys = jax.random.split(jax.random.PRNGKey(5), 3)

    def make_loss(use_pallas):
        def loss(omega):
            seq = make_simple_sequence(
                two_atom_register, duration=60, omega=omega, delta=-0.5
            )
            sim = TpuEmulator.from_sequence(
                seq, config=cfg, evaluation_times="Minimal"
            )
            h = sim._hamiltonian
            grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
            n_slots = h._count_noise_slots()
            draws = jax.vmap(
                lambda k: draw_noise(k, h.config, h._size, n_slots)
            )(keys)
            psi0 = sim.initial_state
            p0 = Cplx(
                psi0.re.T.reshape(1, 2, 2), psi0.im.T.reshape(1, 2, 2)
            )
            if use_pallas:
                hams = jax.vmap(h.build_data)(draws)
                st = pallas_evolve_mc(hams, p0, grid, interpret=True)
                st = Cplx(
                    st.re.astype(p0.dtype), st.im.astype(p0.dtype)
                )
            else:
                st = jax.vmap(
                    lambda d: sesolve(
                        h.build_data(d), p0, grid,
                        solver=SolverType.RK4_SE,
                    )
                )(draws)
            # mean final <Sz> over runs: states (R, n_eval, 1, 2, 2)
            pr = st.re[:, -1].reshape(3, 4)
            pi = st.im[:, -1].reshape(3, 4)
            # <psi|O|psi> for real-diagonal O (total magnetization)
            vals = jnp.einsum("ri,ij,rj->r", pr, obs.re, pr) + jnp.einsum(
                "ri,ij,rj->r", pi, obs.re, pi
            )
            return jnp.mean(vals)

        return loss

    om = jnp.asarray(1.8)
    v_x, g_x = jax.value_and_grad(make_loss(False))(om)
    v_p, g_p = jax.value_and_grad(make_loss(True))(om)
    assert abs(float(v_x) - float(v_p)) < 1e-5
    assert abs(float(g_x) - float(g_p)) < 1e-3
    assert abs(float(g_x)) > 1e-4
