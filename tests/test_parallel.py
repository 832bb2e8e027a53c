"""Device-mesh sharding tests (8 virtual CPU devices from conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulser_diff_tpu import SimConfig, TpuEmulator
from pulser_diff_tpu.parallel import make_mesh, sharded_noise_states

from .conftest import make_simple_sequence


@pytest.fixture
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh({"runs": 8})


def test_make_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh({"runs": 3}, devices=jax.devices()[:2])


def test_sharded_noise_states(two_atom_register, mesh8):
    seq = make_simple_sequence(two_atom_register, duration=100)
    cfg = SimConfig(noise="doppler", temperature=60.0, runs=8)
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    states = sharded_noise_states(sim, keys, mesh=mesh8, axis="runs")
    assert states.re.shape[0] == 8
    # each run is normalized
    norms = np.asarray(jax.device_get((states.abs2()).sum(axis=(2, 3))))
    assert np.abs(norms - 1).max() < 1e-8
    # runs differ (noise actually applied)
    s0 = np.asarray(jax.device_get(states.re[0, -1]))
    s1 = np.asarray(jax.device_get(states.re[1, -1]))
    assert np.abs(s0 - s1).max() > 1e-6
    # output is actually sharded over the mesh
    shard_devs = {s.device for s in states.re.addressable_shards}
    assert len(shard_devs) == 8


def test_sharded_matches_unsharded(two_atom_register):
    seq = make_simple_sequence(two_atom_register, duration=100)
    cfg = SimConfig(noise="doppler", temperature=60.0, runs=4)
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    st_plain = sharded_noise_states(sim, keys, mesh=None)
    mesh = make_mesh({"runs": 4}, devices=jax.devices()[:4])
    st_shard = sharded_noise_states(sim, keys, mesh=mesh)
    assert np.allclose(
        np.asarray(jax.device_get(st_plain.re)),
        np.asarray(jax.device_get(st_shard.re)),
        atol=1e-12,
    )


def test_graft_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_graft", "/root/repo/__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)


def test_sharded_expectation_step(two_atom_register):
    """Full jitted training step over a mesh (noise axis sharded)."""
    import optax

    from pulser_diff_tpu import SimConfig
    from pulser_diff_tpu.core import MockDevice, Pulse, Sequence
    from pulser_diff_tpu.model import QuantumModel
    from pulser_diff_tpu.ops import total_magnetization
    from pulser_diff_tpu.parallel import sharded_expectation_step

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh({"runs": 4}, devices=jax.devices()[:4])
    seq = Sequence(two_atom_register, MockDevice)
    seq.declare_channel("ryd", "rydberg_global")
    om = seq.declare_variable("omega")
    seq.add(Pulse.ConstantPulse(60, om, 0.0, 0.0), "ryd")
    model = QuantumModel(
        seq,
        {"omega": jnp.asarray(1.5)},
        noise_config=SimConfig(noise="doppler", temperature=50.0),
        evaluation_times="Minimal",
    )
    obs = total_magnetization(2)
    optimizer = optax.adam(1e-2)
    step = sharded_expectation_step(
        model, obs, target=-1.5, optimizer=optimizer, mesh=mesh, n_runs=4
    )
    params = dict(model.params)
    opt_state = optimizer.init(params)
    with mesh:
        params, opt_state, loss = step(
            params, opt_state, jax.random.PRNGKey(3)
        )
    assert np.isfinite(float(loss))
    assert float(params["omega"]) != 1.5  # an update happened


def test_sharded_sesolve_matches_unsharded(mesh8):
    """One large statevector sharded over its row-group axis: same states,
    8 shard placements, and gradients survive the sharded program."""
    from pulser_diff_tpu.core import Register
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.parallel import sharded_sesolve
    from pulser_diff_tpu.solvers import TimeGrid, sesolve

    # 6 atoms -> da = 2^3 = 8 state rows, one per device
    reg = Register(
        {
            f"q{i}": jnp.array([8.0 * np.cos(a), 8.0 * np.sin(a)])
            for i, a in enumerate(np.linspace(0, 2 * np.pi, 6, endpoint=False))
        }
    )
    seq = make_simple_sequence(reg, duration=60)
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    h = sim._hamiltonian
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    da, db = 8, 8
    p0 = sim.initial_state  # (dim, nb)
    psi0 = Cplx(
        p0.re.T.reshape(1, da, db), p0.im.T.reshape(1, da, db)
    )
    hd = h._ham_data
    mesh = make_mesh({"state": 8})

    plain = sesolve(hd, psi0, grid)
    shard = sharded_sesolve(hd, psi0, grid, mesh)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(plain.re)),
        np.asarray(jax.device_get(shard.re)),
        atol=1e-12,
    )
    shard_devs = {s.device for s in shard.re.addressable_shards}
    assert len(shard_devs) == 8

    def scale_streams(s):
        return hd._replace(
            row_streams=Cplx(hd.row_streams.re * s, hd.row_streams.im * s),
            col_streams=Cplx(hd.col_streams.re * s, hd.col_streams.im * s),
        )

    # amplitude-scale gradient through the sharded solve, vs unsharded
    def loss_sharded(s):
        out = sharded_sesolve(scale_streams(s), psi0, grid, mesh)
        return out.abs2()[-1, 0, -1, -1]

    def loss_plain(s):
        out = sesolve(scale_streams(s), psi0, grid)
        return out.abs2()[-1, 0, -1, -1]

    g_sh = jax.grad(loss_sharded)(jnp.asarray(1.0))
    g_pl = jax.grad(loss_plain)(jnp.asarray(1.0))
    np.testing.assert_allclose(float(g_sh), float(g_pl), atol=1e-11)
    assert abs(float(g_pl)) > 1e-9

    with pytest.raises(ValueError):
        sharded_sesolve(hd, Cplx(psi0.re[:, :4], psi0.im[:, :4]), grid, mesh)


def test_sharded_sesolve_f32_mode(mesh8):
    """DP5_SE_F32 composes with the sharded solve (the multi-chip
    continuation of the f32 scaling path, SCALING.md): the f32 cast
    happens inside sesolve, the sharding constraints stay on the caller's
    arrays, and XLA partitions the f32 program identically."""
    from pulser_diff_tpu.core import Register
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.parallel import sharded_sesolve
    from pulser_diff_tpu.solvers import SolverType, TimeGrid, sesolve

    reg = Register(
        {
            f"q{i}": jnp.array([8.0 * np.cos(a), 8.0 * np.sin(a)])
            for i, a in enumerate(np.linspace(0, 2 * np.pi, 6, endpoint=False))
        }
    )
    seq = make_simple_sequence(reg, duration=60)
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    h = sim._hamiltonian
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    p0 = sim.initial_state
    psi0 = Cplx(p0.re.T.reshape(1, 8, 8), p0.im.T.reshape(1, 8, 8))
    hd = h._ham_data
    mesh = make_mesh({"state": 8})

    plain64 = sesolve(hd, psi0, grid)
    shard32 = sharded_sesolve(
        hd, psi0, grid, mesh, solver=SolverType.DP5_SE_F32
    )
    assert shard32.re.dtype == jnp.float32
    assert len({s.device for s in shard32.re.addressable_shards}) == 8
    np.testing.assert_allclose(
        np.asarray(jax.device_get(plain64.re)),
        np.asarray(jax.device_get(shard32.re)),
        atol=5e-6,
    )


def test_sharded_sesolve_xy_kron_terms(mesh8):
    """Sharded statevector solve with XY kron-pair terms: the
    R @ Psi @ C^T einsums must partition correctly too."""
    from pulser_diff_tpu.core import MockDevice, Pulse, Register, Sequence
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.parallel import sharded_sesolve
    from pulser_diff_tpu.solvers import TimeGrid, sesolve

    reg = Register(
        {
            f"q{i}": jnp.array([7.0 * np.cos(a), 7.0 * np.sin(a)])
            for i, a in enumerate(np.linspace(0, 2 * np.pi, 6, endpoint=False))
        }
    )
    seq = Sequence(reg, MockDevice)
    seq.declare_channel("mw", "microwave_global")
    seq.add(Pulse.ConstantPulse(60, 1.5, 0.4, 0.3), "mw")
    sim = TpuEmulator.from_sequence(seq, evaluation_times="Minimal")
    h = sim._hamiltonian
    assert h._ham_data.kron_row is not None  # XY cross-group pairs exist
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    p0 = sim.initial_state
    psi0 = Cplx(p0.re.T.reshape(1, 8, 8), p0.im.T.reshape(1, 8, 8))
    mesh = make_mesh({"state": 8})
    plain = sesolve(h._ham_data, psi0, grid)
    shard = sharded_sesolve(h._ham_data, psi0, grid, mesh)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(plain.re)),
        np.asarray(jax.device_get(shard.re)),
        atol=1e-12,
    )
    assert len({s.device for s in shard.re.addressable_shards}) == 8


def test_sharded_mesolve_matches_unsharded(two_atom_register, mesh8):
    """Density-matrix row sharding over the mesh: same states, and the
    noise-rate gradient survives the sharded path."""
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.parallel import make_mesh, sharded_mesolve
    from pulser_diff_tpu.solvers import TimeGrid, mesolve

    # 3 atoms -> dim 8 rows, one per device
    reg_d = {
        "q0": jnp.array([-5.0, 0.0]),
        "q1": jnp.array([5.0, 0.0]),
        "q2": jnp.array([0.0, 6.0]),
    }
    from pulser_diff_tpu.core import Register

    seq = make_simple_sequence(Register(reg_d), duration=48)
    cfg = SimConfig(noise="dephasing", dephasing_rate=0.3)
    sim = TpuEmulator.from_sequence(
        seq, config=cfg, evaluation_times="Minimal"
    )
    h = sim._hamiltonian
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    psi0 = sim.initial_state
    rho0 = Cplx(
        psi0.re @ psi0.re.T + psi0.im @ psi0.im.T,
        psi0.im @ psi0.re.T - psi0.re @ psi0.im.T,
    )
    mesh = make_mesh({"rho": 8})
    plain = mesolve(h._ham_data, rho0, h._collapse_ops, h._size, h.dim, grid)
    shard = sharded_mesolve(
        h._ham_data, rho0, h._collapse_ops, h._size, h.dim, grid, mesh
    )
    np.testing.assert_allclose(
        np.asarray(jax.device_get(plain.re)),
        np.asarray(jax.device_get(shard.re)),
        atol=1e-12,
    )
    shard_devs = {s.device for s in shard.re.addressable_shards}
    assert len(shard_devs) == 8

    # gradient w.r.t. the dephasing rate through the sharded program
    def loss(rate):
        cfg_r = SimConfig(noise="dephasing", dephasing_rate=rate)
        sim_r = TpuEmulator.from_sequence(
            seq, config=cfg_r, evaluation_times="Minimal"
        )
        hr = sim_r._hamiltonian
        out = sharded_mesolve(
            hr._ham_data, rho0, hr._collapse_ops, hr._size, hr.dim, grid,
            mesh,
        )
        return out.re[-1, 0, 0]

    g = jax.grad(loss)(jnp.asarray(0.3))
    assert np.isfinite(float(g))
    assert abs(float(g)) > 1e-12


def test_sharded_mcwf_states(two_atom_register, mesh8):
    """MCWF trajectories sharded over the runs axis: normalized, actually
    sharded, and bit-identical to the per-shard mcsolve loop with the
    same folded keys."""
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.parallel import sharded_mcwf_states
    from pulser_diff_tpu.solvers import TimeGrid
    from pulser_diff_tpu.solvers.mcwf import mcsolve

    seq = make_simple_sequence(two_atom_register, duration=120)
    cfg = SimConfig(noise="dephasing", dephasing_rate=0.3)
    sim = TpuEmulator.from_sequence(seq, config=cfg, evaluation_times="Minimal")
    key = jax.random.PRNGKey(5)
    mc = sharded_mcwf_states(sim, key, n_traj=16, mesh=mesh8, axis="runs")
    assert mc.states.re.shape[0] == 8 and mc.states.re.shape[2] == 2
    norms = np.asarray(jax.device_get(mc.states.abs2().sum(axis=(3, 4))))
    assert np.abs(norms - 1).max() < 1e-8
    shard_devs = {s.device for s in mc.states.re.addressable_shards}
    assert len(shard_devs) == 8

    # per-shard reference: same folds, plain mcsolve
    h = sim._hamiltonian
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    psi0 = sim._initial_state
    da, db = h.dim**h._a, h.dim**h._b
    p0 = Cplx(psi0.re[:, 0].reshape(da, db), psi0.im[:, 0].reshape(da, db))
    ref = mcsolve(
        h._ham_data, p0, h._collapse_ops, h._size, h.dim, grid,
        jax.random.fold_in(key, 3), n_traj=2,
    )
    np.testing.assert_allclose(
        np.asarray(jax.device_get(mc.states.re[3])),
        np.asarray(jax.device_get(ref.states.re)),
        atol=1e-12,
    )
    with pytest.raises(ValueError, match="must divide"):
        sharded_mcwf_states(sim, key, n_traj=12, mesh=mesh8)


def test_sharded_mesolve_dense_form(two_atom_register, mesh8):
    """rho-row sharding with the DENSE RHS form (the auto route for
    dim >= 16 since round 5): XLA's SPMD partitioner must propagate the
    row sharding through the dense H(t) matmuls — states match the
    unsharded solve and stay sharded."""
    from pulser_diff_tpu.cplx import Cplx
    from pulser_diff_tpu.core import Register
    from pulser_diff_tpu.parallel import make_mesh, sharded_mesolve
    from pulser_diff_tpu.solvers import TimeGrid, mesolve

    reg_d = Register(
        {
            "q0": jnp.array([-6.0, 0.0]),
            "q1": jnp.array([6.0, 0.0]),
            "q2": jnp.array([0.0, 7.0]),
            "q3": jnp.array([0.0, -7.0]),
        }
    )
    seq = make_simple_sequence(reg_d, duration=48)
    cfg = SimConfig(noise="dephasing", dephasing_rate=0.25)
    sim = TpuEmulator.from_sequence(
        seq, config=cfg, evaluation_times="Minimal"
    )
    h = sim._hamiltonian
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    psi0 = sim.initial_state
    rho0 = Cplx(
        psi0.re @ psi0.re.T + psi0.im @ psi0.im.T,
        psi0.im @ psi0.re.T - psi0.re @ psi0.im.T,
    )
    mesh = make_mesh({"rho": 8})
    plain = mesolve(h._ham_data, rho0, h._collapse_ops, h._size, h.dim, grid)
    shard = sharded_mesolve(
        h._ham_data, rho0, h._collapse_ops, h._size, h.dim, grid, mesh
    )
    np.testing.assert_allclose(
        np.asarray(jax.device_get(plain.re)),
        np.asarray(jax.device_get(shard.re)),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(jax.device_get(plain.im)),
        np.asarray(jax.device_get(shard.im)),
        atol=1e-12,
    )
    assert len({s.device for s in shard.re.addressable_shards}) == 8
