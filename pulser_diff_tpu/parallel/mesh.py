"""Multi-chip scaling via jax.sharding (the TPU-native answer to the
reference's serial Monte-Carlo loop, backend.py:573-595, and its absent
distributed machinery — SURVEY.md §2.4).

Two first-class parallel axes in this domain:
  - "runs":  stochastic noise realizations (doppler / amplitude / SPAM
             state-prep configurations) — embarrassingly parallel, one
             PRNG key per run;
  - "batch": batched initial states (e.g. the identity matrix for full
             gate-unitary evolution, gate_optimization workload).

Shardings are expressed with NamedSharding over a Mesh; XLA inserts the
ICI collectives (the mean/psum in the training step).  No bespoke
communication code is needed — by design.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pulser_diff_tpu.config import default_dtype
from pulser_diff_tpu.cplx import Cplx, as_cplx
from pulser_diff_tpu.hamiltonian import draw_noise
from pulser_diff_tpu.ops.linalg import expect as _expect
from pulser_diff_tpu.solvers import SolverType, TimeGrid


def make_mesh(
    axis_sizes: dict[str, int], devices: Optional[Sequence] = None
) -> Mesh:
    """Build a Mesh from {axis_name: size}; sizes must multiply to the
    device count (pass devices explicitly for sub-meshes)."""
    devices = list(devices if devices is not None else jax.devices())
    shape = tuple(axis_sizes.values())
    n = int(np.prod(shape))
    if n != len(devices):
        raise ValueError(
            f"Mesh of shape {dict(axis_sizes)} needs {n} devices, got "
            f"{len(devices)}."
        )
    dev_arr = np.array(devices).reshape(shape)
    return Mesh(dev_arr, tuple(axis_sizes.keys()))


def _solve_states_from_draws(sim, draws, solver, substeps, krylov_dim, grid):
    h = sim._hamiltonian
    hd = h.build_data(draws)
    # fused=False: these paths vmap/shard the solve through XLA's SPMD
    # partitioner; vmap-of-pallas does not lower on this backend (the
    # single-launch MC batching lives in ops.pallas_evolution instead).
    # remat=True: the solver's automatic residual-budget heuristics see
    # only the PER-RUN state, but this solve is vmapped over the runs
    # batch — per-step checkpointing keeps reverse-mode memory at
    # O(runs * steps * state) instead of O(runs * steps * stages * state).
    return sim._solve_states(
        hd, None, solver, substeps, krylov_dim, grid,
        solver_opts={"fused": False, "remat": True},
    )


def sharded_noise_states(
    sim,
    keys: jax.Array,
    mesh: Optional[Mesh] = None,
    axis: str = "runs",
    solver: str = SolverType.DP5_SE,
    substeps: int = 1,
    krylov_dim: int = 12,
) -> Cplx:
    """Monte-Carlo noise realizations, one per PRNG key, vmapped and
    sharded over ``mesh[axis]``.

    Returns states of shape (n_runs, n_eval, dim, nb) — the parallel
    replacement for the reference's `for i in range(loop_runs)` solve loop.
    """
    h = sim._hamiltonian
    cfg = h.config
    n_slots = h._count_noise_slots()
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)

    def one(key):
        draws = draw_noise(key, cfg, h._size, n_slots)
        return _solve_states_from_draws(
            sim, draws, solver, substeps, krylov_dim, grid
        )

    fn = jax.vmap(one)
    if mesh is not None:
        key_sh = NamedSharding(mesh, P(axis))
        out_sh = NamedSharding(mesh, P(axis))
        fn = jax.jit(fn, in_shardings=(key_sh,), out_shardings=out_sh)
    else:
        fn = jax.jit(fn)
    return fn(keys)


def sharded_mcwf_states(
    sim,
    key: jax.Array,
    n_traj: int,
    mesh: Optional[Mesh] = None,
    axis: str = "runs",
    solver: str = SolverType.MCWF,
    substeps: int = 1,
):
    """MCWF (quantum-jump) trajectories sharded over ``mesh[axis]`` —
    the Lindblad counterpart of :func:`sharded_noise_states` (the
    reference has no trajectory unraveling at all; solvers/mcwf.py).

    ``n_traj`` splits into ``mesh.shape[axis]`` blocks, each solved by
    one fold of ``key`` (results are bit-identical with and without a
    mesh for the same key and shard count: the vmapped program is the
    same, XLA just partitions it).

    Returns ``McwfResult`` with states (n_shards, n_eval, per_shard,
    da, db) — flatten axes (0, 2) for the full trajectory batch.
    """
    from pulser_diff_tpu.solvers.mcwf import mcsolve

    h = sim._hamiltonian
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)
    psi0 = sim._initial_state
    da, db = h.dim**h._a, h.dim**h._b
    p0 = Cplx(
        psi0.re[:, 0].reshape(da, db), psi0.im[:, 0].reshape(da, db)
    )
    drift = (
        SolverType.DP5_SE
        if solver == SolverType.MCWF
        else SolverType.DP5_SE_F32
    )
    n_shards = int(mesh.shape[axis]) if mesh is not None else 1
    if n_traj % n_shards:
        raise ValueError(
            f"n_traj {n_traj} must divide the '{axis}' axis size "
            f"{n_shards}."
        )
    per = n_traj // n_shards
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(n_shards)
    )

    def one(k):
        return mcsolve(
            h._ham_data, p0, h._collapse_ops, h._size, h.dim, grid, k,
            per, drift, substeps,
        )

    fn = jax.vmap(one)
    if mesh is not None:
        key_sh = NamedSharding(mesh, P(axis))
        out_sh = NamedSharding(mesh, P(axis))
        fn = jax.jit(fn, in_shardings=(key_sh,), out_shardings=out_sh)
    else:
        fn = jax.jit(fn)
    return fn(keys)


def sharded_expectation_step(
    model,
    obs: Any,
    target: float,
    optimizer: Any,
    mesh: Mesh,
    n_runs: int,
    runs_axis: str = "runs",
    solver: str = SolverType.DP5_SE,
    substeps: int = 1,
) -> Callable:
    """Build a FULL jitted training step over the mesh.

    loss(params) = mean over noise realizations (sharded across
    ``runs_axis``) of (final expectation - target)^2; value_and_grad +
    optax update in one compiled program.  The mean over the sharded runs
    axis lowers to an ICI psum inserted by XLA.

    Returns step_fn(params, opt_state, key) -> (params, opt_state, loss).
    """
    obs = as_cplx(obs, dtype=default_dtype())
    sim = model._make_emulator(model.params)
    h = sim._hamiltonian
    cfg = h.config
    n_slots = h._count_noise_slots()
    grid = TimeGrid.make(h.sampling_times, sim._eval_times_array)

    def run_loss(params, key):
        sim_p = model._make_emulator(params)
        hp = sim_p._hamiltonian
        draws = draw_noise(key, hp.config, hp._size, hp._count_noise_slots())
        states = _solve_states_from_draws(
            sim_p, draws, solver, substeps, 12,
            TimeGrid.make(hp.sampling_times, sim_p._eval_times_array),
        )
        vals = _expect(obs, states).re
        return (vals[-1] - target) ** 2

    def loss_fn(params, keys):
        losses = jax.vmap(lambda k: run_loss(params, k))(keys)
        return jnp.mean(losses)

    key_sh = NamedSharding(mesh, P(runs_axis))
    repl = NamedSharding(mesh, P())

    @jax.jit
    def step(params, opt_state, key):
        keys = jax.random.split(key, n_runs)
        keys = jax.lax.with_sharding_constraint(keys, key_sh)
        loss, grads = jax.value_and_grad(loss_fn)(params, keys)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def sharded_sesolve(
    ham_data,
    psi0: Cplx,
    grid: TimeGrid,
    mesh: Mesh,
    axis: str = "state",
    solver: str = SolverType.DP5_SE,
    substeps: int = 1,
    **solver_kwargs: Any,
) -> Cplx:
    """Schrodinger evolution with ONE large statevector sharded over the
    mesh (the scaling axis for N beyond a single chip's memory).

    The state is stored (nb, da, db) with da = d^(n//2); its row-group
    axis is split across ``mesh[axis]`` (``P(None, axis, None)``).  The
    factorized H application (ops/apply.py h_apply_batched) is row-matmul
    + col-matmul + diagonal FMA: the row contraction ``hr @ psi`` crosses
    the shard boundary, and XLA's SPMD partitioner lowers it to a
    distributed matmul over ICI; the column matmul and the vdW diagonal
    stay shard-local.  No bespoke collectives (SURVEY.md §2.4 stance).
    Extension beyond the single-device reference (backend.py:485-494).

    ``da`` must be divisible by the mesh axis size.
    """
    from pulser_diff_tpu.solvers import sesolve as _sesolve

    n_shards = mesh.shape[axis]
    da = psi0.re.shape[-2]
    if da % n_shards != 0:
        raise ValueError(
            f"state row dim {da} not divisible by mesh axis "
            f"'{axis}' of size {n_shards}"
        )
    psi_sh = NamedSharding(mesh, P(None, axis, None))
    out_sh = NamedSharding(mesh, P(None, None, axis, None))

    def run(hd, p0):
        p0 = Cplx(
            jax.lax.with_sharding_constraint(p0.re, psi_sh),
            jax.lax.with_sharding_constraint(p0.im, psi_sh),
        )
        return _sesolve(
            hd, p0, grid, solver=solver, substeps=substeps, **solver_kwargs
        )

    fn = jax.jit(run, out_shardings=out_sh)
    psi0 = Cplx(
        jax.device_put(psi0.re, psi_sh), jax.device_put(psi0.im, psi_sh)
    )
    return fn(ham_data, psi0)


def sharded_mesolve(
    ham_data,
    rho0: Cplx,
    collapse,
    n_qudits: int,
    qudit_dim: int,
    grid: TimeGrid,
    mesh: Mesh,
    axis: str = "rho",
    solver: str = SolverType.DP5_ME,
    substeps: int = 1,
    n_segments: Optional[int] = None,
) -> Cplx:
    """Lindblad evolution with the density matrix sharded over the mesh.

    The row index of rho is split across ``mesh[axis]`` (NamedSharding
    ``P(axis, None)``); XLA's SPMD partitioner propagates the sharding
    through the factorized H application / dissipator einsums and inserts
    the ICI collectives where contractions cross the shard boundary.  At
    12 atoms (4096^2 complex rho = 268 MB split-f64) this is what lets the
    mesolve state and its sqrt-checkpointed backward residuals span chips
    instead of one HBM (SURVEY.md §2.4 extension; reference is
    single-device, backend.py:495-509).
    """
    from pulser_diff_tpu.solvers import mesolve as _mesolve

    rho_sh = NamedSharding(mesh, P(axis, None))
    out_sh = NamedSharding(mesh, P(None, axis, None))

    def run(hd, r0):
        r0 = Cplx(
            jax.lax.with_sharding_constraint(r0.re, rho_sh),
            jax.lax.with_sharding_constraint(r0.im, rho_sh),
        )
        return _mesolve(
            hd, r0, collapse, n_qudits, qudit_dim, grid,
            solver=solver, substeps=substeps, n_segments=n_segments,
        )

    fn = jax.jit(run, out_shardings=out_sh)
    rho0 = Cplx(
        jax.device_put(rho0.re, rho_sh), jax.device_put(rho0.im, rho_sh)
    )
    return fn(ham_data, rho0)
