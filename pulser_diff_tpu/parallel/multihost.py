"""Multi-host (DCN) parameter sweeps.

Single-host scaling (parallel.mesh) shards noise realizations and the
density matrix over one process's chips (ICI).  This module adds the
multi-host axis: a fleet of hosts, each with its own chips, sweeping a
stack of parameter sets — the ``param`` axis is laid out ACROSS
processes (traffic rides DCN) while the ``runs`` axis stays WITHIN each
process (ICI), so the only cross-host communication is the final
per-param reduction.  The reference has no distributed machinery at all
(SURVEY.md §2.4); this is the "DCN only for parameter-sweep fleets"
extension called out in SURVEY.md §5.

Usage (same program on every host):

    from pulser_diff_tpu.parallel import multihost as mh
    mh.initialize(coordinator_address, num_processes, process_id)
    mesh = mh.param_runs_mesh()          # ("param", "runs") global mesh
    out = mh.param_sweep(loss_fn, param_stack, keys, mesh)

Dryrun-able on CPU fleets: each process sets
``XLA_FLAGS=--xla_force_host_platform_device_count=N`` and
``JAX_PLATFORMS=cpu`` (tests/test_multihost.py runs 2 processes x 4
virtual devices end-to-end).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str, num_processes: int, process_id: int
) -> None:
    """Join the process fleet (thin wrapper over jax.distributed —
    call before any backend use)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def param_runs_mesh(
    param_axis: str = "param", runs_axis: str = "runs"
) -> Mesh:
    """Global 2D mesh: ``param`` across processes (DCN), ``runs`` over
    each process's local devices (ICI)."""
    n_proc = jax.process_count()
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    local = len(devices) // n_proc
    dev_arr = np.array(devices).reshape(n_proc, local)
    return Mesh(dev_arr, (param_axis, runs_axis))


def global_array(x: np.ndarray, mesh: Mesh, spec: P) -> jax.Array:
    """Build a globally-sharded array from host-replicated numpy data
    (every process passes the same full ``x``)."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        np.shape(x), sharding, lambda idx: np.asarray(x)[idx]
    )


def param_sweep(
    loss_fn: Callable[[Any, jax.Array], jax.Array],
    param_stack: Any,
    keys: jax.Array,
    mesh: Mesh,
    param_axis: str = "param",
    runs_axis: str = "runs",
    with_grad: bool = False,
):
    """Mean-over-runs loss for every parameter set in the stack.

    loss_fn(params, key) -> scalar; param_stack: pytree with a leading
    (n_param,) axis; keys: (n_param, n_runs) PRNG keys.  Each (param,
    run) cell lands on one device: params are replicated along the runs
    axis of each host, runs never leave the host, and the per-param mean
    over runs is an ICI psum.  Returns (n_param,) losses — and, with
    ``with_grad=True``, the per-param gradients (n_param, ...).
    """
    p_spec = P(param_axis)
    k_spec = P(param_axis, runs_axis)

    def per_param(p, ks):
        if with_grad:
            def mean_loss(pp):
                return jnp.mean(jax.vmap(lambda k: loss_fn(pp, k))(ks))

            return jax.value_and_grad(mean_loss)(p)
        return jnp.mean(jax.vmap(lambda k: loss_fn(p, k))(ks))

    fn = jax.jit(
        jax.vmap(per_param),
        in_shardings=(
            jax.tree.map(lambda _: NamedSharding(mesh, p_spec), param_stack),
            NamedSharding(mesh, k_spec),
        ),
        # with_grad returns (losses, grads-pytree): let the partitioner
        # propagate the param-axis sharding to every output leaf
        out_shardings=(
            None if with_grad else NamedSharding(mesh, p_spec)
        ),
    )
    return fn(param_stack, keys)
