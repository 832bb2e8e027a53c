"""Multi-host (DCN) parameter sweep dryrun: 2 CPU processes x 4 virtual
devices each, connected through jax.distributed — the fleet analogue the
driver's single-process dryrun can't cover (VERDICT.md round-2 next-step
#7).  Each process runs the same program; the param axis crosses the
process boundary (DCN), runs stay process-local (ICI)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
pid = int(sys.argv[1])
# the fleet handshake must precede ANY backend use — including package
# imports that touch jax.devices (mh.initialize documents this; here we
# call through jax.distributed directly before importing the package)
jax.distributed.initialize({coord!r}, 2, pid)
import numpy as np
import jax.numpy as jnp

from pulser_diff_tpu.parallel import multihost as mh
assert jax.process_count() == 2
assert len(jax.devices()) == 8

mesh = mh.param_runs_mesh()
assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {{"param": 2, "runs": 4}}

# tiny physics loss: noisy single-interval Rabi expectation
def loss_fn(omega, key):
    # deterministic per-run perturbation straight from the key words
    # (avoids typed-key plumbing in the dryrun)
    delta = (key[0] % 1000).astype(jnp.float64) / 1000.0 * 0.1
    theta = jnp.sqrt(omega**2 + delta**2) * 0.05
    return jnp.sin(theta / 2) ** 2

params = np.linspace(1.0, 4.0, 2)
keys = jax.random.split(jax.random.PRNGKey(0), 8).reshape(2, 4, 2)
p_g = mh.global_array(params, mesh, mh.P("param"))
k_g = mh.global_array(np.asarray(keys), mesh, mh.P("param", "runs"))
losses = mh.param_sweep(loss_fn, p_g, k_g, mesh)
# this process owns its param-row shard: check it against a local
# single-device reference (cross-host gather not needed for the dryrun)
local = {{(s.index[0].start or 0): float(np.asarray(s.data).reshape(-1)[0])
         for s in losses.addressable_shards}}
my_param = sorted(local)[0]
ref = np.mean([float(loss_fn(params[my_param], keys[my_param, r]))
               for r in range(4)])
assert abs(local[my_param] - ref) < 1e-12, (local, ref)

# gradient path
losses2, grads = mh.param_sweep(loss_fn, p_g, k_g, mesh, with_grad=True)
glocal = {{(s.index[0].start or 0): float(np.asarray(s.data).reshape(-1)[0])
          for s in grads.addressable_shards}}
gi = sorted(glocal)[0]
eps = 1e-6
fd = (np.mean([float(loss_fn(params[gi] + eps, keys[gi, r])) for r in range(4)])
      - np.mean([float(loss_fn(params[gi] - eps, keys[gi, r])) for r in range(4)])) / (2 * eps)
assert abs(glocal[gi] - fd) < 1e-5, (glocal, fd)
print(f"MULTIHOST-OK pid={{pid}} param_row={{my_param}} loss={{local[my_param]:.6f}}")
"""


def test_two_process_param_sweep(tmp_path):
    port = None
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _WORKER.format(repo=repo, coord=coord)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_NUM_CPU_DEVICES", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST-OK pid={pid}" in out, out
