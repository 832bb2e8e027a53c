"""Execute the documentation scripts (the reference runs its notebooks
headlessly in CI, test_notebooks.py; gate_optimization is excluded there
for runtime — here we smoke-run its loss/grad instead of the full loop)."""

import os
import runpy

import pytest

import jax
import jax.numpy as jnp

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")


def test_basic_usage_runs():
    runpy.run_path(os.path.join(DOCS, "basic_usage.py"), run_name="docs")


def test_gate_optimization_loss_and_grad():
    mod = runpy.run_path(
        os.path.join(DOCS, "gate_optimization.py"), run_name="docs"
    )
    fid = mod["gate_fidelity"]
    p = (jnp.full((mod["N_PARAMS"],), 3.0), jnp.full((mod["N_PARAMS"],), 3.0))
    v, g = jax.value_and_grad(lambda x: 1.0 - fid(x))(p)
    assert 0.0 <= float(v) <= 1.0
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in g)


def test_state_preparation_loss_and_grad():
    mod = runpy.run_path(
        os.path.join(DOCS, "state_preparation.py"), run_name="docs"
    )
    fid = mod["fidelity"]
    import numpy as np

    a = jnp.asarray(3.0 * np.sin(np.linspace(0, np.pi, mod["N_PARAMS"])))
    d = jnp.asarray(np.linspace(-6.0, 6.0, mod["N_PARAMS"]))
    v = fid(a, d)
    assert 0.0 <= float(v) <= 1.0
