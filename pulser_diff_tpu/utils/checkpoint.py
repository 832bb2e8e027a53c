"""Parameter checkpoint / resume.

The reference has no checkpointing at all (SURVEY.md §5: notebooks
hand-roll best-param dicts).  Here: orbax-backed checkpointing with an
npz fallback, for QuantumModel params pytrees and optimizer states.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_params(path: str, params: dict[str, Any], step: Optional[int] = None) -> str:
    """Save a flat params dict.  Returns the path written."""
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckpt = ocp.StandardCheckpointer()
        target = os.path.join(path, f"step_{step}") if step is not None else path
        ckpt.save(target, jax.device_get(params), force=True)
        ckpt.wait_until_finished()
        return target
    except Exception:
        # npz fallback (also used when orbax is unavailable)
        target = path if path.endswith(".npz") else path + ".npz"
        os.makedirs(os.path.dirname(os.path.abspath(target)), exist_ok=True)
        np.savez(
            target,
            **{k: np.asarray(jax.device_get(v)) for k, v in params.items()},
        )
        return target


def load_params(path: str) -> dict[str, Any]:
    """Load a params dict saved by save_params."""
    import jax.numpy as jnp

    if path.endswith(".npz") or os.path.isfile(path + ".npz"):
        target = path if path.endswith(".npz") else path + ".npz"
        data = np.load(target)
        return {k: jnp.asarray(data[k]) for k in data.files}
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.abspath(path))
    return {k: jnp.asarray(v) for k, v in restored.items()}
