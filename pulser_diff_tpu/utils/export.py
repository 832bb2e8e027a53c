"""AOT export / serving of compiled simulation steps.

The reference has no deployment story: every run re-traces the whole
torch graph in Python (SURVEY.md §3.4 — the graph is rebuilt from
scratch each iteration).  Here a trained model's jitted forward /
value_and_grad step can be exported once to a serialized StableHLO
artifact (`jax.export`) and later reloaded — no Python front-end, no
re-trace, no recompile of the lowering — for production serving of a
fixed pulse program.

Notes:
- The artifact embeds compiler custom calls (e.g. the fused Pallas
  evolution kernel as a Mosaic custom call), so it is tied to the
  lowering platform: export on TPU to serve on TPU.  The platform list
  is stored alongside and checked at load.
- Inputs must keep the exported shapes/dtypes (static shapes are what
  make the artifact retrace-free).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Sequence

import jax
from jax import export as _jexport

_META_SUFFIX = ".meta.json"


def export_step(
    fn: Callable[..., Any],
    example_args: Sequence[Any],
    path: str,
    *,
    platforms: Sequence[str] | None = None,
) -> str:
    """Export ``jit(fn)`` at ``example_args``'s shapes to ``path``.

    ``fn`` is any jittable function over the model's params pytree —
    e.g. ``model.expectation_fn(obs)`` or
    ``jax.value_and_grad(loss)``.  Returns the path written.
    """
    jitted = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    exported = _jexport.export(jitted, **kwargs)(*example_args)
    blob = exported.serialize()
    path = os.path.abspath(path)
    with open(path, "wb") as f:
        f.write(blob)
    meta = {
        "platforms": list(exported.platforms),
        "nr_args": len(exported.in_avals),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "jax_version": jax.__version__,
    }
    with open(path + _META_SUFFIX, "w") as f:
        json.dump(meta, f, indent=1)
    return path


def load_step(path: str, *, check_platform: bool = True) -> Callable[..., Any]:
    """Load an exported step; returns a callable running the compiled
    computation on the current backend."""
    path = os.path.abspath(path)
    with open(path, "rb") as f:
        exported = _jexport.deserialize(f.read())
    if check_platform:
        current = jax.default_backend()
        plats = {p.lower() for p in exported.platforms}
        if current.lower() not in plats:
            raise ValueError(
                f"Artifact was exported for platforms {sorted(plats)} but "
                f"the current backend is '{current}'. Pass "
                "check_platform=False to try anyway."
            )
    return exported.call


def load_meta(path: str) -> dict[str, Any]:
    """Read the sidecar metadata written by :func:`export_step`."""
    with open(os.path.abspath(path) + _META_SUFFIX) as f:
        return json.load(f)
