"""Profiling / tracing helpers.

The reference has no observability hooks (SURVEY.md §5).  Here:
jax.profiler trace annotations + a wall-clock timer that blocks on device
work, so solver phases show up named in TensorBoard/XProf traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def timed(label: str, results: Optional[dict] = None) -> Iterator[None]:
    """Wall-clock a block, blocking on async device work at exit."""
    t0 = time.perf_counter()
    yield
    jax.effects_barrier()
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = dt
    else:
        print(f"[timed] {label}: {dt*1e3:.2f} ms")


@contextlib.contextmanager
def profile_trace(label: str) -> Iterator[None]:
    """Named region in a jax.profiler trace (no-op outside profiling)."""
    with jax.profiler.TraceAnnotation(label):
        yield


def start_server(port: int = 9999) -> None:
    """Start the jax profiler server for on-demand capture."""
    jax.profiler.start_server(port)
