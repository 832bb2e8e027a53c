"""ctypes bindings to the native host-side sampling kernels.

Builds `native/libpdtpu_native.so` on demand (g++) and exposes typed
wrappers.  Every entry point has a pure-Python/JAX equivalent in
pulser_diff_tpu.core — the native path is the fast eager-sampling route
for large concrete schedules; traced (differentiable) inputs always take
the JAX path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libpdtpu_native.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_SO_PATH):
            subprocess.run(
                ["make", "-s", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO_PATH)
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int64)
        lib.wf_blackman.argtypes = [ctypes.c_int64, ctypes.c_double, dp]
        lib.wf_kaiser.argtypes = [
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_double,
            dp,
        ]
        lib.wf_ramp.argtypes = [
            ctypes.c_int64,
            ctypes.c_double,
            ctypes.c_double,
            dp,
        ]
        lib.wf_pchip.argtypes = [ctypes.c_int64, dp, dp, ctypes.c_int64, dp, dp]
        lib.assemble_channel.argtypes = [
            ctypes.c_int64,
            ctypes.c_int64,
            ip,
            ip,
            dp,
            dp,
            dp,
            dp,
            dp,
            dp,
        ]
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _ensure_built() is not None


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def blackman(n: int, area: float) -> np.ndarray:
    lib = _ensure_built()
    out = np.empty(n, dtype=np.float64)
    lib.wf_blackman(n, float(area), _dp(out))
    return out


def kaiser(n: int, area: float, beta: float = 14.6) -> np.ndarray:
    lib = _ensure_built()
    out = np.empty(n, dtype=np.float64)
    lib.wf_kaiser(n, float(area), float(beta), _dp(out))
    return out


def ramp(n: int, start: float, stop: float) -> np.ndarray:
    lib = _ensure_built()
    out = np.empty(n, dtype=np.float64)
    lib.wf_ramp(n, float(start), float(stop), _dp(out))
    return out


def pchip(x: np.ndarray, y: np.ndarray, t: np.ndarray) -> np.ndarray:
    lib = _ensure_built()
    x = np.ascontiguousarray(x, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    t = np.ascontiguousarray(t, dtype=np.float64)
    out = np.empty(len(t), dtype=np.float64)
    lib.wf_pchip(len(x), _dp(x), _dp(y), len(t), _dp(t), _dp(out))
    return out


def assemble_channel(
    total: int,
    ti: np.ndarray,
    tf: np.ndarray,
    seg_amp: np.ndarray,
    seg_det: np.ndarray,
    seg_phase: np.ndarray,
):
    lib = _ensure_built()
    ti = np.ascontiguousarray(ti, dtype=np.int64)
    tf = np.ascontiguousarray(tf, dtype=np.int64)
    seg_amp = np.ascontiguousarray(seg_amp, dtype=np.float64)
    seg_det = np.ascontiguousarray(seg_det, dtype=np.float64)
    seg_phase = np.ascontiguousarray(seg_phase, dtype=np.float64)
    amp = np.zeros(total, dtype=np.float64)
    det = np.zeros(total, dtype=np.float64)
    phase = np.zeros(total, dtype=np.float64)
    lib.assemble_channel(
        total,
        len(ti),
        _ip(ti),
        _ip(tf),
        _dp(seg_amp),
        _dp(seg_det),
        _dp(seg_phase),
        _dp(amp),
        _dp(det),
        _dp(phase),
    )
    return amp, det, phase
