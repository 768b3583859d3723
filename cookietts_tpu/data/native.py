"""ctypes bindings for the native audio kernels (native/libcookieaudio.so).

The C++ library implements the preprocessing hot path (resample, biquad
filtfilt, trim bounds, BS.1770 loudness); every entry point has a pure
numpy/scipy fallback in :mod:`audio_io`, so the framework works without
compilation — the native path is for production preprocessing throughput.

Build once with ``make -C native`` (or :func:`build_native`).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_LIB_DIR, "libcookieaudio.so")

_lib = None


def build_native() -> str:
    subprocess.run(["make", "-C", _LIB_DIR], check=True,
                   capture_output=True)
    return _LIB_PATH


def load(build_if_missing: bool = False) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build_if_missing:
            return None
        build_native()
    lib = ctypes.CDLL(_LIB_PATH)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    longp = ctypes.POINTER(ctypes.c_long)

    lib.resample_poly.restype = ctypes.c_long
    lib.resample_poly.argtypes = [f32p, ctypes.c_long, ctypes.c_int,
                                  ctypes.c_int, f32p, ctypes.c_long]
    lib.sos_filtfilt.restype = None
    lib.sos_filtfilt.argtypes = [f32p, ctypes.c_long, f64p, ctypes.c_int]
    lib.trim_bounds.restype = None
    lib.trim_bounds.argtypes = [f32p, ctypes.c_long, ctypes.c_long,
                                ctypes.c_long, ctypes.c_double, longp,
                                longp]
    lib.bs1770_loudness.restype = ctypes.c_double
    lib.bs1770_loudness.argtypes = [f32p, ctypes.c_long, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _f32(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x, np.float32)


def resample(audio: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    lib = load()
    assert lib is not None
    g = int(np.gcd(sr, target_sr))
    up, down = target_sr // g, sr // g
    x = _f32(audio)
    out_cap = (len(x) * up + down - 1) // down + 8
    out = np.empty(out_cap, np.float32)
    n = lib.resample_poly(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), up, down,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_cap)
    return out[:n].copy()


def sos_filtfilt(audio: np.ndarray, sos: np.ndarray) -> np.ndarray:
    """sos: [n_sections, 6] scipy layout (b0 b1 b2 a0 a1 a2, a0=1)."""
    lib = load()
    assert lib is not None
    x = _f32(audio).copy()
    sos = np.asarray(sos, np.float64)
    coef = np.ascontiguousarray(
        np.concatenate([sos[:, :3], sos[:, 4:6]], axis=1))  # drop a0
    lib.sos_filtfilt(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        coef.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        coef.shape[0])
    return x


def trim_bounds(audio: np.ndarray, frame: int, hop: int,
                top_db: float) -> Tuple[int, int]:
    lib = load()
    assert lib is not None
    x = _f32(audio)
    start = ctypes.c_long()
    end = ctypes.c_long()
    lib.trim_bounds(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), frame,
        hop, top_db, ctypes.byref(start), ctypes.byref(end))
    return start.value, end.value


def bs1770_loudness(audio: np.ndarray, sr: int) -> float:
    lib = load()
    assert lib is not None
    x = _f32(audio)
    return float(lib.bs1770_loudness(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), sr))
