"""Elementwise audio processing ops (pure JAX, jittable).

Parity targets (reference: CookieTTS/utils/audio/audio_processing.py):
dynamic-range compression/decompression with the 1e-5 clamp, the
window-sumsquare overlap-add correction used by the inverse STFT, and
Griffin-Lim phase reconstruction.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy.signal import get_window


def dynamic_range_compression(x, C: float = 1.0, clip_val: float = 1e-5):
    """Natural-log dynamic-range compression with a floor clamp."""
    return jnp.log(jnp.clip(x, min=clip_val) * C)


def dynamic_range_decompression(x, C: float = 1.0):
    return jnp.exp(x) / C


def periodic_hann(win_length: int, dtype=np.float64) -> np.ndarray:
    """fftbins=True Hann window (periodic), as used by STFT frontends."""
    return get_window("hann", win_length, fftbins=True).astype(dtype)


def pad_center(window: np.ndarray, size: int) -> np.ndarray:
    """Zero-pad a window symmetrically to `size` samples."""
    n = len(window)
    lpad = (size - n) // 2
    out = np.zeros(size, dtype=window.dtype)
    out[lpad : lpad + n] = window
    return out


def window_sumsquare(
    window_name: str,
    n_frames: int,
    hop_length: int,
    win_length: int,
    n_fft: int,
    dtype=np.float32,
) -> np.ndarray:
    """Sum-square envelope of an overlapped window sequence.

    Used to normalize the overlap-add in the inverse STFT (host-side
    constant; depends only on frame count and hop).
    """
    n = n_fft + hop_length * (n_frames - 1)
    x = np.zeros(n, dtype=np.float64)
    win = get_window(window_name, win_length, fftbins=True)
    win_sq = pad_center(win**2, n_fft)
    for i in range(n_frames):
        sample = i * hop_length
        x[sample : min(n, sample + n_fft)] += win_sq[: max(0, min(n_fft, n - sample))]
    return x.astype(dtype)
