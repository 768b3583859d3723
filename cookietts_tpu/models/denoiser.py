"""Vocoder bias removal (spectral denoiser).

Capability rebuild of CookieTTS/_4_mtw/waveglow/denoiser.py:7-71: run the
vocoder on a near-silent mel (noise * 0.01) to expose its model bias,
store the mean bias magnitude spectrum (optionally per speaker), then
subtract ``strength * bias`` from generated audio in the STFT domain and
resynthesize with the original phase.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.stft import STFT


class Denoiser:
    def __init__(self, infer_fn: Callable[[jnp.ndarray, jax.Array], jnp.ndarray],
                 sampling_rate: int = 48000,
                 n_mel_channels: int = 160, n_frames: int = 20,
                 mu: float = 0.0, var: float = 0.01,
                 wg_sigma: float = 0.01,
                 filter_length: Optional[int] = None,
                 hop_length: Optional[int] = None,
                 win_length: Optional[int] = None,
                 key: Optional[jax.Array] = None):
        """infer_fn(mel [1, T, M], key) -> audio [1, T*hop]."""
        filter_length = filter_length or sampling_rate // 40
        win_length = win_length or sampling_rate // 40
        hop_length = hop_length or sampling_rate // 400
        self.stft = STFT(filter_length, hop_length, win_length)

        key = key if key is not None else jax.random.PRNGKey(0)
        k_mel, k_sig = jax.random.split(key)
        mel_input = mu + var * jax.random.normal(
            k_mel, (1, n_frames, n_mel_channels), jnp.float32)
        bias_audio = infer_fn(mel_input, k_sig).astype(jnp.float32)
        assert np.isfinite(np.asarray(bias_audio)).all(), \
            "non-finite elements in vocoder bias output"
        bias_spec, _ = self.stft.transform(bias_audio, return_phase=False)
        # mean over time -> [1, 1, cutoff]
        self.bias_spec = jnp.mean(bias_spec, axis=1, keepdims=True)

    def __call__(self, audio: jnp.ndarray,
                 strength: float = 0.1) -> jnp.ndarray:
        """audio [B, T] -> denoised audio [B, T'] (T' = OLA length)."""
        mag, phase = self.stft.transform(audio.astype(jnp.float32))
        mag = jnp.maximum(mag - strength * self.bias_spec, 0.0)
        return self.stft.inverse(mag, phase)
