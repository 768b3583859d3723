"""Matmul-based STFT / inverse STFT / mel frontend (pure JAX, jittable).

Numerical-parity rebuild of the reference's conv-STFT frontend
(reference: CookieTTS/utils/audio/stft.py:44-207): reflect padding of
filter_length//2 on each side, a windowed DFT basis applied at hop-length
stride, magnitude/phase split at the cutoff bin, pinv-based inverse with
window-sumsquare overlap-add correction, and the log-compressed Slaney-mel
projection with the 1e-5 clamp.

TPU-first design notes:
- The reference runs the DFT basis as a CUDA conv1d. Here the framing is a
  patch extraction and the basis is a single dense [filter_length, 2*cutoff]
  matmul — the shape the MXU wants (hot dims are multiples of 128 for the
  standard 2048-pt config).
- Everything is static-shape; callers pass fixed-length (padded) audio and
  mask downstream.
- Layout convention: this framework is time-major — spectrograms are
  [B, T_frames, C]. (The reference uses [B, C, T]; transpose at the edges
  if exchanging data with it.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank
from .processing import (
    dynamic_range_compression,
    dynamic_range_decompression,
    pad_center,
    periodic_hann,
    window_sumsquare,
)


def _dft_bases(filter_length: int, win_length: int, window: str | None = "hann"):
    """Build the windowed forward DFT basis and its pseudo-inverse.

    Returns (forward_basis [2*cutoff, filter_length],
             inverse_basis [2*cutoff, filter_length]) as float64 numpy.
    """
    fourier = np.fft.fft(np.eye(filter_length))
    cutoff = filter_length // 2 + 1
    basis = np.vstack([np.real(fourier[:cutoff]), np.imag(fourier[:cutoff])])
    # The reference builds pinv(scale*basis) then multiplies the overlap-add
    # output by `scale` again (stft.py:62-63,141) — the two cancel, so the
    # effective inverse basis is the plain pseudo-inverse.
    inv = np.linalg.pinv(basis).T
    if window is not None:
        assert filter_length >= win_length
        w = pad_center(periodic_hann(win_length), filter_length)
        basis = basis * w
        inv = inv * w
    return basis, inv


class STFT:
    """Forward/inverse STFT with precomputed windowed DFT bases."""

    def __init__(self, filter_length: int = 800, hop_length: int = 200,
                 win_length: int = 800, window: str | None = "hann",
                 dtype=jnp.float32):
        self.filter_length = int(filter_length)
        self.hop_length = int(hop_length)
        self.win_length = int(win_length)
        self.window = window
        self.cutoff = self.filter_length // 2 + 1
        fwd, inv = _dft_bases(self.filter_length, self.win_length, window)
        self.forward_basis = jnp.asarray(fwd.T, dtype=dtype)   # [filter_length, 2*cutoff]
        self.inverse_basis = jnp.asarray(inv.T, dtype=dtype)   # [filter_length, 2*cutoff]
        self._wss_cache: dict[int, np.ndarray] = {}

    # -- framing ----------------------------------------------------------
    def _frame(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> [B, n_frames, filter_length] with reflect padding.

        Implemented as an index gather (static indices) — this lowers to a
        cheap gather on both CPU and TPU, unlike a huge-kernel conv.
        """
        pad = self.filter_length // 2
        x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = (x.shape[1] - self.filter_length) // self.hop_length + 1
        idx = (
            np.arange(n_frames)[:, None] * self.hop_length
            + np.arange(self.filter_length)[None, :]
        )
        return x[:, idx]  # [B, n_frames, filter_length]

    # -- forward ----------------------------------------------------------
    def transform(self, audio: jnp.ndarray, return_phase: bool = True):
        """[B, T] audio -> (magnitude [B, n_frames, cutoff], phase or None)."""
        frames = self._frame(audio)
        spec = jnp.einsum(
            "btf,fc->btc", frames, self.forward_basis,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, n_frames, 2*cutoff]
        real, imag = spec[..., : self.cutoff], spec[..., self.cutoff :]
        magnitude = jnp.sqrt(real**2 + imag**2)
        phase = jnp.arctan2(imag, real) if return_phase else None
        return magnitude, phase

    # -- inverse ----------------------------------------------------------
    def _window_sum(self, n_frames: int) -> np.ndarray:
        if n_frames not in self._wss_cache:
            wss = window_sumsquare(
                self.window, n_frames, self.hop_length, self.win_length,
                self.filter_length,
            )
            tiny = np.finfo(np.float32).tiny
            self._wss_cache[n_frames] = np.where(wss > tiny, wss, 1.0).astype(np.float32)
        return self._wss_cache[n_frames]

    def inverse(self, magnitude: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
        """(mag, phase) [B, n_frames, cutoff] -> audio [B, T] (overlap-add)."""
        n_frames = magnitude.shape[1]
        recomb = jnp.concatenate(
            [magnitude * jnp.cos(phase), magnitude * jnp.sin(phase)], axis=-1
        )  # [B, n_frames, 2*cutoff]
        # Per-frame synthesis then overlap-add via transposed conv.
        frames = jnp.einsum(
            "btc,fc->btf", recomb, self.inverse_basis,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [B, n_frames, filter_length]
        # Overlap-add: out[t*hop + f] += frames[b, t, f], as a scatter-add
        # with static indices (lowers to an efficient scatter on TPU).
        t_full = self.filter_length + self.hop_length * (n_frames - 1)
        idx = (
            np.arange(n_frames)[:, None] * self.hop_length
            + np.arange(self.filter_length)[None, :]
        )
        out = jnp.zeros((frames.shape[0], t_full), dtype=frames.dtype)
        out = out.at[:, idx].add(frames)  # [B, T_full]
        if self.window is not None:
            wsum = jnp.asarray(self._window_sum(n_frames))
            out = out / wsum
        pad = self.filter_length // 2
        return out[:, pad:-pad]

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        mag, phase = self.transform(audio)
        return self.inverse(mag, phase)


class TacotronSTFT:
    """Mel-spectrogram frontend: STFT magnitude → Slaney mel → ln-compress.

    mel layout is time-major: [B, n_frames, n_mel].
    """

    def __init__(self, filter_length: int = 1024, hop_length: int = 256,
                 win_length: int = 1024, n_mel_channels: int = 80,
                 sampling_rate: int = 22050, mel_fmin: float = 0.0,
                 mel_fmax: float | None = 8000.0, clamp_val: float = 1e-5,
                 dtype=jnp.float32):
        self.n_mel_channels = n_mel_channels
        self.sampling_rate = sampling_rate
        self.clip_val = clamp_val
        self.hop_length = hop_length
        self.stft = STFT(filter_length, hop_length, win_length, dtype=dtype)
        basis = mel_filterbank(
            sampling_rate, filter_length, n_mel_channels, mel_fmin, mel_fmax
        )
        self.mel_basis = jnp.asarray(basis.T, dtype=dtype)  # [cutoff, n_mel]

    def spectral_normalize(self, magnitudes):
        return dynamic_range_compression(magnitudes, clip_val=self.clip_val)

    def spectral_de_normalize(self, magnitudes):
        return dynamic_range_decompression(magnitudes)

    @partial(jax.jit, static_argnums=0)
    def mel_spectrogram(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, T] audio in [-1, 1] -> log-mel [B, n_frames, n_mel]."""
        magnitudes, _ = self.stft.transform(audio, return_phase=False)
        mel = jnp.einsum(
            "btc,cm->btm", magnitudes, self.mel_basis,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return self.spectral_normalize(mel)



    def mel_spectrogram_np(self, audio) -> "np.ndarray":
        """Numpy mirror of :meth:`mel_spectrogram` for host-side feature
        extraction (dataset preprocessing / caching). Bit-compatible with
        the JAX path up to float32 rounding — parity-tested in
        tests/test_audio.py. Accepts [T] or [B, T]."""
        squeeze = audio.ndim == 1
        x = np.atleast_2d(np.asarray(audio, np.float32))
        pad = self.stft.filter_length // 2
        x = np.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = (x.shape[1] - self.stft.filter_length) \
            // self.stft.hop_length + 1
        idx = (np.arange(n_frames)[:, None] * self.stft.hop_length
               + np.arange(self.stft.filter_length)[None, :])
        frames = x[:, idx]                                  # [B, T, F]
        fwd = np.asarray(self.stft.forward_basis)           # [F, 2*cutoff]
        spec = frames @ fwd
        c = self.stft.cutoff
        mag = np.sqrt(spec[..., :c] ** 2 + spec[..., c:] ** 2)
        mel = mag @ np.asarray(self.mel_basis)
        mel = np.log(np.clip(mel, self.clip_val, None))
        return mel[0] if squeeze else mel

    def griffin_lim(self, magnitudes: jnp.ndarray, n_iters: int = 30,
                    momentum: float = 0.99,
                    key: jax.Array | None = None) -> jnp.ndarray:
        """Phase reconstruction from linear magnitudes [B, n_frames, cutoff].

        Uses the accelerated (momentum) Griffin-Lim update; ``momentum=0``
        recovers the classic 30-iteration scheme the reference uses
        (CookieTTS/utils/audio/audio_processing.py:59-75).
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        angles = jax.random.uniform(
            key, magnitudes.shape, minval=-np.pi, maxval=np.pi,
            dtype=magnitudes.dtype,
        )
        # complex spectrum carried as (real, imag) pair
        rebuilt = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=0)

        def body(_, carry):
            rebuilt, prev = carry
            accel = rebuilt + momentum * (rebuilt - prev)
            phase = jnp.arctan2(accel[1], accel[0])
            audio = self.stft.inverse(magnitudes, phase)
            mag2, phase2 = self.stft.transform(audio, return_phase=True)
            new_rebuilt = jnp.stack(
                [mag2 * jnp.cos(phase2), mag2 * jnp.sin(phase2)], axis=0
            )
            norm = jnp.maximum(mag2, 1e-16)[None]
            return new_rebuilt / norm, rebuilt

        rebuilt, _ = jax.lax.fori_loop(0, n_iters, body, (rebuilt, rebuilt))
        angles = jnp.arctan2(rebuilt[1], rebuilt[0])
        return self.stft.inverse(magnitudes, angles)
