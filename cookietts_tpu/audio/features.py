"""Fused on-device feature frontend (jittable, batched, static shapes).

The reference computes training features file-by-file on the host with C
libraries: pyworld f0 (data_utils.py:815-838), pyloudnorm BS.1770
loudness (:786-803), librosa mel (stft.py:180-207). This module is the
TPU-native equivalent — ONE jitted function takes a padded [B, T] audio
batch and produces every per-frame feature in a single compiled program
(XLA fuses the framing/FFT work shared between mel, f0 and loudness),
which is the SURVEY.md §2.9 "fused on-device preprocessing" north star.

Host parity anchors (tested in tests/test_features.py):
- ``estimate_f0``       ≙ data/audio_io.py:estimate_f0_autocorr (numpy)
- ``measure_loudness``  ≙ audio/dsp.py:measure_loudness_lufs (BS.1770-4,
  biquad cascade approximated by its truncated impulse response — exact
  to ~1e-3 LU since the IIR decays within a few ms)
- ``energy``            ≙ data/dataset.py (exp-mel channel mean)
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .stft import TacotronSTFT


def _frame(audio: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[B, T] -> [B, N, frame_length] (clamped gather, matches the numpy
    mirror in data/audio_io.py:224-227)."""
    T = audio.shape[-1]
    n = max(1 + (T - frame_length) // hop, 1)
    idx = jnp.arange(n)[:, None] * hop + jnp.arange(frame_length)[None, :]
    idx = jnp.minimum(idx, T - 1)
    return audio[:, idx]


@functools.partial(jax.jit, static_argnames=(
    "sr", "hop_length", "frame_length", "f0_min", "f0_max", "center"))
def estimate_f0(audio: jnp.ndarray, sr: int, hop_length: int = 512,
                frame_length: int = 2048, f0_min: float = 55.0,
                f0_max: float = 760.0, voiced_thresh: float = 0.3,
                center: bool = False
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched autocorrelation pitch track: [B, T] -> (f0 [B, N], voiced).

    Same algorithm as the host-side stand-in for pyworld DIO
    (data/audio_io.py:214-240): Hann-windowed frames, FFT autocorrelation,
    peak pick inside the [sr/f0_max, sr/f0_min] lag window, peak/ac0
    strength as the voicing decision, f0=0 on unvoiced frames.

    ``center=True`` reflect-pads by frame_length//2 like the STFT, so
    frame k is centered on sample k*hop and the track sits on the SAME
    grid as the mel (count 1 + T//hop); the default start-aligned frames
    match the host anchor ``audio_io.estimate_f0_autocorr``.
    """
    if center:
        pad = frame_length // 2
        audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    frames = _frame(audio.astype(jnp.float32), frame_length, hop_length)
    frames = frames * jnp.asarray(np.hanning(frame_length), jnp.float32)
    spec = jnp.fft.rfft(frames, n=2 * frame_length, axis=-1)
    ac = jnp.fft.irfft(jnp.abs(spec) ** 2, axis=-1)[..., :frame_length]
    ac0 = ac[..., 0] + 1e-9
    lag_min = int(sr / f0_max)
    lag_max = min(int(sr / f0_min), frame_length - 1)
    window = ac[..., lag_min:lag_max]
    best = jnp.argmax(window, axis=-1) + lag_min
    strength = window.max(axis=-1) / ac0
    f0 = sr / best.astype(jnp.float32)
    voiced = strength > voiced_thresh
    return jnp.where(voiced, f0, 0.0), voiced


@functools.lru_cache(maxsize=8)
def _k_weighting_fir(sr: int, numtaps: int = 8192) -> np.ndarray:
    """Truncated impulse response of the BS.1770 K-weighting biquad
    cascade (audio/dsp.py:_k_weighting_coeffs) — lets the IIR pre-filter
    run as one conv on the MXU instead of a sample-serial scan."""
    from scipy import signal

    from .dsp import _k_weighting_coeffs
    (b1, a1), (b2, a2) = _k_weighting_coeffs(sr)
    impulse = np.zeros(numtaps)
    impulse[0] = 1.0
    h = signal.lfilter(b2, a2, signal.lfilter(b1, a1, impulse))
    return h.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("sr", "block_s", "overlap"))
def measure_loudness(audio: jnp.ndarray,
                     lengths: Optional[jnp.ndarray] = None, *,
                     sr: int, block_s: float = 0.400,
                     overlap: float = 0.75) -> jnp.ndarray:
    """Integrated loudness [B] in LUFS per ITU-R BS.1770-4 (mono), with
    -70 LUFS absolute and -10 LU relative gating. ``lengths`` masks the
    padded tail of each batch row."""
    x = audio.astype(jnp.float32)
    B, T = x.shape
    h = jnp.asarray(_k_weighting_fir(sr))
    # lax.conv is correlation — flip the (asymmetric, causal) kernel so
    # this computes true convolution: xw[t] = sum_j h[j] * x[t-j]
    xw = jax.lax.conv_general_dilated(
        x[:, None, :], h[::-1][None, None, :], window_strides=(1,),
        padding=[(h.shape[0] - 1, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"))[:, 0, :]

    blk = int(sr * block_s)
    step = max(int(sr * block_s * (1 - overlap)), 1)
    if T < blk:
        ms = jnp.mean(xw ** 2, axis=-1, keepdims=True)       # [B, 1]
        valid = jnp.ones_like(ms, bool)
    else:
        n_blocks = 1 + (T - blk) // step
        starts = jnp.arange(n_blocks) * step
        idx = starts[:, None] + jnp.arange(blk)[None, :]
        ms = jnp.mean(xw[:, idx] ** 2, axis=-1)              # [B, N]
        if lengths is None:
            valid = jnp.ones_like(ms, bool)
        else:
            valid = (starts[None, :] + blk) <= lengths[:, None]
            # a clip shorter than one block has NO fitting block — keep
            # only block 0 (its samples plus pad), not every pad block
            # (cumsum==0 is all-True when nothing is valid)
            none_valid = ~jnp.any(valid, axis=1, keepdims=True)
            first = jnp.arange(ms.shape[1])[None, :] == 0
            valid = valid | (none_valid & first)

    def gated_loudness(ms, gate):
        mean = jnp.sum(jnp.where(gate, ms, 0.0), axis=-1) \
            / jnp.maximum(jnp.sum(gate, axis=-1), 1)
        return -0.691 + 10.0 * jnp.log10(mean + 1e-30)

    block_l = -0.691 + 10.0 * jnp.log10(ms + 1e-30)
    gate = valid & (block_l > -70.0)
    rel = gated_loudness(ms, gate)[:, None] - 10.0
    gate = gate & (block_l > rel)
    return gated_loudness(ms, gate)


def fused_frontend(stft: TacotronSTFT, *, sr: int,
                   target_lufs: Optional[float] = -27.0,
                   f0_min: float = 55.0, f0_max: float = 760.0):
    """Build the one-call on-device feature extractor.

    Returns a jitted ``fn(audio [B, T], lengths [B]) -> dict`` computing:
    loudness (pre-normalization LUFS), loudness-normalized audio (to
    ``target_lufs``, the preprocess default — start_preprocess.py RMS /
    data_utils.py:786-803 LUFS step), mel, energy (exp-mel channel mean,
    dataset parity), f0 + voicedness. Everything is one XLA program: the
    audio is read from HBM once and all framing/FFT work fuses.
    """

    @jax.jit
    def fn(audio: jnp.ndarray,
           lengths: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
        audio = audio.astype(jnp.float32)
        lufs = measure_loudness(audio, lengths, sr=sr)
        if target_lufs is not None:
            # mirror the host anchor (audio_io.loudness_normalize):
            # +/-30 dB gain clamp — a fully-gated near-silent clip
            # measures ~-300 LUFS here (the host returns -70), and an
            # unclamped 10^13 gain would amplify noise to clipped
            # garbage — then peak-divide rather than hard-clip
            gain_db = jnp.clip(target_lufs - lufs, -30.0, 30.0)
            audio = audio * (10.0 ** (gain_db / 20.0))[:, None]
            peak = jnp.max(jnp.abs(audio), axis=-1, keepdims=True) + 1e-9
            audio = jnp.where(peak > 1.0, audio / peak, audio)
        mel = stft.mel_spectrogram(audio)                    # [B, N, M]
        energy = jnp.exp(mel).mean(axis=-1)                  # [B, N]
        # center=True puts f0 frames on the SAME center-padded grid as
        # the mel, so row k of every output describes the same instant
        f0, voiced = estimate_f0(
            audio, sr, hop_length=stft.hop_length,
            frame_length=stft.stft.filter_length,
            f0_min=f0_min, f0_max=f0_max, center=True)
        n = min(mel.shape[1], f0.shape[1])
        return {
            "audio": audio,
            "loudness": lufs,
            "mel": mel[:, :n],
            "energy": energy[:, :n],
            "f0": f0[:, :n],
            "voiced": voiced[:, :n],
        }

    return fn
