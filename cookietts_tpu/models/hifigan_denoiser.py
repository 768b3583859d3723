"""HiFi-GAN Denoiser — waveform denoising vocoder variant.

Capability rebuild of CookieTTS/_4_mtw/HiFiGAN_Denoiser/{model.py,
modules.py}:

- :class:`MultiResSpect` — multi-resolution STFT log-magnitude features
  (model.py:11-36).
- :class:`DenoiserWN` — WN (dilated conv + gated unit) stack mapping noisy
  audio to a residual correction (modules.py:247+ WN postnet).
- :class:`WaveDiscriminator` (DW) / :class:`SpectDiscriminator` (DS) —
  wave-domain and spectrogram-domain critics (modules.py DW/DS).
- :func:`denoiser_loss` — staged training (model.py:38-60): stage 0/1 is
  multi-res spectral L1+MSE only; stage >= 2 adds LSGAN adversarial terms
  from both discriminators.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..audio.stft import STFT
from .waveglow import GATED_UNITS


@dataclasses.dataclass(frozen=True)
class HiFiGANDenoiserConfig:
    # WN generator
    n_layers: int = 12
    n_channels: int = 64
    kernel_size: int = 3
    gated_unit: str = "GTU"
    # multi-res spect
    window_lengths: Tuple[int, ...] = (1200, 2400, 4800)
    hop_lengths: Tuple[int, ...] = (300, 600, 1200)
    # discriminators
    dw_channels: Tuple[int, ...] = (32, 64, 128)
    ds_channels: Tuple[int, ...] = (16, 32, 64)
    stage: int = 0
    dtype: Any = jnp.float32


class MultiResSpect:
    """Multi-resolution log-magnitude STFT features (host/jit shared)."""

    def __init__(self, window_lengths: Sequence[int],
                 hop_lengths: Sequence[int]):
        self.banks = [STFT(w, h, w)
                      for w, h in zip(window_lengths, hop_lengths)]

    def __call__(self, audio: jnp.ndarray) -> List[jnp.ndarray]:
        out = []
        for bank in self.banks:
            mag, _ = bank.transform(audio.astype(jnp.float32),
                                    return_phase=False)
            out.append(jnp.log(jnp.clip(mag, 1e-5, None)))
        return out


class DenoiserWN(nn.Module):
    """Noisy audio [B, T] -> denoised audio [B, T] (residual WN)."""
    cfg: HiFiGANDenoiserConfig

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        gate = GATED_UNITS[cfg.gated_unit]
        x = audio[:, :, None]
        h = nn.Conv(cfg.n_channels, (1,), dtype=cfg.dtype, name="start")(x)
        skip_sum = jnp.zeros_like(h)
        for i in range(cfg.n_layers):
            dilation = 2 ** (i % 8)
            acts = nn.Conv(2 * cfg.n_channels, (cfg.kernel_size,),
                           kernel_dilation=(dilation,), padding="SAME",
                           dtype=cfg.dtype, name=f"in_layer{i}")(h)
            a, b = jnp.split(acts, 2, axis=-1)
            out = gate(a, b)
            res_skip = nn.Conv(2 * cfg.n_channels, (1,), dtype=cfg.dtype,
                               name=f"res_skip{i}")(out)
            res, skip = jnp.split(res_skip, 2, axis=-1)
            h = h + res
            skip_sum = skip_sum + skip
        delta = nn.Conv(1, (5,), padding="SAME", dtype=cfg.dtype,
                        kernel_init=nn.initializers.zeros,
                        name="end")(skip_sum)[..., 0]
        return jnp.clip(audio + delta, -1.0, 1.0)


class WaveDiscriminator(nn.Module):
    """DW: strided conv critic over raw audio."""
    cfg: HiFiGANDenoiserConfig

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        x = audio[:, :, None]
        for i, ch in enumerate(self.cfg.dw_channels):
            x = nn.Conv(ch, (15,), strides=(4,), padding="SAME",
                        dtype=self.cfg.dtype, name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.1)
        x = nn.Conv(1, (3,), padding="SAME", dtype=self.cfg.dtype,
                    name="out")(x)
        return x.mean(axis=(1, 2))


class SpectDiscriminator(nn.Module):
    """DS: conv critic over a log-magnitude spectrogram [B, T, C]."""
    cfg: HiFiGANDenoiserConfig

    @nn.compact
    def __call__(self, spect: jnp.ndarray) -> jnp.ndarray:
        x = spect[..., None]
        for i, ch in enumerate(self.cfg.ds_channels):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=self.cfg.dtype, name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.1)
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=self.cfg.dtype,
                    name="out")(x)
        return x.mean(axis=(1, 2, 3))


def spectral_losses(mrs: MultiResSpect, pred_audio: jnp.ndarray,
                    gt_audio: jnp.ndarray):
    l1 = jnp.zeros((), jnp.float32)
    mse = jnp.zeros((), jnp.float32)
    for p, g in zip(mrs(pred_audio), mrs(gt_audio)):
        l1 = l1 + jnp.mean(jnp.abs(p - g))
        mse = mse + jnp.mean((p - g) ** 2)
    n = float(len(mrs.banks))
    return l1 / n, mse / n


def denoiser_loss(mrs: MultiResSpect, pred_audio: jnp.ndarray,
                  gt_audio: jnp.ndarray, stage: int = 0,
                  dw_fake: jnp.ndarray | None = None,
                  ds_fake: jnp.ndarray | None = None):
    """Generator loss (staged; adversarial terms use LSGAN real-label=0
    like the reference model.py:70-72)."""
    l1, mse = spectral_losses(mrs, pred_audio, gt_audio)
    total = l1 + mse
    loss_dict = {"spec_L1": l1, "spec_MSE": mse}
    if stage >= 2:
        adv = jnp.zeros((), jnp.float32)
        if dw_fake is not None:
            adv = adv + jnp.mean(dw_fake.astype(jnp.float32) ** 2)
        if ds_fake is not None:
            adv = adv + jnp.mean(ds_fake.astype(jnp.float32) ** 2)
        loss_dict["adv"] = adv
        total = total + adv
    loss_dict["loss"] = total
    return total, loss_dict
