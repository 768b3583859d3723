"""HiFi-GAN generator + discriminators, TPU-first.

Capability rebuild of CookieTTS/_4_mtw/hifigan/models.py:

- :class:`Generator` — conv-transpose upsampling with multi-receptive-field
  (MRF) residual blocks (models.py:97-147).
- :class:`MultiPeriodDiscriminator` — per-period 2-D conv stacks over
  reshaped audio (models.py:150-207).
- :class:`MultiScaleDiscriminator` — 1-D conv stacks over pooled scales
  (models.py:210-267).
- loss functions: LSGAN discriminator/generator losses + L1 feature
  matching (models.py:270-301).

All convs use weight normalization like the reference. Audio layout [B, T];
mel layout [B, T_mel, n_mel] (time-major).
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    n_mel_channels: int = 80
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    mpd_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    msd_scales: int = 3
    lrelu_slope: float = 0.1
    dtype: Any = jnp.float32


def _wn_conv(features, kernel, name, dtype, strides=1, dilation=1,
             groups=1, transpose=False):
    if transpose:
        conv = nn.ConvTranspose(features, (kernel,), strides=(strides,),
                                padding="SAME", dtype=dtype)
    else:
        conv = nn.Conv(features, (kernel,), strides=(strides,),
                       kernel_dilation=(dilation,), padding="SAME",
                       feature_group_count=groups, dtype=dtype)
    return nn.WeightNorm(conv, name=name)


class ResBlock1(nn.Module):
    """MRF residual block (models.py ResBlock1): two convs per dilation."""
    channels: int
    kernel_size: int
    dilations: Sequence[int]
    lrelu_slope: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, self.lrelu_slope)
            h = _wn_conv(self.channels, self.kernel_size, f"conv1_{i}",
                         self.dtype, dilation=d)(h)
            h = nn.leaky_relu(h, self.lrelu_slope)
            h = _wn_conv(self.channels, self.kernel_size, f"conv2_{i}",
                         self.dtype, dilation=1)(h)
            x = x + h
        return x


class Generator(nn.Module):
    """Mel -> waveform generator (models.py:97-147)."""
    cfg: HiFiGANConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """[B, T_mel, n_mel] -> [B, T_mel * prod(upsample_rates)]."""
        cfg = self.cfg
        h = _wn_conv(cfg.upsample_initial_channel, 7, "conv_pre",
                     cfg.dtype)(mel)
        for i, (rate, k) in enumerate(zip(cfg.upsample_rates,
                                          cfg.upsample_kernel_sizes)):
            h = nn.leaky_relu(h, cfg.lrelu_slope)
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            h = _wn_conv(ch, k, f"up{i}", cfg.dtype, strides=rate,
                         transpose=True)(h)
            # MRF: sum of resblocks with different kernels/dilations
            acc = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilations)):
                out = ResBlock1(ch, rk, rd, cfg.lrelu_slope, cfg.dtype,
                                name=f"resblock{i}_{j}")(h)
                acc = out if acc is None else acc + out
            h = acc / len(cfg.resblock_kernel_sizes)
        # the FINAL activation uses torch's default 0.01 slope, not
        # LRELU_SLOPE — reference models.py:134 `F.leaky_relu(x)`
        h = nn.leaky_relu(h, 0.01)
        h = _wn_conv(1, 7, "conv_post", cfg.dtype)(h)
        return jnp.tanh(h)[..., 0]


class PeriodDiscriminator(nn.Module):
    """One period branch of the MPD (models.py:150-180)."""
    period: int
    lrelu_slope: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio: jnp.ndarray):
        """[B, T] -> (logits [B, ...], feature maps list)."""
        B, T = audio.shape
        p = self.period
        pad = (p - T % p) % p
        x = jnp.pad(audio, ((0, 0), (0, pad)), mode="reflect")
        x = x.reshape(B, -1, p, 1)               # [B, T/p, p, 1]
        fmaps: List[jnp.ndarray] = []
        for i, ch in enumerate((32, 128, 512, 1024)):
            x = nn.WeightNorm(nn.Conv(ch, (5, 1), strides=(3, 1),
                                      padding=((2, 2), (0, 0)),
                                      dtype=self.dtype),
                              name=f"conv{i}")(x)
            x = nn.leaky_relu(x, self.lrelu_slope)
            fmaps.append(x)
        x = nn.WeightNorm(nn.Conv(1024, (5, 1), padding=((2, 2), (0, 0)),
                                  dtype=self.dtype), name="conv4")(x)
        x = nn.leaky_relu(x, self.lrelu_slope)
        fmaps.append(x)
        x = nn.WeightNorm(nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)),
                                  dtype=self.dtype), name="conv_post")(x)
        fmaps.append(x)
        return x.reshape(B, -1), fmaps


class ScaleDiscriminator(nn.Module):
    """One scale branch of the MSD (models.py:210-240)."""
    lrelu_slope: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio: jnp.ndarray):
        x = audio[:, :, None]                    # [B, T, 1]
        fmaps: List[jnp.ndarray] = []
        specs = [
            (128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
            (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
            (1024, 5, 1, 1),
        ]
        for i, (ch, k, s, g) in enumerate(specs):
            x = _wn_conv(ch, k, f"conv{i}", self.dtype, strides=s,
                         groups=g)(x)
            x = nn.leaky_relu(x, self.lrelu_slope)
            fmaps.append(x)
        x = _wn_conv(1, 3, "conv_post", self.dtype)(x)
        fmaps.append(x)
        return x.reshape(audio.shape[0], -1), fmaps


class MultiPeriodDiscriminator(nn.Module):
    cfg: HiFiGANConfig

    @nn.compact
    def __call__(self, real: jnp.ndarray, fake: jnp.ndarray):
        """Returns (real_logits, fake_logits, real_fmaps, fake_fmaps)."""
        r_logits, f_logits, r_fmaps, f_fmaps = [], [], [], []
        for p in self.cfg.mpd_periods:
            d = PeriodDiscriminator(p, self.cfg.lrelu_slope, self.cfg.dtype,
                                    name=f"period{p}")
            rl, rf = d(real)
            fl, ff = d(fake)
            r_logits.append(rl); f_logits.append(fl)
            r_fmaps.append(rf); f_fmaps.append(ff)
        return r_logits, f_logits, r_fmaps, f_fmaps


class MultiScaleDiscriminator(nn.Module):
    cfg: HiFiGANConfig

    @nn.compact
    def __call__(self, real: jnp.ndarray, fake: jnp.ndarray):
        r_logits, f_logits, r_fmaps, f_fmaps = [], [], [], []
        r, f = real, fake
        for i in range(self.cfg.msd_scales):
            d = ScaleDiscriminator(self.cfg.lrelu_slope, self.cfg.dtype,
                                   name=f"scale{i}")
            rl, rf = d(r)
            fl, ff = d(f)
            r_logits.append(rl); f_logits.append(fl)
            r_fmaps.append(rf); f_fmaps.append(ff)
            if i != self.cfg.msd_scales - 1:
                r = nn.avg_pool(r[:, :, None], (4,), strides=(2,),
                                padding="SAME")[..., 0]
                f = nn.avg_pool(f[:, :, None], (4,), strides=(2,),
                                padding="SAME")[..., 0]
        return r_logits, f_logits, r_fmaps, f_fmaps


# -- losses (models.py:270-301) ------------------------------------------

def discriminator_loss(real_logits, fake_logits):
    """LSGAN: mean((1-D(y))^2) + mean(D(y_hat)^2)."""
    loss = jnp.zeros((), jnp.float32)
    for rl, fl in zip(real_logits, fake_logits):
        loss = loss + jnp.mean((1.0 - rl.astype(jnp.float32)) ** 2)
        loss = loss + jnp.mean(fl.astype(jnp.float32) ** 2)
    return loss


def generator_loss(fake_logits):
    """LSGAN: mean((1-D(y_hat))^2)."""
    loss = jnp.zeros((), jnp.float32)
    for fl in fake_logits:
        loss = loss + jnp.mean((1.0 - fl.astype(jnp.float32)) ** 2)
    return loss


def feature_loss(real_fmaps, fake_fmaps):
    """L1 feature matching, x2 like the reference."""
    loss = jnp.zeros((), jnp.float32)
    for rfs, ffs in zip(real_fmaps, fake_fmaps):
        for rf, ff in zip(rfs, ffs):
            loss = loss + jnp.mean(jnp.abs(
                rf.astype(jnp.float32) - ff.astype(jnp.float32)))
    return loss * 2.0


def mel_l1_loss(mel_real: jnp.ndarray, mel_fake: jnp.ndarray) -> jnp.ndarray:
    """L1 mel reconstruction loss (weight 45 in the reference trainer)."""
    return jnp.mean(jnp.abs(mel_real.astype(jnp.float32)
                            - mel_fake.astype(jnp.float32)))
