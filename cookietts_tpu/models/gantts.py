"""GAN-TTS style generator / discriminator.

Capability rebuild of CookieTTS/_2_ttm/GANTTS/model.py:

- :class:`ConditionalBatchNorm` — normalization whose scale/shift are
  predicted from a latent z (model.py:30-52).
- :class:`GBlock` — z-conditioned residual upsampling blocks with dilated
  convs (model.py:94-128).
- :class:`DBlock` — downsampling residual blocks for the discriminator
  (model.py:130-162).
- :class:`GANTTSGenerator` — text-conditioned decoder: length-regulated
  char features + z -> mel frames through a GBlock stack.
- :class:`GANTTSDiscriminator` — ensemble of random-window DBlock stacks,
  optionally conditioned on the text features (model.py:164-218).

Rather than porting the torch module graph, the generator reuses this
framework's FFT text encoder + matmul length regulator (untts.py) and
applies the GAN-TTS conditional-BN residual decoder on top.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masking import get_mask_from_lengths
from .untts import FFTBlock, TemporalPredictor, length_regulate


@dataclasses.dataclass(frozen=True)
class GANTTSConfig:
    n_symbols: int = 256
    symbols_embedding_dim: int = 256
    n_speakers: int = 512
    speaker_embedding_dim: int = 64
    n_mel_channels: int = 80
    z_dim: int = 128
    enc_layers: int = 2
    enc_heads: int = 2
    enc_ffn_dim: int = 512
    g_channels: Tuple[int, ...] = (256, 256, 128)
    g_dilations: Tuple[int, ...] = (1, 2, 4, 8)
    d_channels: Tuple[int, ...] = (64, 128, 256)
    d_windows: Tuple[int, ...] = (32, 64, 128)   # random mel windows
    dropout: float = 0.1
    dtype: Any = jnp.float32


class ConditionalBatchNorm(nn.Module):
    """LayerNorm with z-predicted scale/shift (model.py:30-52 uses BN;
    LN avoids cross-device batch stats while keeping the conditioning)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(use_bias=False, use_scale=False,
                         dtype=self.dtype)(x)
        scale = nn.Dense(self.features, dtype=self.dtype,
                         name="scale")(z)[:, None, :]
        shift = nn.Dense(self.features, dtype=self.dtype,
                         name="shift")(z)[:, None, :]
        return h * (1.0 + scale) + shift


class GBlock(nn.Module):
    """z-conditioned residual block with dilated convs (model.py:94-128)."""
    channels: int
    dilations: Sequence[int] = (1, 2, 4, 8)
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        res = nn.Dense(self.channels, dtype=self.dtype, name="res_proj")(x)
        h = x
        for i, d in enumerate(self.dilations):
            h = ConditionalBatchNorm(h.shape[-1], self.dtype,
                                     name=f"cbn{i}")(h, z)
            h = nn.leaky_relu(h, 0.1)
            h = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(d,), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(h)
        return h + res


class DBlock(nn.Module):
    """Downsampling residual block (model.py:130-162)."""
    channels: int
    scale: int = 2
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.scale > 1:
            x = nn.avg_pool(x, (self.scale,), strides=(self.scale,),
                            padding="SAME")
        res = nn.Dense(self.channels, dtype=self.dtype, name="res_proj")(x)
        h = x
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(h, 0.1)
            h = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(d,), padding="SAME",
                        dtype=self.dtype, name=f"conv{i}")(h)
        return h + res


class GANTTSGenerator(nn.Module):
    cfg: GANTTSConfig

    @nn.compact
    def __call__(self, text: jnp.ndarray, text_lengths: jnp.ndarray,
                 speaker_id: jnp.ndarray, durations: jnp.ndarray,
                 z: Optional[jnp.ndarray] = None,
                 t_out: int = 256,
                 key: Optional[jax.Array] = None,
                 deterministic: bool = True):
        cfg = self.cfg
        N = text.shape[1]
        mask = get_mask_from_lengths(text_lengths, N)
        x = nn.Embed(cfg.n_symbols, cfg.symbols_embedding_dim,
                     dtype=cfg.dtype, name="embedding")(
            jnp.clip(text, 0, cfg.n_symbols - 1))
        # scaled sinusoidal positions (see untts._encode — FFT attention
        # is order-blind without them)
        from .untts import sinusoid_positions
        pe = jnp.asarray(
            sinusoid_positions(N, cfg.symbols_embedding_dim), cfg.dtype)
        pos_scale = self.param("pos_scale", nn.initializers.ones, ())
        x = (x + pos_scale * pe[None]) * mask[:, :, None]
        for i in range(cfg.enc_layers):
            x = FFTBlock(cfg.symbols_embedding_dim, cfg.enc_heads,
                         cfg.enc_ffn_dim, dropout=cfg.dropout,
                         dtype=cfg.dtype, name=f"enc{i}")(
                x, mask, deterministic=deterministic)
        spk = nn.Embed(cfg.n_speakers, cfg.speaker_embedding_dim,
                       dtype=cfg.dtype, name="speaker_embedding")(speaker_id)
        x = jnp.concatenate(
            [x, jnp.broadcast_to(spk[:, None, :],
                                 (x.shape[0], N, spk.shape[-1]))], axis=-1)

        if z is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            z = jax.random.normal(key, (text.shape[0], cfg.z_dim), cfg.dtype)

        frames, frame_mask = length_regulate(x, durations, t_out)
        h = frames
        for i, ch in enumerate(cfg.g_channels):
            h = GBlock(ch, cfg.g_dilations, dtype=cfg.dtype,
                       name=f"gblock{i}")(h, z)
        mel = nn.Dense(cfg.n_mel_channels, dtype=cfg.dtype,
                       name="mel_proj")(h)
        return mel * frame_mask[:, :, None], frame_mask


class GANTTSDiscriminator(nn.Module):
    """Ensemble of window discriminators over mel (model.py:164-218)."""
    cfg: GANTTSConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray, cond: Optional[jnp.ndarray] = None,
                 key: Optional[jax.Array] = None):
        """mel [B, T, M] -> list of per-window logits."""
        cfg = self.cfg
        B, T, M = mel.shape
        logits = []
        for wi, window in enumerate(cfg.d_windows):
            if key is not None and T > window:
                start = jax.random.randint(
                    jax.random.fold_in(key, wi), (), 0, T - window)
                x = jax.lax.dynamic_slice_in_dim(mel, start, window, axis=1)
            else:
                x = mel[:, :window]
            for i, ch in enumerate(cfg.d_channels):
                x = DBlock(ch, scale=2 if i else 1, dtype=cfg.dtype,
                           name=f"w{wi}_dblock{i}")(x)
            x = nn.leaky_relu(x, 0.1)
            out = nn.Dense(1, dtype=cfg.dtype, name=f"w{wi}_out")(x)
            logits.append(out.mean(axis=(1, 2)))
        return logits
