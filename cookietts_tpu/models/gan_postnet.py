"""Adversarial (GAN) postnet + mel discriminator.

Capability rebuild of CookieTTS/_2_ttm/tacotron2_ssvae/model.py:183-316:

- :class:`GANPostnet` — conv stack over [decoder mel, broadcast speaker
  embedding, per-frame noise] producing a "convincing" fake spectrogram,
  with residual connections every ``residual_connections`` layers.
- :class:`GANDiscriminator` — conv stack over [mel, speaker embedding]
  emitting per-utterance predicted fakeness in [0, 1].
- :func:`gan_postnet_losses` — the BCE fakeness losses for both sides
  (real-label = 0, fake-label = 1 as in the reference).

Layout is time-major ([B, T, n_mel]).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class GANPostnetConfig:
    n_mel_channels: int = 80
    speaker_embedding_dim: int = 256
    noise_dim: int = 32
    n_convolutions: int = 5
    embedding_dim: int = 512
    kernel_size: int = 5
    residual_connections: int = 2
    dtype: Any = jnp.float32


def _conv_stack(cfg: GANPostnetConfig, x: jnp.ndarray, out_final: int,
                deterministic: bool, prefix: str) -> jnp.ndarray:
    """Shared residual conv-BN-leaky stack (model.py conv loop).

    Two reference quirks are REPRODUCED deliberately (model.py:237-246,
    296-313 have byte-identical control flow): (a) "connected" layers
    skip LeakyReLU expecting relu(h+res) to supply it, but layer 0
    always changes width and takes the res-refresh branch, so conv0-BN-
    conv1 has no nonlinearity between; (b) the residual anchor only
    refreshes on a WIDTH CHANGE, never after a successful add, so every
    later skip reaches back to the layer that last changed width."""
    res = x
    n = cfg.n_convolutions
    for i in range(n):
        last = i == n - 1
        out_dim = out_final if last else cfg.embedding_dim
        h = nn.Conv(out_dim, (cfg.kernel_size,), padding="SAME",
                    dtype=cfg.dtype, name=f"{prefix}conv{i}")(x)
        connected = cfg.residual_connections and \
            i % cfg.residual_connections == 0
        if not connected:
            h = nn.leaky_relu(h, 0.1)
        if not last:
            h = nn.BatchNorm(use_running_average=deterministic,
                             dtype=cfg.dtype, name=f"{prefix}bn{i}")(h)
        if h.shape[-1] != res.shape[-1]:
            res = h
            x = h
        elif connected:
            x = nn.relu(h + res)
        else:
            x = h
    return x


class GANPostnet(nn.Module):
    cfg: GANPostnetConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray, speaker_embed: jnp.ndarray,
                 key: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """[B, T, M] + [B, S] -> refined mel [B, T, M]."""
        cfg = self.cfg
        B, T, _ = mel.shape
        spk = jnp.broadcast_to(speaker_embed[:, None, :],
                               (B, T, speaker_embed.shape[-1]))
        if key is None:
            key = jax.random.PRNGKey(0)
        noise = jax.random.normal(key, (B, T, cfg.noise_dim), cfg.dtype)
        x = jnp.concatenate([mel.astype(cfg.dtype), spk, noise], axis=-1)
        return _conv_stack(cfg, x, cfg.n_mel_channels, deterministic,
                           "post_")


class GANDiscriminator(nn.Module):
    cfg: GANPostnetConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray, speaker_embed: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """[B, T, M] + [B, S] -> predicted fakeness [B] in [0, 1]."""
        cfg = self.cfg
        B, T, _ = mel.shape
        spk = jnp.broadcast_to(speaker_embed[:, None, :],
                               (B, T, speaker_embed.shape[-1]))
        x = jnp.concatenate([mel.astype(cfg.dtype), spk], axis=-1)
        out = _conv_stack(cfg, x, 1, deterministic, "dis_")   # [B, T, 1]
        # unmasked mean over T like the reference (model.py:313
        # pred_fakeness.mean(dim=2)): zero-padded frames score as
        # content for BOTH real and fake inputs, so the bias cancels in
        # the BCE comparison — kept for parity rather than "fixed"
        return jax.nn.sigmoid(jnp.mean(out[..., 0].astype(jnp.float32),
                                       axis=1))


def gan_postnet_losses(d_real: jnp.ndarray, d_fake: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(generator_loss, discriminator_loss) with the reference labels
    (real = 0 fakeness, fake = 1 fakeness; BCE on the sigmoid outputs)."""
    eps = 1e-6
    d_loss = -(jnp.mean(jnp.log(1.0 - d_real + eps))
               + jnp.mean(jnp.log(d_fake + eps)))
    g_loss = -jnp.mean(jnp.log(1.0 - d_fake + eps))
    return g_loss, d_loss
