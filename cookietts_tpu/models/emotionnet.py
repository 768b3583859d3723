"""EmotionNet + AuxEmotionNet — semi-supervised emotion VAE heads.

Capability rebuild of CookieTTS/_2_ttm/tacotron2_ssvae/nets/
{EmotionNet.py:66-140, AuxEmotionNet.py:7-74}:

- :class:`EmotionNet` — classifies emotion from a reference mel (via a
  small ReferenceEncoder), speaker embedding, and a GRU summary of the
  text encoder outputs; supervised items override the classifier with
  their one-hot label ("semi-supervised"), and a latent layer produces a
  VAE posterior (zu) conditioned on the class distribution.
- :class:`AuxEmotionNet` — predicts the SAME (zs, zu) from torchMoji
  hidden + speaker + text only (no audio), so inference can drive the
  emotion latents from text alone.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .gst import GSTConfig, ReferenceEncoder

EPSILON = 1e-6    # reference EmotionNet.py:10 (fp16-safe log floor)


@dataclasses.dataclass(frozen=True)
class EmotionNetConfig:
    n_classes: int = 16                 # emotion_classes (hparams.py:186)
    latent_dim: int = 32
    ref_enc_filters: Sequence[int] = (32, 32, 64, 64, 128, 128)
    ref_enc_rnn_dim: int = 128
    rnn_dim: int = 128                  # text GRU summary dim
    speaker_embedding_dim: int = 256
    torchmoji_dim: int = 2304
    aux_layer_dims: Sequence[int] = (256,)
    classifier_dropout: float = 0.25
    encoder_outputs_dropout: float = 0.25
    n_mel_channels: int = 80
    dtype: Any = jnp.float32


def _reparameterize(mu, logvar, key, deterministic):
    if deterministic or key is None:
        return mu
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(key, mu.shape)


def _text_summary(encoder_outputs: jnp.ndarray,
                  text_lengths: Optional[jnp.ndarray],
                  rnn_dim: int, name: str) -> jnp.ndarray:
    """GRU over encoder outputs -> final hidden [B, rnn_dim]."""
    out = nn.RNN(nn.GRUCell(rnn_dim), name=name)(
        encoder_outputs,
        seq_lengths=text_lengths)
    if text_lengths is not None:
        idx = jnp.maximum(text_lengths - 1, 0)
        return out[jnp.arange(out.shape[0]), idx]
    return out[:, -1]


class EmotionNet(nn.Module):
    cfg: EmotionNetConfig

    @nn.compact
    def __call__(self, gt_mels: jnp.ndarray, speaker_embed: jnp.ndarray,
                 encoder_outputs: jnp.ndarray,
                 text_lengths: Optional[jnp.ndarray] = None,
                 emotion_id: Optional[jnp.ndarray] = None,
                 emotion_onehot: Optional[jnp.ndarray] = None,
                 key: Optional[jax.Array] = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        ref_cfg = GSTConfig(n_mel_channels=cfg.n_mel_channels,
                            token_embedding_size=cfg.ref_enc_rnn_dim,
                            ref_enc_filters=tuple(cfg.ref_enc_filters),
                            dtype=cfg.dtype)
        ref = ReferenceEncoder(ref_cfg, name="ref_enc")(
            gt_mels, deterministic=deterministic)             # [B, E]

        if not deterministic and cfg.encoder_outputs_dropout > 0:
            encoder_outputs = nn.Dropout(
                cfg.encoder_outputs_dropout,
                deterministic=deterministic)(encoder_outputs)
        text_sum = _text_summary(encoder_outputs, text_lengths,
                                 cfg.rnn_dim, "text_rnn")      # [B, R]

        cat = jnp.concatenate([ref, speaker_embed, text_sum], axis=-1)
        if not deterministic and cfg.classifier_dropout > 0:
            cat = nn.Dropout(cfg.classifier_dropout,
                             deterministic=deterministic)(cat)
        energies = nn.Dense(cfg.n_classes, name="classifier")(cat)
        zs = jax.nn.log_softmax(energies, axis=-1)             # [B, C]

        # semi-supervision: use the gt one-hot where the label is known
        # (unknown_id == n_classes)
        if emotion_id is not None and emotion_onehot is not None:
            known = (emotion_id != cfg.n_classes)[:, None]
            ss_zs = jnp.where(known,
                              jnp.log(emotion_onehot + EPSILON), zs)
        else:
            ss_zs = zs

        latent_in = jnp.concatenate([cat, ss_zs], axis=-1)
        zu_params = nn.Dense(2 * cfg.latent_dim, name="latent")(latent_in)
        mu, logvar = jnp.split(zu_params, 2, axis=-1)
        zu = _reparameterize(mu, logvar, key, deterministic)
        return {"zs": zs, "ss_zs": ss_zs, "zu": zu,
                "zu_mu": mu, "zu_logvar": logvar,
                "zu_params": zu_params}


class AuxEmotionNet(nn.Module):
    cfg: EmotionNetConfig

    @nn.compact
    def __call__(self, torchmoji_hidden: jnp.ndarray,
                 speaker_embed: jnp.ndarray,
                 encoder_outputs: jnp.ndarray,
                 text_lengths: Optional[jnp.ndarray] = None,
                 key: Optional[jax.Array] = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        # residual MLP over torchMoji hidden (AuxEmotionNet.py:10-22)
        h = torchmoji_hidden
        dims = list(cfg.aux_layer_dims)
        for i, d in enumerate(dims):
            out_dim = cfg.torchmoji_dim if i == len(dims) - 1 else d
            h = nn.Dense(out_dim, name=f"seq{i}")(h)
            if i != len(dims) - 1:
                h = nn.leaky_relu(h, negative_slope=0.05)

        if not deterministic and cfg.encoder_outputs_dropout > 0:
            encoder_outputs = nn.Dropout(
                cfg.encoder_outputs_dropout,
                deterministic=deterministic)(encoder_outputs)
        text_sum = _text_summary(encoder_outputs, text_lengths,
                                 cfg.rnn_dim, "text_rnn")

        cat = jnp.concatenate([h, speaker_embed, text_sum], axis=-1)
        if not deterministic and cfg.classifier_dropout > 0:
            cat = nn.Dropout(cfg.classifier_dropout,
                             deterministic=deterministic)(cat)
        energies = nn.Dense(cfg.n_classes + 2 * cfg.latent_dim,
                            name="latent_classifier")(cat)
        zs = jax.nn.log_softmax(energies[:, : cfg.n_classes], axis=-1)
        zu_params = energies[:, cfg.n_classes:]
        mu, logvar = jnp.split(zu_params, 2, axis=-1)
        zu = _reparameterize(mu, logvar, key, deterministic)
        return {"zs": zs, "zu": zu, "zu_mu": mu, "zu_logvar": logvar,
                "zu_params": zu_params}
