"""Global Style Tokens (TPGST) — style conditioning from reference audio.

Capability rebuild of CookieTTS/_2_ttm/tacotron2_ssvae/TPGST.py:11-263:

- :class:`ReferenceEncoder` — 6 stride-2 conv2d (BN+ReLU) over the ref mel
  "image", GRU, FC, tanh (:11-66).
- :class:`StyleAttention` — multi-head attention of the reference
  embedding over learned style-token embeddings (:69-127).
- :class:`GST` — the style-token layer with four reference modes
  (:129-263): 1=from mel, 0=user-provided token weights, 2/3=predicted
  from torchMoji hidden (the "TP" = text-predicted path), plus optional
  VAE / semi-supervised-VAE reparameterization of the token weights.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class GSTConfig:
    n_frames_per_step: int = 1
    n_mel_channels: int = 80
    token_embedding_size: int = 256
    token_num: int = 10
    num_heads: int = 8
    gst_att_dim: int = 128
    ref_enc_filters: Sequence[int] = (32, 32, 64, 64, 128, 128)
    token_activation: str = "softmax"    # softmax | sigmoid | tanh | linear
    vae_mode: bool = False               # reparameterize token weights
    ss_vae: bool = False                 # semi-supervised VAE
    ss_vae_zu_dim: int = 10
    vae_classes: int = 16
    torchmoji_dim: int = 2304
    output_tanh: bool = True
    dtype: Any = jnp.float32


class ReferenceEncoder(nn.Module):
    """Mel [B, T, M] -> reference embedding [B, E]."""
    cfg: GSTConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        x = mel[..., None]                        # [B, T, M, 1]
        channels = list(cfg.ref_enc_filters) + [cfg.token_embedding_size]
        for i, ch in enumerate(channels):
            # explicit (1,1) pads = the reference's torch same-padding
            # for k=3/stride 2 (module.py Conv2d; XLA's "SAME" would pad
            # (0,1) instead and shift every feature)
            x = nn.Conv(ch, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=cfg.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=deterministic,
                             epsilon=1e-3,   # mm.Conv2d BatchNorm2d eps
                             dtype=cfg.dtype, name=f"bn{i}")(x)
            x = nn.relu(x)
        B, T, M, C = x.shape
        # channel-major flatten: the reference views [B,T',C,M'] with C
        # slow (TPGST.py:55-57); keeps converted GRU weights aligned
        x = x.transpose(0, 1, 3, 2).reshape(B, T, C * M)
        out = nn.RNN(nn.GRUCell(cfg.token_embedding_size), name="rnn")(x)
        final = out[:, -1, :]
        y = nn.Dense(cfg.token_embedding_size, dtype=cfg.dtype,
                     name="fc")(final)
        return jnp.tanh(y)


class StyleAttention(nn.Module):
    """Multi-head attention of ref embedding over token embeddings.

    Returns raw token weights [B, out_dim] (TPGST.py:69-127).
    """
    cfg: GSTConfig
    out_dim: int = 10

    @nn.compact
    def __call__(self, ref: jnp.ndarray,
                 tokens: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        n_units = cfg.gst_att_dim
        H = cfg.num_heads
        split = n_units // H
        q = jnp.tanh(nn.Dense(n_units, name="fc_Q")(
            nn.Dense(n_units, name="conv_Q")(ref)))       # [B, U]
        k = jnp.tanh(nn.Dense(n_units, name="fc_K")(
            nn.Dense(n_units, name="conv_K")(tokens)))     # [B, N, U]
        v = jnp.tanh(nn.Dense(split, name="fc_V")(tokens))  # [B, N, S]

        B, N, _ = k.shape
        q = q.reshape(B, H, split)                          # [B, H, S]
        k = k.reshape(B, N, H, split).transpose(0, 2, 1, 3)  # [B, H, N, S]
        att = jax.nn.softmax(
            jnp.einsum("bhs,bhns->bhn", q, k) / jnp.sqrt(float(split)),
            axis=-1)                                        # [B, H, N]
        y = jnp.einsum("bhn,bns->bhs", att, v).reshape(B, H * split)
        return jnp.tanh(nn.Dense(self.out_dim, name="fc_A")(y))


class GST(nn.Module):
    """Style token layer. Returns a dict with style_embedding [B, E],
    token weights, and (VAE modes) mu/logvar/log-class-probs."""
    cfg: GSTConfig

    def setup(self):
        cfg = self.cfg
        if cfg.ss_vae:
            self.mha_outdim = cfg.vae_classes
        else:
            self.mha_outdim = cfg.token_num * (1 + int(cfg.vae_mode))
        n_tokens = cfg.ss_vae_zu_dim if cfg.ss_vae else cfg.token_num
        self.ref_encoder = ReferenceEncoder(cfg, name="ref_encoder")
        self.att = StyleAttention(cfg, self.mha_outdim, name="att")
        self.token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.5),
            (n_tokens, cfg.token_embedding_size))
        self.map_lin = nn.Dense(self.mha_outdim, name="map_lin")
        if cfg.ss_vae:
            self.ss_vae_layers = nn.Dense(2 * cfg.ss_vae_zu_dim,
                                          name="ss_vae_layers")

    def _activate(self, tokens: jnp.ndarray) -> jnp.ndarray:
        act = self.cfg.token_activation
        if act == "softmax":
            return jax.nn.softmax(tokens, axis=-1)
        if act == "sigmoid":
            return jax.nn.sigmoid(tokens)
        if act == "tanh":
            return jnp.tanh(tokens)
        return tokens

    def __call__(self, ref, ref_mode: int = 1,
                 key: Optional[jax.Array] = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """ref_mode: 1=mel reference [B,T,M]; 0=user token weights [B,N];
        2/3=torchMoji hidden [B, 2304] mapped to tokens ("TP" path)."""
        cfg = self.cfg
        if self.is_initializing():
            # touch every branch so all params exist regardless of the
            # ref_mode used at init time
            if ref_mode != 1:
                dummy_mel = jnp.zeros((1, 64, cfg.n_mel_channels), cfg.dtype)
                re = self.ref_encoder(dummy_mel, deterministic=True)
                self.att(re, jnp.broadcast_to(
                    self.token_embedding[None],
                    (1,) + self.token_embedding.shape))
            if ref_mode in (0, 1):
                self.map_lin(jnp.zeros((1, cfg.torchmoji_dim), cfg.dtype))
        if ref_mode == 1:
            ref_embed = self.ref_encoder(ref, deterministic=deterministic)
            style_tokens = self.att(ref_embed, jnp.broadcast_to(
                self.token_embedding[None],
                (ref.shape[0],) + self.token_embedding.shape))
        elif ref_mode == 0:
            style_tokens = ref
        else:  # 2 or 3: predicted from torchMoji hidden
            style_tokens = self.map_lin(ref)

        style_tokens = self._activate(style_tokens)
        out: Dict[str, jnp.ndarray] = {}

        if cfg.vae_mode:
            if cfg.ss_vae:
                zs = style_tokens
                zu = jnp.tanh(self.ss_vae_layers(zs))
                out["zs_log_prob"] = jax.nn.log_softmax(zs, axis=-1)
            else:
                zu = style_tokens
            mu, logvar = jnp.split(zu, 2, axis=-1)
            if deterministic or key is None:
                style_tokens = mu
            else:
                std = jnp.exp(0.5 * logvar)
                style_tokens = mu + std * jax.random.normal(key, mu.shape)
            out["mu"], out["logvar"] = mu, logvar

        embed = jnp.einsum("bn,ne->be", style_tokens, self.token_embedding)
        if cfg.output_tanh:
            embed = jnp.tanh(embed)
        out["style_embedding"] = embed
        out["style_tokens"] = style_tokens
        return out
