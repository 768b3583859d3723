"""UnTTS — non-autoregressive duration-based flow TTS.

Capability rebuild of CookieTTS/_2_ttm/untts/ (FastPitch-style
FFTransformer blocks `untts/fastpitch/transformer.py:283+`, the
`TemporalPredictor` duration/f0/energy predictors
`fastpitch/length_predictor.py:23`, and the conditional decoder flow
`untts/waveglow/{glow,varglow}.py`), re-composed TPU-first:

- :class:`FFTBlock` — masked multi-head self-attention + 1-D conv FFN
  (all big matmuls, no recurrence — ideal MXU shape).
- :class:`TemporalPredictor` — conv+LN stack -> per-char scalar.
- :func:`length_regulate` — duration expansion as ONE [T, N] interval
  -matrix matmul (replaces the reference's per-item repeat_interleave:
  static shapes, batched, differentiable w.r.t. char features).
- :class:`MelFlowDecoder` — conditional normalizing flow over mel frames
  (invertible 1x1 channel mixing + WN affine couplings conditioned on the
  length-regulated text), reusing the WaveGlow machinery. Training is
  exact max-likelihood (z NLL); inference is the closed-form inverse —
  the whole utterance is generated in ONE parallel pass.

Default mel flow grouping keeps n_mel=80 channels per step.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.masking import get_mask_from_lengths
from .waveglow import WN, Invertible1x1Conv


@dataclasses.dataclass(frozen=True)
class UnTTSConfig:
    n_symbols: int = 256
    symbols_embedding_dim: int = 384
    n_speakers: int = 512
    speaker_embedding_dim: int = 128
    n_mel_channels: int = 80
    # encoder FFT stack
    enc_layers: int = 4
    enc_heads: int = 2
    enc_ffn_dim: int = 1024
    enc_kernel_size: int = 3
    dropout: float = 0.1
    # predictors
    predictor_kernel_size: int = 3
    predictor_filter_size: int = 256
    predictor_layers: int = 2
    predict_f0: bool = True
    predict_energy: bool = True
    # prosody flow (CVarGlow/VarGlow): sample durations (+f0) instead of
    # the deterministic predictor at inference
    use_varglow: bool = False
    varglow_n_group: int = 4
    varglow_n_flows: int = 4
    # Flow-TTS positional attention (flowtts/model.py:113): soft
    # frame<-char alignment instead of the hard duration expansion
    use_positional_attention: bool = False
    pos_attention_heads: int = 2
    # decoder flow
    dec_n_flows: int = 6
    dec_n_layers: int = 3
    dec_n_channels: int = 192
    dec_kernel_size: int = 3
    max_frames_per_char: float = 40.0
    sigma: float = 1.0
    dtype: Any = jnp.float32


class FFTBlock(nn.Module):
    """Masked self-attention + conv FFN (untts fastpitch transformer)."""
    dim: int
    heads: int
    ffn_dim: int
    kernel_size: int = 3
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """x [B, N, D]; mask [B, N] bool."""
        attn_mask = mask[:, None, None, :]          # [B, 1, 1, N]
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=deterministic,
            name="mha")(x, x, mask=attn_mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="ln1")(x + h)
        x = x * mask[:, :, None]
        h = nn.Conv(self.ffn_dim, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="ffn1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.dim, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="ffn2")(h)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="ln2")(x + h)
        return x * mask[:, :, None]


class TemporalPredictor(nn.Module):
    """Per-position scalar predictor (duration / f0 / energy).

    Reference untts/fastpitch/length_predictor.py:23.
    """
    filter_size: int = 256
    kernel_size: int = 3
    n_layers: int = 2
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        h = x * mask[:, :, None]
        for i in range(self.n_layers):
            h = nn.Conv(self.filter_size, (self.kernel_size,),
                        padding="SAME", dtype=self.dtype,
                        name=f"conv{i}")(h)
            h = nn.relu(h)
            # torch LayerNorm eps (ConvReLUNorm, layers.py:491)
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"ln{i}")(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        out = nn.Dense(1, dtype=self.dtype, name="fc")(h)[..., 0]
        return out * mask


def sinusoid_positions(t_out: int, dim: int) -> np.ndarray:
    """Standard sinusoidal position table [t_out, dim] (host-side
    constant; the reference's FFTransformer PositionalEmbedding)."""
    pos = np.arange(t_out)[:, None]
    div = np.exp(np.arange(0, dim, 2) * (-np.log(10000.0) / dim))
    pe = np.zeros((t_out, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div[: pe[:, 1::2].shape[1]])
    return pe


class PositionalAttention(nn.Module):
    """Flow-TTS positional attention (reference flowtts/model.py:113):
    expand char-rate encodings to frame rate WITHOUT hard durations —
    sinusoidal frame-position queries attend over the encoder states with
    multi-head dot-product attention. Durations are still predicted, but
    only their SUM (total length) is consumed at inference; the soft
    alignment replaces the interval-matmul length regulator."""
    out_dim: int
    num_heads: int = 2
    dtype: Any = jnp.float32

    _sinusoid = staticmethod(sinusoid_positions)

    @nn.compact
    def __call__(self, enc: jnp.ndarray, char_mask: jnp.ndarray,
                 t_out: int, deterministic: bool = True) -> jnp.ndarray:
        B, N, D = enc.shape
        q = jnp.asarray(sinusoid_positions(t_out, D), self.dtype)  # [T, D]
        q = jnp.broadcast_to(q[None], (B, t_out, D))
        attn_mask = char_mask[:, None, None, :]                   # [B,1,1,N]
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=D, out_features=D,
            dtype=self.dtype, deterministic=deterministic,
            name="mha")(q, enc, mask=attn_mask.astype(bool))
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                         name="ln")(y + q)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(y)


def length_regulate(char_feats: jnp.ndarray, durations: jnp.ndarray,
                    t_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand [B, N, D] char features to [B, t_out, D] frames.

    Frame t copies char i iff cumsum(dur)[i-1] <= t < cumsum(dur)[i];
    built as an interval matrix and applied as a matmul (MXU, static
    shapes). Returns (frames, frame_mask [B, t_out]).
    """
    ends = jnp.cumsum(durations, axis=1)                      # [B, N]
    starts = ends - durations
    t = jnp.arange(t_out, dtype=durations.dtype)[None, :, None]  # [1, T, 1]
    A = ((t >= starts[:, None, :]) & (t < ends[:, None, :]))  # [B, T, N]
    frames = jnp.einsum("btn,bnd->btd", A.astype(char_feats.dtype),
                        char_feats)
    frame_mask = t[..., 0] < ends[:, -1:]
    return frames, frame_mask


class MelFlowDecoder(nn.Module):
    """Conditional flow over mel frames [B, T, n_mel]."""
    cfg: UnTTSConfig

    def setup(self):
        cfg = self.cfg
        self.convinv = [Invertible1x1Conv(cfg.n_mel_channels,
                                          dtype=cfg.dtype,
                                          name=f"convinv{k}")
                        for k in range(cfg.dec_n_flows)]
        half = cfg.n_mel_channels // 2
        self.wn = [WN(cfg.n_mel_channels - half, cfg.dec_n_layers,
                      cfg.dec_n_channels, cfg.dec_kernel_size,
                      dtype=cfg.dtype, name=f"wn{k}")
                   for k in range(cfg.dec_n_flows)]
        self._half = half

    def forward(self, mel: jnp.ndarray, cond: jnp.ndarray,
                frame_mask: jnp.ndarray):
        """mel -> (z, log_s_sum, logdet_w_sum); masked frames excluded.

        x re-masks between flows: the WN's dilated SAME convs reach
        ~receptive-field frames past each boundary, and after a coupling
        the padded region holds nonzero ``t`` offsets — without the
        re-mask, valid frames near the end would be computed from
        padding values that differ between training (zero-padded mels)
        and inference (Gaussian z), an end-of-utterance artifact."""
        cfg = self.cfg
        m = frame_mask[:, :, None].astype(jnp.float32)
        x = mel * m.astype(mel.dtype)
        n_valid = jnp.sum(m) * cfg.n_mel_channels
        log_s_sum = jnp.zeros((), jnp.float32)
        logdet_w_sum = jnp.zeros((), jnp.float32)
        for k in range(cfg.dec_n_flows):
            x, logdet_w = self.convinv[k](x)
            half = self._half
            xa, xb = x[..., :half], x[..., half:]
            st = self.wn[k](xb, cond)
            log_s, t = jnp.split(st, 2, axis=-1)
            xa = xa * jnp.exp(log_s) + t
            x = jnp.concatenate([xa, xb], axis=-1) * m.astype(mel.dtype)
            log_s_sum = log_s_sum + jnp.sum(
                log_s.astype(jnp.float32) * m)
            logdet_w_sum = logdet_w_sum + \
                logdet_w.astype(jnp.float32) * jnp.sum(m)
        return x, log_s_sum, logdet_w_sum, n_valid

    def inverse(self, z: jnp.ndarray, cond: jnp.ndarray,
                frame_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Mirrors forward's between-flow masking so padded positions
        are zero under BOTH directions (no mask = all frames valid)."""
        cfg = self.cfg
        m = (jnp.ones(z.shape[:2] + (1,), z.dtype) if frame_mask is None
             else frame_mask[:, :, None].astype(z.dtype))
        x = z * m
        for k in reversed(range(cfg.dec_n_flows)):
            half = self._half
            xa, xb = x[..., :half], x[..., half:]
            st = self.wn[k](xb, cond)
            log_s, t = jnp.split(st, 2, axis=-1)
            xa = (xa - t) * jnp.exp(-log_s)
            x = jnp.concatenate([xa, xb], axis=-1) * m
            x, _ = self.convinv[k](x, inverse=True)
        return x


class UnTTS(nn.Module):
    """NAR flow TTS. __call__ = training forward; inference = generate."""
    cfg: UnTTSConfig

    def setup(self):
        cfg = self.cfg
        self.embedding = nn.Embed(cfg.n_symbols, cfg.symbols_embedding_dim,
                                  dtype=cfg.dtype, name="embedding")
        self.speaker_embedding = nn.Embed(
            cfg.n_speakers, cfg.speaker_embedding_dim, dtype=cfg.dtype,
            name="speaker_embedding")
        self.pos_scale = self.param("pos_scale",
                                    nn.initializers.ones, ())
        self.enc_blocks = [
            FFTBlock(cfg.symbols_embedding_dim, cfg.enc_heads,
                     cfg.enc_ffn_dim, cfg.enc_kernel_size, cfg.dropout,
                     cfg.dtype, name=f"enc{i}")
            for i in range(cfg.enc_layers)]
        self.duration_predictor = TemporalPredictor(
            cfg.predictor_filter_size, cfg.predictor_kernel_size,
            cfg.predictor_layers, cfg.dropout, cfg.dtype,
            name="duration_predictor")
        if cfg.predict_f0:
            self.f0_predictor = TemporalPredictor(
                cfg.predictor_filter_size, cfg.predictor_kernel_size,
                cfg.predictor_layers, cfg.dropout, cfg.dtype,
                name="f0_predictor")
        if cfg.predict_energy:
            self.energy_predictor = TemporalPredictor(
                cfg.predictor_filter_size, cfg.predictor_kernel_size,
                cfg.predictor_layers, cfg.dropout, cfg.dtype,
                name="energy_predictor")
        self.cond_proj = nn.Dense(cfg.dec_n_channels, dtype=cfg.dtype,
                                  name="cond_proj")
        if cfg.predict_f0 or cfg.predict_energy:
            # frame-level [voiced, f0, energy] decoder conditioning (the
            # reference conditions its decoder flow on exactly these at
            # frame rate, untts/model.py:437,538; at inference it feeds
            # the sampled/predicted variances, :649) — without it pitch
            # and energy cannot influence synthesis at all
            self.prosody_proj = nn.Dense(
                cfg.dec_n_channels, dtype=cfg.dtype, name="prosody_proj")
        if cfg.use_positional_attention:
            self.pos_attention = PositionalAttention(
                cfg.dec_n_channels, cfg.pos_attention_heads, cfg.dtype,
                name="pos_attention")
        if cfg.use_varglow:
            n_ch = 1 + int(cfg.predict_f0)     # (log-dur [, f0])
            self.varglow = VarGlow(
                n_channels_in=n_ch, n_group=cfg.varglow_n_group,
                n_flows=cfg.varglow_n_flows, dtype=cfg.dtype,
                name="varglow")
        self.decoder = MelFlowDecoder(cfg, name="decoder")

    def _encode(self, text, text_lengths, speaker_id, deterministic):
        cfg = self.cfg
        N = text.shape[1]
        mask = get_mask_from_lengths(text_lengths, N)
        x = self.embedding(jnp.clip(text, 0, cfg.n_symbols - 1))
        # scaled sinusoidal positions (reference FFTransformer adds
        # pos_emb with a learned scaler before the layer stack,
        # transformer.py:298,318-321 — without it the FFT attention is
        # order-blind)
        pe = jnp.asarray(
            sinusoid_positions(N, cfg.symbols_embedding_dim), cfg.dtype)
        x = (x + self.pos_scale * pe[None]) * mask[:, :, None]
        for blk in self.enc_blocks:
            x = blk(x, mask, deterministic=deterministic)
        spk = self.speaker_embedding(speaker_id)              # [B, S]
        x = jnp.concatenate(
            [x, jnp.broadcast_to(spk[:, None, :],
                                 (x.shape[0], N, spk.shape[-1]))], axis=-1)
        return x, mask

    def _prosody_cond(self, f0_frames, energy_frames, voiced_frames,
                      shape):
        """[B, T] frame prosody -> dec_n_channels conditioning term.

        Always THREE channels (voiced, f0, energy) with zeros for absent
        features, so the projection's input width never depends on which
        optional batch keys a caller provides."""
        B, T = shape
        z = jnp.zeros((B, T), jnp.float32)
        f0f = z if f0_frames is None else f0_frames.astype(jnp.float32)
        en = z if energy_frames is None \
            else energy_frames.astype(jnp.float32)
        vo = ((f0f > 0).astype(jnp.float32) if voiced_frames is None
              else voiced_frames.astype(jnp.float32))
        p = jnp.stack([vo, f0f, en], axis=-1).astype(self.cfg.dtype)
        return self.prosody_proj(p)

    def __call__(self, text, text_lengths, mels, mel_lengths, speaker_id,
                 durations, f0: Optional[jnp.ndarray] = None,
                 energy: Optional[jnp.ndarray] = None,
                 frame_f0: Optional[jnp.ndarray] = None,
                 frame_energy: Optional[jnp.ndarray] = None,
                 frame_voiced: Optional[jnp.ndarray] = None,
                 deterministic: bool = False):
        """Training forward with ground-truth (MFA) char durations.

        durations: [B, N] int frames per char (from alignments);
        f0/energy: [B, N] CHAR averages (predictor + VarGlow targets);
        frame_f0/frame_energy/frame_voiced: [B, T] frame-rate prosody
        for the decoder conditioning (reference model.py:437,538).
        Returns dict: z/log_s/logdet for the flow NLL + predictor outputs.
        """
        cfg = self.cfg
        enc, char_mask = self._encode(text, text_lengths, speaker_id,
                                      deterministic)
        log_dur_pred = self.duration_predictor(enc, char_mask,
                                               deterministic)
        out: Dict[str, jnp.ndarray] = {
            "log_dur_pred": log_dur_pred,
            "char_mask": char_mask,
        }
        pred_in = enc
        if cfg.predict_f0:
            out["f0_pred"] = self.f0_predictor(pred_in, char_mask,
                                               deterministic)
        if cfg.predict_energy:
            out["energy_pred"] = self.energy_predictor(pred_in, char_mask,
                                                       deterministic)

        # prosody flow NLL on (log-dur [, f0]) per char
        if cfg.use_varglow:
            # padded chars carry durations=0 / f0=0 — fill them with the
            # row's LAST VALID value (channel mixing blends a boundary
            # group's chars, so the pad must be plausible data) and mask
            # the NLL at group granularity inside the flow
            last = jnp.maximum(text_lengths - 1, 0)[:, None]

            def edge_fill(v):
                lastv = jnp.take_along_axis(v, last, axis=1)
                return jnp.where(char_mask, v, lastv)

            vals = [edge_fill(jnp.log(jnp.maximum(
                durations.astype(jnp.float32), 1e-1)))]
            if cfg.predict_f0 and f0 is not None:
                vals.append(edge_fill(f0.astype(jnp.float32)))
            values = jnp.stack(vals, axis=-1)          # [B, N, C]
            vz, vls, vlw, vn = self.varglow.forward(values, enc,
                                                    char_mask)
            out.update({"varglow_z": vz, "varglow_log_s": vls,
                        "varglow_logdet_w": vlw, "varglow_n": vn})

        T = mels.shape[1]
        frame_mask = get_mask_from_lengths(mel_lengths, T)
        if cfg.use_positional_attention:
            cond = self.pos_attention(enc, char_mask, T,
                                      deterministic=deterministic)
            cond = cond * frame_mask[:, :, None]
        else:
            frames, _ = length_regulate(enc, durations, T)
            cond = self.cond_proj(frames)
        if cfg.predict_f0 or cfg.predict_energy:
            cond = cond + self._prosody_cond(
                frame_f0, frame_energy, frame_voiced,
                (mels.shape[0], T)) * frame_mask[:, :, None]
        z, log_s, logdet_w, n_valid = self.decoder.forward(
            mels, cond, frame_mask)
        out.update({"z": z, "log_s_sum": log_s, "logdet_w_sum": logdet_w,
                    "n_elements": n_valid, "frame_mask": frame_mask})
        return out

    def inference(self, text, text_lengths, speaker_id,
                  key: Optional[jax.Array] = None,
                  max_frames: int = 2048,
                  duration_scale: float = 1.0,
                  sigma: Optional[float] = None,
                  sample_prosody: bool = False,
                  prosody_sigma: float = 0.7):
        """Parallel generation: predict (or SAMPLE, via the VarGlow
        prosody flow) durations -> expand -> invert the mel flow."""
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(0)
        sigma = cfg.sigma if sigma is None else sigma
        enc, char_mask = self._encode(text, text_lengths, speaker_id, True)
        char_f0 = char_energy = None
        if sample_prosody and cfg.use_varglow:
            key, k_pro = jax.random.split(key)
            sampled = self.varglow.sample(enc, k_pro, prosody_sigma)
            N = char_mask.shape[1]            # flow pads N up to n_group
            log_dur = sampled[:, :N, 0]
            if cfg.predict_f0 and sampled.shape[-1] > 1:
                char_f0 = sampled[:, :N, 1]   # sampled per-char pitch
        else:
            log_dur = self.duration_predictor(enc, char_mask, True)
        if char_f0 is None and cfg.predict_f0:
            char_f0 = self.f0_predictor(enc, char_mask, True)
        if cfg.predict_energy:
            char_energy = self.energy_predictor(enc, char_mask, True)
        dur = jnp.round(jnp.exp(log_dur) * duration_scale)
        dur = jnp.clip(dur, 0.0, cfg.max_frames_per_char) * char_mask
        dur = dur.astype(jnp.int32)
        if cfg.use_positional_attention:
            # durations only set the TOTAL length (Flow-TTS semantics)
            total = jnp.minimum(jnp.sum(dur, axis=1), max_frames)   # [B]
            frame_mask = (jnp.arange(max_frames)[None, :]
                          < total[:, None])
            cond = self.pos_attention(enc, char_mask, max_frames, True)
            cond = cond * frame_mask[:, :, None]
        else:
            frames, frame_mask = length_regulate(enc, dur, max_frames)
            cond = self.cond_proj(frames)
        if cfg.predict_f0 or cfg.predict_energy:
            # predicted/sampled per-char prosody expands over the SAME
            # duration matrix and conditions the decoder (reference
            # feeds the sampled variances at inference, model.py:649) —
            # pitch/energy now actually shape the output
            B, N = char_mask.shape
            zc = jnp.zeros((B, N), jnp.float32)
            chans = jnp.stack(
                [zc if char_f0 is None else char_f0.astype(jnp.float32),
                 zc if char_energy is None
                 else char_energy.astype(jnp.float32)], axis=-1)
            pros, _ = length_regulate(chans, dur, max_frames)
            cond = cond + self._prosody_cond(
                pros[..., 0], pros[..., 1], None,
                (B, max_frames)) * frame_mask[:, :, None]
        z = sigma * jax.random.normal(
            key, (text.shape[0], max_frames, cfg.n_mel_channels), cfg.dtype)
        mel = self.decoder.inverse(z, cond, frame_mask)
        mel_lengths = jnp.minimum(jnp.sum(dur, axis=1), max_frames)
        return {"mel_outputs": mel * frame_mask[:, :, None],
                "mel_lengths": mel_lengths,
                "durations": dur}


def untts_loss(out: Dict[str, jnp.ndarray], gt: Dict[str, jnp.ndarray],
               sigma: float = 1.0,
               dur_weight: float = 0.1, f0_weight: float = 0.1,
               energy_weight: float = 0.1
               ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Flow NLL + log-duration MSE + masked f0/energy MSE."""
    z = out["z"].astype(jnp.float32)
    m = out["frame_mask"][:, :, None].astype(jnp.float32)
    n = jnp.maximum(out["n_elements"], 1.0)
    nll = (jnp.sum(z * z * m) / (2.0 * sigma * sigma)
           - out["log_s_sum"] - out["logdet_w_sum"]) / n
    loss_dict = {"flow_nll": nll}

    cmask = out["char_mask"].astype(jnp.float32)
    n_char = jnp.maximum(jnp.sum(cmask), 1.0)
    log_dur_gt = jnp.log(jnp.maximum(
        gt["durations"].astype(jnp.float32), 1e-1))
    dur_mse = jnp.sum(((out["log_dur_pred"] - log_dur_gt) ** 2) * cmask) \
        / n_char
    loss_dict["dur_MSE"] = dur_mse
    total = nll + dur_weight * dur_mse

    if "f0_pred" in out and "f0" in gt:
        f0_mse = jnp.sum(((out["f0_pred"] - gt["f0"]) ** 2) * cmask) / n_char
        loss_dict["f0_MSE"] = f0_mse
        total = total + f0_weight * f0_mse
    if "energy_pred" in out and "energy" in gt:
        e_mse = jnp.sum(((out["energy_pred"] - gt["energy"]) ** 2) * cmask) \
            / n_char
        loss_dict["energy_MSE"] = e_mse
        total = total + energy_weight * e_mse
    loss_dict["loss"] = total
    return total, loss_dict


class VarGlow(nn.Module):
    """Char-level conditional flow over prosody scalars (duration / f0 /
    energy), the reference's CVarGlow/VarGlow
    (untts/waveglow/{cvarglow,varglow}.py): instead of deterministic
    regression, model p(scalars | text) with an invertible flow so
    inference can SAMPLE diverse prosody.

    Values [B, N, C] (C scalars per char) are grouped along the char axis
    ([B, N/g, g*C]) and passed through 1x1-mixing + WN affine couplings
    conditioned on group-pooled text features — the WaveGlow recipe at
    char rate.
    """
    n_channels_in: int = 2        # e.g. (log-duration, f0)
    n_group: int = 4              # chars squeezed per flow step
    n_flows: int = 4
    wn_layers: int = 2
    wn_channels: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        C = self.n_channels_in * self.n_group
        half = C // 2
        self.convinv = [Invertible1x1Conv(C, dtype=self.dtype,
                                          name=f"convinv{k}")
                        for k in range(self.n_flows)]
        self.wn = [WN(C - half, self.wn_layers, self.wn_channels,
                      kernel_size=3, dtype=self.dtype, name=f"wn{k}")
                   for k in range(self.n_flows)]
        self._half = half

    def _pad_len(self, N: int) -> int:
        g = self.n_group
        return -(-N // g) * g

    def _squeeze(self, values: jnp.ndarray) -> jnp.ndarray:
        """[B, N, C] -> [B, ceil(N/g), g*C] (pads the tail group — a
        plain truncation would leave the last N % g chars untrained in
        the NLL and force them to 1 frame at sampled inference)."""
        B, N, C = values.shape
        g = self.n_group
        Np = self._pad_len(N)
        if Np != N:
            values = jnp.pad(values, ((0, 0), (0, Np - N), (0, 0)),
                             mode="edge")
        return values.reshape(B, Np // g, g * C)

    def _unsqueeze(self, x: jnp.ndarray) -> jnp.ndarray:
        B, Ng, gC = x.shape
        return x.reshape(B, Ng * self.n_group, self.n_channels_in)

    def _group_cond(self, text_feats: jnp.ndarray) -> jnp.ndarray:
        """[B, N, D] -> [B, ceil(N/g), g*D] grouped conditioning."""
        B, N, D = text_feats.shape
        g = self.n_group
        Np = self._pad_len(N)
        if Np != N:
            text_feats = jnp.pad(text_feats,
                                 ((0, 0), (0, Np - N), (0, 0)))
        return text_feats.reshape(B, Np // g, g * D)

    def forward(self, values: jnp.ndarray, text_feats: jnp.ndarray,
                char_mask: Optional[jnp.ndarray] = None):
        """values [B, N, C], text_feats [B, N, D] ->
        (z, log_s_sum, logdet_w_sum, n_elements).

        ``char_mask`` [B, N] masks the NLL at GROUP granularity (a group
        counts while it holds >= 1 valid char): without it the flow
        spends capacity modeling padding constants and the NLL varies
        with how much padding the batch carries. Callers should fill
        padded positions of ``values`` with plausible data (edge
        replication) — channel mixing blends a boundary group's chars.
        """
        x = self._squeeze(values.astype(self.dtype))
        cond = self._group_cond(text_feats.astype(self.dtype))
        B, Ng, gC = x.shape
        if char_mask is None:
            gmask = jnp.ones((B, Ng), jnp.float32)
        else:
            g = self.n_group
            Np = self._pad_len(char_mask.shape[1])
            cm = jnp.pad(char_mask.astype(jnp.float32),
                         ((0, 0), (0, Np - char_mask.shape[1])))
            gmask = cm.reshape(B, Ng, g).max(axis=-1)        # [B, Ng]
        log_s_sum = jnp.zeros((), jnp.float32)
        logdet_w_sum = jnp.zeros((), jnp.float32)
        n_groups = jnp.sum(gmask)
        for k in range(self.n_flows):
            x, logdet_w = self.convinv[k](x)
            xa, xb = x[..., : self._half], x[..., self._half:]
            st = self.wn[k](xb, cond)
            log_s, t = jnp.split(st, 2, axis=-1)
            xa = xa * jnp.exp(log_s) + t
            x = jnp.concatenate([xa, xb], axis=-1)
            log_s_sum = log_s_sum + jnp.sum(
                log_s.astype(jnp.float32) * gmask[:, :, None])
            logdet_w_sum = logdet_w_sum + \
                logdet_w.astype(jnp.float32) * n_groups
        # zero padded groups' z so the z^2 term of the NLL matches the
        # masked log-det terms
        return x * gmask[:, :, None], log_s_sum, logdet_w_sum, \
            n_groups * gC

    def inverse(self, z: jnp.ndarray, text_feats: jnp.ndarray
                ) -> jnp.ndarray:
        """z [B, N/g, g*C] -> values [B, N', C]."""
        cond = self._group_cond(text_feats.astype(self.dtype))
        x = z
        for k in reversed(range(self.n_flows)):
            xa, xb = x[..., : self._half], x[..., self._half:]
            st = self.wn[k](xb, cond)
            log_s, t = jnp.split(st, 2, axis=-1)
            xa = (xa - t) * jnp.exp(-log_s)
            x = jnp.concatenate([xa, xb], axis=-1)
            x, _ = self.convinv[k](x, inverse=True)
        return self._unsqueeze(x)

    def sample(self, text_feats: jnp.ndarray, key: jax.Array,
               sigma: float = 0.7) -> jnp.ndarray:
        """Sample prosody scalars for [B, N, D] text feats -> [B, N', C]."""
        B, N, _ = text_feats.shape
        g = self.n_group
        shape = (B, self._pad_len(N) // g, g * self.n_channels_in)
        z = sigma * jax.random.normal(key, shape, self.dtype)
        return self.inverse(z, text_feats)


def varglow_loss(z, log_s_sum, logdet_w_sum, n_elements,
                 sigma: float = 1.0) -> jnp.ndarray:
    """Per-element NLL for the prosody flow."""
    z = z.astype(jnp.float32)
    return (jnp.sum(z * z) / (2.0 * sigma * sigma)
            - log_s_sum - logdet_w_sum) / n_elements
