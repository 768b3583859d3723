"""HiFi-GAN Denoiser — waveform denoising vocoder variant.

Parity-grade rebuild of CookieTTS/_4_mtw/HiFiGAN_Denoiser/{model.py,
modules.py} (config.json hifigan_config defaults):

- :class:`MultiResSpect` — multi-resolution STFT magnitudes, cut and
  reshaped to a common channel height and concatenated (model.py:11-36).
- :class:`DenoiserWN` — the staged generator ``HiFiGAN``
  (model.py:178-217): WN stack (modules.py:247-326) + 1x1 ``WN_end`` at
  stage 0; + :class:`PostNet` (modules.py:327-353) + ``postnet_end`` at
  stage >= 1.
- :class:`WaveDiscriminator` — DW: MelGAN-style multi-scale waveform
  critic with learned residual/skip mixing (modules.py:421-483).
- :class:`SpectDiscriminator` — DS: StarGAN-VC-style conv/BN/GLU blocks
  over the multi-res spectrogram (modules.py:356-420).
- :func:`denoiser_loss` / BCE helpers — staged training
  (model.py:59-175): stage < 2 is log-spect L1 + audio L1; stage >= 2 is
  PURE adversarial BCE over the SUMMED critic logits (fakeness semantics:
  real label 0, fake label 1; one sigmoid over DS+DW, model.py:80-84).

Documented deviations (docs/MIGRATION.md):
- DS height tracking: the reference computes the final crush-conv height
  as ``remaining_h //= stride_h`` (modules.py:406), ignoring the VALID
  kernel shrink ``kernel_h - 1`` per block — its own default config
  (kernel_h=3, stride_h=1 x4 blocks) makes ``end_conv`` TALLER than its
  input, so stage >= 2 DS crashes as committed. We track the true height.
- DS BatchNorm: training-mode batch statistics without running-average
  state (the critics have no eval mode; torch's training forward uses
  batch stats identically, the running buffers are write-only here).
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..audio.stft import STFT
from .waveglow import GATED_UNITS

# reference config.json WN_config dilations: the 1..1024 cycle, twice
_WN_DILATIONS_22 = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024,
                    1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)


@dataclasses.dataclass(frozen=True)
class HiFiGANDenoiserConfig:
    # WN generator (config.json WN_config)
    wn_layers: int = 22
    wn_channels: int = 128
    kernel_size: int = 3
    end_kernel_size: int = 5
    wn_dilations: Optional[Tuple[int, ...]] = _WN_DILATIONS_22
    gated_unit: str = "GTU"
    # PostNet (config.json postnet_config; active at stage >= 1)
    postnet_layers: int = 12
    postnet_channels: int = 128
    postnet_kernel_size: int = 32
    # multi-res spect (config.json DS_config; window == filter lengths)
    window_lengths: Tuple[int, ...] = (2400, 1200, 600)
    hop_lengths: Tuple[int, ...] = (600, 300, 150)
    # DW (config.json DW_config)
    dw_n_discriminators: int = 3
    dw_kernel_sizes: Tuple[int, ...] = (15, 41, 41, 41, 41, 5, 3)
    dw_strides: Tuple[int, ...] = (1, 4, 4, 4, 4, 1, 1)
    dw_channels: Tuple[int, ...] = (16, 64, 256, 1024, 1024, 1024, 1)
    dw_group_sizes: Tuple[int, ...] = (1, 4, 16, 64, 256, 1, 1)
    # DS blocks: (kernel_h, kernel_w, stride_h, stride_w, n_channels)
    ds_block_confs: Tuple[Tuple[int, int, int, int, int], ...] = (
        (3, 9, 1, 2, 32), (3, 8, 1, 2, 32),
        (3, 8, 1, 2, 32), (3, 6, 1, 2, 32))
    stage: int = 0
    dtype: Any = jnp.float32


def log_compress(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """dynamic_range_compression (audio_processing.py:78-84)."""
    return jnp.log(jnp.clip(x.astype(jnp.float32), clip_val, None))


class MultiResSpect:
    """Multi-resolution magnitude features, concatenated channel-major.

    Matches model.py:22-36: per bank, drop the Nyquist bin (keeping
    filter_length/2 channels), cut every bank to a common element count
    (a multiple of the largest bank's channel height), reshape each to
    [B, max_channels, -1] and concatenate along channels. Returns
    LINEAR magnitudes [B, n_banks * max_channels, T']; callers apply
    :func:`log_compress` (the reference compresses in model.py:66-68,
    outside MRS)."""

    def __init__(self, window_lengths: Sequence[int],
                 hop_lengths: Sequence[int]):
        self.banks = [STFT(w, h, w)
                      for w, h in zip(window_lengths, hop_lengths)]
        self.max_channels = max(int(w) for w in window_lengths) // 2

    def per_bank(self, audio: jnp.ndarray) -> List[jnp.ndarray]:
        """[B, C_i, T_i] linear magnitudes per bank (Nyquist dropped)."""
        out = []
        for bank in self.banks:
            mag, _ = bank.transform(audio.astype(jnp.float32),
                                    return_phase=False)
            out.append(mag.transpose(0, 2, 1)[:, :-1, :])
        return out

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        specs = self.per_bank(audio)
        mc = self.max_channels
        min_ct = min((s.shape[1] * s.shape[2]) // mc * mc for s in specs)
        parts = []
        for s in specs:
            B, C, _ = s.shape
            cut = s[:, :, : min_ct // C]
            parts.append(cut.reshape(B, mc, -1))
        return jnp.concatenate(parts, axis=1)


class WN(nn.Module):
    """Non-causal WaveNet stack (modules.py:247-326), no cond input.

    Residual/skip semantics match the reference exactly: layers before
    the last emit 2n channels (first n added to the residual stream,
    second n accumulated into the skip output); the LAST layer emits n
    channels, all skip. ``end`` is a k=end_kernel_size conv. All convs
    weight-normalized like the reference (nn.utils.weight_norm)."""
    cfg: HiFiGANDenoiserConfig
    n_out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T, C_in] -> [B, T, n_out_channels]."""
        cfg = self.cfg
        n = cfg.wn_channels
        gate = GATED_UNITS[cfg.gated_unit]
        h = nn.WeightNorm(nn.Conv(n, (1,), dtype=cfg.dtype),
                          name="start")(x)
        output = None
        for i in range(cfg.wn_layers):
            dilation = (2 ** i if cfg.wn_dilations is None
                        else int(cfg.wn_dilations[i]))
            pad = (cfg.kernel_size * dilation - dilation) // 2
            acts = nn.WeightNorm(
                nn.Conv(2 * n, (cfg.kernel_size,),
                        kernel_dilation=(dilation,),
                        padding=[(pad, pad)], dtype=cfg.dtype),
                name=f"in_layer{i}")(h)
            a, b = jnp.split(acts, 2, axis=-1)
            out = gate(a, b)
            last = i == cfg.wn_layers - 1
            rs_ch = n if last else 2 * n
            rs = nn.WeightNorm(nn.Conv(rs_ch, (1,), dtype=cfg.dtype),
                               name=f"res_skip{i}")(out)
            if last:
                skip = rs
            else:
                h = h + rs[..., :n]
                skip = rs[..., n:]
            output = skip if output is None else output + skip
        return nn.WeightNorm(
            nn.Conv(self.n_out_channels, (cfg.end_kernel_size,),
                    padding=[((cfg.end_kernel_size - 1) // 2,) * 2],
                    dtype=cfg.dtype), name="end")(output)


class PostNet(nn.Module):
    """Residual tanh conv refiner (modules.py:327-353): even kernels with
    ALTERNATING asymmetric padding, per-layer learned residual weights
    initialized at 0.01."""
    cfg: HiFiGANDenoiserConfig
    n_out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        k = cfg.postnet_kernel_size
        res_w = self.param(
            "res_weights",
            lambda key, shape: jnp.full(shape, 0.01, jnp.float32),
            (cfg.postnet_layers,))
        for i in range(cfg.postnet_layers):
            last = i + 1 == cfg.postnet_layers
            left, right = (k - 1) // 2, -(-(k - 1) // 2)
            if i % 2 == 1:
                left, right = right, left
            conv = nn.Conv(
                self.n_out_channels if last else cfg.postnet_channels,
                (k,), padding=[(left, right)], dtype=cfg.dtype,
                name=f"conv{i}")
            x = x + res_w[i] * jnp.tanh(conv(x))
        return x


class DenoiserWN(nn.Module):
    """The staged generator ``HiFiGAN`` (model.py:178-211):
    [B, T] noisy audio -> [B, T] denoised audio.

    stage 0: WN -> 1x1 WN_end. stage >= 1: WN -> PostNet -> 1x1
    postnet_end. EVERY head is materialized at every stage (the torch
    reference constructs all submodules in __init__ regardless of
    stage, model.py:186-196), so the generator param tree is identical
    across stages and stage promotion resumes checkpoints unchanged;
    the inactive head's compute is dead-code-eliminated by XLA.

    ``wn_channels > postnet_channels`` is rejected: PostNet res-adds
    its ``postnet_channels``-wide conv outputs into the
    ``max(wn, postnet)``-wide stream (the reference's own constructor
    wires PostNet's first conv to the RAW-AUDIO channel count and
    res-adds mismatched widths, modules.py:340-352 + model.py:186-194 —
    it cannot run its own stage>=1 config; see MIGRATION.md)."""
    cfg: HiFiGANDenoiserConfig

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.wn_channels > cfg.postnet_channels:
            raise ValueError(
                f"wn_channels={cfg.wn_channels} > postnet_channels="
                f"{cfg.postnet_channels}: PostNet residual-adds "
                "postnet_channels-wide conv outputs into the WN output "
                "stream, so postnet_channels must be >= wn_channels "
                "(the reference's residual PostNet has the same "
                "constraint and mis-wires it; MIGRATION.md)")
        out_ch = max(cfg.wn_channels, cfg.postnet_channels)
        h = WN(cfg, out_ch, name="wn")(audio[:, :, None])
        h0 = nn.Conv(1, (1,), dtype=cfg.dtype, name="wn_end")(h)[..., 0]
        hp = PostNet(cfg, out_ch, name="postnet")(h)
        hp = nn.Conv(1, (1,), dtype=cfg.dtype,
                     name="postnet_end")(hp)[..., 0]
        return h0 if cfg.stage == 0 else hp


class DWModule(nn.Module):
    """One MelGAN-style waveform critic (modules.py:421-457): VALID
    grouped strided weight-norm convs; per-layer learned mix of the conv
    response (``res_weights``, init U[0.01, 0.11]) and a CENTER CROP of
    the input at the original rate (``layr_weights``, init 1) added into
    the first min(C_in, C_out) channels; mean over time -> [B]."""
    cfg: HiFiGANDenoiserConfig

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        L = len(cfg.dw_kernel_sizes)
        res_w = self.param(
            "res_weights",
            lambda key, shape: jax.random.uniform(key, shape) * 0.1 + 0.01,
            (L,))
        layr_w = self.param("layr_weights", nn.initializers.ones, (L,))
        x = audio[:, :, None]
        for i, (k, s, ch, g) in enumerate(zip(
                cfg.dw_kernel_sizes, cfg.dw_strides,
                cfg.dw_channels, cfg.dw_group_sizes)):
            if x.shape[1] < k:             # right-pad short inputs
                x = jnp.pad(x, ((0, 0), (0, k - x.shape[1]), (0, 0)))
            res = nn.leaky_relu(
                nn.WeightNorm(nn.Conv(ch, (k,), strides=(s,),
                                      padding="VALID",
                                      feature_group_count=g,
                                      dtype=cfg.dtype),
                              name=f"conv{i}")(x), 0.2)
            t_in, t_out = x.shape[1], res.shape[1]
            left = (t_in - t_out) // 2
            mc = min(res.shape[-1], x.shape[-1])
            skip = x[:, left: left + t_out, :mc]
            x = res_w[i] * res
            x = x.at[..., :mc].add(layr_w[i] * skip)
        return jnp.mean(x[..., 0].astype(jnp.float32), axis=1)


class WaveDiscriminator(nn.Module):
    """DW (modules.py:459-483): ``n_discriminators`` DWModules over
    successively avg-pooled (k=4, s=2) audio; fakeness logits summed."""
    cfg: HiFiGANDenoiserConfig

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        x = audio
        total = jnp.zeros((audio.shape[0],), jnp.float32)
        for i in range(self.cfg.dw_n_discriminators):
            total = total + DWModule(self.cfg, name=f"dw{i}")(x)
            if i != self.cfg.dw_n_discriminators - 1:
                x = nn.avg_pool(x[:, :, None], (4,), strides=(2,),
                                padding="VALID")[..., 0]
        return total


class StarGANBlock(nn.Module):
    """Conv2d (VALID) + train-mode BatchNorm + 1x1 GLU
    (modules.py:356-384)."""
    channels: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.channels, self.kernel, strides=self.strides,
                    padding="VALID", dtype=self.dtype, name="conv")(x)
        # BatchNorm2d training forward: biased batch stats per channel
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(0, 1, 2))
        var = xf.var(axis=(0, 1, 2))
        scale = self.param("bn_scale", nn.initializers.ones,
                           (self.channels,))
        bias = self.param("bn_bias", nn.initializers.zeros,
                          (self.channels,))
        x = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale
             + bias).astype(self.dtype)
        glu = nn.Conv(2 * self.channels, (1, 1), dtype=self.dtype,
                      name="glu")(x)
        a, b = jnp.split(glu, 2, axis=-1)
        return a * jax.nn.sigmoid(b)


class SpectDiscriminator(nn.Module):
    """DS (modules.py:386-420): StarGAN blocks over the multi-res
    spectrogram [B, C, T] (log-compressed by the caller), then a crush
    conv spanning the remaining frequency height, mean over time -> [B].
    Height is tracked with the VALID kernel shrink (documented deviation
    — the reference's tracking is off by kernel_h-1 per block and its
    default config crashes)."""
    cfg: HiFiGANDenoiserConfig

    @nn.compact
    def __call__(self, spect: jnp.ndarray) -> jnp.ndarray:
        x = spect[:, :, :, None]              # [B, H=C, W=T, 1]
        for i, (kh, kw, sh, sw, ch) in enumerate(self.cfg.ds_block_confs):
            x = StarGANBlock(ch, (kh, kw), (sh, sw),
                             dtype=self.cfg.dtype, name=f"block{i}")(x)
        remaining_h = x.shape[1]
        x = nn.Conv(1, (remaining_h, 3), padding="VALID",
                    dtype=self.cfg.dtype, name="end_conv")(x)
        return jnp.mean(x[:, 0, :, 0].astype(jnp.float32), axis=1)


# -- losses (model.py:59-175) -----------------------------------------------

def spectral_losses(mrs: MultiResSpect, pred_audio: jnp.ndarray,
                    gt_audio: jnp.ndarray):
    """(L1, MSE) over the log-compressed multi-res spectrogram."""
    p = log_compress(mrs(pred_audio))
    g = log_compress(mrs(gt_audio))
    return jnp.mean(jnp.abs(p - g)), jnp.mean((p - g) ** 2)


def fakeness_bce(logits: jnp.ndarray, fake_label: float) -> jnp.ndarray:
    """BCE(sigmoid(logits), label) with fakeness semantics (real=0,
    fake=1; model.py:70-71,83,117-123), in stable logit form."""
    if fake_label:
        return jnp.mean(jax.nn.softplus(-logits))
    return jnp.mean(jax.nn.softplus(logits))


def denoiser_loss(mrs: MultiResSpect, pred_audio: jnp.ndarray,
                  gt_audio: jnp.ndarray, stage: int = 0,
                  dw_fake: jnp.ndarray | None = None,
                  ds_fake: jnp.ndarray | None = None):
    """Generator loss. stage < 2: L1(log multi-res spect) + L1(audio)
    (model.py:151-152). stage >= 2: PURE adversarial BCE over the summed
    DS+DW fakeness logits toward the real label 0 (model.py:80-84 — the
    reference drops the spectral terms once the critics turn on)."""
    if stage >= 2 and dw_fake is not None and ds_fake is not None:
        adv = fakeness_bce(dw_fake + ds_fake, fake_label=0.0)
        return adv, {"adv": adv, "loss": adv}
    l1, mse = spectral_losses(mrs, pred_audio, gt_audio)
    audio_l1 = jnp.mean(jnp.abs(pred_audio.astype(jnp.float32)
                                - gt_audio.astype(jnp.float32)))
    total = l1 + audio_l1
    return total, {"spec_L1": l1, "spec_MSE": mse,
                   "audio_L1": audio_l1, "loss": total}
