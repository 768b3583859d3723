"""Alignment diagnostics.

Numerical-parity rebuild of ``alignment_metric``
(CookieTTS/utils/model/utils.py:59-120) and the inference "weighted score"
with punishment terms (CookieTTS/_2_ttm/tacotron2_tm/loss_function.py:266-288,
CookieTTS/_5_infer/t2s_server/text2speech.py:596-613). Used for:
- per-file attention-quality tracking during training (dataset curation),
- best-of-N rejection sampling in the inference server.

All functions are jittable and masked (static padded shapes). Focus values
are in FRAMES (total attention mass per encoder token), matching the
reference's units so the punishment thresholds (60 frames, 3.6 frames, ...)
transfer unchanged.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .masking import get_mask_from_lengths

_SQRT2 = 1.4142135


def alignment_metric(alignments: jnp.ndarray,
                     input_lengths: jnp.ndarray,
                     output_lengths: jnp.ndarray,
                     enc_min_thresh: float = 0.7) -> Dict[str, jnp.ndarray]:
    """Score attention matrices. alignments: [B, T_dec, T_enc].

    Returns per-item [B] float arrays matching utils/model/utils.py:59-120:
      diagonality   — (argmax-walk path length + sqrt(2)) / straight-line
      avg_prob      — mean per-frame max attention (padding-corrected)
      encoder_{max,min,avg}_focus — attention mass per encoder token, frames
      p_missing_enc — fraction of tokens with < ``enc_min_thresh`` mass
    """
    B, T_dec, T_enc = alignments.shape
    in_len = jnp.maximum(input_lengths.astype(jnp.float32), 1.0)
    out_len = jnp.maximum(output_lengths.astype(jnp.float32), 1.0)
    dec_mask = get_mask_from_lengths(output_lengths, T_dec)   # [B, T_dec]
    enc_mask = get_mask_from_lengths(input_lengths, T_enc)    # [B, T_enc]
    att = alignments.astype(jnp.float32)

    optimums = jnp.sqrt(in_len**2 + out_len**2)

    values = jnp.max(att, axis=-1)                            # [B, T_dec]
    cur_idx = jnp.argmax(att, axis=-1).astype(jnp.float32)    # [B, T_dec]
    prev_idx = jnp.concatenate([cur_idx[:, :1], cur_idx[:, :-1]], axis=1)
    dist = jnp.sqrt((prev_idx - cur_idx) ** 2 + 1.0)
    dist = jnp.where(dec_mask, dist, 0.0)
    diagonality = (jnp.sum(dist, axis=1) + _SQRT2) / optimums

    att_m = jnp.where(dec_mask[:, :, None], att, 0.0)
    enc_total = jnp.sum(att_m, axis=1)                        # [B, T_enc]
    enc_total = jnp.where(enc_mask, enc_total, 0.0)
    encoder_max_focus = jnp.max(enc_total, axis=1)
    encoder_avg_focus = jnp.sum(enc_total, axis=1) / in_len
    enc_total_minfill = jnp.where(enc_mask, enc_total, 1.0)
    encoder_min_focus = jnp.min(enc_total_minfill, axis=1)

    values = jnp.where(dec_mask, values, 0.0)
    avg_prob = jnp.sum(values, axis=1) / out_len

    enc_total_bigfill = jnp.where(enc_mask, enc_total, 1e3)
    p_missing_enc = jnp.sum(
        enc_total_bigfill < enc_min_thresh, axis=1) / in_len

    return {
        "diagonalitys": diagonality,
        "avg_prob": avg_prob,
        "encoder_max_focus": encoder_max_focus,
        "encoder_min_focus": encoder_min_focus,
        "encoder_avg_focus": encoder_avg_focus,
        "p_missing_enc": p_missing_enc,
    }


def weighted_score(metrics: Dict[str, jnp.ndarray],
                   text_lengths: jnp.ndarray | None = None,
                   mel_lengths: jnp.ndarray | None = None) -> jnp.ndarray:
    """Inference attention score with the server's punishment terms.

    Matches loss_function.py:266-288 exactly: start from attention
    confidence (avg_prob); punish non-diagonal paths, >0.5 s stuck on one
    token, skipped tokens, skipped text, and missing encoder coverage.
    Target ≥ 0.75 is the reference server default (t2s_config.json).
    """
    score = metrics["avg_prob"]
    score = score - jnp.maximum(metrics["diagonalitys"] - 1.10, 0.0) * 0.25
    score = score - jnp.maximum(metrics["encoder_max_focus"] - 60.0, 0.0) * 0.005
    score = score - jnp.maximum(0.00 - metrics["encoder_min_focus"], 0.0) * 0.5
    score = score - jnp.maximum(3.60 - metrics["encoder_avg_focus"], 0.0)
    mis = jnp.maximum(metrics["p_missing_enc"] - 0.08, 0.0)
    if text_lengths is not None and mel_lengths is not None:
        cond = (text_lengths > 12) & (
            mel_lengths < jnp.max(mel_lengths) * 0.75)
        mis = jnp.where(cond, mis, 0.0)
    score = score - mis
    return score
