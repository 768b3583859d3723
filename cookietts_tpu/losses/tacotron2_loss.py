"""Tacotron2 training loss.

Numerical rebuild of CookieTTS/_2_ttm/tacotron2_tm/loss_function.py:167-290
with TPU-friendly masking: the reference's dynamic ``masked_select`` means
become mask-weighted means over static padded shapes (identical values).

Includes per-item losses (the reference's ``file_losses`` database used for
dataset curation) returned as [B] arrays — the host maps them back to audio
paths.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.masking import get_first_over_thresh, get_mask_from_lengths
from ..ops.metrics import alignment_metric, weighted_score

# defaults from tacotron2_tm/hparams.py:296-317 (live-overridable in the
# reference via run_every_epoch.py; here via the runtime's live config)
DEFAULT_LOSS_SCALARS: Dict[str, float] = {
    "spec_MSE_weight": 0.0,
    "spec_MFSE_weight": 1.0,
    "postnet_MSE_weight": 0.0,
    "postnet_MFSE_weight": 1.0,
    "gate_loss_weight": 1.0,
    "sylps_kld_weight": 0.0020,
    "sylps_MSE_weight": 0.01,
    "sylps_MAE_weight": 0.00,
    "diag_att_weight": 0.05,
    # ssvae head terms (only applied when the model emits the keys)
    "em_kld_weight": 0.002,
    "sup_em_nll_weight": 1.0,
    "aux_em_MSE_weight": 0.1,
}


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over True positions of mask (broadcasting mask)."""
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _per_item_masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """[B, ...] -> [B] masked mean per batch item."""
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    axes = tuple(range(1, x.ndim))
    return jnp.sum(x * mask, axis=axes) / jnp.maximum(
        jnp.sum(mask, axis=axes), 1.0)


def guided_attention_loss(alignments: jnp.ndarray,
                          text_lengths: jnp.ndarray,
                          mel_lengths: jnp.ndarray,
                          sigma: float = 0.5,
                          item_weights: jnp.ndarray | None = None
                          ) -> jnp.ndarray:
    """Diagonal guided-attention prior (loss_function.py:14-85).

    W[t_dec, t_enc] = 1 - exp(-((t_enc/N - t_dec/T)^2) / (2 sigma^2));
    loss = sum over valid cells of attention * W, normalized by the
    total frame count sum(mel_lengths) — the reference's exact scheme
    (loss_function.py:44-50 ``sum(masked_select)/sum(olens)``).
    ``item_weights`` zeroes out TBPTT continuation segments
    (pres_prev_state != 0), excluding their frames from the normalizer
    the way the reference's row subsetting does.
    """
    B, T_dec, T_enc = alignments.shape
    in_len = jnp.maximum(text_lengths.astype(jnp.float32), 1.0)
    out_len = jnp.maximum(mel_lengths.astype(jnp.float32), 1.0)
    dec_pos = jnp.arange(T_dec, dtype=jnp.float32)[None, :, None] / \
        out_len[:, None, None]
    enc_pos = jnp.arange(T_enc, dtype=jnp.float32)[None, None, :] / \
        in_len[:, None, None]
    w = 1.0 - jnp.exp(-((enc_pos - dec_pos) ** 2) / (2.0 * sigma * sigma))
    mask = (get_mask_from_lengths(mel_lengths, T_dec)[:, :, None]
            & get_mask_from_lengths(text_lengths, T_enc)[:, None, :])
    per_item_sum = jnp.sum(
        alignments.astype(jnp.float32) * w * mask.astype(jnp.float32),
        axis=(1, 2))
    iw = jnp.ones((B,), jnp.float32) if item_weights is None \
        else item_weights.astype(jnp.float32)
    frames = mel_lengths.astype(jnp.float32)
    return jnp.sum(per_item_sum * iw) / jnp.maximum(
        jnp.sum(frames * iw), 1.0)


def tacotron2_loss(pred: Dict[str, jnp.ndarray], gt: Dict[str, jnp.ndarray],
                   loss_scalars: Dict[str, Any] | None = None,
                   gate_positive_weight: float = 10.0,
                   guided_att_sigma: float = 0.5
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray],
                              Dict[str, jnp.ndarray]]:
    """Compute the full Tacotron2 loss.

    pred: model output dict (mel_outputs, mel_outputs_postnet, gate_outputs,
          alignments, pred_sylps, syl_mu, syl_logvar).
    gt:   batch dict (mels [B,T,M], mel_lengths, text_lengths, gate_target
          [B,T], sylps, optional pres_prev_state [B]).
    Returns (total_loss, loss_dict, per_file_losses[B]).
    """
    scalars = dict(DEFAULT_LOSS_SCALARS)
    if loss_scalars:
        scalars.update(loss_scalars)

    gt_mel = gt["mels"]
    B, T_dec, n_mel = gt_mel.shape
    mel_lengths = gt["mel_lengths"]
    text_lengths = gt["text_lengths"]
    frame_mask = get_mask_from_lengths(mel_lengths, T_dec)[:, :, None]

    loss_dict: Dict[str, jnp.ndarray] = {}
    file_losses: Dict[str, jnp.ndarray] = {}

    # spectrogram MSE (decoder + postnet)
    se = (pred["mel_outputs"].astype(jnp.float32) -
          gt_mel.astype(jnp.float32)) ** 2
    loss_dict["spec_MSE"] = _masked_mean(se, frame_mask)
    file_losses["spec_MSE"] = _per_item_masked_mean(se, frame_mask)
    se_post = (pred["mel_outputs_postnet"].astype(jnp.float32) -
               gt_mel.astype(jnp.float32)) ** 2
    loss_dict["postnet_MSE"] = _masked_mean(se_post, frame_mask)

    # MFSE: |err| weighted by its own frame-mean (loss_function.py:204-213)
    ae = jnp.abs(pred["mel_outputs"].astype(jnp.float32) -
                 gt_mel.astype(jnp.float32))
    frame_mean = jnp.mean(ae, axis=2, keepdims=True)
    loss_dict["spec_MFSE"] = _masked_mean(ae * frame_mean, frame_mask)
    ae_post = jnp.abs(pred["mel_outputs_postnet"].astype(jnp.float32) -
                      gt_mel.astype(jnp.float32))
    frame_mean_post = jnp.mean(ae_post, axis=2, keepdims=True)
    loss_dict["postnet_MFSE"] = _masked_mean(ae_post * frame_mean_post,
                                             frame_mask)

    # gate BCE with pos_weight (loss_function.py:215-219). Computed over all
    # positions like the reference (gate targets cover padding too).
    logits = pred["gate_outputs"].astype(jnp.float32)
    target = gt["gate_target"].astype(jnp.float32)
    log_sig = jax.nn.log_sigmoid(logits)
    log_one_minus = jax.nn.log_sigmoid(-logits)
    bce = -(gate_positive_weight * target * log_sig
            + (1.0 - target) * log_one_minus)
    loss_dict["gate_loss"] = jnp.mean(bce)

    # SylpsNet KLD (loss_function.py:221-225)
    mu, logvar = pred["syl_mu"].astype(jnp.float32), \
        pred["syl_logvar"].astype(jnp.float32)
    loss_dict["sylps_kld"] = -0.5 * jnp.sum(
        1.0 + logvar - jnp.exp(logvar) - mu**2) / B

    # predicted sylps regression (loss_function.py:227-232)
    pred_sylps = pred["pred_sylps"].astype(jnp.float32)
    gt_sylps = gt["sylps"].astype(jnp.float32)
    loss_dict["sylps_MAE"] = jnp.mean(jnp.abs(pred_sylps - gt_sylps))
    loss_dict["sylps_MSE"] = jnp.mean((pred_sylps - gt_sylps) ** 2)

    # guided attention, skipping TBPTT continuation segments
    item_w = None
    if "pres_prev_state" in gt:
        item_w = (gt["pres_prev_state"] == 0.0)
    loss_dict["diag_att"] = guided_attention_loss(
        pred["alignments"], text_lengths, mel_lengths,
        sigma=guided_att_sigma, item_weights=item_w)

    # ssvae heads (tacotron2_ssvae): emotion VAE KLD, supervised class
    # NLL, and aux-net latent matching (text-only net chases the
    # audio-conditioned net's latents)
    if "em_zu_mu" in pred:
        em_mu = pred["em_zu_mu"].astype(jnp.float32)
        em_logvar = pred["em_zu_logvar"].astype(jnp.float32)
        loss_dict["em_kld"] = -0.5 * jnp.sum(
            1.0 + em_logvar - jnp.exp(em_logvar) - em_mu**2) / B
        if "emotion_onehot" in gt and "emotion_id" in gt:
            known = (gt["emotion_id"]
                     != pred["em_zs"].shape[-1]).astype(jnp.float32)
            nll = -jnp.sum(pred["em_zs"].astype(jnp.float32)
                           * gt["emotion_onehot"].astype(jnp.float32),
                           axis=-1)
            loss_dict["sup_em_nll"] = jnp.sum(nll * known) / jnp.maximum(
                jnp.sum(known), 1.0)
        if "aux_zs" in pred:
            tgt_zs = jax.lax.stop_gradient(
                jnp.exp(pred["em_zs"].astype(jnp.float32)))
            tgt_mu = jax.lax.stop_gradient(em_mu)
            tgt_lv = jax.lax.stop_gradient(em_logvar)
            loss_dict["aux_em_MSE"] = (
                jnp.mean((jnp.exp(pred["aux_zs"].astype(jnp.float32))
                          - tgt_zs) ** 2)
                + jnp.mean((pred["aux_zu_mu"].astype(jnp.float32)
                            - tgt_mu) ** 2)
                + jnp.mean((pred["aux_zu_logvar"].astype(jnp.float32)
                            - tgt_lv) ** 2))

    # weighted total (colate_losses, loss_function.py:152-161)
    total = jnp.zeros((), jnp.float32)
    for name in ("spec_MSE", "spec_MFSE", "postnet_MSE", "postnet_MFSE",
                 "gate_loss", "sylps_kld", "sylps_MSE", "sylps_MAE",
                 "diag_att", "em_kld", "sup_em_nll", "aux_em_MSE"):
        if name in loss_dict:
            total = total + loss_dict[name] * scalars[f"{name}_weight"]
    loss_dict["loss"] = total

    # -- metrics (no grad needed; lax.stop_gradient for clarity) ----------
    align = jax.lax.stop_gradient(pred["alignments"])
    atd = alignment_metric(align, text_lengths, mel_lengths)
    loss_dict["diagonality"] = jnp.mean(atd["diagonalitys"])
    loss_dict["avg_max_attention"] = jnp.mean(atd["avg_prob"])
    file_losses["avg_max_attention"] = atd["avg_prob"]
    file_losses["att_diagonality"] = atd["diagonalitys"]
    file_losses["p_missing_enc"] = atd["p_missing_enc"]

    # inference-style attention score from predicted gates
    pred_gate = jax.nn.sigmoid(
        jax.lax.stop_gradient(pred["gate_outputs"].astype(jnp.float32)))
    pred_gate = pred_gate.at[:, :5].set(0.0)
    pred_lengths = get_first_over_thresh(pred_gate, 0.7)
    pred_lengths = jnp.minimum(pred_lengths, T_dec)
    atd_inf = alignment_metric(align, text_lengths, pred_lengths)
    scores = weighted_score(atd_inf, text_lengths, mel_lengths)
    loss_dict["weighted_score"] = jnp.mean(scores)
    file_losses["att_score"] = scores

    return total, loss_dict, file_losses
