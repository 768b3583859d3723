"""Convert reference TPGST (tacotron2_ssvae) checkpoints to flax params.

Maps the torch state dict of `_2_ttm/tacotron2_ssvae/TPGST.py:129-263`
(ReferenceEncoder 6x stride-2 conv2d+BN+relu -> GRU -> FC -> tanh,
MultiHeadAttention over learned token embeddings, optional ss-VAE head,
torchMoji map_lin) onto :class:`cookietts_tpu.models.gst.GST`, whose
ReferenceEncoder intentionally matches the torch geometry (explicit
(1,1) conv pads, BN eps 1e-3, channel-major feature flatten) so the
conversion is a pure relayout:

- conv weights: [O, I, 3, 3] -> HWIO
- BN: weight/bias -> scale/bias params; running stats -> batch_stats
- GRU (torch gates r,z,n stacked): flax GRUCell ir/iz/in/hr/hz/hn with
  the hr/hz biases folded into ir/iz (flax's h-gates are bias-free)
- 1x1 conv_Q/conv_K -> Dense; Linear weights transposed

Accepts keys with or without a ``gst.`` prefix (the full ssvae model
stores the module as ``gst``).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _f32(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _dense(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _f32(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _f32(sd[f"{prefix}.bias"])
    return out


def _gru_cell(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """torch nn.GRU layer-0 weights -> flax GRUCell params."""
    w_ih = _f32(sd[f"{prefix}.weight_ih_l0"])                # [3E, in]
    w_hh = _f32(sd[f"{prefix}.weight_hh_l0"])                # [3E, E]
    b_ih = _f32(sd[f"{prefix}.bias_ih_l0"])
    b_hh = _f32(sd[f"{prefix}.bias_hh_l0"])
    E = w_hh.shape[1]
    return {
        "ir": {"kernel": w_ih[:E].T, "bias": b_ih[:E] + b_hh[:E]},
        "iz": {"kernel": w_ih[E:2 * E].T,
               "bias": b_ih[E:2 * E] + b_hh[E:2 * E]},
        "in": {"kernel": w_ih[2 * E:].T, "bias": b_ih[2 * E:]},
        "hr": {"kernel": w_hh[:E].T},
        "hz": {"kernel": w_hh[E:2 * E].T},
        "hn": {"kernel": w_hh[2 * E:].T, "bias": b_hh[2 * E:]},
    }


def _ref_encoder(sd: Dict[str, Any], prefix: str
                 ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Shared ReferenceEncoder mapping (TPGST + EmotionNet use the same
    conv->BN->GRU->FC stack)."""
    ref_p: Dict[str, Any] = {}
    ref_bs: Dict[str, Any] = {}
    i = 0
    while f"{prefix}.convs.{i}.weight" in sd:
        w = _f32(sd[f"{prefix}.convs.{i}.weight"])          # [O, I, 3, 3]
        conv: Dict[str, Any] = {"kernel": w.transpose(2, 3, 1, 0)}
        if f"{prefix}.convs.{i}.bias" in sd:
            conv["bias"] = _f32(sd[f"{prefix}.convs.{i}.bias"])
        ref_p[f"conv{i}"] = conv
        bn = f"{prefix}.convs.{i}.batch_norm"
        ref_p[f"bn{i}"] = {"scale": _f32(sd[f"{bn}.weight"]),
                           "bias": _f32(sd[f"{bn}.bias"])}
        ref_bs[f"bn{i}"] = {"mean": _f32(sd[f"{bn}.running_mean"]),
                            "var": _f32(sd[f"{bn}.running_var"])}
        i += 1
    if i == 0:
        raise ValueError(f"no {prefix} conv weights found")
    ref_p["GRUCell_0"] = _gru_cell(sd, f"{prefix}.gru")
    ref_p["fc"] = _dense(sd, f"{prefix}.fc.0")
    return ref_p, ref_bs


def convert_gst_state_dict(sd: Dict[str, Any]
                           ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """state dict -> (params, batch_stats) for models.gst.GST."""
    sd = dict(sd)
    if any(k.startswith("gst.") for k in sd):
        sd = {k[len("gst."):]: v for k, v in sd.items()
              if k.startswith("gst.")}

    ref_p, ref_bs = _ref_encoder(sd, "ref_encoder")

    att: Dict[str, Any] = {}
    for name in ("conv_Q", "conv_K"):                         # 1x1 conv1d
        w = _f32(sd[f"att.{name}.weight"])[:, :, 0]           # [U, E]
        att[name] = {"kernel": w.T, "bias": _f32(sd[f"att.{name}.bias"])}
    for name in ("fc_Q", "fc_K", "fc_V", "fc_A"):
        att[name] = _dense(sd, f"att.{name}.0")

    params: Dict[str, Any] = {
        "token_embedding": _f32(sd["token_embedding"]),
        "ref_encoder": ref_p,
        "att": att,
    }
    if "map_lin.linear_layer.weight" in sd:
        params["map_lin"] = _dense(sd, "map_lin.linear_layer")
    if "ss_vae_layers.0.weight" in sd:
        params["ss_vae_layers"] = _dense(sd, "ss_vae_layers.0")
    return params, {"ref_encoder": ref_bs}


def convert_emotionnet_state_dict(sd: Dict[str, Any]
                                  ) -> Tuple[Dict[str, Any],
                                             Dict[str, Any]]:
    """Reference EmotionNet (nets/EmotionNet.py:66-124) state dict ->
    (params, batch_stats) for models.emotionnet.EmotionNet: the shared
    ReferenceEncoder stack, the text-summary GRU (final hidden), and the
    classifier/latent LinearNorms."""
    sd = dict(sd)
    if any(k.startswith("emotion_net.") for k in sd):
        sd = {k[len("emotion_net."):]: v for k, v in sd.items()
              if k.startswith("emotion_net.")}

    ref_p, ref_bs = _ref_encoder(sd, "ref_enc")
    params: Dict[str, Any] = {
        "ref_enc": ref_p,
        "GRUCell_0": _gru_cell(sd, "text_rnn"),
        "classifier": _dense(sd, "classifier_layer.linear_layer"),
        "latent": _dense(sd, "latent_layer.linear_layer"),
    }
    return params, {"ref_enc": ref_bs}


def convert_auxemotionnet_state_dict(sd: Dict[str, Any]
                                     ) -> Dict[str, Any]:
    """Reference AuxEmotionNet (nets/AuxEmotionNet.py:7-63) state dict
    -> params for models.emotionnet.AuxEmotionNet: the torchMoji seq
    MLP (LinearNorms at even Sequential indices, LeakyReLUs between),
    the text-summary GRU, and the fused latent+classifier LinearNorm."""
    sd = dict(sd)
    if any(k.startswith("aux_emotion_net.") for k in sd):
        sd = {k[len("aux_emotion_net."):]: v for k, v in sd.items()
              if k.startswith("aux_emotion_net.")}

    params: Dict[str, Any] = {
        "GRUCell_0": _gru_cell(sd, "text_rnn"),
        "latent_classifier": _dense(
            sd, "latent_classifier_layer.linear_layer"),
    }
    i = 0
    while f"seq_layers.{2 * i}.linear_layer.weight" in sd:
        params[f"seq{i}"] = _dense(sd, f"seq_layers.{2 * i}.linear_layer")
        i += 1
    if i == 0:
        raise ValueError("no seq_layers weights found")
    return params
