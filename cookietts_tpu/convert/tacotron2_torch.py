"""Convert reference Tacotron2 (tacotron2_tm) torch checkpoints.

Maps the reference's state dict (CookieTTS/_2_ttm/tacotron2_tm/model.py)
onto our ``models/tacotron2.py`` param tree. Layout rules:

- torch Linear weight [out, in]      -> flax Dense kernel [in, out] (.T)
- torch Conv1d weight [out, in, k]   -> flax Conv kernel [k, in, out]
- torch Embedding                    -> flax Embed "embedding" (direct)
- torch LSTM / LSTMCellWithZoneout gate order is (i, f, g, o), same as
  ours; our fused ZoneoutLSTMCell kernel is [W_ih.T ; W_hh.T] with
  bias = b_ih + b_hh − 1 on the forget block (we add +1 in-graph)
- torch nn.LSTM (encoder BiLSTM)     -> flax OptimizedLSTMCell per-gate
  Dense params (i*/h* kernels, h* bias)
- BatchNorm1d weight/bias/running_*  -> flax BatchNorm scale/bias +
  batch_stats mean/var

Full-model teacher-forced parity (dropouts zeroed) is proven in
tests/test_reference_parity.py.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from .waveglow_torch import _np


def _lin(sd, prefix):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv(sd, prefix):
    out = {"kernel": np.transpose(_np(sd[f"{prefix}.weight"]), (2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _bn(sd, prefix) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _zoneout_cell(sd, prefix) -> Dict[str, Any]:
    """LSTMCellWithZoneout -> our fused-gates ZoneoutLSTMCell."""
    w_ih = _np(sd[f"{prefix}.weight_ih"])            # [4H, In]
    w_hh = _np(sd[f"{prefix}.weight_hh"])            # [4H, H]
    bias = _np(sd[f"{prefix}.bias_ih"]) + _np(sd[f"{prefix}.bias_hh"])
    H = w_hh.shape[1]
    bias = bias.copy()
    bias[H:2 * H] -= 1.0        # we add +1 to the forget gate in-graph
    return {"gates": {
        "kernel": np.concatenate([w_ih.T, w_hh.T], axis=0),
        "bias": bias}}


def _flax_lstm_cell(sd, prefix, suffix="") -> Dict[str, Any]:
    """torch nn.LSTM direction -> flax OptimizedLSTMCell per-gate params."""
    w_ih = _np(sd[f"{prefix}.weight_ih_l0{suffix}"])   # [4H, In]
    w_hh = _np(sd[f"{prefix}.weight_hh_l0{suffix}"])   # [4H, H]
    bias = (_np(sd[f"{prefix}.bias_ih_l0{suffix}"])
            + _np(sd[f"{prefix}.bias_hh_l0{suffix}"]))
    H = w_hh.shape[1]
    out: Dict[str, Any] = {}
    for gi, g in enumerate(("i", "f", "g", "o")):
        sl = slice(gi * H, (gi + 1) * H)
        out[f"i{g}"] = {"kernel": w_ih[sl].T}
        out[f"h{g}"] = {"kernel": w_hh[sl].T, "bias": bias[sl]}
    return out


def convert_tacotron2_state_dict(sd: Mapping[str, Any]
                                 ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(params, batch_stats) for models/tacotron2.py:Tacotron2 from a
    reference tacotron2_tm state dict (attention_type 0)."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in sd.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["embedding"] = {"embedding": _np(sd["embedding.weight"])}
    params["speaker_embedding"] = {
        "embedding": _np(sd["speaker_embedding.weight"])}
    if "encoder.encoder_speaker_embedding.weight" in sd:
        params["encoder_speaker_embedding"] = {
            "embedding": _np(sd["encoder.encoder_speaker_embedding.weight"])}

    # encoder convs + BN + BiLSTM + sylps head
    enc: Dict[str, Any] = {}
    enc_stats: Dict[str, Any] = {}
    i = 0
    while f"encoder.convolutions.{i}.0.conv.weight" in sd:
        enc[f"conv{i}"] = _conv(sd, f"encoder.convolutions.{i}.0.conv")
        p, s = _bn(sd, f"encoder.convolutions.{i}.1")
        enc[f"bn{i}"] = p
        enc_stats[f"bn{i}"] = s
        i += 1
    enc["OptimizedLSTMCell_0"] = _flax_lstm_cell(sd, "encoder.lstm")
    enc["OptimizedLSTMCell_1"] = _flax_lstm_cell(sd, "encoder.lstm",
                                                 "_reverse")
    enc["sylps_layer"] = _lin(sd, "encoder.sylps_layer.linear_layer")
    params["encoder"] = enc
    stats["encoder"] = enc_stats

    # sylps net (seq_layers indices skip the activations: 0, 2, 4, ...)
    syl: Dict[str, Any] = {"res_weight": _np(sd["sylps_net.res_weight"])}
    di = 0
    li = 0
    while f"sylps_net.seq_layers.{li}.linear_layer.weight" in sd:
        syl[f"Dense_{di}"] = _lin(sd, f"sylps_net.seq_layers.{li}"
                                      ".linear_layer")
        di += 1
        li += 2
    params["sylps_net"] = syl

    params["tm_linear"] = _lin(sd, "tm_linear")
    if "tm_bn.running_mean" in sd or "tm_bn.weight" in sd:
        p, s = _bn(sd, "tm_bn")
        params["tm_bn"] = p
        stats["tm_bn"] = s

    if "decoder.memory_bottleneck.bottleneck.linear_layer.weight" in sd:
        params["memory_bottleneck"] = _lin(
            sd, "decoder.memory_bottleneck.bottleneck.linear_layer")

    # decoder cell
    cell: Dict[str, Any] = {}
    pre: Dict[str, Any] = {}
    i = 0
    while f"decoder.prenet.layers.{i}.linear_layer.weight" in sd:
        pre[f"fc{i}"] = _lin(sd, f"decoder.prenet.layers.{i}.linear_layer")
        i += 1
    cell["prenet"] = pre
    cell["attention_rnn"] = _zoneout_cell(sd, "decoder.attention_rnn")
    cell["decoder_rnn"] = _zoneout_cell(sd, "decoder.decoder_rnn")
    if "decoder.second_decoder_rnn.weight_ih" in sd:
        cell["second_decoder_rnn"] = _zoneout_cell(
            sd, "decoder.second_decoder_rnn")

    att_p = "decoder.attention_layer"
    att: Dict[str, Any] = {
        "query_layer": _lin(sd, f"{att_p}.query_layer.linear_layer"),
        "memory_layer": _lin(sd, f"{att_p}.memory_layer.linear_layer"),
        "v": _lin(sd, f"{att_p}.v.linear_layer"),
        "location_conv": _conv(
            sd, f"{att_p}.location_layer.location_conv.conv"),
        "location_dense": _lin(
            sd, f"{att_p}.location_layer.location_dense.linear_layer"),
    }
    if f"{att_p}.windowed_att_pos_offset" in sd:
        att["window_offset"] = _np(sd[f"{att_p}.windowed_att_pos_offset"])
    if "decoder.exp_smoothing_factor" in sd:
        att["exp_smoothing_factor"] = _np(sd["decoder.exp_smoothing_factor"])
    if f"{att_p}.softmax_temp" in sd:
        att["inv_temperature"] = _np(sd[f"{att_p}.softmax_temp"])
    cell["attention"] = att

    cell["linear_projection"] = _lin(
        sd, "decoder.linear_projection.linear_layer")
    cell["gate_layer"] = _lin(sd, "decoder.gate_layer.linear_layer")
    params["decoder"] = {"cell": cell}

    # postnet
    post: Dict[str, Any] = {}
    post_stats: Dict[str, Any] = {}
    i = 0
    while f"postnet.convolutions.{i}.0.conv.weight" in sd:
        post[f"conv{i}"] = _conv(sd, f"postnet.convolutions.{i}.0.conv")
        # output layers (i % b_res == 0 and the last) carry no BatchNorm
        if f"postnet.convolutions.{i}.1.weight" in sd:
            p, s = _bn(sd, f"postnet.convolutions.{i}.1")
            post[f"bn{i}"] = p
            post_stats[f"bn{i}"] = s
        i += 1
    if post:
        params["postnet"] = post
        stats["postnet"] = post_stats

    return params, stats
