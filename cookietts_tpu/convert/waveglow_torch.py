"""Convert reference/NVIDIA WaveGlow torch checkpoints to our params.

Covers the vanilla-glow architecture (CookieTTS/_4_mtw/waveglow/glow.py —
also the upstream NVIDIA layout): single wide ConvTranspose upsampler,
per-flow Invertible1x1Conv + WN coupling, cond as unfolded mel*n_group.
The converted params target our ``WaveGlow`` with the
reference-compatibility config (``upsample_mode='single'``,
``couple_transform='second'``); full-model forward parity is proven in
tests/test_reference_parity.py.

Accepts a flat ``state_dict``-style mapping of numpy arrays (or anything
with ``.numpy()``/``__array__``) so torch is NOT required at load time —
dump the torch checkpoint with
``{k: v.cpu().numpy() for k, v in sd.items()}`` on any machine that has
torch, then feed the .npz here.

Weight-norm pairs (``weight_g``/``weight_v``, torch's dim=0 norm) are
resolved to effective weights.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach()
    if hasattr(x, "numpy"):
        x = x.numpy()
    return np.asarray(x, np.float32)


def _weight(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    """Effective weight for ``prefix`` (resolving torch weight_norm)."""
    if f"{prefix}.weight" in sd:
        return _np(sd[f"{prefix}.weight"])
    g = _np(sd[f"{prefix}.weight_g"])
    v = _np(sd[f"{prefix}.weight_v"])
    axes = tuple(range(1, v.ndim))          # torch weight_norm dim=0
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True)) + 1e-12
    return g.reshape(norm.shape) * v / norm


def _conv_w(sd, prefix) -> np.ndarray:
    """torch Conv1d [out, in, k] -> flax Conv kernel [k, in, out]."""
    return np.transpose(_weight(sd, prefix), (2, 1, 0))


def _lin_w(sd, prefix) -> np.ndarray:
    """k=1 conv -> Dense kernel [in, out]."""
    return _weight(sd, prefix)[:, :, 0].T


def _bias(sd, prefix) -> np.ndarray:
    return _np(sd[f"{prefix}.bias"])


def _compose_cond(sd, wn_prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    """The reference fork's cond path is up to three k=1 convs with NO
    nonlinearity between (glow.py:152-166) — compose into one Dense.
    NVIDIA checkpoints have a single ``cond_layer`` instead."""
    if any(k.startswith(f"{wn_prefix}.cond_layer.")
           for k in sd):                      # NVIDIA single layer
        return _lin_w(sd, f"{wn_prefix}.cond_layer"), \
            _bias(sd, f"{wn_prefix}.cond_layer")
    idxs = sorted({int(m.group(1)) for k in sd
                   for m in [re.match(
                       rf"{re.escape(wn_prefix)}\.cond_layers\.(\d+)\.", k)]
                   if m})
    Ws = [_weight(sd, f"{wn_prefix}.cond_layers.{i}")[:, :, 0] for i in idxs]
    bs = [_bias(sd, f"{wn_prefix}.cond_layers.{i}") for i in idxs]
    W_eff, b_eff = Ws[0], bs[0]
    for Wn, bn in zip(Ws[1:], bs[1:]):
        b_eff = Wn @ b_eff + bn
        W_eff = Wn @ W_eff
    return W_eff.T, b_eff


def convert_waveglow_state_dict(sd: Mapping[str, Any]
                                ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(params, config_hints) from a reference WaveGlow state dict.

    ``config_hints`` carries everything inferable from the weights
    (n_flows, n_group, n_early_*, n_mel_channels, n_layers, n_channels,
    kernel_size, upsample_win_length) plus the two compatibility flags;
    the caller supplies hop_length (not stored in weights).
    """
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in sd.items()}
    n_flows = 1 + max(int(m.group(1)) for k in sd
                      for m in [re.match(r"WN\.(\d+)\.", k)] if m)

    params: Dict[str, Any] = {}
    convinv_sizes = []
    for k in range(n_flows):
        w = _weight(sd, f"convinv.{k}.conv")[:, :, 0]   # [C, C]
        convinv_sizes.append(w.shape[0])
        params[f"convinv{k}"] = {"weight": w.T}          # ours: y = x @ w

        p = f"WN.{k}"
        n_layers = 1 + max(int(m.group(1)) for key in sd
                           for m in [re.match(
                               rf"WN\.{k}\.in_layers\.(\d+)\.", key)] if m)
        wn: Dict[str, Any] = {
            "start": {"kernel": _lin_w(sd, f"{p}.start"),
                      "bias": _bias(sd, f"{p}.start")},
        }
        cw, cb = _compose_cond(sd, p)
        wn["cond_layer"] = {"kernel": cw, "bias": cb}
        for i in range(n_layers):
            wn[f"in_layer{i}"] = {
                "kernel": _conv_w(sd, f"{p}.in_layers.{i}"),
                "bias": _bias(sd, f"{p}.in_layers.{i}")}
            wn[f"res_skip{i}"] = {
                "kernel": _conv_w(sd, f"{p}.res_skip_layers.{i}"),
                "bias": _bias(sd, f"{p}.res_skip_layers.{i}")}
        # reference WN returns (b, log_s) (end.chunk(2,1), used at
        # glow.py:305); ours returns (log_s, t) -> swap output halves
        end_w = _weight(sd, f"{p}.end")[:, :, 0]         # [2*half, C]
        end_b = _bias(sd, f"{p}.end")
        half = end_w.shape[0] // 2
        wn["end"] = {
            "kernel": np.concatenate([end_w[half:], end_w[:half]], 0).T,
            "bias": np.concatenate([end_b[half:], end_b[:half]])}
        params[f"wn{k}"] = wn

    # single wide ConvTranspose upsampler: torch weight [in, out, K] ->
    # flax ConvTranspose kernel [K, in, out] with the tap axis FLIPPED
    # (lax.conv_transpose correlates; torch convolves)
    up_w = _weight(sd, "upsample")                        # [in, out, K]
    params["upsample_single"] = {
        "kernel": np.ascontiguousarray(
            np.transpose(up_w[:, :, ::-1], (2, 0, 1))),
        "bias": _bias(sd, "upsample")}

    n_group = convinv_sizes[0]
    # early split points show up as drops in convinv channel counts
    n_early_every = 0
    n_early_size = 0
    for k in range(1, n_flows):
        if convinv_sizes[k] != convinv_sizes[k - 1]:
            n_early_every = k
            n_early_size = convinv_sizes[k - 1] - convinv_sizes[k]
            break
    wn0_cond_in = params["wn0"]["cond_layer"]["kernel"].shape[0]
    hints = dict(
        n_flows=n_flows, n_group=n_group,
        n_early_every=n_early_every, n_early_size=n_early_size,
        n_mel_channels=up_w.shape[0],
        n_layers=1 + max(int(m.group(1)) for key in sd
                         for m in [re.match(
                             r"WN\.0\.in_layers\.(\d+)\.", key)] if m),
        n_channels=params["wn0"]["start"]["kernel"].shape[1],
        kernel_size=params["wn0"]["in_layer0"]["kernel"].shape[0],
        upsample_win_length=up_w.shape[2],
        upsample_mode="single", couple_transform="second",
        channel_mixing="1x1conv",
        cond_in_channels=wn0_cond_in,
    )
    return params, hints
