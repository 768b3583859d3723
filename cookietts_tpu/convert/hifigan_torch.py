"""Convert reference/upstream HiFi-GAN Generator torch checkpoints.

Maps the state dict of CookieTTS/_4_mtw/hifigan/models.py:Generator
(== upstream jik876/hifi-gan) onto our ``models/hifigan.py:Generator``.

Our generator wraps every conv in flax ``nn.WeightNorm``; the torch
weight-norm pairs are resolved to effective weights and re-expressed as
(direction kernel, per-feature scale) with scale = ||w|| so the
normalized product reproduces w exactly.

Inner-conv naming note: the flax convs are created unnamed inside
WeightNorm wrappers, so they get creation-order auto-names in the
Generator scope — Conv_0 = conv_pre, ConvTranspose_{i} = ups.{i},
Conv_1 = conv_post; inside resblock{i}_{j}, Conv_{2m} / Conv_{2m+1} are
convs1.{m} / convs2.{m}.
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from .waveglow_torch import _np, _weight


def _wn_params(w_flax: np.ndarray, bias: np.ndarray,
               conv_name: str, wn_name: str,
               params: Dict[str, Any]) -> None:
    """Insert (kernel, bias) + WeightNorm scale for one wrapped conv.
    flax WeightNorm normalizes over all axes but the last (features), so
    scale = per-out-feature L2 norm makes scale * w/||w|| == w."""
    scale = np.sqrt((w_flax ** 2).sum(
        axis=tuple(range(w_flax.ndim - 1))))
    params[conv_name] = {"kernel": w_flax, "bias": bias}
    # flax WeightNorm stores the scale as ONE param whose name embeds the
    # wrapped path: params/<wn_name>/"<conv_name>/kernel/scale"
    params.setdefault(wn_name, {})[f"{conv_name}/kernel/scale"] = \
        scale.astype(np.float32)


def convert_hifigan_state_dict(sd: Mapping[str, Any]
                               ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(params, config_hints) for models/hifigan.py:Generator."""
    sd = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in sd.items()}
    params: Dict[str, Any] = {}

    def conv_w(prefix):      # torch [out, in, k] -> flax [k, in, out]
        return np.transpose(_weight(sd, prefix), (2, 1, 0))

    def convT_w(prefix):     # torch ConvT [in, out, k] -> flax, k flipped
        w = _weight(sd, prefix)
        return np.ascontiguousarray(np.transpose(w[:, :, ::-1], (2, 0, 1)))

    _wn_params(conv_w("conv_pre"), _np(sd["conv_pre.bias"]),
               "Conv_0", "conv_pre", params)

    n_ups = 1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith("ups."))
    for i in range(n_ups):
        _wn_params(convT_w(f"ups.{i}"), _np(sd[f"ups.{i}.bias"]),
                   f"ConvTranspose_{i}", f"up{i}", params)
    _wn_params(conv_w("conv_post"), _np(sd["conv_post.bias"]),
               "Conv_1", "conv_post", params)

    # resblocks.{n} with n = i * num_kernels + j
    rb_ids = sorted({int(k.split(".")[1]) for k in sd
                     if k.startswith("resblocks.")})
    num_kernels = len(rb_ids) // n_ups
    for n in rb_ids:
        i, j = divmod(n, num_kernels)
        rb: Dict[str, Any] = {}
        m = 0
        while f"resblocks.{n}.convs1.{m}.weight_v" in sd \
                or f"resblocks.{n}.convs1.{m}.weight" in sd:
            _wn_params(conv_w(f"resblocks.{n}.convs1.{m}"),
                       _np(sd[f"resblocks.{n}.convs1.{m}.bias"]),
                       f"Conv_{2 * m}", f"conv1_{m}", rb)
            _wn_params(conv_w(f"resblocks.{n}.convs2.{m}"),
                       _np(sd[f"resblocks.{n}.convs2.{m}.bias"]),
                       f"Conv_{2 * m + 1}", f"conv2_{m}", rb)
            m += 1
        params[f"resblock{i}_{j}"] = rb

    hints = dict(
        n_mel_channels=params["Conv_0"]["kernel"].shape[1],
        upsample_initial_channel=params["Conv_0"]["kernel"].shape[2],
        n_upsamples=n_ups, num_kernels=num_kernels,
        upsample_kernel_sizes=tuple(
            params[f"ConvTranspose_{i}"]["kernel"].shape[0]
            for i in range(n_ups)),
    )
    return params, hints


def convert_hifigan_discriminators(mpd_sd: Mapping[str, Any],
                                   msd_sd: Mapping[str, Any],
                                   periods=(2, 3, 5, 7, 11)
                                   ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(mpd_params, msd_params) from the reference training checkpoint's
    ``mpd``/``msd`` state dicts (models.py:150-267, saved by
    _4_mtw/hifigan/train.py as do_* files).

    MPD convs are weight-normed Conv2d [out, in, kh, 1]; MSD scale 0 is
    SPECTRAL-normed (weight_orig mapped onto :class:`SNConv`'s raw
    kernel — our forward recomputes sigma), pooled scales weight-normed.
    """
    mpd_sd = {(k[len("module."):] if k.startswith("module.") else k): v
              for k, v in mpd_sd.items()}
    msd_sd = {(k[len("module."):] if k.startswith("module.") else k): v
              for k, v in msd_sd.items()}

    def conv2d_w(sd, prefix):   # torch [out, in, kh, kw] -> [kh, kw, in, out]
        return np.transpose(_weight(sd, prefix), (2, 3, 1, 0))

    def conv1d_w(sd, prefix):   # torch [out, in/g, k] -> [k, in/g, out]
        return np.transpose(_weight(sd, prefix), (2, 1, 0))

    mpd: Dict[str, Any] = {}
    for i, p in enumerate(periods):
        d: Dict[str, Any] = {}
        for j in range(5):
            _wn_params(conv2d_w(mpd_sd, f"discriminators.{i}.convs.{j}"),
                       _np(mpd_sd[f"discriminators.{i}.convs.{j}.bias"]),
                       f"Conv_{j}", f"conv{j}", d)
        _wn_params(conv2d_w(mpd_sd, f"discriminators.{i}.conv_post"),
                   _np(mpd_sd[f"discriminators.{i}.conv_post.bias"]),
                   "Conv_5", "conv_post", d)
        mpd[f"period{p}"] = d

    n_scales = 1 + max(int(k.split(".")[1]) for k in msd_sd
                       if k.startswith("discriminators."))
    msd: Dict[str, Any] = {}
    for i in range(n_scales):
        d = {}
        names = [f"convs.{j}" for j in range(7)] + ["conv_post"]
        ours = [f"conv{j}" for j in range(7)] + ["conv_post"]
        if i == 0:
            # spectral norm: raw weight_orig -> SNConv kernel
            for src, dst in zip(names, ours):
                pre = f"discriminators.0.{src}"
                w = _np(msd_sd[f"{pre}.weight_orig"])
                d[dst] = {"kernel": np.transpose(w, (2, 1, 0)),
                          "bias": _np(msd_sd[f"{pre}.bias"])}
        else:
            for j, (src, dst) in enumerate(zip(names, ours)):
                pre = f"discriminators.{i}.{src}"
                _wn_params(conv1d_w(msd_sd, pre), _np(msd_sd[f"{pre}.bias"]),
                           f"Conv_{j}", dst, d)
        msd[f"scale{i}"] = d
    return mpd, msd
