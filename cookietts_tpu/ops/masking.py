"""Static-shape masking utilities.

Rebuild of CookieTTS/utils/model/utils.py:7-56 with TPU-friendly semantics:
every function takes a static maximum length (from the padded array shape)
and produces boolean masks; downstream losses are mask-weighted means
instead of the reference's dynamic ``masked_select``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def get_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B] lengths -> [B, max_len] bool mask (True inside the sequence).

    Reference: utils/model/utils.py:7-13.
    """
    ids = jnp.arange(max_len, dtype=lengths.dtype)
    return ids[None, :] < lengths[:, None]


def get_mask_3d(widths: jnp.ndarray, heights: jnp.ndarray,
                max_w: int, max_h: int) -> jnp.ndarray:
    """[B] x [B] -> [B, max_w, max_h] outer-product mask.

    Reference: utils/model/utils.py:15-28.
    """
    mask_w = get_mask_from_lengths(widths, max_w)    # [B, W]
    mask_h = get_mask_from_lengths(heights, max_h)   # [B, H]
    return mask_w[:, :, None] & mask_h[:, None, :]


def dropout_frame(mels: jnp.ndarray, global_mean: jnp.ndarray,
                  mel_lengths: jnp.ndarray, drop_frame_rate: float | jnp.ndarray,
                  key: jax.Array) -> jnp.ndarray:
    """Replace random mel frames with the dataset global mean.

    ``mels`` is time-major [B, T, n_mel]; ``global_mean`` is [n_mel].
    Reference: utils/model/utils.py:31-44 (drop-frame-rate regularizer),
    applied in tacotron2_tm/model.py:979-985.
    """
    B, T, _ = mels.shape
    valid = get_mask_from_lengths(mel_lengths, T)                 # [B, T]
    drop = jax.random.uniform(key, (B, T)) < drop_frame_rate
    drop = drop & valid
    return jnp.where(drop[:, :, None], global_mean[None, None, :], mels)


def get_first_over_thresh(x: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Index of the first element of each row over ``threshold``.

    Rows that never cross return the row length (x.shape[1]), NOT len-1 as
    the reference clamps to — callers use it as an exclusive stop index.
    Reference: utils/model/utils.py:47-56 (gate argmax).
    """
    over = x >= threshold
    any_over = jnp.any(over, axis=1)
    first = jnp.argmax(over, axis=1)
    return jnp.where(any_over, first, x.shape[1])
