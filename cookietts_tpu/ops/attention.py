"""Attention variants for AR TTS decoding.

Rebuilds the reference's three attention families as per-step scan cells:

- :class:`LocationSensitiveAttention` — hybrid content+location attention
  with optional windowed masking, learned window offset, and learned
  softmax temperature (CookieTTS/_2_ttm/tacotron2_tm/model.py:49-161).
- :class:`GMMAttention` — monotonic mixture-of-gaussians attention
  (CookieTTS/utils/model/layers.py:149-246).
- :class:`DynamicConvolutionAttention` — DCA with static prior +
  query-conditioned dynamic filters (CookieTTS/utils/model/layers.py:6-146).

Design (scan-friendly): each module exposes
  ``precompute(memory, memory_lengths)`` -> const dict  (big [B,T,D] tensors,
      computed ONCE per utterance; ride the decoder scan as broadcast args)
  ``init_state(batch, t_enc)``           -> AttentionState (small carried state)
  ``__call__(query, memory, const, state)`` -> (context, weights, new_state)

All energies are masked with a large-negative fill (bf16-safe: dtype
finfo.min like the reference's fp16 switch, model.py:25-32).
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _score_mask_value(dtype) -> float:
    return float(jnp.finfo(dtype).min) / 2.0


class AttentionState(NamedTuple):
    """Per-step attention state carried through the decoder scan.

    ``mu`` is only meaningful for GMM attention (gaussian means); other
    families carry a [B, 1] zero placeholder so the carry pytree has one
    static structure regardless of attention type.
    """
    weights: jnp.ndarray       # [B, T_enc]  previous attention weights
    weights_cum: jnp.ndarray   # [B, T_enc]  cumulative attention weights
    position: jnp.ndarray      # [B]         exp-smoothed expected position
    mu: jnp.ndarray            # [B, K]      GMM means (or [B, 1] placeholder)


def _init_weights(batch: int, t_enc: int,
                  first_token: bool = False) -> jnp.ndarray:
    # reference initialize_decoder_states (model.py:565-588): weights
    # start at ZERO for location-sensitive attention; only DCA
    # (attention_type 2) seeds a one-hot on the first token
    w = jnp.zeros((batch, t_enc), jnp.float32)
    return w.at[:, 0].set(1.0) if first_token else w


class LocationSensitiveAttention(nn.Module):
    """Hybrid location-sensitive attention with windowing.

    Reference: tacotron2_tm/model.py:49-161 (attention type 0).
    """
    attention_dim: int = 128
    location_n_filters: int = 32
    location_kernel_size: int = 31
    windowed_attention_range: int = 0     # 0 disables windowing
    windowed_att_pos_learned: bool = True
    windowed_att_pos_offset: float = 0.0
    learn_temperature: bool = False
    use_pallas: bool = False              # fused TPU kernel (no learned temp)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.query_layer = nn.Dense(self.attention_dim, use_bias=False,
                                    dtype=self.dtype, name="query_layer")
        self.memory_layer = nn.Dense(self.attention_dim, use_bias=False,
                                     dtype=self.dtype, name="memory_layer")
        self.location_conv = nn.Conv(
            self.location_n_filters, (self.location_kernel_size,),
            padding="SAME", use_bias=False, dtype=self.dtype,
            name="location_conv")
        self.location_dense = nn.Dense(self.attention_dim, use_bias=False,
                                       dtype=self.dtype, name="location_dense")
        self.v = nn.Dense(1, use_bias=False, dtype=self.dtype, name="v")
        if self.windowed_att_pos_learned:
            self.pos_offset = self.param(
                "window_offset", nn.initializers.zeros, (1,), jnp.float32)
        if self.windowed_attention_range > 0:
            # learned position smoothing: new = sigmoid(p)*old +
            # (1-sigmoid(p))*expected; init 0 -> 0.5/0.5 (reference
            # exp_smoothing_factor, model.py:399-400,735-737)
            self.exp_smoothing_factor = self.param(
                "exp_smoothing_factor", nn.initializers.zeros, (1,),
                jnp.float32)
        if self.learn_temperature:
            self.inv_temperature = self.param(
                "inv_temperature", nn.initializers.ones, (1,), jnp.float32)

    def precompute(self, memory: jnp.ndarray,
                   memory_lengths: jnp.ndarray) -> Dict[str, Any]:
        T_enc = memory.shape[1]
        return {
            "processed_memory": self.memory_layer(memory),  # [B, T, A]
            "mask": jnp.arange(T_enc)[None, :] < memory_lengths[:, None],
            "lengths": memory_lengths,
        }

    def init_state(self, batch: int, t_enc: int) -> AttentionState:
        return AttentionState(
            weights=_init_weights(batch, t_enc),
            weights_cum=jnp.zeros((batch, t_enc), jnp.float32),
            position=jnp.zeros((batch,), jnp.float32),
            mu=jnp.zeros((batch, 1), jnp.float32),
        )

    def _window_mask(self, position: jnp.ndarray, lengths: jnp.ndarray,
                     t_enc: int) -> jnp.ndarray:
        """Reference window semantics (model.py:131-146): offset the
        tracked position, clamp it into [range, len-1-range], then mask
        to the INCLUSIVE [round(pos-range), +2*range] index window."""
        r = float(self.windowed_attention_range)
        pos = position
        if self.windowed_att_pos_learned:
            pos = pos + self.pos_offset[0]
        elif self.windowed_att_pos_offset:
            pos = pos + self.windowed_att_pos_offset
        max_end = lengths.astype(jnp.float32) - 1.0 - r
        pos = jnp.minimum(jnp.maximum(pos, r), max_end)
        start = jnp.round(jnp.maximum(pos - r, 0.0))[:, None]    # [B, 1]
        end = start + 2.0 * r
        idx = jnp.arange(t_enc, dtype=jnp.float32)[None, :]
        return (idx >= start) & (idx <= end)

    def _smooth_position(self, old: jnp.ndarray,
                         expected: jnp.ndarray) -> jnp.ndarray:
        if self.windowed_attention_range > 0:
            s = jax.nn.sigmoid(self.exp_smoothing_factor[0])
            return old * s + expected * (1.0 - s)
        return expected

    def __call__(self, query: jnp.ndarray, memory: jnp.ndarray,
                 const: Dict[str, Any], state: AttentionState,
                 cum_weight_scaler: float | jnp.ndarray = 1.0):
        """query [B, rnn_dim]; memory [B, T_enc, D] -> (context, weights, state)."""
        processed_memory, mask = const["processed_memory"], const["mask"]
        B, T_enc = state.weights.shape

        processed_query = self.query_layer(query)[:, None, :]     # [B, 1, A]
        loc_feats = jnp.stack(
            [state.weights, state.weights_cum * cum_weight_scaler], axis=-1
        ).astype(self.dtype)                                       # [B, T, 2]
        processed_loc = self.location_dense(self.location_conv(loc_feats))

        if self.use_pallas and not self.learn_temperature \
                and not self.is_initializing():
            # single fused VMEM pass: energies + window/length mask +
            # softmax + context (ops/pallas_kernels.py)
            from .pallas_kernels import fused_attention
            full_mask = mask
            if self.windowed_attention_range > 0:
                full_mask = mask & self._window_mask(
                    state.position, const["lengths"], T_enc)
            v_vec = self.v.variables["params"]["kernel"][:, 0]
            context, weights = fused_attention(
                processed_query[:, 0].astype(jnp.float32),
                processed_loc.astype(jnp.float32),
                processed_memory.astype(jnp.float32),
                v_vec.astype(jnp.float32),
                memory.astype(jnp.float32), full_mask)
            context = context.astype(memory.dtype)
            expected_pos = jnp.sum(
                weights * jnp.arange(T_enc, dtype=jnp.float32)[None, :],
                axis=-1)
            new_state = AttentionState(
                weights=weights,
                weights_cum=state.weights_cum + weights,
                position=self._smooth_position(state.position, expected_pos),
                mu=state.mu)
            return context, weights, new_state

        energies = self.v(jnp.tanh(
            processed_query + processed_loc + processed_memory
        ))[..., 0].astype(jnp.float32)                             # [B, T]

        if self.learn_temperature:
            energies = energies * jax.nn.softplus(self.inv_temperature)

        fill = _score_mask_value(jnp.float32)
        energies = jnp.where(mask, energies, fill)
        if self.windowed_attention_range > 0:
            in_window = self._window_mask(state.position, const["lengths"],
                                          T_enc)
            energies = jnp.where(in_window, energies, fill)

        weights = jax.nn.softmax(energies, axis=-1)
        context = jnp.einsum("bt,btd->bd", weights.astype(memory.dtype), memory)
        expected_pos = jnp.sum(
            weights * jnp.arange(T_enc, dtype=jnp.float32)[None, :], axis=-1)
        # exp-smoothed position track (reference model.py:735-737)
        new_pos = self._smooth_position(state.position, expected_pos)
        new_state = AttentionState(
            weights=weights,
            weights_cum=state.weights_cum + weights,
            position=new_pos,
            mu=state.mu,
        )
        return context, weights, new_state


class GMMAttention(nn.Module):
    """Monotonic mixture-of-gaussians attention — the reference's exact
    "erf window" formulation (utils/model/layers.py:149-246, active
    branch :210-216): the query predicts per-mixture (w, delta, scale);
    the location only moves FORWARD (loc += sigmoid(delta) [+offset]);
    each mixture contributes the probability mass an erf-CDF window of
    width 1 places on every encoder index; sigmoid mixture weights; a
    final softmax over encoder positions. Parity-tested with converted
    weights in tests/test_reference_parity.py.
    """
    n_mixtures: int = 5
    attention_dim: int = 128
    delta_min: float = 0.0
    delta_offset: float = 0.0
    attention_layers: int = 1      # reference hparams.py:262
    lin_bias: bool = False         # reference hparams.py:265
    normalize_attention_input: bool = True   # hparams.py:267
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.f = nn.Dense(self.attention_dim, dtype=self.dtype, name="F")
        if self.attention_layers == 2:
            self.f2 = nn.Dense(self.attention_dim, use_bias=False,
                               dtype=self.dtype, name="F2")
        self.lin = nn.Dense(3 * self.n_mixtures, use_bias=self.lin_bias,
                            dtype=self.dtype, name="lin")

    def precompute(self, memory: jnp.ndarray,
                   memory_lengths: jnp.ndarray) -> Dict[str, Any]:
        T_enc = memory.shape[1]
        return {"mask": jnp.arange(T_enc)[None, :] < memory_lengths[:, None]}

    def init_state(self, batch: int, t_enc: int) -> AttentionState:
        return AttentionState(
            weights=_init_weights(batch, t_enc),
            weights_cum=jnp.zeros((batch, t_enc), jnp.float32),
            position=jnp.zeros((batch,), jnp.float32),
            mu=jnp.zeros((batch, self.n_mixtures), jnp.float32),
        )

    def __call__(self, query: jnp.ndarray, memory: jnp.ndarray,
                 const: Dict[str, Any], state: AttentionState,
                 cum_weight_scaler: float | jnp.ndarray = 1.0):
        del cum_weight_scaler
        mask = const["mask"]
        B, T_enc = state.weights.shape

        q = query
        if self.normalize_attention_input:
            q = jnp.tanh(q)
        h = self.f(q)
        if self.attention_layers == 2:
            h = self.f2(h)
        p = self.lin(jnp.tanh(h)).astype(jnp.float32)             # [B, 3K]
        w_hat, delta_hat, scale_hat = jnp.split(p, 3, axis=-1)
        delta = jax.nn.sigmoid(delta_hat)
        if self.delta_min:
            delta = jnp.maximum(delta, self.delta_min)
        if self.delta_offset:
            delta = delta + self.delta_offset
        loc = state.mu + delta                                    # [B, K]
        scale = jax.nn.sigmoid(scale_hat) * 2.0 + 1.0             # [B, K]
        w = jax.nn.sigmoid(w_hat)

        pos = jnp.arange(T_enc, dtype=jnp.float32)[None, :, None]  # [1,T,1]
        d = loc[:, None, :] - pos                                  # [B,T,K]
        z = 0.5 * (jax.lax.erf((d + 0.5) * scale[:, None, :])
                   - jax.lax.erf((d - 0.5) * scale[:, None, :]))
        energies = jnp.einsum("btk,bk->bt", z, w)
        energies = jnp.where(mask, energies, 0.0)   # score_mask_value=0
        weights = jax.nn.softmax(energies, axis=-1)

        context = jnp.einsum("bt,btd->bd", weights.astype(memory.dtype), memory)
        expected_pos = jnp.sum(
            weights * jnp.arange(T_enc, dtype=jnp.float32)[None, :], axis=-1)
        new_state = AttentionState(
            weights=weights,
            weights_cum=state.weights_cum + weights,
            position=expected_pos,
            mu=loc,
        )
        return context, weights, new_state


def _beta_binomial_prior(length: int, alpha: float, beta: float) -> np.ndarray:
    """Beta-binomial prior filter taps for DCA (host-side, static)."""
    from math import lgamma

    def log_beta(a, b):
        return lgamma(a) + lgamma(b) - lgamma(a + b)

    n = length - 1
    taps = []
    for k in range(length):
        log_comb = lgamma(n + 1) - lgamma(k + 1) - lgamma(n - k + 1)
        taps.append(np.exp(
            log_comb + log_beta(k + alpha, n - k + beta) - log_beta(alpha, beta)
        ))
    return np.asarray(taps, np.float32)


class DynamicConvolutionAttention(nn.Module):
    """DCA: location-only attention with dynamic + static conv filters.

    Energies = v·tanh(W_s(static conv) + W_d(dynamic conv)) + prior,
    where dynamic filters are generated from the query each step and the
    prior is a beta-binomial "move forward ~1 token/step" filter.
    Reference: utils/model/layers.py:6-146.

    DELIBERATE DEVIATION: the reference's DCA is a self-described "first
    attempt" whose active branch replaces the dynamic convolution with
    ``prev_att.repeat(1,1,L) @ filt`` (layers.py:70-72) — all L columns
    are identical, so it degenerates to prev_att * sum_k(filt), a scalar
    gate, and the prior filter is disabled (`if False`, :110). This class
    implements the actual Battenberg et al. DCA the reference cites, so
    no weight-mapped parity test exists for it (unlike LSA/GMM).
    """
    attention_dim: int = 128
    static_channels: int = 8
    static_kernel_size: int = 21
    dynamic_channels: int = 8
    dynamic_kernel_size: int = 21
    prior_length: int = 11
    alpha: float = 0.1
    beta: float = 0.9
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.dynamic_fc = nn.Dense(
            self.dynamic_channels * self.dynamic_kernel_size,
            dtype=self.dtype, name="dynamic_fc")
        self.static_conv = nn.Conv(
            self.static_channels, (self.static_kernel_size,), padding="SAME",
            use_bias=False, dtype=self.dtype, name="static_conv")
        self.w_s = nn.Dense(self.attention_dim, use_bias=False,
                            dtype=self.dtype, name="W_static")
        self.w_d = nn.Dense(self.attention_dim, dtype=self.dtype,
                            name="W_dynamic")
        self.v = nn.Dense(1, use_bias=False, dtype=self.dtype, name="v")
        prior = _beta_binomial_prior(self.prior_length, self.alpha, self.beta)
        self.prior_filter = jnp.asarray(prior[::-1].copy())

    def precompute(self, memory: jnp.ndarray,
                   memory_lengths: jnp.ndarray) -> Dict[str, Any]:
        T_enc = memory.shape[1]
        return {"mask": jnp.arange(T_enc)[None, :] < memory_lengths[:, None]}

    def init_state(self, batch: int, t_enc: int) -> AttentionState:
        return AttentionState(
            # DCA seeds the first token (reference model.py:583-588)
            weights=_init_weights(batch, t_enc, first_token=True),
            weights_cum=jnp.zeros((batch, t_enc), jnp.float32),
            position=jnp.zeros((batch,), jnp.float32),
            mu=jnp.zeros((batch, 1), jnp.float32),
        )

    def __call__(self, query: jnp.ndarray, memory: jnp.ndarray,
                 const: Dict[str, Any], state: AttentionState,
                 cum_weight_scaler: float | jnp.ndarray = 1.0):
        del cum_weight_scaler
        mask = const["mask"]
        B, T_enc = state.weights.shape
        prev = state.weights.astype(self.dtype)

        # prior: causal conv of prev weights with beta-binomial taps
        L = self.prior_length
        prior_in = jnp.pad(prev, ((0, 0), (L - 1, 0)))[:, :, None]
        prior = jax.lax.conv_general_dilated(
            prior_in, self.prior_filter[:, None, None],
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))[..., 0]
        prior_energy = jnp.log(jnp.clip(prior.astype(jnp.float32), 1e-6, None))

        # static filters
        static = self.static_conv(prev[:, :, None])               # [B, T, Cs]

        # dynamic filters from the query — per-batch depthwise conv, done as
        # a patch-gather matmul (MXU-friendly; no per-sample conv loop)
        filt = self.dynamic_fc(jnp.tanh(query))                   # [B, Cd*K]
        filt = filt.reshape(B, self.dynamic_kernel_size, self.dynamic_channels)
        K = self.dynamic_kernel_size
        pad = K // 2
        padded = jnp.pad(prev, ((0, 0), (pad, pad)))
        idx = (np.arange(T_enc)[:, None] + np.arange(K)[None, :])
        patches = padded[:, idx]                                  # [B, T, K]
        dynamic = jnp.einsum("btk,bkc->btc", patches, filt)       # [B, T, Cd]

        energies = self.v(jnp.tanh(
            self.w_s(static) + self.w_d(dynamic)
        ))[..., 0].astype(jnp.float32) + prior_energy             # [B, T]
        energies = jnp.where(mask, energies, _score_mask_value(jnp.float32))

        weights = jax.nn.softmax(energies, axis=-1)
        context = jnp.einsum("bt,btd->bd", weights.astype(memory.dtype), memory)
        expected_pos = jnp.sum(
            weights * jnp.arange(T_enc, dtype=jnp.float32)[None, :], axis=-1)
        new_state = AttentionState(
            weights=weights,
            weights_cum=state.weights_cum + weights,
            position=expected_pos,
            mu=state.mu,
        )
        return context, weights, new_state


ATTENTION_TYPES = {
    0: LocationSensitiveAttention,
    1: GMMAttention,
    2: DynamicConvolutionAttention,
}
