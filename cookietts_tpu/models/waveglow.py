"""Unified WaveGlow / WaveFlow invertible flow vocoder, TPU-first.

Capability rebuild of CookieTTS/_4_mtw/waveglow/{efficient_model_ax.py,
glow_ax.py, efficient_modules.py}:

- ``channel_mixing='1x1conv'``      -> WaveGlow (Invertible1x1Conv + affine
                                       coupling over grouped channels)
- ``channel_mixing='permuteheight'``-> WaveFlow (height permutations +
                                       height-causal 2-D WN coupling)

TPU-first design decisions:
- Memory-efficient training: the reference implements custom invertible
  autograd Functions that recompute inputs from outputs in backward
  (efficient_modules.py:108-233). Here each flow is wrapped in
  ``jax.checkpoint`` — XLA rematerialization is the idiomatic equivalent
  (SURVEY.md §7 hard-parts list).
- WaveGlow inverse is closed-form and fully parallel over time — one
  batched program, MXU-heavy, ideal for TPU batch inference.
- WaveFlow inverse is autoregressive in height (8-64 steps only): a
  ``lax.scan`` over rows carrying a (kernel_h-1)-row conv queue per WN
  layer (the scan equivalent of glow_ax.py:594-602's streaming queues).
- logdet terms are accumulated in float32 regardless of compute dtype
  (reference keeps logdet fp32 under AMP, efficient_model_ax.py:266-273).

Layout is time-major: audio [B, T]; grouped audio [B, T/G, G]; WaveFlow
tensors [B, H, W]; mels [B, T_mel, n_mel].
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------------------
# gated-unit zoo (glow_ax.py:36-198). Each takes (a, b) pre-activation halves.
# ---------------------------------------------------------------------------
def _tanhshrink(x):
    return x - jnp.tanh(x)


GATED_UNITS = {
    # (a, b) are the two pre-activation halves of the WN conv output; the
    # formulas are the reference's unit spec table, glow_ax.py:36-170.
    "GTU": lambda a, b: jnp.tanh(a) * jax.nn.sigmoid(b),
    "GTRU": lambda a, b: jnp.tanh(a) * nn.relu(b),
    "GLU": lambda a, b: a * jax.nn.sigmoid(b),
    "TTU": lambda a, b: jnp.tanh(a) * jnp.tanh(b),
    "STU": lambda a, b: jnp.tanh(a) * jax.nn.selu(b),
    "GTSU": lambda a, b: _tanhshrink(a) * jax.nn.sigmoid(b),
    "SPTU": lambda a, b: jnp.tanh(a) * jax.nn.softplus(b),
    "GSIU": lambda a, b: jnp.sin(a) * jax.nn.sigmoid(b),
    # SIREN units scale the sin pre-activation by 16 outside autograd
    # (glow_ax.py:112-114 detach().mul_(16)); stop_gradient reproduces
    # the "modify without telling autograd" trick exactly
    "GSIRU": lambda a, b: jnp.sin(
        a + jax.lax.stop_gradient(15.0 * a)) * jax.nn.sigmoid(b),
    "GTSRU": lambda a, b: _tanhshrink(a) * nn.relu(b),
    "GSIRRU": lambda a, b: jnp.sin(
        a + jax.lax.stop_gradient(15.0 * a)) * nn.relu(b),
    "GSIRLRU": lambda a, b: jnp.sin(
        a + jax.lax.stop_gradient(15.0 * a)) * nn.leaky_relu(b, 0.01),
    # rrelu(0.01, 0.1) at its deterministic expectation slope (eval-mode
    # semantics of torch's randomized leaky relu)
    "GSIRRLRU": lambda a, b: jnp.sin(
        a + jax.lax.stop_gradient(15.0 * a)) * nn.leaky_relu(b, 0.055),
    "GTLRU": lambda a, b: jnp.tanh(a) * nn.leaky_relu(b, 0.01),
    "linear": lambda a, b: a,
}


@dataclasses.dataclass(frozen=True)
class WaveGlowConfig:
    n_mel_channels: int = 160
    n_flows: int = 12
    n_group: int = 8              # WaveGlow: channel groups; WaveFlow: height
    n_early_every: int = 4        # emit early z channels every k flows (0=off)
    n_early_size: int = 2
    channel_mixing: str = "1x1conv"   # '1x1conv' (WaveGlow) | 'permuteheight' (WaveFlow)
    # WN coupling net
    n_layers: int = 8
    n_channels: int = 256
    kernel_size: int = 3
    kernel_size_h: int = 3        # WaveFlow: causal height kernel
    gated_unit: str = "GTU"
    # conditioning / upsampling
    hop_length: int = 600
    upsample_strides: Tuple[int, ...] = (5, 5, 3)   # product * n_group == hop
    upsample_channels: int = 256
    cond_residual: bool = False    # shared residual cond stack (glow_ax 72-112)
    cond_layers: int = 1
    # reference-checkpoint compatibility (vanilla glow.py semantics; used
    # by convert/waveglow_torch.py so trained reference/NVIDIA WaveGlow
    # checkpoints load directly):
    # - 'single' upsampling = ONE ConvTranspose (mel->mel, kernel
    #   upsample_win_length, stride hop), cond = raw unfolded mel*n_group
    #   (glow.py:237-241,275-281)
    # - couple_transform='second' transforms audio_1 conditioned on
    #   audio_0 (glow.py:297-308); ours defaults to the mirrored choice
    upsample_mode: str = "multi"      # 'multi' | 'single'
    upsample_win_length: int = 0      # 'single' kernel size (e.g. 1024)
    couple_transform: str = "first"   # 'first' | 'second'
    # speaker conditioning (reference efficient_model_ax speaker_embed)
    n_speakers: int = 0            # 0 disables
    speaker_embed_dim: int = 32
    # inference post-processing (efficient_model_ax.py:359-388)
    iso226_deemphasis: bool = False
    sampling_rate: int = 48000
    # WaveFlow streaming inverse: matmul partial-sum row steps (3x fewer
    # FLOPs, MXU-native shapes) instead of tiny-height conv queues; both
    # modes share params and are numerically equivalent (parity-tested)
    fused_height_inverse: bool = True
    # unroll the height scan (straight-line program across rows: XLA
    # overlaps weight loads and drops loop overhead — measured ~9% on a
    # v5e at the bench config; 1 disables). Clamped to n_group.
    inverse_height_unroll: int = 8
    # fuse each inverse row step into ONE Pallas kernel (all WN layers
    # VMEM-resident per width tile; GTU only — other units fall back to
    # the matmul row step). Measured on a v5e at the bench config:
    # 68 ms -> 39 ms (73x -> 128x RT). "auto" = on when the backend is a
    # real TPU; True forces it (interpret-mode emulation off-TPU, used
    # by the parity tests); False disables.
    pallas_row_step: Any = "auto"
    pallas_row_tile: int = 1536          # width tile (multiple of 128)
    # training
    memory_efficient: bool = True  # jax.checkpoint each flow
    sigma: float = 1.0
    dtype: Any = jnp.float32


class Invertible1x1Conv(nn.Module):
    """1x1 channel-mixing conv with exact log-determinant.

    Reference glow.py:65-107 / efficient_modules.py:289-321. Weight is
    initialized to a random rotation (det = +1).
    """
    channels: int
    dtype: Any = jnp.float32

    def _init_w(self, key, shape):
        w = jax.random.normal(key, shape)
        q, _ = jnp.linalg.qr(w)
        # force det=+1 so log|det| starts at 0
        q = q.at[:, 0].set(q[:, 0] * jnp.sign(jnp.linalg.det(q)))
        return q

    @nn.compact
    def __call__(self, x: jnp.ndarray, inverse: bool = False):
        """x: [B, T, C] -> (y, logdet_per_timestep) (logdet is scalar)."""
        w = self.param("weight", self._init_w,
                       (self.channels, self.channels))
        # invertibility demands exact f32 matmuls — the default matmul
        # precision may use bf16 passes (TPU MXU / oneDNN fast math), which
        # breaks forward∘inverse ≈ id at the 1e-2 level
        hi = jax.lax.Precision.HIGHEST
        if inverse:
            w_inv = jnp.linalg.inv(w.astype(jnp.float32)).astype(x.dtype)
            return jnp.einsum("btc,cd->btd", x, w_inv, precision=hi), None
        y = jnp.einsum("btc,cd->btd", x, w.astype(x.dtype), precision=hi)
        _, logdet = jnp.linalg.slogdet(w.astype(jnp.float32))
        return y, logdet


PERMUTE_KINDS = ("reverse", "bipartize")


def permute_height_order(h: int, kind: str, flow_idx: int) -> np.ndarray:
    """Static height permutation orders (efficient_modules.py:360-403).

    'reverse' flips the height each flow; 'bipartize' alternates flipping
    the two halves to mix rows across the halves.
    """
    idx = np.arange(h)
    if kind == "reverse":
        return idx[::-1].copy()
    half = h // 2
    if flow_idx % 2 == 0:
        return np.concatenate([idx[:half][::-1], idx[half:][::-1]])
    return np.concatenate([idx[half:], idx[:half]])


class WN(nn.Module):
    """Non-causal dilated-conv WaveNet producing affine (log_s, t).

    Reference glow.py:110-222 / glow_ax.py:245-418: gated units, residual +
    skip connections, all conditioning layers fused into one conv applied
    to the (already upsampled) cond tensor.
    """
    n_in_channels: int
    n_layers: int = 8
    n_channels: int = 256
    kernel_size: int = 3
    gated_unit: str = "GTU"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        """x [B, T, C_in], cond [B, T, C_cond] -> [B, T, 2*C_in] (log_s, t)."""
        gate = GATED_UNITS[self.gated_unit]
        h = nn.Dense(self.n_channels, dtype=self.dtype, name="start")(x)
        # all cond projections in ONE matmul: [B, T, 2*ch*n_layers]
        cond_all = nn.Dense(2 * self.n_channels * self.n_layers,
                            dtype=self.dtype, name="cond_layer")(cond)
        skip_sum = jnp.zeros_like(h)
        for i in range(self.n_layers):
            dilation = 2 ** i
            acts = nn.Conv(2 * self.n_channels, (self.kernel_size,),
                           kernel_dilation=(dilation,), padding="SAME",
                           dtype=self.dtype, name=f"in_layer{i}")(h)
            c = cond_all[..., 2 * self.n_channels * i:
                         2 * self.n_channels * (i + 1)]
            acts = acts + c
            a, b = jnp.split(acts, 2, axis=-1)
            out = gate(a, b)
            if i < self.n_layers - 1:
                res_skip = nn.Conv(2 * self.n_channels, (1,),
                                   dtype=self.dtype,
                                   name=f"res_skip{i}")(out)
                res, skip = jnp.split(res_skip, 2, axis=-1)
                h = h + res
                skip_sum = skip_sum + skip
            else:
                skip = nn.Conv(self.n_channels, (1,), dtype=self.dtype,
                               name=f"res_skip{i}")(out)
                skip_sum = skip_sum + skip
        # zero-init end layer => identity flow at init (glow.py:146-150)
        out = nn.Dense(2 * self.n_in_channels, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, name="end")(skip_sum)
        return out


class WN2D(nn.Module):
    """Height-causal 2-D WaveNet for WaveFlow couplings.

    Reference glow_ax.py:421-635 (WN_2d): convs are causal in the height
    dimension (row h sees only rows < h) and SAME-padded dilated in width.
    Produces (log_s, t) for every row from the rows above it.

    Two execution modes sharing the SAME parameters:
    - ``__call__``  — parallel over all rows (training / forward).
    - ``row_step``  — one row at a time with per-layer conv queues (the
      streaming AR inverse, reference glow_ax.py:594-602). Each queue
      holds the last (kh-1) input rows of its layer, so a full inverse is
      O(H * layers * W) instead of the naive O(H^2 * layers * W).
    """
    n_layers: int = 8
    n_channels: int = 64
    kernel_size: int = 3          # width kernel
    kernel_size_h: int = 3        # height kernel (causal)
    gated_unit: str = "GTU"
    dtype: Any = jnp.float32

    def setup(self):
        self.start = nn.Conv(self.n_channels, (1, 1), dtype=self.dtype,
                             name="start")
        self.cond_layer = nn.Dense(2 * self.n_channels * self.n_layers,
                                   dtype=self.dtype, name="cond_layer")
        in_layers = []
        res_skips = []
        kh = self.kernel_size_h
        for i in range(self.n_layers):
            dilation_w = 2 ** i
            pad_w = (self.kernel_size // 2) * dilation_w
            in_layers.append(nn.Conv(
                2 * self.n_channels, (kh, self.kernel_size),
                kernel_dilation=(1, dilation_w),
                padding=((kh - 1, 0), (pad_w, pad_w)),
                dtype=self.dtype, name=f"in_layer{i}"))
            out_ch = (2 * self.n_channels if i < self.n_layers - 1
                      else self.n_channels)
            res_skips.append(nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                                     name=f"res_skip{i}"))
        self.in_layers = in_layers
        self.res_skips = res_skips
        self.end = nn.Conv(2, (1, 1), dtype=self.dtype,
                           kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros, name="end")

    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        """x [B, H, W, 1], cond [B, W, C] -> [B, H, W, 2] (log_s, t).

        Row h of the output depends only on rows < h of x (strict causality
        via one-row shift + causal padding).
        """
        gate = GATED_UNITS[self.gated_unit]
        # strict causality: shift input down one row so row h sees rows <h
        x_shift = jnp.pad(x, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :-1]
        h = self.start(x_shift)
        cond_all = self.cond_layer(cond)
        skip_sum = jnp.zeros_like(h)
        for i in range(self.n_layers):
            acts = self.in_layers[i](h)
            c = cond_all[..., 2 * self.n_channels * i:
                         2 * self.n_channels * (i + 1)]
            acts = acts + c[:, None, :, :]      # broadcast over height
            a, b = jnp.split(acts, 2, axis=-1)
            out = gate(a, b)
            rs = self.res_skips[i](out)
            if i < self.n_layers - 1:
                res, skip = jnp.split(rs, 2, axis=-1)
                h = h + res
                skip_sum = skip_sum + skip
            else:
                skip_sum = skip_sum + rs
        return self.end(skip_sum)

    # -- streaming row mode ---------------------------------------------------
    def init_queues(self, batch: int, width: int) -> jnp.ndarray:
        """[n_layers, B, kh-1, W, C] zero queues (causal zero padding)."""
        kh = self.kernel_size_h
        return jnp.zeros((self.n_layers, batch, kh - 1, width,
                          self.n_channels), self.dtype)

    def precompute_cond(self, cond: jnp.ndarray) -> jnp.ndarray:
        return self.cond_layer(cond)

    def row_step(self, queues: jnp.ndarray, x_prev_row: jnp.ndarray,
                 cond_all: jnp.ndarray):
        """One height row.

        queues [L, B, kh-1, W, C]: last kh-1 input rows per layer;
        x_prev_row [B, W, 1]: the PREVIOUS generated row (zeros for row 0,
        matching the causal one-row shift); cond_all [B, W, 2C*L].
        Returns (st_row [B, W, 2], new_queues).
        """
        gate = GATED_UNITS[self.gated_unit]
        h_row = self.start(x_prev_row[:, None])[:, 0]       # [B, W, C]
        skip_sum = jnp.zeros_like(h_row)
        new_queues = []
        for i in range(self.n_layers):
            rows = jnp.concatenate([queues[i], h_row[:, None]], axis=1)
            # the conv pads (kh-1) zero rows on top; its LAST output row
            # sees exactly our kh real rows -> the streaming row output
            acts = self.in_layers[i](rows)[:, -1]           # [B, W, 2C]
            c = cond_all[..., 2 * self.n_channels * i:
                         2 * self.n_channels * (i + 1)]
            acts = acts + c
            a, b = jnp.split(acts, 2, axis=-1)
            out = gate(a, b)
            rs = self.res_skips[i](out[:, None])[:, 0]
            new_queues.append(rows[:, 1:])                  # drop oldest
            if i < self.n_layers - 1:
                res, skip = jnp.split(rs, 2, axis=-1)
                h_row = h_row + res
                skip_sum = skip_sum + skip
            else:
                skip_sum = skip_sum + rs
        st = self.end(skip_sum[:, None])[:, 0]              # [B, W, 2]
        return st, jnp.stack(new_queues)

    # -- fused streaming row mode (MXU formulation) ---------------------------
    #
    # The queue-of-input-rows row_step above re-convolves each row kh
    # times (once per step it sits in a queue) through tiny-height XLA
    # convs — profiled at ~3% MXU utilization on the v5e (STATUS round-3
    # item 3). This mode restructures the SAME math as dense matmuls with
    # per-kernel-row partial-sum queues:
    #
    #   conv row h = Σ_j K[j] ⊛_w row_{h-(kh-1)+j}
    #
    # Each step convolves ONLY the current row against all kh kernel
    # height rows in one [W, kw*C] @ [kw*C, kh*2C] matmul (an MXU-native
    # shape) and completes the sum from the carried partials:
    #   partials[0] already holds Σ of the older rows' contributions for
    #   THIS step; partials'[j] = partials[j+1] + y_{kh-2-j}(current).
    # 3x fewer FLOPs than the queue mode and every op is a matmul.

    def _p(self, mod, name):
        return mod.variables["params"][name]

    def init_partials(self, batch: int, width: int) -> jnp.ndarray:
        """[L, kh-1, B, W, 2C] zero partial sums (causal zero padding)."""
        return jnp.zeros((self.n_layers, self.kernel_size_h - 1, batch,
                          width, 2 * self.n_channels), self.dtype)

    def row_step_fused(self, partials: jnp.ndarray, x_prev_row: jnp.ndarray,
                       cond_all: jnp.ndarray):
        """One height row, matmul formulation. Same (st, new_partials)
        semantics as :meth:`row_step`; numerically equivalent (same
        params, same math, conv expressed as patch matmul)."""
        gate = GATED_UNITS[self.gated_unit]
        C = self.n_channels
        kh, kw = self.kernel_size_h, self.kernel_size
        dt = self.dtype
        B, W, _ = x_prev_row.shape

        w_s = self._p(self.start, "kernel").reshape(1, C).astype(dt)
        b_s = self._p(self.start, "bias").astype(dt)
        h_row = x_prev_row.astype(dt) @ w_s + b_s           # [B, W, C]

        skip_sum = jnp.zeros_like(h_row)
        new_partials = []
        for i in range(self.n_layers):
            d = 2 ** i
            pad = (kw // 2) * d
            xp = jnp.pad(h_row, ((0, 0), (pad, pad), (0, 0)))
            patches = jnp.concatenate(
                [xp[:, t * d: t * d + W] for t in range(kw)], axis=-1)
            K = self._p(self.in_layers[i], "kernel")        # [kh, kw, C, 2C]
            Kmat = K.transpose(1, 2, 0, 3).reshape(
                kw * C, kh * 2 * C).astype(dt)
            y = patches @ Kmat                              # [B, W, kh*2C]
            b = self._p(self.in_layers[i], "bias").astype(dt)
            c = cond_all[..., 2 * C * i: 2 * C * (i + 1)]
            acts = y[..., (kh - 1) * 2 * C:] + b + c
            if kh > 1:
                acts = acts + partials[i, 0]
            layer_parts = []
            for j in range(kh - 1):
                contrib = y[..., (kh - 2 - j) * 2 * C: (kh - 1 - j) * 2 * C]
                layer_parts.append(
                    (partials[i, j + 1] + contrib) if j + 1 < kh - 1
                    else contrib)
            new_partials.append(jnp.stack(layer_parts)
                                if layer_parts else partials[i])
            a, g = jnp.split(acts, 2, axis=-1)
            out = gate(a, g)
            w_rs = self._p(self.res_skips[i], "kernel")
            w_rs = w_rs.reshape(w_rs.shape[-2], w_rs.shape[-1]).astype(dt)
            b_rs = self._p(self.res_skips[i], "bias").astype(dt)
            rs = out @ w_rs + b_rs
            if i < self.n_layers - 1:
                res, skip = jnp.split(rs, 2, axis=-1)
                h_row = h_row + res
                skip_sum = skip_sum + skip
            else:
                skip_sum = skip_sum + rs
        w_e = self._p(self.end, "kernel").reshape(C, 2).astype(dt)
        b_e = self._p(self.end, "bias").astype(dt)
        st = skip_sum @ w_e + b_e                           # [B, W, 2]
        return st, jnp.stack(new_partials)

    def pack_pallas_weights(self):
        """Repack this WN's params for the fused Pallas row step
        (ops/pallas_kernels.waveflow_row_step): conv kernels become
        patch-major matmul weights; the last layer's skip-only res_skip
        is zero-padded to the uniform [C, 2C] (res half is a no-op)."""
        C = self.n_channels
        kh, kw = self.kernel_size_h, self.kernel_size
        k_all, rs_w, rs_b, biases = [], [], [], []
        for i in range(self.n_layers):
            K = self._p(self.in_layers[i], "kernel")   # [kh, kw, C, 2C]
            k_all.append(K.reshape(kh * kw * C, 2 * C))
            biases.append(self._p(self.in_layers[i], "bias"))
            w = self._p(self.res_skips[i], "kernel")
            w = w.reshape(w.shape[-2], w.shape[-1])
            b = self._p(self.res_skips[i], "bias")
            if w.shape[-1] < 2 * C:                    # last layer: skip only
                w = jnp.concatenate(
                    [jnp.zeros((C, C), w.dtype), w], axis=-1)
                b = jnp.concatenate([jnp.zeros((C,), b.dtype), b])
            rs_w.append(w)
            rs_b.append(b)
        return {
            "start_w": self._p(self.start, "kernel").reshape(1, C),
            "start_b": self._p(self.start, "bias"),
            "k_all": jnp.stack(k_all),
            "in_biases": jnp.stack(biases),            # [L, 2C]
            "rs_w": jnp.stack(rs_w),
            "rs_b": jnp.stack(rs_b),
            "end_w": self._p(self.end, "kernel").reshape(C, 2),
            "end_b": self._p(self.end, "bias"),
        }


class UpsampleNet(nn.Module):
    """Multi-stage transposed-conv mel upsampler.

    Reference glow_ax.py:201-242 (TransposedUpsampleNet). Upsamples
    [B, T_mel, n_mel] to [B, T_mel * prod(strides), channels].
    """
    strides: Sequence[int]
    channels: int = 256
    out_channels: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        h = mel
        n = len(self.strides)
        for i, s in enumerate(self.strides):
            out_ch = (self.out_channels or self.channels) if i == n - 1 \
                else self.channels
            # SAME padding => output length is exactly T * stride
            h = nn.ConvTranspose(out_ch, (2 * s,), strides=(s,),
                                 padding="SAME",
                                 dtype=self.dtype, name=f"up{i}")(h)
            if i != n - 1:
                h = nn.leaky_relu(h, negative_slope=0.4)
        return h


class WaveGlow(nn.Module):
    """Unified WaveGlow/WaveFlow flow vocoder.

    Reference efficient_model_ax.py:24-408. ``forward`` maps audio->latent
    for max-likelihood training; ``inverse``/``infer`` generate audio.
    """
    cfg: WaveGlowConfig

    def setup(self):
        cfg = self.cfg
        self.waveflow = cfg.channel_mixing == "permuteheight"
        if cfg.upsample_mode == "single":
            # reference vanilla upsampler (glow.py:237-241): one wide
            # ConvTranspose at audio rate; cond is the unfolded
            # [mel * n_group] per flow-time position
            assert cfg.upsample_win_length > 0
            self.upsample_single = nn.ConvTranspose(
                cfg.n_mel_channels, (cfg.upsample_win_length,),
                strides=(cfg.hop_length,), padding="VALID",
                dtype=cfg.dtype, name="upsample_single")
        else:
            up_prod = int(np.prod(cfg.upsample_strides))
            assert up_prod * cfg.n_group == cfg.hop_length, (
                f"prod(upsample_strides)={up_prod} * n_group={cfg.n_group} "
                f"must equal hop_length={cfg.hop_length}")
            self.upsample = UpsampleNet(cfg.upsample_strides,
                                        cfg.upsample_channels,
                                        dtype=cfg.dtype, name="upsample")
        if cfg.n_speakers > 0:
            self.speaker_embed = nn.Embed(
                cfg.n_speakers, cfg.speaker_embed_dim, dtype=cfg.dtype,
                name="speaker_embed")

        n_flows = cfg.n_flows
        wns: List[nn.Module] = []
        convinvs: List[nn.Module] = []
        early: List[int] = []     # z channels split off before each flow
        halves: List[int] = []    # coupling split sizes per flow (waveglow)
        remaining = cfg.n_group
        for k in range(n_flows):
            if (not self.waveflow and cfg.n_early_every
                    and k % cfg.n_early_every == 0 and k > 0):
                remaining -= cfg.n_early_size
                early.append(cfg.n_early_size)
            else:
                early.append(0)
            if self.waveflow:
                wns.append(WN2D(cfg.n_layers, cfg.n_channels,
                                cfg.kernel_size, cfg.kernel_size_h,
                                cfg.gated_unit, dtype=cfg.dtype,
                                name=f"wn{k}"))
                halves.append(0)
            else:
                half = remaining // 2
                halves.append(half)
                wns.append(WN(remaining - half, cfg.n_layers, cfg.n_channels,
                              cfg.kernel_size, cfg.gated_unit,
                              dtype=cfg.dtype, name=f"wn{k}"))
                convinvs.append(Invertible1x1Conv(remaining, dtype=cfg.dtype,
                                                  name=f"convinv{k}"))
        self.wn = wns
        self.convinv = convinvs
        self._early = tuple(early)
        self._half = tuple(halves)
        self._n_remaining = remaining

    # -- shared ------------------------------------------------------------
    def _cond(self, mel: jnp.ndarray,
              speaker_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """[B, T_mel, M] -> [B, T/G, C] conditioning at group rate."""
        cfg = self.cfg
        if cfg.upsample_mode == "single":
            up = self.upsample_single(mel)          # [B, >=T_mel*hop, M]
            B = up.shape[0]
            t = mel.shape[1] * cfg.hop_length       # trim conv overhang to
            up = up[:, :t]                          # the audio length
            G = cfg.n_group
            # unfold: [B, T/G, G, M] -> feature index = m*G + g, matching
            # the reference's unfold/view order (glow.py:280-281)
            up = up.reshape(B, t // G, G, cfg.n_mel_channels)
            cond = jnp.swapaxes(up, 2, 3).reshape(
                B, t // G, cfg.n_mel_channels * G)
        else:
            cond = self.upsample(mel)
        if self.cfg.n_speakers > 0:
            if speaker_ids is None:
                speaker_ids = jnp.zeros((mel.shape[0],), jnp.int32)
            spk = self.speaker_embed(speaker_ids)           # [B, S]
            cond = jnp.concatenate(
                [cond, jnp.broadcast_to(
                    spk[:, None, :],
                    (cond.shape[0], cond.shape[1], spk.shape[-1]))],
                axis=-1)
        return cond

    def _squeeze(self, audio: jnp.ndarray) -> jnp.ndarray:
        """[B, T] -> WaveGlow [B, T/G, G] | WaveFlow [B, G, T/G]."""
        B, T = audio.shape
        G = self.cfg.n_group
        x = audio[:, : (T // G) * G].reshape(B, T // G, G)
        if self.waveflow:
            return jnp.swapaxes(x, 1, 2)      # [B, H=G, W=T/G]
        return x

    def _unsqueeze(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.waveflow:
            x = jnp.swapaxes(x, 1, 2)
        B, TG, G = x.shape
        return x.reshape(B, TG * G)

    # -- WaveGlow path -------------------------------------------------------
    def _forward_waveglow(self, x: jnp.ndarray, cond: jnp.ndarray):
        cfg = self.cfg
        B, TG, _ = x.shape
        log_s_sum = jnp.zeros((), jnp.float32)
        logdet_w_sum = jnp.zeros((), jnp.float32)
        early_out = []

        for k in range(cfg.n_flows):
            if self._early[k]:
                early_out.append(x[..., : self._early[k]])
                x = x[..., self._early[k]:]

            def flow(mdl, x, cond, k=k):
                y, logdet_w = mdl.convinv[k](x)
                half = mdl._half[k]
                xa, xb = y[..., :half], y[..., half:]
                if mdl.cfg.couple_transform == "second":
                    # reference order (glow.py:297-308): transform
                    # audio_1 conditioned on audio_0
                    st = mdl.wn[k](xa, cond)
                    log_s, t = jnp.split(st, 2, axis=-1)
                    xb = xb * jnp.exp(log_s) + t
                else:
                    st = mdl.wn[k](xb, cond)
                    log_s, t = jnp.split(st, 2, axis=-1)
                    xa = xa * jnp.exp(log_s) + t
                out = jnp.concatenate([xa, xb], axis=-1)
                return out, jnp.sum(log_s.astype(jnp.float32)), \
                    logdet_w.astype(jnp.float32)

            if cfg.memory_efficient:
                # rematerialize each flow in backward (the TPU equivalent
                # of the reference's recompute-from-output invertible
                # autograd, efficient_modules.py:108-233). MUST be the
                # LIFTED flax remat: jax.checkpoint around a closure over
                # bound submodules leaks tracers out of init/apply.
                flow = nn.remat(flow)
            x, ls, lw = flow(self, x, cond)
            log_s_sum = log_s_sum + ls
            logdet_w_sum = logdet_w_sum + lw * (B * TG)

        early_out.append(x)
        z = jnp.concatenate(early_out, axis=-1)
        return z, log_s_sum, logdet_w_sum

    def _pallas_layout(self, T: int):
        """(halo, Wt, Tp) width-tile layout shared by every flow's fused
        WN call at sequence length ``T``."""
        cfg = self.cfg
        L, kw = cfg.n_layers, cfg.kernel_size
        halo = -(-((kw // 2) * (2 ** L - 1)) // 128) * 128
        Wt = min(cfg.pallas_row_tile, -(-T // 128) * 128)
        n_tiles = -(-T // Wt)
        Tp = halo + n_tiles * Wt + halo
        return halo, Wt, Tp

    def _wn_st_pallas_cm(self, k: int, x_half_cm: jnp.ndarray,
                         cond_cm: jnp.ndarray, T: int, B: int,
                         halo: int, Wt: int) -> jnp.ndarray:
        """Evaluate flow k's WN (log_s, t) through the fused Pallas kernel
        (ops/pallas_kernels.waveglow_wn_forward), CHANNEL-MAJOR in and
        out: ``x_half_cm [n_in, B*Tp]`` (padded layout from
        ``_pallas_layout``), ``cond_cm [D, B*Tp]``. Returns
        ``st [2*n_half_out, B*Tp]`` (f32). Numerically equivalent to
        ``self.wn[k](x, cond)`` — parity-tested. Inference-only."""
        from ..ops.pallas_kernels import waveglow_wn_forward
        cfg = self.cfg
        L, kw, C = cfg.n_layers, cfg.kernel_size, cfg.n_channels
        p = self.wn[k].variables["params"]
        dt = cfg.dtype
        n_in = x_half_cm.shape[0]
        cin_p = -(-n_in // 16) * 16          # sublane-pad channel dims
        n_half_out = p["end"]["kernel"].shape[1] // 2
        cout_p = -(-(2 * n_half_out) // 16) * 16

        x_cm = jnp.pad(x_half_cm.astype(jnp.float32),
                       ((0, cin_p - n_in), (0, 0)))
        # cond projection (the WN's fused cond_layer Dense) + conv
        # biases, computed CHANNEL-MAJOR directly (kᵀ @ condᵀ) so no
        # [T, 2CL]-sized transpose materializes per flow
        k_cond = p["cond_layer"]["kernel"].astype(dt)     # [D, 2CL]
        cond_all_cm = k_cond.T @ cond_cm                  # [2CL, B*Tp]
        bias = (p["cond_layer"]["bias"]
                + jnp.concatenate([p[f"in_layer{i}"]["bias"]
                                   for i in range(L)])).astype(dt)
        cond_bc = (cond_all_cm + bias[:, None]).reshape(
            L, 2 * C, cond_cm.shape[1])

        start_w = jnp.pad(p["start"]["kernel"].T,
                          ((0, 0), (0, cin_p - n_in))).astype(dt)
        start_b = p["start"]["bias"].reshape(C, 1).astype(jnp.float32)
        k_all, rs_w, rs_b = [], [], []
        for i in range(L):
            K = p[f"in_layer{i}"]["kernel"]             # [kw, C, 2C]
            k_all.append(K.reshape(kw * C, 2 * C).T)
            w = p[f"res_skip{i}"]["kernel"]
            w = w.reshape(w.shape[-2], w.shape[-1]).T   # [out, C]
            b = p[f"res_skip{i}"]["bias"]
            if w.shape[0] < 2 * C:                      # last: skip only
                w = jnp.concatenate([jnp.zeros((C, C), w.dtype), w])
                b = jnp.concatenate([jnp.zeros((C,), b.dtype), b])
            rs_w.append(w)
            rs_b.append(b)
        end_w = jnp.pad(p["end"]["kernel"].T,
                        ((0, cout_p - 2 * n_half_out), (0, 0)))
        end_b = jnp.pad(p["end"]["bias"],
                        (0, cout_p - 2 * n_half_out)).reshape(cout_p, 1)

        st = waveglow_wn_forward(
            x_cm, cond_bc, start_w, start_b,
            jnp.stack(k_all).astype(dt), jnp.stack(rs_w).astype(dt),
            jnp.stack(rs_b).astype(jnp.float32), end_w.astype(dt),
            end_b.astype(jnp.float32),
            L=L, kw=kw, C=C, Wt=Wt, halo=halo, T=T, B=B)
        return st[: 2 * n_half_out]

    def _inverse_waveglow_cm(self, z: jnp.ndarray, cond: jnp.ndarray
                             ) -> jnp.ndarray:
        """Fused-WN inverse with x kept CHANNEL-MAJOR across ALL flows.

        The first fused-WN version transposed [B, T, C] -> [C, B*Tp] and
        back around every flow's kernel call and re-transposed the SAME
        cond tensor 48 times; at batch 1 those layout round-trips were a
        measurable slice of the inverse (the kernel itself is
        bandwidth-bound). Here z and cond transform ONCE on entry, the
        coupling inverse / 1x1 inverse / early-output concats all run
        channel-major ([C, B*Tp] row ops), and the result transposes
        back once at the end. The kernel masks positions outside
        [halo, halo+T) right after its start matmul, so stale values in
        the padded columns between flows are harmless; the final slice
        drops them."""
        cfg = self.cfg
        B, T, _ = z.shape
        halo, Wt, Tp = self._pallas_layout(T)
        dt = cfg.dtype

        def cm(x):                           # [B, T, C] -> [C, B*Tp]
            x = jnp.pad(x, ((0, 0), (halo, Tp - halo - T), (0, 0)))
            return x.transpose(2, 0, 1).reshape(x.shape[2], B * Tp)

        z_cm = cm(z)
        cond_cm = cm(cond.astype(dt))        # ONE cond transpose, reused
        early_sizes = [e for e in self._early if e]
        splits = np.cumsum(early_sizes).tolist()
        parts = (jnp.split(z_cm, splits, axis=0) if splits else [z_cm])
        early_parts, x = parts[:-1], parts[-1]
        hi = jax.lax.Precision.HIGHEST

        for k in reversed(range(cfg.n_flows)):
            half = self._half[k]
            xa, xb = x[:half], x[half:]
            if cfg.couple_transform == "second":
                st = self._wn_st_pallas_cm(k, xa, cond_cm, T, B, halo, Wt)
                nh = st.shape[0] // 2        # transformed-half channels
                log_s, t = st[:nh].astype(dt), st[nh:].astype(dt)
                xb = (xb - t) * jnp.exp(-log_s)
            else:
                st = self._wn_st_pallas_cm(k, xb, cond_cm, T, B, halo, Wt)
                nh = st.shape[0] // 2
                log_s, t = st[:nh].astype(dt), st[nh:].astype(dt)
                xa = (xa - t) * jnp.exp(-log_s)
            x = jnp.concatenate([xa, xb], axis=0)
            # 1x1 inverse channel-major: y = W_inv^T @ x (same contraction
            # as Invertible1x1Conv's einsum("btc,cd"), same f32 precision)
            w = self.convinv[k].variables["params"]["weight"]
            w_inv = jnp.linalg.inv(w.astype(jnp.float32)).astype(x.dtype)
            x = jax.lax.dot(w_inv.T, x, precision=hi)
            if self._early[k]:
                x = jnp.concatenate([early_parts.pop(), x], axis=0)
        return x.reshape(x.shape[0], B, Tp).transpose(1, 2, 0)[
            :, halo: halo + T]

    def _inverse_waveglow(self, z: jnp.ndarray, cond: jnp.ndarray,
                          ) -> jnp.ndarray:
        cfg = self.cfg
        use_pallas = ((cfg.pallas_row_step is True
                       or (cfg.pallas_row_step == "auto"
                           and jax.default_backend() == "tpu"))
                      and cfg.gated_unit == "GTU")
        if use_pallas:
            return self._inverse_waveglow_cm(z, cond)
        # split z back into early outputs + final remaining channels
        early_sizes = [e for e in self._early if e]
        splits = np.cumsum(early_sizes).tolist()
        parts = jnp.split(z, splits, axis=-1) if splits else [z]
        early_parts, x = parts[:-1], parts[-1]

        for k in reversed(range(cfg.n_flows)):
            half = self._half[k]
            xa, xb = x[..., :half], x[..., half:]
            if cfg.couple_transform == "second":
                st = self.wn[k](xa, cond)
                log_s, t = jnp.split(st, 2, axis=-1)
                xb = (xb - t) * jnp.exp(-log_s)
            else:
                st = self.wn[k](xb, cond)
                log_s, t = jnp.split(st, 2, axis=-1)
                xa = (xa - t) * jnp.exp(-log_s)
            x = jnp.concatenate([xa, xb], axis=-1)
            x, _ = self.convinv[k](x, inverse=True)
            if self._early[k]:
                x = jnp.concatenate([early_parts.pop(), x], axis=-1)
        return x

    # -- WaveFlow path -------------------------------------------------------
    def _forward_waveflow(self, x: jnp.ndarray, cond: jnp.ndarray):
        cfg = self.cfg
        log_s_sum = jnp.zeros((), jnp.float32)

        for k in range(cfg.n_flows):
            order = permute_height_order(cfg.n_group, "bipartize", k)
            x = x[:, order, :]

            def flow(mdl, x, cond, k=k):
                st = mdl.wn[k](x[..., None], cond)      # [B, H, W, 2]
                log_s, t = st[..., 0], st[..., 1]
                y = x * jnp.exp(log_s) + t
                return y, jnp.sum(log_s.astype(jnp.float32))

            if cfg.memory_efficient:
                # lifted remat (see _forward_waveglow): jax.checkpoint
                # over bound submodules leaks tracers out of init/apply
                flow = nn.remat(flow)
            x, ls = flow(self, x, cond)
            log_s_sum = log_s_sum + ls
        return x, log_s_sum, jnp.zeros((), jnp.float32)

    def _inverse_waveflow(self, z: jnp.ndarray, cond: jnp.ndarray
                          ) -> jnp.ndarray:
        """AR-in-height inverse: x[h] = (z[h] - t(x[<h])) / s(x[<h]).

        Streaming conv-queue implementation (the scan equivalent of the
        reference's queue tensors, glow_ax.py:594-602): a `lax.scan` over
        the H rows carries one (kh-1)-row queue per WN layer, so each flow
        costs one WN pass total instead of H.
        """
        cfg = self.cfg
        B, H, W = z.shape
        use_pallas = (cfg.pallas_row_step is True
                      or (cfg.pallas_row_step == "auto"
                          and jax.default_backend() == "tpu"))
        if (use_pallas and cfg.fused_height_inverse
                and cfg.gated_unit == "GTU"):
            return self._inverse_waveflow_pallas(z, cond)
        fused = cfg.fused_height_inverse
        for k in reversed(range(cfg.n_flows)):
            cond_all = self.wn[k].precompute_cond(cond)

            def step(mdl, carry, z_row, k=k, cond_all=cond_all):
                queues, x_prev = carry
                if fused:
                    st, queues = mdl.wn[k].row_step_fused(
                        queues, x_prev, cond_all)
                else:
                    st, queues = mdl.wn[k].row_step(queues, x_prev,
                                                    cond_all)
                log_s, t = st[..., 0], st[..., 1]
                x_row = (z_row - t) * jnp.exp(-log_s)
                # cast: with an f32 z into a bf16 model the carry dtype
                # must stay stable across scan steps
                return (queues, x_row[..., None].astype(cfg.dtype)), x_row

            init = ((self.wn[k].init_partials(B, W) if fused
                     else self.wn[k].init_queues(B, W)),
                    jnp.zeros((B, W, 1), cfg.dtype))
            scan = nn.scan(
                step,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0, out_axes=0,
                unroll=max(1, min(cfg.inverse_height_unroll, H)))
            # z rows as scan xs: [H, B, W]
            _, rows = scan(self, init, jnp.swapaxes(z, 0, 1))
            x = jnp.swapaxes(rows, 0, 1)                  # [B, H, W]
            order = permute_height_order(cfg.n_group, "bipartize", k)
            inv_order = np.argsort(order)
            z = x[:, inv_order, :]
        return z

    def _inverse_waveflow_pallas(self, z: jnp.ndarray, cond: jnp.ndarray
                                 ) -> jnp.ndarray:
        """AR-in-height inverse with ONE fused Pallas kernel per row step
        (every WN layer VMEM-resident per width tile; see
        ops/pallas_kernels.waveflow_row_step). Numerically equivalent to
        the matmul row-step path — parity-tested."""
        from ..ops.pallas_kernels import waveflow_row_step
        cfg = self.cfg
        B, H, W = z.shape
        L, kh, kw, C = (cfg.n_layers, cfg.kernel_size_h, cfg.kernel_size,
                        cfg.n_channels)
        halo = -(-((kw // 2) * (2 ** L - 1)) // 128) * 128
        # Wt >= halo: the kernel's deferred-write pipeline defers by one
        # tile, so an ext window may reach at most one center leftwards
        Wt = max(min(cfg.pallas_row_tile, -(-W // 128) * 128), halo)
        n_tiles = -(-W // Wt)
        Wp = halo + n_tiles * Wt + halo
        dt = cfg.dtype

        def padw(x, axis):
            pads = [(0, 0)] * x.ndim
            pads[axis] = (halo, Wp - halo - x.shape[axis])
            return jnp.pad(x, pads)

        z = z.astype(jnp.float32)
        for k in reversed(range(cfg.n_flows)):
            wts = self.wn[k].pack_pallas_weights()
            cond_all = self.wn[k].precompute_cond(cond)     # [B, W, 2C*L]
            # channel-major [L, 2C, B*W'] with the conv bias folded in
            cond_bc = jnp.stack(
                [cond_all[..., 2 * C * i: 2 * C * (i + 1)]
                 + wts["in_biases"][i] for i in range(L)]).astype(dt)
            cond_bc = padw(cond_bc, 2)                      # [L, B, W', 2C]
            cond_bc = cond_bc.transpose(0, 3, 1, 2).reshape(
                L, 2 * C, B * Wp)
            queues = jnp.zeros((L, kh - 1, C, B * Wp), dt)
            z_pad = padw(z[:, :, :], 2)                     # [B, H, W']

            def step(carry, z_row, wts=wts, cond_bc=cond_bc):
                queues, x_prev = carry
                # new queues alias the input IN PLACE (deferred-write
                # pipeline inside the kernel keeps cross-tile halo reads
                # hazard-free; pad columns stay zero)
                log_s, t, queues = waveflow_row_step(
                    x_prev, queues, cond_bc,
                    wts["start_w"].reshape(C, 1).astype(dt),
                    wts["start_b"].reshape(C, 1).astype(dt),
                    wts["k_all"].transpose(0, 2, 1).astype(dt),
                    wts["rs_w"].transpose(0, 2, 1).astype(dt),
                    wts["rs_b"].astype(jnp.float32),
                    wts["end_w"].T.astype(dt),
                    wts["end_b"].reshape(2, 1).astype(jnp.float32),
                    L=L, kh=kh, kw=kw, C=C, Wt=Wt, halo=halo, W=W)
                x_row = (z_row - t) * jnp.exp(-log_s)
                # keep the pad region exactly zero for the next step
                x_row = jnp.where(
                    (jnp.arange(Wp) >= halo) & (jnp.arange(Wp) < halo + W),
                    x_row, 0.0)
                # x stays f32: [1, N] packed-dtype (bf16) HBM refs break
                # mosaic's sublane tiling; the kernel casts internally
                return (queues, x_row), x_row

            init = (queues, jnp.zeros((B, Wp), jnp.float32))
            _, rows = jax.lax.scan(
                step, init, jnp.swapaxes(z_pad, 0, 1),
                unroll=max(1, min(cfg.inverse_height_unroll, H)))
            x = jnp.swapaxes(rows, 0, 1)[:, :, halo: halo + W]
            order = permute_height_order(cfg.n_group, "bipartize", k)
            z = x[:, np.argsort(order), :]
        return z.astype(cfg.dtype)

    # -- public API ----------------------------------------------------------
    def __call__(self, audio: jnp.ndarray, mel: jnp.ndarray,
                 speaker_ids: Optional[jnp.ndarray] = None):
        """Training forward: (audio [B,T], mel [B,T_mel,M]) ->
        dict(z, log_s_sum, logdet_w_sum, n_elements)."""
        cond = self._cond(mel, speaker_ids)
        x = self._squeeze(audio).astype(self.cfg.dtype)
        if self.waveflow:
            W = x.shape[2]
            cond = cond[:, :W]
            z, log_s, logdet_w = self._forward_waveflow(x, cond)
        else:
            TG = x.shape[1]
            cond = cond[:, :TG]
            z, log_s, logdet_w = self._forward_waveglow(x, cond)
        return {"z": z, "log_s_sum": log_s, "logdet_w_sum": logdet_w,
                "n_elements": np.prod(x.shape)}

    def inverse(self, z: jnp.ndarray, mel: jnp.ndarray,
                speaker_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Latent -> audio [B, T]."""
        cond = self._cond(mel, speaker_ids)
        if self.waveflow:
            cond = cond[:, : z.shape[2]]
            x = self._inverse_waveflow(z, cond)
        else:
            cond = cond[:, : z.shape[1]]
            x = self._inverse_waveglow(z, cond)
        return self._unsqueeze(x)

    def infer(self, mel: jnp.ndarray, key: jax.Array,
              sigma: Optional[float] = None,
              speaker_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Sample z ~ N(0, sigma) and invert (efficient_model_ax.py:359-388);
        optional ISO-226 equal-loudness de-emphasis on the output."""
        cfg = self.cfg
        sigma = cfg.sigma if sigma is None else sigma
        B, T_mel, _ = mel.shape
        up_prod = int(np.prod(cfg.upsample_strides))
        if self.waveflow:
            shape = (B, cfg.n_group, T_mel * up_prod)
        else:
            shape = (B, T_mel * up_prod, cfg.n_group)
        z = sigma * jax.random.normal(key, shape, cfg.dtype)
        audio = self.inverse(z, mel, speaker_ids)
        if cfg.iso226_deemphasis:
            from ..audio.iso226 import ISO226
            audio = ISO226(sampling_rate=cfg.sampling_rate).inverse(
                audio.astype(jnp.float32))
        return audio


def waveglow_loss(out: Dict[str, jnp.ndarray],
                  sigma: float = 1.0) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Per-element normalized flow NLL (efficient_loss.py:24-44):
    z^2/(2 sigma^2) - log_s_sum - logdet_w_sum, / n_elements."""
    z = out["z"].astype(jnp.float32)
    n = out["n_elements"]
    nll = (jnp.sum(z * z) / (2.0 * sigma * sigma)
           - out["log_s_sum"] - out["logdet_w_sum"]) / n
    return nll, {"loss": nll,
                 "z_mean_sq": jnp.mean(z * z),
                 "log_s_mean": out["log_s_sum"] / n,
                 "logdet_w_mean": out["logdet_w_sum"] / n}
