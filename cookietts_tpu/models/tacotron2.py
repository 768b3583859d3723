"""Tacotron2 — AR attention text-to-mel, TPU-first.

Capability rebuild of CookieTTS/_2_ttm/tacotron2_tm/model.py (the flagship
model served by _5_infer), redesigned around XLA's compilation model:

- The decoder frame loop is a single ``lax.scan`` (via ``nn.scan``) over a
  small carry struct — the reference's Python ``while`` loop
  (model.py:829-844) becomes one compiled program; all per-utterance
  projections (memory layer, attention memory processing) are hoisted out
  of the loop and ride the scan as broadcast constants.
- Per-step teacher-forcing randomness (model.py:830-833) is pre-drawn as a
  [T] bernoulli mask in the scan xs.
- Inference runs the same scanned cell for ``max_decoder_steps`` with a
  carried ``finished`` mask; gate threshold + gate_delay produce output
  lengths (model.py:879-908 semantics, static shapes).
- Prenet dropout is ALWAYS on, including inference (reference model.py:190
  intentionally sets training=True) — per-step rng keys ride the scan xs.
- Layout is time-major: mels are [B, T, n_mel].

Default dimensions mirror tacotron2_tm/hparams.py:160-279 (1280-d
attention RNN, 768-d decoder RNN + 768-d second decoder RNN w/ residual,
192-d attention, windowed range 16 w/ learned offset, 512-d memory
bottleneck, speaker-embed 64 concat before encoder convs).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import ATTENTION_TYPES, AttentionState
from ..ops.lstm import ZoneoutLSTMCell
from ..ops.masking import dropout_frame, get_first_over_thresh, get_mask_from_lengths
from .emotionnet import AuxEmotionNet, EmotionNet, EmotionNetConfig
from .gst import GST, GSTConfig
from .sylpsnet import SylpsNet


@dataclasses.dataclass(frozen=True)
class Tacotron2Config:
    # symbols / speakers
    n_symbols: int = 256
    symbols_embedding_dim: int = 512
    n_speakers: int = 512
    speaker_embedding_dim: int = 256
    # mel
    n_mel_channels: int = 80
    n_frames_per_step: int = 1
    # encoder (hparams.py:175-181)
    encoder_speaker_embed_dim: int = 64
    encoder_concat_speaker_embed: str = "before_conv"  # or "before_lstm"
    encoder_kernel_size: int = 5
    encoder_n_convolutions: int = 3
    encoder_conv_hidden_dim: int = 512
    encoder_lstm_dim: int = 1024          # total (both directions)
    encoder_conv_dropout: float = 0.5
    # sylpsnet
    sylpsnet_layer_dims: Tuple[int, ...] = (32, 32)
    # torchmoji conditioning (hparams.py:189-192)
    torchmoji_dim: int = 2304
    torchmoji_crushed_dim: int = 32
    torchmoji_batchnorm: bool = True
    # memory bottleneck (hparams.py:199-203)
    use_memory_bottleneck: bool = True
    memory_bottleneck_dim: int = 512
    memory_bottleneck_bias: bool = False
    # prenet (hparams.py:213-219)
    prenet_dim: int = 256
    prenet_layers: int = 2
    p_prenet_dropout: float = 0.5
    # attention rnn (hparams.py:228-232)
    attention_rnn_dim: int = 1280
    p_attrnn_dropout: float = 0.10
    attrnn_zoneout: float = 0.0           # dropout type 'dropout' by default
    attrnn_extra_decoder_input: bool = True
    # decoder rnn (hparams.py:234-241)
    decoder_rnn_dim: int = 768
    p_decrnn_dropout: float = 0.25
    decrnn_zoneout: float = 0.0
    decoder_residual_connection: bool = False
    second_decoder_rnn_dim: int = 768     # 0 disables
    second_decoder_residual_connection: bool = True
    # attention (hparams.py:243-274)
    attention_type: int = 0
    attention_dim: int = 192
    windowed_attention_range: int = 16
    windowed_att_pos_offset: float = 1.25
    windowed_att_pos_learned: bool = True
    attention_learned_temperature: bool = False
    attention_location_n_filters: int = 32
    attention_location_kernel_size: int = 31
    use_pallas_attention: bool = False   # fused TPU attention-step kernel
    use_pallas_lstm: bool = False        # fused TPU LSTM decode-cell kernel
    num_att_mixtures: int = 1
    delta_offset: float = 0.005
    delta_min_limit: float = 0.0
    dynamic_filter_num: int = 128
    dynamic_filter_len: int = 21
    # postnet (hparams.py:276-281)
    use_postnet: bool = True
    postnet_embedding_dim: int = 512
    postnet_kernel_size: int = 5
    postnet_n_convolutions: int = 6
    postnet_residual_connections: int = 3
    # ssvae heads (tacotron2_ssvae: TPGST + EmotionNet/AuxEmotionNet)
    use_gst: bool = False
    gst_token_num: int = 10
    gst_token_embedding_size: int = 256
    gst_num_heads: int = 8
    gst_att_dim: int = 128
    gst_ref_enc_filters: Tuple[int, ...] = (32, 32, 64, 64, 128, 128)
    use_emotionnet: bool = False
    n_emotion_classes: int = 16          # hparams.py:186
    emotionnet_latent_dim: int = 32
    # inference (hparams.py:155-157)
    gate_threshold: float = 0.5
    gate_delay: int = 10
    max_decoder_steps: int = 3000
    # precision
    dtype: Any = jnp.float32


class Prenet(nn.Module):
    """2x(Dense+ReLU+always-on dropout 0.5). Reference model.py:164-193."""
    cfg: Tacotron2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        cfg = self.cfg
        for i in range(cfg.prenet_layers):
            # bias-free like the reference (model.py:169-170)
            x = nn.Dense(cfg.prenet_dim, use_bias=False, dtype=cfg.dtype,
                         name=f"fc{i}")(x)
            x = nn.relu(x)
            key, sub = jax.random.split(key)
            keep = jax.random.bernoulli(sub, 1.0 - cfg.p_prenet_dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - cfg.p_prenet_dropout), 0.0)
        return x


class Postnet(nn.Module):
    """Residual-accumulating conv stack. Returns the REFINED MEL (not a
    correction): "output layers" (every ``postnet_residual_connections``-th
    conv, incl. i=0, and the last) project to mel channels and add into a
    running ``x_orig``; the layers between run
    conv+BN+tanh+dropout at ``postnet_embedding_dim``.

    Exact rebuild of reference model.py:196-228 (parity-tested with
    converted weights in tests/test_reference_parity.py).
    """
    cfg: Tacotron2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        n = cfg.postnet_n_convolutions
        b_res = cfg.postnet_residual_connections
        x_orig = x
        h = x
        for i in range(n):
            is_output = (bool(b_res) and i % b_res == 0) or i == n - 1
            out_ch = (cfg.n_mel_channels if is_output
                      else cfg.postnet_embedding_dim)
            y = nn.Conv(out_ch, (cfg.postnet_kernel_size,), padding="SAME",
                        dtype=cfg.dtype, name=f"conv{i}")(h)
            if is_output:
                x_orig = x_orig + y
                h = x_orig
            else:
                y = nn.BatchNorm(use_running_average=deterministic,
                                 dtype=cfg.dtype, name=f"bn{i}")(y)
                h = nn.Dropout(0.5, deterministic=deterministic)(
                    jnp.tanh(y))
        return x_orig


class Encoder(nn.Module):
    """Conv stack + BiLSTM encoder with speaker-embed concat and sylps head.

    Reference model.py:231-316.
    """
    cfg: Tacotron2Config

    @nn.compact
    def __call__(self, embedded: jnp.ndarray, text_lengths: jnp.ndarray,
                 encoder_speaker_embed: Optional[jnp.ndarray],
                 deterministic: bool = True):
        cfg = self.cfg
        B, T, _ = embedded.shape
        mask = get_mask_from_lengths(text_lengths, T)[:, :, None]

        x = embedded
        if (encoder_speaker_embed is not None
                and cfg.encoder_concat_speaker_embed == "before_conv"):
            spk = jnp.broadcast_to(
                encoder_speaker_embed[:, None, :],
                (B, T, cfg.encoder_speaker_embed_dim))
            x = jnp.concatenate([x, spk], axis=-1)

        for i in range(cfg.encoder_n_convolutions):
            # the LAST conv widens to the LSTM input dim (reference
            # model.py:258-265: output_dim = encoder_LSTM_dim, minus the
            # speaker embed when it concats before the LSTM)
            if i == cfg.encoder_n_convolutions - 1:
                out_dim = cfg.encoder_lstm_dim
                if cfg.encoder_concat_speaker_embed == "before_lstm":
                    out_dim -= cfg.encoder_speaker_embed_dim
            else:
                out_dim = cfg.encoder_conv_hidden_dim
            x = nn.Conv(out_dim,
                        (cfg.encoder_kernel_size,), padding="SAME",
                        dtype=cfg.dtype, name=f"conv{i}")(x * mask)
            x = nn.BatchNorm(use_running_average=deterministic,
                             dtype=cfg.dtype, name=f"bn{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
            x = nn.Dropout(cfg.encoder_conv_dropout,
                           deterministic=deterministic)(x)

        if (encoder_speaker_embed is not None
                and cfg.encoder_concat_speaker_embed == "before_lstm"):
            spk = jnp.broadcast_to(
                encoder_speaker_embed[:, None, :],
                (B, T, cfg.encoder_speaker_embed_dim))
            x = jnp.concatenate([x, spk], axis=-1)
        x = x * mask

        half = cfg.encoder_lstm_dim // 2
        fwd = nn.RNN(nn.OptimizedLSTMCell(half), name="lstm_fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(half), reverse=True,
                     keep_order=True, name="lstm_bwd")
        out_f = fwd(x, seq_lengths=text_lengths)
        out_b = bwd(x, seq_lengths=text_lengths)
        outputs = jnp.concatenate([out_f, out_b], axis=-1) * mask

        # sylps head: predict syllables/sec from the bi-LSTM FINAL hidden
        # states [h_fwd_final, h_bwd_final] (reference model.py:306-314 —
        # torch returns hidden_state [2, B, h] with dir 0 = forward)
        idx = jnp.maximum(text_lengths - 1, 0)
        h_fwd = out_f[jnp.arange(B), idx]          # state after last token
        h_bwd = out_b[:, 0]                        # full backward pass
        final = jnp.concatenate([h_fwd, h_bwd], axis=-1)
        pred_sylps = nn.Dense(1, dtype=cfg.dtype, name="sylps_layer")(final)
        return outputs, pred_sylps[:, 0]


class DecoderCarry(NamedTuple):
    attn_cell: Tuple[jnp.ndarray, jnp.ndarray]
    dec_cell: Tuple[jnp.ndarray, jnp.ndarray]
    dec2_cell: Tuple[jnp.ndarray, jnp.ndarray]
    attention: AttentionState
    context: jnp.ndarray       # [B, mem_dim]
    prev_output: jnp.ndarray   # [B, n_mel * r] last predicted frame
    prev_teacher: jnp.ndarray  # [B, n_mel * r] last ground-truth frame
                               # (feeds the first teacher-forced step of the
                               # next TBPTT segment; reference collate passes
                               # the prior segment's final frame,
                               # data_utils.py:881-886)
    finished: jnp.ndarray      # [B] bool (inference early-stop mask)


class DecoderCell(nn.Module):
    """One AR decode step. Reference Decoder.decode (model.py:668-767)."""
    cfg: Tacotron2Config

    def setup(self):
        cfg = self.cfg
        self.prenet = Prenet(cfg, name="prenet")
        self.attention_rnn = ZoneoutLSTMCell(
            cfg.attention_rnn_dim, zoneout=cfg.attrnn_zoneout,
            dropout=cfg.p_attrnn_dropout, dtype=cfg.dtype,
            use_pallas=cfg.use_pallas_lstm, name="attention_rnn")
        att_cls = ATTENTION_TYPES[cfg.attention_type]
        if cfg.attention_type == 0:
            self.attention = att_cls(
                attention_dim=cfg.attention_dim,
                location_n_filters=cfg.attention_location_n_filters,
                location_kernel_size=cfg.attention_location_kernel_size,
                windowed_attention_range=cfg.windowed_attention_range,
                windowed_att_pos_learned=cfg.windowed_att_pos_learned,
                windowed_att_pos_offset=cfg.windowed_att_pos_offset,
                learn_temperature=cfg.attention_learned_temperature,
                use_pallas=cfg.use_pallas_attention,
                dtype=cfg.dtype, name="attention")
        elif cfg.attention_type == 1:
            self.attention = att_cls(
                n_mixtures=cfg.num_att_mixtures,
                attention_dim=cfg.attention_dim,
                delta_min=cfg.delta_min_limit,
                delta_offset=cfg.delta_offset,
                dtype=cfg.dtype, name="attention")
        else:
            self.attention = att_cls(
                attention_dim=cfg.attention_dim,
                dynamic_channels=cfg.dynamic_filter_num,
                dynamic_kernel_size=cfg.dynamic_filter_len,
                dtype=cfg.dtype, name="attention")
        self.decoder_rnn = ZoneoutLSTMCell(
            cfg.decoder_rnn_dim, zoneout=cfg.decrnn_zoneout,
            dropout=cfg.p_decrnn_dropout, dtype=cfg.dtype,
            use_pallas=cfg.use_pallas_lstm, name="decoder_rnn")
        if cfg.second_decoder_rnn_dim > 0:
            self.second_decoder_rnn = ZoneoutLSTMCell(
                cfg.second_decoder_rnn_dim, zoneout=cfg.decrnn_zoneout,
                dropout=cfg.p_decrnn_dropout, dtype=cfg.dtype,
                use_pallas=cfg.use_pallas_lstm, name="second_decoder_rnn")
        out_dim = cfg.n_mel_channels * cfg.n_frames_per_step
        self.linear_projection = nn.Dense(out_dim, dtype=cfg.dtype,
                                          name="linear_projection")
        self.gate_layer = nn.Dense(cfg.n_frames_per_step, dtype=cfg.dtype,
                                   name="gate_layer")

    def __call__(self, carry: DecoderCarry, x: Dict[str, jnp.ndarray],
                 memory: jnp.ndarray, const: Dict[str, Any],
                 deterministic: bool):
        cfg = self.cfg
        key = x["key"]
        k_pre, k_attn, k_dec, k_dec2 = jax.random.split(key, 4)

        # pick decoder input: ground-truth prev frame if teacher-forced
        dec_input = jnp.where(x["tf"][:, None], x["teacher_frame"],
                              carry.prev_output)
        prenet_out = self.prenet(dec_input.astype(cfg.dtype), k_pre)

        attn_in = [prenet_out, carry.context]
        if cfg.attrnn_extra_decoder_input:
            attn_in.append(carry.dec_cell[1].astype(cfg.dtype))
        attn_cell, attn_h = self.attention_rnn(
            carry.attn_cell, jnp.concatenate(attn_in, axis=-1),
            key=k_attn, deterministic=deterministic)

        context, weights, attn_state = self.attention(
            attn_h, memory, const, carry.attention)

        dec_in = jnp.concatenate([attn_h, context.astype(cfg.dtype)], axis=-1)
        dec_cell, dec_h = self.decoder_rnn(
            carry.dec_cell, dec_in, key=k_dec, deterministic=deterministic)
        if cfg.decoder_residual_connection:
            dec_h = dec_h + attn_h[..., : dec_h.shape[-1]]

        if cfg.second_decoder_rnn_dim > 0:
            dec2_cell, dec2_h = self.second_decoder_rnn(
                carry.dec2_cell, dec_h, key=k_dec2,
                deterministic=deterministic)
            if cfg.second_decoder_residual_connection:
                dec2_h = dec2_h + dec_h
            final_h = dec2_h
        else:
            dec2_cell = carry.dec2_cell
            final_h = dec_h

        proj_in = jnp.concatenate([final_h, context.astype(cfg.dtype)], axis=-1)
        mel_frame = self.linear_projection(proj_in)
        # one gate logit per SUB-FRAME of the group ([B, r]; r=1 -> [B, 1])
        # — the reference sizes gate_layer by n_frames_per_step too
        # (model.py:761-765 via hparams n_frames_per_step)
        gate = self.gate_layer(proj_in).astype(jnp.float32)

        new_finished = carry.finished | (
            jax.nn.sigmoid(gate).max(axis=-1) >= cfg.gate_threshold)
        new_carry = DecoderCarry(
            attn_cell=attn_cell, dec_cell=dec_cell, dec2_cell=dec2_cell,
            attention=attn_state, context=context,
            prev_output=mel_frame, prev_teacher=carry.prev_teacher,
            finished=new_finished)
        y = {"mel_frame": mel_frame, "gate": gate, "weights": weights}
        return new_carry, y


class Decoder(nn.Module):
    """Scan-based AR decoder. Reference model.py:349-916."""
    cfg: Tacotron2Config

    def setup(self):
        self.cell = DecoderCell(self.cfg, name="cell")

    def _scan(self, carry, xs, memory, const, deterministic):
        """Scan the (bound) cell over the time axis, sharing its params."""
        scan_fn = nn.scan(
            lambda cell, c, x: cell(c, x, memory, const, deterministic),
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False, "dropout": True},
            in_axes=0, out_axes=0,
        )
        return scan_fn(self.cell, carry, xs)

    def init_carry(self, batch: int, t_enc: int, memory_dim: int,
                   dtype) -> DecoderCarry:
        cfg = self.cfg
        zeros2 = lambda d: (jnp.zeros((batch, d), jnp.float32),
                            jnp.zeros((batch, d), jnp.float32))
        return DecoderCarry(
            attn_cell=zeros2(cfg.attention_rnn_dim),
            dec_cell=zeros2(cfg.decoder_rnn_dim),
            dec2_cell=zeros2(max(cfg.second_decoder_rnn_dim, 1)),
            attention=self.cell.attention.init_state(batch, t_enc),
            context=jnp.zeros((batch, memory_dim), dtype),
            prev_output=jnp.zeros(
                (batch, cfg.n_mel_channels * cfg.n_frames_per_step), dtype),
            prev_teacher=jnp.zeros(
                (batch, cfg.n_mel_channels * cfg.n_frames_per_step), dtype),
            finished=jnp.zeros((batch,), bool),
        )

    def __call__(self, memory: jnp.ndarray, memory_lengths: jnp.ndarray,
                 mels: jnp.ndarray, key: jax.Array,
                 p_teacher_forcing: float | jnp.ndarray = 1.0,
                 teacher_force_till: int | jnp.ndarray = 0,
                 deterministic: bool = False,
                 init_carry: Optional[DecoderCarry] = None,
                 pres_prev_state: Optional[jnp.ndarray] = None):
        """Teacher-forced decode over the full (padded) target length.

        mels: [B, T_dec, n_mel] ground truth. Returns dict + final carry
        (the carry feeds the next TBPTT segment, reference
        initialize_decoder_states(preserve=...) model.py:507-608).
        ``pres_prev_state`` [B] (1.0 = this lane continues the previous
        iteration's utterance): lanes with 0 get a fresh carry even when
        ``init_carry`` is given — the per-lane ``preserve`` mask of the
        reference (model.py:507-608, collate data_utils.py:875-886).
        """
        cfg = self.cfg
        B, T_dec, _ = mels.shape
        const = self.cell.attention.precompute(memory, memory_lengths)
        fresh = self.init_carry(B, memory.shape[1], memory.shape[-1],
                                memory.dtype)
        if init_carry is None:
            carry = fresh
        elif pres_prev_state is not None:
            keep = pres_prev_state.astype(bool)                     # [B]

            def blend(c, f):
                m = keep.reshape((B,) + (1,) * (c.ndim - 1))
                return jnp.where(m, c.astype(f.dtype), f)

            carry = jax.tree_util.tree_map(blend, init_carry, fresh)
        else:
            carry = init_carry

        # frames-per-step grouping (reference hparams n_frames_per_step):
        # one decode step emits r frames, amortizing the per-step weight
        # reads that dominate small-batch decode
        r = cfg.n_frames_per_step
        M = mels.shape[-1]
        if T_dec % r:
            raise ValueError(
                f"T_dec={T_dec} must be a multiple of "
                f"n_frames_per_step={r} (pick mel buckets divisible by r)")
        steps = T_dec // r
        groups = mels.reshape(B, steps, r * M)                     # [B, S, rM]

        # teacher groups: group t-1 feeds step t; step 0 gets the GO group
        # (zeros on a fresh utterance, the prior segment's last gt frames
        # on a TBPTT continuation)
        go = carry.prev_teacher[:, None, :].astype(mels.dtype)
        teacher = jnp.concatenate([go, groups[:, :-1, :]], axis=1)

        k_tf, k_steps = jax.random.split(key)
        tf_draw = jax.random.uniform(k_tf, (steps,)) < p_teacher_forcing
        step_ids = jnp.arange(steps)
        tf = tf_draw | (step_ids < teacher_force_till)             # [S]
        tf = jnp.broadcast_to(tf[:, None], (steps, B))
        xs = {
            "teacher_frame": jnp.swapaxes(teacher, 0, 1),          # [S, B, rM]
            "tf": tf,
            "key": jax.random.split(k_steps, steps),
        }
        carry, ys = self._scan(carry, xs, memory, const, deterministic)
        carry = carry._replace(prev_teacher=groups[:, -1, :])
        mel_out = jnp.swapaxes(ys["mel_frame"], 0, 1)              # [B, S, rM]
        gate_out = jnp.swapaxes(ys["gate"], 0, 1)                  # [B, S, r]
        weights = jnp.swapaxes(ys["weights"], 0, 1)                # [B, S, Te]
        out = {
            "mel_outputs": mel_out.reshape(B, T_dec, M),
            "gate_outputs": gate_out.reshape(B, T_dec),
            # each step's attention covers its r frames
            "alignments": (weights if r == 1
                           else jnp.repeat(weights, r, axis=1)),
        }
        return out, carry

    def inference(self, memory: jnp.ndarray, memory_lengths: jnp.ndarray,
                  key: jax.Array, max_decoder_steps: Optional[int] = None,
                  early_exit: bool = False, chunk_size: int = 64,
                  gate_threshold: Optional[Any] = None,
                  gate_delay: Optional[Any] = None):
        """Free-running decode with gate stopping.

        Returns dict with mel_outputs [B, T_max, M], gate_outputs, alignments
        and mel_lengths computed from the first gate crossing + gate_delay
        (reference model.py:879-908).

        ``early_exit``: run the scan in ``chunk_size``-step pieces inside a
        ``while_loop`` that stops one chunk after every lane's gate fires —
        the TPU-native version of the reference's "stop when all gates
        fire" (model.py:897-904); short utterances then pay ~their own
        length instead of the padded step bucket. Frames within
        ``mel_lengths`` are identical to the full scan (same per-step rng
        keys); frames beyond the stopped chunk stay zero.

        ``gate_threshold`` / ``gate_delay`` override the config values for
        the mel_lengths computation as TRACED scalars, so serving can vary
        them per request without recompiling (the early-exit mask itself
        uses the compiled cfg.gate_threshold).
        """
        cfg = self.cfg
        T_req = max_decoder_steps or cfg.max_decoder_steps
        B = memory.shape[0]
        thr = cfg.gate_threshold if gate_threshold is None else gate_threshold
        delay = cfg.gate_delay if gate_delay is None else gate_delay
        const = self.cell.attention.precompute(memory, memory_lengths)
        carry = self.init_carry(B, memory.shape[1], memory.shape[-1],
                                memory.dtype)
        r = cfg.n_frames_per_step
        mel_dim = cfg.n_mel_channels * r
        S_req = -(-T_req // r)                   # decode steps (groups)

        if not early_exit:
            S_max = S_req
            xs = {
                "teacher_frame": jnp.zeros((S_max, B, mel_dim), memory.dtype),
                "tf": jnp.zeros((S_max, B), bool),
                "key": jax.random.split(key, S_max),
            }
            _, ys = self._scan(carry, xs, memory, const, True)
            mel_buf, gate_buf, w_buf = (ys["mel_frame"], ys["gate"],
                                        ys["weights"])
        else:
            assert chunk_size * r >= cfg.gate_delay, \
                "chunk_size must cover gate_delay (one extra chunk runs " \
                "after all gates fire)"
            n_chunks = -(-S_req // chunk_size)
            S_max = n_chunks * chunk_size
            keys = jax.random.split(key, S_max)
            t_enc = memory.shape[1]
            bufs0 = (
                jnp.zeros((S_max, B, mel_dim), memory.dtype),  # mel groups
                jnp.full((S_max, B, r), -1e4, jnp.float32),    # gate logits
                jnp.zeros((S_max, B, t_enc), jnp.float32),     # alignments
            )

            def cond_fn(_mdl, state):
                k, n_done = state[0], state[1]
                # run ONE extra chunk after the first all-finished chunk so
                # gate_delay frames exist past the crossing
                return (k < n_chunks) & (n_done < 2)

            def body_fn(mdl, state):
                k, n_done, c, bufs = state
                t0 = k * chunk_size
                xs = {
                    "teacher_frame": jnp.zeros((chunk_size, B, mel_dim),
                                               memory.dtype),
                    "tf": jnp.zeros((chunk_size, B), bool),
                    "key": jax.lax.dynamic_slice(
                        keys, (t0, 0), (chunk_size, keys.shape[1])),
                }
                c, ys = mdl._scan(c, xs, memory, const, True)
                mel_b, gate_b, w_b = bufs
                mel_b = jax.lax.dynamic_update_slice(
                    mel_b, ys["mel_frame"].astype(mel_b.dtype), (t0, 0, 0))
                gate_b = jax.lax.dynamic_update_slice(
                    gate_b, ys["gate"].astype(jnp.float32), (t0, 0, 0))
                w_b = jax.lax.dynamic_update_slice(
                    w_b, ys["weights"].astype(jnp.float32), (t0, 0, 0))
                n_done = jnp.where(c.finished.all(), n_done + 1,
                                   jnp.zeros_like(n_done))
                return (k + 1, n_done, c, (mel_b, gate_b, w_b))

            init = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                    carry, bufs0)
            if self.is_initializing():
                # one eager body chunk so all cell params initialize
                _, _, _, (mel_buf, gate_buf, w_buf) = body_fn(self, init)
            else:
                _, _, _, (mel_buf, gate_buf, w_buf) = nn.while_loop(
                    cond_fn, body_fn, self, init,
                    broadcast_variables=("params", "batch_stats"))

        T_max = S_max * r
        gate_frames = jnp.swapaxes(gate_buf, 0, 1).reshape(B, T_max)
        stop = get_first_over_thresh(jax.nn.sigmoid(gate_frames), thr)
        mel_lengths = jnp.minimum(stop + delay, T_max)
        weights = jnp.swapaxes(w_buf, 0, 1)                        # [B, S, Te]
        return {
            "mel_outputs": jnp.swapaxes(mel_buf, 0, 1).reshape(
                B, T_max, cfg.n_mel_channels),
            "gate_outputs": gate_frames,
            "alignments": (weights if r == 1
                           else jnp.repeat(weights, r, axis=1)),
            "mel_lengths": mel_lengths,
        }


class Tacotron2(nn.Module):
    """Top-level model. Reference model.py:919-1080."""
    cfg: Tacotron2Config

    def setup(self):
        cfg = self.cfg
        self.embedding = nn.Embed(cfg.n_symbols, cfg.symbols_embedding_dim,
                                  dtype=cfg.dtype, name="embedding")
        if cfg.encoder_speaker_embed_dim > 0:
            self.encoder_speaker_embedding = nn.Embed(
                cfg.n_speakers, cfg.encoder_speaker_embed_dim,
                dtype=cfg.dtype, name="encoder_speaker_embedding")
        self.encoder = Encoder(cfg, name="encoder")
        self.speaker_embedding = nn.Embed(
            cfg.n_speakers, cfg.speaker_embedding_dim, dtype=cfg.dtype,
            name="speaker_embedding")
        self.sylps_net = SylpsNet(cfg.sylpsnet_layer_dims, dtype=cfg.dtype,
                                  name="sylps_net")
        self.tm_linear = nn.Dense(cfg.torchmoji_crushed_dim, dtype=cfg.dtype,
                                  name="tm_linear")
        if cfg.torchmoji_batchnorm:
            self.tm_bn = nn.BatchNorm(dtype=cfg.dtype, name="tm_bn")
        if cfg.use_memory_bottleneck:
            self.memory_bottleneck = nn.Dense(
                cfg.memory_bottleneck_dim, use_bias=cfg.memory_bottleneck_bias,
                dtype=cfg.dtype, name="memory_bottleneck")
        if cfg.use_gst:
            self.gst = GST(GSTConfig(
                n_mel_channels=cfg.n_mel_channels,
                token_embedding_size=cfg.gst_token_embedding_size,
                token_num=cfg.gst_token_num, num_heads=cfg.gst_num_heads,
                gst_att_dim=cfg.gst_att_dim,
                ref_enc_filters=tuple(cfg.gst_ref_enc_filters),
                torchmoji_dim=cfg.torchmoji_dim, dtype=cfg.dtype),
                name="gst")
        if cfg.use_emotionnet:
            em_cfg = EmotionNetConfig(
                n_classes=cfg.n_emotion_classes,
                latent_dim=cfg.emotionnet_latent_dim,
                speaker_embedding_dim=cfg.speaker_embedding_dim,
                torchmoji_dim=cfg.torchmoji_dim,
                n_mel_channels=cfg.n_mel_channels, dtype=cfg.dtype)
            self.emotion_net = EmotionNet(em_cfg, name="emotion_net")
            self.aux_emotion_net = AuxEmotionNet(em_cfg,
                                                 name="aux_emotion_net")
        self.decoder = Decoder(cfg, name="decoder")
        if cfg.use_postnet:
            self.postnet = Postnet(cfg, name="postnet")

    def _build_memory(self, text: jnp.ndarray, text_lengths: jnp.ndarray,
                      speaker_id: jnp.ndarray, sylps: jnp.ndarray,
                      torchmoji_hidden: Optional[jnp.ndarray],
                      key: Optional[jax.Array], deterministic: bool,
                      ref_mel: Optional[jnp.ndarray] = None,
                      emotion_id: Optional[jnp.ndarray] = None,
                      emotion_onehot: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        B, T_txt = text.shape
        # clamp ids: under jit an out-of-range take fills NaN, which would
        # silently poison the whole decode
        text = jnp.clip(text, 0, cfg.n_symbols - 1)
        embedded = self.embedding(text)
        enc_spk = (self.encoder_speaker_embedding(speaker_id)
                   if cfg.encoder_speaker_embed_dim > 0 else None)
        encoder_outputs, pred_sylps = self.encoder(
            embedded, text_lengths, enc_spk, deterministic=deterministic)

        syl_key = None
        if key is not None:
            key, syl_key = jax.random.split(key)
        if sylps is None:
            # inference without a ground-truth rate uses the encoder's own
            # sylps prediction (reference model.py:1058 infer_auto(
            # gt_sylps or pred_sylps))
            sylps = pred_sylps
        syl_zu, syl_mu, syl_logvar = self.sylps_net(
            sylps, key=syl_key, deterministic=deterministic)

        spk = self.speaker_embedding(speaker_id)                   # [B, S]
        if torchmoji_hidden is None:
            torchmoji_hidden = jnp.zeros((B, cfg.torchmoji_dim), cfg.dtype)
        # reference order: BatchNorm the raw 2304-d torchMoji hidden,
        # THEN crush to torchMoji_crushedDim (model.py:1009-1011)
        tm = torchmoji_hidden
        if cfg.torchmoji_batchnorm:
            tm = self.tm_bn(tm, use_running_average=deterministic)
        tm = self.tm_linear(tm)

        parts = [
            encoder_outputs,
            jnp.broadcast_to(spk[:, None, :], (B, T_txt, spk.shape[-1])),
            jnp.broadcast_to(syl_zu[:, None, :].astype(cfg.dtype),
                             (B, T_txt, 1)),
            jnp.broadcast_to(tm[:, None, :], (B, T_txt, tm.shape[-1])),
        ]
        heads: Dict[str, jnp.ndarray] = {
            "pred_sylps": pred_sylps, "syl_mu": syl_mu,
            "syl_logvar": syl_logvar}

        # TPGST style conditioning (ssvae/TPGST.py): style from the
        # reference mel at training, from torchMoji text prediction
        # ("TP" path) at inference
        if cfg.use_gst:
            gst_key = None
            if key is not None:
                key, gst_key = jax.random.split(key)
            if ref_mel is not None:
                gst_out = self.gst(ref_mel, ref_mode=1, key=gst_key,
                                   deterministic=deterministic)
            else:
                gst_out = self.gst(torchmoji_hidden, ref_mode=3,
                                   key=gst_key,
                                   deterministic=deterministic)
            style = gst_out["style_embedding"]
            parts.append(jnp.broadcast_to(
                style[:, None, :], (B, T_txt, style.shape[-1])))
            heads["gst_style_tokens"] = gst_out["style_tokens"]

        # Emotion VAE conditioning (ssvae/nets/EmotionNet.py): supervised
        # where labels exist, AuxEmotionNet predicts the same latents from
        # text for inference
        if cfg.use_emotionnet:
            em_key = aux_key = None
            if key is not None:
                key, em_key, aux_key = jax.random.split(key, 3)
            aux = self.aux_emotion_net(
                torchmoji_hidden, spk, encoder_outputs, text_lengths,
                key=aux_key, deterministic=deterministic)
            heads.update({"aux_zs": aux["zs"], "aux_zu_mu": aux["zu_mu"],
                          "aux_zu_logvar": aux["zu_logvar"]})
            if ref_mel is not None:
                em = self.emotion_net(
                    ref_mel, spk, encoder_outputs, text_lengths,
                    emotion_id=emotion_id, emotion_onehot=emotion_onehot,
                    key=em_key, deterministic=deterministic)
                zs, zu = em["ss_zs"], em["zu"]
                heads.update({"em_zs": em["zs"], "em_zu_mu": em["zu_mu"],
                              "em_zu_logvar": em["zu_logvar"]})
            else:
                zs, zu = aux["zs"], aux["zu"]
            em_cond = jnp.concatenate([jnp.exp(zs), zu], axis=-1)
            parts.append(jnp.broadcast_to(
                em_cond[:, None, :].astype(cfg.dtype),
                (B, T_txt, em_cond.shape[-1])))

        memory = jnp.concatenate(parts, axis=-1)
        if cfg.use_memory_bottleneck:
            memory = self.memory_bottleneck(memory)
        return memory, heads

    def __call__(self, text: jnp.ndarray, text_lengths: jnp.ndarray,
                 mels: jnp.ndarray, mel_lengths: jnp.ndarray,
                 speaker_id: jnp.ndarray, sylps: jnp.ndarray,
                 torchmoji_hidden: Optional[jnp.ndarray] = None,
                 key: Optional[jax.Array] = None,
                 p_teacher_forcing: float | jnp.ndarray = 1.0,
                 teacher_force_till: int | jnp.ndarray = 0,
                 drop_frame_rate: float | jnp.ndarray = 0.0,
                 global_mean: Optional[jnp.ndarray] = None,
                 deterministic: bool = False,
                 init_carry: Optional[DecoderCarry] = None,
                 pres_prev_state: Optional[jnp.ndarray] = None,
                 emotion_id: Optional[jnp.ndarray] = None,
                 emotion_onehot: Optional[jnp.ndarray] = None):
        """Teacher-forced forward. Returns output dict + final decoder carry."""
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(0)
        key, k_mem, k_dfr, k_dec = jax.random.split(key, 4)

        memory, heads = self._build_memory(
            text, text_lengths, speaker_id, sylps, torchmoji_hidden,
            k_mem, deterministic,
            ref_mel=mels if (cfg.use_gst or cfg.use_emotionnet) else None,
            emotion_id=emotion_id, emotion_onehot=emotion_onehot)

        dec_target = mels
        if not deterministic and global_mean is not None:
            # drop-frame-rate: replace input frames w/ global mean
            # (reference model.py:979-985); loss targets stay untouched
            dec_target = dropout_frame(mels, global_mean, mel_lengths,
                                       drop_frame_rate, k_dfr)

        dec_out, carry = self.decoder(
            memory, text_lengths, dec_target, k_dec,
            p_teacher_forcing=p_teacher_forcing,
            teacher_force_till=teacher_force_till,
            deterministic=deterministic, init_carry=init_carry,
            pres_prev_state=pres_prev_state)

        mel_outputs = dec_out["mel_outputs"]
        if cfg.use_postnet:
            # the postnet returns the refined mel (residual accumulated
            # internally, reference model.py:218-228)
            postnet_out = self.postnet(mel_outputs,
                                       deterministic=deterministic)
        else:
            postnet_out = mel_outputs

        mask = get_mask_from_lengths(mel_lengths, mels.shape[1])[:, :, None]
        outputs = {
            "mel_outputs": mel_outputs * mask,
            "mel_outputs_postnet": postnet_out * mask,
            "gate_outputs": dec_out["gate_outputs"],
            "alignments": dec_out["alignments"],
            **heads,
        }
        return outputs, carry

    # -- chunked streaming inference (no reference equivalent) ---------------
    # The reference vocodes whole utterances (text2speech.py:658-666), so
    # time-to-first-audio is bounded below by the FULL decode + vocode.
    # These three methods expose the decoder as (prepare once, decode a
    # chunk of steps, refine with the postnet) so a host loop can overlap
    # decoding with halo-exact chunked postnet/vocoding
    # (pipeline/streaming.py:streaming_tts) and put the first audio out
    # after ONE chunk instead of the whole utterance.

    def inference_prepare(self, text: jnp.ndarray, text_lengths: jnp.ndarray,
                          speaker_id: jnp.ndarray,
                          torchmoji_hidden: Optional[jnp.ndarray] = None,
                          sylps: Optional[jnp.ndarray] = None):
        """Encode once for chunked decode: (memory, attention const,
        initial DecoderCarry). The attention precompute (memory
        projection + length mask) happens HERE, once per utterance like
        the full scan — not per decode_chunk dispatch."""
        memory, _ = self._build_memory(
            text, text_lengths, speaker_id, sylps, torchmoji_hidden,
            None, True)
        const = self.decoder.cell.attention.precompute(memory,
                                                       text_lengths)
        carry = self.decoder.init_carry(
            memory.shape[0], memory.shape[1], memory.shape[-1],
            memory.dtype)
        return memory, const, carry

    def decode_chunk(self, memory: jnp.ndarray, const,
                     carry: DecoderCarry, keys: jnp.ndarray):
        """Free-running decode of ``keys.shape[0]`` steps from ``carry``.

        ``const``: the attention precompute from :meth:`inference_prepare`.
        ``keys``: the per-step rng keys — slice a host-side
        ``jax.random.split(k_dec, S_total)`` so the chunked decode draws
        the SAME prenet-dropout randomness as the full scan (chunked mels
        are then bit-identical to ``Decoder.inference``'s).
        Returns (mel_raw [B, S*r, M], gate_logits [B, S*r],
        weights [B, S, T_enc], carry).
        """
        cfg = self.cfg
        B = memory.shape[0]
        S = keys.shape[0]
        r = cfg.n_frames_per_step
        xs = {
            "teacher_frame": jnp.zeros(
                (S, B, cfg.n_mel_channels * r), memory.dtype),
            "tf": jnp.zeros((S, B), bool),
            "key": keys,
        }
        carry, ys = self.decoder._scan(carry, xs, memory, const, True)
        mel_raw = jnp.swapaxes(ys["mel_frame"], 0, 1).reshape(
            B, S * r, cfg.n_mel_channels)
        gate = jnp.swapaxes(ys["gate"], 0, 1).reshape(B, S * r)
        weights = jnp.swapaxes(ys["weights"], 0, 1)
        return mel_raw, gate, weights, carry

    def postnet_refine(self, mel: jnp.ndarray) -> jnp.ndarray:
        """Postnet over a raw-decoder mel window (halo handling is the
        caller's: the stack's receptive-field radius is
        2 * postnet_n_convolutions frames)."""
        if not self.cfg.use_postnet:
            return mel
        return self.postnet(mel, deterministic=True)

    def inference(self, text: jnp.ndarray, text_lengths: jnp.ndarray,
                  speaker_id: jnp.ndarray,
                  torchmoji_hidden: Optional[jnp.ndarray] = None,
                  sylps: Optional[jnp.ndarray] = None,
                  key: Optional[jax.Array] = None,
                  max_decoder_steps: Optional[int] = None,
                  early_exit: bool = False, chunk_size: int = 64,
                  gate_threshold: Optional[Any] = None,
                  gate_delay: Optional[Any] = None):
        """Free-running inference. Reference model.py:1044-1080."""
        cfg = self.cfg
        if key is None:
            key = jax.random.PRNGKey(0)
        key, k_mem, k_dec = jax.random.split(key, 3)
        # sylps=None -> the encoder's predicted rate (reference
        # model.py:1058); pass an explicit [B] array to control pacing

        memory, heads = self._build_memory(
            text, text_lengths, speaker_id, sylps, torchmoji_hidden,
            None, True)
        dec_out = self.decoder.inference(
            memory, text_lengths, k_dec, max_decoder_steps=max_decoder_steps,
            early_exit=early_exit, chunk_size=chunk_size,
            gate_threshold=gate_threshold, gate_delay=gate_delay)
        mel_outputs = dec_out["mel_outputs"]
        if cfg.use_postnet:
            postnet_out = self.postnet(mel_outputs, deterministic=True)
        else:
            postnet_out = mel_outputs
        return {
            "mel_outputs": mel_outputs,
            "mel_outputs_postnet": postnet_out,
            "gate_outputs": dec_out["gate_outputs"],
            "alignments": dec_out["alignments"],
            "mel_lengths": dec_out["mel_lengths"],
            **heads,
        }
