"""Pallas TPU kernels for the AR-decode hot path.

The reference's per-frame decode loop (tacotron2_tm/model.py:668-767) is
the RTF-critical region. Its attention step does, per frame:
    energies = v . tanh(processed_query + processed_loc + processed_memory)
    energies = mask_fill(energies); window_fill(energies)
    weights  = softmax(energies)
    context  = weights @ memory
which in stock XLA is several small HBM-bound ops. This kernel fuses the
whole step into ONE VMEM-resident pass per batch row: one read of the
[T, A] projections and the [T, D] memory, no intermediate HBM traffic.

Grid: one program per batch item. T and feature dims should be padded to
lane multiples (128) by the caller; `attention_step` handles the padding.
Falls back to pure-jnp math (identical results) off-TPU.

MEASURED (TPU v5e, full reference dims, bf16, B=32, 512-step decode):
the full decode runs 63 us/step with stock XLA vs 84 us/step with this
kernel enabled — XLA's own fusion of the attention step is already
better at these shapes (the kernel's f32 VMEM staging and per-row grid
lose to XLA's batched fused matmuls). Like the LSTM cell below, it is
kept as verified OPT-IN infrastructure (use_pallas_attention); the
decode at B=32 is ~5900x realtime either way, so serving is bound by
the vocoder, not this loop.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _interpret() -> bool:
    """Pallas must run interpreted off-TPU (the CPU test backend)."""
    return jax.default_backend() != "tpu"


def _attention_kernel(qp_ref, lp_ref, mp_ref, v_ref, mem_ref, mask_ref,
                      ctx_ref, w_ref):
    """One batch row: qp [1, 1, A]; lp/mp [1, T, A]; v [1, A];
    mem [1, T, D]; mask [1, 1, T] (1 = attendable, window included)."""
    qp = qp_ref[0]                                    # [1, A]
    h = jnp.tanh(qp + lp_ref[0] + mp_ref[0])          # [T, A]
    e = jnp.sum(h * v_ref[:], axis=1)                 # [T]
    e = jnp.where(mask_ref[0, 0, :] > 0, e, NEG)
    e = e - jnp.max(e)
    p = jnp.exp(e)
    w = p / jnp.sum(p)
    w_ref[0, 0, :] = w
    ctx_ref[0] = jax.lax.dot(w[None, :], mem_ref[0],
                             precision=jax.lax.Precision.HIGHEST,
                             preferred_element_type=jnp.float32)


def _pad_to(x: jnp.ndarray, axis: int, mult: int,
            value: float = 0.0) -> jnp.ndarray:
    n = x.shape[axis]
    target = -(-n // mult) * mult
    if target == n:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - n)
    return jnp.pad(x, pads, constant_values=value)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def attention_step(processed_query: jnp.ndarray,
                   processed_loc: jnp.ndarray,
                   processed_memory: jnp.ndarray,
                   v: jnp.ndarray,
                   memory: jnp.ndarray,
                   mask: jnp.ndarray,
                   use_pallas: bool = True
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused location-sensitive attention step.

    processed_query [B, A]; processed_loc/processed_memory [B, T, A];
    v [A]; memory [B, T, D]; mask [B, T] bool (window+length combined).
    Returns (context [B, D], weights [B, T]).
    """
    B, T, A = processed_loc.shape
    D = memory.shape[-1]

    if not use_pallas:
        e = jnp.einsum(
            "bta,a->bt",
            jnp.tanh(processed_query[:, None, :] + processed_loc
                     + processed_memory), v)
        e = jnp.where(mask, e, NEG)
        w = jax.nn.softmax(e, axis=-1)
        ctx = jnp.einsum("bt,btd->bd", w, memory)
        return ctx, w

    # pad to TPU tiles: T multiple of 8 (sublane), A/D multiple of 128
    qp = _pad_to(processed_query.astype(jnp.float32), 1, 128)
    lp = _pad_to(_pad_to(processed_loc.astype(jnp.float32), 2, 128), 1, 8)
    mp = _pad_to(_pad_to(processed_memory.astype(jnp.float32), 2, 128), 1, 8)
    vv = _pad_to(v.astype(jnp.float32)[None, :], 1, 128)
    mem = _pad_to(_pad_to(memory.astype(jnp.float32), 2, 128), 1, 8)
    msk = _pad_to(mask.astype(jnp.float32), 1, 8)
    Tp, Ap = lp.shape[1], lp.shape[2]
    Dp = mem.shape[2]

    ctx, w = pl.pallas_call(
        _attention_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, Ap), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Tp, Ap), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Tp, Ap), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Ap), lambda b: (0, 0)),
            pl.BlockSpec((1, Tp, Dp), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, Tp), lambda b: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, Dp), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, Tp), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, Tp), jnp.float32),
        ),
        interpret=_interpret(),
    )(qp[:, None, :], lp.reshape(B, Tp, Ap), mp.reshape(B, Tp, Ap), vv,
      mem.reshape(B, Tp, Dp), msk[:, None, :])
    return ctx[:, 0, :D], w[:, 0, :T]


# -- differentiable wrapper ---------------------------------------------------

def _reference_math(qp, lp, mp, v, memory, mask):
    e = jnp.einsum("bta,a->bt", jnp.tanh(qp[:, None, :] + lp + mp), v)
    e = jnp.where(mask, e, NEG)
    w = jax.nn.softmax(e, axis=-1)
    ctx = jnp.einsum("bt,btd->bd", w, memory)
    return ctx, w


@jax.custom_vjp
def fused_attention(qp, lp, mp, v, memory, mask):
    """Differentiable fused attention step: forward runs the Pallas
    kernel; backward uses the VJP of the mathematically identical jnp
    expression (outputs agree to ~1e-5, see tests/test_pallas.py)."""
    return attention_step(qp, lp, mp, v, memory, mask, use_pallas=True)


def _fused_fwd(qp, lp, mp, v, memory, mask):
    out = attention_step(qp, lp, mp, v, memory, mask, use_pallas=True)
    return out, (qp, lp, mp, v, memory, mask)


def _fused_bwd(res, g):
    qp, lp, mp, v, memory, mask = res
    _, vjp = jax.vjp(
        lambda qp, lp, mp, v, memory: _reference_math(
            qp, lp, mp, v, memory, mask),
        qp, lp, mp, v, memory)
    d_qp, d_lp, d_mp, d_v, d_mem = vjp(g)
    return d_qp, d_lp, d_mp, d_v, d_mem, None


fused_attention.defvjp(_fused_fwd, _fused_bwd)


# -- fused LSTM decode cell ----------------------------------------------------
#
# The AR decoder's LSTM gate step (reference decode,
# tacotron2_tm/model.py:668-767, "lstmcell 12.789ms" comments at :744-765)
# as one Pallas kernel: each grid program streams one H-tile of the
# [F, 4H] weight matrix, computes its gate slice on the MXU and applies
# sigmoid/tanh/state-update in-register — the [B, 4H] gate block never
# materializes in HBM.
#
# MEASURED RESULT (TPU v5e, reference attention-RNN dims F=2816 H=1280
# B=32, f32, 256-step scan): 113 us/step vs stock XLA's 54 us/step.
# The step is weight-streaming-bound (57 MB/step f32 ~= 70 us at HBM
# speed of light) and XLA already emits a single fused
# matmul+epilogue kernel with better DMA pipelining than this grid, so
# there is NO fusion headroom for a Pallas LSTM cell at these dims —
# the serving levers are bf16 weights (halves the bytes; the serving
# configs use dtype=bf16) and batching, both orthogonal to fusion.
# The kernel is kept as verified opt-in infrastructure
# (Tacotron2Config.use_pallas_lstm); the fused attention-step kernel
# above (many small HBM-bound ops -> one VMEM pass) remains the
# decode-path Pallas win.


def _lstm_kernel(xh_ref, wi_ref, wf_ref, wg_ref, wo_ref, b_ref, c_ref,
                 cn_ref, hn_ref):
    """One H-tile. xh [B, F]; w* [F, Th] — four views into the SAME
    untouched [F, 4H] Dense kernel (aliased operands, no host-side
    reorder, nothing loop-variant for XLA to rematerialize per decode
    step); b [1, 4, Th]; c [B, Th]."""
    xh = xh_ref[...]
    dot = lambda w: jax.lax.dot(xh, w[...],
                                preferred_element_type=jnp.float32)
    b = b_ref[...]
    i = jax.nn.sigmoid(dot(wi_ref) + b[0, 0])
    f = jax.nn.sigmoid(dot(wf_ref) + b[0, 1] + 1.0)   # forget bias +1
    g = jnp.tanh(dot(wg_ref) + b[0, 2])
    o = jax.nn.sigmoid(dot(wo_ref) + b[0, 3])
    c = f * c_ref[...] + i * g
    cn_ref[...] = c
    hn_ref[...] = o * jnp.tanh(c)


def _lstm_reference(xh, kernel, bias, c_prev):
    gates = (xh @ kernel + bias).astype(jnp.float32)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f + 1.0) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return c, h


def _pick_tile(H: int, F: int, budget_bytes: int = 4 * 2**20) -> int:
    """Largest 128-multiple divisor of H whose four [F, Th] f32 weight
    blocks fit the VMEM budget; 0 if H has no 128-multiple divisor."""
    cap = max((budget_bytes // (F * 4 * 4)) // 128 * 128, 128)
    best = 0
    th = 128
    while th <= min(H, cap):
        if H % th == 0:
            best = th
        th += 128
    return best


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def lstm_gates_step(xh: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                    c_prev: jnp.ndarray, use_pallas: bool = True
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused LSTM gate step: (c_new, h_new) fp32, pre-zoneout.

    xh [B, F] (x and h_prev already concatenated); kernel [F, 4H];
    bias [4H]; c_prev [B, H].
    """
    B, F = xh.shape
    H = c_prev.shape[-1]
    Th = _pick_tile(H, F)
    if not use_pallas or Th == 0 or F % 128 != 0:
        # non-tile-aligned dims (tiny test configs): identical jnp math
        return _lstm_reference(xh, kernel, bias, c_prev)

    n_tiles = H // Th
    Bp = -(-B // 8) * 8
    xh_p = _pad_to(xh.astype(jnp.float32), 0, 8)
    c_p = _pad_to(c_prev.astype(jnp.float32), 0, 8)
    kernel = kernel.astype(jnp.float32)      # [F, 4H], layout untouched
    b = bias.astype(jnp.float32).reshape(1, 4, H)

    # the [F, 4H] kernel rides in four times — same buffer, four block
    # views (gate g tile j starts at column g*H + j*Th, and H % Th == 0
    # makes that a whole block index). No copy, nothing loop-variant.
    w_spec = lambda g: pl.BlockSpec(
        (F, Th), lambda j, g=g: (0, g * n_tiles + j))
    c_new, h_new = pl.pallas_call(
        _lstm_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Bp, F), lambda j: (0, 0)),
            w_spec(0), w_spec(1), w_spec(2), w_spec(3),
            pl.BlockSpec((1, 4, Th), lambda j: (0, 0, j)),
            pl.BlockSpec((Bp, Th), lambda j: (0, j)),
        ],
        out_specs=(
            pl.BlockSpec((Bp, Th), lambda j: (0, j)),
            pl.BlockSpec((Bp, Th), lambda j: (0, j)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        ),
        interpret=_interpret(),
    )(xh_p, kernel, kernel, kernel, kernel, b, c_p)
    return c_new[:B], h_new[:B]


@jax.custom_vjp
def fused_lstm_gates(xh, kernel, bias, c_prev):
    """Differentiable fused LSTM gate step: forward runs the Pallas kernel,
    backward is the VJP of the mathematically identical jnp expression."""
    return lstm_gates_step(xh, kernel, bias, c_prev, use_pallas=True)


def _lstm_fwd(xh, kernel, bias, c_prev):
    out = lstm_gates_step(xh, kernel, bias, c_prev, use_pallas=True)
    return out, (xh, kernel, bias, c_prev)


def _lstm_bwd(res, g):
    xh, kernel, bias, c_prev = res
    _, vjp = jax.vjp(_lstm_reference, xh, kernel, bias, c_prev)
    return vjp(g)


fused_lstm_gates.defvjp(_lstm_fwd, _lstm_bwd)


# ---------------------------------------------------------------------------
# WaveFlow streaming-inverse row step: ALL WN_2d layers fused in VMEM
# ---------------------------------------------------------------------------
#
# The AR-in-height WaveFlow inverse runs H*n_flows sequential row steps;
# each step in stock XLA is ~20 HBM-bound ops (per-layer conv-as-matmul,
# gate, res/skip 1x1, queue shuffles) whose intermediates round-trip to
# HBM. This kernel computes ONE ENTIRE ROW STEP (start 1x1, all L dilated
# conv layers, gates, res/skip, end 1x1, queue updates) per width tile
# with every intermediate resident in VMEM.
#
# Formulation: input-row queues (the reference's conv-queue streaming,
# glow_ax.py:594-602) — per layer the queue holds the last kh-1 hidden
# rows; the conv over (kh rows x kw taps) is ONE [ext, kh*kw*C] @
# [kh*kw*C, 2C] matmul per layer (MXU-native). Queues at C channels
# halve the cross-step HBM state vs the partial-sum formulation.
#
# MEASURED RESULT (TPU v5e, bench config 6 flows / H=8 / 8 layers /
# 64 ch, bf16, 5 s at 48 kHz, batch 1): 39.1 ms vs 68.3 ms for the
# stock-XLA matmul row-step scan — 128x vs 73x realtime — with outputs
# BIT-IDENTICAL on-chip (and vs the interpret-mode CPU run at f32
# tolerance). Unlike the attention/LSTM cells above (where XLA's own
# fusion already wins), this step is many small HBM-bound ops whose
# intermediates round-trip ~20x per row — exactly the shape of problem
# kernel fusion exists for. Default ON for real-TPU backends via
# WaveGlowConfig.pallas_row_step="auto".
#
# Width layout: arrays are padded to W' = HALO + n_tiles*Wt + HALO where
# HALO >= sum of all dilation halos ((kw//2) * (2^L - 1)). Each tile
# loads [base, base + Wt + 2*HALO) and computes full-extent per layer;
# edge garbage propagates inward by the layer's dilation and never
# reaches the written center. A validity mask reproduces the true conv's
# zero padding at the sequence edges (queue/hidden values outside the
# real width are forced to zero so they cannot contaminate neighbors).
#
# Queue buffering: the new queues alias the queue input IN PLACE, but
# naively writing each tile's center creates a cross-tile
# read-after-write hazard — TPU grid programs run sequentially, so tile
# t's left queue halo would read tile t-1's JUST-WRITTEN next-step rows
# instead of the current-step ones (verified corrupting on-chip with a
# direct aliased call; alternatives measured slower: a fresh output
# buffer or a ping-ponged scratch buffer both cost ~25% of the whole
# inverse because XLA materializes a 32 MB queue copy per row step
# inside the unrolled height scan). The fix that keeps in-place speed
# is a DEFERRED-WRITE PIPELINE: each tile stages its queue update in
# VMEM scratch (which persists across grid steps) and writes the
# PREVIOUS tile's staged center only after its own halo reads are done;
# the last tile flushes its own center directly. No grid step ever
# reads a region a newer step has written (requires Wt >= halo so a
# tile's ext window only reaches one center leftwards — asserted).
# Pad columns are never written, so with in-place aliasing they keep
# the zeros the caller initialized (read as conv zero padding).


def _waveflow_row_kernel(L, kh, kw, C, Wt, halo, W, Wp, n_tiles, x_ref,
                         q_ref, cond_ref,
                         start_w_ref, start_b_ref, k_ref, rs_w_ref,
                         rs_b_ref, end_w_ref, end_b_ref,
                         logs_ref, t_ref, qout_ref,
                         x_s, cond_s, logs_s, t_s, stg, sem, *row_s):
    """Channel-major layout: every width-long array keeps W on the LANE
    axis ([C, W']-shaped tiles), so all DMA slices are 128-lane aligned
    and every matmul is [small, ext]-shaped with the long axis on lanes.
    row_s: kh-1 queue-in staging refs. stg [(L*(kh-1), C, Wt)] holds the
    deferred queue-center writes across grid steps (see the pipeline
    note above).
    """
    q_s = row_s[: kh - 1]
    b = pl.program_id(0)
    tile = pl.program_id(1)
    ext = Wt + 2 * halo
    base = tile * Wt                      # ext window start in W' coords
    # B is folded into the width axis; flat offset = b*Wp + pos
    off = b * Wp + base
    # validity: W' position p is a real sample iff halo <= p < halo + W
    pos = base + jax.lax.broadcasted_iota(jnp.int32, (1, ext), 1)
    valid_ext = ((pos >= halo) & (pos < halo + W))
    center = slice(halo, halo + Wt)

    def copy(src, dst):
        dma = pltpu.make_async_copy(src, dst, sem)
        dma.start()
        dma.wait()

    copy(x_ref.at[:, pl.ds(off, ext)], x_s)
    x = x_s[0]                                            # [ext]
    h = (start_w_ref[:, 0][:, None] * x[None, :]
         + start_b_ref[:, 0][:, None]).astype(q_ref.dtype)  # [C, ext]
    h = jnp.where(valid_ext, h, 0.0)
    skip = jnp.zeros((C, Wt), jnp.float32)

    def shifts(r, d):
        """kw width taps of row r [C, ext] at offsets (t - kw//2) * d."""
        half = kw // 2
        out = []
        for t in range(kw):
            offn = (t - half) * d
            if offn < 0:
                zl = jnp.zeros((C, -offn), r.dtype)
                out.append(jnp.concatenate([zl, r[:, :offn]], 1))
            elif offn > 0:
                zr = jnp.zeros((C, offn), r.dtype)
                out.append(jnp.concatenate([r[:, offn:], zr], 1))
            else:
                out.append(r)
        return out

    for i in range(L):
        d = 2 ** i
        for j in range(kh - 1):
            copy(q_ref.at[i, j, :, pl.ds(off, ext)], q_s[j])
        copy(cond_ref.at[i, :, pl.ds(off, ext)], cond_s)
        # deferred-write pipeline: this tile's halo reads of layer i are
        # done, so the PREVIOUS tile's staged center can land in the
        # in-place-aliased queue buffer without any later read seeing it
        for j in range(kh - 1):
            @pl.when(tile > 0)
            def _(i=i, j=j):
                copy(stg.at[i * (kh - 1) + j],
                     qout_ref.at[i, j, :, pl.ds(off - Wt + halo, Wt)])
        rows = [q_s[j][:] for j in range(kh - 1)] + [h]
        # queue update (h is still this layer's input row): drop the
        # oldest row, append the current one — STAGED in VMEM; the last
        # tile flushes its own center directly (no next tile to do it)
        for j in range(kh - 1):
            stg[i * (kh - 1) + j] = rows[j + 1][:, center]

            @pl.when(tile == n_tiles - 1)
            def _(i=i, j=j):
                copy(stg.at[i * (kh - 1) + j],
                     qout_ref.at[i, j, :, pl.ds(off + halo, Wt)])
        # patches: (kernel-row, width-tap, channel) blocks along dim 0 —
        # rows run oldest -> current, taps at (t - kw//2) * d
        parts = []
        for r in rows:
            parts.extend(shifts(r, d))
        patches = jnp.concatenate(parts, axis=0)       # [kh*kw*C, ext]
        acts = jax.lax.dot(
            k_ref[i], patches,
            preferred_element_type=jnp.float32)           # [2C, ext]
        acts = acts + cond_s[:].astype(jnp.float32)
        a, g = acts[:C], acts[C:]
        out = (jnp.tanh(a) * jax.nn.sigmoid(g)).astype(q_ref.dtype)
        rs = jax.lax.dot(rs_w_ref[i], out,
                         preferred_element_type=jnp.float32) \
            + rs_b_ref[i][:, None]
        h = h + rs[:C].astype(q_ref.dtype)
        h = jnp.where(valid_ext, h, 0.0)
        skip = skip + rs[C:, center]

    st = jax.lax.dot(end_w_ref[:], skip.astype(q_ref.dtype),
                     preferred_element_type=jnp.float32) \
        + end_b_ref[:, 0][:, None]                        # [2, Wt]
    logs_s[0] = st[0]
    t_s[0] = st[1]
    copy(logs_s, logs_ref.at[:, pl.ds(off + halo, Wt)])
    copy(t_s, t_ref.at[:, pl.ds(off + halo, Wt)])


@functools.partial(
    jax.jit, static_argnames=("L", "kh", "kw", "C", "Wt", "halo", "W"))
def waveflow_row_step(x_prev, queues, cond_bc, start_w,
                      start_b, k_all, rs_w, rs_b, end_w, end_b, *, L, kh,
                      kw, C, Wt, halo, W):
    """One fused WaveFlow inverse row step over padded width W'.

    CHANNEL-MAJOR layout (W' on the lane axis): x_prev [B, W'] (previous
    generated row, zero for row 0); queues [L, kh-1, C, B*W'] with ZERO
    pad columns (the kernel preserves them — they are the conv zero
    padding every ext window reads);
    cond_bc [L, 2C, B*W'] (cond + conv bias, precomputed per flow);
    k_all [L, 2C, kh*kw*C] (output-major); rs_w [L, 2C, C] (last layer
    zero-padded on the res half); start_w [C, 1]; end_w [2, C].
    Returns (log_s [B, W'], t [B, W'], new_queues). new_queues aliases
    `queues` IN PLACE (deferred-write pipeline, see the note above) —
    treat the input as consumed.

    Only the gated unit GTU is fused (the reference default); callers
    must fall back for other units.
    """
    B, Wp = x_prev.shape
    n_tiles = (Wp - 2 * halo) // Wt
    assert n_tiles * Wt + 2 * halo == Wp, (Wp, Wt, halo)
    # the deferred-write pipeline defers by exactly ONE tile, so a
    # tile's ext window may reach at most one center leftwards
    assert Wt >= halo, (Wt, halo)
    ext = Wt + 2 * halo
    dt = queues.dtype
    kernel = functools.partial(_waveflow_row_kernel, L, kh, kw, C, Wt,
                               halo, W, Wp, n_tiles)
    out_shape = [
        jax.ShapeDtypeStruct((1, B * Wp), jnp.float32),   # log_s (flat)
        jax.ShapeDtypeStruct((1, B * Wp), jnp.float32),   # t (flat)
        jax.ShapeDtypeStruct(queues.shape, queues.dtype),  # new queues
    ]
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[hbm, hbm, hbm,
                  vmem, vmem, vmem, vmem, vmem, vmem, vmem],
        out_specs=[hbm, hbm, hbm],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, ext), jnp.float32),            # x_s (f32:
            # [1, N] packed-dtype refs violate sublane tiling)
            pltpu.VMEM((2 * C, ext), dt),                 # cond_s
            pltpu.VMEM((1, Wt), jnp.float32),             # logs_s
            pltpu.VMEM((1, Wt), jnp.float32),             # t_s
            pltpu.VMEM((L * (kh - 1), C, Wt), dt),        # deferred qout
            pltpu.SemaphoreType.DMA(()),
        ] + [pltpu.VMEM((C, ext), dt) for _ in range(kh - 1)],
        # queues alias in->out (in-place update, pads keep their zeros);
        # safe ONLY because of the deferred-write pipeline in the kernel
        # — naive center writes would corrupt later tiles' halo reads
        # (TPU grid programs run sequentially; verified on-chip)
        input_output_aliases={1: 2},
        interpret=_interpret(),
    )(x_prev.reshape(1, B * Wp), queues, cond_bc,
      start_w, start_b, k_all, rs_w, rs_b, end_w, end_b)
    logs, t, new_q = out
    return logs.reshape(B, Wp), t.reshape(B, Wp), new_q


# ---------------------------------------------------------------------------
# WaveGlow inverse: fused WN forward (all layers VMEM-resident per tile)
# ---------------------------------------------------------------------------
#
# The WaveGlow inverse runs n_flows (48 at the bench config) sequential
# WN evaluations; each is ~30 HBM-bound XLA ops whose [T, 512]
# intermediates round-trip to HBM (~400 MB per flow at 5 s / 48 kHz).
# Same fusion recipe as the WaveFlow row step above, minus the
# autoregressive queues: channel-major tiles, dilated convs as patch
# matmuls, dilation halos, validity masking for the conv zero padding.
# Inference-only (the kernel has no autodiff; training keeps stock XLA).


def _waveglow_wn_kernel(L, kw, C, Cin, Cout, Wt, halo, T, Tp,
                        x_ref, cond_ref, start_w_ref, start_b_ref,
                        k_ref, rs_w_ref, rs_b_ref, end_w_ref, end_b_ref,
                        st_ref, x_s, cond_s, st_s, sem):
    b = pl.program_id(0)
    tile = pl.program_id(1)
    ext = Wt + 2 * halo
    base = tile * Wt
    off = b * Tp + base
    pos = base + jax.lax.broadcasted_iota(jnp.int32, (1, ext), 1)
    valid_ext = ((pos >= halo) & (pos < halo + T))
    center = slice(halo, halo + Wt)

    def copy(src, dst):
        dma = pltpu.make_async_copy(src, dst, sem)
        dma.start()
        dma.wait()

    copy(x_ref.at[:, pl.ds(off, ext)], x_s)
    h = jax.lax.dot(start_w_ref[:], x_s[:].astype(start_w_ref.dtype),
                    preferred_element_type=jnp.float32) \
        + start_b_ref[:, 0][:, None]
    h = jnp.where(valid_ext, h.astype(x_ref.dtype), 0.0)   # [C, ext]
    skip = jnp.zeros((C, Wt), jnp.float32)

    def shifts(r, d):
        half = kw // 2
        out = []
        for t in range(kw):
            offn = (t - half) * d
            if offn < 0:
                zl = jnp.zeros((C, -offn), r.dtype)
                out.append(jnp.concatenate([zl, r[:, :offn]], 1))
            elif offn > 0:
                zr = jnp.zeros((C, offn), r.dtype)
                out.append(jnp.concatenate([r[:, offn:], zr], 1))
            else:
                out.append(r)
        return out

    for i in range(L):
        d = 2 ** i
        copy(cond_ref.at[i, :, pl.ds(off, ext)], cond_s)
        patches = jnp.concatenate(shifts(h, d), axis=0)    # [kw*C, ext]
        acts = jax.lax.dot(k_ref[i], patches,
                           preferred_element_type=jnp.float32)
        acts = acts + cond_s[:].astype(jnp.float32)        # [2C, ext]
        a, g = acts[:C], acts[C:]
        out = (jnp.tanh(a) * jax.nn.sigmoid(g)).astype(x_ref.dtype)
        rs = jax.lax.dot(rs_w_ref[i], out,
                         preferred_element_type=jnp.float32) \
            + rs_b_ref[i][:, None]
        h = h + rs[:C].astype(x_ref.dtype)
        h = jnp.where(valid_ext, h, 0.0)
        skip = skip + rs[C:, center]

    st = jax.lax.dot(end_w_ref[:], skip.astype(x_ref.dtype),
                     preferred_element_type=jnp.float32) \
        + end_b_ref[:, 0][:, None]                         # [Cout, Wt]
    st_s[:] = st
    copy(st_s, st_ref.at[:, pl.ds(off + halo, Wt)])


@functools.partial(jax.jit, static_argnames=("L", "kw", "C", "Wt",
                                             "halo", "T", "B"))
def waveglow_wn_forward(x_cm, cond_bc, start_w, start_b, k_all, rs_w,
                        rs_b, end_w, end_b, *, L, kw, C, Wt, halo, T, B):
    """Fused WN (log_s, t) evaluation for the WaveGlow inverse.

    CHANNEL-MAJOR over padded width T' (sublane-padded channel dims):
    x_cm [Cin_p, B*T']; cond_bc [L, 2C, B*T'] (cond projection + conv
    bias, precomputed per flow); start_w [C, Cin_p]; k_all
    [L, 2C, kw*C]; rs_w [L, 2C, C] (last layer zero-padded on the res
    half); end_w [Cout_p, C] (zero rows beyond the real 2*n_half).
    Returns st [Cout_p, B*T'].
    """
    Cin = x_cm.shape[0]
    Cout = end_w.shape[0]
    BTp = x_cm.shape[1]
    dt = cond_bc.dtype
    ext = Wt + 2 * halo
    Tp = BTp // B
    assert Tp * B == BTp and (Tp - 2 * halo) % Wt == 0, (BTp, B, Wt, halo)
    n_tiles = (Tp - 2 * halo) // Wt
    kernel = functools.partial(_waveglow_wn_kernel, L, kw, C, Cin, Cout,
                               Wt, halo, T, Tp)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[hbm, hbm, vmem, vmem, vmem, vmem, vmem, vmem, vmem],
        out_specs=[hbm],
        out_shape=[jax.ShapeDtypeStruct((Cout, BTp), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((Cin, ext), x_cm.dtype),           # x_s
            pltpu.VMEM((2 * C, ext), dt),                 # cond_s
            pltpu.VMEM((Cout, Wt), jnp.float32),          # st_s
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(x_cm, cond_bc, start_w, start_b, k_all, rs_w, rs_b, end_w,
      end_b)[0]


# ---------------------------------------------------------------------------
# HiFi-GAN MRF resblock: both convs of every dilation pair fused per tile
# ---------------------------------------------------------------------------
#
# The serving north-star is vocoder-bound: each generator stage runs 3
# resblocks x 3 dilation pairs x 2 convs (18 convs) over [B, T, C]
# activations that at the late stages exceed 1 GB per tensor (B=64,
# T=262k). Stock XLA round-trips every conv; this kernel keeps a whole
# resblock (leaky_relu -> dilated conv -> leaky_relu -> conv -> residual
# add, for all dilation pairs) VMEM-resident per width tile. Same
# channel-major patch-matmul recipe as the WaveGlow/WaveFlow kernels.
# Inference-only (no autodiff); training keeps stock XLA.


def _hifigan_resblock_kernel(P, k, C, Wt, halo, T, Tp, dilations, slope,
                             x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                             out_ref, x_s, out_s, sem):
    b = pl.program_id(0)
    tile = pl.program_id(1)
    ext = Wt + 2 * halo
    base = tile * Wt
    off = b * Tp + base
    pos = base + jax.lax.broadcasted_iota(jnp.int32, (1, ext), 1)
    valid_ext = ((pos >= halo) & (pos < halo + T))
    center = slice(halo, halo + Wt)

    def copy(src, dst):
        dma = pltpu.make_async_copy(src, dst, sem)
        dma.start()
        dma.wait()

    def shift1(r, offn):
        if offn < 0:
            zl = jnp.zeros((C, -offn), r.dtype)
            return jnp.concatenate([zl, r[:, :offn]], 1)
        if offn > 0:
            zr = jnp.zeros((C, offn), r.dtype)
            return jnp.concatenate([r[:, offn:], zr], 1)
        return r

    def conv(w_ref_row, r, d, bias):
        # per-tap accumulating dots: a [k*C, ext] patch buffer at C=256
        # would blow VMEM; k small [C, C] x [C, ext] dots do not
        half = k // 2
        acc = jnp.broadcast_to(bias[:, None], (C, ext)).astype(
            jnp.float32)
        for t in range(k):
            w_t = w_ref_row[:, t * C:(t + 1) * C]
            acc = acc + jax.lax.dot(
                w_t, shift1(r, (t - half) * d),
                preferred_element_type=jnp.float32)
        return acc

    def lrelu(v):
        # max/min form: bf16 predicate compares are unsupported on the
        # v5e VPU ("Target does not support this comparison")
        return jnp.maximum(v, 0) + slope * jnp.minimum(v, 0)

    copy(x_ref.at[:, pl.ds(off, ext)], x_s)
    cur = x_s[:]                                   # [C, ext]
    for p in range(P):
        d = dilations[p]
        h = conv(w1_ref[p], lrelu(cur), d, b1_ref[p])
        h = lrelu(h).astype(cur.dtype)
        h = jnp.where(valid_ext, h, 0.0)
        h2 = conv(w2_ref[p], h, 1, b2_ref[p])
        cur = cur + h2.astype(cur.dtype)
        cur = jnp.where(valid_ext, cur, 0.0)
    out_s[:] = cur[:, center]
    copy(out_s, out_ref.at[:, pl.ds(off + halo, Wt)])


@functools.partial(jax.jit, static_argnames=("k", "C", "Wt", "halo",
                                             "T", "B", "dilations",
                                             "slope"))
def hifigan_resblock(x_cm, w1, b1, w2, b2, *, k, C, Wt, halo, T, B,
                     dilations, slope):
    """One fused MRF resblock over padded width T'.

    CHANNEL-MAJOR: x_cm [C, B*T']; w1/w2 [P, C, k*C] (patch-major,
    weight-norm folded); b1/b2 [P, C]. Returns the resblock output
    (residual adds included) [C, B*T'].
    """
    P = w1.shape[0]
    BTp = x_cm.shape[1]
    Tp = BTp // B
    assert Tp * B == BTp and (Tp - 2 * halo) % Wt == 0, (BTp, B, Wt, halo)
    ext = Wt + 2 * halo
    dt = x_cm.dtype
    kernel = functools.partial(_hifigan_resblock_kernel, P, k, C, Wt,
                               halo, T, Tp, dilations, slope)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B, (Tp - 2 * halo) // Wt),
        in_specs=[hbm, vmem, vmem, vmem, vmem],
        out_specs=[hbm],
        out_shape=[jax.ShapeDtypeStruct((C, BTp), dt)],
        scratch_shapes=[
            pltpu.VMEM((C, ext), dt),                     # x_s
            pltpu.VMEM((C, Wt), dt),                      # out_s
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(x_cm, w1, b1, w2, b2)[0]
