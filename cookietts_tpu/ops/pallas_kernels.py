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
