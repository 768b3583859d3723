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
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG = -1e30


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
