"""Pallas fused attention-step kernel: parity vs the reference jnp math.

On the CPU test backend the kernel runs through the Pallas interpreter
(automatic for the CPU platform); on TPU it compiles via Mosaic.
"""
import jax
import jax.numpy as jnp
import numpy as np

from cookietts_tpu.ops.pallas_kernels import attention_step


def _inputs(B=3, T=37, A=48, D=56, seed=0):
    rng = np.random.default_rng(seed)
    qp = jnp.asarray(rng.standard_normal((B, A)), jnp.float32)
    lp = jnp.asarray(rng.standard_normal((B, T, A)), jnp.float32)
    mp = jnp.asarray(rng.standard_normal((B, T, A)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((A,)), jnp.float32)
    mem = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    lengths = np.array([T, T - 9, T - 20])[:B]
    mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])
    return qp, lp, mp, v, mem, mask


def test_attention_step_parity():
    args = _inputs()
    ctx_ref, w_ref = attention_step(*args, use_pallas=False)
    ctx_k, w_k = attention_step(*args, use_pallas=True)
    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_ref),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ctx_k), np.asarray(ctx_ref),
                               atol=2e-4, rtol=1e-3)


def test_attention_step_masking():
    qp, lp, mp, v, mem, mask = _inputs(seed=1)
    ctx, w = attention_step(qp, lp, mp, v, mem, mask, use_pallas=True)
    w = np.asarray(w)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    # padded/masked positions carry no weight
    assert np.all(w[~np.asarray(mask)] < 1e-12)
