"""LocationSensitiveAttention(use_pallas=True) parity vs the jnp path,
including gradients through the custom_vjp."""
import jax
import jax.numpy as jnp
import numpy as np

from cookietts_tpu.ops.attention import LocationSensitiveAttention


def _setup(use_pallas):
    att = LocationSensitiveAttention(
        attention_dim=24, location_n_filters=8, location_kernel_size=7,
        windowed_attention_range=6, use_pallas=use_pallas)
    rng = np.random.default_rng(0)
    B, T, D, Q = 2, 19, 16, 12
    memory = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    lengths = jnp.asarray([T, T - 7], jnp.int32)
    query = jnp.asarray(rng.standard_normal((B, Q)), jnp.float32)
    return att, memory, lengths, query


def _run(att, variables, memory, lengths, query):
    def fn(v, q):
        def inner(mdl):
            const = mdl.precompute(memory, lengths)
            state = mdl.init_state(memory.shape[0], memory.shape[1])
            ctx, w, st = mdl(q, memory, const, state)
            return ctx, w
        return att.apply(v, method=inner)
    return fn


def test_module_parity_and_grads():
    att_ref, memory, lengths, query = _setup(False)
    att_pal = LocationSensitiveAttention(
        attention_dim=24, location_n_filters=8, location_kernel_size=7,
        windowed_attention_range=6, use_pallas=True)

    def init_and_out(att):
        variables = att.init(
            jax.random.PRNGKey(0),
            method=lambda mdl: mdl(
                query, memory, mdl.precompute(memory, lengths),
                mdl.init_state(memory.shape[0], memory.shape[1])))
        fn = _run(att, variables, memory, lengths, query)
        return variables, fn

    v_ref, fn_ref = init_and_out(att_ref)
    v_pal, fn_pal = init_and_out(att_pal)
    ctx_r, w_r = jax.jit(fn_ref)(v_ref, query)
    ctx_p, w_p = jax.jit(fn_pal)(v_pal, query)   # same init -> same params
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_r),
                               atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ctx_p), np.asarray(ctx_r),
                               atol=3e-4, rtol=1e-2)

    # gradient parity through the custom_vjp
    def loss_ref(v, q):
        ctx, w = fn_ref(v, q)
        return jnp.sum(ctx ** 2) + jnp.sum(w ** 2)

    def loss_pal(v, q):
        ctx, w = fn_pal(v, q)
        return jnp.sum(ctx ** 2) + jnp.sum(w ** 2)

    g_ref = jax.jit(jax.grad(loss_ref, argnums=1))(v_ref, query)
    g_pal = jax.jit(jax.grad(loss_pal, argnums=1))(v_pal, query)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=5e-4, rtol=5e-2)
