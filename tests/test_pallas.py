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


# -- fused LSTM decode cell ----------------------------------------------------

def _lstm_inputs(B=3, In=40, H=72, seed=0):
    rng = np.random.default_rng(seed)
    xh = jnp.asarray(rng.standard_normal((B, In + H)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((In + H, 4 * H)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((4 * H,)) * 0.05, jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, H)) * 0.5, jnp.float32)
    return xh, k, b, c


def test_lstm_gates_parity():
    # 128-aligned dims -> the real kernel path (F=256, one 128-tile)
    from cookietts_tpu.ops.pallas_kernels import lstm_gates_step
    args = _lstm_inputs(B=3, In=128, H=128)
    c_ref, h_ref = lstm_gates_step(*args, use_pallas=False)
    c_k, h_k = lstm_gates_step(*args, use_pallas=True)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref),
                               atol=2e-5, rtol=1e-4)


def test_lstm_gates_multi_tile():
    # H=384 -> Th=128, three tiles; exercises the aliased 4-view blocks
    from cookietts_tpu.ops.pallas_kernels import lstm_gates_step
    args = _lstm_inputs(B=2, In=128, H=384, seed=3)
    c_ref, h_ref = lstm_gates_step(*args, use_pallas=False)
    c_k, h_k = lstm_gates_step(*args, use_pallas=True)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref),
                               atol=2e-5, rtol=1e-4)


def test_lstm_gates_unaligned_fallback():
    # odd dims take the (identical) jnp fallback — same results
    from cookietts_tpu.ops.pallas_kernels import lstm_gates_step
    args = _lstm_inputs(B=3, In=40, H=72, seed=2)
    c_ref, h_ref = lstm_gates_step(*args, use_pallas=False)
    c_k, h_k = lstm_gates_step(*args, use_pallas=True)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref), atol=1e-6)


def test_fused_lstm_grad_parity():
    from cookietts_tpu.ops.pallas_kernels import (_lstm_reference,
                                                  fused_lstm_gates)
    args = _lstm_inputs(B=2, In=128, H=128, seed=5)

    def loss_fused(xh, k, b, c):
        cn, hn = fused_lstm_gates(xh, k, b, c)
        return jnp.sum(cn ** 2) + jnp.sum(jnp.abs(hn))

    def loss_ref(xh, k, b, c):
        cn, hn = _lstm_reference(xh, k, b, c)
        return jnp.sum(cn ** 2) + jnp.sum(jnp.abs(hn))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-5, rtol=1e-3)


def test_zoneout_cell_pallas_parity():
    """Same params, fused vs stock cell: identical outputs (deterministic
    zoneout-expectation path)."""
    from cookietts_tpu.ops.lstm import ZoneoutLSTMCell
    rng = np.random.default_rng(7)
    B, In, H = 2, 24, 96
    x = jnp.asarray(rng.standard_normal((B, In)), jnp.float32)
    cell_ref = ZoneoutLSTMCell(H, zoneout=0.1, use_pallas=False)
    cell_k = ZoneoutLSTMCell(H, zoneout=0.1, use_pallas=True)
    carry = cell_ref.initialize_carry(B)
    variables = cell_ref.init(jax.random.PRNGKey(0), carry, x)
    (c_r, h_r), y_r = cell_ref.apply(variables, carry, x, deterministic=True)
    (c_k, h_k), y_k = cell_k.apply(variables, carry, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r), atol=2e-5)


def test_tacotron2_pallas_lstm_parity():
    """Full model, fused-LSTM decode path vs stock: same params and rng
    keys must give matching mels/gates."""
    import dataclasses
    from cookietts_tpu.models.tacotron2 import Tacotron2, Tacotron2Config

    base = Tacotron2Config(
        n_symbols=40, symbols_embedding_dim=16, n_speakers=4,
        speaker_embedding_dim=8, n_mel_channels=10,
        encoder_speaker_embed_dim=4, encoder_conv_hidden_dim=16,
        encoder_lstm_dim=16, encoder_n_convolutions=1,
        torchmoji_dim=12, torchmoji_crushed_dim=4,
        memory_bottleneck_dim=16, prenet_dim=8, attention_rnn_dim=16,
        decoder_rnn_dim=12, second_decoder_rnn_dim=12, attention_dim=8,
        windowed_attention_range=4, postnet_embedding_dim=16,
        postnet_n_convolutions=2, postnet_residual_connections=0)
    rng = np.random.default_rng(0)
    B, T_txt, T_mel = 2, 9, 12
    kwargs = dict(
        text=jnp.asarray(rng.integers(1, 40, (B, T_txt)), jnp.int32),
        text_lengths=jnp.full((B,), T_txt, jnp.int32),
        mels=jnp.asarray(rng.standard_normal((B, T_mel, 10)), jnp.float32),
        mel_lengths=jnp.full((B,), T_mel, jnp.int32),
        speaker_id=jnp.zeros((B,), jnp.int32),
        sylps=jnp.full((B,), 4.0, jnp.float32),
        torchmoji_hidden=jnp.asarray(rng.standard_normal((B, 12)),
                                     jnp.float32),
        key=jax.random.PRNGKey(2))

    model_ref = Tacotron2(base)
    model_k = Tacotron2(dataclasses.replace(base, use_pallas_lstm=True))
    variables = model_ref.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        deterministic=False, **kwargs)
    outs = {}
    for name, model in (("ref", model_ref), ("pallas", model_k)):
        (out, _), _ = model.apply(
            variables, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"], **kwargs)
        outs[name] = out
    np.testing.assert_allclose(
        np.asarray(outs["pallas"]["mel_outputs"]),
        np.asarray(outs["ref"]["mel_outputs"]), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(outs["pallas"]["gate_outputs"]),
        np.asarray(outs["ref"]["gate_outputs"]), atol=5e-5, rtol=1e-4)
