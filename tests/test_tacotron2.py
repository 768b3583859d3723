"""Tacotron2 model + loss smoke/behavior tests (tiny config, CPU).

The test host has ONE core — everything is jitted and computed once in
module-scoped fixtures, with assertions split across tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cookietts_tpu.losses import tacotron2_loss
from cookietts_tpu.models.tacotron2 import Tacotron2, Tacotron2Config


def tiny_cfg(**kw):
    base = dict(
        n_symbols=40, symbols_embedding_dim=16, n_speakers=4,
        speaker_embedding_dim=8, n_mel_channels=20,
        encoder_speaker_embed_dim=4, encoder_conv_hidden_dim=16,
        encoder_lstm_dim=16, encoder_n_convolutions=2,
        torchmoji_dim=12, torchmoji_crushed_dim=4,
        memory_bottleneck_dim=16, prenet_dim=12,
        attention_rnn_dim=20, decoder_rnn_dim=16,
        second_decoder_rnn_dim=16, attention_dim=12,
        windowed_attention_range=4, postnet_embedding_dim=16,
        postnet_n_convolutions=3, postnet_residual_connections=0,
        max_decoder_steps=24,
    )
    base.update(kw)
    return Tacotron2Config(**base)


def make_batch(rng, cfg, B=3, T_txt=11, T_mel=17):
    text = rng.integers(1, cfg.n_symbols, (B, T_txt)).astype(np.int32)
    text_lengths = np.array([T_txt, T_txt - 3, T_txt - 5], np.int32)[:B]
    mels = rng.standard_normal((B, T_mel, cfg.n_mel_channels)).astype(np.float32)
    mel_lengths = np.array([T_mel, T_mel - 4, T_mel - 7], np.int32)[:B]
    speaker_id = rng.integers(0, cfg.n_speakers, (B,)).astype(np.int32)
    sylps = np.full((B,), 4.0, np.float32)
    tm = rng.standard_normal((B, cfg.torchmoji_dim)).astype(np.float32)
    return dict(text=jnp.asarray(text), text_lengths=jnp.asarray(text_lengths),
                mels=jnp.asarray(mels), mel_lengths=jnp.asarray(mel_lengths),
                speaker_id=jnp.asarray(speaker_id), sylps=jnp.asarray(sylps),
                torchmoji_hidden=jnp.asarray(tm))


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, cfg)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, key=jax.random.PRNGKey(2), deterministic=False)

    @jax.jit
    def fwd(variables, key, p_tf, drop_key):
        (out, carry), mut = model.apply(
            variables, **batch, key=key, p_teacher_forcing=p_tf,
            teacher_force_till=0, deterministic=False,
            rngs={"dropout": drop_key}, mutable=["batch_stats"])
        return out, carry

    out_tf1, _ = fwd(variables, jax.random.PRNGKey(3), 1.0,
                     jax.random.PRNGKey(4))
    out_tf0, _ = fwd(variables, jax.random.PRNGKey(3), 0.0,
                     jax.random.PRNGKey(4))
    return cfg, model, variables, batch, out_tf1, out_tf0


def test_forward_shapes(setup):
    cfg, model, variables, batch, out, _ = setup
    B, T_mel, M = batch["mels"].shape
    T_txt = batch["text"].shape[1]
    assert out["mel_outputs"].shape == (B, T_mel, M)
    assert out["mel_outputs_postnet"].shape == (B, T_mel, M)
    assert out["gate_outputs"].shape == (B, T_mel)
    assert out["alignments"].shape == (B, T_mel, T_txt)
    assert out["pred_sylps"].shape == (B,)
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_attention_normalized(setup):
    _, _, _, _, out, _ = setup
    sums = np.asarray(out["alignments"]).sum(-1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)


def test_teacher_forcing_changes_output(setup):
    _, _, _, _, out_tf1, out_tf0 = setup
    assert not np.allclose(np.asarray(out_tf1["mel_outputs"]),
                           np.asarray(out_tf0["mel_outputs"]))


def test_inference_runs_and_masks(setup):
    cfg, model, variables, batch, _, _ = setup
    infer = jax.jit(lambda v, key: model.apply(
        v, batch["text"], batch["text_lengths"], batch["speaker_id"],
        batch["torchmoji_hidden"], key=key, method=Tacotron2.inference))
    out = infer(variables, jax.random.PRNGKey(5))
    B = batch["text"].shape[0]
    assert out["mel_outputs"].shape == (B, cfg.max_decoder_steps,
                                        cfg.n_mel_channels)
    lens = np.asarray(out["mel_lengths"])
    assert np.all(lens >= 1) and np.all(lens <= cfg.max_decoder_steps)


def test_loss_and_grads(setup):
    cfg, model, variables, batch, _, _ = setup
    params = variables["params"]
    others = {k: v for k, v in variables.items() if k != "params"}
    gt = dict(
        mels=batch["mels"], mel_lengths=batch["mel_lengths"],
        text_lengths=batch["text_lengths"], sylps=batch["sylps"],
        gate_target=(jnp.arange(batch["mels"].shape[1])[None, :]
                     >= batch["mel_lengths"][:, None] - 1).astype(jnp.float32),
    )

    @jax.jit
    def loss_grad(p):
        def loss_fn(p):
            (out, _), _ = model.apply(
                {"params": p, **others}, **batch, key=jax.random.PRNGKey(7),
                deterministic=False, rngs={"dropout": jax.random.PRNGKey(8)},
                mutable=["batch_stats"])
            total, loss_dict, file_losses = tacotron2_loss(out, gt)
            return total, loss_dict
        return jax.value_and_grad(loss_fn, has_aux=True)(p)

    (total, loss_dict), grads = loss_grad(params)
    assert np.isfinite(float(total))
    for k in ("spec_MFSE", "gate_loss", "diag_att", "weighted_score"):
        assert np.isfinite(float(loss_dict[k])), k
    flat = jax.tree_util.tree_leaves_with_path(grads)
    n_nonzero = 0
    for path, g in flat:
        assert np.all(np.isfinite(np.asarray(g))), path
        if np.any(np.asarray(g) != 0):
            n_nonzero += 1
    assert n_nonzero > len(flat) * 0.7


def test_tbptt_carry_continuity():
    """Decoding [seg1; seg2] with carried state == decoding the full
    sequence, when all stochastic paths are disabled."""
    cfg = tiny_cfg(p_prenet_dropout=0.0, p_attrnn_dropout=0.0,
                   p_decrnn_dropout=0.0, encoder_conv_dropout=0.0)
    model = Tacotron2(cfg)
    rng = np.random.default_rng(1)
    b = make_batch(rng, cfg, B=2, T_txt=9, T_mel=16)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **b, key=jax.random.PRNGKey(2), deterministic=True)

    @jax.jit
    def run_full(v):
        out, _ = model.apply(v, **b, key=jax.random.PRNGKey(3),
                             p_teacher_forcing=1.0, teacher_force_till=99,
                             deterministic=True)
        return out["mel_outputs"]

    T = b["mels"].shape[1]
    half = T // 2

    @jax.jit
    def run_split(v):
        b1 = dict(b, mels=b["mels"][:, :half],
                  mel_lengths=jnp.minimum(b["mel_lengths"], half))
        out1, carry = model.apply(v, **b1, key=jax.random.PRNGKey(3),
                                  p_teacher_forcing=1.0,
                                  teacher_force_till=99, deterministic=True)
        b2 = dict(b, mels=b["mels"][:, half:],
                  mel_lengths=jnp.maximum(b["mel_lengths"] - half, 0))
        out2, _ = model.apply(v, **b2, key=jax.random.PRNGKey(4),
                              p_teacher_forcing=1.0, teacher_force_till=99,
                              deterministic=True, init_carry=carry)
        return jnp.concatenate(
            [out1["mel_outputs"], out2["mel_outputs"]], axis=1)

    ref = np.asarray(run_full(variables))
    joined = np.asarray(run_split(variables))
    # compare item 0 which has full length under both segmentations
    np.testing.assert_allclose(joined[0], ref[0], atol=2e-4)


@pytest.mark.parametrize("att_type", [1, 2])
def test_alternative_attention_decoders(att_type):
    """GMM (1) and DCA (2) attention variants drive the full model."""
    cfg = tiny_cfg(attention_type=att_type, num_att_mixtures=2,
                   dynamic_filter_num=4, dynamic_filter_len=7)
    model = Tacotron2(cfg)
    rng = np.random.default_rng(att_type)
    batch = make_batch(rng, cfg, B=2, T_txt=9, T_mel=12)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, key=jax.random.PRNGKey(2), deterministic=False)
    (out, _), _ = jax.jit(
        lambda v: model.apply(
            v, **batch, key=jax.random.PRNGKey(3), deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"]))(variables)
    assert out["alignments"].shape == (2, 12, 9)
    a = np.asarray(out["alignments"])
    assert np.all(np.isfinite(a))
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-4)
    assert np.all(np.isfinite(np.asarray(out["mel_outputs"])))


def test_inference_early_exit_parity(setup):
    """Chunked while_loop decode == full fixed-length scan on the frames
    inside mel_lengths (same per-step rng keys), with identical
    mel_lengths; compute actually stops after the gates fire (frames past
    the stopped chunk stay zero). Reference stop-condition model.py:897-904."""
    cfg, model, variables, batch, _, _ = setup
    T_req, chunk = 48, 12
    args = (batch["text"], batch["text_lengths"], batch["speaker_id"],
            batch["torchmoji_hidden"])

    full = jax.jit(lambda v, k: model.apply(
        v, *args, key=k, max_decoder_steps=T_req,
        method=Tacotron2.inference))(variables, jax.random.PRNGKey(5))
    ee = jax.jit(lambda v, k: model.apply(
        v, *args, key=k, max_decoder_steps=T_req, early_exit=True,
        chunk_size=chunk,
        method=Tacotron2.inference))(variables, jax.random.PRNGKey(5))

    lens_full = np.asarray(full["mel_lengths"])
    lens_ee = np.asarray(ee["mel_lengths"])
    np.testing.assert_array_equal(lens_full, lens_ee)
    mf, me = np.asarray(full["mel_outputs"]), np.asarray(ee["mel_outputs"])
    for b in range(mf.shape[0]):
        L = int(lens_full[b])
        np.testing.assert_allclose(me[b, :L], mf[b, :L], atol=1e-5)
    # compute stopped early: at a random init, gates fire almost
    # immediately, so the tail chunks must be untouched zeros
    gates = np.asarray(ee["gate_outputs"])
    if gates[:, -1].min() <= -1e3:     # last chunk never ran
        assert np.all(me[:, -chunk:] == 0.0)


def test_inference_dynamic_gate_controls(setup):
    """gate_threshold / gate_delay are traced: changing them changes
    mel_lengths without recompiling (serving form fields)."""
    cfg, model, variables, batch, _, _ = setup
    fn = jax.jit(lambda v, k, thr, delay: model.apply(
        v, batch["text"], batch["text_lengths"], batch["speaker_id"],
        batch["torchmoji_hidden"], key=k, max_decoder_steps=24,
        gate_threshold=thr, gate_delay=delay,
        method=Tacotron2.inference)["mel_lengths"])
    k = jax.random.PRNGKey(6)
    l_small = np.asarray(fn(variables, k, jnp.float32(0.15), jnp.int32(0)))
    l_big = np.asarray(fn(variables, k, jnp.float32(0.999), jnp.int32(5)))
    assert np.all(l_big >= l_small)
    assert np.any(l_big != l_small)


def test_n_frames_per_step_grouped_decode():
    """r=2 frames per decode step (reference hparams n_frames_per_step):
    training consumes T/r scan steps but returns per-FRAME contracts
    (mel [B,T,M], gate [B,T], alignments [B,T,Te] with each step's row
    repeated over its r frames); inference stops on per-sub-frame gates
    and full-scan == early-exit within mel_lengths."""
    cfg = tiny_cfg(n_frames_per_step=2, max_decoder_steps=24,
                   gate_delay=2)
    model = Tacotron2(cfg)
    rng = np.random.default_rng(1)
    batch = make_batch(rng, cfg, T_mel=18)      # multiple of r
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, key=jax.random.PRNGKey(2), deterministic=False)

    (out, carry), _ = model.apply(
        variables, **batch, key=jax.random.PRNGKey(3),
        p_teacher_forcing=1.0, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(4)}, mutable=["batch_stats"])
    B, T, M = batch["mels"].shape
    assert out["mel_outputs"].shape == (B, T, M)
    assert out["gate_outputs"].shape == (B, T)
    assert out["alignments"].shape[1] == T
    # each decode step's attention row covers its 2 frames
    a = np.asarray(out["alignments"])
    np.testing.assert_allclose(a[:, 0::2], a[:, 1::2], atol=0)
    # the TBPTT carry holds the last GROUP of gt frames
    np.testing.assert_allclose(
        np.asarray(carry.prev_teacher),
        np.asarray(batch["mels"][:, -2:, :]).reshape(B, 2 * M))
    # loss plumbing accepts the per-frame contracts
    gt = dict(mels=batch["mels"], mel_lengths=batch["mel_lengths"],
              text_lengths=batch["text_lengths"], sylps=batch["sylps"],
              gate_target=jnp.zeros((B, T)),
              pres_prev_state=jnp.zeros((B,)))
    total, _, _ = tacotron2_loss(out, gt)
    assert np.isfinite(float(total))

    # odd T_dec is rejected loudly
    bad = dict(batch)
    bad["mels"] = batch["mels"][:, :-1]
    bad["mel_lengths"] = jnp.minimum(batch["mel_lengths"], T - 1)
    with pytest.raises(ValueError, match="multiple of"):
        model.apply(variables, **bad, key=jax.random.PRNGKey(3),
                    rngs={"dropout": jax.random.PRNGKey(4)},
                    mutable=["batch_stats"])

    # inference: full scan == early-exit inside mel_lengths, shapes in
    # FRAMES, mel_lengths from per-sub-frame gates
    inf = jax.jit(lambda v, k: model.apply(
        v, text=batch["text"], text_lengths=batch["text_lengths"],
        speaker_id=batch["speaker_id"], sylps=batch["sylps"],
        torchmoji_hidden=batch["torchmoji_hidden"], key=k,
        max_decoder_steps=24, method=Tacotron2.inference))
    out_full = inf(variables, jax.random.PRNGKey(5))
    assert out_full["mel_outputs"].shape == (B, 24, M)
    assert out_full["gate_outputs"].shape == (B, 24)
    inf_ee = jax.jit(lambda v, k: model.apply(
        v, text=batch["text"], text_lengths=batch["text_lengths"],
        speaker_id=batch["speaker_id"], sylps=batch["sylps"],
        torchmoji_hidden=batch["torchmoji_hidden"], key=k,
        max_decoder_steps=24, early_exit=True, chunk_size=4,
        method=Tacotron2.inference))
    out_ee = inf_ee(variables, jax.random.PRNGKey(5))
    lens = np.asarray(out_full["mel_lengths"])
    np.testing.assert_array_equal(lens, np.asarray(out_ee["mel_lengths"]))
    full = np.asarray(out_full["mel_outputs"], np.float32)
    ee = np.asarray(out_ee["mel_outputs"], np.float32)
    for b in range(B):
        np.testing.assert_allclose(full[b, : lens[b]], ee[b, : lens[b]],
                                   atol=2e-5)
