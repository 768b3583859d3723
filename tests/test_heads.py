"""GST / EmotionNet / AuxEmotionNet head tests (tiny dims)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cookietts_tpu.models.emotionnet import (
    AuxEmotionNet, EmotionNet, EmotionNetConfig)
from cookietts_tpu.models.gst import GST, GSTConfig


def _gst_cfg(**kw):
    base = dict(n_mel_channels=16, token_embedding_size=16, token_num=4,
                num_heads=2, gst_att_dim=8, ref_enc_filters=(4, 4),
                torchmoji_dim=12)
    base.update(kw)
    return GSTConfig(**base)


@pytest.fixture(scope="module")
def gst_setup():
    cfg = _gst_cfg()
    model = GST(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 20, 16)), jnp.float32)
    variables = jax.jit(
        model.init, static_argnames=("ref_mode", "deterministic"))(
        jax.random.PRNGKey(0), mel, ref_mode=1, deterministic=True)
    return cfg, model, variables, mel


def test_gst_from_mel(gst_setup):
    cfg, model, variables, mel = gst_setup
    out = jax.jit(model.apply, static_argnames=("ref_mode", "deterministic"))(
        variables, mel, ref_mode=1, deterministic=True)
    assert out["style_embedding"].shape == (2, cfg.token_embedding_size)
    assert out["style_tokens"].shape == (2, cfg.token_num)
    np.testing.assert_allclose(
        np.asarray(out["style_tokens"]).sum(-1), 1.0, atol=1e-5)  # softmax


def test_gst_user_tokens(gst_setup):
    cfg, model, variables, _ = gst_setup
    tokens = jnp.asarray([[4.0, 0, 0, 0], [0, 0, 0, 4.0]], jnp.float32)
    out = jax.jit(model.apply, static_argnames=("ref_mode", "deterministic"))(
        variables, tokens, ref_mode=0, deterministic=True)
    a = np.asarray(out["style_embedding"])
    assert not np.allclose(a[0], a[1])   # different tokens -> styles


def test_gst_from_torchmoji(gst_setup):
    cfg, model, variables, _ = gst_setup
    tm = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, cfg.torchmoji_dim)), jnp.float32)
    out = jax.jit(model.apply, static_argnames=("ref_mode", "deterministic"))(
        variables, tm, ref_mode=3, deterministic=True)
    assert out["style_embedding"].shape == (2, cfg.token_embedding_size)


def test_gst_vae_mode():
    cfg = _gst_cfg(vae_mode=True)
    model = GST(cfg)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 20, 16)), jnp.float32)
    variables = jax.jit(
        model.init, static_argnames=("ref_mode", "deterministic"))(
        jax.random.PRNGKey(0), mel, ref_mode=1, deterministic=True)
    out = jax.jit(model.apply, static_argnames=("ref_mode", "deterministic"))(
        variables, mel, ref_mode=1, deterministic=True)
    assert out["mu"].shape == (2, cfg.token_num)
    assert out["logvar"].shape == (2, cfg.token_num)


@pytest.fixture(scope="module")
def emo_setup():
    cfg = EmotionNetConfig(n_classes=4, latent_dim=3, ref_enc_rnn_dim=8,
                           rnn_dim=8, speaker_embedding_dim=6,
                           torchmoji_dim=12, aux_layer_dims=(8,),
                           n_mel_channels=16)
    rng = np.random.default_rng(0)
    B, T_mel, T_txt, enc_dim = 3, 20, 7, 10
    mels = jnp.asarray(rng.standard_normal((B, T_mel, 16)), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((B, 6)), jnp.float32)
    enc = jnp.asarray(rng.standard_normal((B, T_txt, enc_dim)), jnp.float32)
    lens = jnp.asarray([7, 5, 3], jnp.int32)
    emotion_id = jnp.asarray([0, 2, 4], jnp.int32)       # 4 == unknown
    onehot = jax.nn.one_hot(jnp.minimum(emotion_id, 3), 4)
    return cfg, mels, spk, enc, lens, emotion_id, onehot


def test_emotionnet_semi_supervision(emo_setup):
    cfg, mels, spk, enc, lens, emotion_id, onehot = emo_setup
    model = EmotionNet(cfg)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), mels, spk, enc, lens, emotion_id, onehot,
        deterministic=True)
    out = jax.jit(model.apply, static_argnames=("deterministic",))(
        variables, mels, spk, enc, lens, emotion_id, onehot,
        deterministic=True)
    assert out["zs"].shape == (3, 4)
    assert out["zu"].shape == (3, 3)
    # items 0,1 have known labels -> ss_zs is their (log) one-hot
    ss = np.asarray(out["ss_zs"])
    assert np.argmax(ss[0]) == 0 and np.argmax(ss[1]) == 2
    np.testing.assert_allclose(np.exp(ss[0]).sum(), 1.0, atol=1e-4)
    # item 2 unknown -> classifier output kept
    np.testing.assert_allclose(ss[2], np.asarray(out["zs"])[2], atol=1e-6)


def test_aux_emotionnet(emo_setup):
    cfg, mels, spk, enc, lens, _, _ = emo_setup
    model = AuxEmotionNet(cfg)
    tm = jnp.asarray(np.random.default_rng(2).standard_normal(
        (3, cfg.torchmoji_dim)), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), tm, spk, enc, lens, deterministic=True)
    out = jax.jit(model.apply, static_argnames=("deterministic",))(
        variables, tm, spk, enc, lens, deterministic=True)
    assert out["zs"].shape == (3, 4)
    assert out["zu_mu"].shape == (3, 3)
    np.testing.assert_allclose(
        np.exp(np.asarray(out["zs"])).sum(-1), 1.0, atol=1e-4)


def test_tacotron2_with_ssvae_heads():
    """Tacotron2 with GST + EmotionNet enabled: forward, inference, loss."""
    from cookietts_tpu.losses import tacotron2_loss
    from cookietts_tpu.models.tacotron2 import Tacotron2
    from tests.test_tacotron2 import make_batch, tiny_cfg

    cfg = tiny_cfg(use_gst=True, gst_token_num=4,
                   gst_token_embedding_size=8, gst_num_heads=2,
                   use_emotionnet=True, n_emotion_classes=4,
                   emotionnet_latent_dim=3)
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    batch = make_batch(rng, cfg, B=2, T_txt=9, T_mel=66)
    emotion_id = jnp.asarray([0, 4], jnp.int32)        # 4 == unknown
    onehot = jax.nn.one_hot(jnp.minimum(emotion_id, 3), 4)

    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, emotion_id=emotion_id, emotion_onehot=onehot,
        key=jax.random.PRNGKey(2), deterministic=False)

    @jax.jit
    def fwd(v):
        (out, _), _ = model.apply(
            v, **batch, emotion_id=emotion_id, emotion_onehot=onehot,
            key=jax.random.PRNGKey(3), deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(4)},
            mutable=["batch_stats"])
        return out

    out = fwd(variables)
    assert "gst_style_tokens" in out and "em_zu_mu" in out
    assert out["gst_style_tokens"].shape == (2, 4)

    gt = dict(
        mels=batch["mels"], mel_lengths=batch["mel_lengths"],
        text_lengths=batch["text_lengths"], sylps=batch["sylps"],
        gate_target=(jnp.arange(batch["mels"].shape[1])[None, :]
                     >= batch["mel_lengths"][:, None] - 1).astype(
            jnp.float32),
        emotion_id=emotion_id, emotion_onehot=onehot,
    )
    total, loss_dict, _ = tacotron2_loss(out, gt)
    for k in ("em_kld", "sup_em_nll", "aux_em_MSE"):
        assert k in loss_dict and np.isfinite(float(loss_dict[k])), k
    assert np.isfinite(float(total))

    # inference path uses the text-predicted (TP) style + aux emotion
    inf = jax.jit(lambda v, key: model.apply(
        v, batch["text"], batch["text_lengths"], batch["speaker_id"],
        batch["torchmoji_hidden"], key=key, method=Tacotron2.inference))
    iout = inf(variables, jax.random.PRNGKey(9))
    assert np.all(np.isfinite(np.asarray(iout["mel_outputs"])))
