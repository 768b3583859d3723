"""torchMoji port tests: shapes, masking, tokenizer, weight conversion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cookietts_tpu.models.torchmoji import (
    FEATURE_DIM, HIDDEN, EMBED_DIM, TorchMoji, TorchMojiEncoder,
    convert_torch_checkpoint, hard_sigmoid, tokenize)


def test_hard_sigmoid():
    x = jnp.asarray([-10.0, -2.5, 0.0, 2.5, 10.0])
    np.testing.assert_allclose(np.asarray(hard_sigmoid(x)),
                               [0.0, 0.0, 0.5, 1.0, 1.0])


@pytest.fixture(scope="module")
def tiny_moji():
    model = TorchMoji(nb_tokens=64)
    ids = jnp.asarray([[5, 9, 2, 0, 0, 0], [7, 0, 0, 0, 0, 0]], jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    return model, variables, ids


def test_feature_shape(tiny_moji):
    model, variables, ids = tiny_moji
    out = jax.jit(model.apply)(variables, ids)
    assert out.shape == (2, FEATURE_DIM)
    assert np.all(np.isfinite(np.asarray(out)))


def test_padding_invariance(tiny_moji):
    """Extending padding must not change the feature."""
    model, variables, ids = tiny_moji
    out1 = np.asarray(jax.jit(model.apply)(variables, ids))
    more_pad = jnp.pad(ids, ((0, 0), (0, 4)))
    out2 = np.asarray(model.apply(variables, more_pad))
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_tokenizer():
    vocab = {"CUSTOM_MASK": 0, "CUSTOM_UNKNOWN": 1, "CUSTOM_AT": 2,
             "CUSTOM_URL": 3, "CUSTOM_NUMBER": 4,
             "hello": 10, "world": 11, "!": 12}
    row = tokenize("Hello world! Visit https://x.co @user 42 zzz",
                   vocab, maxlen=10)
    # hello world ! Visit(OOV) URL AT NUMBER zzz(OOV)
    assert list(row[:8]) == [10, 11, 12, 1, 3, 2, 4, 1]
    assert row[8:].tolist() == [0, 0]


def test_weight_conversion_structure(tiny_moji):
    """Converted torch state-dict must match the flax param tree exactly."""
    model, variables, ids = tiny_moji
    nb = 64
    rng = np.random.default_rng(0)
    sd = {"embed.weight": rng.standard_normal((nb, EMBED_DIM)),
          "attention_layer.attention_vector":
              rng.standard_normal((FEATURE_DIM,))}
    for i in (0, 1):
        in_dim = EMBED_DIM if i == 0 else 2 * HIDDEN
        for sfx in ("", "_reverse"):
            sd[f"lstm_{i}.weight_ih_l0{sfx}"] = \
                rng.standard_normal((4 * HIDDEN, in_dim))
            sd[f"lstm_{i}.weight_hh_l0{sfx}"] = \
                rng.standard_normal((4 * HIDDEN, HIDDEN))
            sd[f"lstm_{i}.bias_ih_l0{sfx}"] = \
                rng.standard_normal((4 * HIDDEN,))
            sd[f"lstm_{i}.bias_hh_l0{sfx}"] = \
                rng.standard_normal((4 * HIDDEN,))
    converted = convert_torch_checkpoint(sd)

    ref = jax.tree_util.tree_map(np.shape, variables["params"])
    got = jax.tree_util.tree_map(np.shape, converted)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref)
    flat_got = {jax.tree_util.keystr(p): s
                for p, s in jax.tree_util.tree_leaves_with_path(got)}
    for path, shape in flat_ref:
        k = jax.tree_util.keystr(path)
        assert k in flat_got, f"missing converted param {k}"
        assert flat_got[k] == shape, (k, flat_got[k], shape)

    # and the converted params actually run
    out = model.apply({"params": converted}, ids)
    assert out.shape == (2, FEATURE_DIM)


def test_encoder_wrapper(tiny_moji):
    model, variables, _ = tiny_moji
    vocab = {"CUSTOM_MASK": 0, "CUSTOM_UNKNOWN": 1, "hello": 5, "there": 9}
    enc = TorchMojiEncoder(vocab, variables, maxlen=6)
    feat = enc("hello there")
    assert feat.shape == (FEATURE_DIM,)


def test_cli_convert_torchmoji(tmp_path):
    """'convert --model torchmoji' maps the published pytorch layout into
    a loadable framework checkpoint that runs."""
    from cookietts_tpu import cli
    from cookietts_tpu.runtime.checkpoint import load_checkpoint

    nb = 64
    rng = np.random.default_rng(1)
    sd = {"embed.weight": rng.standard_normal((nb, EMBED_DIM)),
          "attention_layer.attention_vector":
              rng.standard_normal((FEATURE_DIM,))}
    for i in (0, 1):
        in_dim = EMBED_DIM if i == 0 else 2 * HIDDEN
        for sfx in ("", "_reverse"):
            sd[f"lstm_{i}.weight_ih_l0{sfx}"] = \
                rng.standard_normal((4 * HIDDEN, in_dim))
            sd[f"lstm_{i}.weight_hh_l0{sfx}"] = \
                rng.standard_normal((4 * HIDDEN, HIDDEN))
            sd[f"lstm_{i}.bias_ih_l0{sfx}"] = \
                rng.standard_normal((4 * HIDDEN,))
            sd[f"lstm_{i}.bias_hh_l0{sfx}"] = \
                rng.standard_normal((4 * HIDDEN,))
    npz = str(tmp_path / "pytorch_model.npz")
    np.savez(npz, **{k: np.asarray(v, np.float32) for k, v in sd.items()})
    out = str(tmp_path / "torchmoji.ckpt")
    cli.main(["convert", "--model", "torchmoji",
              "--torch_ckpt", npz, "-o", out])

    tree, meta = load_checkpoint(out)
    assert meta["model_config"]["nb_tokens"] == nb
    model = TorchMoji(nb_tokens=nb)
    ids = jnp.asarray([[5, 9, 2, 0, 0, 0]], jnp.int32)
    params = jax.tree_util.tree_map(jnp.asarray, tree["params"])
    feats = model.apply({"params": params}, ids)
    assert feats.shape == (1, FEATURE_DIM)
    assert np.isfinite(np.asarray(feats)).all()
