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


def _load_reference_tokenizer():
    """Import the live reference torchMoji tokenizer pipeline.

    Two shims are needed (test-only; the reference code is unmodified on
    disk): a stub ``emoji`` module exposing the UNICODE_EMOJI dict
    (filter_utils.py:117 — its only use) plus ``text_unidecode``, and a
    py3.12 regex fix hoisting the mid-pattern ``(?i)`` global flags in
    RE_TITLES into local ``(?i:...)`` groups (same semantics; py<=3.10
    accepted them mid-pattern)."""
    import sys
    import types
    sys.path.insert(0, "/root/reference")
    try:
        if "emoji" not in sys.modules:
            emoji_stub = types.ModuleType("emoji")
            emoji_stub.UNICODE_EMOJI = {"\U0001F604": ":smile:",
                                        "\U0001F622": ":cry:"}
            sys.modules["emoji"] = emoji_stub
        if "text_unidecode" not in sys.modules:
            tu = types.ModuleType("text_unidecode")
            tu.unidecode = lambda s: s.encode("ascii", "ignore").decode()
            sys.modules["text_unidecode"] = tu
        if "CookieTTS.utils.torchmoji.tokenizer" not in sys.modules:
            with open("/root/reference/CookieTTS/utils/torchmoji/"
                      "tokenizer.py") as f:
                src = f.read()
            src = src.replace("r'(?i)' + t", "r'(?i:' + t + r')'")
            mod = types.ModuleType("CookieTTS.utils.torchmoji.tokenizer")
            exec(compile(src, "tokenizer.py", "exec"), mod.__dict__)
            sys.modules["CookieTTS.utils.torchmoji.tokenizer"] = mod
        from CookieTTS.utils.torchmoji.sentence_tokenizer import (
            SentenceTokenizer)
        return SentenceTokenizer
    finally:
        sys.path.pop(0)


def test_tokenizer_golden_ids_vs_reference():
    """Exact token-ID parity with the live reference SentenceTokenizer
    (sentence_tokenizer.py:21-120) on a vendored mini-vocabulary:
    CUSTOM_AT / CUSTOM_URL / CUSTOM_NUMBER classes, emoji tokens,
    contractions, hashtags, OOV -> CUSTOM_UNKNOWN, digit-run number
    splitting ("3.5" -> NUMBER . NUMBER), and zero padding."""
    SentenceTokenizer = _load_reference_tokenizer()
    from cookietts_tpu.models.torchmoji import SPECIAL_TOKENS, tokenize

    words = ["i", "love", "this", "\U0001F604", "check", "out", "now",
             "hello", "how", "are", "you", "have", "apples", "and",
             "oranges", "happy", "yes", "visit", "today", "numbers",
             "don't", "stop", "believing", "#hashtag", "party", ":)",
             ".", "!", "mr."]
    vocab = {t: i for i, t in enumerate(SPECIAL_TOKENS)}
    vocab.update({w: len(SPECIAL_TOKENS) + i for i, w in enumerate(words)})

    sentences = [
        "I love this \U0001F604",
        "Check out https://example.com/page now",
        "hello @friend how are you",
        "I have 42 apples and 3.5 oranges",
        "visit www.test.org today",
        "numbers 123 456789",
        "don't stop believing",
        "#hashtag party :)",
        "Mr. unknownword!",
    ]
    st = SentenceTokenizer(vocab, fixed_length=20)
    ref_tokens, _, _ = st.tokenize_sentences(sentences)
    ours = np.stack([tokenize(s, vocab, maxlen=20) for s in sentences])
    np.testing.assert_array_equal(ours, np.asarray(ref_tokens, np.int64))
    # sanity: the special classes actually appear in the golden set
    flat = set(np.asarray(ref_tokens).ravel().tolist())
    assert vocab["CUSTOM_AT"] in flat
    assert vocab["CUSTOM_URL"] in flat
    assert vocab["CUSTOM_NUMBER"] in flat
    assert vocab["CUSTOM_UNKNOWN"] in flat


def test_torchmoji_model_matches_reference():
    """Full-model numerical parity vs the LIVE reference TorchMoji
    (model_def.py:100-247, lstm.py LSTMHardSigmoid, attlayer.py masked
    attention): random reference weights -> convert_torch_checkpoint ->
    identical 2304-d features, including the reference's
    [lstm_1, lstm_0, embed] merge order (model_def.py:224-227) and its
    sort-by-length packed-sequence path."""
    import sys
    import torch

    sys.path.insert(0, "/root/reference")
    try:
        from CookieTTS.utils.torchmoji.model_def import TorchMoji as RefMoji
    finally:
        sys.path.pop(0)

    nb_tokens = 64
    torch.manual_seed(0)
    ref = RefMoji(nb_classes=None, nb_tokens=nb_tokens, feature_output=True)
    ref.eval()

    rng = np.random.default_rng(1)
    B, T = 4, 9
    lengths = np.asarray([9, 4, 7, 1])
    ids = np.zeros((B, T), np.int64)
    for b, L in enumerate(lengths):
        ids[b, :L] = rng.integers(1, nb_tokens, (L,))

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids)).numpy()
    assert ref_out.shape == (B, FEATURE_DIM)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_torch_checkpoint(sd)
    model = TorchMoji(nb_tokens=nb_tokens)
    out = np.asarray(model.apply({"params": params},
                                 jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(out, ref_out, atol=2e-5, rtol=1e-4)
