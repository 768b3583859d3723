"""torchMoji (DeepMoji) sentence-emotion encoder, JAX port.

Capability rebuild of CookieTTS/utils/torchmoji/{model_def.py:100-247,
lstm.py:16-155, attlayer.py:13-68}: embedding(50000x256, tanh) ->
2x bidirectional hard-sigmoid LSTM (512/dir) -> masked softmax attention
over concat[lstm_1, lstm_0, embed] (2304-d, the reference's merge order,
model_def.py:224-227) -> weighted-sum feature.

The reference feeds this 2304-d "attention hidden" into the TTS memory
(tm_linear crush, tacotron2_tm/model.py) and AuxEmotionNet. The published
pretrained weights (pytorch_model.bin) can be converted with
:func:`convert_torch_checkpoint` — the architecture matches
parameter-for-parameter (hard-sigmoid gates included, which exist to match
the original Keras weights).

Tokenizer: :func:`tokenize` mirrors the reference's sentence tokenizer
surface (vocabulary.json word->id, CUSTOM_* specials, fixed maxlen).
"""
from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NB_TOKENS = 50000
EMBED_DIM = 256
HIDDEN = 512
FEATURE_DIM = 4 * HIDDEN + EMBED_DIM      # 2304

# SPECIAL_TOKENS order (global_variables.py:10-17)
SPECIAL_TOKENS = (["CUSTOM_MASK", "CUSTOM_UNKNOWN", "CUSTOM_AT",
                   "CUSTOM_URL", "CUSTOM_NUMBER", "CUSTOM_BREAK"]
                  + [f"CUSTOM_BLANK_{i}" for i in range(6, 10)])


def hard_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Keras-compat hard sigmoid (reference lstm.py uses it for gates)."""
    return jnp.clip(0.2 * x + 0.5, 0.0, 1.0)


class HardSigmoidLSTMCell(nn.RNNCellBase):
    """LSTM cell with hard-sigmoid gate activations (lstm.py:16-155).

    Gate order matches PyTorch (i, f, g, o) so converted weights drop in.
    """
    features: int

    @nn.compact
    def __call__(self, carry, x):
        c, h = carry
        gates = (nn.Dense(4 * self.features, use_bias=True, name="ih")(x)
                 + nn.Dense(4 * self.features, use_bias=False, name="hh")(h))
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = hard_sigmoid(i)
        f = hard_sigmoid(f)
        g = jnp.tanh(g)
        o = hard_sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (c, h), h

    @nn.nowrap
    def initialize_carry(self, rng, input_shape):
        batch_dims = input_shape[:-1]
        shape = batch_dims + (self.features,)
        return (jnp.zeros(shape), jnp.zeros(shape))

    @property
    def num_feature_axes(self) -> int:
        return 1


class TorchMoji(nn.Module):
    """ids [B, T] (0 = pad) -> 2304-d feature [B, FEATURE_DIM]."""
    nb_tokens: int = NB_TOKENS
    return_attention: bool = False

    def _bilstm(self, x, lengths, name):
        # cells are named explicitly so converted torch weights land on
        # stable paths ({name}_fwd / {name}_bwd)
        fwd = nn.RNN(HardSigmoidLSTMCell(HIDDEN, name=f"{name}_fwd"))
        bwd = nn.RNN(HardSigmoidLSTMCell(HIDDEN, name=f"{name}_bwd"),
                     reverse=True, keep_order=True)
        return jnp.concatenate(
            [fwd(x, seq_lengths=lengths), bwd(x, seq_lengths=lengths)],
            axis=-1)

    @nn.compact
    def __call__(self, ids: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None):
        B, T = ids.shape
        if lengths is None:
            lengths = jnp.maximum(jnp.sum((ids != 0).astype(jnp.int32),
                                          axis=1), 1)
        mask = jnp.arange(T)[None, :] < lengths[:, None]

        emb = nn.Embed(self.nb_tokens, EMBED_DIM, name="embed")(ids)
        emb = jnp.tanh(emb)
        h0 = self._bilstm(emb, lengths, "lstm_0")          # [B, T, 1024]
        h1 = self._bilstm(h0, lengths, "lstm_1")           # [B, T, 1024]
        # [lstm_1, lstm_0, embed] — the reference's merge order
        # (model_def.py:224-227, "ordering ... is important for
        # consistency with the pretrained model"): the published
        # attention vector AND every downstream consumer trained on the
        # 2304-d feature (tm_linear, AuxEmotionNet) assume it
        feats = jnp.concatenate([h1, h0, emb], axis=-1)    # [B, T, 2304]

        # masked exp attention (attlayer.py:13-68)
        att_vec = self.param("attention_vector",
                             nn.initializers.normal(0.05), (FEATURE_DIM,))
        logits = jnp.einsum("btd,d->bt", feats, att_vec)
        scores = jnp.exp(logits - jnp.max(
            jnp.where(mask, logits, -jnp.inf), axis=1, keepdims=True))
        scores = jnp.where(mask, scores, 0.0)
        weights = scores / (jnp.sum(scores, axis=1, keepdims=True) + 1e-8)
        out = jnp.einsum("bt,btd->bd", weights, feats)
        if self.return_attention:
            return out, weights
        return out


# -- tokenizer ---------------------------------------------------------------

_WORD_RE = re.compile(
    r"https?://\S+|www\.\S+"          # urls (reference RE_URL classes)
    r"|@[a-zA-Z0-9_]+"                # mentions (reference RE_MENTION)
    r"|#[a-zA-Z0-9_]+"                # hashtags kept whole (RE_HASHTAG)
    r"|(?:mr|ms|mrs|dr|prof)\."       # titles kept whole (RE_TITLES;
                                      # input is lowercased upstream)
    r"|[a-zA-Z]+(?:'[a-zA-Z]+)?"      # words + contractions ("don't")
    r"|\d+"                           # digit RUNS (reference RE_NUM —
                                      # "3.5" splits into 3 / . / 5)
    r"|[^\sa-zA-Z0-9]+"               # punctuation / emoji runs
)


def tokenize(text: str, vocabulary: Dict[str, int],
             maxlen: int = 30) -> np.ndarray:
    """text -> fixed-length id row [maxlen] (0-padded).

    Matches the reference SentenceTokenizer/WordGenerator pipeline
    (sentence_tokenizer.py:21-120, word_generator.py:64-101,
    filter_utils.py detect_special_tokens): lowercase, CUSTOM_UNKNOWN
    for OOV, CUSTOM_AT/URL for mention/url-bearing tokens, and
    CUSTOM_NUMBER only for int()-parseable digit runs (the reference's
    `int(word)` test — "3.5" is three tokens NUMBER/./NUMBER, not one).
    Golden-ID parity vs the live reference pipeline is tested in
    tests/test_torchmoji.py.
    """
    unknown = vocabulary.get("CUSTOM_UNKNOWN", 1)
    ids: List[int] = []
    for tok in _WORD_RE.findall(text.strip().lower()):
        if tok.startswith(("http://", "https://", "www.")):
            ids.append(vocabulary.get("CUSTOM_URL", 3))
        elif tok.startswith("@"):
            ids.append(vocabulary.get("CUSTOM_AT", 2))
        elif tok[0].isdigit():
            ids.append(vocabulary.get("CUSTOM_NUMBER", 4))
        else:
            ids.append(vocabulary.get(tok, unknown))
        if len(ids) >= maxlen:
            break
    row = np.zeros(maxlen, np.int64)
    row[: len(ids)] = ids[:maxlen]
    return row


def load_vocabulary(path: str) -> Dict[str, int]:
    with open(path) as f:
        return json.load(f)


class TorchMojiEncoder:
    """Host-side convenience wrapper: text -> 2304-d numpy feature."""

    def __init__(self, vocabulary: Dict[str, int], variables,
                 maxlen: int = 30):
        self.vocab = vocabulary
        self.variables = variables
        self.maxlen = maxlen
        nb_tokens = variables["params"]["embed"]["embedding"].shape[0]
        self.model = TorchMoji(nb_tokens=nb_tokens)
        self._fn = jax.jit(self.model.apply)

    def __call__(self, text: str) -> np.ndarray:
        ids = tokenize(text, self.vocab, self.maxlen)[None]
        return np.asarray(self._fn(self.variables, jnp.asarray(ids)))[0]


# -- weight conversion ------------------------------------------------------

def convert_torch_checkpoint(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map the published pytorch_model.bin state dict to flax params.

    PyTorch LSTM layout: weight_ih_l0 [4H, in], weight_hh_l0 [4H, H],
    bias_ih_l0 + bias_hh_l0 (summed into our single ih bias);
    '_reverse' suffixed tensors feed the backward RNN.
    """
    def t(x):
        return np.asarray(x, np.float32).T

    def lstm_params(prefix, reverse):
        sfx = "_reverse" if reverse else ""
        w_ih = t(state_dict[f"{prefix}.weight_ih_l0{sfx}"])
        w_hh = t(state_dict[f"{prefix}.weight_hh_l0{sfx}"])
        b = (np.asarray(state_dict[f"{prefix}.bias_ih_l0{sfx}"], np.float32)
             + np.asarray(state_dict[f"{prefix}.bias_hh_l0{sfx}"],
                          np.float32))
        return {"ih": {"kernel": w_ih, "bias": b},
                "hh": {"kernel": w_hh}}

    params = {
        "embed": {"embedding": np.asarray(state_dict["embed.weight"],
                                          np.float32)},
        "attention_vector": np.asarray(
            state_dict["attention_layer.attention_vector"], np.float32
        ).reshape(-1),
    }
    for i in (0, 1):
        params[f"lstm_{i}_fwd"] = lstm_params(f"lstm_{i}", False)
        params[f"lstm_{i}_bwd"] = lstm_params(f"lstm_{i}", True)
    return params
