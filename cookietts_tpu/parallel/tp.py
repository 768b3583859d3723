"""Tensor-parallel sharding rules.

The reference has no TP (SURVEY.md §2.6 marks it absent; models are
small) — this is the TPU-native extension: instead of a Megatron-style
rewrite of every layer, the big matmul weights are assigned
``PartitionSpec``s over the mesh's ``tp`` axis at the pjit boundary and
XLA GSPMD propagates the shardings and inserts the collectives
(all-gather / reduce-scatter over ICI). This is the scaling-book recipe:
pick a mesh, annotate shardings, let the compiler do the comms.

Rules are (regex, PartitionSpec) pairs matched against the slash-joined
parameter path. They apply identically to the Adam moments (``mu``/``nu``
mirror the param tree, and the path regexes match the shared suffix), so
optimizer state is sharded alongside the weights — TP also divides
optimizer memory.

A rule only fires when every named axis in the spec divides the
corresponding weight dimension; otherwise the param stays replicated, so
the same rule set is safe for tiny test configs.
"""
from __future__ import annotations

import re
from typing import Any, List, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TPRule = Tuple[str, P]

# -- rule sets -----------------------------------------------------------------

# Tacotron2: the decode-cell gate matmuls are the hot weights
# (attention_rnn [1536+1280, 5120] at reference dims). Column-parallel:
# out axis over tp; biases follow.
TACOTRON2_TP_RULES: List[TPRule] = [
    (r"(attention_rnn|decoder_rnn|second_decoder_rnn)/gates/kernel$",
     P(None, "tp")),
    (r"(attention_rnn|decoder_rnn|second_decoder_rnn)/gates/bias$",
     P("tp")),
    (r"encoder/conv\d+/kernel$", P(None, None, "tp")),
    (r"encoder/conv\d+/bias$", P("tp")),
]

# WaveGlow/WaveFlow: every WN hidden layer is column-parallel over its
# channel axis; cond_layer's fused [C_cond, 2*C*n_layers] matmul is the
# single largest weight in the model. Rank-4 rules come FIRST: WN_2d
# (WaveFlow) conv kernels are (kh, kw, in, out) and the 3-length spec
# would land 'tp' on the INPUT-channel dim — correct under GSPMD but
# with activation all-gathers on the contracted axis instead of
# output-sharded compute (spec_for takes the first rule that fits, and
# a 4-spec cannot fit a rank-3 conv, so 1-D WNs fall through).
WAVEGLOW_TP_RULES: List[TPRule] = [
    (r"(start|cond_layer)/kernel$", P(None, "tp")),
    (r"(start|cond_layer)/bias$", P("tp")),
    (r"in_layer.*?/kernel$", P(None, None, None, "tp")),
    (r"in_layer.*?/kernel$", P(None, None, "tp")),
    (r"in_layer.*?/bias$", P("tp")),
    (r"res_skip.*?/kernel$", P(None, None, None, "tp")),
    (r"res_skip.*?/kernel$", P(None, None, "tp")),
    (r"res_skip.*?/bias$", P("tp")),
]

# HiFi-GAN generator: upsample ConvTranspose + MRF resblock convs.
HIFIGAN_TP_RULES: List[TPRule] = [
    (r"(ups|conv)\d+.*/kernel$", P(None, None, "tp")),
    (r"resblock.*/kernel$", P(None, None, "tp")),
]


def _spec_fits(spec: P, shape: Sequence[int], mesh: Mesh) -> bool:
    if len(spec) > len(shape):
        return False
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        axes = (axis,) if isinstance(axis, str) else tuple(axis)
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        if dim % size != 0:
            return False
    return True


def spec_for(path: str, shape: Sequence[int], mesh: Mesh,
             rules: Sequence[TPRule]) -> P:
    for pat, spec in rules:
        if re.search(pat, path) and _spec_fits(spec, shape, mesh):
            return spec
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def tree_shardings(tree: Any, mesh: Mesh,
                   rules: Sequence[TPRule]) -> Any:
    """NamedSharding pytree for ``tree`` (params, opt_state, or a whole
    TrainState): rule-matched leaves shard over tp, the rest replicate."""

    def assign(key_path, x):
        shape = getattr(x, "shape", ())
        return NamedSharding(
            mesh, spec_for(_path_str(key_path), shape, mesh, rules))

    return jax.tree_util.tree_map_with_path(assign, tree)


def describe(tree: Any, mesh: Mesh, rules: Sequence[TPRule]) -> str:
    """Human-readable table of which leaves got tp-sharded (debugging)."""
    lines = []

    def visit(key_path, x):
        spec = spec_for(_path_str(key_path), getattr(x, "shape", ()),
                        mesh, rules)
        if any(s is not None for s in spec):
            lines.append(f"{_path_str(key_path)}  {getattr(x, 'shape', ())}"
                         f"  -> {spec}")
        return x

    jax.tree_util.tree_map_with_path(visit, tree)
    return "\n".join(lines) or "(nothing tp-sharded)"
