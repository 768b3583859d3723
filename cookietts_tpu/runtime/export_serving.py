"""AOT serving export (jax.export / StableHLO).

The reference serves from live torch modules rebuilt from source at
load time (t2s_server/app.py + text2speech.py). Here the jitted serving
functions are exported AHEAD OF TIME into serialized StableHLO
artifacts (``jax.export``): weights are baked in as constants, shapes
are fixed per serving bucket (the framework's static-shape philosophy),
and the result loads and runs WITHOUT the model classes, the checkpoint
or any conversion code — the TPU-native deployment story for §2.5's
inference service. Artifacts are exported for cpu+tpu by default, so
one file serves both a TPU fleet and a CPU canary.

Container format: one ``.npz`` holding each serialized function as a
uint8 array plus a ``meta`` JSON string (buckets, model config hints,
audio info).
"""
from __future__ import annotations

import json
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

DEFAULT_PLATFORMS = ("cpu", "tpu")


def _spec(shape, dtype) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(shape, dtype)


def export_bytes(fn: Callable, specs: Sequence[jax.ShapeDtypeStruct],
                 platforms: Sequence[str] = DEFAULT_PLATFORMS) -> bytes:
    """Serialize ``fn`` traced at ``specs`` to portable StableHLO."""
    exp = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(*specs)
    return exp.serialize()


def export_tacotron2_serving(
        model, variables: Dict[str, Any],
        buckets: Sequence[Tuple[int, int]],
        max_decoder_steps: Optional[int] = None,
        platforms: Sequence[str] = DEFAULT_PLATFORMS) -> Dict[str, bytes]:
    """One exported decode function per (batch, text_len) bucket.

    Exported signature (all weights baked in):
    ``(text i32[B,T], text_lengths i32[B], speaker_id i32[B],
    [torchmoji f32[B,D] when the config uses it,] seed u32[]) ->
    (mel f32[B,T_dec,M], mel_lengths i32[B], gate f32[B,T_dec],
    alignments f32[B,T_dec,T])``.
    """
    cfg = model.cfg
    use_tm = int(getattr(cfg, "torchmoji_dim", 0) or 0) > 0

    entries: Dict[str, bytes] = {}
    for B, T in buckets:
        if use_tm:
            def fn(text, text_lengths, speaker_id, torchmoji, seed):
                out = model.apply(
                    variables, text=text, text_lengths=text_lengths,
                    speaker_id=speaker_id, torchmoji_hidden=torchmoji,
                    key=jax.random.fold_in(jax.random.PRNGKey(0), seed),
                    max_decoder_steps=max_decoder_steps,
                    method=type(model).inference)
                return (out["mel_outputs_postnet"], out["mel_lengths"],
                        out["gate_outputs"], out["alignments"])
            specs = [_spec((B, T), jnp.int32), _spec((B,), jnp.int32),
                     _spec((B,), jnp.int32),
                     _spec((B, cfg.torchmoji_dim), jnp.float32),
                     _spec((), jnp.uint32)]
        else:
            def fn(text, text_lengths, speaker_id, seed):
                out = model.apply(
                    variables, text=text, text_lengths=text_lengths,
                    speaker_id=speaker_id,
                    key=jax.random.fold_in(jax.random.PRNGKey(0), seed),
                    max_decoder_steps=max_decoder_steps,
                    method=type(model).inference)
                return (out["mel_outputs_postnet"], out["mel_lengths"],
                        out["gate_outputs"], out["alignments"])
            specs = [_spec((B, T), jnp.int32), _spec((B,), jnp.int32),
                     _spec((B,), jnp.int32), _spec((), jnp.uint32)]
        entries[f"t2s_b{B}_t{T}"] = export_bytes(fn, specs, platforms)
    return entries


def export_vocoder_serving(
        infer_fn: Callable, n_mel_channels: int,
        buckets: Sequence[Tuple[int, int]],
        needs_key: bool = False,
        platforms: Sequence[str] = DEFAULT_PLATFORMS) -> Dict[str, bytes]:
    """One exported vocoder per (batch, mel_frames) bucket.

    ``infer_fn(mel [B,T,M]) -> audio`` (HiFi-GAN) or, with
    ``needs_key``, ``infer_fn(mel, key) -> audio`` (flow vocoders; the
    exported function takes a u32 seed instead of a key).
    """
    entries: Dict[str, bytes] = {}
    for B, T in buckets:
        if needs_key:
            def fn(mel, seed):
                return infer_fn(
                    mel, jax.random.fold_in(jax.random.PRNGKey(0), seed))
            specs = [_spec((B, T, n_mel_channels), jnp.float32),
                     _spec((), jnp.uint32)]
        else:
            fn = infer_fn
            specs = [_spec((B, T, n_mel_channels), jnp.float32)]
        entries[f"vocoder_b{B}_t{T}"] = export_bytes(fn, specs, platforms)
    return entries


def save_artifact(path: str, entries: Dict[str, bytes],
                  meta: Optional[Dict[str, Any]] = None) -> None:
    arrays = {k: np.frombuffer(v, np.uint8) for k, v in entries.items()}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode("utf-8"), np.uint8)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    import os
    os.replace(tmp, path)


def load_artifact(path: str
                  ) -> Tuple[Dict[str, Callable], Dict[str, Any]]:
    """(callables, meta): each callable runs the deserialized StableHLO
    on the current backend — no model code or checkpoint needed."""
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"].tobytes()).decode("utf-8"))
    fns: Dict[str, Callable] = {}
    for k in data.files:
        if k == "__meta__":
            continue
        exp = jax_export.deserialize(bytearray(data[k].tobytes()))
        fns[k] = exp.call
    return fns, meta
