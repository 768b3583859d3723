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
    [torchmoji f32[B,D] when the config uses it,] seed u32[],
    gate_threshold f32[], gate_delay i32[], max_steps i32[]) ->
    (mel f32[B,T_dec,M], mel_lengths i32[B], gate f32[B,T_dec],
    alignments f32[B,T_dec,T])``.

    ``gate_threshold`` / ``gate_delay`` are TRACED runtime inputs (they
    only feed the mel_lengths computation, model inference :483-486), so
    artifact serving honors the same per-request form fields as live
    mode (reference app.py:32-51). ``max_steps`` is the per-request
    decoder-step cap (the reference sets decoder.max_decoder_steps per
    request, text2speech.py:409-412): the exported scan length is fixed
    at ``max_decoder_steps`` — jax.export bakes shapes — but
    ``mel_lengths`` clamps to ``min(gate stop, max_steps)``, and the
    serving worker crops every mel to its ``mel_length`` before
    vocoding, so the user-visible behavior matches a shorter decode.
    """
    cfg = model.cfg
    use_tm = int(getattr(cfg, "torchmoji_dim", 0) or 0) > 0

    entries: Dict[str, bytes] = {}
    for B, T in buckets:
        def run(text, text_lengths, speaker_id, torchmoji, seed,
                gate_threshold, gate_delay, max_steps):
            out = model.apply(
                variables, text=text, text_lengths=text_lengths,
                speaker_id=speaker_id, torchmoji_hidden=torchmoji,
                key=jax.random.fold_in(jax.random.PRNGKey(0), seed),
                max_decoder_steps=max_decoder_steps,
                gate_threshold=gate_threshold, gate_delay=gate_delay,
                method=type(model).inference)
            lens = jnp.minimum(out["mel_lengths"],
                               jnp.maximum(max_steps, 1))
            return (out["mel_outputs_postnet"], lens,
                    out["gate_outputs"], out["alignments"])

        if use_tm:
            fn = run
            specs = [_spec((B, T), jnp.int32), _spec((B,), jnp.int32),
                     _spec((B,), jnp.int32),
                     _spec((B, cfg.torchmoji_dim), jnp.float32),
                     _spec((), jnp.uint32),
                     _spec((), jnp.float32), _spec((), jnp.int32),
                     _spec((), jnp.int32)]
        else:
            def fn(text, text_lengths, speaker_id, seed,
                   gate_threshold, gate_delay, max_steps):
                return run(text, text_lengths, speaker_id, None, seed,
                           gate_threshold, gate_delay, max_steps)
            specs = [_spec((B, T), jnp.int32), _spec((B,), jnp.int32),
                     _spec((B,), jnp.int32), _spec((), jnp.uint32),
                     _spec((), jnp.float32), _spec((), jnp.int32),
                     _spec((), jnp.int32)]
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


class ArtifactT2SDecoder:
    """Serving decoder backed by a saved export artifact — no model
    classes, checkpoints, or converters on the host.

    ``decode(text [B,T], lens, speaker_id, torchmoji, seed u32,
    [gate_threshold, gate_delay, max_steps])`` pads the text to the
    smallest exported (batch, text) bucket that fits and returns (mels,
    mel_lengths, alignments cropped to T). Artifacts exported with gate
    inputs (meta ``t2s.gate_inputs``) honor per-request gate
    threshold/delay like live mode, and ones with step inputs (meta
    ``t2s.step_inputs``) honor a per-request decoder-step cap
    (mel_lengths clamp; the scan length itself is baked); older
    artifacts baked these in and ignore the overrides. ``vocoder(mel [B,T_mel,M], seed)`` routes to
    the exported vocoder bucket when the artifact carries one.
    """

    def __init__(self, path: str):
        fns, meta = load_artifact(path)
        t2s = meta.get("t2s")
        if not t2s:
            raise ValueError(f"{path} has no exported t2s functions")
        self.meta = meta
        buckets = sorted(tuple(b) for b in t2s["buckets"])
        self.batch = buckets[0][0]
        if any(b != self.batch for b, _ in buckets):
            raise ValueError("mixed batch sizes in artifact buckets")
        self.text_buckets = sorted(t for _, t in buckets)
        self.torchmoji_dim = int(t2s.get("torchmoji_dim") or 0)
        self.n_mel_channels = int(t2s.get("n_mel_channels", 80))
        self.speaker_ids = t2s.get("speaker_ids") or {"default": 0}
        self.audio = dict(t2s.get("audio") or {})
        self.gate_inputs = bool(t2s.get("gate_inputs", False))
        self.gate_threshold = float(t2s.get("gate_threshold", 0.5))
        self.gate_delay = int(t2s.get("gate_delay", 10))
        self.step_inputs = bool(t2s.get("step_inputs", False))
        self.max_decoder_steps = int(t2s.get("max_decoder_steps", 0))
        self._fns = {t: fns[f"t2s_b{self.batch}_t{t}"]
                     for t in self.text_buckets}
        self._voc_fns = {}
        voc = meta.get("vocoder")
        if voc:
            self.audio.update(voc.get("audio") or {})
            # old artifacts predate the needs_key flag; every in-repo
            # exporter used needs_key=True, so that is the legacy default
            self._voc_needs_key = bool(voc.get("needs_key", True))
            for b, t in (tuple(x) for x in voc["buckets"]):
                self._voc_fns[(b, t)] = fns[f"vocoder_b{b}_t{t}"]

    def decode(self, text, text_lengths, speaker_id, torchmoji, seed,
               gate_threshold=None, gate_delay=None, max_steps=None):
        text = np.asarray(text)
        B, T = text.shape
        if B != self.batch:
            raise ValueError(
                f"artifact exported at batch {self.batch}, got {B} "
                "(set T2SConfig.batch_size to match)")
        fit = [t for t in self.text_buckets if t >= T]
        if not fit:
            raise ValueError(
                f"text length {T} exceeds the largest exported bucket "
                f"{self.text_buckets[-1]}")
        tb = fit[0]
        padded = np.zeros((B, tb), text.dtype)
        padded[:, :T] = text
        args = [jnp.asarray(padded), jnp.asarray(text_lengths),
                jnp.asarray(speaker_id)]
        if self.torchmoji_dim:
            tm = np.zeros((B, self.torchmoji_dim), np.float32)
            if torchmoji is not None:
                src = np.asarray(torchmoji)
                w = min(self.torchmoji_dim, src.shape[-1])
                if src.shape[-1] != self.torchmoji_dim:
                    print(f"[artifact] torchmoji dim {src.shape[-1]} != "
                          f"exported {self.torchmoji_dim}; copying the "
                          f"first {w} dims")
                tm[:, :w] = src[..., :w]
            args.append(jnp.asarray(tm))
        args.append(jnp.asarray(seed, jnp.uint32))
        if self.gate_inputs:
            thr = (self.gate_threshold if gate_threshold is None
                   else gate_threshold)
            delay = self.gate_delay if gate_delay is None else gate_delay
            args += [jnp.asarray(thr, jnp.float32),
                     jnp.asarray(delay, jnp.int32)]
        if self.step_inputs:
            cap = (self.max_decoder_steps if max_steps is None
                   else max_steps)
            args.append(jnp.asarray(max(int(cap), 1), jnp.int32))
        mels, mel_lengths, _gate, align = self._fns[tb](*args)
        return mels, mel_lengths, align[:, :, :T]

    def vocoder(self, mel, seed=0):
        """Route ``mel [B, T, M]`` to the smallest exported bucket that
        fits: rows pad with silence up to the bucket batch (the serving
        worker hands RAGGED segment chunks, never artifact-aligned
        batches) and time pads to the bucket frames; output crops back
        to [B, T*hop]."""
        if not self._voc_fns:
            raise ValueError("artifact has no exported vocoder")
        mel = np.asarray(mel)
        B, T = mel.shape[:2]
        keys = sorted(k for k in self._voc_fns if k[0] >= B and k[1] >= T)
        if not keys:
            raise ValueError(
                f"no vocoder bucket fits mel [{B}, {T}]; exported: "
                f"{sorted(self._voc_fns)}")
        b, t = min(keys, key=lambda k: (k[0] * k[1], k))
        padded = np.full((b, t, mel.shape[2]), -11.52, np.float32)
        padded[:B, :T] = mel
        hop = int(self.audio.get("hop_length", 0))
        voc_args = [jnp.asarray(padded)]
        if getattr(self, "_voc_needs_key", True):
            voc_args.append(jnp.asarray(seed, jnp.uint32))
        audio = self._voc_fns[(b, t)](*voc_args)
        audio = audio[:B]
        return audio[:, : T * hop] if hop else audio

    def make_vocoder_fn(self):
        """A T2S-compatible ``vocoder_fn(mel) -> audio`` closure."""
        import itertools
        counter = itertools.count()

        def fn(mel):
            return self.vocoder(mel, seed=next(counter))

        fn.stochastic = True       # per-call seeds: skip chunked vocoding
        return fn
