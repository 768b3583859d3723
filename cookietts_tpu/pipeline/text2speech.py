"""T2S — the text-to-speech inference worker.

Capability rebuild of CookieTTS/_5_infer/t2s_server/text2speech.py:

- :func:`parse_text_into_segments` — quote/sentence-aware splitting of
  arbitrary-length input into synthesizable segments (:40-149).
- speaker fuzzy matching via difflib (:327-330) and per-segment speaker
  interleave modes (:459-474).
- **best-of-N rejection sampling** (:546-634): batch-generate candidates,
  score with the alignment ``weighted_score``, keep the best per segment,
  retry below-target segments until ``target_score`` or ``max_attempts``.
- dynamic max decoder steps from text length (:409-412,457).
- batched vocoding (:658-666) and in-process concat of the output audio
  (replaces the reference's sox subprocess, :707-746).

The torch/Flask machinery is gone: generation is one jitted batched scan,
scoring is jitted, and the host loop only does control flow.
"""
from __future__ import annotations

import dataclasses
import difflib
import re
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.tacotron2 import Tacotron2
from ..ops.metrics import alignment_metric, weighted_score
from ..text import text_to_sequence


# -- text segmentation (reference :40-149) -----------------------------------

_SENT_SPLIT = re.compile(r"(?<=[.!?;:])\s+")


def parse_text_into_segments(text: str, split_at_quotes: bool = True,
                             target_segment_length: int = 120,
                             max_segment_length: int = 256) -> List[str]:
    """Split input into segments at quote and sentence boundaries.

    Quoted spans are kept intact as their own segments when
    ``split_at_quotes`` (dialogue keeps one voice); long stretches are
    re-packed into chunks near ``target_segment_length`` chars without
    crossing ``max_segment_length``.
    """
    text = text.replace("\n", " ").strip()
    # word processors auto-curl quotes; normalize so dialogue splitting
    # and speaker_mode="quotes" see them (the reference splits on '"')
    text = text.replace("“", '"').replace("”", '"')
    if not text:
        return []

    # split out quoted spans first
    spans: List[str] = []
    if split_at_quotes and '"' in text:
        parts = text.split('"')
        for i, part in enumerate(parts):
            part = part.strip()
            if not part:
                continue
            spans.append(f'"{part}"' if i % 2 == 1 else part)
    else:
        spans = [text]

    # sentence-split each span, then greedily pack to target length
    segments: List[str] = []
    for span in spans:
        quoted = span.lstrip().startswith(('"', "\u201c"))
        pieces: List[str] = []
        sentences = [s.strip() for s in _SENT_SPLIT.split(span) if s.strip()]
        cur = ""
        for s in sentences:
            while len(s) > max_segment_length:   # hard-split huge sentences
                cut = s.rfind(" ", 0, max_segment_length)
                cut = cut if cut > 0 else max_segment_length
                if cur:
                    pieces.append(cur)
                    cur = ""
                pieces.append(s[:cut].strip())
                s = s[cut:].strip()
            if cur and len(cur) + 1 + len(s) > target_segment_length:
                pieces.append(cur)
                cur = s
            else:
                cur = f"{cur} {s}".strip()
        if cur:
            pieces.append(cur)
        if quoted:
            # a long quote re-packed into several segments must keep its
            # quote marker on EVERY piece, or the "quotes" speaker mode
            # hands the quote's continuation to the narrator voice
            pieces = [p if p.startswith(('"', "\u201c")) else f'"{p}'
                      for p in pieces]
        segments.extend(pieces)
    return segments


def fuzzy_match_speaker(name: str, known: Sequence[str]) -> str:
    """Closest known speaker name (reference :327-330 difflib)."""
    matches = difflib.get_close_matches(name, known, n=1, cutoff=0.0)
    if not matches:
        raise KeyError(f"unknown speaker {name!r}")
    return matches[0]


def interleave_speakers(segments: Sequence[str] | int,
                        speakers: Sequence[str],
                        mode: str = "cycle next",
                        rng: Optional[np.random.Generator] = None
                        ) -> List[str]:
    """Assign a speaker to each segment (reference :459-474 modes).

    ``segments`` may be the segment texts (enables the quote-aware mode)
    or just a count. Modes: "cycle next" / "cycle all" / "random" /
    "quotes" — the dialogue mode: the FIRST speaker narrates unquoted
    segments, quoted segments cycle through the remaining speakers
    (reference text2speech.py:477-479's speakers-vs-narrators split).
    """
    if isinstance(segments, int):
        texts = [""] * segments
    else:
        texts = list(segments)
    n_segments = len(texts)
    rng = rng or np.random.default_rng(0)
    if mode == "quotes":
        narrator = speakers[0]
        voices = list(speakers[1:]) or [speakers[0]]
        out, i = [], 0
        for t in texts:
            if t.strip().startswith(('"', "“")):
                out.append(voices[i % len(voices)])
                i += 1
            else:
                out.append(narrator)
        return out
    if mode == "cycle next":
        return [speakers[i % len(speakers)] for i in range(n_segments)]
    if mode == "cycle all":
        out, i = [], 0
        for _ in range(n_segments):
            out.append(speakers[i])
            i = (i + 1) % len(speakers)
        return out
    if mode == "random":
        return [speakers[int(rng.integers(len(speakers)))]
                for _ in range(n_segments)]
    # default: first speaker everywhere
    return [speakers[0] for _ in range(n_segments)]


@dataclasses.dataclass
class T2SConfig:
    target_score: float = 0.75     # t2s_config.json default
    max_attempts: int = 64
    batch_size: int = 32           # candidates per generation round
    max_text_len: int = 256        # padded text length (static shape)
    frames_per_char: float = 10.0  # dynamic max decoder steps scale
    max_decoder_steps: int = 3000
    vocoder_batch_size: int = 16
    # chunked vocoding for LONG segments: mels above this many frames
    # vocode in halo-overlapped chunks (pipeline/streaming.py). Within
    # infer() this bounds PEAK VOCODER MEMORY (the API still returns one
    # assembled waveform — callers that want true streaming consume the
    # pipeline/streaming.streaming_vocode generator directly); audio is
    # bit-identical to the whole-utterance run for deterministic
    # vocoders, and stochastic ones (WaveGlow, vocoder_fn.stochastic)
    # skip chunking to avoid per-chunk noise seams. 0 disables.
    streaming_over_frames: int = 0
    streaming_chunk_frames: int = 256
    streaming_halo_frames: int = 32
    gate_threshold: float = 0.5
    gate_delay: int = 10
    text_cleaners: Tuple[str, ...] = ("english_cleaners",)
    step_buckets: Tuple[int, ...] = (256, 512, 1024, 2048)
    # segmentation (reference parse_text_into_segments params)
    split_at_quotes: bool = True
    target_segment_length: int = 120
    max_segment_length: int = 256


class T2S:
    """Programmatic TTS API (reference T2S class, text2speech.py:151-776).

    Construction is dependency-injected for testability:
        T2S(cfg, tts_model, tts_variables, speaker_ids={name: id},
            vocoder_fn=...)   # vocoder_fn(mel [B,T,M]) -> audio [B,T*hop]
    """

    def __init__(self, cfg: T2SConfig, tts_model: Optional[Tacotron2],
                 tts_variables: Any, speaker_ids: Dict[str, int],
                 vocoder_fn: Optional[Callable] = None,
                 torchmoji_fn: Optional[Callable[[str], np.ndarray]] = None,
                 arpa_fn: Optional[Callable[[str], str]] = None,
                 denoiser_fn: Optional[Callable] = None,
                 sample_rate: int = 44100, hop_length: int = 512,
                 decode_fn: Optional[Callable] = None,
                 torchmoji_dim: Optional[int] = None):
        """``decode_fn`` replaces the live model for AOT-artifact serving
        (runtime/export_serving.ArtifactT2SDecoder.decode): it takes
        (text, text_lengths, speaker_id, torchmoji, seed u32[,
        gate_threshold, gate_delay]) and returns (mels, mel_lengths,
        alignments); scoring runs on the returned alignments. Artifacts
        exported with gate inputs honor the per-request gate form fields
        like live mode; legacy artifacts baked them in (the step count
        is always fixed at export)."""
        self.cfg = cfg
        self.model = tts_model
        self.decode_fn = decode_fn
        if torchmoji_dim is None and tts_model is None:
            raise ValueError(
                "decode_fn-only construction needs torchmoji_dim "
                "(ArtifactT2SDecoder.torchmoji_dim)")
        self.torchmoji_dim = (torchmoji_dim if torchmoji_dim is not None
                              else tts_model.cfg.torchmoji_dim)
        self.variables = tts_variables
        self.speaker_ids = dict(speaker_ids)
        self.vocoder_fn = vocoder_fn
        self.torchmoji_fn = torchmoji_fn
        self.arpa_fn = arpa_fn       # {ARPA} substitution (reference :527-528)
        self.denoiser_fn = denoiser_fn   # (audio, strength) -> audio
        self.sample_rate = sample_rate
        self.hop_length = hop_length
        self._infer_cache: Dict[int, Callable] = {}

    # -- jitted generation+scoring for a fixed max_steps --------------------
    def _infer_fn(self, max_steps: int) -> Callable:
        """Early-exit decode (stops one chunk after all gates fire) with
        gate threshold/delay as TRACED args so per-request form fields
        never recompile."""
        if max_steps in self._infer_cache:
            return self._infer_cache[max_steps]
        if self.decode_fn is not None:
            import inspect
            try:
                sig_params = inspect.signature(self.decode_fn).parameters
            except (TypeError, ValueError):
                sig_params = {}
            takes_gates = "gate_threshold" in sig_params
            takes_steps = "max_steps" in sig_params

            def run_artifact(variables, text, text_lengths, speaker_id,
                             torchmoji, key, gate_threshold, gate_delay):
                del variables
                seed = jnp.asarray(
                    np.asarray(jax.random.key_data(key)).ravel()[-1],
                    jnp.uint32)
                if takes_gates:   # gate-input artifacts honor the request
                    kw = dict(gate_threshold=gate_threshold,
                              gate_delay=gate_delay)
                    if takes_steps:
                        # the exported scan length is baked, but the
                        # per-request step cap clamps mel_lengths (the
                        # worker crops mels to mel_lengths before
                        # vocoding — reference text2speech.py:409-412)
                        kw["max_steps"] = max_steps
                    mels, mel_lengths, align = self.decode_fn(
                        text, text_lengths, speaker_id, torchmoji, seed,
                        **kw)
                else:             # legacy artifacts baked them in at export
                    mels, mel_lengths, align = self.decode_fn(
                        text, text_lengths, speaker_id, torchmoji, seed)
                atd = alignment_metric(align, text_lengths, mel_lengths)
                scores = weighted_score(atd, text_lengths, mel_lengths)
                return mels, mel_lengths, scores
            self._infer_cache[max_steps] = run_artifact
            return run_artifact
        chunk = max(64, self.model.cfg.gate_delay)

        def run(variables, text, text_lengths, speaker_id, torchmoji, key,
                gate_threshold, gate_delay):
            out = self.model.apply(
                variables, text, text_lengths, speaker_id, torchmoji,
                key=key, max_decoder_steps=max_steps,
                early_exit=True, chunk_size=chunk,
                gate_threshold=gate_threshold, gate_delay=gate_delay,
                method=Tacotron2.inference)
            atd = alignment_metric(out["alignments"], text_lengths,
                                   out["mel_lengths"])
            scores = weighted_score(atd, text_lengths, out["mel_lengths"])
            return (out["mel_outputs_postnet"], out["mel_lengths"],
                    scores)

        fn = jax.jit(run)
        self._infer_cache[max_steps] = fn
        return fn

    def _round_steps(self, n: int) -> int:
        """Round max decoder steps up to a small set of static shapes."""
        for s in self.cfg.step_buckets:
            if n <= s:
                return s
        return self.cfg.max_decoder_steps

    # -- main entry ------------------------------------------------------------
    def infer(self, text: str, speaker: Sequence[str] | str = (),
              use_arpabet: bool = False,
              speaker_mode: str = "cycle next",
              target_score: Optional[float] = None,
              max_attempts: Optional[int] = None,
              batch_size: Optional[int] = None,
              gate_threshold: Optional[float] = None,
              gate_delay: Optional[int] = None,
              max_decoder_steps: Optional[int] = None,
              max_duration_s: Optional[float] = None,
              dyna_max_duration_s: Optional[float] = None,
              denoise_strength: float = 0.0,
              style_mode: str = "torchmoji",
              split_at_quotes: Optional[bool] = None,
              target_segment_length: Optional[int] = None,
              cat_silence_s: float = 0.0,
              seed: int = 0) -> Dict[str, Any]:
        """Synthesize ``text``. Returns dict with mels per segment, scores,
        attempts, timing stats, and (if a vocoder is attached) the audio.

        ``use_arpabet`` substitutes {ARPA} pronunciations before encoding
        (reference :527-528); ``gate_threshold`` / ``gate_delay`` /
        ``max_decoder_steps`` / ``denoise_strength`` mirror the reference
        server's per-request form fields (app.py:32-51).
        ``dyna_max_duration_s`` is the reference's per-CHARACTER duration
        cap (seconds/char; decoder steps = min(chars * dyna * sr/hop,
        max_duration_s * sr/hop), text2speech.py:411) — it overrides the
        config's frames_per_char for this request.
        """
        cfg = self.cfg
        target = target_score if target_score is not None else cfg.target_score
        # None-checks, not falsy-or: an explicit 0 must not silently
        # become the default (the adjacent gate args already do this)
        max_att = cfg.max_attempts if max_attempts is None else max_attempts
        bsz = cfg.batch_size if batch_size is None else batch_size
        for nm, v in (("max_attempts", max_att), ("batch_size", bsz),
                      ("max_decoder_steps", max_decoder_steps)):
            if v is not None and v <= 0:
                raise ValueError(f"{nm} must be positive, got {v}")
        thr = cfg.gate_threshold if gate_threshold is None else gate_threshold
        delay = cfg.gate_delay if gate_delay is None else gate_delay
        if self.model is not None:
            # the early-exit decode stops one chunk after the COMPILED
            # gate threshold fires and only generates cfg.gate_delay
            # extra frames — a request past those would count
            # never-generated zero frames into mel_lengths (loud noise
            # tails). Clamp and say so.
            chunk_limit = max(64, self.model.cfg.gate_delay)
            if delay > chunk_limit:
                print(f"[t2s] gate_delay {delay} clamped to {chunk_limit} "
                      "(early-exit chunk size)")
                delay = chunk_limit
            if thr > self.model.cfg.gate_threshold:
                print(f"[t2s] gate_threshold {thr} clamped to the "
                      f"compiled {self.model.cfg.gate_threshold}")
                thr = self.model.cfg.gate_threshold
        steps_cap = (cfg.max_decoder_steps if max_decoder_steps is None
                     else max_decoder_steps)
        if max_duration_s:     # reference input_max_duration_s (app.py:42)
            steps_cap = min(steps_cap, max(1, int(
                max_duration_s * self.sample_rate / self.hop_length)))
        t_start = time.time()

        if isinstance(speaker, str):
            speaker = [speaker]
        if not speaker:
            speaker = [next(iter(self.speaker_ids))]
        known = list(self.speaker_ids)
        speaker = [fuzzy_match_speaker(s, known) for s in speaker]

        segments = parse_text_into_segments(
            text,
            split_at_quotes=(cfg.split_at_quotes if split_at_quotes is None
                             else split_at_quotes),
            target_segment_length=(target_segment_length
                                   or cfg.target_segment_length),
            max_segment_length=cfg.max_segment_length)
        if not segments:
            return {"segments": [], "mels": [], "scores": [],
                    "audio": np.zeros(0, np.float32)}
        # encode all segments (host); {ARPA} substitution first when asked
        def _encode(t_):
            t2 = (self.arpa_fn(t_) if use_arpabet and self.arpa_fn
                  else t_)
            return np.asarray(text_to_sequence(t2, cfg.text_cleaners),
                              np.int32)

        seqs = [_encode(t_) for t_ in segments]
        # token-level never-truncate: number/abbreviation expansion and
        # {ARPA} substitution can blow a char-packed segment past
        # max_text_len, and the decode buckets cap there — split the
        # TEXT at a space instead of silently dropping trailing words
        i = 0
        while i < len(segments):
            t_ = segments[i]
            if len(seqs[i]) <= cfg.max_text_len or " " not in t_.strip():
                i += 1
                continue
            cut = t_.rfind(" ", 1, len(t_) // 2 + 1)
            cut = cut if cut > 0 else t_.find(" ", 1)
            halves = [t_[:cut].strip(), t_[cut:].strip()]
            if t_.lstrip().startswith(('"', "“")):
                # keep the quote marker on BOTH pieces of a split quoted
                # segment, or speaker_mode="quotes" hands the quote's
                # continuation to the narrator voice (same invariant as
                # parse_text_into_segments' re-pack)
                halves = [h if h.startswith(('"', "“")) else f'"{h}'
                          for h in halves]
            segments[i: i + 1] = halves
            seqs[i: i + 1] = [_encode(h) for h in halves]
        seg_speakers = interleave_speakers(segments, speaker, speaker_mode,
                                           np.random.default_rng(seed))
        tm = None
        if self.torchmoji_fn is not None and style_mode != "none":
            # torchMoji emotion embedding per segment conditions the model
            # (GST "TP" path when the model has style tokens — ref :497-509)
            tm = [self.torchmoji_fn(s).astype(np.float32) for s in segments]

        best_mels: List[Optional[np.ndarray]] = [None] * len(segments)
        best_scores = np.full(len(segments), -np.inf)
        best_lengths = np.zeros(len(segments), np.int64)
        attempts = np.zeros(len(segments), np.int64)
        key = jax.random.PRNGKey(seed)

        pending = list(range(len(segments)))
        while pending:
            # fill one candidate batch: spread attempts across pending segs
            batch_idx = (pending * ((bsz // len(pending)) + 1))[:bsz]
            t_max = max(len(seqs[i]) for i in batch_idx)
            t_pad = min(-(-t_max // 32) * 32, cfg.max_text_len)
            text_arr = np.zeros((bsz, t_pad), np.int32)
            lens = np.zeros((bsz,), np.int32)
            spk = np.zeros((bsz,), np.int32)
            tm_arr = np.zeros(
                (bsz, max(self.torchmoji_dim, 1)), np.float32)
            for row, i in enumerate(batch_idx):
                n = min(len(seqs[i]), t_pad)
                text_arr[row, :n] = seqs[i][:n]
                lens[row] = n
                spk[row] = self.speaker_ids[seg_speakers[i]]
                if tm is not None:
                    tm_arr[row] = tm[i]
            # compile ONLY at bucket step counts: feeding a raw
            # per-request steps_cap to the jit would compile (and cache
            # forever) a fresh decode per distinct duration a client
            # sends; the cap is enforced on mel_lengths after decode
            fpc = (dyna_max_duration_s * self.sample_rate / self.hop_length
                   if dyna_max_duration_s else cfg.frames_per_char)
            # with dyna given, chars*dyna is a HARD cap like the
            # reference's (min with max_duration_s, :411); without it
            # frames_per_char is only the bucket-selection heuristic
            cap_here = (max(1, min(steps_cap, int(t_max * fpc) + int(delay)))
                        if dyna_max_duration_s else steps_cap)
            max_steps = self._round_steps(min(
                int(t_max * fpc) + int(delay), steps_cap))

            key, sub = jax.random.split(key)
            fn = self._infer_fn(max_steps)
            mels, mel_lengths, scores = fn(
                self.variables, jnp.asarray(text_arr), jnp.asarray(lens),
                jnp.asarray(spk), jnp.asarray(tm_arr), sub,
                jnp.asarray(thr, jnp.float32), jnp.asarray(delay, jnp.int32))
            mels = np.asarray(mels)
            # the per-request duration/step cap applies HERE (the decode
            # ran at a bucket length; the worker crops to mel_lengths)
            mel_lengths = np.minimum(np.asarray(mel_lengths), cap_here)
            scores = np.asarray(scores)

            # a diverged decode can score NaN, which would never beat
            # the -inf sentinel and leave best_mels[i] = None forever
            scores = np.where(np.isfinite(scores), scores, -1e9)
            for row, i in enumerate(batch_idx):
                attempts[i] += 1
                if scores[row] > best_scores[i]:
                    best_scores[i] = scores[row]
                    best_lengths[i] = mel_lengths[row]
                    # copy: a view would pin the whole round's batch
                    best_mels[i] = mels[row, : mel_lengths[row]].copy()
            pending = [i for i in pending
                       if best_scores[i] < target and attempts[i] < max_att]

        gen_time = time.time() - t_start
        # (failure_rate below uses the reference's FIXED <0.6 score
        # threshold, text2speech.py:766-769 — intentionally not the
        # per-request target_score)

        # vocode in batches (reference :658-666)
        audio = np.zeros(0, np.float32)
        if self.vocoder_fn is not None:
            pieces: List[np.ndarray] = []
            vb = cfg.vocoder_batch_size
            n_mel = best_mels[0].shape[1]
            silence = np.zeros(int(cat_silence_s * self.sample_rate),
                               np.float32)
            for i0 in range(0, len(best_mels), vb):
                chunk = best_mels[i0:i0 + vb]
                t_max = max(m.shape[0] for m in chunk)
                t_pad = -(-t_max // 32) * 32
                mel_in = np.full((len(chunk), t_pad, n_mel), -11.52,
                                 np.float32)
                for r, m in enumerate(chunk):
                    mel_in[r, : m.shape[0]] = m
                if (cfg.streaming_over_frames
                        and t_pad > cfg.streaming_over_frames
                        and not getattr(self.vocoder_fn, "stochastic",
                                        False)):
                    # long segment: halo-overlapped chunks, bit-identical
                    # assembled audio at bounded peak vocoder memory
                    # (pipeline/streaming.py; stochastic vocoders skip —
                    # per-chunk noise would seam)
                    from .streaming import vocode_streamed
                    wav = vocode_streamed(
                        self.vocoder_fn, mel_in,
                        chunk_frames=cfg.streaming_chunk_frames,
                        halo_frames=cfg.streaming_halo_frames,
                        hop_length=self.hop_length)
                else:
                    wav = np.asarray(self.vocoder_fn(jnp.asarray(mel_in)))
                for r, m in enumerate(chunk):
                    if pieces and len(silence):
                        pieces.append(silence)   # input_cat_silence_s
                    pieces.append(wav[r, : m.shape[0] * self.hop_length])
            audio = np.concatenate(pieces) if pieces else audio
            if denoise_strength > 0.0 and self.denoiser_fn is not None:
                # vocoder-bias removal (reference denoiser.py:7-71)
                audio = np.asarray(
                    self.denoiser_fn(jnp.asarray(audio[None]),
                                     denoise_strength))[0]

        total = time.time() - t_start
        audio_seconds = float(best_lengths.sum() * self.hop_length
                              / self.sample_rate)
        return {
            "segments": segments,
            "speakers": seg_speakers,
            "mels": best_mels,
            "mel_lengths": best_lengths,
            "scores": best_scores,
            "attempts": attempts,
            "failure_rate": float(np.mean(best_scores < 0.6)),
            "audio": audio,
            "audio_seconds": audio_seconds,
            "gen_time": gen_time,
            "total_time": total,
            "xrt": audio_seconds / max(total, 1e-6),
        }
