"""Streaming vocoding: chunked synthesis with receptive-field halos.

The reference vocodes whole utterances at once (text2speech.py:658-666),
so the first audio sample exists only after the last mel frame is
vocoded. For deterministic convolutional vocoders (HiFi-GAN), output
sample ``t`` depends only on mel frames within the generator's receptive
field around ``t/hop`` — so vocoding overlapping chunks and cropping the
halos yields audio BIT-IDENTICAL to the full run while streaming:

- chunks are clamped slices ``[s - halo, e + halo] ∩ [0, T]`` of the real
  mel (never artificially padded): at true sequence edges the generator
  applies its own zero padding exactly as the full run does, and interior
  crop points sit ``halo`` frames away from any chunk edge;
- all interior chunks share one shape, so XLA compiles the chunk program
  once and streaming costs only the halo recompute
  (``2 * halo / chunk`` extra frames).

Not for stochastic vocoders at exactness level: WaveGlow samples z per
position, so chunked runs draw different noise — use the full inverse
(it is already one parallel program) or accept per-chunk keys.
"""
from __future__ import annotations

from typing import Callable, Iterator, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def streaming_vocode(vocoder_fn: Callable, mel,
                     chunk_frames: int = 256, halo_frames: int = 32,
                     hop_length: Optional[int] = None
                     ) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield ``(start_sample, audio_chunk [B, chunk*hop])`` pieces whose
    concatenation equals ``vocoder_fn(mel)`` exactly (see module doc for
    the halo condition). ``mel``: [B, T, n_mel].

    EVERY chunk is the same width ``chunk + 2*halo`` — edge chunks slide
    their window inward over REAL frames instead of shrinking (a true
    sequence edge inside the window behaves exactly like the full run's
    own zero padding) — so the vocoder compiles ONE program per batch
    shape regardless of utterance length. Mels shorter than one window
    vocode whole."""
    mel = jnp.asarray(mel)
    T = mel.shape[1]
    hop = hop_length
    W = chunk_frames + 2 * halo_frames
    if T <= W:
        audio = np.asarray(vocoder_fn(mel))
        yield 0, audio
        return
    for s in range(0, T, chunk_frames):
        e = min(s + chunk_frames, T)
        lo = min(max(0, s - halo_frames), T - W)
        audio = vocoder_fn(mel[:, lo: lo + W])
        if hop is None:
            hop = audio.shape[1] // W
        piece = np.asarray(audio[:, (s - lo) * hop: (e - lo) * hop])
        yield s * hop, piece


def vocode_streamed(vocoder_fn: Callable, mel,
                    chunk_frames: int = 256, halo_frames: int = 32,
                    hop_length: Optional[int] = None) -> np.ndarray:
    """Assemble :func:`streaming_vocode` pieces into one waveform."""
    return np.concatenate(
        [p for _, p in streaming_vocode(
            vocoder_fn, mel, chunk_frames, halo_frames, hop_length)],
        axis=1)


def make_streaming_fns(taco):
    """(prepare, decode_chunk, postnet_refine) jitted once — pass as
    ``fns=`` to repeated :func:`streaming_tts` calls so they share one
    trace cache instead of re-jitting per invocation."""
    import jax

    from ..models.tacotron2 import Tacotron2

    prepare = jax.jit(lambda v, t, tl, s, tm, sy: taco.apply(
        v, t, tl, s, tm, sy, method=Tacotron2.inference_prepare))
    step = jax.jit(lambda v, m, c0, c, k: taco.apply(
        v, m, c0, c, k, method=Tacotron2.decode_chunk))
    refine = jax.jit(lambda v, m: taco.apply(
        v, m, method=Tacotron2.postnet_refine))
    return prepare, step, refine


def streaming_tts(taco, variables, vocoder_fn, *, text, text_lengths,
                  speaker_id, key, torchmoji_hidden=None, sylps=None,
                  max_decoder_steps: int = 512, decode_chunk_steps: int = 32,
                  vocoder_halo: int = 32, hop_length: int = 256,
                  gate_threshold: float = 0.5, gate_delay: int = 10,
                  fns=None) -> Iterator[Tuple[int, np.ndarray]]:
    """End-to-end chunked TTS: yield ``(start_sample, audio_piece)`` with
    the FIRST piece available after one decode chunk + one vocode chunk —
    instead of after the whole utterance like the reference server
    (text2speech.py:658-666, which vocodes complete mels).

    Composition (all pieces halo- or causality-exact):
    - ``Tacotron2.inference_prepare`` encodes once;
    - ``Tacotron2.decode_chunk`` advances the causal AR decoder
      ``decode_chunk_steps`` steps per dispatch, drawing the SAME per-step
      rng keys as the full scan (bit-identical raw mels);
    - the postnet refines a clamped window with its receptive-field halo
      (radius ``2 * postnet_n_convolutions`` frames);
    - the vocoder renders a clamped window with ``vocoder_halo`` frames.

    Audio for frames ``[a, b)`` is emitted once raw mel exists up to
    ``b + postnet_halo + vocoder_halo`` — the streamed waveform matches
    the full pipeline exactly away from the utterance tail (the full
    fixed-length scan keeps decoding past the gate, so the final
    ``postnet_halo`` frames of a gate-stopped stream see different
    padding frames).

    Gate stopping is host-side: decoding stops one chunk after every
    lane's gate has fired (+ ``gate_delay`` frames are kept).
    """
    import jax

    cfg = taco.cfg
    r = cfg.n_frames_per_step
    hp = 2 * cfg.postnet_n_convolutions if cfg.use_postnet else 0
    S_total = -(-max_decoder_steps // r)
    # the full scan's key schedule (Tacotron2.inference splits base -> 3,
    # then k_dec -> S keys)
    _, _, k_dec = jax.random.split(key, 3)
    keys = jax.random.split(k_dec, -(-S_total // decode_chunk_steps)
                            * decode_chunk_steps)

    if fns is None:
        fns = make_streaming_fns(taco)
    prepare, step, refine = fns

    memory, att_const, carry = prepare(variables, text, text_lengths,
                                       speaker_id, torchmoji_hidden, sylps)
    B = int(text.shape[0])

    raw = np.zeros((B, 0, cfg.n_mel_channels), np.float32)
    gates = np.zeros((B, 0), np.float32)
    emitted = 0                      # frames of audio already yielded
    mel_len = None                   # known once every gate fires
    max_frames = S_total * r         # what the full fixed-length scan emits
    done_decoding = False
    n_chunks = 0
    while not done_decoding:
        t0 = n_chunks * decode_chunk_steps
        mel_c, gate_c, _w, carry = step(
            variables, memory, att_const, carry,
            keys[t0:t0 + decode_chunk_steps])
        n_chunks += 1
        raw = np.concatenate([raw, np.asarray(mel_c, np.float32)], axis=1)
        gates = np.concatenate(
            [gates, np.asarray(gate_c, np.float32)], axis=1)
        if raw.shape[1] > max_frames:
            # the last chunk may overshoot the step budget when S_total
            # is not a multiple of decode_chunk_steps — the full scan
            # never decodes those frames, so drop them before any
            # gate/length logic sees them
            raw = raw[:, :max_frames]
            gates = gates[:, :max_frames]
        F = raw.shape[1]
        sig = 1.0 / (1.0 + np.exp(-gates))
        fired = (sig > gate_threshold).any(axis=1).all()
        if fired:
            stop = np.array([np.argmax(sig[b] > gate_threshold)
                             for b in range(B)])
            mel_len = int(min(np.max(stop) + gate_delay, F))
        if (mel_len is not None and F >= mel_len + hp) \
                or F >= max_frames:
            done_decoding = True
            mel_len = mel_len if mel_len is not None else F
        # emit audio for frames whose postnet+vocoder halos are decoded
        # (everything, on the final chunk)
        safe = mel_len if done_decoding else F - hp - vocoder_halo
        safe = min(safe, F if mel_len is None else mel_len)
        if safe <= emitted:
            continue
        # postnet window with halo, clamped to available frames
        lo_p = max(0, emitted - vocoder_halo - hp)
        hi_p = min(F, safe + vocoder_halo + hp)
        refined = np.asarray(refine(variables, raw[:, lo_p:hi_p]),
                             np.float32)
        # vocoder window with halo, in refined-frame coordinates
        lo_v = max(0, emitted - vocoder_halo) - lo_p
        hi_v = min(hi_p - lo_p, (safe + vocoder_halo) - lo_p)
        audio = np.asarray(vocoder_fn(refined[:, lo_v:hi_v]), np.float32)
        a0 = (emitted - (lo_v + lo_p)) * hop_length
        a1 = a0 + (safe - emitted) * hop_length
        yield emitted * hop_length, audio[:, a0:a1]
        emitted = safe
