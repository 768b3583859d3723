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
