"""GTA (ground-truth-aligned) mel generation for vocoder training.

Capability rebuild of CookieTTS/_3_generate_postnets/GTA.py:223-279 and
_2_ttm/tacotron2_tm/GTA.py:43-220:

- teacher-forced synthesis (p_teacher_forcing=1, till=9999) over the
  training filelist, dumping ``<audio>.mel.npy`` postnet mels + a map file
  ``wav|mel|speaker`` per shard.
- ``extreme_gta``: re-synthesize with audio offsets 0..hop step N for
  vocoder augmentation (GTA.py:268-275).
- char durations from the alignment argmax histogram (tm GTA.py:43-50).
"""
from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def durations_from_alignment(alignments: np.ndarray,
                             text_lengths: np.ndarray,
                             mel_lengths: np.ndarray) -> List[np.ndarray]:
    """Per-char frame counts from argmax attention histogram
    (reference _2_ttm/tacotron2_tm/GTA.py:43-50)."""
    out = []
    for b in range(alignments.shape[0]):
        T_dec = int(mel_lengths[b])
        T_enc = int(text_lengths[b])
        peaks = alignments[b, :T_dec, :T_enc].argmax(axis=1)
        out.append(np.bincount(peaks, minlength=T_enc).astype(np.int32))
    return out


class GTAGenerator:
    """Drives teacher-forced batch synthesis and writes the vocoder map."""

    def __init__(self, model, variables, outdir: str,
                 hop_length: int = 512, save_letter_durations: bool = True):
        self.model = model
        self.variables = variables
        self.outdir = outdir
        self.hop_length = hop_length
        self.save_letter_durations = save_letter_durations
        os.makedirs(outdir, exist_ok=True)
        self._fn = jax.jit(self._forward)

    def _forward(self, variables, batch, key):
        (out, _), _ = self.model.apply(
            variables,
            text=batch["text"], text_lengths=batch["text_lengths"],
            mels=batch["mels"], mel_lengths=batch["mel_lengths"],
            speaker_id=batch["speaker_id"], sylps=batch["sylps"],
            torchmoji_hidden=batch.get("torchmoji"),
            key=key, p_teacher_forcing=1.0, teacher_force_till=9999,
            deterministic=True, mutable=["batch_stats"])
        return (out["mel_outputs_postnet"], out["alignments"])

    def process_batch(self, batch: Dict[str, Any],
                      audiopaths: Sequence[str],
                      offset: int = 0,
                      verify_outputs: bool = True) -> List[str]:
        """Run one batch; save ``.mel[.off{offset}].npy`` per file.
        Returns map-file lines ``wav|mel|speaker``."""
        key = jax.random.PRNGKey(0)
        dev_batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if k not in ("audiopath",)}
        mels, aligns = self._fn(self.variables, dev_batch, key)
        mels = np.asarray(mels)
        aligns = np.asarray(aligns)
        mel_lengths = np.asarray(batch["mel_lengths"])
        text_lengths = np.asarray(batch["text_lengths"])
        speaker_ids = np.asarray(batch["speaker_id"])

        if self.save_letter_durations:
            durs = durations_from_alignment(aligns, text_lengths,
                                            mel_lengths)

        lines = []
        for i, path in enumerate(audiopaths):
            T = int(mel_lengths[i])
            mel = mels[i, :T]
            if verify_outputs:
                assert np.isfinite(mel).all(), f"non-finite GTA mel: {path}"
                assert mel.shape[0] == T
            # reference naming: '.mel.npy' at offset 0, '.mel{N}.npy' for
            # extremeGTA offsets (_3_generate_postnets/GTA.py:188-198) —
            # Mel2Samp parses the offset back out of this suffix
            suffix = f".mel{offset}.npy" if offset else ".mel.npy"
            mel_path = path + suffix
            np.save(mel_path, mel)
            if self.save_letter_durations:
                # attention-argmax LETTER durations go to '.gdur.npy':
                # '.dur.npy' belongs to MFA phone alignments
                # (preprocess.run_forced_alignment) — the reference also
                # keeps these apart ('_galign.pt' vs alignment caches,
                # GTA.py:151-156) — and overwriting it would silently
                # swap untts' duration supervision after a GTA run
                dur_sfx = f".gdur{offset}.npy" if offset else ".gdur.npy"
                np.save(path + dur_sfx, durs[i])
            lines.append(f"{path}|{mel_path}|{int(speaker_ids[i])}")
        return lines

    def write_map(self, lines: Sequence[str], shard: int = 0) -> str:
        path = os.path.join(self.outdir, f"map_train_{shard}.txt")
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        return path


def extreme_gta_offsets(hop_length: int, step: int) -> List[int]:
    """Audio-offset schedule for --extremeGTA (GTA.py:268-275)."""
    assert step <= hop_length and hop_length % step == 0
    return list(range(0, hop_length, step))


def offset_item_mels(dataset, items: Sequence[Dict[str, Any]],
                     offset: int) -> List[Dict[str, Any]]:
    """Recompute each item's mel from audio trimmed by ``offset`` samples
    — extremeGTA genuinely re-synthesizes the dataset from shifted audio
    (reference GTA.py:115-128,197-198), it is not just a renamed file."""
    if offset == 0:
        return list(items)
    out = []
    for it in items:
        audio = dataset.load_audio(it["audiopath"])
        mel = dataset.stft.mel_spectrogram_np(
            audio[offset:]).astype(np.float32)
        out.append(dict(it, mel=mel, mel_length=mel.shape[0]))
    return out
