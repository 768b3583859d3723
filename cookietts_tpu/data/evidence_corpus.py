"""Synthetic strictly-monotonic evidence corpus (shared by the learning-
evidence tools).

Each letter 'a'..'h' is a fixed 90 ms harmonic tone (log-spaced
fundamentals 220-1575 Hz + two harmonics), words are separated by 60 ms
of silence, and every utterance ends in 200 ms of silence (the gate
target). Text→audio correspondence is strictly monotonic and local, so a
correct attention mechanism MUST discover a diagonal alignment — and a
vocoder must reconstruct pure harmonic stacks — but nothing about the
mapping is given to any model. Used by tools/train_evidence.py (Tacotron2
alignment learning, mirroring the reference's inference-mode validation,
CookieTTS/_2_ttm/tacotron2_tm/train.py:774-797) and
tools/vocoder_evidence.py (WaveGlow / HiFi-GAN from-scratch training,
mirroring _4_mtw/waveglow/train.py:184-341).

Generation is deterministic given the seed; the corpus is bit-identical
across tools and runs.
"""
from __future__ import annotations

import os

import numpy as np

SR = 22050
HOP = 256               # mel hop of the evidence recipe (MEL_CFG below)
CHARS = "abcdefgh"
CHAR_S = 0.090          # NOMINAL seconds per letter tone
CHAR_S_MIN, CHAR_S_MAX = 0.060, 0.115   # per-char duration jitter range
GAP_S = 0.060           # inter-word silence
END_S = 0.200           # trailing silence -> gate target
N_TRAIN, N_VAL = 96, 16


def char_tone(c: str, rng: np.random.Generator,
              dur_s: float = CHAR_S, n_samples: int = 0) -> np.ndarray:
    """Harmonic tone unique to the letter; 5 ms fades, tiny noise.

    ``dur_s`` jitters per char instance (see :func:`render`): with FIXED
    durations every boundary sits at a predictable frame, so a model can
    time transitions positionally without reading the text — measured in
    round 5, fixed-duration corpora train to degenerate attention that
    copies the previous frame (CER ~1.0) while scoring ~0.5 on the
    length-gated weighted_score. Duration jitter (like real phone-length
    variance) makes text the only source of WHEN the tone changes.

    ``n_samples`` (when nonzero) pins the length exactly — used by the
    frame-quantized corpus so boundaries land on exact frame multiples
    (``int(SR * dur_s)`` stays for the default path so the committed
    r=1 corpus remains bit-identical)."""
    i = CHARS.index(c)
    f0 = 220.0 * (1575.0 / 220.0) ** (i / (len(CHARS) - 1))
    t = np.arange(n_samples if n_samples else int(SR * dur_s)) / SR
    x = (0.50 * np.sin(2 * np.pi * f0 * t)
         + 0.25 * np.sin(2 * np.pi * 2 * f0 * t)
         + 0.12 * np.sin(2 * np.pi * 3 * f0 * t))
    fade = int(0.005 * SR)
    env = np.ones_like(x)
    env[:fade] = np.linspace(0, 1, fade)
    env[-fade:] = np.linspace(1, 0, fade)
    return (0.5 * x * env + 0.001 * rng.standard_normal(len(x))
            ).astype(np.float32)


def render(text: str, rng: np.random.Generator,
           frame_multiple: int = 0) -> np.ndarray:
    """Render ``text`` to audio with per-char duration jitter.

    ``frame_multiple`` (= the decoder's ``n_frames_per_step`` r, when
    > 0) quantizes every duration to whole r-frame DECODER GROUPS:
    letters last 2 or 3 groups (drawn per instance — duration stays
    jittered, so text remains the only source of WHEN a tone changes),
    word gaps 2 groups, trailing silence 5 groups, all exact multiples
    of ``r * HOP`` samples. Rationale (measured, round 5): an r-step
    decoder commits to r frames per attention read, so a boundary whose
    phase WITHIN a group is uniform-random (the unquantized corpus) is
    irreducibly unpredictable — teacher-forced CER floors at ~0.73 at
    r=4 no matter the recipe. That entropy is an artifact of the hard
    0 ms tone switches, not of the r=4 decode path (real speech
    co-articulates through boundaries); quantizing to group multiples
    removes only the unlearnable phase while keeping the alignment task
    (2-vs-3-group durations are per-instance random) fully intact."""
    parts = []
    fm_samples = frame_multiple * HOP
    for w, word in enumerate(text.split(" ")):
        if w:
            parts.append(np.zeros(
                2 * fm_samples if frame_multiple else int(SR * GAP_S),
                np.float32))
        for c in word:
            if frame_multiple:
                groups = int(rng.integers(2, 4))     # 2 or 3 groups
                parts.append(char_tone(c, rng,
                                       n_samples=groups * fm_samples))
            else:
                dur = float(rng.uniform(CHAR_S_MIN, CHAR_S_MAX))
                parts.append(char_tone(c, rng, dur))
    parts.append(np.zeros(
        5 * fm_samples if frame_multiple else int(SR * END_S), np.float32))
    return np.concatenate(parts)


def make_corpus(work: str, seed: int = 0,
                n_train: int = N_TRAIN, n_val: int = N_VAL,
                frame_multiple: int = 0):
    """Write n_train+n_val wavs + filelist_train/validation.txt under
    ``work``; returns (train_filelist, val_filelist).

    ``frame_multiple``: see :func:`render` — group-quantized durations
    for n_frames_per_step > 1 evidence runs."""
    from . import audio_io
    rng = np.random.default_rng(seed)
    os.makedirs(work, exist_ok=True)
    seen, texts = set(), []
    while len(texts) < n_train + n_val:
        n_words = int(rng.integers(2, 4))
        words = ["".join(rng.choice(list(CHARS),
                                    size=int(rng.integers(2, 5))))
                 for _ in range(n_words)]
        t = " ".join(words)
        flat = t.replace(" ", "")
        has_repeat = any(a == b for a, b in zip(flat, flat[1:]))
        # adjacent repeats would fuse into ONE tone run under duration
        # jitter (the decoder could no longer count letters by run
        # length), so they are excluded from the text distribution
        if len(t) <= 14 and t not in seen and not has_repeat:
            seen.add(t)
            texts.append(t)
    lines = []
    for i, t in enumerate(texts):
        p = os.path.join(work, f"u{i:03d}.wav")
        audio_io.save_wav(p, render(t, rng, frame_multiple), SR)
        lines.append(f"{p}|{t}|0")
    train_fl = os.path.join(work, "filelist_train.txt")
    val_fl = os.path.join(work, "filelist_validation.txt")
    with open(train_fl, "w") as f:
        f.write("\n".join(lines[:n_train]))
    with open(val_fl, "w") as f:
        f.write("\n".join(lines[n_train:]))
    return train_fl, val_fl


# -- tone decoder: the corpus' ungameable correctness check -----------------
#
# Because every letter is a fixed harmonic stack, a synthesized mel can be
# DECODED back to text by template matching — so "did the model read the
# text?" becomes a measurable character error rate. This closes the blind
# spot found in round 5: the reference's inference weighted_score
# (loss_function.py:266-288) gates its encoder-coverage punishment on
# text_lengths > 12, so on short utterances a model that ignores the text
# entirely (degenerate attention, prosody-only decoding) can still score
# ~0.6. CER cannot be gamed: rendering the right tones in the right order
# requires reading the text.

MEL_CFG = dict(filter_length=1024, hop_length=256, win_length=1024,
               n_mel_channels=32, sampling_rate=SR, mel_fmax=8000.0)


def tone_templates() -> np.ndarray:
    """[len(CHARS), n_mel] steady-state log-mel template per letter,
    rendered through the SAME mel pipeline the corpus trains with."""
    from ..audio.stft import TacotronSTFT
    stft = TacotronSTFT(**MEL_CFG)
    rng = np.random.default_rng(99)
    rows = []
    for c in CHARS:
        m = stft.mel_spectrogram_np(char_tone(c, rng))
        rows.append(m[2:-2].mean(axis=0))      # drop fade-in/out frames
    return np.stack(rows).astype(np.float32)


def decode_tones(mel: np.ndarray, mel_len: int,
                 templates: np.ndarray | None = None,
                 min_run: int = 3) -> str:
    """[T, n_mel] log-mel -> recovered letter string: template-match each
    frame to a letter (or silence), collapse each run of >= min_run
    frames to ONE letter (the corpus excludes adjacent repeats, so a run
    is always a single letter — run lengths vary with the per-char
    duration jitter and with STFT-window smear across word gaps)."""
    if templates is None:
        templates = tone_templates()
    mel = np.asarray(mel, np.float32)[:int(mel_len)]
    labels = []
    for fr in mel:
        if fr.max() < -8.0:                    # near log(1e-5): silence
            labels.append(-1)
            continue
        d = ((templates - fr[None]) ** 2).mean(axis=1)
        labels.append(int(d.argmin()))
    out, prev, run = [], None, 0
    for lab in labels + [-2]:
        if lab == prev:
            run += 1
        else:
            if prev is not None and prev >= 0 and run >= min_run:
                out.append(CHARS[prev])
            prev, run = lab, 1
    return "".join(out)


def char_error_rate(decoded: str, reference: str) -> float:
    """Levenshtein distance / len(reference); ``reference`` should be the
    utterance text with spaces stripped."""
    a, b = decoded, reference
    dp = np.arange(len(b) + 1, dtype=np.int32)
    for i, ca in enumerate(a, 1):
        prev = dp.copy()
        dp[0] = i
        for j, cb in enumerate(b, 1):
            dp[j] = min(prev[j] + 1, dp[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
    return float(dp[-1]) / max(len(b), 1)


def make_vocoder_maps(work: str, seed: int = 0):
    """GTA-map-format filelists (``wav||speaker`` — no mel sidecar, so
    Mel2Samp computes ground-truth mels) over the SAME corpus; returns
    (train_map, val_map)."""
    train_fl, val_fl = make_corpus(work, seed)
    maps = []
    for src, dst in ((train_fl, "map_train.txt"), (val_fl, "map_val.txt")):
        out = os.path.join(work, dst)
        with open(src) as f, open(out, "w") as g:
            for ln in f:
                if ln.strip():
                    g.write(f"{ln.split('|')[0]}||0\n")
        maps.append(out)
    return maps[0], maps[1]
