"""Dataset preprocessing driver.

Capability rebuild of CookieTTS/_1_preprocess/start_preprocess.py (the
14-step script) around this framework's own DSP
(cookietts_tpu.data.audio_io) instead of librosa/sox/normalize-audio CLIs:

1. recursively extract archives (start_preprocess.py:42-83)
2. per-file audio processing, multiprocessed
   (scripts/audio_preprocessing.py:78-204): load -> mono -> resample ->
   high-pass chain (150 Hz, 40 Hz) -> multi-pass trim -> write
3. metadata collection via dataset autodiscovery (:416-436)
4. speaker/emotion info + filelists + meta_dump.json (:448-675)
5. optional ARPAbet transcripts (:530-552) and MFA alignment (:554-598)
"""
from __future__ import annotations

import dataclasses
import json
import os
from glob import glob
from multiprocessing import Pool
from typing import Any, Dict, List, Optional, Sequence

from ..data import audio_io
from ..data.extract import extract, is_archive
from ..data.filelist import generate_filelist_from_datasets, write_filelists


@dataclasses.dataclass
class PreprocessConfig:
    dataset_dirs: Sequence[str] = ()
    target_sr: int = 44100
    highpass_hz: Sequence[float] = (150.0, 40.0)
    trim_passes: int = 3
    trim_top_db: float = 45.0
    target_lufs: Optional[float] = None      # None = skip loudness step
    min_duration: float = 0.9
    min_speaker_duration: float = 0.0
    threads: int = 1
    out_dir: str = "preprocessed"
    backup_originals: bool = False
    # dataset-specific fixes (start_preprocess.py:161-208)
    delete_noisy: bool = False               # Clipper *_Noisy_* removal
    delete_very_noisy: bool = False          # Clipper *_Very Noisy_*
    vctk_use_aux_mic: bool = False           # keep _mic2 instead of _mic1
    # phonetic transcripts / forced alignment (:530-598)
    arpa_dict_path: Optional[str] = None     # merged.dict for {ARPA} quotes
    use_forced_aligner: bool = False
    mfa_binary: Optional[str] = None
    mfa_lexicon: Optional[str] = None        # defaults to arpa_dict_path
    # fused on-device feature extraction (audio/features.py): batch all
    # clips through ONE jitted XLA program per length bucket and write
    # REAL TTSDataset mel/len cache sidecars (hash-keyed; training and
    # TBPTT planning hit them directly) plus .gt.f0/.gt.energy analysis
    # dumps — the TPU-native replacement for the reference's per-file
    # pyworld/pyloudnorm/librosa host loop (dump_features_on_device)
    on_device_features: bool = False
    feature_batch: int = 16
    filter_length: int = 2048
    hop_length: int = 512
    win_length: int = 2048
    n_mel_channels: int = 80
    mel_fmin: float = 20.0
    mel_fmax: Optional[float] = 11025.0


def apply_dataset_fixes(cfg: PreprocessConfig) -> Dict[str, int]:
    """Dataset-specific cleanup before audio processing
    (reference start_preprocess.py:161-208):
    - Clipper_MLP: delete ``*_Noisy_*`` / ``*_Very Noisy_*`` clips;
    - VCTK: keep one microphone, renaming ``_mic1.wav``/``_mic2.wav`` to
      ``.wav`` (the Blizzard2011 studio slicing step is dataset-payload
      specific and out of scope here).
    """
    counts = {"clipper_deleted": 0, "vctk_renamed": 0}
    for d in cfg.dataset_dirs:
        name = os.path.basename(os.path.normpath(d))
        if name.lower().startswith("clipper"):
            patterns = []
            if cfg.delete_very_noisy:
                patterns.append("*_Very Noisy_*")
            if cfg.delete_noisy:
                patterns.append("*_Noisy_*")
            for pat in patterns:
                for p in glob(os.path.join(d, "**", pat), recursive=True):
                    os.unlink(p)
                    counts["clipper_deleted"] += 1
        if name.lower().startswith("vctk"):
            keep = "_mic2.wav" if cfg.vctk_use_aux_mic else "_mic1.wav"
            drop = "_mic1.wav" if cfg.vctk_use_aux_mic else "_mic2.wav"
            for p in glob(os.path.join(d, "**", f"*{keep}"),
                          recursive=True):
                os.rename(p, p.replace(keep, ".wav"))
                counts["vctk_renamed"] += 1
            for p in glob(os.path.join(d, "**", f"*{drop}"),
                          recursive=True):
                os.unlink(p)
    return counts


def run_forced_alignment(result: Dict[str, Any],
                         cfg: PreprocessConfig) -> Optional[str]:
    """MFA over all clips, one corpus per speaker
    (reference start_preprocess.py:554-598): writes per-clip
    ``<wav>.dur.npy`` phone-duration sidecars (the untts training input),
    phoneme transcripts into the entries, and a ``missing_vocab.txt``
    dump of out-of-lexicon words. Returns the missing-vocab path, or None
    when no aligner binary is available (alignment is skipped, uniform
    durations apply downstream)."""
    import numpy as np

    from ..data.mfa import (durations_from_textgrid, find_mfa, oov_words,
                            parse_textgrid, run_alignment)

    lexicon_path = cfg.mfa_lexicon or cfg.arpa_dict_path
    entries = result["train"] + result["validation"]

    # missing-vocab dump works even without the binary
    missing_path = os.path.join(cfg.out_dir, "missing_vocab.txt")
    lexicon: Dict[str, str] = {}
    if lexicon_path and os.path.exists(lexicon_path):
        with open(lexicon_path, encoding="utf-8", errors="replace") as f:
            for ln in f:
                parts = ln.split()
                if len(parts) >= 2:
                    lexicon[parts[0].upper()] = " ".join(parts[1:])
    os.makedirs(cfg.out_dir, exist_ok=True)
    with open(missing_path, "w", encoding="utf-8") as f:
        f.write("\n".join(oov_words([m["quote"] for m in entries],
                                    lexicon)))

    mfa = (cfg.mfa_binary or find_mfa()) if cfg.use_forced_aligner else None
    if mfa is None or lexicon_path is None:
        if cfg.use_forced_aligner:
            print("[preprocess] MFA binary or lexicon unavailable — "
                  "skipping forced alignment (uniform durations apply)")
        return missing_path

    # per-speaker corpora: wav + .lab transcript pairs
    import shutil
    import tempfile
    by_speaker: Dict[str, list] = {}
    for m in entries:
        by_speaker.setdefault(m.get("speaker", str(m["speaker_id"])),
                              []).append(m)
    for speaker, items in by_speaker.items():
        with tempfile.TemporaryDirectory() as tmp:
            corpus = os.path.join(tmp, "corpus")
            os.makedirs(corpus)
            # corpus names are index-prefixed: chapter-numbered layouts
            # (a/0001.wav, b/0001.wav) share basenames, and a flat copy
            # would overwrite wav+lab pairs and hand BOTH clips the one
            # surviving TextGrid's durations
            names = {}
            for j, m in enumerate(items):
                base = os.path.splitext(os.path.basename(m["path"]))[0]
                names[id(m)] = f"u{j:06d}_{base}"
            for m in items:
                base = names[id(m)]
                shutil.copy(m["path"], os.path.join(corpus, base + ".wav"))
                with open(os.path.join(corpus, base + ".lab"), "w",
                          encoding="utf-8") as f:
                    f.write(m["quote"])
            out = os.path.join(tmp, "aligned")
            try:
                run_alignment(corpus, lexicon_path, out,
                              mfa_binary=mfa)
            except Exception as e:
                print(f"[preprocess] MFA failed for {speaker}: {e!r}")
                continue
            for m in items:
                base = names[id(m)]
                tg = None
                for cand in (os.path.join(out, base + ".TextGrid"),
                             os.path.join(out, speaker,
                                          base + ".TextGrid")):
                    if os.path.exists(cand):
                        tg = cand
                        break
                if tg is None:
                    continue
                tiers = parse_textgrid(tg)
                # durations must land on the MEL frame grid the dataset
                # trains on (hop/sr — dataset.py consumes the sidecar as
                # mel frames; a 10 ms grid here would run ~16% long at
                # 512/44100 and crush the tail phones to zero)
                hop_s = cfg.hop_length / float(cfg.target_sr)
                dur = durations_from_textgrid(tiers, "phones", hop_s)
                np.save(m["path"] + ".dur.npy", np.asarray(dur, np.int32))
                phones = " ".join(lbl for _, _, lbl in
                                  tiers.get("phones", []) if lbl)
                if phones:
                    m["phoneme_transcript"] = "{" + phones + "}"
    return missing_path


def extract_archives_recursively(root: str, max_depth: int = 3) -> int:
    """Extract every archive under root (newly extracted archives too)."""
    n = 0
    for _ in range(max_depth):
        archives = [p for p in glob(os.path.join(root, "**", "*"),
                                    recursive=True) if is_archive(p)]
        todo = [p for p in archives
                if not os.path.exists(p + ".extracted")]
        if not todo:
            break
        for p in todo:
            extract(p)
            open(p + ".extracted", "w").close()
            n += 1
    return n


def process_audio_file(args) -> Optional[str]:
    """One file of step 2 (multiprocess worker)."""
    path, cfg = args
    try:
        audio, sr = audio_io.load_wav(path, target_sr=cfg.target_sr)
        audio = audio_io.remove_dc_offset(audio)
        for hz in cfg.highpass_hz:
            if len(audio) > 128:
                audio = audio_io.butter_highpass(audio, cfg.target_sr, hz)
        audio = audio_io.trim_silence(
            audio, cfg.target_sr, top_db=cfg.trim_top_db,
            n_passes=cfg.trim_passes)
        if cfg.target_lufs is not None and len(audio) > cfg.target_sr // 10:
            audio = audio_io.loudness_normalize(
                audio, cfg.target_sr, target_lufs=cfg.target_lufs)
        if cfg.backup_originals and not os.path.exists(path + ".orig"):
            os.replace(path, path + ".orig")
        audio_io.save_wav(path, audio, cfg.target_sr)
        return None
    except Exception as e:      # collect failures, don't crash the pool
        return f"{path}: {e!r}"


def process_audio_multiprocess(paths: Sequence[str],
                               cfg: PreprocessConfig) -> List[str]:
    args = [(p, cfg) for p in paths]
    if cfg.threads <= 1:
        results = [process_audio_file(a) for a in args]
    else:
        with Pool(cfg.threads) as pool:
            results = pool.map(process_audio_file, args)
    return [r for r in results if r]


def dump_features_on_device(paths: Sequence[str],
                            cfg: PreprocessConfig) -> int:
    """Fused on-device feature extraction over all clips.

    Groups files into length buckets (padded static shapes -> one XLA
    compile per bucket) and runs audio/features.py:fused_frontend on the
    accelerator — the TPU replacement for the reference's per-file host
    loop (pyworld :815-838, pyloudnorm :786-803, librosa mel :571-577).
    Runs AFTER step 2, so the on-disk wavs are already trimmed and
    loudness-normalized and no second normalization is applied here.

    Writes, per clip:
    - ``<wav>.{hash}.mel.npy`` + ``.{hash}.len.npy`` — REAL TTSDataset
      cache entries (``data.dataset.mel_cache_hash`` over a DataConfig
      with these stft params and trim/lufs OFF, matching the
      already-processed files): training and TBPTT planning hit them
      directly and skip the per-file host mel work.
    - ``<wav>.gt.f0.npy`` / ``.gt.energy.npy`` — standalone analysis
      dumps on the mel frame grid (f0 frames are center-padded like the
      mel). NOT training caches: the dataset's default f0 extractor is
      the DIO port (different estimator, unvoiced handling).

    Returns the number of clips processed.
    """
    import numpy as np

    from ..audio.features import fused_frontend
    from ..audio.stft import TacotronSTFT
    from ..data.dataset import DataConfig, mel_cache_hash

    stft = TacotronSTFT(
        filter_length=cfg.filter_length, hop_length=cfg.hop_length,
        win_length=cfg.win_length, n_mel_channels=cfg.n_mel_channels,
        sampling_rate=cfg.target_sr, mel_fmin=cfg.mel_fmin,
        mel_fmax=cfg.mel_fmax)
    # step 2 already normalized the files in place -> no second pass
    fn = fused_frontend(stft, sr=cfg.target_sr, target_lufs=None)
    cache_hash = mel_cache_hash(DataConfig(
        sampling_rate=cfg.target_sr, filter_length=cfg.filter_length,
        hop_length=cfg.hop_length, win_length=cfg.win_length,
        n_mel_channels=cfg.n_mel_channels, mel_fmin=cfg.mel_fmin,
        mel_fmax=(cfg.mel_fmax if cfg.mel_fmax is not None
                  else cfg.target_sr / 2),
        trim_enable=False, target_lufs=None))

    loaded = []
    for p in paths:
        try:
            audio, _ = audio_io.load_wav(p, target_sr=cfg.target_sr)
            # the dataset loader DC-removes before the mel; match it so
            # the cache values equal what it would compute
            audio = audio_io.remove_dc_offset(audio)
            loaded.append((p, audio))
        except Exception as e:
            print(f"[preprocess] feature dump skip {p}: {e!r}")
    loaded.sort(key=lambda pa: len(pa[1]))

    def bucket_len(n):      # next power-of-two hop multiple: few compiles
        t = cfg.hop_length * 8
        while t < n:
            t *= 2
        return t

    done = 0
    i = 0
    while i < len(loaded):
        chunk = loaded[i:i + cfg.feature_batch]
        i += cfg.feature_batch
        T = bucket_len(max(len(a) for _, a in chunk))
        batch = np.zeros((len(chunk), T), np.float32)
        lengths = np.zeros((len(chunk),), np.int32)
        for j, (_, a) in enumerate(chunk):
            batch[j, :len(a)] = a
            lengths[j] = len(a)
            # fill the pad with the clip's OWN tail reflection: the STFT
            # reflect-pads the BUCKET edge, so frames near len(a) would
            # otherwise window bucket zeros instead of what the dataset
            # computes on the unpadded clip (its reflect pad) — the last
            # ~filter/2/hop cached frames would be wrong
            n, m = len(a), min(cfg.filter_length, len(a) - 1, T - len(a))
            if m > 0:
                batch[j, n: n + m] = a[::-1][1: 1 + m]
        out = fn(batch, lengths)
        mel = np.asarray(out["mel"], np.float32)
        f0 = np.asarray(out["f0"], np.float32)
        energy = np.asarray(out["energy"], np.float32)
        for j, (p, a) in enumerate(chunk):
            n_frames = len(a) // cfg.hop_length + 1
            n = min(n_frames, mel.shape[1])
            np.save(p + f".{cache_hash}.mel.npy", mel[j, :n])
            np.save(p + f".{cache_hash}.len.npy", np.asarray(n, np.int64))
            np.save(p + ".gt.f0.npy", f0[j, :n])
            np.save(p + ".gt.energy.npy", energy[j, :n])
            done += 1
    return done


def run_preprocess(cfg: PreprocessConfig,
                   arpa_lookup=None) -> Dict[str, Any]:
    """Run the full preprocess pipeline; returns the filelist result.

    Output-file inventory matches the reference driver
    (start_preprocess.py:416-675): filelist_train/validation.txt (all-in-
    one AND per dataset), speaker_info.txt, emotion_info.txt,
    meta_dump.json, missing_vocab.txt (when a lexicon is given), plus
    per-clip .dur.npy alignment sidecars when MFA runs.
    """
    for d in cfg.dataset_dirs:
        extract_archives_recursively(d)

    apply_dataset_fixes(cfg)

    wavs: List[str] = []
    for d in cfg.dataset_dirs:
        wavs.extend(glob(os.path.join(d, "**", "*.wav"), recursive=True))
    failures = process_audio_multiprocess(sorted(set(wavs)), cfg)
    if failures:
        print(f"[preprocess] {len(failures)} file failures "
              f"(first: {failures[0]})")

    if cfg.on_device_features:
        n = dump_features_on_device(sorted(set(wavs)), cfg)
        print(f"[preprocess] on-device features dumped for {n} clips")

    result = generate_filelist_from_datasets(
        cfg.dataset_dirs, min_duration=cfg.min_duration,
        min_speaker_duration=cfg.min_speaker_duration)

    # phonetic transcripts ({ARPA} substitution, reference :530-552)
    if arpa_lookup is None and cfg.arpa_dict_path \
            and os.path.exists(cfg.arpa_dict_path):
        from ..text.cmudict import ARPADict
        arpa_lookup = ARPADict(cfg.arpa_dict_path).get
    if arpa_lookup is not None:
        for split in ("train", "validation"):
            for m in result[split]:
                m["phoneme_transcript"] = arpa_lookup(m["quote"])

    if cfg.use_forced_aligner or cfg.mfa_lexicon or cfg.arpa_dict_path:
        run_forced_alignment(result, cfg)

    write_filelists(result, cfg.out_dir)
    with open(os.path.join(cfg.out_dir, "preprocess_config.json"),
              "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1, default=list)
    return result
