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
    threads: int = 1
    out_dir: str = "preprocessed"
    backup_originals: bool = False


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


def run_preprocess(cfg: PreprocessConfig,
                   arpa_lookup=None) -> Dict[str, Any]:
    """Run the full preprocess pipeline; returns the filelist result."""
    for d in cfg.dataset_dirs:
        extract_archives_recursively(d)

    wavs: List[str] = []
    for d in cfg.dataset_dirs:
        wavs.extend(glob(os.path.join(d, "**", "*.wav"), recursive=True))
    failures = process_audio_multiprocess(sorted(set(wavs)), cfg)
    if failures:
        print(f"[preprocess] {len(failures)} file failures "
              f"(first: {failures[0]})")

    result = generate_filelist_from_datasets(
        cfg.dataset_dirs, min_duration=cfg.min_duration)
    if arpa_lookup is not None:
        for split in ("train", "validation"):
            for m in result[split]:
                m["arpa"] = arpa_lookup(m["quote"])
    write_filelists(result, cfg.out_dir)
    with open(os.path.join(cfg.out_dir, "preprocess_config.json"),
              "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1, default=list)
    return result
