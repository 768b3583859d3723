"""Filelist generation with speaker accounting.

Capability rebuild of ``generate_filelist_from_datasets``
(CookieTTS/utils/dataset/data_utils.py:37-254): collect per-dataset
metadata, measure per-clip/per-speaker durations, drop clips shorter than
a minimum, assign stable integer speaker IDs, split train/validation, and
dump speaker / emotion info files
(_1_preprocess/start_preprocess.py:448-516,609-675).
"""
from __future__ import annotations

import json
import os
import random
from typing import Any, Dict, List, Optional, Sequence, Tuple

from . import audio_io
from .metadata import get_dataset_meta


def clip_duration(path: str) -> float:
    """Duration in seconds from the WAV header (no full decode)."""
    import wave
    try:
        with wave.open(path, "rb") as w:
            return w.getnframes() / float(w.getframerate())
    except Exception:
        audio, sr = audio_io.load_wav(path)
        return len(audio) / sr


def generate_filelist_from_datasets(
        dataset_dirs: Sequence[str],
        default_speakers: Optional[Dict[str, str]] = None,
        min_duration: float = 0.9,
        max_duration: float = 0.0,          # 0 disables
        val_fraction: float = 0.01,
        val_min_per_speaker: int = 1,
        seed: int = 1234,
        measure_durations: bool = True) -> Dict[str, Any]:
    """Returns dict with train/validation entry lists + lookups.

    Each entry: {path, quote, speaker, speaker_id, emotion_id?, duration}.
    """
    default_speakers = default_speakers or {}
    meta: List[Dict[str, Any]] = []
    for d in dataset_dirs:
        name = os.path.basename(os.path.normpath(d))
        get_dataset_meta(d, meta=meta,
                         default_speaker=default_speakers.get(name, name))

    # durations + min-duration filter
    kept = []
    speaker_durations: Dict[str, float] = {}
    for m in meta:
        dur = clip_duration(m["path"]) if measure_durations else 0.0
        if measure_durations and dur < min_duration:
            continue
        if max_duration and dur > max_duration:
            continue
        m = dict(m, duration=dur)
        kept.append(m)
        speaker_durations[m["speaker"]] = \
            speaker_durations.get(m["speaker"], 0.0) + dur

    # stable speaker-ID assignment (sorted by name)
    speakers = sorted({m["speaker"] for m in kept})
    speaker_ids = {s: i for i, s in enumerate(speakers)}
    emotions = sorted({e for m in kept for e in m.get("emotions", [])})
    emotion_ids = {e: i for i, e in enumerate(emotions)}
    for m in kept:
        m["speaker_id"] = speaker_ids[m["speaker"]]
        m["emotion_id"] = emotion_ids.get(
            (m.get("emotions") or ["unknown"])[0], 0)

    # train/val split: at least val_min_per_speaker from each speaker
    rng = random.Random(seed)
    by_speaker: Dict[str, List[Dict[str, Any]]] = {}
    for m in kept:
        by_speaker.setdefault(m["speaker"], []).append(m)
    train, val = [], []
    for s, items in sorted(by_speaker.items()):
        rng.shuffle(items)
        n_val = max(int(len(items) * val_fraction),
                    val_min_per_speaker if len(items) > 1 else 0)
        val.extend(items[:n_val])
        train.extend(items[n_val:])
    rng.shuffle(train)

    return {
        "train": train,
        "validation": val,
        "speaker_ids": speaker_ids,
        "emotion_ids": emotion_ids,
        "speaker_durations": speaker_durations,
    }


def write_filelists(result: Dict[str, Any], out_dir: str) -> None:
    """Write filelist_train.txt / filelist_validation.txt /
    speaker_info.txt / emotion_info.txt / meta_dump.json
    (start_preprocess.py:609-675 output surface)."""
    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "validation"):
        with open(os.path.join(out_dir, f"filelist_{split}.txt"), "w",
                  encoding="utf-8") as f:
            for m in result[split]:
                f.write(f"{m['path']}|{m['quote']}|{m['speaker_id']}\n")
    with open(os.path.join(out_dir, "speaker_info.txt"), "w",
              encoding="utf-8") as f:
        f.write("; speaker_id|speaker_name|total_duration_s\n")
        for name, sid in sorted(result["speaker_ids"].items(),
                                key=lambda kv: kv[1]):
            dur = result["speaker_durations"].get(name, 0.0)
            f.write(f"{sid}|{name}|{dur:.1f}\n")
    with open(os.path.join(out_dir, "emotion_info.txt"), "w",
              encoding="utf-8") as f:
        for name, eid in sorted(result["emotion_ids"].items(),
                                key=lambda kv: kv[1]):
            f.write(f"{eid}|{name}\n")
    with open(os.path.join(out_dir, "meta_dump.json"), "w",
              encoding="utf-8") as f:
        json.dump({"train": result["train"],
                   "validation": result["validation"]}, f, indent=1)


def load_filelist(path: str) -> List[Dict[str, Any]]:
    """Parse ``path|quote|speaker_id`` lines back into entries."""
    entries = []
    with open(path, encoding="utf-8") as f:
        for ln in f:
            if not ln.strip():
                continue
            p, quote, sid = ln.rstrip("\n").split("|")[:3]
            entries.append({"path": p, "quote": quote,
                            "speaker_id": int(sid)})
    return entries
