"""Montreal Forced Aligner wrapper (host-side, external binary).

Capability rebuild of CookieTTS/utils/dataset/MFA.py:1-46,74+: run MFA
per speaker over (wav, txt) pairs, parse the TextGrid output into word /
phone timings, and report out-of-vocabulary words. The binary itself is
an external tool (the reference auto-downloads v1.0.1; this sandbox has
no egress, so the path must be provided / discovered on PATH).
"""
from __future__ import annotations

import os
import re
import shutil
import subprocess
from typing import Dict, List, Optional, Tuple


def find_mfa() -> Optional[str]:
    return shutil.which("mfa_align") or shutil.which("mfa")


def run_alignment(corpus_dir: str, lexicon_path: str, out_dir: str,
                  mfa_binary: Optional[str] = None,
                  acoustic_model: str = "english") -> str:
    """Run forced alignment over a prepared corpus directory
    (wav + matching .txt/.lab per file). Returns the TextGrid dir."""
    mfa = mfa_binary or find_mfa()
    if mfa is None:
        raise RuntimeError(
            "Montreal Forced Aligner binary not found; install it or pass "
            "mfa_binary. (The reference auto-downloads v1.0.1 — "
            "CookieTTS/utils/dataset/MFA.py:1-46.)")
    os.makedirs(out_dir, exist_ok=True)
    if os.path.basename(mfa).startswith("mfa_align"):
        cmd = [mfa, corpus_dir, lexicon_path, acoustic_model, out_dir]
    else:     # mfa >= 2.0 CLI
        cmd = [mfa, "align", corpus_dir, lexicon_path, acoustic_model,
               out_dir]
    subprocess.run(cmd, check=True)
    return out_dir


_INTERVAL_RE = re.compile(
    r'intervals \[\d+\]:\s*xmin = ([\d.]+)\s*xmax = ([\d.]+)\s*'
    r'text = "([^"]*)"', re.S)
_TIER_RE = re.compile(r'item \[\d+\]:\s*class = "IntervalTier"\s*'
                      r'name = "([^"]+)"')


def parse_textgrid(path: str) -> Dict[str, List[Tuple[float, float, str]]]:
    """TextGrid -> {tier_name: [(start, end, label), ...]}."""
    with open(path, encoding="utf-8") as f:
        text = f.read()
    tiers: Dict[str, List[Tuple[float, float, str]]] = {}
    tier_spans = [(m.start(), m.group(1)) for m in _TIER_RE.finditer(text)]
    tier_spans.append((len(text), ""))
    for (start, name), (end, _) in zip(tier_spans, tier_spans[1:]):
        chunk = text[start:end]
        tiers[name] = [(float(a), float(b), lbl)
                       for a, b, lbl in _INTERVAL_RE.findall(chunk)]
    return tiers


def durations_from_textgrid(tiers: Dict[str, List[Tuple[float, float, str]]],
                            tier: str, hop_seconds: float) -> List[int]:
    """Phone/word intervals -> integer frame durations at hop rate."""
    out = []
    acc = 0.0
    for start, end, _ in tiers.get(tier, []):
        exact = (end - start) / hop_seconds + acc
        frames = int(round(exact))
        acc = exact - frames
        out.append(max(frames, 0))
    return out


def oov_words(transcripts: List[str], lexicon: Dict[str, str]) -> List[str]:
    """Words missing from the pronunciation lexicon (missing-vocab dump,
    reference _1_preprocess/start_preprocess.py:554-598)."""
    missing = set()
    for t in transcripts:
        for w in re.findall(r"[A-Za-z']+", t):
            if w.upper() not in lexicon:
                missing.add(w.lower())
    return sorted(missing)
