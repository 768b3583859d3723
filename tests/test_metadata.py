"""Golden tests for dataset-layout autodiscovery.

Mirrors the reference's fake-dataset test strategy (SURVEY.md §4 item 1:
_1_preprocess/tests/fake_datasets with answer files) using fixtures
synthesized on the fly — every supported layout style gets a miniature
dataset and an exact expected-output check.
"""
import os

import pytest

from cookietts_tpu.data.metadata import (
    get_dataset_meta, identify_transcript_storage)


def _touch_wav(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        # minimal RIFF header so size checks pass
        f.write(b"RIFF$\x00\x00\x00WAVEfmt ")


def _write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


@pytest.fixture
def clipper_ds(tmp_path):
    root = tmp_path / "clipper"
    files = [
        ("00_00_05_Twilight_Neutral__Hello there.wav", "Hello there."),
        ("00_01_10_Mrs. Cake_Sad_Noisy_Oh no.wav", "Oh no."),
        ("00_02_00_Spike_Happy Excited_Very Noisy_Wow.wav", "Wow!"),
    ]
    for name, quote in files:
        _touch_wav(str(root / "Sliced Dialogue" / name))
        _write(str(root / "Sliced Dialogue" / (name[:-4] + ".txt")), quote)
    return str(root)


@pytest.fixture
def ljspeech_ds(tmp_path):
    root = tmp_path / "lj"
    for i in range(4):
        _touch_wav(str(root / "wavs" / f"LJ001-{i:04d}.wav"))
    _write(str(root / "metadata.csv"), "\n".join(
        f"wavs/LJ001-{i:04d}.wav|Sample transcript {i}.|Sample transcript {i}."
        for i in range(4)))
    return str(root)


@pytest.fixture
def tacotron_ds(tmp_path):
    root = tmp_path / "taco"
    for spk in ("train", "val"):
        for i in range(3):
            _touch_wav(str(root / spk / f"audio_{i}.wav"))
        _write(str(root / f"{spk}_list.txt"), "\n".join(
            f"{spk}/audio_{i}.wav|Line {spk} {i} okay.|0"
            for i in range(3)))
    return str(root)


@pytest.fixture
def vctk_ds(tmp_path):
    root = tmp_path / "vctk"
    for spk in ("p225", "p226"):
        for i in range(3):
            _touch_wav(str(root / "wav48" / spk / f"{spk}_{i:03d}.wav"))
            _write(str(root / "txt" / spk / f"{spk}_{i:03d}.txt"),
                   f"Sentence {i} for {spk}.")
    return str(root)


def _style_of(root):
    from glob import glob
    audio = sorted(glob(os.path.join(root, "**", "*.wav"), recursive=True))
    txts = sorted(set(glob(os.path.join(root, "**", "*.txt"), recursive=True))
                  | set(glob(os.path.join(root, "**", "*.csv"),
                             recursive=True)))
    lookup = {os.path.splitext(os.path.basename(a))[0]: a for a in audio}
    return identify_transcript_storage(root, audio, txts, lookup)[0]


def test_detect_clipper(clipper_ds):
    assert _style_of(clipper_ds) == "clipper"


def test_detect_ljspeech(ljspeech_ds):
    assert _style_of(ljspeech_ds) == "ljspeech"


def test_detect_tacotron(tacotron_ds):
    assert _style_of(tacotron_ds) == "tacotron"


def test_detect_vctk(vctk_ds):
    assert _style_of(vctk_ds) == "vctk"


def test_clipper_meta_golden(clipper_ds):
    meta = get_dataset_meta(clipper_ds, default_speaker="fallback",
                            default_source="My Little Pony",
                            default_source_type="Show")
    got = sorted(
        (os.path.basename(m["path"]), m["quote"], m["speaker"],
         tuple(m["emotions"]), m["noise"]) for m in meta)
    assert got == [
        ("00_00_05_Twilight_Neutral__Hello there.wav", "Hello there.",
         "Twilight", ("neutral",), ""),
        ("00_01_10_Mrs. Cake_Sad_Noisy_Oh no.wav", "Oh no.",
         "Mrs. Cake", ("sad",), "noisy"),
        ("00_02_00_Spike_Happy Excited_Very Noisy_Wow.wav", "Wow!",
         "Spike", ("happy", "excited"), "very noisy"),
    ]


def test_ljspeech_meta_golden(ljspeech_ds):
    meta = get_dataset_meta(ljspeech_ds, default_speaker="LJ",
                            default_emotion="neutral")
    assert len(meta) == 4
    assert all(m["speaker"] == "LJ" for m in meta)
    assert meta[0]["quote"] == "Sample transcript 0."
    assert meta[0]["emotions"] == ["neutral"]


def test_vctk_meta_golden(vctk_ds):
    meta = get_dataset_meta(vctk_ds, default_speaker="vctk")
    assert len(meta) == 6
    quotes = {os.path.basename(m["path"]): m["quote"] for m in meta}
    assert quotes["p225_001.wav"] == "Sentence 1 for p225."


def test_clipper_exception_table(clipper_ds, tmp_path):
    root = tmp_path / "clipper2"
    name = "00_00_00_Discord_Neutral__Engage.wav"
    p = str(root / "Sliced Dialogue" / "Other"
            / "Star Trek (John de Lancie, Discord)" / name)
    _touch_wav(p)
    _write(p[:-4] + ".txt", "Engage.")
    meta = get_dataset_meta(str(root), default_speaker="x")
    assert meta[0]["speaker"] == "Q"
    assert meta[0]["source"] == "Star Trek"
    assert meta[0]["source_type"] == "Show"


def test_unknown_layout_raises(tmp_path):
    root = tmp_path / "weird"
    _touch_wav(str(root / "a.wav"))
    _write(str(root / "unrelated.txt"), "x")
    with pytest.raises(NotImplementedError):
        get_dataset_meta(str(root), default_speaker="x")
