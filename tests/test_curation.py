"""Dataset-curation tests (host-side, no jax)."""
from cookietts_tpu.data.curation import (
    filter_by_attention_quality, mse_weighted_resample)


def _entries():
    return [
        {"path": f"s{spk}_{i}.wav", "quote": "q", "speaker_id": spk}
        for spk in (0, 1) for i in range(10)
    ]


def test_filter_by_attention_quality():
    entries = _entries()
    losses = {"s0_0.wav": {"att_score": 0.2},          # bad -> dropped
              "s0_1.wav": {"att_score": 0.9},          # good -> kept
              "s1_0.wav": {"avg_max_attention": 0.1}}  # bad -> dropped
    kept = filter_by_attention_quality(entries, losses)
    paths = {e["path"] for e in kept}
    assert "s0_0.wav" not in paths and "s1_0.wav" not in paths
    assert "s0_1.wav" in paths
    assert len(kept) == 18        # unjudged files all kept


def test_mse_weighted_resample_oversamples_hard_speaker():
    entries = _entries()
    losses = {}
    for i in range(10):
        losses[f"s0_{i}.wav"] = {"spec_MSE": 0.9}   # hard speaker
        losses[f"s1_{i}.wav"] = {"spec_MSE": 0.1}   # easy speaker
    new = mse_weighted_resample(entries, losses, exp_factor=1.0, seed=0)
    n0 = sum(1 for e in new if e["speaker_id"] == 0)
    n1 = sum(1 for e in new if e["speaker_id"] == 1)
    assert n0 > n1                                   # hard gets more
    assert abs(len(new) - len(entries)) <= 2         # ~constant size
    assert n0 >= 15                                  # ~0.9/1.0 of 20


def test_mse_weighted_resample_no_losses_noop():
    entries = _entries()
    assert mse_weighted_resample(entries, {}) == entries


def test_mse_weighted_resample_never_drops_speakers():
    """The rebuilt list feeds the NEXT epoch's curation, so a speaker
    missing here can never return: speakers with no loss record keep
    their files unchanged, and judged-but-easy speakers keep >=1 file
    even when their share rounds to zero."""
    entries = _entries()          # speakers 0 and 1, 10 files each
    # speaker 2: never judged (no loss record at all)
    entries = entries + [{"path": f"s2_{i}.wav", "speaker_id": 2}
                         for i in range(4)]
    losses = {}
    for i in range(10):
        losses[f"s0_{i}.wav"] = {"spec_MSE": 100.0}  # dominates the share
        losses[f"s1_{i}.wav"] = {"spec_MSE": 1e-6}   # rounds to zero
    new = mse_weighted_resample(entries, losses, exp_factor=1.0, seed=0)
    spk = {e["speaker_id"] for e in new}
    assert spk == {0, 1, 2}
    # the unjudged speaker's files are untouched
    assert sum(1 for e in new if e["speaker_id"] == 2) == 4
    # the easy speaker keeps at least one file
    assert sum(1 for e in new if e["speaker_id"] == 1) >= 1
