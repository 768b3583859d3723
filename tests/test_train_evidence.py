"""Regression guard on the from-scratch learning evidence.

Round-4 VERDICT item 1 asked for a fast test "asserting weighted_score
crosses 0.0 and gate_fired > 0.9" on the committed seed so the learning
property cannot silently rot. This runs the committed recipe
(tools/train_evidence.py — duration-jittered corpus, dfr=0.35 +
p_teacher_forcing=0.9, attention_dim=128 + learned softmax temperature,
strong annealed guided prior) for 400 iterations on the deterministic
CPU backend and checks the curve SHAPE: held-out free-running
weighted_score starts at noise (< -0.5) and crosses 0.0 with the gate
firing on >90% of utterances. The full 3500-iter run (peak > 0.60 and
tone-decoder CER < 0.15) is the committed TRAIN_EVIDENCE.md artifact;
at 400 iters the reference TPU run measures -2.1 @100 -> 0.41 @400 with
gate_fired 1.0, so the thresholds here carry wide margins.

This is the slowest test in the suite (~10-15 min on 1 CPU core: corpus
featurization + 400 train iters). Reference purpose match:
CookieTTS/_2_ttm/tacotron2_tm/train.py:774-797 (inference-mode
validation scoring).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_evidence_recipe_400_iters(tmp_path):
    work = tmp_path / "w"
    report = tmp_path / "report.md"
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               JAX_COMPILATION_CACHE_DIR=os.environ.get(
                   "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
    env.pop("XLA_FLAGS", None)     # no 8-device mesh for this run
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_evidence.py"),
         "--iters", "400", "--work", str(work), "--report", str(report)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3000)
    # at 400 iters the tool's FULL criteria (peak > 0.60, CER < 0.15)
    # are not yet met, so its exit code is informational here; the
    # regression property is the curve shape below
    events = work / "run" / "events.jsonl"
    assert events.exists(), (
        f"no events written; tool output:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-3000:]}")
    inf = []
    with open(events) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("prefix") == "validation_inf":
                inf.append(rec)
    assert len(inf) >= 3, f"expected >=3 inference validations, got {inf}"
    first, last = inf[0], inf[-1]
    assert first["val_inf_weighted_score"] < -0.5, (
        "random-init free-running attention should score as noise, got "
        f"{first['val_inf_weighted_score']}")
    assert last["val_inf_weighted_score"] > 0.0, (
        "weighted_score failed to cross 0.0 by iter 400: "
        f"{[r['val_inf_weighted_score'] for r in inf]}")
    assert last["val_inf_gate_fired"] > 0.9, (
        f"gate should fire on held-out utterances by iter 400, got "
        f"{last['val_inf_gate_fired']}")
