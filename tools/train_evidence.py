"""From-scratch learning evidence: train Tacotron2 on a synthetic but
genuinely alignable corpus and show attention diagonality, the free-running
inference ``weighted_score``, and gate accuracy EMERGING from random init.

Every other training test in the suite is a single-batch overfit or a
converted-checkpoint parity check; this script demonstrates the property
the whole curation / validation / rejection-sampling machinery exists to
serve (the reference validates exactly this — inference-mode attention
quality, CookieTTS/_2_ttm/tacotron2_tm/train.py:774-797, scored by the
weighted score of loss_function.py:266-288).

Corpus: each letter 'a'..'h' is a fixed 90 ms harmonic tone (log-spaced
fundamentals 220–1575 Hz + two harmonics), words are separated by 60 ms of
silence, and every utterance ends in 200 ms of silence (the gate target).
Text→audio correspondence is therefore strictly monotonic and local, so a
correct attention mechanism MUST discover a diagonal alignment to predict
the mel — but nothing about the mapping is given to the model: it trains
from random init with the standard CLI trainer, standard loss weights
(guided attention at its default 0.05), and held-out validation.

Run:  python tools/train_evidence.py --iters 3000
Writes TRAIN_EVIDENCE.md at the repo root with the measured curve and the
exact reproduction command, and exits nonzero if the success criteria are
not met (inference weighted_score noise -> >0.6, gate firing on >90% of
held-out utterances).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Force the local CPU backend BEFORE jax import (the sandbox's axon plugin
# would otherwise route compiles through the TPU tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402

# The sandbox's sitecustomize imports jax BEFORE this file runs, so the
# env vars alone may be too late; this works while no backend is live.
jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 22050
CHARS = "abcdefgh"
CHAR_S = 0.090          # seconds per letter tone
GAP_S = 0.060           # inter-word silence
END_S = 0.200           # trailing silence -> gate target
N_TRAIN, N_VAL = 96, 16

HPARAMS = (
    "batch_size=16,"
    f"sampling_rate={SR},filter_length=1024,hop_length=256,win_length=1024,"
    "n_mel_channels=32,mel_fmax=8000.0,trim_enable=False,"
    "symbols_embedding_dim=64,n_speakers=1,speaker_embedding_dim=8,"
    "encoder_speaker_embed_dim=4,encoder_conv_hidden_dim=64,"
    "encoder_lstm_dim=32,encoder_n_convolutions=2,torchmoji_dim=8,"
    "torchmoji_crushed_dim=4,memory_bottleneck_dim=64,prenet_dim=32,"
    "attention_rnn_dim=128,decoder_rnn_dim=128,second_decoder_rnn_dim=0,"
    "attention_dim=32,windowed_attention_range=6,postnet_embedding_dim=32,"
    "postnet_n_convolutions=2,postnet_residual_connections=0,"
    "text_buckets=[24],mel_buckets=[144],max_segment_frames=144,"
    "validation_interval=100,checkpoint_interval=100000,"
    "drop_frame_rate=0.0,p_teacher_forcing=1.0,teacher_force_till=0,"
    "curation_enable=False"
)


def char_tone(c: str, rng: np.random.Generator) -> np.ndarray:
    """90 ms harmonic tone unique to the letter; 5 ms fades, tiny noise."""
    i = CHARS.index(c)
    f0 = 220.0 * (1575.0 / 220.0) ** (i / (len(CHARS) - 1))
    t = np.arange(int(SR * CHAR_S)) / SR
    x = (0.50 * np.sin(2 * np.pi * f0 * t)
         + 0.25 * np.sin(2 * np.pi * 2 * f0 * t)
         + 0.12 * np.sin(2 * np.pi * 3 * f0 * t))
    fade = int(0.005 * SR)
    env = np.ones_like(x)
    env[:fade] = np.linspace(0, 1, fade)
    env[-fade:] = np.linspace(1, 0, fade)
    return (0.5 * x * env + 0.001 * rng.standard_normal(len(x))
            ).astype(np.float32)


def render(text: str, rng: np.random.Generator) -> np.ndarray:
    parts = []
    for w, word in enumerate(text.split(" ")):
        if w:
            parts.append(np.zeros(int(SR * GAP_S), np.float32))
        for c in word:
            parts.append(char_tone(c, rng))
    parts.append(np.zeros(int(SR * END_S), np.float32))
    return np.concatenate(parts)


def make_corpus(work: str, seed: int = 0):
    from cookietts_tpu.data import audio_io
    rng = np.random.default_rng(seed)
    os.makedirs(work, exist_ok=True)
    seen, texts = set(), []
    while len(texts) < N_TRAIN + N_VAL:
        n_words = int(rng.integers(2, 4))
        words = ["".join(rng.choice(list(CHARS),
                                    size=int(rng.integers(2, 5))))
                 for _ in range(n_words)]
        t = " ".join(words)
        if len(t) <= 14 and t not in seen:
            seen.add(t)
            texts.append(t)
    lines = []
    for i, t in enumerate(texts):
        p = os.path.join(work, f"u{i:03d}.wav")
        audio_io.save_wav(p, render(t, rng), SR)
        lines.append(f"{p}|{t}|0")
    train_fl = os.path.join(work, "filelist_train.txt")
    val_fl = os.path.join(work, "filelist_validation.txt")
    with open(train_fl, "w") as f:
        f.write("\n".join(lines[:N_TRAIN]))
    with open(val_fl, "w") as f:
        f.write("\n".join(lines[N_TRAIN:]))
    return train_fl, val_fl


def parse_curve(run_dir: str):
    """(iteration -> scalars) for the train / validation_inf streams."""
    train, inf, val = [], [], []
    with open(os.path.join(run_dir, "events.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("prefix") == "train" and "loss" in rec:
                train.append(rec)
            elif rec.get("prefix") == "validation_inf":
                inf.append(rec)
            elif rec.get("prefix") == "validation":
                val.append(rec)
    return train, val, inf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--work", default="/tmp/train_evidence")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", action="store_true",
                    help="continue the run in --work to --iters")
    ap.add_argument("--report", default=os.path.join(REPO,
                                                     "TRAIN_EVIDENCE.md"))
    args = ap.parse_args()

    train_fl, val_fl = make_corpus(args.work, args.seed)
    run_dir = os.path.join(args.work, "run")
    cmd = ["train", "--model", "tacotron2",
           "--filelist", train_fl, "--val_filelist", val_fl,
           "--iters", str(args.iters), "--run_dir", run_dir,
           "--hparams", HPARAMS + ",checkpoint_interval=500"]
    if args.resume:
        cmd.append("--resume")

    from cookietts_tpu import cli
    t0 = time.time()
    cli.main(cmd)
    wall = time.time() - t0

    train, val, inf = parse_curve(run_dir)
    rows = []
    for rec in inf:
        rows.append({
            "iteration": rec["step"],
            "inf_weighted_score": rec.get("val_inf_weighted_score"),
            "inf_diagonality": rec.get("val_inf_diagonality"),
            "inf_avg_max_attention": rec.get("val_inf_avg_max_attention"),
            "inf_gate_fired": rec.get("val_inf_gate_fired"),
            "inf_len_abs_err": rec.get("val_inf_len_abs_err"),
        })
    first, last = rows[0], rows[-1]
    peak = max(rows, key=lambda r: r["inf_weighted_score"])
    t_loss0 = train[0]["loss"]
    t_loss1 = np.mean([r["loss"] for r in train[-20:]])

    ok = (first["inf_weighted_score"] < 0.40
          and peak["inf_weighted_score"] > 0.60
          and last["inf_weighted_score"] > 0.55
          and peak["inf_gate_fired"] > 0.90)
    # gate PLACEMENT (where available — older events predate the metric):
    # the decoder stops within ~0.14 s of the true utterance end
    if last.get("inf_len_abs_err") is not None:
        ok = ok and last["inf_len_abs_err"] < 12.0

    shell = ("python tools/train_evidence.py "
             f"--iters {args.iters} --seed {args.seed}")
    cli_cmd = "python -m cookietts_tpu " + " ".join(
        (f'"{a}"' if " " in a or "," in a else a) for a in cmd)

    lines = [
        "# TRAIN_EVIDENCE — from-scratch alignment learning",
        "",
        "Proof that the framework *learns* (not merely *equals* converted",
        "checkpoints): Tacotron2 trained from random init by the standard",
        "CLI trainer on a synthetic strictly-monotonic corpus (each letter",
        "is a unique 90 ms harmonic tone; held-out validation filelist).",
        "The free-running inference attention score — the metric that",
        "drives `best_inf_attsc`, dataset curation, and server rejection",
        "sampling — rises from noise to production quality, and the gate",
        "learns to stop.",
        "",
        "Reproduce (CPU, single process; deterministic given the seed):",
        "```",
        shell,
        "```",
        "which generates the corpus under /tmp/train_evidence and runs:",
        "```",
        cli_cmd,
        "```",
        "",
        f"- corpus: {N_TRAIN} train / {N_VAL} held-out utterances, "
        f"alphabet {CHARS!r}, 2-3 words of 2-4 letters",
        f"- wall clock: {wall / 60.0:.1f} min on 1 CPU core "
        f"({args.iters} iters, batch 16)",
        f"- teacher-forced train loss: {t_loss0:.3f} -> {t_loss1:.3f}",
        "",
        "Held-out FREE-RUNNING inference validation "
        "(`validation_inf` stream of events.jsonl):",
        "",
        "| iteration | weighted_score | diagonality | avg_max_attention "
        "| gate_fired | len_abs_err (frames) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        err = r.get("inf_len_abs_err")
        lines.append(
            f"| {r['iteration']} | {r['inf_weighted_score']:.3f} "
            f"| {r['inf_diagonality']:.3f} "
            f"| {r['inf_avg_max_attention']:.3f} "
            f"| {r['inf_gate_fired']:.2f} "
            f"| {'-' if err is None else format(err, '.1f')} |")
    lines += [
        "",
        "Success criteria (all measured on the HELD-OUT set, free-running):",
        f"- initial weighted_score {first['inf_weighted_score']:.3f} < 0.40 "
        "(random-init attention is noise)",
        f"- peak weighted_score {peak['inf_weighted_score']:.3f} > 0.60 "
        "(the reference server's default target_score is 0.75 for fully "
        "trained multi-speaker models; 0.6 is its curation keep threshold)",
        f"- final weighted_score {last['inf_weighted_score']:.3f} > 0.55",
        f"- peak gate_fired {peak['inf_gate_fired']:.2f} > 0.90 "
        "(the decoder stops by itself instead of running out the budget)",
        (f"- final gate placement error "
         f"{last['inf_len_abs_err']:.1f} frames < 12 "
         "(stops within ~0.14 s of the true utterance end)"
         if last.get("inf_len_abs_err") is not None else
         "- gate placement: (metric added mid-run; see later rows)"),
        "",
        f"**Result: {'PASS' if ok else 'FAIL'}**",
        "",
    ]
    with open(args.report, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
