"""From-scratch learning evidence: train Tacotron2 on a synthetic but
genuinely alignable corpus and show attention diagonality, the free-running
inference ``weighted_score``, gate accuracy, AND text-content correctness
EMERGING from random init.

Every other training test in the suite is a single-batch overfit or a
converted-checkpoint parity check; this script demonstrates the property
the whole curation / validation / rejection-sampling machinery exists to
serve (the reference validates exactly this — inference-mode attention
quality, CookieTTS/_2_ttm/tacotron2_tm/train.py:774-797, scored by the
weighted score of loss_function.py:266-288).

Corpus: each letter 'a'..'h' is a fixed 90 ms harmonic tone (see
cookietts_tpu/data/evidence_corpus.py). Text→audio correspondence is
strictly monotonic and local, so a correct attention mechanism MUST
discover a diagonal alignment to render the right tones — but nothing
about the mapping is given to the model: it trains from random init with
the standard CLI trainer and held-out validation.

Two findings from round 5 are baked into the recipe and criteria:

1. **The weighted_score alone is gameable on short texts.** Its
   encoder-coverage punishment is gated on text_lengths > 12 (reference
   loss_function.py:266-288 / text2speech.py:596-613 — tuned for real
   sentences), so on this corpus' short utterances a model with fully
   DEGENERATE attention (parked on one token, decoding prosody from the
   previous-frame copy channel) still scores ~0.59. The evidence
   therefore ALSO requires a tone-decoder **character error rate**: the
   corpus' letters are fixed harmonic stacks, so synthesized mels can be
   decoded back to text by template matching — rendering the right tones
   in the right order is impossible without reading the text.
2. **drop_frame_rate is what forces the model off the copy channel —
   and on steady tones it must be dialed near 1.** Within a letter the
   mel is constant, so the teacher-forced prenet input + LSTM carry
   already reveal the current frame and attention gets almost no
   gradient. DFR (the reference's flagship feature, _2_ttm/README.md:
   8-10, MOS 3.84→3.92) replaces teacher frames with the dataset mean;
   measured round 5 on this corpus: dfr 0.0 parks attention on one
   token (CER 0.79 while "scoring" 0.59), dfr 0.3 and dfr 0.35 +
   p_teacher_forcing 0.9 still babble (CER >= 0.88), dfr 0.9 makes the
   attended text context the only reliable tone source and content
   attention finally forms. Real speech needs only the reference's 0.3
   because real frames have intra-phone dynamics the copy channel
   cannot predict; the corpus' steady tones are the adversarial case.

The LR/guided-attention schedule rides the trainer's live-config file
(the reference's run_every_epoch.py mechanism): warmup → flat → decay,
with the guided-attention prior annealed away once alignment exists.

Run:  python tools/train_evidence.py
Writes TRAIN_EVIDENCE.md at the repo root with the measured curves and
the exact reproduction command, and exits nonzero if the success criteria
are not met.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Default to the local CPU backend BEFORE jax import (deterministic,
# reproducible anywhere; the sandbox's axon plugin would otherwise route
# compiles through the TPU tunnel). ``--tpu`` skips the forcing and runs
# on whatever accelerator JAX selects (~6x faster here; curves match CPU
# within normal nondeterminism). JAX_PLATFORM_NAME is the variant the
# plugin honors.
_USE_TPU = "--tpu" in sys.argv
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402

# The sandbox's sitecustomize imports jax BEFORE this file runs, so the
# env vars alone may be too late; this works while no backend is live.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# corpus + tone decoder live in the package so the vocoder-evidence tool
# and the regression test build the bit-identical corpus
from cookietts_tpu.data.evidence_corpus import (  # noqa: E402
    CHARS, MEL_CFG, N_TRAIN, N_VAL, SR, char_error_rate, decode_tones,
    make_corpus, tone_templates)

# model dims shared by the hparams string and the CER-time model rebuild
DIMS = dict(
    symbols_embedding_dim=64, n_speakers=1, speaker_embedding_dim=8,
    encoder_speaker_embed_dim=4, encoder_conv_hidden_dim=64,
    encoder_lstm_dim=32, encoder_n_convolutions=2, torchmoji_dim=8,
    torchmoji_crushed_dim=4, memory_bottleneck_dim=64, prenet_dim=32,
    attention_rnn_dim=128, decoder_rnn_dim=128, second_decoder_rnn_dim=0,
    attention_dim=128, windowed_attention_range=6,
    attention_learned_temperature=True, postnet_embedding_dim=32,
    postnet_n_convolutions=2, postnet_residual_connections=0,
)

HPARAMS = (
    "batch_size=16,"
    f"sampling_rate={SR},filter_length=1024,hop_length=256,win_length=1024,"
    "n_mel_channels=32,mel_fmax=8000.0,trim_enable=False,"
    + ",".join(f"{k}={v}" for k, v in DIMS.items()) + ","
    "text_buckets=[24],mel_buckets=[144],max_segment_frames=144,"
    "validation_interval=100,checkpoint_interval=500,"
    "drop_frame_rate=0.35,p_teacher_forcing=0.9,teacher_force_till=0,"
    "curation_enable=False,"
    # the last piece of the recipe (round 5): at these tiny dims the
    # reference-default train-time corruption (encoder conv dropout 0.5
    # + decoder-RNN dropout 0.25, on TOP of dfr 0.35 + always-on prenet
    # dropout + partial teacher forcing) leaves the decoder UNDERFIT —
    # teacher-forced CER stalls at ~0.32 and renders blend adjacent
    # letters. Dialing just these two to 0.1 drops free-running CER
    # 0.86 -> ~0.1 with the same schedule
    "encoder_conv_dropout=0.1,p_decrnn_dropout=0.1"
)

# 384 train / 16 held-out: big enough that memorizing utterances is a
# WORSE loss minimizer than reading the text (at 96 the model can key
# renders off incidental utterance identity)
N_TRAIN_EVIDENCE = 384

# the reference-style live config (run_every_epoch.py): LR warmup -> flat
# -> exponential decay; drop_frame_rate + partial teacher forcing starve
# the previous-frame copy channel (the corpus' letters are STEADY tones,
# so at dfr=0/p_tf=1 the teacher-forced loss is minimizable through the
# prenet input + LSTM carry alone and attention never carries content);
# a STRONG guided prior (weight 1.0, sigma 0.5) bootstraps the
# monotonic sweep, then anneals away so it stops capping sharpness.
# attention_dim=128 + the learned softmax temperature (DIMS) are what
# let the content term SHARPEN once the sweep exists — measured round 5:
# at attention_dim=32/fixed temperature every recipe (dfr 0..0.9) blurs
# attention over +-3 tokens, the context is the same "average letter"
# everywhere, and free-running CER stays >= 0.86
LIVE_CONFIG = """\
A_ = 1e-3
warmup_start = 0
warmup_end = 300
warmup_start_lr = 2e-4
decay_start = 2000
B_ = 1000.0
C_ = 3e-5
drop_frame_rate = 0.35
p_teacher_forcing = 0.9
# NOTE round 5: earlier recipe drafts wrote 0.2 here, but the live-config
# overlay silently DROPPED keys absent from its defaults (bug found in the
# round-5 review and fixed in runtime/live_config.py) — every measured run,
# including the committed TRAIN_EVIDENCE.md one, actually trained at the
# 0.5 default. 0.5 is therefore the honest, reproducing value.
guided_att_sigma = 0.5
loss_scalars = {"diag_att_weight": (
    1.0 if iteration < 1200
    else max(0.0, 1.0 - (iteration - 1200) / 1200.0))}
"""


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


def free_running_cer(run_dir: str, val_fl: str, checkpoint: str = None,
                     nfps: int = 1, mel_bucket: int = 144):
    """Synthesize every held-out utterance free-running from the latest
    checkpoint and decode the tones back to text. Returns
    (mean CER, gt sanity CER, [(text, decoded)])."""
    import jax.numpy as jnp

    from cookietts_tpu.data.dataset import DataConfig, TTSDataset, collate
    from cookietts_tpu.data.filelist import load_filelist
    from cookietts_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
    from cookietts_tpu.runtime.checkpoint import load_checkpoint
    from cookietts_tpu.text import N_SYMBOLS

    if checkpoint is None:
        from cookietts_tpu.runtime.checkpoint import Checkpointer
        checkpoint = Checkpointer(run_dir).latest()
    tree, meta = load_checkpoint(checkpoint)
    # prefer the dims recorded in the checkpoint sidecar (lets this
    # evaluate recipe probes whose dims differ from DIMS)
    dims = dict(DIMS)
    if meta and meta.get("model_config"):
        dims.update({k: v for k, v in meta["model_config"].items()
                     if k in Tacotron2Config.__dataclass_fields__})
        for k in ("n_mel_channels", "n_frames_per_step", "n_symbols"):
            dims.pop(k, None)
    cfg = Tacotron2Config(n_symbols=N_SYMBOLS, n_mel_channels=32,
                          n_frames_per_step=nfps, **dims)
    model = Tacotron2(cfg)
    variables = {"params": tree["params"], **tree.get("mutables", {})}

    dcfg = DataConfig(sampling_rate=SR, filter_length=1024, hop_length=256,
                      win_length=1024, n_mel_channels=32, mel_fmax=8000.0,
                      trim_enable=False, text_buckets=[24],
                      mel_buckets=[mel_bucket])
    entries = load_filelist(val_fl)
    ds = TTSDataset(entries, dcfg,
                    features=("text", "mel", "speaker_id", "sylps", "gate"))
    b = collate([ds[i] for i in range(len(ds))], dcfg)
    batch = {k: jnp.asarray(v) for k, v in b.items() if k != "audiopath"}
    out = model.apply(
        variables, text=batch["text"], text_lengths=batch["text_lengths"],
        speaker_id=batch["speaker_id"], sylps=batch["sylps"],
        key=jax.random.PRNGKey(0),
        max_decoder_steps=int(batch["mels"].shape[1]),
        method=Tacotron2.inference)

    templates = tone_templates()
    texts = [e["quote"].replace(" ", "") for e in entries]
    cers, pairs, gt_cers = [], [], []
    for i, text in enumerate(texts):
        pred = decode_tones(np.asarray(out["mel_outputs_postnet"][i]),
                            int(out["mel_lengths"][i]), templates)
        cers.append(char_error_rate(pred, text))
        pairs.append((text, pred))
        gt = decode_tones(np.asarray(b["mels"][i]),
                          int(b["mel_lengths"][i]), templates)
        gt_cers.append(char_error_rate(gt, text))
    return float(np.mean(cers)), float(np.mean(gt_cers)), pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3500)
    ap.add_argument("--work", default="/tmp/train_evidence")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--nfps", type=int, default=1,
                    help="n_frames_per_step: 4 backs the r=4 interactive-"
                         "serving headline with training-quality evidence "
                         "(the reference declares but never implemented "
                         "r>1, hparams.py:209)")
    ap.add_argument("--resume", action="store_true",
                    help="continue the run in --work to --iters")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the accelerator JAX selects instead of "
                         "the deterministic CPU default (must be first "
                         "parsed pre-import; see module header)")
    ap.add_argument("--report", default=None,
                    help="default TRAIN_EVIDENCE.md "
                         "(TRAIN_EVIDENCE_R{nfps}.md for --nfps > 1)")
    args = ap.parse_args()
    if args.report is None:
        args.report = os.path.join(
            REPO, "TRAIN_EVIDENCE.md" if args.nfps == 1
            else f"TRAIN_EVIDENCE_R{args.nfps}.md")
    hparams = HPARAMS
    mel_bucket = 144
    if args.nfps != 1:
        # group-quantized durations run 2-3 r-frame groups per letter
        # (up to 12 letters x 12 frames + gaps + tail), so the single
        # fixed mel bucket grows; must stay divisible by r
        mel_bucket = 192
        hparams += (f",n_frames_per_step={args.nfps}"
                    f",mel_buckets=[{mel_bucket}]"
                    f",max_segment_frames={mel_bucket}")
        if args.work == "/tmp/train_evidence":
            args.work = f"/tmp/train_evidence_r{args.nfps}"

    train_fl, val_fl = make_corpus(
        args.work, args.seed, n_train=N_TRAIN_EVIDENCE,
        # r > 1: quantize every duration to whole decoder groups — the
        # boundary phase WITHIN a group is irreducible entropy no
        # decoder can predict (see evidence_corpus.render docstring);
        # durations stay jittered in GROUP COUNTS so the alignment task
        # is intact and the corpus stays ungameable
        frame_multiple=args.nfps if args.nfps != 1 else 0)
    run_dir = os.path.join(args.work, "run")
    live_path = os.path.join(args.work, "run_every_epoch.py")
    with open(live_path, "w") as f:
        f.write(LIVE_CONFIG)
    cmd = ["train", "--model", "tacotron2",
           "--filelist", train_fl, "--val_filelist", val_fl,
           "--iters", str(args.iters), "--run_dir", run_dir,
           "--live_config", live_path,
           "--hparams", hparams]
    if args.resume:
        cmd.append("--resume")

    from cookietts_tpu import cli
    t0 = time.time()
    try:
        cli.main(cmd)
    except SystemExit as e:
        # --resume on an already-complete run: regenerate the report
        # from the existing events/checkpoints instead of dying
        if not (args.resume and "nothing to do" in str(e)):
            raise
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

    cer, gt_cer, pairs = free_running_cer(run_dir, val_fl, nfps=args.nfps,
                                          mel_bucket=mel_bucket)

    ok = (first["inf_weighted_score"] < 0.40
          and peak["inf_weighted_score"] > 0.60
          and last["inf_weighted_score"] > 0.55
          and peak["inf_gate_fired"] > 0.90
          and cer < 0.15)
    # gate PLACEMENT: the decoder stops within ~0.14 s of the true end
    if last.get("inf_len_abs_err") is not None:
        ok = ok and last["inf_len_abs_err"] < 12.0

    shell = ("python tools/train_evidence.py "
             f"--iters {args.iters} --seed {args.seed}"
             + (" --tpu" if _USE_TPU else "")
             + (f" --nfps {args.nfps}" if args.nfps != 1 else ""))
    cli_cmd = "python -m cookietts_tpu " + " ".join(
        (f'"{a}"' if " " in a or "," in a else a)
        for a in cmd if a != "--resume")

    title = "# TRAIN_EVIDENCE — from-scratch alignment learning"
    if args.nfps != 1:
        title = (f"# TRAIN_EVIDENCE_R{args.nfps} — from-scratch alignment "
                 f"learning at n_frames_per_step={args.nfps}")
    lines = [
        title,
        "",
    ] + ([f"Same recipe/criteria as TRAIN_EVIDENCE.md but decoding "
          f"{args.nfps} mel frames per decoder step — the novel surface "
          "behind the r=4 interactive-serving headline (the reference "
          "only declares n_frames_per_step, hparams.py:209). The corpus' "
          "duration jitter is quantized to whole decoder groups "
          f"(letters last 2 or 3 random {args.nfps}-frame groups): an "
          "r-step decoder commits to r frames per attention read, so a "
          "boundary whose phase WITHIN a group is uniform-random is "
          "irreducible entropy — measured, teacher-forced CER floors at "
          "~0.73 at r=4 on the unquantized corpus no matter the recipe. "
          "That entropy is an artifact of the corpus' hard 0 ms tone "
          "switches (real speech co-articulates through boundaries); "
          "group quantization removes only the unlearnable phase while "
          "keeping WHEN each tone changes knowable solely from the text "
          "(evidence_corpus.render docstring).", ""]
         if args.nfps != 1 else []) + [
        "Proof that the framework *learns* (not merely *equals* converted",
        "checkpoints): Tacotron2 trained from random init by the standard",
        "CLI trainer on a synthetic strictly-monotonic corpus (each letter",
        "is a unique 90 ms harmonic tone; held-out validation filelist).",
        "The free-running inference attention score — the metric that",
        "drives `best_inf_attsc`, dataset curation, and server rejection",
        "sampling — rises from noise to production quality, the gate",
        "learns to stop, and (the ungameable check) the synthesized tones",
        "DECODE BACK to the input text.",
        "",
        f"Backend: **{jax.default_backend()}** ({jax.devices()[0]}) — "
        + ("the real chip; this run doubles as the on-chip training smoke"
           if _USE_TPU else "deterministic CPU run"),
        "",
        "Reproduce (single process; CPU default is deterministic "
        "given the seed):",
        "```",
        shell,
        "```",
        "which generates the corpus under /tmp/train_evidence, writes the",
        "live-config schedule (run_every_epoch.py-style), and runs:",
        "```",
        cli_cmd,
        "```",
        "",
        f"- corpus: {N_TRAIN_EVIDENCE} train / {N_VAL} held-out utterances, "
        f"alphabet {CHARS!r}, 2-3 words of 2-4 letters",
        (f"- report generated with --resume from an existing run "
         f"(train wall clock not re-measured)" if args.resume else
         f"- wall clock: {wall / 60.0:.1f} min "
         f"({args.iters} iters, batch 16)"),
        f"- teacher-forced train loss: {t_loss0:.3f} -> {t_loss1:.3f}",
        "- recipe notes: drop_frame_rate=0.35 AND p_teacher_forcing=0.9 "
        "are ESSENTIAL on this corpus (letters are steady tones, so at "
        "dfr=0/p_tf=1 the decoder copies the teacher-forced previous "
        "frame through the LSTM carry and attention never learns — "
        "measured round 5: dfr=0 parks attention on one token, CER ~0.79; "
        "dfr=0.3 alone still babbles, CER ~0.93); a strong narrow guided "
        "prior (weight 1.0, sigma 0.5) bootstraps the monotonic sweep "
        "and anneals away via the live config while the LR decays; and "
        "train-time corruption must be dialed DOWN at these tiny dims "
        "(encoder conv dropout 0.5->0.1, decoder-RNN dropout 0.25->0.1 — "
        "at the reference defaults the decoder underfits rendering: "
        "teacher-forced CER stalls at ~0.32 and free-running CER >= 0.86 "
        "with the identical schedule).",
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
        "Tone-decoder readback of the final checkpoint's free-running",
        "synthesis (template-match each frame to a letter's harmonic",
        "stack, collapse runs — evidence_corpus.py):",
        "",
        "| held-out text (spaces stripped) | decoded from synthesis |",
        "|---|---|",
    ]
    for text, pred in pairs:
        lines.append(f"| `{text}` | `{pred}` |")
    lines += [
        "",
        f"- free-running character error rate: **{cer:.3f}** "
        f"(decoder sanity floor on ground-truth mels: {gt_cer:.3f})",
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
        f"- tone-decoder CER {cer:.3f} < 0.15 — the weighted_score's "
        "coverage punishment is text_lengths>12-gated (reference "
        "loss_function.py:266-288), so on short utterances it can be "
        "satisfied WITHOUT reading the text; CER cannot",
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
