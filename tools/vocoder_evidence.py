"""From-scratch VOCODER learning evidence: train WaveGlow and HiFi-GAN by
the standard CLI from random init on the evidence corpus' audio and show
the reference's own validation metrics improving.

- WaveGlow: held-out multi-window STFT MSE of *inverse-sampled* audio
  falling from random init — the reference's vocoder validation protocol
  (CookieTTS/_4_mtw/waveglow/train.py:184-341: model.infer, then
  multi-window STFT MSE/MAE vs ground truth).
- HiFi-GAN: a staged adversarial run reaching D/G equilibrium while the
  held-out mel-reconstruction L1 falls (train.py:26-283; mel L1 weight 45
  anchors the generator).

Runs on whatever backend JAX selects (under the driver this is the real
v5e chip — the run doubles as on-chip training evidence); ``--cpu``
forces the deterministic CPU backend.

Run:  python tools/vocoder_evidence.py
Writes VOCODER_EVIDENCE.md at the repo root with both measured curves and
the exact reproduction commands; exits nonzero if the success criteria
are not met.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WG_HPARAMS = (
    "batch_size=8,lr=4e-4,"
    "sampling_rate=22050,filter_length=1024,hop_length=256,win_length=1024,"
    "n_mel_channels=32,mel_fmax=8000.0,segment_length=8192,"
    "n_flows=6,n_group=8,n_early_every=0,n_early_size=0,"
    "n_layers=4,n_channels=64,upsample_strides=[8,4],"
    "upsample_channels=64,validate_at_start=true,"
    "validation_interval=50,checkpoint_interval=100000"
)

HG_HPARAMS = (
    "batch_size=8,lr=2e-4,"
    "sampling_rate=22050,filter_length=1024,hop_length=256,win_length=1024,"
    "n_mel_channels=32,mel_fmax=8000.0,segment_length=8192,"
    "upsample_rates=[8,8,2,2],upsample_kernel_sizes=[16,16,4,4],"
    "upsample_initial_channel=128,resblock_kernel_sizes=[3,7],"
    "resblock_dilations=[[1,3,5],[1,3,5]],validate_at_start=true,"
    "validation_interval=50,checkpoint_interval=100000"
)


def parse_val(run_dir: str):
    vals = []
    with open(os.path.join(run_dir, "events.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("prefix") == "validation":
                vals.append(rec)
    return vals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters_waveglow", type=int, default=800)
    ap.add_argument("--iters_hifigan", type=int, default=800)
    ap.add_argument("--work", default="/tmp/vocoder_evidence")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the deterministic CPU backend")
    ap.add_argument("--report", default=os.path.join(REPO,
                                                     "VOCODER_EVIDENCE.md"))
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    device = str(jax.devices()[0])

    from cookietts_tpu.data.evidence_corpus import make_vocoder_maps
    tmap, vmap = make_vocoder_maps(args.work, args.seed)

    from cookietts_tpu import cli

    wg_dir = os.path.join(args.work, "waveglow_run")
    wg_cmd = ["train", "--model", "waveglow",
              "--filelist", tmap, "--val_filelist", vmap,
              "--iters", str(args.iters_waveglow), "--run_dir", wg_dir,
              "--hparams", WG_HPARAMS]
    t0 = time.time()
    cli.main(wg_cmd)
    wg_wall = time.time() - t0

    hg_dir = os.path.join(args.work, "hifigan_run")
    hg_cmd = ["train", "--model", "hifigan",
              "--filelist", tmap, "--val_filelist", vmap,
              "--iters", str(args.iters_hifigan), "--run_dir", hg_dir,
              "--hparams", HG_HPARAMS]
    t0 = time.time()
    cli.main(hg_cmd)
    hg_wall = time.time() - t0

    wg = parse_val(wg_dir)
    hg = parse_val(hg_dir)
    wg_first, wg_last = wg[0], wg[-1]
    wg_best = min(wg, key=lambda r: r["val_MSE"])
    hg_first, hg_last = hg[0], hg[-1]
    hg_best = min(hg, key=lambda r: r["val_mel_l1"])

    # D/G equilibrium over the last quarter of the run: the discriminator
    # neither collapses (d_loss -> 0: D wins outright, no G gradient) nor
    # diverges; both sides keep stepping
    with open(os.path.join(hg_dir, "events.jsonl")) as f:
        hg_train = [json.loads(ln) for ln in f]
    hg_train = [r for r in hg_train
                if r.get("prefix") == "train" and "d_loss" in r]
    tail = hg_train[-max(len(hg_train) // 4, 1):]
    d_tail = [r["d_loss"] for r in tail]
    d_mean = float(sum(d_tail) / len(d_tail))

    wg_ok = (wg_best["val_MSE"] < 0.5 * wg_first["val_MSE"]
             and wg_last["val_MSE"] < 0.7 * wg_first["val_MSE"])
    hg_ok = (hg_best["val_mel_l1"] < 0.5 * hg_first["val_mel_l1"]
             and hg_last["val_mel_l1"] < 0.7 * hg_first["val_mel_l1"]
             and 0.05 < d_mean < 2.5)
    ok = wg_ok and hg_ok

    def fmt_cmd(cmd):
        return "python -m cookietts_tpu " + " ".join(
            (f'"{a}"' if "," in a or " " in a else a) for a in cmd)

    lines = [
        "# VOCODER_EVIDENCE — from-scratch vocoder learning",
        "",
        "Both vocoder families trained from random init by the standard",
        "CLI trainers on the evidence corpus' audio (96 train / 16",
        "held-out utterances of harmonic tone stacks; see",
        "cookietts_tpu/data/evidence_corpus.py), validated with the",
        "reference's own protocols.",
        "",
        f"Backend: **{backend}** ({device}) — "
        + ("deterministic CPU run" if args.cpu else
           "the real chip; this run is also the on-chip training smoke"),
        "",
        "Reproduce:",
        "```",
        f"python tools/vocoder_evidence.py --seed {args.seed}"
        + (" --cpu" if args.cpu else ""),
        "```",
        "which builds the corpus maps under "
        f"{args.work} and runs:",
        "```",
        fmt_cmd(wg_cmd),
        fmt_cmd(hg_cmd),
        "```",
        "",
        "## WaveGlow — held-out multi-window STFT MSE of sampled audio",
        "",
        "The reference's vocoder validation: invert the flow from",
        "sampled z, compare multi-window STFT magnitudes to ground truth",
        "(_4_mtw/waveglow/train.py:184-341).",
        "",
        f"- wall clock: {wg_wall / 60.0:.1f} min "
        f"({args.iters_waveglow} iters, batch 8, 8192-sample segments)",
        "",
        "| iteration | val STFT MSE | val STFT MAE |",
        "|---|---|---|",
    ]
    for r in wg:
        lines.append(f"| {r['step']} | {r['val_MSE']:.4f} "
                     f"| {r['val_MAE']:.4f} |")
    lines += [
        "",
        f"- first -> best -> last: {wg_first['val_MSE']:.4f} -> "
        f"{wg_best['val_MSE']:.4f} (iter {wg_best['step']}) -> "
        f"{wg_last['val_MSE']:.4f}",
        f"- criteria: best < 0.5x first AND last < 0.7x first -> "
        f"**{'PASS' if wg_ok else 'FAIL'}**",
        "",
        "## HiFi-GAN — held-out mel L1 + D/G equilibrium",
        "",
        "Adversarial training with the reference's loss arrangement",
        "(mel L1 45x, feature matching 2x, MPD+MSD BCE,",
        "_4_mtw/hifigan/train.py:26-283).",
        "",
        f"- wall clock: {hg_wall / 60.0:.1f} min "
        f"({args.iters_hifigan} iters, batch 8)",
        "",
        "| iteration | val mel L1 |",
        "|---|---|",
    ]
    for r in hg:
        lines.append(f"| {r['step']} | {r['val_mel_l1']:.4f} |")
    lines += [
        "",
        f"- first -> best -> last: {hg_first['val_mel_l1']:.4f} -> "
        f"{hg_best['val_mel_l1']:.4f} (iter {hg_best['step']}) -> "
        f"{hg_last['val_mel_l1']:.4f}",
        f"- discriminator loss, last quarter mean: {d_mean:.3f} "
        "(equilibrium band 0.05-2.5: neither collapsed nor diverged)",
        f"- criteria: best < 0.5x first AND last < 0.7x first AND "
        f"d_loss in band -> **{'PASS' if hg_ok else 'FAIL'}**",
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
