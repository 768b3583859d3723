"""Recipe probe harness for the learning-evidence corpus.

Runs ONE variant of the tools/train_evidence.py recipe (extra hparams
and/or a replacement live-config schedule) on the shared evidence corpus
and leaves a run directory with checkpoints + events.jsonl to evaluate.
Used in round 5 to search the recipe space (drop_frame_rate /
p_teacher_forcing / attention dims / train-time dropout) — committed so
the search that produced TRAIN_EVIDENCE.md is reproducible.

Evaluate a probe's content accuracy with the tone decoder::

    python tools/evidence_probe.py myprobe --iters 2500 \
        --hparams encoder_conv_dropout=0.1 &
    # later:
    python -c "import sys; sys.argv=['x']; sys.path.insert(0,'.'); \
        from tools.train_evidence import free_running_cer; \
        print(free_running_cer('/tmp/myprobe/run', \
                               '/tmp/myprobe/filelist_validation.txt')[0])"

Reference purpose match: the reference tunes exactly these knobs by
hand-editing hparams.py + run_every_epoch.py between runs
(CookieTTS/_2_ttm/tacotron2_tm/hparams.py, run_every_epoch.py); this
makes one such experiment a single reproducible command.
"""
from __future__ import annotations

import argparse
import os
import sys

_USE_TPU = "--tpu" in sys.argv
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cookietts_tpu.data import evidence_corpus as ec  # noqa: E402
from tools.train_evidence import (HPARAMS, LIVE_CONFIG,  # noqa: E402
                                  N_TRAIN_EVIDENCE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("name", help="probe name -> /tmp/<name>")
    ap.add_argument("--iters", type=int, default=3500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--hparams", default="",
                    help="comma-separated overrides appended to the "
                         "evidence HPARAMS (later keys win)")
    ap.add_argument("--live_config", default=None,
                    help="path to a replacement run_every_epoch.py-style "
                         "schedule (default: the committed evidence one)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the accelerator JAX selects (parsed "
                         "pre-import; see module header)")
    args = ap.parse_args()

    work = f"/tmp/{args.name}"
    train_fl, val_fl = ec.make_corpus(work, args.seed,
                                      n_train=N_TRAIN_EVIDENCE)
    live_path = os.path.join(work, "live.py")
    if args.live_config:
        with open(args.live_config) as f:
            live = f.read()
    else:
        live = LIVE_CONFIG
    with open(live_path, "w") as f:
        f.write(live)
    hp = HPARAMS + ("," + args.hparams if args.hparams else "")

    from cookietts_tpu import cli
    cmd = ["train", "--model", "tacotron2", "--filelist", train_fl,
           "--val_filelist", val_fl, "--iters", str(args.iters),
           "--run_dir", os.path.join(work, "run"),
           "--live_config", live_path, "--hparams", hp]
    if args.resume:
        cmd.append("--resume")
    cli.main(cmd)
    print(f"probe {args.name} done: {work}/run")


if __name__ == "__main__":
    main()
