"""Measure the decode-RTF effect of n_frames_per_step on the real chip.

The reference exposes n_frames_per_step in hparams (hparams.py:160+) to
amortize per-step weight reads where decode dominates (batch 1-32). This
sweeps r in {1, 2, 4} at B in {1, 32} on the full tacotron2_tm dims
(bf16, 512 decoded frames, full fixed-length decode — the bench.py
serving protocol without the vocoder) and prints one JSON line per
point. Results are recorded in docs/PERF.md.
"""
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cookietts_tpu.models.tacotron2 import Tacotron2, Tacotron2Config
from cookietts_tpu.text import N_SYMBOLS

SR, HOP = 44100, 512
T_TXT, T_DEC = 128, 512


def measure(B, r, n_iters, dtype):
    cfg = Tacotron2Config(n_symbols=N_SYMBOLS, dtype=dtype,
                          n_frames_per_step=r, max_decoder_steps=T_DEC)
    model = Tacotron2(cfg)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, cfg.n_symbols, (B, T_TXT)), jnp.int32)
    text_lengths = jnp.full((B,), T_TXT, jnp.int32)
    speaker_id = jnp.asarray(rng.integers(0, cfg.n_speakers, (B,)), jnp.int32)
    mels_init = jnp.asarray(
        rng.standard_normal((B, 4 * r, cfg.n_mel_channels)), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text=text, text_lengths=text_lengths, mels=mels_init,
        mel_lengths=jnp.full((B,), 4 * r, jnp.int32), speaker_id=speaker_id,
        sylps=jnp.full((B,), 4.0), key=jax.random.PRNGKey(2),
        deterministic=False)
    infer = jax.jit(lambda v, k: model.apply(
        v, text, text_lengths, speaker_id, key=k,
        max_decoder_steps=T_DEC,
        method=Tacotron2.inference)["mel_outputs_postnet"])
    check = jax.jit(lambda os_: jnp.stack(
        [jnp.sum(o.astype(jnp.float32)) for o in os_]))
    key = jax.random.PRNGKey(3)
    out = infer(variables, jax.random.fold_in(key, 0))
    _ = np.asarray(check([out]))
    best = float("inf")
    for rd in range(2):
        base = 1 + rd * n_iters
        t0 = time.perf_counter()
        outs = [infer(variables, jax.random.fold_in(key, base + i))
                for i in range(n_iters)]
        _ = np.asarray(check(outs))
        best = min(best, (time.perf_counter() - t0) / n_iters)
    rtf = (B * T_DEC * HOP / SR) / best
    print(json.dumps({"B": B, "r": r, "decode_ms": round(best * 1e3, 2),
                      "decode_rtf": round(rtf, 2)}), flush=True)


def main():
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    n = 8 if on_tpu else 1
    for B in (1, 32):
        for r in (1, 2, 4):
            try:
                measure(B, r, n, dtype)
            except Exception as e:
                print(f"[nfps] B={B} r={r} failed: {e!r}", flush=True)


if __name__ == "__main__":
    main()
