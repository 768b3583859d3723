"""Headline benchmark: WaveGlow batched inference RTF @48 kHz on one chip.

Baseline (BASELINE.md): the reference WaveGlow generates 5.19 s of 48 kHz
audio per wall-clock second at batch 1 (n_flows 48, n_group 24, n_layers 8,
n_channels 256, fp16, author's RTX-class GPU;
CookieTTS/scripts/WaveGlowFlow Inference Speed Testing.ipynb cell 6).

This benchmark runs the SAME architecture (48 flows / group 24 / 8 layers /
256 channels) in bf16, batch 1, ~5 s clips, and reports steady-state
RTF = generated_audio_seconds / wall_second: N independent clips are
generated back-to-back and every output is forced to materialize (a slice
of each waveform is copied to host — `block_until_ready` alone does not
reliably synchronize on the tunneled PJRT backend, and a full-waveform
host copy would bill the tunnel's transfer latency to the TPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp

BASELINE_RTF_48K = 5.1905        # BASELINE.md, WaveGlow @48 kHz batch 1


def main():
    from cookietts_tpu.models.waveglow import WaveGlow, WaveGlowConfig

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    cfg = WaveGlowConfig(
        n_mel_channels=160, n_flows=48, n_group=24,
        n_early_every=4, n_early_size=2,
        n_layers=8, n_channels=256, kernel_size=3,
        hop_length=600, upsample_strides=(5, 5),   # 25 * 24 = 600
        upsample_channels=256, memory_efficient=False,
        dtype=dtype,
    )
    model = WaveGlow(cfg)

    sr = 48000
    frames_per_sec = sr / cfg.hop_length            # 80
    t_mel = 400 if on_tpu else 20                   # 5 s on TPU; tiny on CPU
    audio_seconds = t_mel / frames_per_sec
    B = 1

    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((B, t_mel, cfg.n_mel_channels)), jnp.float32)
    tiny_audio = jnp.asarray(
        rng.standard_normal((B, t_mel * cfg.hop_length)), jnp.float32)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), tiny_audio, mel)

    infer = jax.jit(lambda v, m, k: model.apply(v, m, k,
                                                method=WaveGlow.infer))
    key = jax.random.PRNGKey(1)
    out = infer(variables, mel, key)               # compile + warmup
    _ = np.asarray(out[:, :256])                    # force real completion

    n_iters = 10 if on_tpu else 1
    # one fused check program: depends on every clip, single readback
    check = jax.jit(lambda os_: jnp.stack(
        [jnp.sum(o.astype(jnp.float32)) for o in os_]))
    _ = np.asarray(check([out] * n_iters))   # compile at the right arity
    t0 = time.perf_counter()
    outs = []
    for i in range(n_iters):
        outs.append(infer(variables, mel, jax.random.fold_in(key, i)))
    # force every clip to have fully materialized (1 dispatch + 1 RTT)
    sums = np.asarray(check(outs))
    elapsed = (time.perf_counter() - t0) / n_iters

    rtf = (B * audio_seconds) / elapsed
    assert np.isfinite(sums).all()
    print(json.dumps({
        "metric": "waveglow_rtf_48khz_batch1",
        "value": round(rtf, 4),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / BASELINE_RTF_48K, 4),
    }))


if __name__ == "__main__":
    main()
