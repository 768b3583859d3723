"""On-device feature frontend vs the host-side reference implementations."""
import jax.numpy as jnp
import numpy as np

from cookietts_tpu.audio.dsp import measure_loudness_lufs
from cookietts_tpu.audio.features import (estimate_f0, fused_frontend,
                                          measure_loudness)
from cookietts_tpu.audio.stft import TacotronSTFT
from cookietts_tpu.data.audio_io import estimate_f0_autocorr

SR = 22050


def _tone(freq, seconds=0.7, amp=0.4, seed=0):
    t = np.arange(int(SR * seconds)) / SR
    rng = np.random.default_rng(seed)
    return (amp * np.sin(2 * np.pi * freq * t)
            + 0.002 * rng.standard_normal(t.shape)).astype(np.float32)


def test_f0_matches_host_reference():
    audio = np.stack([_tone(220.0), _tone(330.0, seed=1)])
    f0_dev, voiced_dev = estimate_f0(jnp.asarray(audio), SR,
                                     hop_length=256, frame_length=1024)
    for b in range(2):
        f0_host, voiced_host = estimate_f0_autocorr(
            audio[b], SR, hop_length=256, frame_length=1024)
        np.testing.assert_allclose(np.asarray(f0_dev[b]), f0_host,
                                   atol=1e-3, rtol=1e-4)
        assert np.array_equal(np.asarray(voiced_dev[b]), voiced_host)


def test_f0_finds_the_pitch():
    audio = jnp.asarray(_tone(220.0)[None, :])
    f0, voiced = estimate_f0(audio, SR, hop_length=256, frame_length=1024)
    mid = np.asarray(f0[0])[5:-5]
    assert np.all(np.asarray(voiced[0])[5:-5])
    np.testing.assert_allclose(mid, 220.0, rtol=0.03)


def test_loudness_matches_bs1770_host():
    rng = np.random.default_rng(3)
    quiet = (0.02 * rng.standard_normal(SR)).astype(np.float32)
    loud = (0.3 * rng.standard_normal(SR)).astype(np.float32)
    batch = np.stack([quiet, loud])
    dev = np.asarray(measure_loudness(jnp.asarray(batch), sr=SR))
    for b in range(2):
        host = measure_loudness_lufs(batch[b], SR)
        assert abs(dev[b] - host) < 0.1, (b, dev[b], host)
    assert dev[1] > dev[0] + 20.0   # ~23 dB apart


def test_loudness_length_masking():
    rng = np.random.default_rng(4)
    audio = (0.2 * rng.standard_normal(SR)).astype(np.float32)
    padded = np.concatenate([audio, np.zeros(SR, np.float32)])
    batch = jnp.asarray(np.stack([padded, padded]))
    lengths = jnp.asarray([SR, 2 * SR])
    dev = np.asarray(measure_loudness(batch, lengths, sr=SR))
    host = measure_loudness_lufs(audio, SR)
    # masked row ignores the padded silence -> matches the short file
    assert abs(dev[0] - host) < 0.15
    # unmasked row averages in the (gated) silence -> stays close too, but
    # the masked row must not be biased by padding
    assert dev[0] >= dev[1] - 0.2


def test_fused_frontend_shapes_and_normalization():
    stft = TacotronSTFT(filter_length=1024, hop_length=256, win_length=1024,
                        n_mel_channels=20, sampling_rate=SR, mel_fmax=8000.0)
    fn = fused_frontend(stft, sr=SR, target_lufs=-27.0)
    audio = np.stack([_tone(220.0, amp=0.05), _tone(440.0, amp=0.6, seed=2)])
    out = fn(jnp.asarray(audio))
    n = out["mel"].shape[1]
    assert out["f0"].shape == (2, n)
    assert out["energy"].shape == (2, n)
    assert out["mel"].shape == (2, n, 20)
    # both rows normalized to ~the target loudness
    post = np.asarray(measure_loudness(out["audio"], sr=SR))
    np.testing.assert_allclose(post, -27.0, atol=1.0)
    # energy parity with the dataset definition (exp-mel channel mean)
    np.testing.assert_allclose(
        np.asarray(out["energy"]),
        np.exp(np.asarray(out["mel"])).mean(-1), rtol=1e-5, atol=1e-6)
