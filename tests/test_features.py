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


# -- DIO port (data/dio.py — the reference's pyworld extractor) -------------

def test_dio_pure_tone_accuracy():
    """220 Hz tone: every frame voiced within 0.5% (pyworld-grade)."""
    from cookietts_tpu.data.dio import dio
    sr = 22050
    t = np.arange(sr) / sr
    f0, _ = dio(0.5 * np.sin(2 * np.pi * 220 * t), sr,
                frame_period_ms=512 / sr * 1000.0)
    voiced = f0[f0 > 0]
    assert len(voiced) >= 0.9 * len(f0)
    np.testing.assert_allclose(voiced, 220.0, rtol=5e-3)


def test_dio_tracks_vibrato():
    """200 Hz carrier with +-10 Hz 5 Hz vibrato: tracked within 3%."""
    from cookietts_tpu.data.dio import dio
    sr = 22050
    t = np.arange(sr) / sr
    phase = 2 * np.pi * (200 * t
                         - (10 / (2 * np.pi * 5)) * np.cos(2 * np.pi * 5 * t))
    f0, times = dio(0.5 * np.sin(phase), sr,
                    frame_period_ms=512 / sr * 1000.0)
    inst = 200 + 10 * np.sin(2 * np.pi * 5 * times)
    m = f0 > 0
    assert m.sum() >= 0.9 * len(f0)
    assert np.max(np.abs(f0[m] - inst[m]) / inst[m]) < 0.03


def test_dio_unvoiced_detection_and_octave_trap():
    """Silence stays unvoiced; a harmonic complex whose 2nd harmonic
    DOMINATES the fundamental still resolves to the true f0 (the
    interval-consensus scoring across bands)."""
    from cookietts_tpu.data.dio import dio
    sr = 22050
    t = np.arange(sr) / sr
    tone = 0.5 * np.sin(2 * np.pi * 220 * t[: sr // 3])
    x = np.concatenate([tone, np.zeros(sr // 3), tone])
    f0, _ = dio(x, sr, frame_period_ms=512 / sr * 1000.0)
    mid = len(f0) // 2
    assert (f0[mid - 2: mid + 2] == 0).all()          # silence unvoiced
    assert (f0[3: mid - 6] > 0).any()                 # tones voiced

    trap = (0.2 * np.sin(2 * np.pi * 150 * t)
            + 0.6 * np.sin(2 * np.pi * 300 * t)
            + 0.25 * np.sin(2 * np.pi * 450 * t))
    f0t, _ = dio(trap, sr, frame_period_ms=512 / sr * 1000.0)
    v = f0t[f0t > 0]
    assert len(v) > 0
    assert np.mean(np.abs(v - 150.0) < 7.5) > 0.95


def test_estimate_f0_dio_reference_postprocessing():
    """estimate_f0_dio applies the reference get_pitch contract
    (data_utils.py:826-836): clamp to [0, 800], voiced = f0 > 3, and
    unvoiced frames FILLED with the voiced mean."""
    from cookietts_tpu.data.audio_io import estimate_f0_dio
    sr = 22050
    t = np.arange(sr // 2) / sr
    x = np.concatenate([0.5 * np.sin(2 * np.pi * 220 * t),
                        np.zeros(sr // 4)]).astype(np.float32)
    f0, voiced = estimate_f0_dio(x, sr, hop_length=512)
    assert voiced.dtype == bool and voiced.any() and (~voiced).any()
    # unvoiced frames carry the voiced mean, not zero
    vm = f0[voiced].mean()
    np.testing.assert_allclose(f0[~voiced], vm, rtol=1e-6)
    assert f0.max() <= 800.0 and np.isfinite(f0).all()


def test_dataset_f0_method_dispatch(tmp_path):
    """DataConfig.f0_method selects the extractor; 'dio' is the default
    (the reference's) and produces the filled contour."""
    from cookietts_tpu.data import audio_io
    from cookietts_tpu.data.dataset import DataConfig, TTSDataset
    sr = 22050
    t = np.arange(sr // 2) / sr
    p = str(tmp_path / "a.wav")
    audio_io.save_wav(p, (0.4 * np.sin(2 * np.pi * 196 * t)
                          ).astype(np.float32), sr)
    entries = [{"path": p, "quote": "ah", "speaker_id": 0}]
    dcfg = DataConfig(sampling_rate=sr, filter_length=1024,
                      hop_length=256, win_length=1024, trim_enable=False)
    assert dcfg.f0_method == "dio"
    ds = TTSDataset(entries, dcfg, features=["text", "mel", "f0"])
    item = ds[0]
    v = item["f0"][item["voiced"]]
    assert len(v) and abs(v.mean() - 196.0) < 4.0
    dcfg2 = DataConfig(sampling_rate=sr, filter_length=1024,
                       hop_length=256, win_length=1024,
                       trim_enable=False, f0_method="autocorr")
    item2 = TTSDataset(entries, dcfg2, features=["text", "mel", "f0"])[0]
    v2 = item2["f0"][item2["voiced"]]
    assert len(v2) and abs(v2.mean() - 196.0) < 8.0
