import numpy as np
import jax.numpy as jnp
import pytest

from cookietts_tpu.audio import STFT, TacotronSTFT, mel_filterbank
from cookietts_tpu.audio.dsp import (
    measure_loudness_lufs,
    normalize_loudness,
    resample,
    trim_silence_multipass,
)

# Small configs keep single-core CPU test time sane; semantics are identical
# to the production 2048/512 config (covered by the TPU bench path).
FL, HOP = 256, 64


@pytest.fixture(scope="module")
def stft():
    return STFT(filter_length=FL, hop_length=HOP, win_length=FL)


def test_stft_forward_matches_numpy_rfft(stft, rng=None):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, 2048)) * 0.1).astype(np.float32)
    mag, phase = stft.transform(jnp.asarray(audio))

    from scipy.signal import get_window

    pad = FL // 2
    x = np.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    win = get_window("hann", FL, fftbins=True)
    n_frames = (x.shape[1] - FL) // HOP + 1
    ref = np.stack(
        [np.abs(np.fft.rfft(x[:, t * HOP : t * HOP + FL] * win, axis=1))
         for t in range(n_frames)],
        axis=1,
    )
    assert mag.shape == (2, n_frames, FL // 2 + 1)
    np.testing.assert_allclose(np.asarray(mag), ref, atol=2e-3)


def test_stft_roundtrip(stft):
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal((1, 2048)) * 0.5).astype(np.float32)
    rec = np.asarray(stft(jnp.asarray(audio)))
    assert rec.shape == audio.shape
    # interior (away from edge padding effects) reconstructs accurately
    np.testing.assert_allclose(rec[:, FL:-FL], audio[:, FL:-FL], atol=5e-3)


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every filter has support, band edges respected
    assert (fb.sum(axis=1) > 0).all()
    freqs = np.linspace(0, 11025, 513)
    assert fb[:, freqs > 8100].sum() == 0.0


def test_mel_spectrogram_range_and_silence():
    ts = TacotronSTFT(FL, HOP, FL, n_mel_channels=20, sampling_rate=22050,
                      mel_fmin=0.0, mel_fmax=8000.0)
    silence = jnp.zeros((1, 1024))
    mel = ts.mel_spectrogram(silence)
    # ln(1e-5) = -11.5129... — the reference's "silence_value"
    np.testing.assert_allclose(np.asarray(mel), np.log(1e-5), atol=1e-4)

    rng = np.random.default_rng(2)
    audio = jnp.asarray((rng.standard_normal((1, 1024)) * 0.3).astype(np.float32))
    mel = ts.mel_spectrogram(audio)
    assert np.asarray(mel).min() >= np.log(1e-5) - 1e-4


def test_griffin_lim_reduces_error():
    ts = TacotronSTFT(FL, HOP, FL, n_mel_channels=20, sampling_rate=22050)
    t = np.arange(4096) / 22050.0
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    mag, _ = ts.stft.transform(jnp.asarray(audio))
    rel = []
    for iters in (1, 8):
        rec = np.asarray(ts.griffin_lim(mag, n_iters=iters))
        mag2, _ = ts.stft.transform(jnp.asarray(rec))
        rel.append(
            np.linalg.norm(np.asarray(mag2) - np.asarray(mag))
            / np.linalg.norm(np.asarray(mag))
        )
    assert rel[1] < 0.25  # spectral convergence for a pure tone
    assert rel[1] < rel[0]  # iterating improves the estimate


def test_resample_preserves_tone():
    t = np.arange(22050) / 22050.0
    audio = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample(audio, 22050, 44100)
    assert abs(len(out) - 44100) <= 2
    # dominant bin still 440 Hz
    spec = np.abs(np.fft.rfft(out))
    peak_hz = np.argmax(spec) * 44100 / len(out)
    assert abs(peak_hz - 440) < 2


def test_trim_silence():
    sr = 22050
    sig = np.concatenate([
        np.zeros(sr // 2, dtype=np.float32),
        (0.5 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32),
        np.zeros(sr // 2, dtype=np.float32),
    ])
    out = trim_silence_multipass(sig, sr)
    assert len(out) < len(sig)
    assert len(out) >= sr * 0.9  # kept the tone
    assert np.abs(out).max() > 0.4


def test_bs1770_loudness_normalize():
    sr = 48000
    t = np.arange(sr * 2) / sr
    audio = (0.1 * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    lufs = measure_loudness_lufs(audio, sr)
    # BS.1770: a full-scale 997 Hz sine reads -3.01 LKFS, so a -20 dBFS one
    # reads -23.01 (the -0.691 offset cancels the K-weighting gain at 1 kHz).
    assert abs(lufs - (-23.01)) < 0.2
    out = normalize_loudness(audio, sr, target_lufs=-27.0)
    assert abs(measure_loudness_lufs(out, sr) - (-27.0)) < 0.5


def _ensure_librosa_stub():
    """Register a minimal librosa stand-in (not installed here) with the
    documented numpy semantics of the three helpers the reference audio
    stack uses — except filters.mel, which maps to OUR mel_filterbank
    (covered by test_mel_filterbank_properties)."""
    import sys
    import types

    if "librosa" in sys.modules:
        return
    lib = types.ModuleType("librosa")
    util = types.ModuleType("librosa.util")
    filters = types.ModuleType("librosa.filters")

    def pad_center(data, size, axis=-1):
        n = data.shape[axis]
        lpad = (size - n) // 2
        widths = [(0, 0)] * data.ndim
        widths[axis] = (lpad, size - n - lpad)
        return np.pad(data, widths)

    util.pad_center = pad_center
    util.tiny = lambda x: np.finfo(np.float32).tiny
    def _normalize(x, norm=None):
        if norm is not None:
            raise NotImplementedError(
                "librosa stub only supports norm=None")
        return x

    util.normalize = _normalize
    filters.mel = lambda sr, n_fft, n_mels, fmin, fmax: np.asarray(
        mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    lib.util, lib.filters = util, filters
    sys.modules["librosa"] = lib
    sys.modules["librosa.util"] = util
    sys.modules["librosa.filters"] = filters


def test_tacotron_mel_matches_reference_chain():
    """Full mel-frontend parity vs the LIVE reference TacotronSTFT
    (utils/audio/stft.py:44-207): same audio -> same log-mel to 1e-4.

    librosa is not installed in this env, so its three helpers are
    stubbed: pad_center/tiny with their documented numpy semantics, and
    librosa.filters.mel with OUR mel_filterbank — the basis itself is
    covered by test_mel_filterbank_properties, while everything the
    reference implements in-repo (conv-DFT forward basis, hann window
    zero-center padding, reflect pad of half filter_length, magnitude,
    bmm mel projection, ln-clamp 1e-5) is genuinely cross-checked
    against the torch implementation."""
    import sys

    import torch

    _ensure_librosa_stub()
    sys.path.insert(0, "/root/reference")
    try:
        from CookieTTS.utils.audio.stft import TacotronSTFT as RefSTFT
    finally:
        sys.path.pop(0)

    FL, HOP, NM = 512, 128, 20
    ref = RefSTFT(FL, HOP, FL, n_mel_channels=NM, sampling_rate=22050,
                  mel_fmin=0.0, mel_fmax=8000.0)
    rng = np.random.default_rng(3)
    t = np.arange(22050) / 22050.0
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    audio = np.clip(audio, -1.0, 1.0)
    batch = np.stack([audio, 0.3 * audio])

    with torch.no_grad():
        ref_mel = ref.mel_spectrogram(torch.from_numpy(batch)).numpy()

    ours = TacotronSTFT(FL, HOP, FL, n_mel_channels=NM, sampling_rate=22050,
                        mel_fmin=0.0, mel_fmax=8000.0)
    got = np.asarray(ours.mel_spectrogram(jnp.asarray(batch)))
    # ours returns [B, T, n_mel]; reference returns [B, n_mel, T]
    if got.shape[-1] == NM:
        got = np.swapaxes(got, 1, 2)
    assert got.shape == ref_mel.shape, (got.shape, ref_mel.shape)
    np.testing.assert_allclose(got, ref_mel, atol=1e-4, rtol=1e-4)


def test_inverse_stft_matches_reference():
    """Inverse STFT (conv-transpose OLA + window-sumsquare correction +
    half-filter trim, reference stft.py:117-146) vs ours: same
    (magnitude, phase) -> same signal. This is the deterministic core of
    Griffin-Lim (audio_processing.py:59-75); given equal phase angles the
    iteration is then the composition of the two transforms tested
    here and in test_tacotron_mel_matches_reference_chain."""
    import sys

    import torch

    _ensure_librosa_stub()
    sys.path.insert(0, "/root/reference")
    try:
        from CookieTTS.utils.audio.stft import STFT as RefSTFT
    finally:
        sys.path.pop(0)

    FL, HOP = 512, 128
    ref = RefSTFT(FL, HOP, FL)
    rng = np.random.default_rng(5)
    audio = (0.4 * np.sin(2 * np.pi * 330 * np.arange(8192) / 22050)
             + 0.02 * rng.standard_normal(8192)).astype(np.float32)
    batch = np.stack([audio, audio * 0.5])

    with torch.no_grad():
        mag_t, phase_t = ref.transform(torch.from_numpy(batch))
        rec_ref = ref.inverse(mag_t, phase_t).numpy()[:, 0]

    ours = STFT(FL, HOP, FL)
    mag, phase = ours.transform(jnp.asarray(batch))
    rec = np.asarray(ours.inverse(mag, phase))
    n = min(rec.shape[-1], rec_ref.shape[-1])
    np.testing.assert_allclose(rec[:, :n], rec_ref[:, :n],
                               atol=2e-4, rtol=1e-3)


def test_iso226_contour_matches_standard_fixed_points():
    """The equal-loudness contour equals ISO 226:2003 at its anchor
    points — the same numbers the reference gets from the pip `iso226`
    package it installs at import time (utils/audio/iso226.py:3-31,
    iso226_spl_itpl(L_N=60)). By the DEFINITION of the phon, the contour
    at 1 kHz equals the loudness level itself (the standard's formula
    carries a ~0.01 dB residual); 109.51 dB SPL at 20 Hz / 60 phon and
    64.4 dB at 100 Hz / 40 phon are the published table values."""
    import numpy as np
    from cookietts_tpu.audio.iso226 import iso226_spl

    for ln in (20.0, 40.0, 60.0, 80.0):
        freqs, spl = iso226_spl(ln)
        i1k = int(np.where(freqs == 1000)[0][0])
        assert abs(spl[i1k] - ln) < 0.05, (ln, spl[i1k])
        # lower frequencies always need more SPL for equal loudness
        assert spl[0] > spl[i1k] + 25
    _, spl60 = iso226_spl(60.0)
    assert abs(spl60[0] - 109.51) < 0.05          # 20 Hz, 60 phon
    _, spl40 = iso226_spl(40.0)
    freqs, _ = iso226_spl(40.0)
    i100 = int(np.where(freqs == 100)[0][0])
    assert abs(spl40[i100] - 64.4) < 0.1          # 100 Hz, 40 phon
