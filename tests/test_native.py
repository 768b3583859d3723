"""Native C++ audio kernel parity tests (builds the lib if needed)."""
import numpy as np
import pytest
from scipy import signal as scipy_signal

from cookietts_tpu.data import audio_io, native


@pytest.fixture(scope="module", autouse=True)
def built():
    try:
        native.load(build_if_missing=True)
    except Exception as e:
        pytest.skip(f"native build unavailable: {e!r}")
    assert native.available()


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    t = np.arange(48000) / 48000
    return (0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def test_resample_parity(audio):
    y_n = native.resample(audio, 48000, 22050)
    g = np.gcd(48000, 22050)
    y_s = scipy_signal.resample_poly(audio, 22050 // g, 48000 // g)
    n = min(len(y_n), len(y_s))
    assert abs(len(y_n) - len(y_s)) <= 1
    np.testing.assert_allclose(y_n[100:n - 100], y_s[100:n - 100],
                               atol=5e-4)


def test_filtfilt_parity(audio):
    sos = scipy_signal.butter(2, 150, btype="highpass", fs=48000,
                              output="sos")
    f_n = native.sos_filtfilt(audio, sos)
    f_s = scipy_signal.sosfiltfilt(sos, audio)
    np.testing.assert_allclose(f_n[1000:-1000], f_s[1000:-1000], atol=1e-5)


def test_loudness_parity(audio):
    import os
    os.environ["COOKIETTS_DISABLE_NATIVE"] = "1"
    try:
        l_py = audio_io.bs1770_loudness(audio, 48000)
    finally:
        del os.environ["COOKIETTS_DISABLE_NATIVE"]
    l_n = native.bs1770_loudness(audio, 48000)
    assert abs(l_n - l_py) < 1e-6


def test_trim_bounds(audio):
    padded = np.concatenate([np.zeros(8000, np.float32), audio,
                             np.zeros(8000, np.float32)])
    s, e = native.trim_bounds(padded, 2048, 512, 45.0)
    assert s <= 8000 and s > 8000 - 2048 - 512
    assert e >= len(padded) - 8000 - 512


def test_audio_io_uses_native(audio):
    """audio_io.resample must route through the native kernel when built
    (result differs slightly from scipy but matches native exactly)."""
    via_io = audio_io.resample(audio, 48000, 16000)
    via_native = native.resample(audio, 48000, 16000)
    n = min(len(via_io), len(via_native))
    np.testing.assert_array_equal(via_io[:n], via_native[:n])
