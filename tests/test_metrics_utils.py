"""MCD/f0 metrics + shared utils tests (host-side, no jax)."""
import numpy as np

from cookietts_tpu.ops.mcd import (
    cepstrum_from_mel, f0_metrics, mcd, mcd_dtw)
from cookietts_tpu.utils import force, get_args


def test_mcd_zero_for_identical():
    a = np.random.default_rng(0).standard_normal((50, 20))
    assert mcd(a, a) == 0.0


def test_mcd_monotone_in_noise():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((60, 20))
    small = mcd(a, a + 0.05 * rng.standard_normal(a.shape))
    big = mcd(a, a + 0.5 * rng.standard_normal(a.shape))
    assert 0 < small < big


def test_mcd_dtw_handles_time_shift():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((60, 20))
    shifted = np.roll(a, 3, axis=0)
    # frame-wise MCD is hurt by the shift; DTW recovers most of it
    assert mcd_dtw(a[3:57], shifted[3:57]) < mcd(a[3:57], shifted[3:57])


def test_cepstrum_shape():
    c = cepstrum_from_mel(np.zeros((10, 40)), n_mfcc=13)
    assert c.shape == (10, 13)


def test_f0_metrics():
    rng = np.random.default_rng(3)
    f0 = np.abs(rng.standard_normal(40)) * 120 + 80
    f0[:8] = 0.0
    rmse, vde, corr = f0_metrics(f0, f0)
    assert rmse == 0.0 and vde == 0.0 and corr > 0.999
    noisy = f0 + (f0 > 0) * 10.0
    rmse2, _, _ = f0_metrics(f0, noisy)
    assert abs(rmse2 - 10.0) < 1e-6


def test_get_args_and_force():
    def fn(a, b, c=3):
        return a + b + c
    assert get_args(fn) == ["a", "b", "c"]
    assert force(fn, 1, b=2, c=4, ignored=99) == 7


def test_dtw_align_matches_reference():
    """dtw_align vs the LIVE reference DTW (utils/dataset/utils.py:70-108,
    the duplicated mel2samp/data_utils copies are byte-similar): identical
    warped predictions for random mels across scale/range settings.
    soundfile/librosa are stubbed (module-level imports the DTW function
    itself never touches)."""
    import sys
    import types

    import jax.numpy as jnp
    import torch

    from tests.test_audio import _ensure_librosa_stub
    _ensure_librosa_stub()
    if "soundfile" not in sys.modules:
        sys.modules["soundfile"] = types.ModuleType("soundfile")
    # file-direct import: the CookieTTS.utils.dataset package __init__
    # pulls in pyworld/pyloudnorm, which utils.py itself never needs
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_dataset_utils", "/root/reference/CookieTTS/utils/dataset/utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref_dtw = mod.DTW

    from cookietts_tpu.ops.dtw import dtw_align

    rng = np.random.default_rng(0)
    B, T, C = 3, 24, 8
    pred = rng.standard_normal((B, T, C)).astype(np.float32)
    target = (pred + 0.3 * rng.standard_normal((B, T, C))).astype(np.float32)

    for scale, rng_ in ((5, 3), (2, 5), (1, 3)):
        with torch.no_grad():
            ref = ref_dtw(torch.from_numpy(np.transpose(pred, (0, 2, 1))),
                          torch.from_numpy(np.transpose(target, (0, 2, 1))),
                          scale, rng_).numpy()
        got = np.asarray(dtw_align(jnp.asarray(pred), jnp.asarray(target),
                                   scale_factor=scale, range_=rng_))
        got = np.transpose(got, (0, 2, 1))
        # float near-ties can flip which of two almost-identical
        # candidates wins the argmin; values stay equal to ~1e-5
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4,
                                   err_msg=f"scale={scale} range={rng_}")
        # the semantic contract: both warps achieve the same optimal L1
        tgt = np.transpose(target, (0, 2, 1))
        np.testing.assert_allclose(
            np.abs(got - tgt).sum(1), np.abs(ref - tgt).sum(1),
            atol=1e-5, rtol=1e-5)
