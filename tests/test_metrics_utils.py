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
