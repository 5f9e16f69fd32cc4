"""Resize-parity tests (VERDICT r1 item 9).

The reference resizes with skimage.transform.resize (anti-aliased Gaussian
pre-filter + linear interpolation, reference dataloader.py:26-31).  skimage
is not installed here, so data/resize.py rebuilds that pipeline from its
primitives; these tests pin it against an independent hand-rolled numpy
oracle and bound its divergence from the plain-bilinear path.
"""

import numpy as np
import pytest

from domain_transfer_gan_tpu.data.resize import (
    _antialias_sigma,
    gaussian_blur_batch,
    resize_batch,
)


def _oracle_gaussian_1d(x: np.ndarray, sigma: float) -> np.ndarray:
    """scipy.ndimage-convention Gaussian: truncate=4.0, mirror boundary."""
    if sigma <= 0:
        return x
    radius = int(4.0 * sigma + 0.5)
    t = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (t / sigma) ** 2)
    k /= k.sum()
    # mirror padding: [d c b | a b c d ... w x y z | y x w]
    pad = np.concatenate([x[1:radius + 1][::-1], x, x[-radius - 1:-1][::-1]])
    return np.convolve(pad, k, mode="valid")


def _oracle_linear_1d(x: np.ndarray, out_size: int) -> np.ndarray:
    """Half-pixel-center linear resample (align_corners=False), edge clamp."""
    n = x.shape[0]
    scale = n / out_size
    coords = (np.arange(out_size) + 0.5) * scale - 0.5
    lo = np.clip(np.floor(coords).astype(int), 0, n - 1)
    hi = np.clip(lo + 1, 0, n - 1)
    frac = np.clip(coords - lo, 0.0, 1.0)
    return x[lo] * (1 - frac) + x[hi] * frac


def test_same_size_is_noop():
    x = np.random.RandomState(0).randn(2, 8, 8, 3).astype(np.float32)
    assert np.array_equal(resize_batch(x, 8), x)


def test_antialias_sigma_matches_skimage_formula():
    assert _antialias_sigma(128, 64) == pytest.approx(0.5)
    assert _antialias_sigma(64, 128) == 0.0  # upscale: no pre-filter
    assert _antialias_sigma(256, 64) == pytest.approx(1.5)


def test_gaussian_blur_matches_oracle_rows():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 1, 32, 1).astype(np.float32)
    out = gaussian_blur_batch(x, 0.0, 1.25)
    expect = _oracle_gaussian_1d(x[0, 0, :, 0].astype(np.float64), 1.25)
    np.testing.assert_allclose(out[0, 0, :, 0], expect, rtol=1e-5, atol=1e-6)


def test_downscale_antialias_matches_oracle_1d():
    """Full pipeline (Gaussian sigma=(f-1)/2 then plain linear) against the
    hand-rolled numpy oracle on a 1-D row signal, downscale 2x."""
    rng = np.random.RandomState(2)
    row = rng.uniform(-1, 1, 64).astype(np.float32)
    # check the W axis via a square where every row is the same signal
    sq = np.tile(row, (64, 1)).reshape(1, 64, 64, 1).astype(np.float32)
    out = resize_batch(sq, 32, antialias=True)
    blurred = _oracle_gaussian_1d(row.astype(np.float64),
                                  _antialias_sigma(64, 32))
    expect = _oracle_linear_1d(blurred, 32)
    np.testing.assert_allclose(out[0, 16, :, 0], expect, rtol=2e-4, atol=2e-5)


def test_upscale_is_plain_bilinear_both_modes():
    """Upscaling applies no pre-filter: both modes give plain bilinear
    (jax's triangle filter is also inactive when scale >= 1)."""
    rng = np.random.RandomState(3)
    x = rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
    a = resize_batch(x, 32, antialias=True)
    b = resize_batch(x, 32, antialias=False)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    assert a.shape == (1, 32, 32, 3)


def test_divergence_bound_vs_plain_bilinear():
    """Documented bound: on [-1,1] images downscaled 2x, the Gaussian
    anti-aliased pipeline differs from the round-1 jax path by a small,
    bounded amount on smooth data and stays bounded even on white noise."""
    rng = np.random.RandomState(4)
    # smooth, band-limited image
    yy, xx = np.mgrid[0:128, 0:128] / 128.0
    smooth = np.sin(2 * np.pi * 3 * xx) * np.cos(2 * np.pi * 2 * yy)
    smooth = smooth[None, :, :, None].astype(np.float32)
    d_smooth = np.abs(resize_batch(smooth, 64, True)
                      - resize_batch(smooth, 64, False)).max()
    assert d_smooth < 0.05, d_smooth
    # adversarial white noise
    noise = rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
    d_noise = np.abs(resize_batch(noise, 64, True)
                     - resize_batch(noise, 64, False)).max()
    assert d_noise < 0.8, d_noise
