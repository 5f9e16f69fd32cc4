"""Extractor-free distribution distances (eval/moments.py).

These corroborate the random-feature proxy-FID in the quality-parity
harness (VERDICT r3 weak #3): they must be zero on identical sets, small
across independent samples of the same distribution, and large across
distributions differing in tone (moments) or texture/sharpness (spectrum).
"""

import numpy as np
import pytest

from domain_transfer_gan_tpu.eval.moments import (
    channel_moment_distance,
    distribution_distances,
    radial_spectrum_distance,
)


def _structured(n, seed, size=32):
    from domain_transfer_gan_tpu.data.synthetic import make_synthetic_pair
    _, B = make_synthetic_pair(n, size=size, seed=seed)
    return B


def test_zero_on_identical_sets():
    x = _structured(24, seed=0)
    assert channel_moment_distance(x, x) == 0.0
    assert radial_spectrum_distance(x, x) == 0.0


def test_small_within_distribution_large_across():
    # two independent draws of the same synthetic distribution vs a
    # distribution with different tone (shifted/scaled) and texture (white
    # noise): the cross distances must dominate the within distances
    a = _structured(32, seed=1)
    b = _structured(32, seed=2)
    rng = np.random.RandomState(3)
    noise = rng.uniform(-1, 1, a.shape).astype(np.float32)
    shifted = np.clip(a * 0.5 + 0.4, -1, 1)

    cmd_within = channel_moment_distance(a, b)
    rsd_within = radial_spectrum_distance(a, b)
    assert channel_moment_distance(a, shifted) > 3 * cmd_within
    assert radial_spectrum_distance(a, noise) > 3 * rsd_within


def test_spectrum_detects_blur():
    # blur kills high frequencies: a classic GAN failure FID proxies can
    # underweight; the radial spectrum must see it clearly
    a = _structured(24, seed=4)
    blurred = (a + np.roll(a, 1, 1) + np.roll(a, -1, 1)
               + np.roll(a, 1, 2) + np.roll(a, -1, 2)) / 5.0
    blurred = (blurred + np.roll(blurred, 1, 1) + np.roll(blurred, -1, 1)
               + np.roll(blurred, 1, 2) + np.roll(blurred, -1, 2)) / 5.0
    b = _structured(24, seed=5)
    assert radial_spectrum_distance(a, blurred) > \
        2 * radial_spectrum_distance(a, b)


def test_moments_detect_mean_shift_spectrum_mostly_blind_to_it():
    # a pure DC shift moves channel means but only the DC spectral bin —
    # the two metrics are complementary, not redundant
    a = _structured(24, seed=6)
    shifted = a + 0.3
    assert channel_moment_distance(a, shifted) >= 0.3 / 4 - 1e-6
    # spectrum: only 1 of ~16 bins moves
    assert radial_spectrum_distance(a, shifted) < \
        channel_moment_distance(a, shifted)


def test_shape_validation():
    a = _structured(4, seed=0, size=32)
    b = _structured(4, seed=0, size=16)
    with pytest.raises(ValueError, match="matched resolution"):
        channel_moment_distance(a, b)
    with pytest.raises(ValueError, match="image sets"):
        radial_spectrum_distance(a[0], a[0])


def test_distribution_distances_dict():
    a = _structured(8, seed=7)
    d = distribution_distances(a, a)
    assert d == {"cmd": 0.0, "rsd": 0.0}


def test_batch_size_invariance_of_summary():
    # distances compare SET summaries; doubling one set by concatenating
    # two same-distribution draws should barely move the result
    a = _structured(32, seed=8)
    b = _structured(32, seed=9)
    b2 = np.concatenate([b, _structured(32, seed=10)])
    d1 = radial_spectrum_distance(a, b)
    d2 = radial_spectrum_distance(a, b2)
    assert abs(d1 - d2) < 0.5 * max(d1, d2) + 0.05
