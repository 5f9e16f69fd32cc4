"""z-diversity (many-to-many) metric tests.

The metric must separate a healthy Augmented CycleGAN generator (diverse
outputs over z per input) from a mode-collapsed one that ignores z — the
failure mode no reference metric detects (MSE_A uses G_B->A; FID is
marginal over z)."""

import numpy as np
import pytest

from domain_transfer_gan_tpu.eval import random_feature_extractor, \
    z_diversity_stats
from domain_transfer_gan_tpu.eval.diversity import eval_z_diversity

EXT = random_feature_extractor(width=4)  # small features, fast


def _multi(images_fn, n, k, size=16, seed=0):
    """Input-major (n*k, H, W, 3) stack: input i's k decodes contiguous."""
    rng = np.random.RandomState(seed)
    base = rng.uniform(-1, 1, (n, size, size, 3)).astype(np.float32)
    out = []
    for i in range(n):
        for j in range(k):
            out.append(images_fn(base[i], j, rng))
    return np.stack(out)


def test_z_ignoring_generator_scores_zero():
    """Negative control: identical decodes for every z -> intra_z == 0."""
    multi = _multi(lambda img, j, rng: img, n=6, k=5)
    stats = z_diversity_stats(multi, num_z=5, extractor=EXT)
    assert stats["intra_z"] < 1e-5
    assert stats["ratio"] < 1e-4
    assert stats["inter_input"] > 0.1  # inputs themselves do differ


def test_diverse_generator_scores_high():
    """Decodes that vary strongly with z score a ratio well above 0."""
    def fn(img, j, rng):
        return np.clip(img + rng.uniform(-1, 1, img.shape)
                       .astype(np.float32), -1, 1)
    multi = _multi(fn, n=6, k=5, seed=3)
    stats = z_diversity_stats(multi, num_z=5, extractor=EXT)
    assert stats["intra_z"] > 0.1
    assert stats["ratio"] > 0.3


def test_metric_orders_diversity_levels():
    def noisy(scale):
        return lambda img, j, rng: np.clip(
            img + scale * rng.randn(*img.shape).astype(np.float32), -1, 1)
    lo = z_diversity_stats(_multi(noisy(0.05), 6, 5, seed=1), 5, EXT)
    hi = z_diversity_stats(_multi(noisy(0.5), 6, 5, seed=1), 5, EXT)
    assert lo["intra_z"] < hi["intra_z"]


def test_rejects_bad_layout():
    imgs = np.zeros((10, 8, 8, 3), np.float32)
    with pytest.raises(ValueError):
        z_diversity_stats(imgs, num_z=3, extractor=EXT)  # 10 % 3 != 0
    with pytest.raises(ValueError):
        z_diversity_stats(imgs, num_z=1, extractor=EXT)  # needs >= 2 draws


def test_eval_z_diversity_with_model():
    """End-to-end through a real model's generate_multi: finite stats, and
    the same generator evaluated with z forced constant collapses to ~0."""
    import jax.numpy as jnp
    from domain_transfer_gan_tpu.config import TrainConfig
    from domain_transfer_gan_tpu.models import create_model

    cfg = TrainConfig(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4,
                      ndf=4, nlatent=8, use_pallas=False, seed=0)
    cfg.expr_dir = ""
    m = create_model(cfg, testing=True)
    rng = np.random.RandomState(0)
    A = rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32)

    stats = eval_z_diversity(m, A, num_z=4, extractor=EXT)
    assert np.isfinite(stats["intra_z"]) and stats["intra_z"] >= 0

    # collapsed control through the SAME path: constant z per draw
    class Collapsed:
        def sample_prior_z(self, n):
            return jnp.zeros((n, cfg.nlatent), jnp.float32)

        def generate_multi(self, real_A, multi_z):
            return m.generate_multi(real_A, multi_z)

    c = eval_z_diversity(Collapsed(), A, num_z=4, extractor=EXT)
    assert c["intra_z"] < 1e-5
    assert c["intra_z"] <= stats["intra_z"] + 1e-6
