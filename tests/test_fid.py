"""Proxy-FID sanity tests."""

import numpy as np
import pytest

from domain_transfer_gan_tpu.eval import compute_fid, frechet_distance


def test_frechet_distance_zero_for_identical():
    mu = np.zeros(4)
    s = np.eye(4)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-8


def test_frechet_distance_mean_shift():
    mu1, mu2 = np.zeros(3), np.ones(3)
    s = np.eye(3)
    assert np.isclose(frechet_distance(mu1, s, mu2, s), 3.0, atol=1e-6)


def test_compute_fid_orders_distributions():
    # n samples must exceed the feature dim for a well-conditioned cov
    from domain_transfer_gan_tpu.eval import random_feature_extractor
    ext = random_feature_extractor(width=8)  # 32-dim features
    rng = np.random.RandomState(0)
    real = rng.uniform(-1, 1, (200, 16, 16, 3)).astype(np.float32)
    close = real + 0.05 * rng.randn(*real.shape).astype(np.float32)
    far = rng.randn(200, 16, 16, 3).astype(np.float32)
    fid_same = compute_fid(real, real[::-1].copy(), ext)
    fid_close = compute_fid(real, close, ext)
    fid_far = compute_fid(real, far, ext)
    assert abs(fid_same) < fid_close < fid_far


def test_extractor_save_load_roundtrip(tmp_path):
    """--fid_extractor escape hatch: a feature extractor serialized with
    save_extractor (jax.export / StableHLO, weights baked in) reloads as a
    callable producing IDENTICAL features — including on a batch that is
    not a multiple of the traced batch (pad+trim path)."""
    import jax
    import jax.numpy as jnp
    from domain_transfer_gan_tpu.eval import random_feature_extractor
    from domain_transfer_gan_tpu.eval.fid import (_RandomFeatureNet,
                                                  load_extractor,
                                                  save_extractor)

    net = _RandomFeatureNet(width=4)
    variables = net.init(jax.random.PRNGKey(9),
                         jnp.zeros((1, 16, 16, 3), jnp.float32))
    fn = lambda x: net.apply(variables, x)
    path = str(tmp_path / "extractor.stablehlo")
    save_extractor(fn, (16, 16, 3), path, batch=8)

    ext = load_extractor(path)
    rng = np.random.RandomState(0)
    imgs = rng.uniform(-1, 1, (13, 16, 16, 3)).astype(np.float32)  # 13 % 8
    got = ext(imgs)
    want = np.asarray(fn(jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    with pytest.raises(ValueError):
        ext(rng.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32))

    # the serialized extractor plugs into compute_fid unchanged
    fid = compute_fid(imgs, imgs[::-1].copy(), ext)
    assert abs(fid) < 1e-4


def test_eval_fid_B_with_model():
    import jax.numpy as jnp
    from domain_transfer_gan_tpu.config import TrainConfig
    from domain_transfer_gan_tpu.data import AlignedIterator
    from domain_transfer_gan_tpu.eval import eval_fid_B, random_feature_extractor
    from domain_transfer_gan_tpu.models import create_model
    cfg = TrainConfig(model="stoch_cycle_gan", grid_size=64, ngf=4, nef=4,
                      ndf=4, nlatent=8, use_pallas=False, seed=0)
    cfg.expr_dir = ""
    m = create_model(cfg, testing=True)
    rng = np.random.RandomState(0)
    A = rng.uniform(-1, 1, (40, 64, 64, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (40, 64, 64, 3)).astype(np.float32)
    ds = AlignedIterator(A, B, batch_size=20)
    fid = eval_fid_B(ds, m, n_max=40, extractor=random_feature_extractor(width=4))
    assert np.isfinite(fid) and fid > 0
