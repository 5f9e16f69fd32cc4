"""Eval subsystem tests: MSE, variational UBO (scan), logvar fitting,
MVGauss baseline, noise sensitivity, grid writer."""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from domain_transfer_gan_tpu.config import TrainConfig
from domain_transfer_gan_tpu.data import AlignedIterator
from domain_transfer_gan_tpu.eval import (
    compute_bpp_mvgauss_B,
    eval_mse_A,
    eval_ubo_B,
    nats2bpp,
    sensitivity_to_edge_noise,
    train_logvar,
    variational_ubo,
)
from domain_transfer_gan_tpu.eval.visualize import (
    interleave_columns,
    one_to_three_channels,
    save_image_grid,
)
from domain_transfer_gan_tpu.models import create_model


def tiny_model(**kw):
    base = dict(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4, ndf=4,
                nlatent=8, use_pallas=False, monitor_gnorm=True, seed=5)
    base.update(kw)
    cfg = TrainConfig(**base)
    cfg.expr_dir = ""
    return create_model(cfg, testing=True)


def small_batch(n=4, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.uniform(-1, 1, (n, 64, 64, 3)).astype(np.float32),
            rng.uniform(-1, 1, (n, 64, 64, 3)).astype(np.float32))


def test_eval_mse_A_matches_manual():
    m = tiny_model()
    A, B = small_batch()
    ds = AlignedIterator(A, B, batch_size=2)
    got = eval_mse_A(ds, m)
    pred = np.asarray(m.predict_A(jnp.asarray(B)))
    want = np.mean([np.mean((pred[i:i + 2] - A[i:i + 2]) ** 2)
                    for i in (0, 2)])
    assert np.isclose(got, want, rtol=1e-4)


def test_variational_ubo_decreases():
    m = tiny_model()
    A, B = small_batch()
    ubo1, kld1, bpp1 = variational_ubo(m, A, B, steps=1)
    ubo50, kld50, bpp50 = variational_ubo(m, A, B, steps=60)
    assert np.isfinite(ubo1) and np.isfinite(ubo50)
    assert ubo50 < ubo1  # the inner RMSprop should tighten the bound
    assert np.isclose(bpp50, ubo50 / (64 * 64 * 3 * math.log(2)), rtol=1e-6)


def test_eval_ubo_B_averages(tmp_path):
    m = tiny_model()
    A, B = small_batch()
    ds = AlignedIterator(A, B, batch_size=2)
    ubo, bpp, kld = eval_ubo_B(ds, m, steps=2, visualize=True,
                               vis_name="t", vis_path=str(tmp_path))
    assert np.isfinite(ubo) and np.isfinite(bpp) and np.isfinite(kld)
    assert os.path.exists(tmp_path / "t_0.png")


def test_eval_ubo_B_tail_batch_single_compile():
    """A dataset whose final batch is short must reuse ONE compiled chunk
    (zero-weight padding), and padding must not change the numbers."""
    m = tiny_model()
    A, B = small_batch(n=5, seed=3)
    ds = AlignedIterator(A, B, batch_size=2)  # batches: 2, 2, 1 (padded)
    ubo, bpp, kld = eval_ubo_B(ds, m, steps=3)
    assert np.isfinite(ubo) and np.isfinite(bpp)
    chunk = m._jit_cache[("ubo_chunk", True)]
    assert chunk._cache_size() == 1, "tail batch must not recompile"


def test_variational_ubo_padding_exact_with_fixed_rng():
    """With identical rng streams, the zero-weight-padded UBO equals the
    unpadded one to float tolerance (per-sample dynamics preserved)."""
    m = tiny_model(seed=11)
    A, B = small_batch(n=3, seed=7)
    key = jax.random.PRNGKey(123)
    m._rng = key
    ubo_raw, kld_raw, bpp_raw = variational_ubo(m, A, B, steps=4)
    m._rng = key  # rewind the stream so dequant/eps draws match...
    # note: padding changes the *shape* of the dequant/eps draws, so exact
    # equality needs the padded draws to agree on the real rows; jax
    # random.uniform over a larger shape changes all values.  Instead pad
    # with pad_to == n (a no-op) and check exactness of the mask path.
    ubo_pad, kld_pad, bpp_pad = variational_ubo(m, A, B, steps=4, pad_to=3)
    assert np.isclose(ubo_raw, ubo_pad, rtol=1e-6)
    assert np.isclose(kld_raw, kld_pad, rtol=1e-5, atol=1e-6)


def test_train_logvar_runs():
    m = tiny_model()
    A, B = small_batch()
    ds = AlignedIterator(A, B, batch_size=2)
    lv = train_logvar(ds, m, epochs=1)
    assert lv.shape == (1, 64, 64, 3)
    assert np.all(np.isfinite(np.asarray(lv)))
    # params moved away from the log(0.01) init
    assert not np.allclose(np.asarray(lv), math.log(0.01))


def test_mvgauss_baseline():
    A, B = small_batch(8)
    tr = AlignedIterator(A, B, batch_size=4)
    te = AlignedIterator(A, B, batch_size=4)
    bpp = compute_bpp_mvgauss_B(tr, te)
    assert np.isfinite(bpp)


def test_noise_sensitivity(tmp_path):
    m = tiny_model()
    A, B = small_batch()
    out = sensitivity_to_edge_noise(m.opt, m, B,
                                    save_path=str(tmp_path / "ns.npy"))
    assert len(out) == 8           # std grid 0..5
    assert len(out[0]) == 4        # per-sample values
    assert os.path.exists(tmp_path / "ns.npy")


def test_nats2bpp():
    assert np.isclose(nats2bpp(64 * 64 * 3 * math.log(2), 3, 64), 1.0)


def test_one_to_three_channels():
    x = np.zeros((2, 4, 4, 1))
    y = one_to_three_channels(x)
    assert y.shape == (2, 4, 4, 3)
    z = np.zeros((2, 4, 4, 3))
    assert one_to_three_channels(z).shape == (2, 4, 4, 3)


def test_interleave_columns():
    a = np.zeros((2, 1, 1, 3))
    b = np.ones((2, 1, 1, 3))
    out = interleave_columns([a, b])
    assert out.shape == (4, 1, 1, 3)
    assert out[0, 0, 0, 0] == 0 and out[1, 0, 0, 0] == 1


def test_save_image_grid(tmp_path):
    imgs = np.random.RandomState(0).uniform(-1, 1, (6, 8, 8, 3))
    p = str(tmp_path / "grid.png")
    save_image_grid(imgs, p, nrow=3)
    from PIL import Image
    im = Image.open(p)
    assert im.size[0] > 8 and im.size[1] > 8


def test_legacy_eval_constants_npix():
    """Quirk Q5: the reference's BPP math hardcodes 64*64*3 pixels whatever
    the actual grid (evaluate.py:104,107).  The fix derives npix from the
    batch shape by default; --legacy_eval_constants restores the reference's
    number for comparing against its published-style outputs."""
    from types import SimpleNamespace

    from domain_transfer_gan_tpu.eval.metrics import _npix

    real = np.zeros((2, 128, 128, 3), np.float32)
    legacy = SimpleNamespace(opt=SimpleNamespace(legacy_eval_constants=True))
    fixed = SimpleNamespace(opt=SimpleNamespace(legacy_eval_constants=False))
    assert _npix(legacy, real) == 64 * 64 * 3
    assert _npix(fixed, real) == 128 * 128 * 3
    # at the reference's own 64px geometry the two agree
    real64 = np.zeros((2, 64, 64, 3), np.float32)
    assert _npix(legacy, real64) == _npix(fixed, real64)
