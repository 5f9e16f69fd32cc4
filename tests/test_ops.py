"""Unit tests for ops.numerics and ops.convs against closed forms and torch.

torch (CPU) is used only as an independent oracle for the conv geometry and
log-prob math — the framework itself never touches it.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from domain_transfer_gan_tpu.ops import (
    clip_grads_torchlike,
    conv2d_torch,
    conv_transpose2d_torch,
    criterion_gan,
    gauss_reparametrize,
    kld_std_gauss,
    log_prob_gaussian,
    log_prob_laplace,
)
from domain_transfer_gan_tpu.ops.numerics import gauss_reparametrize_eps


def test_log_prob_laplace_closed_form():
    rng = np.random.RandomState(0)
    z = rng.randn(4, 7).astype(np.float32)
    mu = rng.randn(4, 7).astype(np.float32)
    lv = rng.randn(4, 7).astype(np.float32)
    got = np.asarray(log_prob_laplace(jnp.array(z), jnp.array(mu), jnp.array(lv)))
    sd = np.exp(0.5 * lv)
    want = -0.5 * lv - np.abs(z - mu) / sd - np.log(2.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_log_prob_gaussian_matches_scipy_norm():
    from scipy.stats import norm
    rng = np.random.RandomState(1)
    z = rng.randn(3, 5).astype(np.float64)
    mu = rng.randn(3, 5).astype(np.float64)
    lv = rng.randn(3, 5).astype(np.float64)
    got = np.asarray(log_prob_gaussian(jnp.array(z), jnp.array(mu), jnp.array(lv)))
    want = norm.logpdf(z, loc=mu, scale=np.exp(0.5 * lv))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_kld_std_gauss_zero_at_standard_normal():
    mu = jnp.zeros((4, 8))
    lv = jnp.zeros((4, 8))
    np.testing.assert_allclose(np.asarray(kld_std_gauss(mu, lv)), 0.0, atol=1e-7)


def test_kld_std_gauss_closed_form():
    rng = np.random.RandomState(2)
    mu = rng.randn(4, 8).astype(np.float32)
    lv = rng.randn(4, 8).astype(np.float32)
    got = np.asarray(kld_std_gauss(jnp.array(mu), jnp.array(lv)))
    want = -0.5 * np.sum(lv + 1 - mu ** 2 - np.exp(lv), axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_reparam_clamps_to_pm4():
    key = jax.random.PRNGKey(0)
    mu = jnp.full((16, 8), 10.0)
    lv = jnp.zeros((16, 8))
    z = gauss_reparametrize(key, mu, lv)
    assert float(jnp.max(z)) <= 4.0
    assert z.shape == (16, 8)


def test_reparam_eps_zero_grad_outside_clamp():
    mu = jnp.array([[10.0, 0.0]])
    lv = jnp.zeros((1, 2))
    eps = jnp.zeros((1, 2))
    g = jax.grad(lambda m: jnp.sum(gauss_reparametrize_eps(m, lv, eps)))(mu)
    assert float(g[0, 0]) == 0.0   # clamped coordinate
    assert float(g[0, 1]) == 1.0   # live coordinate


def test_criterion_gan_lsgan():
    pred = jnp.array([[0.3, 0.7]])
    assert np.isclose(float(criterion_gan(pred, True, use_sigmoid=False)),
                      np.mean((np.array([0.3, 0.7]) - 1) ** 2))
    assert np.isclose(float(criterion_gan(pred, False, use_sigmoid=False)),
                      np.mean(np.array([0.3, 0.7]) ** 2))


def test_criterion_gan_bce_matches_torch():
    import torch
    import torch.nn.functional as F
    p = np.array([[0.2, 0.9, 0.5]], dtype=np.float32)
    for real in (True, False):
        got = float(criterion_gan(jnp.array(p), real, use_sigmoid=True))
        t = torch.ones if real else torch.zeros
        want = float(F.binary_cross_entropy(torch.tensor(p), t(1, 3)))
        # fp32 log/mean accumulation differs slightly between backends
        assert np.isclose(got, want, rtol=1e-4)


def test_criterion_gan_bce_saturation_matches_torch():
    """Value AND gradient reproduce torch's aten clamps at saturated
    probabilities (forward log >= -100, backward (p-t)/max(p(1-p),1e-12)):
    a clipped-probability BCE instead gives zero gradient at saturation
    (no adversarial signal for G once D saturates) and NaN in bfloat16."""
    import torch
    import torch.nn.functional as F
    grid = np.array([0.0, 1e-9, 1e-7, 0.01, 0.5, 0.9, 1 - 1e-7, 1.0],
                    dtype=np.float32)
    for real in (True, False):
        tp = torch.tensor(grid, requires_grad=True)
        tl = F.binary_cross_entropy(
            tp, (torch.ones if real else torch.zeros)(len(grid)))
        tl.backward()
        f = lambda p: criterion_gan(p, real, use_sigmoid=True)
        assert np.isclose(float(f(jnp.asarray(grid))), float(tl.detach()),
                          rtol=1e-5)
        np.testing.assert_allclose(np.asarray(jax.grad(f)(jnp.asarray(grid))),
                                   tp.grad.numpy(), rtol=1e-4)
    # bfloat16 inputs (the headline TPU mode): finite everywhere
    bg = jnp.asarray(grid, jnp.bfloat16)
    for real in (True, False):
        f = lambda p: criterion_gan(p, real, use_sigmoid=True)
        assert np.isfinite(float(f(bg)))
        assert np.all(np.isfinite(
            np.asarray(jax.grad(f)(bg)).astype(np.float32)))


def test_clip_grads_torch_semantics():
    g = {"w": jnp.full((10,), 3.0)}
    clipped, norm = clip_grads_torchlike(g, max_norm=1.0)
    expected_norm = math.sqrt(10 * 9.0)
    assert np.isclose(float(norm), expected_norm, rtol=1e-6)
    # torch scales by max/(norm + 1e-6)
    np.testing.assert_allclose(np.asarray(clipped["w"]),
                               3.0 * 1.0 / (expected_norm + 1e-6), rtol=1e-6)
    # below threshold: untouched
    clipped2, _ = clip_grads_torchlike(g, max_norm=100.0)
    np.testing.assert_allclose(np.asarray(clipped2["w"]), 3.0)


@pytest.mark.parametrize("k,s,p,size", [(3, 1, 1, 8), (3, 2, 1, 8), (4, 2, 1, 8),
                                        (4, 1, 1, 9), (7, 1, 0, 14), (4, 1, 0, 4),
                                        (3, 2, 1, 9)])
def test_conv2d_matches_torch(k, s, p, size):
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(3)
    x = rng.randn(2, size, size, 3).astype(np.float32)
    w = rng.randn(k, k, 3, 5).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    got = np.asarray(conv2d_torch(jnp.array(x), jnp.array(w), jnp.array(b),
                                  stride=s, padding=p))
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    wt = torch.tensor(w.transpose(3, 2, 0, 1))   # HWIO -> OIHW
    want = F.conv2d(xt, wt, torch.tensor(b), stride=s, padding=p)
    want = want.numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("size", [4, 7, 8])
def test_conv_transpose2d_matches_torch(size):
    """Geometry + values vs F.conv_transpose2d (k=3, s=2, p=1, op=1 — the
    generator's upsampling layer, reference networks.py:178-179)."""
    import torch
    import torch.nn.functional as F
    rng = np.random.RandomState(4)
    x = rng.randn(2, size, size, 6).astype(np.float32)
    w = rng.randn(3, 3, 6, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    got = np.asarray(conv_transpose2d_torch(jnp.array(x), jnp.array(w),
                                            jnp.array(b), stride=2, padding=1,
                                            output_padding=1))
    # our kernel is the *correlation* kernel of the dilated conv; torch's
    # conv_transpose kernel relates by a spatial flip and (Cin, Cout) layout
    wt = torch.tensor(w[::-1, ::-1].copy().transpose(2, 3, 0, 1))
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    want = F.conv_transpose2d(xt, wt, torch.tensor(b), stride=2, padding=1,
                              output_padding=1)
    want = want.numpy().transpose(0, 2, 3, 1)
    assert got.shape == want.shape == (2, 2 * size, 2 * size, 4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
