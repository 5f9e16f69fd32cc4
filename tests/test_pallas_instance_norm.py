"""Pallas fused instance-norm kernel parity vs the pure-XLA reference
implementation (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from domain_transfer_gan_tpu.nn.norms import instance_norm_xla
from domain_transfer_gan_tpu.ops.pallas import instance_norm_pallas


def _data(per_sample, n=2, h=8, w=16, c=8, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    if per_sample:
        scale = jnp.asarray(rng.rand(n, c).astype(np.float32))
        shift = jnp.asarray(rng.randn(n, c).astype(np.float32))
    else:
        scale = jnp.asarray(rng.rand(c).astype(np.float32))
        shift = jnp.asarray(rng.randn(c).astype(np.float32))
    return x, scale, shift


@pytest.mark.parametrize("unbiased", [False, True])
@pytest.mark.parametrize("relu", [False, True])
@pytest.mark.parametrize("per_sample", [False, True])
def test_forward_parity(unbiased, relu, per_sample):
    x, scale, shift = _data(per_sample)
    got = instance_norm_pallas(x, scale, shift, unbiased=unbiased, relu=relu)
    want = instance_norm_xla(x, scale, shift, 1e-5, unbiased, relu=relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_forward_no_affine():
    x, _, _ = _data(False)
    got = instance_norm_pallas(x, None, None, unbiased=False)
    want = instance_norm_xla(x, None, None, 1e-5, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.parametrize("unbiased", [False, True])
@pytest.mark.parametrize("relu", [False, True])
@pytest.mark.parametrize("per_sample", [False, True])
def test_gradient_parity(unbiased, relu, per_sample):
    x, scale, shift = _data(per_sample, seed=1)
    t = jnp.asarray(np.random.RandomState(2).randn(*x.shape).astype(np.float32))

    def loss_pallas(x, s, b):
        y = instance_norm_pallas(x, s, b, unbiased=unbiased, relu=relu)
        return jnp.sum(y * t)

    def loss_xla(x, s, b):
        y = instance_norm_xla(x, s, b, 1e-5, unbiased, relu=relu)
        return jnp.sum(y * t)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, scale, shift)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, scale, shift)
    for a, b, name in zip(gp, gx, ("dx", "dscale", "dshift")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4, err_msg=name)


def test_fallback_when_block_too_large(monkeypatch):
    """Oversized spatial extents fall back to XLA silently."""
    import domain_transfer_gan_tpu.ops.pallas.instance_norm as m
    monkeypatch.setattr(m, "_VMEM_BLOCK_BUDGET", 64)  # force fallback
    x, scale, shift = _data(False)
    got = m.instance_norm_pallas(x, scale, shift)
    want = instance_norm_xla(x, scale, shift, 1e-5, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)
