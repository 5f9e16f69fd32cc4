"""Instance/conditional-instance norm numerics: the two variance conventions
(quirk Q6) and init quirks (Q7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from domain_transfer_gan_tpu.nn.norms import (
    CondInstanceNorm,
    InstanceNorm,
    instance_norm_xla,
)


def _numpy_instance_norm(x, scale, shift, eps, unbiased):
    # x NHWC
    mean = x.mean(axis=(1, 2), keepdims=True)
    c = x - mean
    var = (c ** 2).mean(axis=(1, 2), keepdims=True)
    if unbiased:
        hw = x.shape[1] * x.shape[2]
        var = var * hw / (hw - 1)
    y = c / np.sqrt(var + eps)
    if scale is not None:
        if scale.ndim == 1:
            y = y * scale[None, None, None, :] + shift[None, None, None, :]
        else:
            y = y * scale[:, None, None, :] + shift[:, None, None, :]
    return y


@pytest.mark.parametrize("unbiased", [False, True])
@pytest.mark.parametrize("per_sample", [False, True])
def test_instance_norm_xla_math(unbiased, per_sample):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 6, 3).astype(np.float32)
    if per_sample:
        scale = rng.randn(2, 3).astype(np.float32)
        shift = rng.randn(2, 3).astype(np.float32)
    else:
        scale = rng.randn(3).astype(np.float32)
        shift = rng.randn(3).astype(np.float32)
    got = np.asarray(instance_norm_xla(jnp.array(x), jnp.array(scale),
                                       jnp.array(shift), 1e-5, unbiased))
    want = _numpy_instance_norm(x, scale, shift, 1e-5, unbiased)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_instance_norm_biased_matches_torch_instancenorm2d():
    """The reference's custom InstanceNorm (biased variance) agrees with
    torch.nn.InstanceNorm2d (which also uses biased variance)."""
    import torch
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    got = np.asarray(instance_norm_xla(jnp.array(x), None, None, 1e-5, False))
    tin = torch.nn.InstanceNorm2d(3, affine=False, eps=1e-5)
    want = tin(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), rtol=1e-4,
                               atol=1e-5)


def test_cin_unbiased_variance_differs_from_biased():
    rng = np.random.RandomState(2)
    x = jnp.array(rng.randn(1, 3, 3, 2).astype(np.float32))
    biased = instance_norm_xla(x, None, None, 1e-5, False)
    unbiased = instance_norm_xla(x, None, None, 1e-5, True)
    assert not np.allclose(np.asarray(biased), np.asarray(unbiased))


def test_instance_norm_module_reference_init():
    """Q7: reference InstanceNorm affine init is scale ~ N(0, 0.02), shift=0."""
    m = InstanceNorm(8, init_scheme="reference")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))
    scale = np.asarray(v["params"]["scale"])
    assert np.abs(scale).max() < 0.2       # near zero, not near 1
    np.testing.assert_allclose(np.asarray(v["params"]["shift"]), 0.0)
    m2 = InstanceNorm(8, init_scheme="sane")
    v2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))
    np.testing.assert_allclose(np.asarray(v2["params"]["scale"]), 1.0)


def test_cin_shift_scale_are_relu_of_dense():
    """CIN injection: shift/scale = ReLU(affine(z)); ReLU means nonnegative."""
    m = CondInstanceNorm(6, nlatent=4, init_scheme="sane")
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 5, 5, 6))
    z = jax.random.normal(jax.random.fold_in(key, 1), (2, 4))
    v = m.init(key, x, z)
    y = m.apply(v, x, z)
    assert y.shape == x.shape
    # zero z -> shift/scale = relu(bias) = 0 -> output exactly 0
    y0 = m.apply(v, x, jnp.zeros_like(z))
    np.testing.assert_allclose(np.asarray(y0), 0.0, atol=1e-6)


def test_cin_matches_reference_composition():
    """CIN == unbiased instance norm * relu(dense(z)) + relu(dense(z))."""
    m = CondInstanceNorm(6, nlatent=4, init_scheme="sane")
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (3, 4, 4, 6))
    z = jax.random.normal(jax.random.fold_in(key, 1), (3, 4))
    v = m.init(key, x, z)
    got = np.asarray(m.apply(v, x, z))
    p = v["params"]
    shift = np.maximum(np.asarray(z) @ np.asarray(p["shift_conv"]["kernel"])
                       + np.asarray(p["shift_conv"]["bias"]), 0)
    scale = np.maximum(np.asarray(z) @ np.asarray(p["scale_conv"]["kernel"])
                       + np.asarray(p["scale_conv"]["bias"]), 0)
    want = _numpy_instance_norm(np.asarray(x), scale, shift, 1e-5, True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
