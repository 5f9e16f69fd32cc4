"""Architecture shape/param parity with the reference topology (SURVEY.md §2.1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from domain_transfer_gan_tpu.nn import (
    CINResnetGenerator,
    Discriminator,
    DiscriminatorEdges,
    DiscriminatorLatent,
    LatentEncoder,
    ResnetGenerator,
    CINDiscriminator,
    count_params,
)

KEY = jax.random.PRNGKey(0)


def test_cin_generator_shapes_64():
    g = CINResnetGenerator(nlatent=16, input_nc=3, output_nc=3, ngf=8)
    x = jnp.zeros((2, 64, 64, 3))
    z = jnp.zeros((2, 16))
    v = g.init(KEY, x, z, train=False)
    y = g.apply(v, x, z, train=False)
    assert y.shape == (2, 64, 64, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh range


def test_cin_generator_odd_size_roundtrip():
    # single stride-2 down + matched transposed conv: even sizes round-trip
    g = CINResnetGenerator(nlatent=8, input_nc=1, output_nc=1, ngf=4)
    x = jnp.zeros((1, 32, 32, 1))
    z = jnp.zeros((1, 8))
    v = g.init(KEY, x, z, train=False)
    assert g.apply(v, x, z, train=False).shape == (1, 32, 32, 1)


def test_resnet_generator_shapes():
    g = ResnetGenerator(input_nc=3, output_nc=3, ngf=8)
    x = jnp.zeros((2, 64, 64, 3))
    v = g.init(KEY, x, train=False)
    assert g.apply(v, x, train=False).shape == (2, 64, 64, 3)


def test_patchgan_emits_13x13_on_64():
    """D_B topology: 64 -> 32 -> 16 -> 15 -> 14 -> 13 patch logits
    (reference networks.py:321-338; SURVEY.md RF=46px)."""
    d = Discriminator(input_nc=3, ndf=8)
    x = jnp.zeros((2, 64, 64, 3))
    v = d.init(KEY, x, train=False)
    assert d.apply(v, x, train=False).shape == (2, 13, 13, 1)


def test_discriminator_edges_global_logit_on_64():
    """D_A: 64 -> 32 -> 16 -> 8 -> 4 -> valid 4x4 conv -> 1x1 scalar
    (reference networks.py:364-382)."""
    d = DiscriminatorEdges(input_nc=3, ndf=8)
    x = jnp.zeros((2, 64, 64, 3))
    v = d.init(KEY, x, train=False)
    assert d.apply(v, x, train=False).shape == (2, 1, 1, 1)


def test_cin_discriminator_shapes():
    d = CINDiscriminator(nlatent=8, input_nc=3, ndf=8)
    x = jnp.zeros((2, 64, 64, 3))
    z = jnp.zeros((2, 8))
    v = d.init(KEY, x, z, train=False)
    assert d.apply(v, x, z, train=False).shape == (2, 13, 13, 1)


def test_latent_discriminator_accepts_flat_and_4d():
    d = DiscriminatorLatent(nlatent=16, ndf=8)
    z = jnp.zeros((4, 16))
    v = d.init(KEY, z, train=False)
    assert d.apply(v, z, train=False).shape == (4, 1)
    z4 = jnp.zeros((4, 1, 1, 16))  # reference layout (B, nlatent, 1, 1)
    assert d.apply(v, z4.reshape(4, 16), train=False).shape == (4, 1)


def test_latent_encoder_shapes_64():
    e = LatentEncoder(nlatent=16, input_nc=6, nef=8)
    x = jnp.zeros((2, 64, 64, 6))
    v = e.init(KEY, x, train=False)
    mu, logvar = e.apply(v, x, train=False)
    assert mu.shape == (2, 16) and logvar.shape == (2, 16)


def test_latent_encoder_adaptive_pool_larger_inputs():
    e = LatentEncoder(nlatent=16, input_nc=3, nef=4, adaptive_pool=True)
    x = jnp.zeros((1, 128, 128, 3))
    v = e.init(KEY, x, train=False)
    mu, logvar = e.apply(v, x, train=False)
    assert mu.shape == (1, 16)


def _conv_params(k, cin, cout, bias=True):
    return k * k * cin * cout + (cout if bias else 0)


def test_discriminator_edges_param_count():
    """Analytic param count for D_A (ndf=32, instance norm, 3-ch input)."""
    ndf = 32
    expected = (_conv_params(3, 3, ndf)
                + _conv_params(3, ndf, 2 * ndf) + 2 * (2 * ndf)
                + _conv_params(3, 2 * ndf, 4 * ndf) + 2 * (4 * ndf)
                + _conv_params(3, 4 * ndf, 4 * ndf) + 2 * (4 * ndf)
                + _conv_params(4, 4 * ndf, 1))
    d = DiscriminatorEdges(input_nc=3, ndf=ndf)
    v = d.init(KEY, jnp.zeros((1, 64, 64, 3)), train=False)
    assert count_params(v["params"]) == expected


def test_latent_discriminator_param_count():
    """Linear + BatchNorm1d stack (BN contributes scale+bias; running stats
    live in batch_stats, not params)."""
    nl, ndf = 16, 64
    expected = ((nl * ndf + ndf) + 2 * ndf
                + (ndf * ndf + ndf) + 2 * ndf
                + (ndf * ndf + ndf) + 2 * ndf
                + (ndf * 1 + 1))
    d = DiscriminatorLatent(nlatent=nl, ndf=ndf)
    v = d.init(KEY, jnp.zeros((2, nl)), train=False)
    assert count_params(v["params"]) == expected


def test_n_blocks_honored():
    """Quirk Q1 fixed: n_blocks is a real knob (reference hardcoded 3)."""
    for n in (1, 3, 5):
        g = ResnetGenerator(input_nc=1, output_nc=1, ngf=2, n_blocks=n)
        v = g.init(KEY, jnp.zeros((1, 16, 16, 1)), train=False)
        blocks = [k for k in v["params"] if k.startswith("block")]
        assert len(blocks) == n


def test_generator_grad_flows_to_z():
    """The CIN injection must carry gradient from output to the latent."""
    g = CINResnetGenerator(nlatent=8, input_nc=1, output_nc=1, ngf=4,
                           init_scheme="sane")
    x = jax.random.normal(KEY, (1, 16, 16, 1))
    z = jax.random.normal(jax.random.fold_in(KEY, 1), (1, 8))
    v = g.init(KEY, x, z, train=False)
    gz = jax.grad(lambda zz: jnp.sum(g.apply(v, x, zz, train=False)))(z)
    assert float(jnp.max(jnp.abs(gz))) > 0


def test_sub64_grid_raises_clear_error():
    """Below 64px the edges-discriminator / latent-encoder valid 4x4 heads
    would emit empty tensors; init_state fails with the real reason instead
    of a deep flax shape error."""
    import pytest
    from domain_transfer_gan_tpu.config import TrainConfig
    from domain_transfer_gan_tpu.models.state import init_state

    cfg = TrainConfig(model="aug_cycle_gan", grid_size=32, ngf=4, nef=4,
                      ndf=4, nlatent=8, batchSize=4)
    cfg.expr_dir = ""
    with pytest.raises(ValueError, match="grid_size.*64"):
        init_state(cfg, jax.random.PRNGKey(0))
