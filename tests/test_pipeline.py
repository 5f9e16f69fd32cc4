"""Pipeline-parallelism tests (parallel/pipeline.py) on the 8-virtual-device
CPU mesh: the GPipe trunk engine must reproduce the sequential block loop —
forward and gradients — and the full train steps under a dp x pp mesh must
match single-device execution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from domain_transfer_gan_tpu.config import TrainConfig
from domain_transfer_gan_tpu.models import create_model
from domain_transfer_gan_tpu.nn.blocks import CINResnetBlock
from domain_transfer_gan_tpu.parallel import DataParallel
from domain_transfer_gan_tpu.parallel.pipeline import (
    PipelineEngine,
    _stack_stages,
    gpipe_apply,
)


def tiny_cfg(**kw):
    base = dict(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4, ndf=4,
                nlatent=8, batchSize=8, n_blocks=4, use_pallas=False,
                monitor_gnorm=True, seed=1)
    base.update(kw)
    cfg = TrainConfig(**base)
    cfg.expr_dir = ""
    return cfg


def _rand_batch(seed, b=8):
    rng = np.random.RandomState(seed)
    A = rng.uniform(-1, 1, (b, 64, 64, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (b, 64, 64, 3)).astype(np.float32)
    z = rng.randn(b, 8).astype(np.float32)
    return A, B, z


# ---------------------------------------------------------------------------
# engine-level equivalence
# ---------------------------------------------------------------------------

def _trunk_fixture(n_blocks=4, dim=16, nl=8, b=16, h=8):
    block = CINResnetBlock(dim, nl)
    ks = jax.random.split(jax.random.PRNGKey(0), n_blocks + 2)
    params = {
        "block%d" % i: block.init(ks[i], jnp.zeros((2, h, h, dim)),
                                  jnp.zeros((2, nl)), True)["params"]
        for i in range(n_blocks)
    }
    x = jax.random.normal(ks[-2], (b, h, h, dim))
    z = jax.random.normal(ks[-1], (b, nl))

    def seq(params, x, z):
        for i in range(n_blocks):
            x = block.apply({"params": params["block%d" % i]}, x, z, True)
        return x

    return block, params, x, z, seq


@pytest.mark.parametrize("stages,n_micro", [(4, 4), (2, 4), (4, 2), (2, 2)])
def test_gpipe_engine_matches_sequential_forward(stages, n_micro):
    """The microbatched fill/steady/drain schedule computes exactly the
    sequential composition of the blocks, for any (stage, microbatch)
    factorization.  (n_micro must divide the per-data-group batch
    16/(8/stages).)"""
    block, params, x, z, seq = _trunk_fixture()
    mesh = Mesh(np.array(jax.devices()).reshape(8 // stages, stages),
                ("data", "pipe"))
    eng = PipelineEngine(mesh=mesh, data_axis="data", pipe_axis="pipe",
                         n_micro=n_micro)

    def pipe(params, x, z):
        stacked = _stack_stages(params, 4, eng.n_stages)
        return gpipe_apply(
            eng, lambda p, h, zx: block.apply({"params": p}, h, zx, True),
            stacked, x, z)

    want = jax.jit(seq)(params, x, z)
    got = jax.jit(pipe)(params, x, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gpipe_engine_matches_sequential_gradients():
    """vjp through scan+ppermute+psum gives the sequential loop's grads for
    params AND inputs.  Leaves whose true gradient is ~0 (conv biases ahead
    of instance norms are annihilated by the mean subtraction) are compared
    with an absolute floor — both sides are float noise there."""
    block, params, x, z, seq = _trunk_fixture()
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "pipe"))
    eng = PipelineEngine(mesh=mesh, data_axis="data", pipe_axis="pipe",
                         n_micro=4)

    def pipe(params, x, z):
        stacked = _stack_stages(params, 4, eng.n_stages)
        return gpipe_apply(
            eng, lambda p, h, zx: block.apply({"params": p}, h, zx, True),
            stacked, x, z)

    def loss(f):
        return lambda p, x, z: jnp.sum(jnp.sin(f(p, x, z)))

    want = jax.jit(jax.grad(loss(seq), argnums=(0, 1, 2)))(params, x, z)
    got = jax.jit(jax.grad(loss(pipe), argnums=(0, 1, 2)))(params, x, z)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=3e-4)


def test_stack_stages_requires_divisibility():
    _, params, _, _, _ = _trunk_fixture()
    with pytest.raises(ValueError, match="not divisible"):
        _stack_stages(params, 4, 3)


# ---------------------------------------------------------------------------
# full-model equivalence under DataParallel(pipeline=...)
# ---------------------------------------------------------------------------

def test_dp_pipe_aug_step_matches_single():
    """aug_cycle_gan on a 4x2 data x pipe mesh: three full two-phase steps
    (through the donated-state jit, the vjp-shared forward, and BOTH
    pipelined generators) reproduce single-device losses."""
    A, B, z = _rand_batch(3)
    m1 = create_model(tiny_cfg(), testing=True)
    dp = DataParallel(create_model(tiny_cfg(), testing=True), num_devices=8,
                      pipeline=2)
    assert dp.mesh.shape == {"data": 4, "pipe": 2}
    assert dp.axis == ("data", "pipe")
    for _ in range(3):
        l1, _, _ = m1.train_instance(A, B, z)
        l2, _, _ = dp.train_instance(A, B, z)
        for k in l1:
            assert np.isclose(float(l1[k]), float(l2[k]), rtol=2e-3,
                              atol=2e-4), f"{k}: {float(l1[k])} vs {float(l2[k])}"


def test_dp_pipe_stoch_step_matches_single():
    """stoch_cycle_gan exercises the plain ResnetBlock trunk (z=None path)."""
    A, B, z = _rand_batch(4)
    cfgkw = dict(model="stoch_cycle_gan")
    m1 = create_model(tiny_cfg(**cfgkw), testing=True)
    dp = DataParallel(create_model(tiny_cfg(**cfgkw), testing=True),
                      num_devices=8, pipeline=4)
    l1, _, _ = m1.train_instance(A, B, z)
    l2, _, _ = dp.train_instance(A, B, z)
    for k in l1:
        assert np.isclose(float(l1[k]), float(l2[k]), rtol=2e-3,
                          atol=2e-4), f"{k}: {float(l1[k])} vs {float(l2[k])}"


def test_dp_pipe_supervised_step_matches_single():
    A, B, z = _rand_batch(5)
    m1 = create_model(tiny_cfg(), testing=True)
    dp = DataParallel(create_model(tiny_cfg(), testing=True), num_devices=8,
                      pipeline=2)
    l1 = m1.supervised_train_instance(A, B, z)
    l2 = dp.supervised_train_instance(A, B, z)
    for k in l1:
        assert np.isclose(float(l1[k]), float(l2[k]), rtol=2e-3,
                          atol=2e-4), f"{k}: {float(l1[k])} vs {float(l2[k])}"


def test_dp_pipe_more_microbatches():
    """microbatches > stages shrinks the bubble; numerics unchanged."""
    A, B, z = _rand_batch(6)
    m1 = create_model(tiny_cfg(), testing=True)
    dp = DataParallel(create_model(tiny_cfg(), testing=True), num_devices=4,
                      pipeline=2, microbatches=4)  # data 2 x pipe 2, local b 4
    assert dp.engine.n_micro == 4
    l1, _, _ = m1.train_instance(A, B, z)
    l2, _, _ = dp.train_instance(A, B, z)
    for k in l1:
        assert np.isclose(float(l1[k]), float(l2[k]), rtol=2e-3,
                          atol=2e-4), f"{k}: {float(l1[k])} vs {float(l2[k])}"


def test_dp_pipe_ema_composition():
    """--ema composes with pipeline parallelism: after two steps the EMA
    shadows track the same post-update params as single-device execution —
    an end-to-end check that the pipelined trunk produced the same
    *gradients* (param updates), not just the same losses."""
    A, B, z = _rand_batch(9)
    m1 = create_model(tiny_cfg(ema=0.5), testing=True)
    dp = DataParallel(create_model(tiny_cfg(ema=0.5), testing=True),
                      num_devices=8, pipeline=2)
    for _ in range(2):
        m1.train_instance(A, B, z)
        dp.train_instance(A, B, z)
    f1 = jax.tree_util.tree_flatten_with_path(m1.state.ema)[0]
    f2 = jax.tree_util.tree_leaves(dp.state.ema)
    assert f1 and len(f1) == len(f2)
    # Only KERNEL leaves are per-element comparable: conv biases feeding an
    # instance norm have mathematically-zero gradients (the norm subtracts
    # the per-channel mean), so Adam normalizes pure float roundoff into
    # +-lr random-sign walks that microbatch reassociation flips freely —
    # measured: all kernel leaves agree to <5e-5 while zero-grad bias
    # leaves diverge at the full Adam-step scale in BOTH orderings.
    checked = 0
    for (path, a), b in zip(f1, f2):
        if jax.tree_util.keystr(path).endswith("['kernel']"):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-3, atol=1e-4,
                                       err_msg=jax.tree_util.keystr(path))
            checked += 1
    assert checked >= 20  # both generators' stems, trunks and tails


def test_dp_pipe_generation_helpers_unpipelined():
    """The eval/generation surface runs outside the pipeline context (the
    contextvar is step-scoped) and matches single-device output."""
    A, B, z = _rand_batch(7)
    m1 = create_model(tiny_cfg(), testing=True)
    dp = DataParallel(create_model(tiny_cfg(), testing=True), num_devices=8,
                      pipeline=2)
    want = np.asarray(m1.predict_B(A, z))
    got = np.asarray(dp.predict_B(A, z))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_dp_pipe_guards():
    """Clear errors for unsupported compositions."""
    with pytest.raises(ValueError, match="mutually exclusive"):
        DataParallel(create_model(tiny_cfg(), testing=True), num_devices=8,
                     pipeline=2, spatial=2)
    with pytest.raises(ValueError, match="divide n_blocks"):
        DataParallel(create_model(tiny_cfg(n_blocks=3), testing=True),
                     num_devices=8, pipeline=2)
    with pytest.raises(ValueError, match="remat"):
        DataParallel(create_model(tiny_cfg(remat=True), testing=True),
                     num_devices=8, pipeline=2)
    with pytest.raises(ValueError, match="use_dropout"):
        DataParallel(create_model(tiny_cfg(use_dropout=True), testing=True),
                     num_devices=8, pipeline=2)
    with pytest.raises(ValueError, match="instance"):
        DataParallel(create_model(tiny_cfg(norm="batch"), testing=True),
                     num_devices=8, pipeline=2)
    with pytest.raises(ValueError, match="microbatches"):
        DataParallel(create_model(tiny_cfg(), testing=True), num_devices=8,
                     microbatches=4)


def test_dp_pipe_ubo_eval_runs():
    """Regression: the variational-UBO eval pads/shards by the COMBINED
    ('data','pipe') batch axes (model.axis is a tuple under pipeline
    parallelism); it must run and match single-device numbers."""
    from domain_transfer_gan_tpu.data import AlignedIterator
    from domain_transfer_gan_tpu.eval import eval_ubo_B

    A, B, _ = _rand_batch(8)
    m1 = create_model(tiny_cfg(), testing=True)
    m1._rng = jax.random.PRNGKey(77)
    want = eval_ubo_B(AlignedIterator(A, B, batch_size=8), m1, steps=3)

    dp = DataParallel(create_model(tiny_cfg(), testing=True), num_devices=4,
                      pipeline=2)
    dp.model._rng = jax.random.PRNGKey(77)
    got = eval_ubo_B(AlignedIterator(A, B, batch_size=8), dp, steps=3)
    for w, g in zip(want, got):
        assert np.isclose(w, g, rtol=5e-3, atol=1e-4), (want, got)
