"""Fake-image pool tests: torch-ImagePool semantics + train-step wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from domain_transfer_gan_tpu.config import TrainConfig
from domain_transfer_gan_tpu.models import create_model
from domain_transfer_gan_tpu.models.pool import PoolState, init_pool, pool_query


def _img(v, hw=2, c=1):
    return jnp.full((1, hw, hw, c), float(v))


def test_pool_fills_then_replays():
    pool = init_pool(4, (2, 2, 1))
    key = jax.random.PRNGKey(0)

    # first 4 images insert and pass through unchanged
    batch = jnp.concatenate([_img(i) for i in range(1, 5)])
    pool, out = pool_query(pool, batch, key)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(batch))
    assert int(pool.n) == 4
    assert sorted(np.asarray(pool.buf[:, 0, 0, 0]).tolist()) == [1, 2, 3, 4]

    # once full: each output is either the incoming image or a pool element
    newb = jnp.concatenate([_img(10 + i) for i in range(4)])
    pool2, out2 = pool_query(pool, newb, jax.random.PRNGKey(1))
    vals = np.asarray(out2[:, 0, 0, 0])
    for i, v in enumerate(vals):
        assert v == float(10 + i) or v in (1, 2, 3, 4), v
    assert int(pool2.n) == 4
    # pool contents remain from the union of old and new images
    buf_vals = set(np.asarray(pool2.buf[:, 0, 0, 0]).tolist())
    assert buf_vals <= {1.0, 2.0, 3.0, 4.0, 10.0, 11.0, 12.0, 13.0}


def test_pool_replays_eventually():
    """With p=0.5 swaps, some replays must occur over enough trials."""
    pool = init_pool(2, (2, 2, 1))
    pool, _ = pool_query(pool, jnp.concatenate([_img(1), _img(2)]),
                         jax.random.PRNGKey(0))
    replayed = False
    for i in range(20):
        _, out = pool_query(pool, _img(99), jax.random.PRNGKey(i))
        if float(out[0, 0, 0, 0]) != 99.0:
            replayed = True
            break
    assert replayed


def test_pooled_training_step_runs():
    cfg = TrainConfig(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4,
                      ndf=4, nlatent=8, use_pallas=False, pool_size=16,
                      monitor_gnorm=True, seed=0)
    cfg.expr_dir = ""
    m = create_model(cfg, testing=True)
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32))
    B = jnp.asarray(rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32))
    for _ in range(2):
        losses, _, _ = m.train_instance(A, B)
    for k, v in losses.items():
        assert np.isfinite(float(v))
    assert int(m.state.pools["fake_A"].n) == 8
    assert m.state.pools["fake_B"].buf.shape == (16, 64, 64, 3)


def test_pool_checkpoint_roundtrip(tmp_path):
    cfg = TrainConfig(model="stoch_cycle_gan", grid_size=64, ngf=4, nef=4,
                      ndf=4, nlatent=8, use_pallas=False, pool_size=8,
                      monitor_gnorm=True, seed=0)
    cfg.expr_dir = str(tmp_path)
    m = create_model(cfg, testing=True)
    rng = np.random.RandomState(1)
    A = jnp.asarray(rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32))
    B = jnp.asarray(rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32))
    m.train_instance(A, B)
    m.save("latest")
    cfg2 = TrainConfig(**{**vars(cfg)})
    cfg2.expr_dir = str(tmp_path)
    m2 = create_model(cfg2, testing=True)
    m2.load(str(tmp_path / "latest"))
    np.testing.assert_array_equal(np.asarray(m.state.pools["fake_A"].buf),
                                  np.asarray(m2.state.pools["fake_A"].buf))
    assert int(m2.state.pools["fake_A"].n) == int(m.state.pools["fake_A"].n)


def test_pool_with_data_parallel():
    """Pool buffers are replicated state updated from sharded batches."""
    from domain_transfer_gan_tpu.parallel import DataParallel
    cfg = TrainConfig(model="stoch_cycle_gan", grid_size=64, ngf=4, nef=4,
                      ndf=4, nlatent=8, batchSize=8, use_pallas=False,
                      pool_size=8, monitor_gnorm=True, seed=2)
    cfg.expr_dir = ""
    dp = DataParallel(create_model(cfg, testing=True), num_devices=4)
    rng = np.random.RandomState(3)
    A = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    losses, _, _ = dp.train_instance(A, B)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert int(dp.state.pools["fake_A"].n) == 8
    # pool holds the first batch's fakes (inserted verbatim while filling)
    assert np.all(np.isfinite(np.asarray(dp.state.pools["fake_A"].buf)))


def test_pool_crossing_batch_never_replays_zeros():
    """In the batch where the pool crosses full, replays must come from
    real images (torch fills sequentially, so every replayed slot is
    populated) — never from a zero-initialized slot."""
    filler = jnp.concatenate([_img(1), _img(2)])
    incoming = jnp.concatenate([_img(10 + i) for i in range(4)])
    legal = {1.0, 2.0, 10.0, 11.0, 12.0, 13.0}
    for seed in range(64):
        pool = init_pool(4, (2, 2, 1))
        pool, _ = pool_query(pool, filler, jax.random.PRNGKey(1000 + seed))
        assert int(pool.n) == 2
        # batch of 4 into 2 free slots: elements 2,3 are past capacity
        pool2, out = pool_query(pool, incoming, jax.random.PRNGKey(seed))
        vals = np.asarray(out[:, 0, 0, 0]).tolist()
        assert all(v in legal for v in vals), vals
        assert int(pool2.n) == 4
        buf_vals = np.asarray(pool2.buf[:, 0, 0, 0]).tolist()
        assert all(v in legal for v in buf_vals), buf_vals
