"""Multi-device data-parallel tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from domain_transfer_gan_tpu.config import TrainConfig
from domain_transfer_gan_tpu.models import create_model
from domain_transfer_gan_tpu.parallel import (
    DataParallel,
    batch_sharding,
    make_mesh,
    prefetch_to_device,
    shard_batch,
)


def tiny_cfg(**kw):
    base = dict(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4, ndf=4,
                nlatent=8, batchSize=8, use_pallas=False, monitor_gnorm=True,
                seed=1)
    base.update(kw)
    cfg = TrainConfig(**base)
    cfg.expr_dir = ""
    return cfg


def test_mesh_has_8_cpu_devices():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_places_on_mesh():
    mesh = make_mesh()
    x = np.zeros((8, 4, 4, 3), np.float32)
    xs = shard_batch(mesh, x)
    assert xs.sharding == batch_sharding(mesh, 4)


def test_data_parallel_step_runs_and_matches_single():
    """The same batch gives identical losses data-parallel vs single-device
    (up to reduction order)."""
    rng = np.random.RandomState(0)
    A = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    z = rng.randn(8, 8).astype(np.float32)

    m1 = create_model(tiny_cfg(), testing=True)
    l1, _, _ = m1.train_instance(A, B, z)

    m2 = create_model(tiny_cfg(), testing=True)
    dp = DataParallel(m2, num_devices=8)
    l2, _, _ = dp.train_instance(A, B, z)

    for k in l1:
        assert np.isclose(float(l1[k]), float(l2[k]), rtol=2e-3, atol=2e-4), \
            f"{k}: {float(l1[k])} vs {float(l2[k])}"


def test_data_parallel_multiple_steps():
    dp = DataParallel(create_model(tiny_cfg(model="stoch_cycle_gan"),
                                   testing=True), num_devices=4)
    rng = np.random.RandomState(1)
    for _ in range(2):
        A = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
        B = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
        losses, _, _ = dp.train_instance(A, B)
    for k, v in losses.items():
        assert np.isfinite(float(v))
    assert int(dp.state.step) == 2


def test_data_spatial_parallel_matches_single():
    """dp x sp (4x2 mesh: batch on 'data', image H on 'space') gives the
    same losses as single-device — GSPMD inserts the conv halo exchanges
    and cross-shard norm reductions."""
    rng = np.random.RandomState(3)
    A = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    z = rng.randn(8, 8).astype(np.float32)

    m1 = create_model(tiny_cfg(), testing=True)
    l1, _, _ = m1.train_instance(A, B, z)

    m2 = create_model(tiny_cfg(), testing=True)
    dp = DataParallel(m2, num_devices=8, spatial=2)
    assert dp.mesh.shape == {"data": 4, "space": 2}
    l2, _, _ = dp.train_instance(A, B, z)

    for k in l1:
        assert np.isclose(float(l1[k]), float(l2[k]), rtol=2e-3, atol=2e-4), \
            f"{k}: {float(l1[k])} vs {float(l2[k])}"


def test_data_tensor_parallel_matches_single():
    """dp x tp (4x2 mesh: batch on 'data', channels on 'model') reproduces
    the single-device losses — GSPMD partitions the conv feature dims and
    inserts the parameter-gradient collectives."""
    rng = np.random.RandomState(7)
    A = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    z = rng.randn(8, 8).astype(np.float32)

    m1 = create_model(tiny_cfg(), testing=True)
    l1, _, _ = m1.train_instance(A, B, z)

    m2 = create_model(tiny_cfg(), testing=True)
    dp = DataParallel(m2, num_devices=8, tensor=2)
    assert dp.mesh.shape == {"data": 4, "model": 2}
    # large conv kernels are channel-sharded; their Adam moments match
    from jax.sharding import PartitionSpec as P
    k = dp.state.params["netG_A_B"]["block0"]["conv1"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")
    mu = dp.state.opt_state["netG_A_B"].mu["block0"]["conv1"]["kernel"]
    assert mu.sharding.spec == P(None, None, None, "model")
    l2, _, _ = dp.train_instance(A, B, z)

    for k in l1:
        assert np.isclose(float(l1[k]), float(l2[k]), rtol=2e-3, atol=2e-4), \
            f"{k}: {float(l1[k])} vs {float(l2[k])}"
    # a second step keeps the sharded state consistent
    l3, _, _ = dp.train_instance(A, B, z)
    for k, v in l3.items():
        assert np.isfinite(float(v))


@pytest.mark.parametrize("widths", [
    dict(ngf=8, nef=8, ndf=8, nlatent=16),   # __graft_entry__ dryrun config
    dict(ngf=4, nef=4, ndf=8, nlatent=8),    # verify-skill CLI config
], ids=["dryrun-cfg", "cli-cfg"])
def test_dp_sp_compile_clean_of_involuntary_remat(capfd, widths):
    """The dp x sp train-step compile must be free of GSPMD's 'Involuntary
    full rematerialization' reshard warning (spmd_partitioner.cc): the
    round-2 dryrun emitted it for a f32[B,1,1,1] broadcast in the step's
    transpose — the spatially-shaped discriminator logit reaching the loss
    mean.  Three fixes cover it: models/steps.py flattens every D prediction
    to (B, N) before the GAN criteria (flat2d, numerics-preserving), and
    DiscriminatorEdges + LatentEncoder pin their head activations (the
    4x4 -> 1x1 spatial collapse) to batch-only sharding under an active
    spatial mesh (parallel/hints.py) so no transpose ever wants a cotangent
    sharded along a size-1 spatial dim.  Which head the partitioner
    mishandles is cost-model (width) dependent: the dryrun config tripped
    DiscriminatorEdges' conv4 transpose, the CLI config LatentEncoder's
    nr4 batch-norm transpose — so both widths are pinned here.  Compile
    fresh (persistent cache off so the partitioner actually runs) and
    assert a clean stderr."""
    import jax as _jax

    cache_dir = _jax.config.jax_compilation_cache_dir
    _jax.config.update("jax_compilation_cache_dir", None)
    try:
        dp = DataParallel(create_model(tiny_cfg(**widths), testing=True),
                          num_devices=8, spatial=2)
        rng = np.random.RandomState(11)
        A = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
        B = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
        losses, _, _ = dp.train_instance(A, B)
        assert np.isfinite(float(losses["D_A"]))
    finally:
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err[-2000:]
    assert "spmd_partitioner" not in err, err[-2000:]


def test_data_space_tensor_parallel_runs():
    """All three axes composed: 2x2x2 mesh, one full step, finite losses."""
    dp = DataParallel(create_model(tiny_cfg(), testing=True), num_devices=8,
                      spatial=2, tensor=2)
    assert dp.mesh.shape == {"data": 2, "space": 2, "model": 2}
    rng = np.random.RandomState(8)
    A = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    losses, _, _ = dp.train_instance(A, B)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_data_parallel_setattr_reaches_inner_model(tmp_path):
    """Regression: ``model.epoch = N`` on the wrapper must land on the inner
    model that save() serializes, so a checkpoint written under DP resumes
    at the right epoch (round-1 bug: wrapper shadowed the attribute)."""
    cfg = tiny_cfg(model="stoch_cycle_gan")
    dp = DataParallel(create_model(cfg, testing=True), num_devices=2)
    rng = np.random.RandomState(2)
    A = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    dp.train_instance(A, B)
    dp.epoch = 7
    assert dp.model.epoch == 7
    cfg.expr_dir = str(tmp_path)
    dp.save("latest")

    fresh = create_model(tiny_cfg(model="stoch_cycle_gan"), testing=True)
    fresh.opt.expr_dir = str(tmp_path)
    fresh.load(str(tmp_path / "latest"))
    assert fresh.epoch == 7
    assert int(fresh.state.step) == 1


def test_data_parallel_sharded_inference_matches_single():
    rng = np.random.RandomState(5)
    B = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    m1 = create_model(tiny_cfg(), testing=True)
    want = np.asarray(m1.predict_A(jnp.asarray(B)))
    dp = DataParallel(create_model(tiny_cfg(), testing=True), num_devices=8)
    got = np.asarray(dp.predict_A(B))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # non-divisible batch falls back to replicated compute, same result
    got5 = np.asarray(dp.predict_A(B[:5]))
    np.testing.assert_allclose(got5, want[:5], rtol=2e-4, atol=2e-5)


def test_data_parallel_ubo_eval_matches_single():
    """eval_ubo_B under DataParallel shards the eval batch over the mesh
    and must reproduce the single-device numbers (same rng stream, batch
    already a mesh multiple so padding is identical)."""
    import jax as _jax
    from domain_transfer_gan_tpu.data import AlignedIterator
    from domain_transfer_gan_tpu.eval import eval_ubo_B

    rng = np.random.RandomState(6)
    A = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)

    m1 = create_model(tiny_cfg(), testing=True)
    m1._rng = _jax.random.PRNGKey(77)
    want = eval_ubo_B(AlignedIterator(A, B, batch_size=8), m1, steps=3)

    dp = DataParallel(create_model(tiny_cfg(), testing=True), num_devices=4)
    dp.model._rng = _jax.random.PRNGKey(77)  # _-prefixed attrs stay local
    got = eval_ubo_B(AlignedIterator(A, B, batch_size=8), dp, steps=3)
    for w, g in zip(want, got):
        assert np.isclose(w, g, rtol=5e-3, atol=1e-4), (want, got)


def test_prefetch_to_device():
    mesh = make_mesh(num_devices=2)
    batches = [{"A": np.full((4, 2, 2, 3), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), mesh))
    assert len(out) == 5
    assert float(out[3]["A"][0, 0, 0, 0]) == 3.0


def test_graft_entry_dryrun():
    import __graft_entry__ as g
    fn, args = g.entry()
    y = jax.jit(fn)(*args)
    assert y.shape == (8, 64, 64, 3)
    g.dryrun_multichip(8)


def test_tensor_parallel_keeps_ema():
    """Regression: the tensor-parallel state rebuild must carry the EMA
    shadow tree (sharded like the params it mirrors)."""
    from jax.sharding import PartitionSpec as P
    dp = DataParallel(create_model(tiny_cfg(ema=0.9), testing=True),
                      num_devices=8, tensor=2)
    assert dp.state.ema, "EMA tree dropped by the tensor-parallel rebuild"
    k = dp.state.ema["netG_A_B"]["block0"]["conv1"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")
    rng = np.random.RandomState(9)
    A = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    losses, _, _ = dp.train_instance(A, B)
    assert np.isfinite(float(losses["D_A"]))


def test_spatial_hint_identity_and_pinning():
    """parallel/hints.pin_batch_only is the identity outside the context
    and applies a batch-only constraint inside a spatial-hint context."""
    from domain_transfer_gan_tpu.parallel.hints import (pin_batch_only,
                                                        spatial_hints)
    from domain_transfer_gan_tpu.parallel import make_mesh_axes
    from jax.sharding import PartitionSpec as P

    x = jnp.ones((8, 4, 4, 16))
    assert pin_batch_only(x) is x  # no context: literally a no-op

    mesh = make_mesh_axes([("data", 4), ("space", 2)])
    # no space axis: context is inert
    with spatial_hints(mesh, "data", None):
        assert pin_batch_only(x) is x

    with spatial_hints(mesh, "data", "space"):
        def f(v):
            return pin_batch_only(v) * 2.0
        y = jax.jit(f)(x)
        # (trailing Nones are normalized away in the reported spec)
        assert y.sharding.spec in (P("data"), P("data", None, None, None))
        np.testing.assert_array_equal(np.asarray(y), 2.0 * np.asarray(x))
    # context popped
    assert pin_batch_only(x) is x
