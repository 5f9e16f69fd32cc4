"""Serving-export round trip: generators serialized to StableHLO via
jax.export must reproduce the live model's outputs after deserialization."""

import numpy as np

import jax.numpy as jnp

from domain_transfer_gan_tpu.cli.export import export_model, load_exported
from domain_transfer_gan_tpu.config import TrainConfig
from domain_transfer_gan_tpu.models import create_model


def tiny_model(**kw):
    base = dict(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4, ndf=4,
                nlatent=8, use_pallas=False, monitor_gnorm=False, seed=21)
    base.update(kw)
    cfg = TrainConfig(**base)
    cfg.expr_dir = ""
    return create_model(cfg, testing=True)


def test_export_roundtrip(tmp_path):
    m = tiny_model()
    manifest = export_model(m, str(tmp_path), batch=2)
    assert set(manifest["functions"]) == {"predict_B", "predict_A"}

    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    B = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    z = jnp.asarray(rng.randn(2, 8).astype(np.float32))

    pb = load_exported(str(tmp_path), "predict_B")
    pa = load_exported(str(tmp_path), "predict_A")
    np.testing.assert_allclose(np.asarray(pb(A, z)),
                               np.asarray(m.predict_B(A, z)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pa(B)),
                               np.asarray(m.predict_A(B)),
                               rtol=1e-5, atol=1e-5)
    assert (tmp_path / "manifest.json").exists()


def test_export_cycle_gan_bakes_unit_z(tmp_path):
    m = tiny_model(model="cycle_gan")
    export_model(m, str(tmp_path), batch=2)
    rng = np.random.RandomState(1)
    A = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    z = jnp.asarray(rng.randn(2, 8).astype(np.float32))
    pb = load_exported(str(tmp_path), "predict_B")
    # any z gives the deterministic output (z is forced to 1 internally)
    np.testing.assert_allclose(np.asarray(pb(A, z)),
                               np.asarray(pb(A, z * 3 + 1)),
                               rtol=1e-6, atol=1e-6)
