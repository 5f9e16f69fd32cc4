"""Serving-export round trip: generators serialized to StableHLO via
jax.export must reproduce the live model's outputs after deserialization."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from domain_transfer_gan_tpu.cli.export import (
    export_model,
    load_exported,
    main as export_main,
)
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


def test_export_cli_serve_dtype_and_ema(tmp_path):
    """The export CLI's --serve_dtype re-traces with bf16 compute while the
    artifact's I/O contract stays float32, and --use_ema exports the EMA
    shadow weights (erroring without them)."""
    cfg = TrainConfig(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4,
                      ndf=4, nlatent=8, use_pallas=False, seed=21,
                      dataroot="/d", name="exp_srv", ema=0.9,
                      checkpoints_dir=str(tmp_path))
    cfg.finalize()
    m = create_model(cfg, testing=True)
    # make the EMA shadow distinguishable from the live params
    m.state = m.state.replace(ema=jax.tree_util.tree_map(
        lambda x: x * 0.5, m.state.ema))
    m.save("latest")
    chk = os.path.join(cfg.expr_dir, "latest")

    rng = np.random.RandomState(3)
    A = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    z = jnp.asarray(rng.randn(2, 8).astype(np.float32))

    out32 = tmp_path / "e32"
    outbf = tmp_path / "ebf"
    outema = tmp_path / "eema"
    export_main(["--chk_path", chk, "--out", str(out32), "--batch", "2"])
    export_main(["--chk_path", chk, "--out", str(outbf), "--batch", "2",
                 "--serve_dtype", "bfloat16"])
    export_main(["--chk_path", chk, "--out", str(outema), "--batch", "2",
                 "--use_ema", "1"])

    y32 = np.asarray(load_exported(str(out32), "predict_B")(A, z))
    ybf = np.asarray(load_exported(str(outbf), "predict_B")(A, z))
    yema = np.asarray(load_exported(str(outema), "predict_B")(A, z))
    assert y32.dtype == np.float32 and ybf.dtype == np.float32
    # bf16 trace approximates the fp32 one; EMA weights change the output
    np.testing.assert_allclose(ybf, y32, rtol=0.1, atol=0.05)
    assert np.abs(yema - y32).max() > 1e-4

    import json as _json
    mani = _json.load(open(os.path.join(str(outbf), "manifest.json")))
    assert mani["serve_dtype"] == "bfloat16"

    # --use_ema without EMA in the checkpoint is a clear error
    cfg2 = TrainConfig(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4,
                       ndf=4, nlatent=8, use_pallas=False, seed=21,
                       dataroot="/d", name="exp_noema",
                       checkpoints_dir=str(tmp_path))
    cfg2.finalize()
    m2 = create_model(cfg2, testing=True)
    m2.save("latest")
    with pytest.raises(ValueError, match="--ema"):
        export_main(["--chk_path", os.path.join(cfg2.expr_dir, "latest"),
                     "--out", str(tmp_path / "nope"), "--use_ema", "1"])


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
