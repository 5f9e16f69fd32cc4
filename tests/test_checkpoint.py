"""Unit tests for the orbax subprocess-save path (multi-host writer).

`OrbaxCheckpointer._subprocess_save` is the branch multi-host saves take
(models/api.py gathers to host numpy, then each rank writes through a
fresh single-process interpreter — utils/_orbax_write).  The method itself
is process-count agnostic, so it is driven directly here without a
cluster."""

import glob
import os

import numpy as np

from domain_transfer_gan_tpu.utils.checkpoint import OrbaxCheckpointer


def test_subprocess_save_roundtrip(tmp_path):
    ck = OrbaxCheckpointer()
    payload = {"a": np.arange(5.0), "b": {"c": np.ones((2, 2))}}
    path = str(tmp_path / "ck" / "latest")
    ck._subprocess_save(path, payload, async_save=False)
    got = ck.restore(path, payload)
    assert np.allclose(got["a"], payload["a"])
    assert np.allclose(got["b"]["c"], 1.0)
    # the staging pickle is cleaned up after a successful write
    assert not glob.glob(path + ".staging*")


def test_async_saves_to_same_path_serialize(tmp_path):
    """Regression: back-to-back async saves to the SAME checkpoint name
    (the every-epoch 'latest' pattern) used to share one fixed staging
    file — save N+1 could truncate the pickle save N's child was reading,
    or the N child's cleanup could delete N+1's staging before it was
    read.  Saves now stage through unique mkstemp files and a new save
    waits for the in-flight writer of the same path; the LAST payload
    must win and no staging files may leak."""
    ck = OrbaxCheckpointer()
    path = str(tmp_path / "ck" / "latest")
    last = None
    for i in range(3):
        last = {"a": float(i) * np.arange(5.0), "step": np.int64(i)}
        ck._subprocess_save(path, last, async_save=True)
    ck.wait()
    got = ck.restore(path, last)
    assert np.allclose(got["a"], last["a"])
    assert int(got["step"]) == 2
    assert not glob.glob(os.path.join(os.path.dirname(path),
                                      "latest.staging*"))


def test_sync_flax_save_is_atomic(tmp_path, monkeypatch):
    """A failure mid-save must leave the previous checkpoint intact: the
    sync flax path used to open(chk_path,'wb') directly, truncating
    'latest' before the payload was even serialized — a crash there
    bricked resume.  Saves now publish via temp+rename."""
    import pytest

    from domain_transfer_gan_tpu.config import TrainConfig
    from domain_transfer_gan_tpu.models import api as api_mod
    from domain_transfer_gan_tpu.models import create_model

    cfg = TrainConfig(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4,
                      ndf=4, nlatent=8, use_pallas=False, seed=13)
    cfg.expr_dir = str(tmp_path)
    m = create_model(cfg, testing=True)
    m.save("latest")
    chk = tmp_path / "latest"
    good = chk.read_bytes()
    assert good  # a real payload landed

    def boom(payload):
        raise RuntimeError("simulated crash mid-serialization")

    monkeypatch.setattr(api_mod.serialization, "to_bytes", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        m.save("latest")
    assert chk.read_bytes() == good  # previous checkpoint untouched
    assert not os.path.exists(str(chk) + ".tmp")  # no staging leak
