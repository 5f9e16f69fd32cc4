"""HTTP serving endpoint (cli/serve.py) over an exported artifact: round
trip through a real ThreadingHTTPServer on an ephemeral port must match
the exported function, handle tail-batch padding/chunking, explicit and
server-sampled z, and reject malformed payloads."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from domain_transfer_gan_tpu.cli.export import export_model, load_exported
from domain_transfer_gan_tpu.cli.serve import build_server
from domain_transfer_gan_tpu.config import TrainConfig
from domain_transfer_gan_tpu.models import create_model


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    out = tmp_path_factory.mktemp("export")
    cfg = TrainConfig(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4,
                      ndf=4, nlatent=8, use_pallas=False, seed=11)
    cfg.expr_dir = ""
    m = create_model(cfg, testing=True)
    export_model(m, str(out), batch=4)
    srv = build_server(str(out), port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield str(out), "http://127.0.0.1:%d" % srv.server_address[1]
    srv.shutdown()


def _post(url, arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(url, data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=60) as resp:
        return np.load(io.BytesIO(resp.read()))


def test_serve_manifest(served):
    _, base = served
    with urllib.request.urlopen(base + "/", timeout=30) as resp:
        manifest = json.loads(resp.read())
    assert manifest["batch"] == 4 and manifest["nlatent"] == 8
    assert set(manifest["functions"]) == {"predict_B", "predict_A"}
    assert manifest["platforms"] == ["cpu"]  # the test platform


def test_serve_rejects_platform_mismatch(served, tmp_path):
    """An artifact lowered for another platform fails at server BUILD time
    with a re-export hint, not with a 500 on every request (the bug the
    first end-to-end drive hit: TPU-exported artifact, CPU server)."""
    import shutil

    out, _ = served
    bad = tmp_path / "bad"
    shutil.copytree(out, bad)
    mani = json.loads((bad / "manifest.json").read_text())
    mani["platforms"] = ["tpu"]
    (bad / "manifest.json").write_text(json.dumps(mani))
    with pytest.raises(ValueError, match="--platforms"):
        build_server(str(bad), port=0)


def test_serve_matches_exported_fn(served):
    out, base = served
    rng = np.random.RandomState(0)
    A = rng.uniform(-1, 1, (4, 64, 64, 3)).astype(np.float32)
    z = rng.randn(4, 8).astype(np.float32)
    got = _post(base + "/predict_B", {"A": A, "z": z})
    want = np.asarray(load_exported(out, "predict_B")(jnp.asarray(A),
                                                      jnp.asarray(z)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_serve_pads_and_chunks_any_batch(served):
    out, base = served
    rng = np.random.RandomState(1)
    fn = load_exported(out, "predict_A")
    for n in (1, 3, 4, 7, 9):  # tail-pad below 4, chunk+pad above
        B = rng.uniform(-1, 1, (n, 64, 64, 3)).astype(np.float32)
        got = _post(base + "/predict_A", {"B": B})
        assert got.shape == (n, 64, 64, 3)
        pad = np.concatenate(
            [B, np.zeros((-n % 4, 64, 64, 3), np.float32)])
        want = np.concatenate([np.asarray(fn(jnp.asarray(pad[i:i + 4])))
                               for i in range(0, len(pad), 4)])[:n]
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_serve_samples_z_when_absent(served):
    _, base = served
    rng = np.random.RandomState(2)
    A = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    y1 = _post(base + "/predict_B", {"A": A})
    y2 = _post(base + "/predict_B", {"A": A})
    assert y1.shape == (2, 64, 64, 3)
    # fresh prior draws per request -> stochastically different outputs
    assert np.abs(y1 - y2).max() > 1e-6


def test_serve_concurrent_requests(served):
    """ThreadingHTTPServer handles parallel POSTs: 8 concurrent clients each
    get their own correct batch back (the compiled fn and the z-sampling rng
    are shared across handler threads)."""
    from concurrent.futures import ThreadPoolExecutor

    out, base = served
    fn = load_exported(out, "predict_B")
    rng = np.random.RandomState(5)
    batches = [(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32),
                rng.randn(2, 8).astype(np.float32)) for _ in range(8)]

    def call(ab):
        A, z = ab
        return _post(base + "/predict_B", {"A": A, "z": z})

    with ThreadPoolExecutor(max_workers=8) as ex:
        got = list(ex.map(call, batches))
    for (A, z), y in zip(batches, got):
        want = np.asarray(fn(jnp.asarray(np.concatenate(
            [A, np.zeros((2, 64, 64, 3), np.float32)])), jnp.asarray(
            np.concatenate([z, np.zeros((2, 8), np.float32)]))))[:2]
        np.testing.assert_allclose(y, want, rtol=1e-6, atol=1e-6)


def test_serve_rejects_bad_requests(served):
    _, base = served
    # malformed body
    req = urllib.request.Request(base + "/predict_B", data=b"not-an-npz",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    # missing required array
    buf = io.BytesIO()
    np.savez(buf, w=np.zeros((2, 8), np.float32))
    req = urllib.request.Request(base + "/predict_B", data=buf.getvalue(),
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    # wrong z shape
    buf = io.BytesIO()
    np.savez(buf, A=np.zeros((2, 64, 64, 3), np.float32),
             z=np.zeros((2, 5), np.float32))
    req = urllib.request.Request(base + "/predict_B", data=buf.getvalue(),
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    # wrong image shape is a 400 (not a 500 from inside the artifact)
    buf = io.BytesIO()
    np.savez(buf, A=np.zeros((2, 32, 32, 3), np.float32))
    req = urllib.request.Request(base + "/predict_B", data=buf.getvalue(),
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    # unknown path
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(base + "/nope", timeout=30)
    assert ei.value.code == 404


def test_export_dual_platform(tmp_path):
    """--platforms cpu tpu lowers one artifact servable on both; it must
    load and run on the CPU test platform and record both in the manifest."""
    cfg = TrainConfig(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4,
                      ndf=4, nlatent=8, use_pallas=False, seed=12)
    cfg.expr_dir = ""
    m = create_model(cfg, testing=True)
    manifest = export_model(m, str(tmp_path), batch=2,
                            platforms=["cpu", "tpu"])
    assert manifest["platforms"] == ["cpu", "tpu"]
    rng = np.random.RandomState(4)
    A = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    z = rng.randn(2, 8).astype(np.float32)
    got = np.asarray(load_exported(str(tmp_path), "predict_B")(
        jnp.asarray(A), jnp.asarray(z)))
    want = np.asarray(m.predict_B(jnp.asarray(A), jnp.asarray(z)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
