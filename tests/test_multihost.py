"""Multi-host (multi-process) SPMD tests.

Two real OS processes, 4 virtual CPU devices each, joined into one global
8-device mesh via jax.distributed + the gloo CPU collectives backend.  The
reference has no multi-node capability (SURVEY.md §5); these tests prove
the framework's multihost tier (parallel/multihost.py) produces the same
losses as a single-process 8-device run on identical data.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from domain_transfer_gan_tpu.config import TrainConfig
from domain_transfer_gan_tpu.models import create_model
from domain_transfer_gan_tpu.parallel import DataParallel

from test_parallel import tiny_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import json, sys
    rank, nprocs, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_default_matmul_precision", "highest")
    # NO persistent compile cache here: with a cache, one rank can hit it
    # and reach the gloo rendezvous minutes before its still-compiling
    # peer, blowing gloo's fixed 30s KV timeout.  Symmetric fresh compiles
    # keep the ranks in lockstep.
    from domain_transfer_gan_tpu.parallel import DataParallel, multihost
    multihost.initialize("127.0.0.1:%d" % port, nprocs, rank)
    assert jax.process_count() == nprocs
    assert jax.device_count() == 4 * nprocs

    import numpy as np
    from domain_transfer_gan_tpu.config import TrainConfig
    from domain_transfer_gan_tpu.models import create_model

    cfg = TrainConfig(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4,
                      ndf=4, nlatent=8, batchSize=8, use_pallas=False,
                      monitor_gnorm=True, seed=1)
    cfg.expr_dir = ""
    model = create_model(cfg, testing=True, image_size=64)
    dp = DataParallel(model, num_devices=4 * nprocs)

    rng = np.random.RandomState(7)
    A = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    z = rng.randn(8, 8).astype(np.float32)

    l1, _, _ = dp.train_instance(A, B, z)
    l2, visuals, _ = dp.train_instance(A, B, z)

    # cross-host-sharded image output -> full global value on every host
    fake_B = multihost.to_host(visuals["fake_B"])
    assert fake_B.shape == (8, 64, 64, 3), fake_B.shape

    # tensor parallelism across hosts: params/moments channel-sharded over
    # a cross-process 'model' axis; checkpoint save must gather them
    import os
    cfg2 = TrainConfig(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4,
                       ndf=4, nlatent=8, batchSize=8, use_pallas=False,
                       monitor_gnorm=True, seed=1)
    cfg2.expr_dir = os.path.dirname(outfile)
    model2 = create_model(cfg2, testing=True, image_size=64)
    tp = DataParallel(model2, num_devices=4 * nprocs, tensor=2)
    l3, _, _ = tp.train_instance(A, B, z)
    tp.save("tp_latest_rank%d" % rank)
    reload_m = create_model(cfg2, testing=True, image_size=64)
    reload_m.load(os.path.join(cfg2.expr_dir, "tp_latest_rank%d" % rank))
    for a, b in zip(jax.tree_util.tree_leaves(reload_m.state.params),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(multihost.to_host,
                                               tp.state.params))):
        assert abs(float(np.mean(a)) - float(np.mean(b))) < 1e-6

    # --ckpt_backend orbax is honored by the multi-host save path: flip the
    # SAME already-compiled tensor-parallel model's backend (a third
    # model + train-step compile blew the worker timeout on a contended
    # core) and save again.  In multi-host runs the orbax backend is
    # process-LOCAL: the payload is host-gathered numpy and each rank
    # writes its own copy through a fresh single-process interpreter
    # (utils/_orbax_write — orbax's NumpyHandler only writes array data on
    # global process 0 in-process), rank-distinct names here mirroring the
    # flax sub-test / cli.train's per-rank expr dirs.
    tp.opt.ckpt_backend = "orbax"
    orbax_dir = os.path.join(cfg2.expr_dir, "tp_orbax_rank%d" % rank)
    tp.save("tp_orbax_rank%d" % rank)
    tp.wait_for_saves()
    assert os.path.isdir(orbax_dir), "orbax backend must write a directory"
    cfg3 = TrainConfig(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4,
                       ndf=4, nlatent=8, batchSize=8, use_pallas=False,
                       monitor_gnorm=True, seed=1, ckpt_backend="orbax")
    cfg3.expr_dir = cfg2.expr_dir
    reload3 = create_model(cfg3, testing=True, image_size=64)  # no compile
    reload3.load(orbax_dir)
    for a, b in zip(jax.tree_util.tree_leaves(reload3.state.params),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(multihost.to_host,
                                               tp.state.params))):
        assert abs(float(np.mean(a)) - float(np.mean(b))) < 1e-6

    if multihost.is_primary():
        out = {k: float(v) for k, v in l2.items()}
        out["fake_B_mean"] = float(np.mean(fake_B))
        out["tp_D_A"] = float(l3["D_A"])
        out["orbax_ok"] = 1.0
        with open(outfile, "w") as f:
            json.dump(out, f)

    # leave together: without a final rendezvous, per-rank wall-time skew on
    # a contended core lets one rank exit minutes early and time out the
    # distributed runtime's shutdown barrier on the other.  File-based (the
    # ranks share /tmp) rather than a collective, whose own gloo timeout the
    # same skew would blow.
    import time
    with open(outfile + ".done%d" % rank, "w") as f:
        f.write("1")
    for r in range(nprocs):
        while not os.path.exists(outfile + ".done%d" % r):
            time.sleep(1)
    # hit the distributed shutdown barrier NOW, while the ranks are aligned
    # — leaving it to interpreter teardown lets slow per-rank cleanup
    # (orbax async threads, array GC) skew past the barrier deadline
    jax.distributed.shutdown()
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_matches_single(tmp_path):
    # reference: the same two steps on the in-process 8-device mesh
    model = create_model(tiny_cfg(), testing=True)
    dp = DataParallel(model, num_devices=8)
    rng = np.random.RandomState(7)
    A = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    B = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    z = rng.randn(8, 8).astype(np.float32)
    dp.train_instance(A, B, z)
    ref, ref_visuals, _ = dp.train_instance(A, B, z)

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    outfile = tmp_path / "rank0.json"
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own 4-device platform
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # worker output goes to FILES, not pipes: a chatty rank can fill the
    # ~64KB pipe buffer while the test still waits on the other rank,
    # blocking its write() mid-step and deadlocking both sides of the
    # collective until the timeout — and files survive a timeout kill, so
    # the diagnostics below always have something to show
    import time
    logs = [tmp_path / f"rank{r}.log" for r in (0, 1)]
    fhs = [open(str(l), "wb") for l in logs]
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(r), "2", str(port), str(outfile)],
        env=env, cwd=REPO, stdout=fhs[r], stderr=subprocess.STDOUT)
        for r in (0, 1)]
    timed_out = []
    try:
        deadline = time.monotonic() + 1500
        for r, p in enumerate(procs):
            try:
                p.wait(timeout=max(1.0, deadline - time.monotonic()))
            except subprocess.TimeoutExpired:
                timed_out.append(r)
    finally:
        # timed-out/live workers must be reaped or they starve every
        # later compile on this core
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
        for fh in fhs:
            fh.close()
    outs = [l.read_text() for l in logs]
    assert not timed_out, "\n\n".join(
        [f"ranks {timed_out} timed out after 1500s"] +
        [f"=== rank {r} output ===\n{o}" for r, o in enumerate(outs)])
    # report every failed rank, not just the first: the root cause is often
    # an exception on one rank whose atexit hits the shutdown barrier early
    # and only *kills* the other — the first-failing output is the victim's
    failed = [(r, o) for r, (p, o) in enumerate(zip(procs, outs))
              if p.returncode != 0]
    assert not failed, "\n\n".join(
        f"=== rank {r} failed ===\n{o}" for r, o in failed)

    got = json.loads(outfile.read_text())
    for k, v in ref.items():
        assert np.isclose(float(v), got[k], rtol=2e-3, atol=2e-4), \
            f"{k}: single={float(v)} multihost={got[k]}"
    assert np.isclose(got["fake_B_mean"],
                      float(np.mean(np.asarray(ref_visuals["fake_B"]))),
                      rtol=2e-3, atol=2e-4)
    assert np.isfinite(got["tp_D_A"])  # cross-host tensor parallelism ran
    assert got["orbax_ok"] == 1.0  # multi-host orbax save/restore ran


def test_initialize_rejects_partial_flags():
    """A partial multi-host spec must fail loudly, not silently run
    single-process with every host believing it is primary."""
    from domain_transfer_gan_tpu.parallel import multihost
    with pytest.raises(ValueError):
        multihost.initialize("10.0.0.1:1234", 0, -1)   # no num_processes
    with pytest.raises(ValueError):
        multihost.initialize("", 2, 0)                 # no coordinator
    with pytest.raises(ValueError):
        multihost.initialize("10.0.0.1:1234", 2, 5)    # bad rank
    with pytest.raises(ValueError):
        # process_id alone proves multi-host intent: silently running
        # single-process would leave this rank clobbering the primary's
        # artifact dir on a shared FS
        multihost.initialize("", 0, 1)
    multihost.initialize("", 0, -1)  # single-process no-op
