"""Feed-path attribution for the loop-vs-step throughput gap (round 5).

BASELINE.md round-5 loop rows show the real driver delivering 1557 img/s
at the headline config while the step bench (bench.py — identical
`train_instance` calls on fixed device-resident batches) reaches ~2250.
The loop differs only in the FEED: per step it (a) builds index vectors on
the host, (b) dispatches two separate on-device fancy-index gathers
(`data_A[idx]`, reference dataloader.py:112-155 batch semantics), then
(c) calls the jitted step.  Each extra dispatch crosses the tunnel.

Rows (same model/state/config as bench.py, batch 128 bf16 64px):
  fixed      — step on fixed device arrays (bench.py replica, control)
  gather2    — per-step: two separate device gathers, then step (what the
               driver's --device_data feed does today)
  fused      — per-step: ONE jitted call taking (state, data_A, data_B,
               idxA, idxB, ...) that gathers in-graph and steps; index
               vectors ride the call as tiny numpy args

If fused ~= fixed > gather2, the gap is dispatch overhead and the driver
should fold the gather into the step program.

Usage: python -m benchmarks.feed_bench [--steps 60] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

BATCH = 128
SIZE = 64
N_DATA = 3072


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--out", default="benchmarks/results/feed.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from domain_transfer_gan_tpu.config import TrainConfig
    from domain_transfer_gan_tpu.models import create_model

    cfg = TrainConfig(model="aug_cycle_gan", grid_size=SIZE, batchSize=BATCH,
                      ngf=32, nef=32, ndf=64, nlatent=16,
                      use_pallas=False, compute_dtype="bfloat16",
                      monitor_gnorm=True, seed=0)
    cfg.expr_dir = ""
    model = create_model(cfg, testing=True, image_size=SIZE)

    host_rng = np.random.RandomState(0)
    data_A = jax.device_put(host_rng.uniform(
        -1, 1, (N_DATA, SIZE, SIZE, 3)).astype(np.float32))
    data_B = jax.device_put(host_rng.uniform(
        -1, 1, (N_DATA, SIZE, SIZE, 3)).astype(np.float32))
    fixed_A, fixed_B = data_A[:BATCH], data_B[:BATCH]

    def batch_idx():
        return (host_rng.randint(0, N_DATA, BATCH).astype(np.int32),
                host_rng.randint(0, N_DATA, BATCH).astype(np.int32))

    # the driver's indexed step (models/api.py train_instance_indexed)
    # gathers in-graph; fall back to a local wrapper if running against an
    # older checkout
    results = {}

    def measure(name, fn):
        for _ in range(args.warmup):
            losses = fn()
        float(losses["D_A"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            losses = fn()
        float(losses["D_A"])
        dt = time.perf_counter() - t0
        ips = args.steps * BATCH / dt
        results[name] = {"img_per_sec": round(ips, 1),
                         "ms_per_step": round(1e3 * dt / args.steps, 2)}
        print(json.dumps({name: results[name]}), flush=True)

    measure("fixed", lambda: model.train_instance(fixed_A, fixed_B)[0])

    def gather2():
        ia, ib = batch_idx()
        return model.train_instance(data_A[ia], data_B[ib])[0]

    measure("gather2", gather2)

    if hasattr(model, "train_instance_indexed"):
        def fused():
            ia, ib = batch_idx()
            return model.train_instance_indexed(data_A, data_B, ia, ib)[0]

        measure("fused", fused)

    # sync-cadence sweep: the same fused step, but host-fetching a loss
    # every K steps (the driver's print_freq window sync).  CAVEAT: these
    # rows are tunnel-latency-bound and the tunnel's service quality is
    # time-varying — in the round-5 session the K-rows returned
    # mutually-inconsistent values (sync24 slower than sync1) while the
    # 60-step-horizon rows above reproduced within 0.5% across runs.
    # Treat K-row output as a tunnel-health probe, not a framework number.
    for k_sync in (24, 8, 1):
        def synced(k=k_sync):
            for _ in range(k - 1):
                ia, ib = batch_idx()
                model.train_instance_indexed(data_A, data_B, ia, ib)
            ia, ib = batch_idx()
            losses = model.train_instance_indexed(data_A, data_B, ia, ib)[0]
            float(losses["D_A"])
            return losses

        steps_saved = args.steps
        args.steps = max(args.steps // k_sync, 4)
        try:
            measure("fused_sync%d" % k_sync, synced)
            # rescale: each call ran k steps
            r = results["fused_sync%d" % k_sync]
            r["img_per_sec"] = round(r["img_per_sec"] * k_sync, 1)
            r["ms_per_step"] = round(r["ms_per_step"] / k_sync, 2)
        finally:
            args.steps = steps_saved

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
