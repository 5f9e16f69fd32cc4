#!/usr/bin/env python
"""Benchmark harness: aug_cycle_gan training throughput on one chip.

Measures steady-state images/sec of the full two-phase train step (the
reference's hot loop, model.py:402-539) at 64x64, ngf=32/ndf=64/nef=32,
nlatent=16, LSGAN.  Headline = the fastest supported configuration
(bfloat16 conv compute, batch 128); the reference's default config
(fp32, batch 32) is also measured and reported on stderr.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": R}

vs_baseline compares against the PyTorch reference implementation measured
on this machine's CPU via benchmarks/torch_proxy.py (no CUDA GPU exists in
this environment; BASELINE.md records that no published numbers exist and a
local proxy must be measured).  The proxy number is cached in
BASELINE_MEASURED.json; delete it to re-measure.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")

# Headline config: best measured throughput configuration (bfloat16 conv
# compute, batch 128); see /tmp and BASELINE.md for the sweep.  The reference
# default config (fp32, batch 32) is also measured and reported on stderr.
BATCH = 128
SIZE = 64
DTYPE = "bfloat16"
WARMUP_STEPS = 8
MEASURE_STEPS = 60


def measure_tpu(batch=BATCH, dtype=DTYPE) -> dict:
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the two-phase step is a large program
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from domain_transfer_gan_tpu.config import TrainConfig
    from domain_transfer_gan_tpu.models import create_model

    cfg = TrainConfig(model="aug_cycle_gan", grid_size=SIZE, batchSize=batch,
                      ngf=32, nef=32, ndf=64, nlatent=16,
                      use_pallas=False, compute_dtype=dtype,
                      monitor_gnorm=True, seed=0)
    cfg.expr_dir = ""
    model = create_model(cfg, testing=True, image_size=SIZE)

    rng = np.random.RandomState(0)
    real_A = jnp.asarray(rng.uniform(-1, 1, (batch, SIZE, SIZE, 3))
                         .astype(np.float32))
    real_B = jnp.asarray(rng.uniform(-1, 1, (batch, SIZE, SIZE, 3))
                         .astype(np.float32))

    # NOTE: synchronize with an actual host fetch (float()), not
    # block_until_ready — on the tunneled TPU backend here the latter can
    # return before execution completes, inflating throughput ~5x.
    for _ in range(WARMUP_STEPS):
        losses, _, _ = model.train_instance(real_A, real_B)
    float(losses["D_A"])

    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        losses, _, _ = model.train_instance(real_A, real_B)
    float(losses["D_A"])
    dt = time.perf_counter() - t0

    imgs_per_sec = MEASURE_STEPS * batch / dt
    step_s = dt / MEASURE_STEPS
    res = {
        "images_per_sec": imgs_per_sec,
        "step_ms": 1e3 * step_s,
        "backend": jax.default_backend(),
        "batch": batch,
        "dtype": dtype,
    }
    # roofline view: compiled-program FLOPs / HBM bytes per step -> MFU and
    # achieved bandwidth (v5e peak: 197 TFLOP/s bf16, 819 GB/s HBM)
    try:
        z = jnp.zeros((batch, cfg.nlatent), jnp.float32)
        compiled = model._train_step.lower(
            model.state, real_A, real_B, z, jnp.float32(cfg.lr),
            jnp.float32(cfg.lr / 5.0), jax.random.PRNGKey(0)).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", float("nan")))
        byts = float(ca.get("bytes accessed", float("nan")))
        # only publish finite values: a missing cost-analysis key must not
        # leak NaN into the one-JSON-line driver contract (json.dumps
        # would emit the non-RFC-8259 token `NaN`)
        if flops == flops:
            res.update(flops_per_step=flops, mfu=flops / step_s / 197e12)
        if byts == byts:
            res.update(bytes_per_step=byts, hbm_gbps=byts / step_s / 1e9)
    except Exception as e:  # cost analysis is best-effort
        sys.stderr.write("cost analysis unavailable: %r\n" % (e,))
    return res


def load_or_measure_baseline() -> dict:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)
    sys.stderr.write("measuring torch-CPU reference proxy baseline...\n")
    from benchmarks.torch_proxy import measure_torch_proxy
    base = measure_torch_proxy(batch=BATCH, size=SIZE, steps=6)
    with open(BASELINE_FILE, "w") as f:
        json.dump(base, f, indent=2)
    return base


def _assert_backend_reachable(timeout: int = 300) -> None:
    """Fail fast (and loud) when the accelerator backend can't initialize.

    On this environment's tunneled TPU, a dead tunnel makes backend init
    HANG indefinitely rather than raise — probing in a crash-isolated
    subprocess turns a wedged bench run into an immediate clear error."""
    import subprocess
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout)
        if out.returncode == 0:
            sys.stderr.write("backend: %s\n" % out.stdout.strip())
            return
        msg = out.stderr.strip()[-500:]
    except subprocess.TimeoutExpired:
        msg = "backend init did not complete within %ds (dead tunnel?)" \
            % timeout
    sys.stderr.write("bench aborted: accelerator backend unreachable: %s\n"
                     % msg)
    sys.exit(2)


def main():
    _assert_backend_reachable()
    res = measure_tpu()
    try:
        base = load_or_measure_baseline()
        base_ips = base["images_per_sec"]
        vs = res["images_per_sec"] / base_ips
    except Exception as e:  # baseline failure must not kill the bench
        sys.stderr.write("baseline proxy unavailable: %r\n" % (e,))
        vs = float("nan")
    # the headline JSON line goes out first so a driver-side timeout on the
    # optional extra measurement below cannot lose it
    line = {
        "metric": "aug_cycle_gan 64x64 full train step images/sec/chip (bf16, b128)",
        "value": round(res["images_per_sec"], 2),
        "unit": "images/sec",
        "vs_baseline": (round(vs, 3) if vs == vs else None),
    }
    if "mfu" in res:
        line["mfu"] = round(res["mfu"], 4)
    if "bytes_per_step" in res:
        line["bytes_per_step"] = res["bytes_per_step"]
        line["hbm_gbps"] = round(res["hbm_gbps"], 1)
    print(json.dumps(line), flush=True)
    try:
        ref = measure_tpu(batch=32, dtype="float32")
        sys.stderr.write("reference-config (fp32, b32): %.0f img/s\n"
                         % ref["images_per_sec"])
    except Exception as e:
        sys.stderr.write("reference-config measurement failed: %r\n" % (e,))


if __name__ == "__main__":
    main()
