"""--grad_accum at its stated purpose: 256x256 training, effective batch 32.

models/accum.py motivates gradient accumulation with 256px training (the
reference's literal --grid_size default, options.py:30): activations grow
16x with image area, so the fused step needs either --remat (fp32) or bf16
to fit batch 32 on one chip.  This bench measures what accumulation
actually buys/costs there (VERDICT r3 weak #1):

- img/s of the fused step vs --grad_accum K in {4, 8} at effective batch
  32, fp32 and bf16;
- the compiled program's device memory high-water mark (argument + temp
  bytes from XLA's memory_analysis) — the "fits" evidence;
- fp32 fused WITHOUT remat is the known-OOM configuration (BASELINE.md
  hires table), so the fp32 comparator runs with --remat, exactly the
  trade accumulation replaces.

Writes benchmarks/results/accum_256.json (one record per config).

Usage: python -m benchmarks.accum_bench [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

SIZE = 256
EFF_BATCH = 32
WARMUP = 3

PEAK_FLOPS = 197e12   # v5e bf16
PEAK_HBM = 819e9      # v5e HBM bytes/s
HBM_BYTES = 16e9      # v5e-1 HBM capacity


def run_config(dtype, k, remat, steps):
    import jax
    import jax.numpy as jnp

    from domain_transfer_gan_tpu.config import TrainConfig
    from domain_transfer_gan_tpu.models import create_model

    cfg = TrainConfig(model="aug_cycle_gan", grid_size=SIZE,
                      batchSize=EFF_BATCH, ngf=32, nef=32, ndf=64,
                      nlatent=16, use_pallas=False, compute_dtype=dtype,
                      monitor_gnorm=True, seed=0, remat=remat,
                      grad_accum=k)
    cfg.expr_dir = ""
    model = create_model(cfg, testing=True, image_size=SIZE)
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.uniform(-1, 1, (EFF_BATCH, SIZE, SIZE, 3))
                    .astype(np.float32))
    B = jnp.asarray(rng.uniform(-1, 1, (EFF_BATCH, SIZE, SIZE, 3))
                    .astype(np.float32))
    for _ in range(WARMUP):
        losses, _, _ = model.train_instance(A, B)
    float(losses["D_A"])
    t0 = time.perf_counter()
    for _ in range(steps):
        losses, _, _ = model.train_instance(A, B)
    float(losses["D_A"])
    dt = time.perf_counter() - t0
    step_s = dt / steps
    rec = {"size": SIZE, "eff_batch": EFF_BATCH, "dtype": dtype,
           "grad_accum": k, "remat": bool(remat),
           "images_per_sec": steps * EFF_BATCH / dt,
           "step_ms": 1e3 * step_s}
    try:
        z = jnp.zeros((EFF_BATCH, cfg.nlatent), jnp.float32)
        compiled = model._train_step.lower(
            model.state, A, B, z, jnp.float32(cfg.lr),
            jnp.float32(cfg.lr / 5.0), jax.random.PRNGKey(0)).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", float("nan")))
        byts = float(ca.get("bytes accessed", float("nan")))
        if flops == flops:
            rec.update(flops_per_step=flops,
                       mfu=flops / step_s / PEAK_FLOPS)
        if byts == byts:
            rec.update(bytes_per_step=byts,
                       hbm_gbps=byts / step_s / 1e9,
                       hbm_frac=byts / step_s / PEAK_HBM)
        ma = compiled.memory_analysis()
        if ma is not None:
            # the program's device-memory high-water mark: live arguments
            # + outputs + XLA temp allocations (activations live here)
            fields = {n: float(getattr(ma, n)) for n in
                      ("argument_size_in_bytes", "output_size_in_bytes",
                       "temp_size_in_bytes", "generated_code_size_in_bytes")
                      if hasattr(ma, n)}
            rec["memory_analysis"] = fields
            if fields:
                tot = sum(v for n, v in fields.items()
                          if n != "generated_code_size_in_bytes")
                rec["device_mem_gb"] = tot / 1e9
                rec["hbm_capacity_frac"] = tot / HBM_BYTES
    except Exception as e:
        rec["cost_analysis_error"] = repr(e)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--only", nargs="*", default=None,
                    help="restrict to configs named dtype:k (e.g. "
                         "float32:4 bfloat16:1)")
    args = ap.parse_args()

    # (dtype, grad_accum K, remat) — fp32 fused is only feasible WITH remat
    configs = [
        ("bfloat16", 1, False),
        ("bfloat16", 4, False),
        ("bfloat16", 8, False),
        ("float32", 1, True),
        ("float32", 4, False),
        ("float32", 8, False),
    ]
    out = []
    for dtype, k, remat in configs:
        if args.only is not None and ("%s:%d" % (dtype, k)) not in args.only:
            continue
        out.append(run_config(dtype, k, remat, args.steps))

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "accum_256.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            for rec in json.load(f):
                merged[(rec["dtype"], rec["grad_accum"])] = rec
    for rec in out:
        merged[(rec["dtype"], rec["grad_accum"])] = rec
    with open(path, "w") as f:
        json.dump(list(merged.values()), f, indent=1)
    print("wrote %s" % path)


if __name__ == "__main__":
    main()
