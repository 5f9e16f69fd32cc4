"""Inference benchmarks: generator forward img/s and the batched multi-z
stochastic sweep (BASELINE.md metrics; BASELINE.json config 5).

Run: python -m benchmarks.infer_bench
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    from domain_transfer_gan_tpu.config import TrainConfig
    from domain_transfer_gan_tpu.models import create_model

    for dtype, batch in (("bfloat16", 256), ("float32", 256)):
        cfg = TrainConfig(model="aug_cycle_gan", grid_size=64, batchSize=batch,
                          ngf=32, nef=32, ndf=64, nlatent=16,
                          use_pallas=False, compute_dtype=dtype, seed=0)
        cfg.expr_dir = ""
        m = create_model(cfg, testing=True, image_size=64)
        rng = np.random.RandomState(0)
        A = jnp.asarray(rng.uniform(-1, 1, (batch, 64, 64, 3))
                        .astype(np.float32))
        z = m.sample_prior_z(batch)

        # plain generator forward
        for _ in range(5):
            out = m.predict_B(A, z)
        float(out[0, 0, 0, 0])
        steps = 50
        t0 = time.perf_counter()
        for _ in range(steps):
            out = m.predict_B(A, z)
        float(out[0, 0, 0, 0])
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"generator fwd img/s ({dtype}, b{batch})",
            "value": round(steps * batch / dt, 1),
            "ms_per_batch": round(1e3 * dt / steps, 2)}))

        # batched multi-z sweep: 16 z's per input in one forward
        num = 16
        small = A[:batch // num]
        multi_z = m.sample_prior_z(batch)
        for _ in range(3):
            out = m.generate_multi(small, multi_z)
        float(out[0, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(steps):
            out = m.generate_multi(small, multi_z)
        float(out[0, 0, 0, 0])
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"multi-z sweep outputs/s ({dtype}, {num} z per input)",
            "value": round(steps * batch / dt, 1),
            "ms_per_batch": round(1e3 * dt / steps, 2)}))

        # serving artifact: the jax.export StableHLO round trip must serve
        # at live-model speed (cli/export.py --serve_dtype path)
        if dtype == "bfloat16":
            import tempfile

            from domain_transfer_gan_tpu.cli.export import (
                export_model,
                load_exported,
            )
            with tempfile.TemporaryDirectory() as td:
                export_model(m, td, batch=batch)
                served = load_exported(td, "predict_B")
                for _ in range(5):
                    out = served(A, z)
                float(out[0, 0, 0, 0])
                t0 = time.perf_counter()
                for _ in range(steps):
                    out = served(A, z)
                float(out[0, 0, 0, 0])
                dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": f"exported StableHLO artifact img/s ({dtype}, "
                          f"b{batch})",
                "value": round(steps * batch / dt, 1),
                "ms_per_batch": round(1e3 * dt / steps, 2)}))


if __name__ == "__main__":
    main()
