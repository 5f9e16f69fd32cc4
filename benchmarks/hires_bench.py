"""High-resolution capability benchmark: full two-phase aug_cycle_gan train
step at 128x128 and 256x256 (the reference's --grid_size default is 256,
options.py:30, although its eval constants assume 64 — quirk Q5), including
the 9-block generator option (the reference parses n_blocks=9 but hardcodes
3 — quirk Q1; this framework honors it).

Timing uses host-fetch synchronization (see BASELINE.md).

Usage: python -m benchmarks.hires_bench
"""

from __future__ import annotations

import time

import numpy as np

CONFIGS = (
    # (size, n_blocks, batch, dtype)
    (256, 3, 16, "bfloat16"),
    (256, 9, 16, "bfloat16"),
    (128, 3, 64, "bfloat16"),
)

WARMUP = 5
STEPS = 30


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from domain_transfer_gan_tpu.config import TrainConfig
    from domain_transfer_gan_tpu.models import create_model

    for size, blocks, batch, dtype in CONFIGS:
        cfg = TrainConfig(model="aug_cycle_gan", grid_size=size,
                          batchSize=batch, ngf=32, nef=32, ndf=64,
                          nlatent=16, n_blocks=blocks, use_pallas=False,
                          compute_dtype=dtype, monitor_gnorm=True, seed=0)
        cfg.expr_dir = ""
        model = create_model(cfg, testing=True, image_size=size)
        rng = np.random.RandomState(0)
        A = jnp.asarray(rng.uniform(-1, 1, (batch, size, size, 3))
                        .astype(np.float32))
        B = jnp.asarray(rng.uniform(-1, 1, (batch, size, size, 3))
                        .astype(np.float32))
        for _ in range(WARMUP):
            losses, _, _ = model.train_instance(A, B)
        float(losses["D_A"])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            losses, _, _ = model.train_instance(A, B)
        float(losses["D_A"])
        dt = time.perf_counter() - t0
        print("%dx%d blocks=%d b%d %s: %.0f img/s  %.1f ms/step"
              % (size, size, blocks, batch, dtype, STEPS * batch / dt,
                 1e3 * dt / STEPS), flush=True)


if __name__ == "__main__":
    main()
