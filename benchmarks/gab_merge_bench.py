"""Measure the double-batch CIN-generator merge hypothesis.

The aug/stoch train steps apply G_A->B twice per step with mutually
independent inputs (phase-0 `fake_B = G(real_A, prior_z)` and phase-2
`rec_B = G(fake_A, post_z)`, reference model.py:404 and :493) — with
per-sample norms those two calls could fuse into ONE forward at 2x batch,
exactly like the shipped concatenated discriminator scoring
(models/steps.py make_score_pair).  Whether that wins depends on the 2x-
batch conv efficiency at this geometry: the bf16 batch sweep already shows
b256 is LESS efficient than 2x b128 for the FULL step (BASELINE.md), so
measure the isolated G fwd/fwd+bwd tradeoff before restructuring.

Run:  python -m benchmarks.gab_merge_bench [batch] [dtype]
"""

from __future__ import annotations

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

from benchmarks.step_analysis import timed

SIZE = 64


def main(batch=128, dtype="bfloat16"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from domain_transfer_gan_tpu.config import TrainConfig
    from domain_transfer_gan_tpu.models import create_model
    from domain_transfer_gan_tpu.models.steps import apply_net

    cfg = TrainConfig(model="aug_cycle_gan", grid_size=SIZE, batchSize=batch,
                      ngf=32, nef=32, ndf=64, nlatent=16, use_pallas=False,
                      compute_dtype=dtype, monitor_gnorm=True, seed=0)
    cfg.expr_dir = ""
    m = create_model(cfg, testing=True, image_size=SIZE)
    net = m.nets["netG_A_B"]
    p0 = m.state.params["netG_A_B"]
    st = m.state.batch_stats["netG_A_B"]

    rng = np.random.RandomState(0)

    def img():
        return jnp.asarray(
            rng.uniform(-1, 1, (batch, SIZE, SIZE, 3)).astype(np.float32))

    A1, A2 = img(), img()
    z1 = jnp.asarray(rng.randn(batch, cfg.nlatent).astype(np.float32))
    z2 = jnp.asarray(rng.randn(batch, cfg.nlatent).astype(np.float32))
    A12 = jnp.concatenate([A1, A2], axis=0)
    z12 = jnp.concatenate([z1, z2], axis=0)

    report = {"batch": batch, "dtype": dtype}

    # forward only ---------------------------------------------------------
    def fwd_two(p, a1, zz1, a2, zz2):
        y1, _ = apply_net(net, p, st, a1, zz1)
        y2, _ = apply_net(net, p, st, a2, zz2)
        return jnp.mean(jnp.abs(y1)) + jnp.mean(jnp.abs(y2))

    def fwd_one(p, a, zz):
        y, _ = apply_net(net, p, st, a, zz)
        ya, yb = jnp.split(y, 2, axis=0)
        return jnp.mean(jnp.abs(ya)) + jnp.mean(jnp.abs(yb))

    f2 = jax.jit(fwd_two)
    f1 = jax.jit(fwd_one)
    report["fwd_two_calls_ms"] = 1e3 * timed(f2, p0, A1, z1, A2, z2)
    report["fwd_one_2x_ms"] = 1e3 * timed(f1, p0, A12, z12)

    # forward+backward (the in-step reality: both calls contribute to the
    # same G grad) ---------------------------------------------------------
    g2 = jax.jit(jax.grad(fwd_two))
    g1 = jax.jit(jax.grad(fwd_one))
    report["grad_two_calls_ms"] = 1e3 * timed(g2, p0, A1, z1, A2, z2)
    report["grad_one_2x_ms"] = 1e3 * timed(g1, p0, A12, z12)

    report["fwd_speedup_one_vs_two"] = (
        report["fwd_two_calls_ms"] / report["fwd_one_2x_ms"])
    report["grad_speedup_one_vs_two"] = (
        report["grad_two_calls_ms"] / report["grad_one_2x_ms"])
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dt = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    main(b, dt)
