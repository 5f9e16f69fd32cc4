"""Step-time attribution for the aug_cycle_gan train step (VERDICT r1
item 4: decide the native/Pallas tier with measurement, not guesswork).

xprof is not reachable through this environment's tunneled TPU backend, so
the evidence is assembled from three measurable angles:

1. compiled-program cost analysis (FLOPs, bytes accessed) -> MFU/roofline,
2. wall-clock attribution: each sub-network's forward (and the G forwards'
   backward via value_and_grad) timed standalone at the same batch,
3. an HLO fusion histogram of the compiled step (what XLA actually emits).

Run:  python -m benchmarks.step_analysis [batch] [dtype]
"""

from __future__ import annotations

import collections
import json
import re
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

SIZE = 64


def _sync(out):
    # host-fetch ONE element of the first output leaf: block_until_ready
    # lies on this backend, and fetching a full tensor over the tunnel
    # would dominate the measurement
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])


def timed(fn, *args, iters=30, warmup=3):
    """Times fn with a single-element host fetch as the sync point; fn may
    return a scalar, tensor, or pytree."""
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


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
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.uniform(-1, 1, (batch, SIZE, SIZE, 3)).astype(np.float32))
    B = jnp.asarray(rng.uniform(-1, 1, (batch, SIZE, SIZE, 3)).astype(np.float32))
    z = jnp.zeros((batch, cfg.nlatent), jnp.float32)

    report = {"batch": batch, "dtype": dtype}

    # --- full step wall clock + cost analysis ---------------------------
    def full_step(a, b):
        losses, _, _ = m.train_instance(a, b)
        return losses["D_A"]

    report["full_step_ms"] = 1e3 * timed(full_step, A, B, iters=30)
    compiled = m._train_step.lower(m.state, A, B, z, jnp.float32(cfg.lr),
                                   jnp.float32(cfg.lr / 5.0),
                                   jax.random.PRNGKey(0)).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))
    byts = float(ca.get("bytes accessed", float("nan")))
    step_s = report["full_step_ms"] / 1e3
    report["flops_per_step"] = flops
    report["bytes_accessed_per_step"] = byts
    report["mfu_vs_197tflops_bf16"] = flops / step_s / 197e12
    report["roofline_ms_hbm_819gbps"] = 1e3 * byts / 819e9

    # --- HLO fusion histogram -------------------------------------------
    hlo = compiled.as_text()
    hist = collections.Counter()
    for line in hlo.splitlines():
        mm = re.search(r"= \S+ (fusion|convolution|custom-call|copy|"
                       r"all-reduce|reduce|dot)\(", line)
        if mm:
            hist[mm.group(1)] += 1
    report["hlo_op_histogram"] = dict(hist)

    # --- per-component forwards (jitted standalone) ----------------------
    comps = {}

    def fwd(name, *args):
        f = jax.jit(lambda p, s, *xs: apply_net(m.nets[name], p, s, *xs)[0])
        return timed(f, m.state.params[name], m.state.batch_stats[name], *args)

    comps["G_A_B fwd"] = fwd("netG_A_B", A, z)
    comps["G_B_A fwd"] = fwd("netG_B_A", B)
    comps["D_A fwd"] = fwd("netD_A", A)
    comps["D_B fwd"] = fwd("netD_B", B)
    enc_in = jnp.concatenate([A, B], axis=-1)
    comps["E_B fwd"] = fwd("netE_B", enc_in)

    # G fwd+bwd: grad of a scalar through one generator forward
    def g_loss(p, a, zz):
        y, _ = apply_net(m.nets["netG_A_B"], p, m.state.batch_stats["netG_A_B"],
                         a, zz)
        return jnp.mean(y * y)
    gf = jax.jit(jax.grad(g_loss))
    comps["G_A_B fwd+bwd"] = timed(gf, m.state.params["netG_A_B"], A, z)

    report["component_ms"] = {k: 1e3 * v for k, v in comps.items()}
    # the step runs: 3 G-scale fwds in phase 0 (kept via vjp), D phase
    # fwd+bwd over 2 image Ds (2x batch) + latent D, G phase: cycle fwds
    # (2 G-scale) + full backward through ~5 G-scale forwards + 2 D-scale.
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dt = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    main(b, dt)
