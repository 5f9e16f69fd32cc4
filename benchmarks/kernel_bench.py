"""Microbenchmark: Pallas fused instance-norm kernels vs pure-XLA, on the
real device.  Proves the native-tier fusion is >= the XLA baseline (SURVEY.md
§7 step 8) and records where the fallback threshold should sit.

Run: python benchmarks/kernel_bench.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from domain_transfer_gan_tpu.nn.norms import instance_norm_xla
from domain_transfer_gan_tpu.ops.pallas import instance_norm_pallas
from domain_transfer_gan_tpu.ops.pallas.instance_norm import pallas_supported


def _sync(out):
    # host-fetch one element: jax.block_until_ready can return early on
    # this environment's tunneled TPU backend (~5x throughput inflation)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def bench_case(n, h, w, c, per_sample, relu, with_grad):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    if per_sample:
        scale = jnp.asarray(rng.rand(n, c).astype(np.float32))
        shift = jnp.asarray(rng.randn(n, c).astype(np.float32))
    else:
        scale = jnp.asarray(rng.rand(c).astype(np.float32))
        shift = jnp.asarray(rng.randn(c).astype(np.float32))

    if with_grad:
        @jax.jit
        def f_pallas(x, s, b):
            return jax.grad(lambda x: jnp.sum(
                instance_norm_pallas(x, s, b, unbiased=per_sample,
                                     relu=relu)))(x)

        @jax.jit
        def f_xla(x, s, b):
            return jax.grad(lambda x: jnp.sum(
                instance_norm_xla(x, s, b, 1e-5, per_sample, relu=relu)))(x)
    else:
        @jax.jit
        def f_pallas(x, s, b):
            return instance_norm_pallas(x, s, b, unbiased=per_sample,
                                        relu=relu)

        @jax.jit
        def f_xla(x, s, b):
            return instance_norm_xla(x, s, b, 1e-5, per_sample, relu=relu)

    tp = timeit(f_pallas, x, scale, shift)
    tx = timeit(f_xla, x, scale, shift)
    return tp, tx


def main():
    cases = [
        # (N, H, W, C): generator-shaped workloads at ngf=32 and ngf=64
        (32, 32, 32, 128),
        (32, 32, 32, 256),
        (32, 64, 64, 32),
        (32, 64, 64, 64),
        (128, 32, 32, 128),
    ]
    results = []
    for shape in cases:
        n, h, w, c = shape
        for per_sample in (False, True):
            for with_grad in (False, True):
                tp, tx = bench_case(n, h, w, c, per_sample, True, with_grad)
                results.append({
                    "shape": shape, "cin": per_sample, "grad": with_grad,
                    "pallas_us": round(tp * 1e6, 1),
                    "xla_us": round(tx * 1e6, 1),
                    "speedup": round(tx / tp, 3),
                    "pallas_active": pallas_supported(h * w, c),
                })
                print(json.dumps(results[-1]))
    wins = [r for r in results if r["pallas_active"]]
    if wins:
        g = np.exp(np.mean(np.log([r["speedup"] for r in wins])))
        print(json.dumps({"geomean_speedup_active_cases": round(float(g), 3),
                          "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
