"""MXU stem/tail-conv channel-padding experiment (VERDICT r2 item 8).

Hypothesis under test: the MFU 0.41 plateau is partly caused by the
3-channel image convolutions (stem 3->ngf 7x7, tail ngf->3 7x7) under-
filling the 128x128 MXU, and zero-padding the 3-channel operand to 8/16
channels would speed them up (numerics-preserving at init: zero-filled
weight columns contribute nothing to the output; training-equivalent only
if gated).

Measurement methodology: a single conv here costs tens of microseconds
while one tunnel dispatch costs ~1 ms, so timing per-dispatch convs (the
first version of this file) measures only dispatch latency.  Instead each
case chains CHAIN serialized conv (or conv+grad) iterations inside ONE
jitted lax.fori_loop — the carry feeds each iteration's input from the
previous output so XLA cannot CSE or hoist them — and the whole program is
dispatched once, synchronized with a host fetch (block_until_ready returns
early on this tunneled backend — BASELINE.md).

Run (real TPU): python benchmarks/stem_pad_bench.py
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, HW = 128, 64      # the headline train config's batch and grid
NGF = 32
DT = jnp.bfloat16
CHAIN = 200          # convs per dispatch
REPS = 5             # timed dispatches (median reported)


def _time_once(fn, *args):
    out = fn(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / CHAIN


def conv(x, w):
    # bf16 in/out like the train step's convs (MXU accumulates fp32)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _chain(body):
    """CHAIN serialized body() iterations inside one jitted program;
    args[0] is the loop carry, the rest are closed-over operands."""
    def run(*args):
        def it(_, carry):
            return body(carry, *args[1:])
        return jax.lax.fori_loop(0, CHAIN, it, args[0])
    return jax.jit(run)


def stem_case(cin_pad):
    """Stem conv: image (B,64,64,3) -> (B,64,64,NGF), 7x7.

    cin_pad=0: as-is (in=3).  cin_pad=k: input zero-padded to k channels,
    weights carry k input channels (the padded columns are zero).  The
    carry is the 3-channel image, perturbed each iteration by a scalar of
    the conv output so the convs serialize."""
    rng = np.random.RandomState(0)
    x3 = jnp.asarray(rng.randn(B, HW, HW, 3), DT)
    cin = cin_pad or 3
    w = jnp.asarray(rng.randn(7, 7, cin, NGF) * 0.02, DT)

    def fwd(x, w):
        if cin_pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin - 3)))
        return conv(x, w)

    def body(x, w):
        y = fwd(x, w)
        return x * (1 + 1e-6 * jnp.mean(y).astype(DT))

    def gbody(carry, x):
        w, = carry
        g = jax.grad(lambda w: jnp.sum(fwd(x, w).astype(jnp.float32)))(w)
        return (w + 1e-8 * g.astype(DT),)

    fwd_s = _time_once(_chain(body), x3, w)
    bwd_s = _time_once(_chain(gbody), (w,), x3)
    return fwd_s, bwd_s


def tail_case(cout_pad):
    """Tail conv: (B,64,64,NGF) -> 3-channel image, 7x7.

    cout_pad=0: as-is (out=3).  cout_pad=k: k output channels then a slice
    back to 3 (the extra filters would be zero-initialized)."""
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(B, HW, HW, NGF), DT)
    cout = cout_pad or 3
    w = jnp.asarray(rng.randn(7, 7, NGF, cout) * 0.02, DT)

    def fwd(x, w):
        y = conv(x, w)
        return y[..., :3] if cout_pad else y

    def body(x, w):
        y = fwd(x, w)
        return x * (1 + 1e-6 * jnp.mean(y).astype(DT))

    def gbody(carry, x):
        w, = carry
        g = jax.grad(lambda w: jnp.sum(fwd(x, w).astype(jnp.float32)))(w)
        return (w + 1e-8 * g.astype(DT),)

    fwd_s = _time_once(_chain(body), x0, w)
    bwd_s = _time_once(_chain(gbody), (w,), x0)
    return fwd_s, bwd_s


def main():
    out = []
    for case, fn in (("stem_3toNGF", stem_case), ("tail_NGFto3", tail_case)):
        for pad in (0, 8, 16):
            fwd, fbwd = fn(pad)
            rec = {"case": case, "pad_to": pad or 3,
                   "fwd_us": 1e6 * fwd, "fwd_bwd_us": 1e6 * fbwd,
                   "chain": CHAIN, "batch": B}
            print(json.dumps(rec), flush=True)
            out.append(rec)
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "stem_pad.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
