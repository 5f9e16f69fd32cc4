"""Serving export: serialize the trained generators as StableHLO modules.

The reference has no deployment story (its checkpoints are pickled torch
state dicts, model.py:293-313); the TPU-native equivalent is `jax.export`:
each generator forward is traced at a fixed serving shape, the parameters
are baked in as constants, and the result is a self-contained serialized
StableHLO artifact that any JAX runtime (or XLA-compatible serving stack)
can load and run without the model code.

Usage:
  python -m domain_transfer_gan_tpu.cli.export \
      --chk_path checkpoints/exp1/latest --out exp1_export \
      [--batch 32] [--serve_dtype bfloat16] [--use_ema 1]

``--serve_dtype bfloat16`` re-traces the generators with bf16 compute for
TPU serving (~1.5-2x inference throughput, BASELINE.md) regardless of the
training dtype; the artifact's I/O contract stays float32 (inputs are cast
on entry, outputs cast back on exit).  ``--use_ema 1`` exports the EMA
shadow weights of a run trained with --ema.

Artifacts written under --out:
  predict_B.stablehlo   A + z -> fake_B   (the flagship CIN generator)
  predict_A.stablehlo   B -> fake_A
  manifest.json         shapes/dtypes/metadata for loaders

Round-trip loading: :func:`load_exported`.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_model(model, out_dir: str, batch: int = 32, platforms=None):
    """Serialize predict_B / predict_A at fixed shapes; returns manifest.

    ``platforms``: lowering platforms baked into the artifact (e.g.
    ``["cpu", "tpu"]`` for one artifact servable on both); default is the
    current backend only — an artifact exported on TPU will REFUSE to run
    on CPU and vice versa, so export for every platform you serve on.
    """
    os.makedirs(out_dir, exist_ok=True)
    opt = model.opt
    hw = opt.grid_size
    nets, params = model.nets, model.state.params
    stats = model.state.batch_stats

    def make_fn(name):
        net = nets[name]
        p, st = params[name], stats[name]

        def fn(*args):
            variables = {"params": p}
            if st:
                variables["batch_stats"] = st
            # positional train: remat-wrapped nets require it static;
            # the serving contract is float32 at the boundary whatever the
            # internal compute dtype (bf16 nets cast inputs themselves)
            return net.apply(variables, *args, False).astype(jnp.float32)

        return fn

    a_spec = jax.ShapeDtypeStruct((batch, hw, hw, opt.input_nc), jnp.float32)
    b_spec = jax.ShapeDtypeStruct((batch, hw, hw, opt.output_nc), jnp.float32)
    z_spec = jax.ShapeDtypeStruct((batch, opt.nlatent), jnp.float32)

    manifest = {"batch": batch, "grid_size": hw,
                "input_nc": opt.input_nc, "output_nc": opt.output_nc,
                "nlatent": opt.nlatent, "model": opt.model,
                "serve_dtype": opt.compute_dtype,
                "functions": {}}

    kw = {"platforms": list(platforms)} if platforms else {}

    fn_B = make_fn("netG_A_B")
    if getattr(model, "ignore_noise", False):
        raw_B = fn_B
        fn_B = lambda a, z: raw_B(a, jnp.ones_like(z))  # cycle_gan z==1
    exp_B = jax_export.export(jax.jit(fn_B), **kw)(a_spec, z_spec)
    manifest["platforms"] = list(exp_B.platforms)
    with open(os.path.join(out_dir, "predict_B.stablehlo"), "wb") as f:
        f.write(exp_B.serialize())
    manifest["functions"]["predict_B"] = {
        "args": [["A", list(a_spec.shape), "float32"],
                 ["z", list(z_spec.shape), "float32"]]}

    fn_A = make_fn("netG_B_A")
    exp_A = jax_export.export(jax.jit(fn_A), **kw)(b_spec)
    with open(os.path.join(out_dir, "predict_A.stablehlo"), "wb") as f:
        f.write(exp_A.serialize())
    manifest["functions"]["predict_A"] = {
        "args": [["B", list(b_spec.shape), "float32"]]}

    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_exported(out_dir: str, name: str):
    """Load a serialized generator; returns a callable over device arrays."""
    with open(os.path.join(out_dir, name + ".stablehlo"), "rb") as f:
        exp = jax_export.deserialize(f.read())
    return jax.jit(exp.call)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chk_path", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--serve_dtype", choices=["float32", "bfloat16"],
                    default=None, help="compute dtype to trace the serving "
                    "graphs with (default: the training compute_dtype)")
    ap.add_argument("--use_ema", type=int, choices=[0, 1], default=0,
                    help="export the EMA shadow weights (--ema runs)")
    ap.add_argument("--platforms", nargs="*", default=None,
                    help="lowering platforms baked into the artifact "
                         "(e.g. --platforms cpu tpu for one artifact "
                         "servable on both); default: current backend only")
    ap.add_argument("--host_devices", type=int, default=0,
                    help=">0: force an N-virtual-device CPU platform "
                         "(export without touching the TPU tunnel)")
    args = ap.parse_args(argv)

    if args.host_devices:
        from .train import _force_host_devices
        _force_host_devices(args.host_devices)

    from ..config import load_train_config_from_expr_dir
    from ..models import create_model

    expr_dir = os.path.dirname(args.chk_path)
    opt = load_train_config_from_expr_dir(expr_dir, dataroot=".", seed=0)
    opt.expr_dir = expr_dir
    # Pallas kernels are TPU-only custom calls — never bake them into a
    # portable StableHLO artifact (params are identical either way; same
    # rule as cli/import_torch.py)
    opt.use_pallas = False
    if args.serve_dtype:
        opt.compute_dtype = args.serve_dtype
    model = create_model(opt, testing=True, image_size=opt.grid_size)
    model.load(args.chk_path)
    if args.use_ema:
        if not model.state.ema:
            raise ValueError("--use_ema 1 needs a checkpoint trained with "
                             "--ema")
        model.swap_ema()
    manifest = export_model(model, args.out, batch=args.batch,
                            platforms=args.platforms)
    print("exported %s -> %s (%s)" % (args.chk_path, args.out,
                                      ", ".join(manifest["functions"])))


if __name__ == "__main__":
    main()
