"""Checkpoint migration CLI: reference PyTorch checkpoints <-> this framework.

Forward (default): read a checkpoint written by the reference's
``model.save`` (torch.save dict of per-net state_dicts + Adam states,
reference model.py:293-303/750-764) and write it as a native checkpoint this
framework's ``--continue_train`` / test CLI can load — parameters,
batch-norm running stats, and Adam moments included, so training resumes
where the reference run left off.

Reverse (``--export``): write a trained native checkpoint back out in the
reference's torch format.

The architecture config is restored from an ``opt.txt`` / ``opt.json`` /
``opt.pkl`` next to the checkpoint (the reference and this framework write
the same flag names, options.py:116-125), or from ``--opt``.

Usage:
  python -m domain_transfer_gan_tpu.cli.import_torch \
      --torch_chk /ref/checkpoints/exp/latest --out ./exp_jax/latest
  python -m domain_transfer_gan_tpu.cli.import_torch --export \
      --chk ./exp_jax/best_B --torch_out ./exp_torch/best_B
"""

from __future__ import annotations

import argparse
import os
import sys


def _restore_cfg(opt_path: str, chk_path: str):
    from ..config import load_train_config_from_expr_dir, parse_opt_file
    import dataclasses
    from ..config import TrainConfig

    if opt_path:
        if os.path.isdir(opt_path):
            return load_train_config_from_expr_dir(opt_path)
        d = parse_opt_file(opt_path)
        names = {f.name for f in dataclasses.fields(TrainConfig)}
        cfg = TrainConfig(**{k: v for k, v in d.items() if k in names})
        cfg.expr_dir = os.path.dirname(os.path.abspath(opt_path))
        return cfg
    return load_train_config_from_expr_dir(
        os.path.dirname(os.path.abspath(chk_path)))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--torch_chk", type=str, default="",
                    help="reference torch checkpoint to import")
    ap.add_argument("--out", type=str, default="",
                    help="output path for the imported native checkpoint "
                         "(default: <torch_chk>.jax)")
    ap.add_argument("--opt", type=str, default="",
                    help="opt.{txt,json,pkl} or experiment dir describing "
                         "the architecture (default: checkpoint's dir)")
    ap.add_argument("--no_optimizers", action="store_true",
                    help="import parameters/stats only, reset Adam state")
    ap.add_argument("--export", action="store_true",
                    help="reverse direction: native checkpoint -> torch")
    ap.add_argument("--chk", type=str, default="",
                    help="[--export] native checkpoint to export")
    ap.add_argument("--torch_out", type=str, default="",
                    help="[--export] output torch checkpoint path "
                         "(default: <chk>.pt)")
    args = ap.parse_args(argv)

    from ..models import create_model
    from ..utils.torch_interop import (export_torch_checkpoint,
                                       import_torch_checkpoint)

    if args.export:
        if not args.chk:
            ap.error("--export requires --chk")
        cfg = _restore_cfg(args.opt, args.chk)
        cfg.use_pallas = False
        model = create_model(cfg, testing=True)
        model.load(args.chk)
        out = args.torch_out or args.chk + ".pt"
        os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
        for line in export_torch_checkpoint(model, out):
            print(line)
        print("wrote torch checkpoint:", out)
        return 0

    if not args.torch_chk:
        ap.error("--torch_chk is required (or use --export)")
    cfg = _restore_cfg(args.opt, args.torch_chk)
    cfg.use_pallas = False
    model = create_model(cfg, testing=True)
    for line in import_torch_checkpoint(args.torch_chk, model,
                                        import_optimizers=not args.no_optimizers):
        print(line)
    out = args.out or args.torch_chk + ".jax"
    out = os.path.abspath(out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    expr_dir, chk_name = os.path.split(out)
    model.opt.expr_dir = expr_dir
    # a freshly-imported checkpoint has completed ZERO epochs here: the
    # payload's epoch marks the last COMPLETED epoch, and --continue_train
    # resumes at epoch+1, so record epoch_count-1 to train the full
    # schedule from the imported weights
    model.epoch = model.opt.epoch_count - 1
    model.save(chk_name)
    print("wrote native checkpoint:", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
