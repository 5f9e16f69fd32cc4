"""Typed experiment configuration + argparse shim.

Reproduces the reference CLI contract (options.py:15-144 in the reference):
same flag names, defaults, and choices, backed by a dataclass so the rest of
the framework gets typed, hashable (static) configuration. The experiment
directory artifact contract is preserved: ``opt.txt`` (human dump) and an
``opt.json`` machine dump (the reference wrote ``opt.pkl`` via cPickle,
options.py:123-125; JSON is the portable equivalent and ``opt.pkl`` is still
written for tooling that expects the name).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pickle
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


def create_sub_dirs(opt, sub_dirs):
    """mkdir + setattr(opt, name, path) (reference options.py:7-12)."""
    paths = {}
    for sub_dir in sub_dirs:
        dir_path = os.path.join(opt.expr_dir, sub_dir)
        os.makedirs(dir_path, exist_ok=True)
        setattr(opt, sub_dir, dir_path)
        paths[sub_dir] = dir_path
    return paths


@dataclass
class TrainConfig:
    """All training flags (reference options.py:20-85), plus TPU-native extras.

    Reference-inherited fields keep the exact reference names and defaults.
    New fields (marked NEW) gate TPU-specific behavior and the capabilities
    the reference declared but never wired (resume, Q10).
    """

    # required
    dataroot: str = ""
    name: str = ""
    checkpoints_dir: str = "./checkpoints/"

    # data
    input_nc: int = 3
    output_nc: int = 3
    grid_size: int = 256
    numpy_data: int = 1
    nThreads: int = 4            # referenced but never defined upstream (Q3); real here

    # exp
    seed: Optional[int] = None
    model: str = "aug_cycle_gan"   # {cycle_gan, stoch_cycle_gan, aug_cycle_gan}
    gpu_ids: str = "0"             # parsed for compat; device selection is JAX-native

    # supervised training
    supervised: bool = False
    sup_frac: float = 0.1
    lambda_sup_A: float = 0.1
    lambda_sup_B: float = 0.1

    # training
    batchSize: int = 32
    continue_train: bool = False   # actually wired here (reference Q10: parsed, dead)
    which_epoch: str = "latest"
    epoch_count: int = 1
    niter: int = 25
    niter_decay: int = 25
    beta1: float = 0.5
    lr: float = 2e-4

    # model
    ngf: int = 32
    nef: int = 32
    ndf: int = 64
    nlatent: int = 16
    which_model_netD: str = "basic"
    which_model_netG: str = "resnet"
    norm: str = "instance"         # {instance, batch}
    use_dropout: bool = False
    max_gnorm: float = 500.0
    stoch_enc: bool = False
    z_gan: int = 1
    enc_A_B: int = 1
    no_lsgan: bool = False
    lambda_A: float = 1.0
    lambda_B: float = 1.0
    lambda_z_B: float = 0.025

    # monitoring
    monitor_gnorm: bool = True
    display_freq: int = 5000
    print_freq: int = 100
    save_epoch_freq: int = 5
    num_multi: int = 10
    eval_A_freq: int = 1
    eval_B_freq: int = 1

    # ---- NEW: TPU-native knobs -------------------------------------------
    n_blocks: int = 3              # reference hardcodes 3 (Q1); honored here
    init_scheme: str = "reference"  # {reference, sane}: Q7 init quirks switch
    use_pallas: bool = False       # opt-in fused Pallas kernels for IN/CIN blocks
    compute_dtype: str = "float32"  # {float32, bfloat16} conv compute dtype
    data_axis: str = "data"        # mesh axis name for data parallelism
    num_devices: int = 0           # 0 = all visible devices
    spatial: int = 0               # >1: shard image H over a 2nd mesh axis
    #                                (data x space; GSPMD halo exchanges)
    tensor: int = 0                # >1: channel-shard params+Adam moments
    #                                over a 'model' mesh axis (tensor par.)
    pipeline: int = 0              # >1: GPipe the generator trunks over a
    #                                'pipe' mesh axis (parallel.pipeline);
    #                                requires n_blocks % pipeline == 0
    microbatches: int = 0          # pipeline microbatch count (0 = stages)
    host_devices: int = 0          # >0: force an N-virtual-device CPU
    #                                platform (drive SPMD without chips)
    dev_size: int = 200            # DEV_SIZE split (reference dataloader.py:11)
    legacy_eval_constants: bool = False  # reproduce Q5 hardcoded 3*64*64 consts
    profile_dir: str = ""          # if set, dump jax profiler traces here
    remat: bool = False            # rematerialize generator activations in bwd
    pool_size: int = 0             # buffered fake-image pool for D (0 = off)
    resize_antialias: int = 1      # 1 = skimage-parity Gaussian pre-filter on
    #                                downscale (reference dataloader.py:26-31);
    #                                0 = plain jax triangle-filter resize
    ckpt_backend: str = "flax"     # {flax, orbax}: single-file bytes vs
    #                                orbax checkpoint dirs (loads auto-detect)
    check_numerics: int = 0        # 1: debug sanitizer — per-step host check
    #                                that every loss is finite (raises with
    #                                the offending keys) + jax_debug_nans
    #                                for an op-level NaN traceback
    ema: float = 0.0               # >0: keep an exponential moving average
    #                                of the generator/encoder weights at this
    #                                decay (e.g. 0.999); eval/export can swap
    #                                them in (model.swap_ema)
    d_lr_mode: str = "reference"   # discriminator lr during decay (Q11):
    #                                "reference" — update_learning_rate sets
    #                                EVERY optimizer (incl. D) to the full
    #                                decayed lr (model.py:282-291,735-748:
    #                                the /5 discount exists only until decay
    #                                starts); "ratio" — keep D at lr/5 of
    #                                the decayed schedule throughout
    grad_accum: int = 1            # >1: gradient accumulation — run each
    #                                phase of the step over K sequential
    #                                microbatches inside one jitted program
    #                                (models/accum.py); effective batch =
    #                                batchSize at ~batchSize/K activation
    #                                memory.  Composes with dp/--remat; not
    #                                with --pool_size/--pipeline/batch norm
    device_data: int = -1          # training-set residency: 1 = pin the
    #                                numpy train arrays in HBM once and
    #                                gather batches ON DEVICE (only the
    #                                per-step index vectors cross the host
    #                                link — the TPU-native feed; numerics
    #                                identical to host feed), 0 = host feed
    #                                (per-batch host->HBM transfers),
    #                                -1 = auto (on when the train set is
    #                                in-memory numpy, fits the budget
    #                                below, and the run is single-host)
    device_data_max_gb: float = 2.0  # auto-mode HBM budget for the pinned
    #                                train set (v5e chips have 16 GB)
    coordinator: str = ""          # multi-host: "host:port" of process 0,
    #                                or "auto" (TPU-pod auto-detection)
    num_processes: int = 0         # multi-host: total process count
    process_id: int = -1           # multi-host: this process's rank

    # derived (filled by parse/finalize)
    expr_dir: str = ""
    use_sigmoid: bool = False      # set from no_lsgan (reference model.py:83,343)

    # vis sub-dirs get set as attributes by create_sub_dirs
    def __post_init__(self):
        self.use_sigmoid = self.no_lsgan

    @property
    def gpu_id_list(self) -> List[int]:
        out = []
        for s in str(self.gpu_ids).split(","):
            s = s.strip()
            if s and int(s) >= 0:
                out.append(int(s))
        return out

    def finalize(self, sub_dirs=None):
        """Create expr_dir, dump opt.txt/opt.json/opt.pkl, make vis dirs.

        Mirrors reference options.py:87-131.
        """
        self.use_sigmoid = self.no_lsgan
        self.expr_dir = os.path.join(self.checkpoints_dir, self.name)
        os.makedirs(self.expr_dir, exist_ok=True)

        args = {k: v for k, v in vars(self).items()}
        lines = ["------------ Options -------------"]
        for k in sorted(args):
            lines.append("%s: %s" % (str(k), str(args[k])))
        lines.append("-------------- End ----------------")
        with open(os.path.join(self.expr_dir, "opt.txt"), "wt") as f:
            f.write("\n".join(lines) + "\n")
        with open(os.path.join(self.expr_dir, "opt.json"), "wt") as f:
            json.dump(args, f, indent=2, default=str)
        with open(os.path.join(self.expr_dir, "opt.pkl"), "wb") as f:
            pickle.dump(args, f)

        if sub_dirs is not None:
            create_sub_dirs(self, sub_dirs)
        return self


class TrainOptions:
    """argparse shim with the exact reference flag surface (options.py:15-131)."""

    def __init__(self):
        self.parser = argparse.ArgumentParser()
        self.initialized = False

    def initialize(self):
        p = self.parser
        d = TrainConfig()  # pull defaults from the dataclass
        p.add_argument("--dataroot", type=str, required=True, help="path to data")
        p.add_argument("--name", type=str, required=True,
                       help="name of the experiment; decides where samples/models go")
        p.add_argument("--checkpoints_dir", type=str, default=d.checkpoints_dir)
        p.add_argument("--input_nc", type=int, default=d.input_nc)
        p.add_argument("--output_nc", type=int, default=d.output_nc)
        p.add_argument("--grid_size", type=int, default=d.grid_size)
        p.add_argument("--numpy_data", type=int, choices=[0, 1], default=d.numpy_data)
        p.add_argument("--nThreads", type=int, default=d.nThreads)
        p.add_argument("--seed", type=int, default=None)
        p.add_argument("--model", type=str, default=d.model,
                       choices=["cycle_gan", "stoch_cycle_gan", "aug_cycle_gan"])
        p.add_argument("--gpu_ids", type=str, default=d.gpu_ids)
        p.add_argument("--supervised", action="store_true")
        p.add_argument("--sup_frac", type=float, default=d.sup_frac)
        p.add_argument("--lambda_sup_A", type=float, default=d.lambda_sup_A)
        p.add_argument("--lambda_sup_B", type=float, default=d.lambda_sup_B)
        p.add_argument("--batchSize", type=int, default=d.batchSize)
        p.add_argument("--continue_train", action="store_true")
        p.add_argument("--which_epoch", type=str, default=d.which_epoch)
        p.add_argument("--epoch_count", type=int, default=d.epoch_count)
        p.add_argument("--niter", type=int, default=d.niter)
        p.add_argument("--niter_decay", type=int, default=d.niter_decay)
        p.add_argument("--beta1", type=float, default=d.beta1)
        p.add_argument("--lr", type=float, default=d.lr)
        p.add_argument("--ngf", type=int, default=d.ngf)
        p.add_argument("--nef", type=int, default=d.nef)
        p.add_argument("--ndf", type=int, default=d.ndf)
        p.add_argument("--nlatent", type=int, default=d.nlatent)
        p.add_argument("--which_model_netD", type=str, default=d.which_model_netD)
        p.add_argument("--which_model_netG", type=str, default=d.which_model_netG)
        p.add_argument("--norm", type=str, default=d.norm)
        p.add_argument("--use_dropout", action="store_true")
        p.add_argument("--max_gnorm", type=float, default=d.max_gnorm)
        p.add_argument("--stoch_enc", action="store_true")
        p.add_argument("--z_gan", type=int, default=d.z_gan, choices=[0, 1])
        p.add_argument("--enc_A_B", type=int, default=d.enc_A_B, choices=[0, 1])
        p.add_argument("--no_lsgan", action="store_true")
        p.add_argument("--lambda_A", type=float, default=d.lambda_A)
        p.add_argument("--lambda_B", type=float, default=d.lambda_B)
        p.add_argument("--lambda_z_B", type=float, default=d.lambda_z_B)
        p.add_argument("--monitor_gnorm", type=bool, default=d.monitor_gnorm)
        p.add_argument("--display_freq", type=int, default=d.display_freq)
        p.add_argument("--print_freq", type=int, default=d.print_freq)
        p.add_argument("--save_epoch_freq", type=int, default=d.save_epoch_freq)
        p.add_argument("--num_multi", type=int, default=d.num_multi)
        p.add_argument("--eval_A_freq", type=int, default=d.eval_A_freq)
        p.add_argument("--eval_B_freq", type=int, default=d.eval_B_freq)
        # TPU-native extras
        p.add_argument("--n_blocks", type=int, default=d.n_blocks)
        p.add_argument("--init_scheme", type=str, default=d.init_scheme,
                       choices=["reference", "sane"])
        p.add_argument("--use_pallas", type=int, choices=[0, 1], default=int(d.use_pallas))
        p.add_argument("--compute_dtype", type=str, default=d.compute_dtype,
                       choices=["float32", "bfloat16"])
        p.add_argument("--num_devices", type=int, default=d.num_devices)
        p.add_argument("--dev_size", type=int, default=d.dev_size)
        p.add_argument("--legacy_eval_constants", action="store_true")
        p.add_argument("--remat", action="store_true")
        p.add_argument("--pool_size", type=int, default=d.pool_size)
        p.add_argument("--resize_antialias", type=int, choices=[0, 1],
                       default=d.resize_antialias)
        p.add_argument("--spatial", type=int, default=d.spatial)
        p.add_argument("--tensor", type=int, default=d.tensor)
        p.add_argument("--pipeline", type=int, default=d.pipeline)
        p.add_argument("--microbatches", type=int, default=d.microbatches)
        p.add_argument("--host_devices", type=int, default=d.host_devices)
        p.add_argument("--check_numerics", type=int, choices=[0, 1],
                       default=d.check_numerics)
        p.add_argument("--ema", type=float, default=d.ema)
        p.add_argument("--grad_accum", type=int, default=d.grad_accum)
        p.add_argument("--d_lr_mode", type=str, default=d.d_lr_mode,
                       choices=["reference", "ratio"])
        p.add_argument("--device_data", type=int, choices=[-1, 0, 1],
                       default=d.device_data)
        p.add_argument("--device_data_max_gb", type=float,
                       default=d.device_data_max_gb)
        p.add_argument("--coordinator", type=str, default=d.coordinator)
        p.add_argument("--num_processes", type=int, default=d.num_processes)
        p.add_argument("--process_id", type=int, default=d.process_id)
        p.add_argument("--ckpt_backend", type=str, default=d.ckpt_backend,
                       choices=["flax", "orbax"])
        p.add_argument("--profile_dir", type=str, default=d.profile_dir)
        self.initialized = True

    def parse(self, sub_dirs=None, args=None) -> TrainConfig:
        if not self.initialized:
            self.initialize()
        ns = self.parser.parse_args(args)
        cfg = TrainConfig(**{k: v for k, v in vars(ns).items()
                             if k in {f.name for f in dataclasses.fields(TrainConfig)}})
        cfg.use_pallas = bool(ns.use_pallas)
        print("------------ Options -------------")
        for k, v in sorted(vars(cfg).items()):
            print("%s: %s" % (str(k), str(v)))
        print("-------------- End ----------------")
        return cfg.finalize(sub_dirs=sub_dirs)


@dataclass
class TestConfig:
    """Reference TestOptions (options.py:134-144)."""
    chk_path: str = ""
    res_dir: str = "test_res"
    train_logvar: int = 1
    dataroot: str = ""
    metric: str = "mse"  # {bpp, mse, visual, noise_sens, mvgauss, fid, z_div}
    use_ema: int = 0     # 1: score the EMA generator weights (--ema runs)
    fid_extractor: str = ""  # path to a jax.export-serialized feature
    #                          extractor (eval.fid.save_extractor) — e.g.
    #                          real Inception features; default: the
    #                          fixed-seed random-feature proxy
    host_devices: int = 0    # >0: force an N-virtual-device CPU platform
    #                          (evaluate without the accelerator; env vars
    #                          are unreliable in some environments)


class TestOptions:
    def __init__(self):
        self.parser = argparse.ArgumentParser()
        self.parser.add_argument("--chk_path", required=True, type=str,
                                 help="path to checkpoint; expr_dir is its parent")
        self.parser.add_argument("--res_dir", type=str, default="test_res")
        self.parser.add_argument("--train_logvar", type=int, default=1)
        self.parser.add_argument("--dataroot", required=True, type=str)
        self.parser.add_argument("--metric", required=True, type=str,
                                 choices=["bpp", "mse", "visual", "noise_sens",
                                          "mvgauss", "fid", "z_div"])
        self.parser.add_argument("--use_ema", type=int, choices=[0, 1],
                                 default=0)
        self.parser.add_argument("--fid_extractor", type=str, default="")
        self.parser.add_argument("--host_devices", type=int, default=0)

    def parse(self, args=None) -> TestConfig:
        ns = self.parser.parse_args(args)
        return TestConfig(**vars(ns))


def parse_opt_file(opt_path: str) -> dict:
    """Read a saved option dump (opt.json / opt.pkl / opt.txt).

    Mirrors reference test.py:311-343 (its opt.pkl/opt.txt reader) with JSON
    as the preferred format.
    """
    if opt_path.endswith(".json"):
        with open(opt_path) as f:
            return json.load(f)
    if opt_path.endswith(".pkl"):
        with open(opt_path, "rb") as f:
            return pickle.load(f)

    def parse_val(s):
        if s == "None":
            return None
        if s == "True":
            return True
        if s == "False":
            return False
        try:
            f = float(s)
        except ValueError:
            return s
        # non-finite floats and decimal notation stay float; everything
        # else round-trips through int when exact (int(inf) raises
        # OverflowError, int(nan) ValueError — neither means "string")
        if "." in s or f != f or f in (float("inf"), float("-inf")):
            return f
        i = int(f)
        return i if i == f else f

    opt = {}
    with open(opt_path) as f:
        for line in f:
            if line.startswith("-----"):
                continue
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            opt[k.strip()] = parse_val(v.strip())
    return opt


def load_train_config_from_expr_dir(expr_dir: str, **overrides) -> TrainConfig:
    """Restore a TrainConfig from a saved experiment dir (opt.json preferred)."""
    for fname in ("opt.json", "opt.pkl", "opt.txt"):
        path = os.path.join(expr_dir, fname)
        if os.path.exists(path):
            d = parse_opt_file(path)
            break
    else:
        raise FileNotFoundError("no opt.{json,pkl,txt} in %s" % expr_dir)
    names = {f.name for f in dataclasses.fields(TrainConfig)}
    kwargs = {k: v for k, v in d.items() if k in names}
    kwargs.update(overrides)
    cfg = TrainConfig(**kwargs)
    cfg.expr_dir = expr_dir
    return cfg
