"""Loop-level throughput (VERDICT r3 weak #4): the step bench (bench.py)
times the two-phase train step on device-resident arrays; this benchmark
measures what the user actually gets — the REAL train driver
(cli/train.py:train_model) at the headline config (bf16, batch 128, 64px),
with the native-loader-backed numpy feed, prefetch_to_device double
buffering, logging, and checkpoint/eval cadences.  Reference anchor: the
host-side loop it replaces, reference train.py:185-249.

Method: for each row, run the driver three times in one process —
a 1-epoch warmup (populates the persistent compile cache so the measured
runs pay identical near-zero compile time), then SHORT_EPOCHS and
LONG_EPOCHS runs — and report

    img/s = (LONG - SHORT) * train_images / (t_long - t_short)

The subtraction cancels everything that doesn't scale with epochs (data
load + normalize, model init, cached compile), leaving pure steady-state
loop throughput.  Two rows:

  * eval_off  — training loop only (eval/display/save cadences disabled);
    directly comparable to bench.py's step number.
  * eval_ref  — the reference's own cadence (eval_A_freq=1, eval_B_freq=1:
    per-epoch MSE_A + 50-step variational-UBO evals, train.py:256-305),
    i.e. delivered img/s including evaluation overhead.

Usage: python -m benchmarks.loop_bench [--out benchmarks/results/loop.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time

N_TRAIN = 3272          # -> 3072 train imgs after the 200-sample dev split
SHORT_EPOCHS = 2
LONG_EPOCHS = 10
BATCH = 128
SIZE = 64


def _argv(dataroot, ckdir, name, epochs, eval_on):
    argv = ["--dataroot", dataroot, "--name", name,
            "--checkpoints_dir", ckdir,
            "--grid_size", str(SIZE), "--batchSize", str(BATCH),
            "--ngf", "32", "--nef", "32", "--ndf", "64", "--nlatent", "16",
            "--niter", str(epochs), "--niter_decay", "0",
            "--compute_dtype", "bfloat16", "--use_pallas", "0",
            "--seed", "11", "--num_devices", "1",
            "--display_freq", "0", "--save_epoch_freq", "0",
            "--print_freq", "0"]
    if not eval_on:
        argv += ["--eval_A_freq", "0", "--eval_B_freq", "0"]
    return argv


def run_row(dataroot, ckdir, eval_on):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from domain_transfer_gan_tpu.cli.train import train_model

    tag = "evalref" if eval_on else "evaloff"
    train_imgs = (N_TRAIN - 200) // BATCH * BATCH  # full batches per epoch

    def drive(epochs, name):
        t0 = time.perf_counter()
        train_model(argv=_argv(dataroot, ckdir, name, epochs, eval_on))
        return time.perf_counter() - t0

    drive(1, tag + "_warm")              # compile-cache warmup
    t_short = drive(SHORT_EPOCHS, tag + "_s")
    t_long = drive(LONG_EPOCHS, tag + "_l")
    extra = (LONG_EPOCHS - SHORT_EPOCHS) * train_imgs
    ips = extra / (t_long - t_short)
    return {"row": tag, "img_per_sec": round(ips, 1),
            "t_short_s": round(t_short, 2), "t_long_s": round(t_long, 2),
            "epochs": [SHORT_EPOCHS, LONG_EPOCHS],
            "train_imgs_per_epoch": train_imgs,
            "sec_per_epoch_steady": round(
                (t_long - t_short) / (LONG_EPOCHS - SHORT_EPOCHS), 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/results/loop.json")
    ap.add_argument("--rows", default="eval_off,eval_ref")
    args = ap.parse_args()

    from domain_transfer_gan_tpu.data.synthetic import write_synthetic_dataset
    dataroot = "/tmp/loopbench_ds"
    if not os.path.exists(os.path.join(dataroot, "trainA.npz")):
        write_synthetic_dataset(dataroot, n_train=N_TRAIN, n_test=64,
                                size=SIZE, seed=11)

    results = {"config": {"batch": BATCH, "size": SIZE, "dtype": "bfloat16",
                          "n_train": N_TRAIN}, "rows": []}
    for row in args.rows.split(","):
        ckdir = tempfile.mkdtemp(prefix="loopbench_")
        try:
            r = run_row(dataroot, ckdir, eval_on=(row == "eval_ref"))
        finally:
            shutil.rmtree(ckdir, ignore_errors=True)
        print(json.dumps(r), flush=True)
        results["rows"].append(r)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
