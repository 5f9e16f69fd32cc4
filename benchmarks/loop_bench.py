"""Loop-level throughput (VERDICT r3 weak #4): the step bench (bench.py)
times the two-phase train step on device-resident arrays; this benchmark
measures what the user actually gets — the REAL train driver
(cli/train.py:train_model) at the headline config (bf16, batch 128, 64px).
Reference anchor: the host-side loop it replaces, reference train.py:185-249.

Method: per row, a 1-epoch warmup drive populates the persistent compile
cache, then one LONG drive (12 epochs) runs with ``--print_freq`` set to
once per epoch — each print calls ``timer.window(sync_array=losses[...])``,
i.e. an in-process, float-precision, host-synced window measurement of that
epoch's delivered img/s (steps + any eval/save work since the previous
print).  The row reports the MEDIAN over epochs 3..12, excluding the first
two epochs, which pay one-time costs no steady-state user sees (dataset
upload, executable upload through the tunnel, first best-checkpoint saves).

Rows:
  * device_feed     — the default TPU-native feed (--device_data: train set
    pinned in HBM once, on-device batch gather), eval cadences off;
    directly comparable to bench.py's step number.
  * device_feed_eval — same, at the reference's own eval cadence
    (eval_A_freq=1, eval_B_freq=1, reference train.py:256-305): delivered
    img/s including evaluation overhead.
  * host_feed       — --device_data 0: per-batch host->HBM transfers
    (double-buffered prefetch), eval off.  This is the feed the step bench
    can't see; the device_feed/host_feed ratio is the tunnel-transfer tax.

Usage: python -m benchmarks.loop_bench [--out benchmarks/results/loop.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import tempfile
import time

N_TRAIN = 3272          # -> 3072 train imgs after the 200-sample dev split
LONG_EPOCHS = 12
SKIP_EPOCHS = 2         # excluded from the median (one-time upload costs)
BATCH = 128
SIZE = 64

ROWS = {
    #                (device_data, eval_on)
    "device_feed":      (-1, False),
    "device_feed_eval": (-1, True),
    "host_feed":        (0, False),
}


def _argv(dataroot, ckdir, name, epochs, eval_on, device_data, print_freq):
    argv = ["--dataroot", dataroot, "--name", name,
            "--checkpoints_dir", ckdir,
            "--grid_size", str(SIZE), "--batchSize", str(BATCH),
            "--ngf", "32", "--nef", "32", "--ndf", "64", "--nlatent", "16",
            "--niter", str(epochs), "--niter_decay", "0",
            "--compute_dtype", "bfloat16", "--use_pallas", "0",
            "--seed", "11", "--num_devices", "1",
            "--display_freq", "0", "--save_epoch_freq", "0",
            "--print_freq", str(print_freq),
            "--device_data", str(device_data)]
    if not eval_on:
        argv += ["--eval_A_freq", "0", "--eval_B_freq", "0"]
    return argv


def run_row(dataroot, ckdir, row):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from domain_transfer_gan_tpu.cli.train import train_model

    device_data, eval_on = ROWS[row]
    train_imgs = (N_TRAIN - 200) // BATCH * BATCH  # full batches per epoch

    def drive(epochs, name, print_freq=0):
        t0 = time.perf_counter()
        train_model(argv=_argv(dataroot, ckdir, name, epochs, eval_on,
                               device_data, print_freq))
        return time.perf_counter() - t0

    drive(1, row + "_warm")              # compile-cache warmup
    t_long = drive(LONG_EPOCHS, row + "_l", print_freq=train_imgs)

    # the driver's own host-synced windowed throughput, one line per epoch
    log = open(os.path.join(ckdir, row + "_l", "results.txt")).read()
    ips = [float(m) for m in
           re.findall(r"throughput: ([0-9.]+) images/sec", log)]
    assert len(ips) == LONG_EPOCHS, (len(ips), log[-500:])
    steady = sorted(ips[SKIP_EPOCHS:])
    median = steady[len(steady) // 2]
    return {"row": row, "img_per_sec": round(median, 1),
            "per_epoch_img_per_sec": [round(x, 1) for x in ips],
            "t_long_s": round(t_long, 2), "epochs": LONG_EPOCHS,
            "train_imgs_per_epoch": train_imgs}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/results/loop.json")
    ap.add_argument("--rows", default=",".join(ROWS))
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
            r = run_row(dataroot, ckdir, row)
        finally:
            shutil.rmtree(ckdir, ignore_errors=True)
        print(json.dumps(r), flush=True)
        results["rows"].append(r)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
