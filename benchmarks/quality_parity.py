"""Quality-parity harness (VERDICT r1 item 6): train the torch
reference-architecture proxy and the JAX/TPU stack to convergence on the
SAME synthetic dataset with the SAME config (aug_cycle_gan defaults, b32,
3 blocks, linear lr decay) and record dev MSE_A + proxy-FID trajectories.

Both arms share: the data pipeline (data.npz loader + iterators with the
same iterator seed, so batch index order is identical), the metric stack
(eval.fid's fixed-seed random-feature extractor), and the eval cadence.
Each arm uses its own framework RNG for z/eps draws (cross-framework RNG
bit-parity is not achievable; parity is statistical — SURVEY.md §7).

Usage:
  python -m benchmarks.quality_parity torch --dataroot D --out torch.json
  python -m benchmarks.quality_parity jax   --dataroot D --out jax.json \
      [--dtype bfloat16]

Outputs one JSON file per arm: {"config": {...}, "history": [
  {"epoch": e, "mse_A": m, "fid_B": f, "losses": {...}}, ...]}
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

ZDIM = 16
EVAL_BATCH = 100
DIV_INPUTS = 32   # dev-A inputs scored for z-diversity
DIV_NUM_Z = 10    # z draws per input (reference generate_multi grid width)
# both arms log exactly this key set so the per-loss trajectories line up
# (G_z_B is excluded: the torch proxy exposes it but the reference's own
# error surface — and hence the jax train_instance — does not)
PARITY_LOSS_KEYS = ("D_A", "D_B", "D_z_B", "G_A", "G_B",
                    "Cyc_A", "Cyc_B", "Cyc_z_B")


def _load(dataroot, iter_seed, batch):
    from domain_transfer_gan_tpu.data import (AlignedIterator,
                                              UnalignedIterator,
                                              load_numpy_data)
    trainA, trainB, devA, devB, testA, testB = load_numpy_data(dataroot)
    train_it = UnalignedIterator(
        trainA, trainB, batch_size=batch,
        rng=np.random.RandomState(iter_seed))
    return train_it, (devA, devB), (testA, testB)


def _fid(dev_B, fake_B):
    from domain_transfer_gan_tpu.eval.fid import compute_fid
    return compute_fid(dev_B, fake_B)


# ---------------------------------------------------------------------------
# torch arm
# ---------------------------------------------------------------------------

def run_torch(dataroot, out, epochs, niter, batch, seed, eval_freq,
              iter_seed, d_lr_mode="reference"):
    # keep jax (used only for the FID extractor) off the TPU so the jax arm
    # can own the single chip concurrently
    import jax
    jax.config.update("jax_platforms", "cpu")
    import torch
    from benchmarks.torch_proxy import (build_nets, make_optimizers,
                                        train_step)
    torch.manual_seed(seed)
    nets = build_nets(ZDIM, seed=seed)
    opt_g, opt_d = make_optimizers(nets)
    train_it, (devA, devB), _ = _load(dataroot, iter_seed, batch)

    # ---- resume: this arm runs for hours on a single CPU core, so every
    # epoch checkpoints nets + optimizers + both RNG streams (torch for
    # z/eps, the iterator's numpy RandomState for batch order) and restores
    # them on restart, keeping the trajectory identical to an uninterrupted
    # run.
    ckpt_path = out + ".ckpt.pt"
    history = []
    start_epoch = 1
    lr = 2e-4
    import os
    if os.path.exists(ckpt_path):
        ck = torch.load(ckpt_path, weights_only=False)
        for k in nets:
            nets[k].load_state_dict(ck["nets"][k])
        opt_g.load_state_dict(ck["opt_g"])
        opt_d.load_state_dict(ck["opt_d"])
        torch.set_rng_state(ck["torch_rng"])
        train_it.rng.set_state(ck["np_rng"])
        # the iterator auto-resets at StopIteration, i.e. the next epoch's
        # permutations were already drawn when the checkpoint was written —
        # restore them as-is (re-calling reset() would burn an extra draw
        # and diverge from the uninterrupted trajectory)
        train_it.data_indices = ck["data_indices"]
        train_it.batch_idx = 0
        history = ck["history"]
        start_epoch = ck["epoch"] + 1
        lr = ck["lr"]
        print("[torch] resumed from epoch %d" % ck["epoch"], flush=True)

    def save_ckpt(epoch):
        torch.save({"nets": {k: v.state_dict() for k, v in nets.items()},
                    "opt_g": opt_g.state_dict(),
                    "opt_d": opt_d.state_dict(),
                    "torch_rng": torch.get_rng_state(),
                    "np_rng": train_it.rng.get_state(),
                    "data_indices": train_it.data_indices,
                    "history": history, "epoch": epoch, "lr": lr},
                   ckpt_path)

    def to_t(x):  # NHWC numpy -> NCHW torch
        return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())

    def dev_metrics():
        from domain_transfer_gan_tpu.eval.diversity import z_diversity_stats
        with torch.no_grad():
            mses, fakes = [], []
            for i in range(0, len(devA), EVAL_BATCH):
                A = to_t(devA[i:i + EVAL_BATCH])
                B = to_t(devB[i:i + EVAL_BATCH])
                pred_A = nets["g_ba"](B)
                mses.append(float(torch.mean((pred_A - A) ** 2)))
                z = torch.randn(A.shape[0], ZDIM, 1, 1)
                fb = nets["g_ab"](A, z)
                fakes.append(np.transpose(fb.numpy(), (0, 2, 3, 1)))
            # many-to-many: DIV_NUM_Z decodes per input, input-major
            multi = []
            for a in to_t(devA[:DIV_INPUTS]):
                zK = torch.randn(DIV_NUM_Z, ZDIM, 1, 1)
                aK = a[None].expand(DIV_NUM_Z, -1, -1, -1)
                multi.append(np.transpose(nets["g_ab"](aK, zK).numpy(),
                                          (0, 2, 3, 1)))
        fid = _fid(devB, np.concatenate(fakes))
        div = z_diversity_stats(np.concatenate(multi), DIV_NUM_Z)
        return float(np.mean(mses)), fid, div

    for epoch in range(start_epoch, epochs + 1):
        t0 = time.time()
        ep_losses = []
        for data in train_it:
            A, B = to_t(data["A"]), to_t(data["B"])
            z = torch.randn(A.shape[0], ZDIM, 1, 1)
            ep_losses.append(train_step(nets, opt_g, opt_d, A, B, z))
        mean_losses = {k: float(np.mean([d[k] for d in ep_losses]))
                       for k in ep_losses[0] if k in PARITY_LOSS_KEYS}
        rec = {"epoch": epoch, "losses": mean_losses,
               "epoch_sec": time.time() - t0}
        if epoch % eval_freq == 0 or epoch == epochs:
            mse, fid, div = dev_metrics()
            rec.update(mse_A=mse, fid_B=fid, z_div=div)
            print("[torch %d] MSE_A %.4f FID_B %.3f zdiv %.3f (%.0fs)"
                  % (epoch, mse, fid, div["ratio"], rec["epoch_sec"]),
                  flush=True)
        history.append(rec)
        _dump(out, "torch", epochs, niter, batch, seed, history, d_lr_mode)
        if epoch > niter:  # linear decay, reference model.py:282-291
            lr -= 2e-4 / (epochs - niter)
            for g in opt_g.param_groups:
                g["lr"] = lr
            for g in opt_d.param_groups:
                # reference-faithful (Q11): update_learning_rate sets D
                # groups to the FULL decayed lr, dropping the /5 discount
                g["lr"] = lr / 5.0 if d_lr_mode == "ratio" else lr
        save_ckpt(epoch)
    return history


# ---------------------------------------------------------------------------
# jax arm
# ---------------------------------------------------------------------------

def run_jax(dataroot, out, epochs, niter, batch, seed, eval_freq, iter_seed,
            dtype="float32", ema=0.0, d_lr_mode="reference", size=64):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from domain_transfer_gan_tpu.config import TrainConfig
    from domain_transfer_gan_tpu.data import AlignedIterator
    from domain_transfer_gan_tpu.eval import eval_mse_A
    from domain_transfer_gan_tpu.models import create_model

    cfg = TrainConfig(model="aug_cycle_gan", grid_size=size, batchSize=batch,
                      ngf=32, nef=32, ndf=64, nlatent=ZDIM,
                      niter=niter, niter_decay=epochs - niter,
                      use_pallas=False, compute_dtype=dtype,
                      monitor_gnorm=False, seed=seed, ema=ema,
                      d_lr_mode=d_lr_mode)
    cfg.expr_dir = ""
    # size != 64 exercises the adaptive-pool latent encoder
    # (nn/networks.py LatentEncoder) — the capability extension that makes
    # aug_cycle_gan train at the reference's default 256 (or 128) grid
    model = create_model(cfg, testing=True, image_size=size)
    train_it, (devA, devB), _ = _load(dataroot, iter_seed, batch)
    # the fully-convolutional nets would train on mismatched-resolution
    # data without error — refuse to produce mislabeled quality evidence
    if devA.shape[1] != size:
        raise ValueError(
            "--size %d but %s holds %dpx images — point --dataroot at a "
            "matching-resolution dataset" % (size, dataroot, devA.shape[1]))

    def dev_metrics():
        from domain_transfer_gan_tpu.eval.diversity import eval_z_diversity
        model.swap_ema()  # no-op unless --ema: score the averaged weights
        dev_ds = AlignedIterator(devA, devB, batch_size=EVAL_BATCH)
        mse = eval_mse_A(dev_ds, model)
        fakes = []
        for i in range(0, len(devA), EVAL_BATCH):
            A = jnp.asarray(devA[i:i + EVAL_BATCH])
            z = model.sample_prior_z(A.shape[0])
            fakes.append(np.asarray(model.predict_B(A, z)))
        fid = _fid(devB, np.concatenate(fakes))
        div = eval_z_diversity(model, devA[:DIV_INPUTS], num_z=DIV_NUM_Z)
        model.swap_ema()
        return float(mse), fid, div

    history = []
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        ep_losses = []
        for data in train_it:
            losses, _ = model.train_instance(data["A"], data["B"])
            ep_losses.append(losses)
        mean_losses = {k: float(np.mean([float(d[k]) for d in ep_losses]))
                       for k in PARITY_LOSS_KEYS if k in ep_losses[0]}
        rec = {"epoch": epoch, "losses": mean_losses,
               "epoch_sec": time.time() - t0}
        if epoch % eval_freq == 0 or epoch == epochs:
            mse, fid, div = dev_metrics()
            rec.update(mse_A=mse, fid_B=fid, z_div=div)
            print("[jax %d] MSE_A %.4f FID_B %.3f zdiv %.3f (%.0fs)"
                  % (epoch, mse, fid, div["ratio"], rec["epoch_sec"]),
                  flush=True)
        history.append(rec)
        _dump(out, "jax-" + dtype + (("-ema%g" % ema) if ema else ""),
              epochs, niter, batch, seed, history, d_lr_mode, size)
        if epoch > niter:
            model.update_learning_rate()
    return history


def _dump(out, arm, epochs, niter, batch, seed, history,
          d_lr_mode="reference", size=64):
    with open(out, "w") as f:
        json.dump({"config": {"arm": arm, "epochs": epochs, "niter": niter,
                              "batch": batch, "seed": seed,
                              "d_lr_mode": d_lr_mode, "size": size},
                   "history": history}, f, indent=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("arm", choices=["torch", "jax"])
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--niter", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--eval_freq", type=int, default=2)
    ap.add_argument("--iter_seed", type=int, default=99)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--ema", type=float, default=0.0)
    ap.add_argument("--d_lr_mode", default="reference",
                    choices=["reference", "ratio"])
    ap.add_argument("--size", type=int, default=64,
                    help="grid size (jax arm only; !=64 uses the "
                         "adaptive-pool encoder)")
    args = ap.parse_args()
    if args.arm == "torch":
        run_torch(args.dataroot, args.out, args.epochs, args.niter,
                  args.batch, args.seed, args.eval_freq, args.iter_seed,
                  args.d_lr_mode)
    else:
        run_jax(args.dataroot, args.out, args.epochs, args.niter, args.batch,
                args.seed, args.eval_freq, args.iter_seed, args.dtype,
                args.ema, args.d_lr_mode, args.size)


if __name__ == "__main__":
    main()
