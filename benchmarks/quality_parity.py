"""Quality-parity harness (VERDICT r1 item 6): train the torch
reference-architecture proxy and the JAX/TPU stack to convergence on the
SAME synthetic dataset with the SAME config (aug_cycle_gan defaults, b32,
3 blocks, linear lr decay) and record dev MSE_A + proxy-FID trajectories.

Both arms share: the data pipeline (data.npz loader + iterators with the
same iterator seed, so batch index order is identical), the metric stack
(eval.fid's fixed-seed random-feature extractor), and the eval cadence.
Each arm uses its own framework RNG for z/eps draws (cross-framework RNG
bit-parity is not achievable; parity is statistical — SURVEY.md §7).

Round 4: generalized over ``--model`` (all three reference variants,
train.py:157-166), plus jax-arm ``--stoch_enc`` / ``--supervised`` arms
(reference model.py:415-419, train.py:142-154), and two extractor-free
corroborating distances (channel moments + radial log spectrum,
eval/moments.py) recorded alongside proxy-FID at every eval.

Usage:
  python -m benchmarks.quality_parity torch --dataroot D --out torch.json \
      [--model stoch_cycle_gan]
  python -m benchmarks.quality_parity jax   --dataroot D --out jax.json \
      [--dtype bfloat16] [--model cycle_gan] [--stoch_enc] [--supervised]

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
AUG_LOSS_KEYS = ("D_A", "D_B", "D_z_B", "G_A", "G_B",
                 "Cyc_A", "Cyc_B", "Cyc_z_B")
STOCH_LOSS_KEYS = ("D_A", "D_B", "G_A", "G_B", "Cyc_A", "Cyc_B")


def parity_loss_keys(model):
    return AUG_LOSS_KEYS if model == "aug_cycle_gan" else STOCH_LOSS_KEYS


def _load(dataroot, iter_seed, batch):
    from domain_transfer_gan_tpu.data import (AlignedIterator,
                                              UnalignedIterator,
                                              load_numpy_data)
    trainA, trainB, devA, devB, testA, testB = load_numpy_data(dataroot)
    train_it = UnalignedIterator(
        trainA, trainB, batch_size=batch,
        rng=np.random.RandomState(iter_seed))
    return train_it, (trainA, trainB), (devA, devB), (testA, testB)


def _dists(dev_B, fake_B):
    """Extractor-free corroborating distances (VERDICT r3 weak #3)."""
    from domain_transfer_gan_tpu.eval.moments import distribution_distances
    return distribution_distances(dev_B, fake_B)


def _fid(dev_B, fake_B):
    from domain_transfer_gan_tpu.eval.fid import compute_fid
    return compute_fid(dev_B, fake_B)


# ---------------------------------------------------------------------------
# torch arm
# ---------------------------------------------------------------------------

def run_torch(dataroot, out, epochs, niter, batch, seed, eval_freq,
              iter_seed, d_lr_mode="reference", model="aug_cycle_gan"):
    # keep jax (used only for the FID extractor) off the TPU so the jax arm
    # can own the single chip concurrently
    import jax
    jax.config.update("jax_platforms", "cpu")
    import torch
    from benchmarks.torch_proxy import (build_nets, make_optimizers,
                                        train_step, train_step_stoch)
    torch.manual_seed(seed)
    nets = build_nets(ZDIM, seed=seed, model=model)
    opt_g, opt_d = make_optimizers(nets)
    train_it, _, (devA, devB), _ = _load(dataroot, iter_seed, batch)
    ignore_noise = model == "cycle_gan"

    def draw_z(n):
        # cycle_gan forces z == 1 (reference model.py:128-129)
        if ignore_noise:
            return torch.ones(n, ZDIM, 1, 1)
        return torch.randn(n, ZDIM, 1, 1)

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
                z = draw_z(A.shape[0])
                fb = nets["g_ab"](A, z)
                fakes.append(np.transpose(fb.numpy(), (0, 2, 3, 1)))
            # many-to-many: DIV_NUM_Z decodes per input, input-major
            multi = []
            for a in to_t(devA[:DIV_INPUTS]):
                zK = draw_z(DIV_NUM_Z)
                aK = a[None].expand(DIV_NUM_Z, -1, -1, -1)
                multi.append(np.transpose(nets["g_ab"](aK, zK).numpy(),
                                          (0, 2, 3, 1)))
        fakes = np.concatenate(fakes)
        fid = _fid(devB, fakes)
        dd = _dists(devB, fakes)
        div = z_diversity_stats(np.concatenate(multi), DIV_NUM_Z)
        return float(np.mean(mses)), fid, div, dd

    for epoch in range(start_epoch, epochs + 1):
        t0 = time.time()
        ep_losses = []
        for data in train_it:
            A, B = to_t(data["A"]), to_t(data["B"])
            z = draw_z(A.shape[0])
            if model == "aug_cycle_gan":
                ep_losses.append(train_step(nets, opt_g, opt_d, A, B, z))
            else:
                ep_losses.append(
                    train_step_stoch(nets, opt_g, opt_d, A, B, z))
        keys = parity_loss_keys(model)
        mean_losses = {k: float(np.mean([d[k] for d in ep_losses]))
                       for k in ep_losses[0] if k in keys}
        rec = {"epoch": epoch, "losses": mean_losses,
               "epoch_sec": time.time() - t0}
        if epoch % eval_freq == 0 or epoch == epochs:
            mse, fid, div, dd = dev_metrics()
            rec.update(mse_A=mse, fid_B=fid, z_div=div,
                       cmd_B=dd["cmd"], rsd_B=dd["rsd"])
            print("[torch %d] MSE_A %.4f FID_B %.3f cmd %.4f rsd %.4f "
                  "zdiv %.3f (%.0fs)"
                  % (epoch, mse, fid, dd["cmd"], dd["rsd"], div["ratio"],
                     rec["epoch_sec"]), flush=True)
        history.append(rec)
        _dump(out, "torch-" + model, epochs, niter, batch, seed, history,
              d_lr_mode, model=model)
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
            dtype="float32", ema=0.0, d_lr_mode="reference", size=64,
            model_name="aug_cycle_gan", stoch_enc=False, supervised=False,
            sup_frac=0.1):
    import itertools

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from domain_transfer_gan_tpu.config import TrainConfig
    from domain_transfer_gan_tpu.data import AlignedIterator
    from domain_transfer_gan_tpu.eval import eval_mse_A
    from domain_transfer_gan_tpu.models import create_model

    cfg = TrainConfig(model=model_name, grid_size=size, batchSize=batch,
                      ngf=32, nef=32, ndf=64, nlatent=ZDIM,
                      niter=niter, niter_decay=epochs - niter,
                      use_pallas=False, compute_dtype=dtype,
                      monitor_gnorm=False, seed=seed, ema=ema,
                      d_lr_mode=d_lr_mode, stoch_enc=stoch_enc,
                      supervised=supervised, sup_frac=sup_frac)
    cfg.expr_dir = ""
    # size != 64 exercises the adaptive-pool latent encoder
    # (nn/networks.py LatentEncoder) — the capability extension that makes
    # aug_cycle_gan train at the reference's default 256 (or 128) grid
    model = create_model(cfg, testing=True, image_size=size)
    train_it, (trainA, trainB), (devA, devB), _ = _load(dataroot, iter_seed,
                                                        batch)
    # pin the train set in HBM: the iterator's fancy indexing becomes an
    # on-device gather, so only index vectors cross the host link per step
    # (same feed as cli/train.py --device_data; numerics identical — at
    # 256px the host feed, not compute, bounds epoch time)
    if trainA.nbytes + trainB.nbytes <= 2 << 30:
        train_it.data_A = jax.device_put(train_it.data_A)
        train_it.data_B = jax.device_put(train_it.data_B)
    sup_iter = None
    if supervised:
        # paired subset + cycle, reference train.py:142-154 semantics
        # (mirrors cli/train.py:181-193)
        sup_size = max(int(len(trainA) * sup_frac), 1)
        sup_iter = itertools.cycle(iter(AlignedIterator(
            trainA[:sup_size], trainB[:sup_size], batch_size=batch)))
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
        fakes = np.concatenate(fakes)
        fid = _fid(devB, fakes)
        dd = _dists(devB, fakes)
        div = eval_z_diversity(model, devA[:DIV_INPUTS], num_z=DIV_NUM_Z)
        model.swap_ema()
        return float(mse), fid, div, dd

    keys = parity_loss_keys(model_name)
    arm = ("jax-" + dtype + (("-ema%g" % ema) if ema else "")
           + ("-stochenc" if stoch_enc else "")
           + ("-sup%g" % sup_frac if supervised else ""))
    history = []
    for epoch in range(1, epochs + 1):
        t0 = time.time()
        ep_losses, ep_sup = [], []
        for data in train_it:
            n = data["A"].shape[0]
            # supervised runs reuse the unsupervised step's prior draw
            # (reference train.py:211-216) — draw it explicitly here so
            # both steps see the same z
            prior_z = model.sample_prior_z(n) if supervised else None
            losses, _ = model.train_instance(data["A"], data["B"], prior_z)
            ep_losses.append(losses)
            if supervised:
                sup_data = next(sup_iter)
                sup_z = prior_z
                if sup_data["A"].shape[0] != n:
                    sup_z = model.sample_prior_z(sup_data["A"].shape[0])
                ep_sup.append(model.supervised_train_instance(
                    sup_data["A"], sup_data["B"], sup_z))
        mean_losses = {k: float(np.mean([float(d[k]) for d in ep_losses]))
                       for k in keys if k in ep_losses[0]}
        if ep_sup:
            mean_losses.update(
                {k: float(np.mean([float(d[k]) for d in ep_sup]))
                 for k in ("S_A", "S_B") if k in ep_sup[0]})
        rec = {"epoch": epoch, "losses": mean_losses,
               "epoch_sec": time.time() - t0}
        if epoch % eval_freq == 0 or epoch == epochs:
            mse, fid, div, dd = dev_metrics()
            rec.update(mse_A=mse, fid_B=fid, z_div=div,
                       cmd_B=dd["cmd"], rsd_B=dd["rsd"])
            print("[jax %d] MSE_A %.4f FID_B %.3f cmd %.4f rsd %.4f "
                  "zdiv %.3f (%.0fs)"
                  % (epoch, mse, fid, dd["cmd"], dd["rsd"], div["ratio"],
                     rec["epoch_sec"]), flush=True)
        history.append(rec)
        _dump(out, arm, epochs, niter, batch, seed, history, d_lr_mode,
              size, model=model_name)
        if epoch > niter:
            model.update_learning_rate()
    return history


def _dump(out, arm, epochs, niter, batch, seed, history,
          d_lr_mode="reference", size=64, model="aug_cycle_gan"):
    with open(out, "w") as f:
        json.dump({"config": {"arm": arm, "model": model, "epochs": epochs,
                              "niter": niter, "batch": batch, "seed": seed,
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
    ap.add_argument("--model", default="aug_cycle_gan",
                    choices=["aug_cycle_gan", "stoch_cycle_gan",
                             "cycle_gan"])
    ap.add_argument("--stoch_enc", action="store_true",
                    help="VAE-style posterior sampling + KLD in loss "
                         "(jax arm only; reference model.py:415-419)")
    ap.add_argument("--supervised", action="store_true",
                    help="add the paired supervised step each iteration "
                         "(jax arm only; reference train.py:142-154)")
    ap.add_argument("--sup_frac", type=float, default=0.1)
    args = ap.parse_args()
    if args.arm == "torch":
        if args.stoch_enc or args.supervised:
            ap.error("--stoch_enc/--supervised are jax-arm options")
        run_torch(args.dataroot, args.out, args.epochs, args.niter,
                  args.batch, args.seed, args.eval_freq, args.iter_seed,
                  args.d_lr_mode, args.model)
    else:
        run_jax(args.dataroot, args.out, args.epochs, args.niter, args.batch,
                args.seed, args.eval_freq, args.iter_seed, args.dtype,
                args.ema, args.d_lr_mode, args.size, args.model,
                args.stoch_enc, args.supervised, args.sup_frac)


if __name__ == "__main__":
    main()
