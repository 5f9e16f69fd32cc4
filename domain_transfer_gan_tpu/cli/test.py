"""Evaluation driver — rebuild of reference test.py:193-309 with the broken
edges2shoes import restored (quirk Q2), the reference's four metric modes
(bpp | mse | visual | noise_sens) plus two extensions: mvgauss (the BPP
baseline only reachable from the reference's commented-out __main__) and
fid (proxy-FID quality metric).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax.numpy as jnp

from ..config import TestOptions, load_train_config_from_expr_dir
from ..data import AlignedIterator, UnalignedIterator, load_edges2shoes
from ..eval import (
    eval_mse_A,
    eval_ubo_B,
    one_to_three_channels,
    sensitivity_to_edge_noise,
    train_logvar,
)
from ..eval.visualize import (
    inference_grid,
    interleave_columns,
    multi_grid,
    save_image_grid,
)
from ..models import create_model


def visualize_cycle(opt, real_A, visuals, name="cycle_test.png"):
    imgs = [one_to_three_channels(np.asarray(v)[..., :3])
            for v in visuals.values()]
    grid = interleave_columns(imgs)
    save_image_grid(grid, os.path.join(opt.res_dir, name), nrow=len(imgs))


def visualize_multi_cycle(opt, real_B, model, name="multi_cycle_test.png"):
    images = model.generate_multi_cycle(jnp.asarray(real_B), steps=4)
    imgs = [one_to_three_channels(np.asarray(im)[..., :3]) for im in images]
    grid = interleave_columns(imgs)
    save_image_grid(grid, os.path.join(opt.res_dir, name), nrow=len(imgs))


def visualize_cycle_B_multi(opt, real_B, model, name="cycle_B_multi_test.png"):
    real_B = jnp.asarray(real_B)
    n = real_B.shape[0]
    z_set = model.sample_prior_z(opt.num_multi)
    multi_z = jnp.tile(z_set, (n, 1))
    fake_A, multi_fake_B = model.generate_cycle_B_multi(real_B, multi_z)
    multi_fake_B = np.asarray(multi_fake_B)
    multi_fake_B = multi_fake_B.reshape((n, opt.num_multi)
                                        + multi_fake_B.shape[1:])
    cols = [np.asarray(real_B), np.asarray(fake_A)] + \
        [multi_fake_B[:, i] for i in range(opt.num_multi)]
    grid = interleave_columns([one_to_three_channels(c[..., :3])
                               for c in cols])
    save_image_grid(grid, os.path.join(opt.res_dir, name),
                    nrow=opt.num_multi + 2)


def visualize_multi(opt, real_A, model, name="multi_test.png"):
    """Shared grid body with the train CLI (eval.visualize.multi_grid)."""
    grid = multi_grid(opt, real_A, model)
    save_image_grid(grid, os.path.join(opt.res_dir, name),
                    nrow=opt.num_multi + 1)


def visualize_inference(opt, real_A, real_B, model, name="inf_test.png"):
    """Shared grid body with the train CLI (eval.visualize.inference_grid)."""
    grid, num = inference_grid(opt, real_A, real_B, model)
    save_image_grid(grid, os.path.join(opt.res_dir, name), nrow=num + 1)


def test_model(argv=None):
    topt = TestOptions().parse(argv)
    if getattr(topt, "host_devices", 0):
        # force a CPU platform BEFORE anything touches the backend (same
        # rationale as the train CLI: env vars are rewritten at interpreter
        # startup in some environments; the programmatic route wins)
        from .train import _force_host_devices
        _force_host_devices(topt.host_devices)
    # global eval seeding (reference test.py:209-213 seeds random/np/torch
    # to 12345): the UnalignedIterator permutations feeding train_logvar
    # draw from np.random, so without this repeated --metric bpp
    # invocations would not be byte-identical
    import random as _random
    _random.seed(12345)
    np.random.seed(12345)
    expr_dir = os.path.dirname(topt.chk_path)
    opt = load_train_config_from_expr_dir(expr_dir, dataroot=topt.dataroot,
                                          seed=12345)
    opt.expr_dir = expr_dir

    res_path = os.path.join(expr_dir, topt.res_dir)
    os.makedirs(res_path, exist_ok=True)
    opt.res_dir = res_path

    # data selection mirrors the train CLI exactly (bundled npz /
    # edges2shoes folders / --numpy_data 0 per-file datasets), so any
    # trained checkpoint can be evaluated (the reference's test.py was
    # broken outright, quirk Q2, and round 1 only supported bundles)
    antialias = bool(getattr(opt, "resize_antialias", 1))
    if getattr(opt, "numpy_data", 1):
        trainA, trainB, devA, devB, testA, testB = load_edges2shoes(
            opt.dataroot, size=opt.grid_size,
            dev_size=getattr(opt, "dev_size", 200), antialias=antialias)
        sub = int(len(trainA) * 0.2)  # reference test.py uses a 20% subset
        train_dataset = UnalignedIterator(trainA[:sub], trainB[:sub],
                                          batch_size=200)
        test_dataset = AlignedIterator(testA, testB, batch_size=200)
        dev_dataset = AlignedIterator(devA, devB, batch_size=200)
    else:
        from ..data import DataLoader
        # load_in_mem=False: construction stays cheap (len comes from the
        # file lists) and each metric branch only pays the per-image
        # resize/transform for the split(s) it actually iterates
        train_dataset = DataLoader(opt, subset="train", unaligned=True,
                                   batchSize=200, fraction=0.2,
                                   load_in_mem=False)
        test_dataset = DataLoader(opt, subset="val", unaligned=False,
                                  batchSize=200, load_in_mem=False)
        dev_dataset = DataLoader(opt, subset="dev", unaligned=False,
                                 batchSize=200, load_in_mem=False)
    print("#training images = %d" % len(train_dataset))
    print("#test images = %d" % len(test_dataset))
    print("#dev images = %d" % len(dev_dataset))

    model = create_model(opt, testing=True, image_size=opt.grid_size)
    model.load(topt.chk_path)
    if getattr(topt, "use_ema", 0):
        assert model.state.ema, "--use_ema needs a checkpoint trained with --ema"
        model.swap_ema()
    vis_inf = opt.model == "aug_cycle_gan"

    if topt.metric == "bpp":
        logvar_B = None
        if topt.train_logvar:
            print("training logvar_B on training data...")
            logvar_B = train_logvar(train_dataset, model)
        print("evaluating on test set...")
        t = time.time()
        test_ubo_B, test_bpp_B, test_kld_B = eval_ubo_B(
            test_dataset, model, 500, visualize=True, vis_name="test_pred_B",
            vis_path=opt.res_dir, logvar_B=logvar_B, verbose=True,
            compute_l1=True)
        print("TEST_BPP_B: %.4f, TIME: %.4f" % (test_bpp_B, time.time() - t))

    elif topt.metric == "mse":
        dev_mse_A = eval_mse_A(dev_dataset, model)
        test_mse_A = eval_mse_A(test_dataset, model)
        print("DEV_MSE_A: %.4f, TEST_MSE_A: %.4f" % (dev_mse_A, test_mse_A))

    elif topt.metric == "visual":
        opt.num_multi = 5
        n_vis = 10
        if getattr(opt, "numpy_data", 1):
            dev_vis = AlignedIterator(devA, devB, batch_size=n_vis)
        else:
            from ..data import DataLoader
            dev_vis = DataLoader(opt, subset="dev", unaligned=False,
                                 batchSize=n_vis, load_in_mem=False)
        for i, vis_data in enumerate(dev_vis):
            real_A, real_B = vis_data["A"], vis_data["B"]
            # the dev split may be smaller than n_vis — size z to the batch
            prior_z_B = model.sample_prior_z(np.asarray(real_A).shape[0])
            visuals = model.generate_cycle(jnp.asarray(real_A),
                                           jnp.asarray(real_B), prior_z_B)
            visualize_cycle(opt, real_A, visuals, name="cycle_%d.png" % i)
            visualize_multi(opt, real_A, model, name="multi_%d.png" % i)
            visualize_cycle_B_multi(opt, real_B, model,
                                    name="cycle_B_multi_%d.png" % i)
            visualize_multi_cycle(opt, real_B, model,
                                  name="multi_cycle_%d.png" % i)
            if vis_inf:
                visualize_inference(opt, real_A, real_B, model,
                                    name="inf_%d.png" % i)
            break  # the reference also stops after the first batch

    elif topt.metric == "noise_sens":
        sensitivity_to_edge_noise(opt, model, next(iter(test_dataset))["B"],
                                  save_path=os.path.join(opt.res_dir,
                                                         "noise_sens.npy"))

    elif topt.metric == "mvgauss":
        # multivariate-Gaussian BPP baseline (reference test.py:92-134,
        # reachable only from its commented-out __main__)
        from ..eval import compute_bpp_mvgauss_B
        bpp = compute_bpp_mvgauss_B(train_dataset, test_dataset)
        with open(os.path.join(opt.res_dir, "mvgauss_bpp.txt"), "w") as f:
            f.write("%f\n" % bpp)

    elif topt.metric == "fid":
        # proxy-FID of generated B against real B (new capability; the
        # quality-parity metric named in BASELINE.md).  --fid_extractor
        # swaps in a serialized real extractor (e.g. Inception features)
        # for true FID where weights are available.
        from ..eval import eval_fid_B
        extractor = None
        label = "PROXY_FID_B"
        if getattr(topt, "fid_extractor", ""):
            from ..eval.fid import load_extractor
            extractor = load_extractor(topt.fid_extractor)
            label = "FID_B"
        fid = eval_fid_B(test_dataset, model, extractor=extractor)
        print("%s: %.4f" % (label, fid))
        with open(os.path.join(opt.res_dir, "fid.txt"), "w") as f:
            f.write("%f\n" % fid)

    elif topt.metric == "z_div":
        # many-to-many diversity over z (new capability): the property that
        # makes aug_cycle_gan augmented; a z-ignoring generator scores ~0
        from ..eval import eval_z_diversity
        batch = next(iter(dev_dataset))
        n = min(32, np.asarray(batch["A"]).shape[0])
        div = eval_z_diversity(model, np.asarray(batch["A"])[:n],
                               num_z=opt.num_multi)
        print("Z_DIV_RATIO: %.4f (intra %.4f / inter %.4f)"
              % (div["ratio"], div["intra_z"], div["inter_input"]))
        with open(os.path.join(opt.res_dir, "z_diversity.json"), "w") as f:
            # strict JSON: a 1-sample dev batch yields inter/ratio = nan,
            # and json.dump would emit a bare NaN token
            json.dump({k: (v if np.isfinite(v) else None)
                       for k, v in div.items()}, f, indent=2)
    else:
        raise NotImplementedError("wrong metric!")


if __name__ == "__main__":
    test_model()
