"""Training driver — full rebuild of reference train.py:96-313 with the same
artifact contract (results.txt/json, history_*.npy, best_* checkpoints, vis
dirs) plus the TPU-native upgrades: data-parallel mesh, double-buffered
device feed, async loss fetching, windowed throughput, and REAL resume
(the reference parsed --continue_train but never acted on it, quirk Q10).
"""

from __future__ import annotations

import itertools
import os
import sys
import time
from shutil import copyfile

import numpy as np

import jax
import jax.numpy as jnp

from ..config import TrainConfig, TrainOptions, create_sub_dirs
from ..data import (
    AlignedIterator,
    DataLoader,
    UnalignedIterator,
    load_numpy_data,
)
from ..eval import eval_mse_A, eval_ubo_B, one_to_three_channels
from ..eval.visualize import (
    inference_grid,
    interleave_columns,
    multi_grid,
    save_image_grid,
)
from ..models import create_model
from ..parallel import DataParallel, multihost, prefetch_to_device
from ..utils import StepTimer, copy_scripts_to_folder, format_log, print_log, \
    save_results


def visualize_cycle(opt, real_A, visuals, eidx, uidx, train):
    """6-column cycle grid (reference train.py:47-59)."""
    imgs = [one_to_three_channels(multihost.to_host(v)[..., :3])
            for v in visuals.values()]
    grid = interleave_columns(imgs)
    save_dir = opt.train_vis_cycle if train else opt.vis_cycle
    save_path = os.path.join(save_dir, "cycle_%02d_%04d.png" % (eidx, uidx))
    save_image_grid(grid, save_path, nrow=len(imgs))
    copyfile(save_path, os.path.join(opt.vis_latest, "cycle.png"))


def visualize_multi(opt, real_A, model, eidx, uidx):
    """Same z-set across the batch (reference train.py:61-74); the grid
    body is shared with the test CLI (eval.visualize.multi_grid)."""
    grid = multi_grid(opt, real_A, model, to_host=multihost.to_host)
    save_path = os.path.join(opt.vis_multi, "multi_%02d_%04d.png" % (eidx, uidx))
    save_image_grid(grid, save_path, nrow=opt.num_multi + 1)
    copyfile(save_path, os.path.join(opt.vis_latest, "multi.png"))


def visualize_inference(opt, real_A, real_B, model, eidx, uidx):
    """Posterior-z transfer grid (reference train.py:76-94); shared body
    (eval.visualize.inference_grid)."""
    grid, num = inference_grid(opt, real_A, real_B, model,
                               to_host=multihost.to_host)
    save_path = os.path.join(opt.vis_inf, "inf_%02d_%04d.png" % (eidx, uidx))
    save_image_grid(grid, save_path, nrow=num + 1)
    copyfile(save_path, os.path.join(opt.vis_latest, "inf.png"))


def check_losses_finite(losses, epoch, step) -> None:
    """Debug sanitizer (--check_numerics): host-checks every scalar loss and
    raises naming the non-finite terms.  The reference's only guard was
    data-side nan_to_num (dataloader.py:18,25); this covers the training
    dynamics too (GAN collapses surface as inf/nan in D/G losses first).
    Forces a device sync per step — debug mode only."""
    bad = [k for k, v in losses.items()
           if not np.isfinite(float(np.asarray(v)))]
    if bad:
        raise FloatingPointError(
            "non-finite losses at epoch %d step %d: %s (values: %s)"
            % (epoch, step, bad,
               {k: float(np.asarray(losses[k])) for k in bad}))


def _force_host_devices(n: int) -> None:
    """Force an n-virtual-device CPU platform (for driving the SPMD paths
    without n real chips).  Env vars are unreliable here — this
    environment's interpreter startup rewrites JAX_PLATFORMS — but the
    programmatic config route wins as long as the backend is untouched.

    Only sets config; the post-init assert lives in train_model AFTER the
    (optional) jax.distributed.initialize, which itself must run before
    anything touches the backend."""
    jax.config.update("jax_num_cpu_devices", n)
    jax.config.update("jax_platforms", "cpu")


def train_model(opt: TrainConfig = None, argv=None):
    if opt is None:
        opt = TrainOptions().parse(
            sub_dirs=["vis_multi", "vis_cycle", "vis_latest",
                      "train_vis_cycle"], args=argv)
    if getattr(opt, "host_devices", 0):
        _force_host_devices(opt.host_devices)
    if getattr(opt, "check_numerics", 0):
        jax.config.update("jax_debug_nans", True)
    if (getattr(opt, "coordinator", "") or getattr(opt, "num_processes", 0) > 1
            or getattr(opt, "process_id", -1) >= 0):
        # Multi-host SPMD: join the cluster (parallel/multihost.py), then
        # keep the single-writer artifact contract — non-primary hosts
        # write their artifact copies into a per-rank scratch subdir (safe
        # on a shared filesystem; every host still runs the same program).
        multihost.initialize(opt.coordinator, opt.num_processes,
                             opt.process_id)
        if getattr(opt, "host_devices", 0):
            assert jax.local_device_count() >= opt.host_devices, (
                "backend initialized before --host_devices could apply")
        if not multihost.is_primary():
            opt.expr_dir = os.path.join(
                opt.expr_dir, ".worker%d" % jax.process_index())
            os.makedirs(opt.expr_dir, exist_ok=True)
            create_sub_dirs(opt, ["vis_multi", "vis_cycle", "vis_latest",
                                  "train_vis_cycle"])
    elif getattr(opt, "host_devices", 0):
        assert jax.local_device_count() >= opt.host_devices, (
            "backend initialized before --host_devices could apply")
    # resume appends to the prior run's log instead of truncating it
    out_f = open(os.path.join(opt.expr_dir, "results.txt"),
                 "a" if opt.continue_train else "w")
    copy_scripts_to_folder(opt.expr_dir)

    if opt.seed is not None:
        print("using random seed:", opt.seed)
        np.random.seed(opt.seed)

    # ----- data ---------------------------------------------------------
    if opt.numpy_data:
        if (not os.path.exists(os.path.join(opt.dataroot, "trainA.npz"))
                and os.path.isdir(os.path.join(opt.dataroot, "train"))):
            # edges2shoes-style paired-jpg folder (capability the reference
            # imports but lacks, quirk Q2)
            from ..data import load_edges2shoes
            trainA, trainB, devA, devB, testA, testB = load_edges2shoes(
                opt.dataroot, size=opt.grid_size, dev_size=opt.dev_size,
                antialias=bool(opt.resize_antialias))
        else:
            trainA, trainB, devA, devB, testA, testB = load_numpy_data(
                opt.dataroot, grid_size=opt.grid_size, dev_size=opt.dev_size,
                antialias=bool(opt.resize_antialias))
        train_dataset = UnalignedIterator(trainA, trainB,
                                          batch_size=opt.batchSize)
        print_log(out_f, "#training images = %d" % len(train_dataset))
        test_dataset = AlignedIterator(testA, testB, batch_size=100)
        print_log(out_f, "#test images = %d" % len(test_dataset))
        dev_dataset = AlignedIterator(devA, devB, batch_size=100)
        print_log(out_f, "#dev images = %d" % len(dev_dataset))
        dev_cycle = itertools.cycle(AlignedIterator(devA, devB, batch_size=25))
    else:
        train_loader = DataLoader(opt, subset="train", unaligned=True,
                                  batchSize=opt.batchSize)
        test_loader = DataLoader(opt, subset="val", unaligned=False,
                                 batchSize=200)
        dev_loader = DataLoader(opt, subset="dev", unaligned=False,
                                batchSize=200)
        dev_cycle_loader = DataLoader(opt, subset="dev", unaligned=False,
                                      batchSize=25)
        train_dataset = train_loader
        print_log(out_f, "#training images = %d" % len(train_loader))
        test_dataset = test_loader
        print_log(out_f, "#test images = %d" % len(test_loader))
        dev_dataset = dev_loader
        print_log(out_f, "#dev images = %d" % len(dev_loader))

        def _cycle(loader):
            while True:
                for b in loader:
                    yield b
        dev_cycle = _cycle(dev_cycle_loader)

    if opt.supervised:
        if opt.numpy_data:
            sup_size = int(len(trainA) * opt.sup_frac)
            sup_train_dataset = AlignedIterator(trainA[:sup_size],
                                                trainB[:sup_size],
                                                batch_size=opt.batchSize)
        else:
            sup_loader = DataLoader(opt, subset="train", unaligned=False,
                                    batchSize=opt.batchSize,
                                    fraction=opt.sup_frac)
            sup_size = len(sup_loader)
            sup_train_dataset = sup_loader
        sup_iter = itertools.cycle(iter(sup_train_dataset))
        print_log(out_f, "#supervised images = %d" % sup_size)

    # ----- model --------------------------------------------------------
    model = create_model(opt, image_size=opt.grid_size)
    vis_inf = False
    if opt.model == "aug_cycle_gan":
        create_sub_dirs(opt, ["vis_inf"])
        vis_inf = True
    print_log(out_f, "model [%s] was created" % type(model).__name__)

    # real resume (fixes reference quirk Q10)
    resumed = False
    if opt.continue_train:
        chk = os.path.join(opt.expr_dir, opt.which_epoch)
        if os.path.exists(chk):
            model.load(chk)
            resumed = True
            print_log(out_f, "resumed from %s (epoch %d, step %d)"
                      % (chk, model.epoch, int(model.state.step)))
        else:
            print_log(out_f, "WARNING: --continue_train set but %s missing"
                      % chk)

    # SPMD over all visible devices: data-parallel, optionally composed
    # with spatial (image-H) sharding via --spatial and tensor (channel)
    # sharding via --tensor
    n_dev = opt.num_devices or len(jax.devices())
    spatial = getattr(opt, "spatial", 0)
    tensor = getattr(opt, "tensor", 0)
    pipe = getattr(opt, "pipeline", 0)
    per_data = max(spatial, 1) * max(tensor, 1) * max(pipe, 1)
    data_axis_size = max(n_dev // per_data, 1)
    # with a pipe axis batches shard over ('data','pipe') jointly
    batch_shards = data_axis_size * max(pipe, 1)
    if n_dev > 1 and opt.batchSize % batch_shards != 0:
        print_log(out_f, "WARNING: %d devices visible but batchSize %d does "
                  "not divide the batch-sharding axes (%d) — running "
                  "UNSHARDED on one device; --spatial/--tensor/--pipeline "
                  "are ignored"
                  % (n_dev, opt.batchSize, batch_shards))
    elif n_dev > 1:
        model = DataParallel(model, num_devices=n_dev, axis=opt.data_axis,
                             spatial=spatial, tensor=tensor, pipeline=pipe,
                             microbatches=getattr(opt, "microbatches", 0))
        desc = "data-parallel"
        if per_data > 1:
            desc = "data x space x model x pipe %dx%dx%dx%d" % (
                n_dev // per_data, max(spatial, 1), max(tensor, 1),
                max(pipe, 1))
        print_log(out_f, "SPMD over %d devices (%s)"
                  % (model.n_devices, desc))

    total_steps = 0
    timer = StepTimer()
    results = {
        "best_dev_mse_A": sys.float_info.max,
        "best_test_mse_A": sys.float_info.max,
        "best_dev_bpp_B": sys.float_info.max,
        "best_test_bpp_B": sys.float_info.max,
    }
    results_path = os.path.join(opt.expr_dir, "results.json")
    if opt.continue_train and os.path.exists(results_path):
        # Keep the pre-restart best metrics so a worse post-resume epoch
        # can't overwrite the best_A/best_B checkpoints.
        import json
        with open(results_path) as f:
            results.update(json.load(f))
    save_results(opt.expr_dir, results)
    # resume keeps the prior run's eval history: the per-epoch np.save
    # writes the WHOLE list, so starting empty would overwrite
    # history_*.npy with post-resume entries only
    history_mse_A = []
    history_ubo_B = []
    if resumed:
        for name, hist in (("history_mse_A.npy", history_mse_A),
                           ("history_ubo_B.npy", history_ubo_B)):
            p = os.path.join(opt.expr_dir, name)
            if os.path.exists(p):
                hist.extend(tuple(row) for row in np.load(p))
    create_sub_dirs(opt, ["vis_pred_B"])

    # the 'latest' payload is written at the END of epoch E with epoch=E,
    # so resume continues at E+1 (re-training E would double-log it and
    # call update_learning_rate once too often, overshooting the decay)
    start_epoch = model.epoch + 1 if resumed else opt.epoch_count
    is_dp = isinstance(model, DataParallel)
    mesh = model.mesh if is_dp else None
    space_ax = model.space_axis if is_dp else None

    # ----- device-resident training set (TPU-native feed) ---------------
    # The step executes on device-resident arrays, but a host feed re-
    # uploads ~2*batch*H*W*C floats every step (the reference .cuda()s
    # every batch, train.py:198-201) — on a tunneled TPU that transfer,
    # not compute, bounds delivered img/s (BASELINE.md loop-level rows).
    # --device_data pins the train arrays in HBM once; the iterators'
    # fancy indexing then executes as an ON-DEVICE gather, so only the
    # per-step index vectors cross the host link.  Batch order and values
    # are identical to the host feed (same iterator, same RandomState).
    indexed_feed = False
    if opt.numpy_data and multihost.process_count() == 1 \
            and getattr(opt, "device_data", 0):
        _ds_bytes = trainA.nbytes + trainB.nbytes
        if opt.device_data == 1 or \
                _ds_bytes <= opt.device_data_max_gb * (1 << 30):
            if mesh is not None:
                from ..parallel import replicated_sharding
                _sh = replicated_sharding(mesh)
                _put = lambda x: jax.device_put(x, _sh)  # noqa: E731
            else:
                _put = jax.device_put
            train_dataset.data_A = _put(train_dataset.data_A)
            train_dataset.data_B = _put(train_dataset.data_B)
            if opt.supervised and hasattr(sup_train_dataset, "data_A"):
                sup_train_dataset.data_A = _put(sup_train_dataset.data_A)
                sup_train_dataset.data_B = _put(sup_train_dataset.data_B)
            # Single-device: go one step further and fold the gather INTO
            # the jitted step (models/api._indexed_step) — the iterator
            # yields index vectors that ride the step call, so each step
            # is ONE dispatch instead of three (gather A, gather B, step).
            # Worth ~1.4x delivered img/s on the tunneled backend
            # (BASELINE.md round-5 loop rows; benchmarks/feed_bench.py).
            if mesh is None and getattr(train_dataset, "yield_indices",
                                        None) is False:
                train_dataset.yield_indices = True
                indexed_feed = True
            print_log(out_f, "train set pinned in HBM (%.1f MB): "
                      "%s batch gather"
                      % (_ds_bytes / 2 ** 20,
                         "in-step" if indexed_feed else "on-device"))

    trace_active = False
    for epoch in range(start_epoch, opt.niter + opt.niter_decay + 1):
        model.epoch = epoch
        epoch_start_time = time.time()
        epoch_iter = 0

        # Double-buffered host->HBM feed: input transfer overlaps compute
        # (the reference synchronously .cuda()'d every batch).  Size guards
        # run BEFORE sharding: a short tail batch from the per-file
        # DataLoader would crash device_put on a mesh (batch not divisible
        # by the data axis) and even a divisible one would recompile the
        # step for a second shape — skip them up front (the UnalignedIterator
        # path never emits one thanks to its last-batch backoff).
        if mesh is not None:
            # model.axis is ('data','pipe') when a pipe axis is active —
            # batches shard over the combined axes
            _axes = model.axis if isinstance(model.axis, tuple) \
                else (model.axis,)
            n_div = int(np.prod([mesh.shape[a] for a in _axes]))
        else:
            n_div = 1

        def full_batches(it):
            for d in it:
                nA, nB = d["A"].shape[0], d["B"].shape[0]
                if nA != nB or nA % n_div != 0 or (
                        mesh is not None and nA != opt.batchSize):
                    continue
                yield d

        # the in-step-gather feed needs no prefetch: only tiny index
        # vectors cross the host link, as arguments of the step call
        feed = (iter(train_dataset) if indexed_feed else
                prefetch_to_device(full_batches(train_dataset), mesh,
                                   axis=model.axis if is_dp else "data",
                                   space_axis=space_ax))
        for i, data in enumerate(feed):
            if indexed_feed:
                idx_A, idx_B = data["A_idx"], data["B_idx"]
                n_batch = idx_A.shape[0]
                real_A = real_B = None
            else:
                real_A, real_B = data["A"], data["B"]
                n_batch = real_A.shape[0]
            total_steps += opt.batchSize
            epoch_iter += opt.batchSize

            # profile a steady-state window when --profile_dir is set
            if (opt.profile_dir and epoch == start_epoch and i == 10
                    and not trace_active):
                jax.profiler.start_trace(opt.profile_dir)
                trace_active = True
            # supervised runs reuse the unsupervised step's prior_z_B draw
            # in the supervised step (reference train.py:211-216 passes the
            # SAME prior_z_B to both), so draw it in the driver there —
            # sized to the actual batch (the per-file loader emits short
            # tail batches)
            prior_z = (model.sample_prior_z(n_batch)
                       if opt.supervised else None)
            out = (model.train_instance_indexed(
                       train_dataset.data_A, train_dataset.data_B,
                       idx_A, idx_B, prior_z)
                   if indexed_feed else
                   model.train_instance(real_A, real_B, prior_z))
            if opt.monitor_gnorm:
                losses, visuals, gnorms = out
            else:
                losses, visuals = out
            if trace_active and i == 14:
                float(np.asarray(losses["D_A"]))
                jax.profiler.stop_trace()
                trace_active = False
                print_log(out_f, "profiler trace written to %s"
                          % opt.profile_dir)

            if opt.supervised:
                sup_data = next(sup_iter)
                # the sup iterator has no last-batch backoff; when its
                # batch differs from the main draw's size, a fresh
                # size-matched draw replaces the shared one (statistically
                # identical; exact z sharing holds for the standard
                # equal-size case)
                sup_z = prior_z
                n_sup = sup_data["A"].shape[0]
                if sup_z is not None and n_sup != sup_z.shape[0]:
                    sup_z = model.sample_prior_z(n_sup)
                sup_losses = model.supervised_train_instance(
                    sup_data["A"], sup_data["B"], sup_z)
            if opt.check_numerics:
                check_losses_finite(losses, epoch, i)
                if opt.supervised:
                    check_losses_finite(sup_losses, epoch, i)
            timer.tick(opt.batchSize)

            if opt.display_freq and total_steps % opt.display_freq == 0:
                if real_A is None:  # indexed feed: materialize for visuals
                    real_A = jnp.take(train_dataset.data_A,
                                      jnp.asarray(idx_A), axis=0)
                visualize_cycle(opt, real_A, visuals, epoch,
                                epoch_iter // opt.batchSize, train=True)
                dev_data = next(dev_cycle)
                dev_A, dev_B = dev_data["A"], dev_data["B"]
                dev_z = model.sample_prior_z(dev_A.shape[0])
                dev_visuals = model.generate_cycle(jnp.asarray(dev_A),
                                                   jnp.asarray(dev_B), dev_z)
                visualize_cycle(opt, dev_A, dev_visuals, epoch,
                                epoch_iter // opt.batchSize, train=False)
                visualize_multi(opt, dev_A, model, epoch,
                                epoch_iter // opt.batchSize)
                if vis_inf:
                    visualize_inference(opt, dev_A, dev_B, model, epoch,
                                        epoch_iter // opt.batchSize)

            if opt.print_freq and total_steps % opt.print_freq == 0:
                sec_per_item, img_per_sec, _, _ = timer.window(
                    sync_array=losses["D_A"])
                print_log(out_f, format_log(epoch, epoch_iter, losses,
                                            sec_per_item))
                if opt.supervised:
                    print_log(out_f, format_log(epoch, epoch_iter, sup_losses,
                                                sec_per_item, prefix=False))
                if opt.monitor_gnorm:
                    print_log(out_f, format_log(epoch, epoch_iter, gnorms,
                                                sec_per_item, prefix=False)
                              + "\n")
                print_log(out_f, "  throughput: %.1f images/sec" % img_per_sec)

        if trace_active:
            # first epoch ended before batch 14 — close the trace cleanly
            jax.profiler.stop_trace()
            trace_active = False
            print_log(out_f, "profiler trace written to %s" % opt.profile_dir)

        if opt.save_epoch_freq and epoch % opt.save_epoch_freq == 0:
            print_log(out_f, "saving the model at the end of epoch %d, "
                      "iters %d" % (epoch, total_steps))
            model.save("latest", async_save=True)

        # ----- evaluate mappings (reference train.py:256-305) -----------
        # freq 0 disables a cadence entirely (the reference's ints are always
        # >=1; 0 would crash its modulo too — here it means 'never')
        if opt.eval_A_freq and epoch % opt.eval_A_freq == 0:
            t = time.time()
            dev_mse_A = eval_mse_A(dev_dataset, model)
            test_mse_A = eval_mse_A(test_dataset, model)
            t = time.time() - t
            history_mse_A.append((dev_mse_A, test_mse_A))
            np.save(os.path.join(opt.expr_dir, "history_mse_A"),
                    history_mse_A)
            res_str_list = ["[%d] DEV_MSE_A: %.4f, TEST_MSE_A: %.4f, "
                            "TIME: %.4f" % (epoch, dev_mse_A, test_mse_A, t)]
            if dev_mse_A < results["best_dev_mse_A"]:
                with open(os.path.join(opt.expr_dir, "best_mse_A.txt"),
                          "w") as f:
                    f.write(res_str_list[0] + "\n")
                results["best_dev_mse_A"] = dev_mse_A
                results["best_test_mse_A"] = test_mse_A
                model.save("best_A")
                save_results(opt.expr_dir, results)
                res_str_list += ["*** BEST DEV A ***"]
            print_log(out_f, "\n".join(["-" * 60] + res_str_list + ["-" * 60]))

        if opt.eval_B_freq and epoch % opt.eval_B_freq == 0:
            t = time.time()
            steps = 1 if opt.model == "cycle_gan" else 50
            dev_ubo_B, dev_bpp_B, dev_kld_B = eval_ubo_B(
                dev_dataset, model, steps, True, "pred_B_%d" % epoch,
                opt.vis_pred_B)
            test_ubo_B, test_bpp_B, test_kld_B = eval_ubo_B(
                test_dataset, model, steps, False, "pred_B", opt.vis_pred_B)
            t = time.time() - t
            history_ubo_B.append((dev_ubo_B, dev_bpp_B, dev_kld_B,
                                  test_ubo_B, test_bpp_B, test_kld_B))
            np.save(os.path.join(opt.expr_dir, "history_ubo_B"),
                    history_ubo_B)
            res_str_list = ["[%d] DEV_BPP_B: %.4f, TEST_BPP_B: %.4f, "
                            "TIME: %.4f" % (epoch, dev_bpp_B, test_bpp_B, t)]
            if dev_bpp_B < results["best_dev_bpp_B"]:
                with open(os.path.join(opt.expr_dir, "best_bpp_B.txt"),
                          "w") as f:
                    f.write(res_str_list[0] + "\n")
                results["best_dev_bpp_B"] = dev_bpp_B
                results["best_test_bpp_B"] = test_bpp_B
                save_results(opt.expr_dir, results)
                model.save("best_B")
                res_str_list += ["*** BEST BPP B ***"]
            print_log(out_f, "\n".join(["-" * 60] + res_str_list + ["-" * 60]))

        print_log(out_f, "End of epoch %d / %d \t Time Taken: %d sec"
                  % (epoch, opt.niter + opt.niter_decay,
                     time.time() - epoch_start_time))

        if epoch > opt.niter:
            model.update_learning_rate()

    model.wait_for_saves()
    # Drain the async dispatch queue before returning: with every print/
    # eval/save cadence disabled nothing in the loop ever fetches a result,
    # so enqueued steps could still be executing when train_model returns —
    # wall-clock timings around this call (benchmarks/loop_bench.py) would
    # otherwise leak tail work into the caller.
    if "losses" in dir():  # device programs complete in dispatch order, so
        float(np.asarray(losses[next(iter(losses))]))  # this drains them all
    out_f.close()
    return model


if __name__ == "__main__":
    train_model()
