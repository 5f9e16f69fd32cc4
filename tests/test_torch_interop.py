"""Checkpoint interop tests: reference torch checkpoints <-> TrainState.

The oracle is tests/torch_reference_fixture.py — torch modules with the
reference's exact state_dict naming and forward math.  A checkpoint written
by the fixture is byte-compatible with one written by the reference
(model.py:293-303/750-764), so import parity here is import parity there.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from domain_transfer_gan_tpu.config import TrainConfig
from domain_transfer_gan_tpu.models import create_model
from domain_transfer_gan_tpu.utils.torch_interop import (
    export_torch_checkpoint,
    import_torch_checkpoint,
)

from torch_reference_fixture import build_reference_nets, reference_checkpoint

ZDIM = 16


def _cfg(model="aug_cycle_gan"):
    cfg = TrainConfig(model=model, grid_size=64, ngf=8, ndf=8, nef=8,
                      nlatent=ZDIM, batchSize=4, monitor_gnorm=False, seed=0)
    cfg.expr_dir = ""
    return cfg


def _nhwc(x):
    return np.transpose(x.detach().numpy(), (0, 2, 3, 1))


@pytest.fixture(scope="module")
def imported(tmp_path_factory):
    """Fixture nets + a model with the fixture's checkpoint imported."""
    nets = build_reference_nets(zdim=ZDIM, ngf=8, ndf=8, nef=8, seed=11)
    ckpt = reference_checkpoint(nets, aug=True, adam_steps=3)
    path = str(tmp_path_factory.mktemp("interop") / "latest")
    torch.save(ckpt, path)
    model = create_model(_cfg(), testing=True)
    report = import_torch_checkpoint(path, model)
    assert any("netG_A_B" in r for r in report)
    return nets, ckpt, model


def test_import_generator_AB_forward_parity(imported):
    nets, _, model = imported
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    z = rng.randn(2, ZDIM).astype(np.float32)
    with torch.no_grad():
        ref = nets["netG_A_B"](torch.from_numpy(x),
                               torch.from_numpy(z[:, :, None, None]))
    got = np.asarray(model.predict_B(np.transpose(x, (0, 2, 3, 1)), z))
    np.testing.assert_allclose(got, _nhwc(ref), atol=2e-4, rtol=1e-3)


def test_import_generator_BA_forward_parity(imported):
    nets, _, model = imported
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = nets["netG_B_A"](torch.from_numpy(x))
    got = np.asarray(model.predict_A(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, _nhwc(ref), atol=2e-4, rtol=1e-3)


def test_import_discriminators_forward_parity(imported):
    nets, _, model = imported
    rng = np.random.RandomState(2)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    xj = np.transpose(x, (0, 2, 3, 1))
    with torch.no_grad():
        ref_A = nets["netD_A"](torch.from_numpy(x))
        ref_B = nets["netD_B"](torch.from_numpy(x))
    got_A = np.asarray(model._apply("netD_A", xj))
    got_B = np.asarray(model._apply("netD_B", xj))
    np.testing.assert_allclose(got_A[..., 0], ref_A.numpy()[:, 0],
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got_B[..., 0], ref_B.numpy()[:, 0],
                               atol=2e-4, rtol=1e-3)


def test_import_encoder_and_latent_D_running_stats(imported):
    """Eval-mode forwards exercise the imported BatchNorm running stats."""
    nets, _, model = imported
    rng = np.random.RandomState(3)
    ab = rng.uniform(-1, 1, (4, 6, 64, 64)).astype(np.float32)
    z = rng.randn(4, ZDIM).astype(np.float32)
    model.eval()
    nets["netE_B"].eval()
    nets["netD_z_B"].eval()
    try:
        with torch.no_grad():
            mu_t, lv_t = nets["netE_B"](torch.from_numpy(ab))
            dz_t = nets["netD_z_B"](torch.from_numpy(z))
        mu_j, lv_j = model._apply("netE_B", np.transpose(ab, (0, 2, 3, 1)))
        dz_j = model._apply("netD_z_B", z)
        np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(),
                                   atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(dz_j), dz_t.numpy(),
                                   atol=2e-4, rtol=1e-3)
    finally:
        model.train()


def test_import_adam_moments(imported):
    nets, ckpt, model = imported
    # netG_B_A is optimizer_G_A's whole group: first tensor is conv0.weight
    st = ckpt["optimizer_G_A"]["state"]
    first = st[min(st.keys())]
    ost = model.state.opt_state["netG_B_A"]
    assert int(np.asarray(ost.count)) == int(first["step"])
    got = np.asarray(ost.mu["conv0"]["kernel"])
    want = np.transpose(first["exp_avg"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, atol=1e-7)
    # second-moment leaf too
    got2 = np.asarray(ost.nu["conv0"]["kernel"])
    want2 = np.transpose(first["exp_avg_sq"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got2, want2, atol=1e-7)


def test_export_keys_match_reference_naming(imported, tmp_path):
    """Exported state dicts must be loadable by reference-shaped modules
    (only torch>=1.0's num_batches_tracked may be missing)."""
    nets, _, model = imported
    out = str(tmp_path / "export.pt")
    export_torch_checkpoint(model, out)
    ex = torch.load(out, weights_only=False)
    for name, net in nets.items():
        missing, unexpected = net.load_state_dict(ex[name], strict=False)
        assert not unexpected, (name, unexpected)
        assert all("num_batches_tracked" in k for k in missing), (name, missing)
    for k in ("optimizer_G_A", "optimizer_G_B", "optimizer_D_A",
              "optimizer_D_B"):
        assert ex[k]["param_groups"][0]["params"] == sorted(ex[k]["state"])


def test_export_import_round_trip(imported, tmp_path):
    """export -> import into a fresh model reproduces every leaf."""
    import jax

    _, _, model = imported
    out = str(tmp_path / "roundtrip.pt")
    export_torch_checkpoint(model, out)
    other = create_model(_cfg(), testing=True)
    import_torch_checkpoint(out, other)
    for a, b in zip(jax.tree_util.tree_leaves(model.state.params),
                    jax.tree_util.tree_leaves(other.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(model.state.batch_stats),
                    jax.tree_util.tree_leaves(other.state.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(model.state.opt_state),
                    jax.tree_util.tree_leaves(other.state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_import_cli_end_to_end(imported, tmp_path):
    """CLI: torch checkpoint + opt dump -> native checkpoint loadable by
    model.load, then --export back to torch."""
    import dataclasses
    import json

    import jax

    from domain_transfer_gan_tpu.cli.import_torch import main as cli_main

    nets, ckpt, model = imported
    expr = tmp_path / "ref_expr"
    expr.mkdir()
    torch.save(ckpt, str(expr / "latest"))
    with open(expr / "opt.json", "w") as f:
        json.dump(dataclasses.asdict(_cfg()), f)

    assert cli_main(["--torch_chk", str(expr / "latest"),
                     "--out", str(tmp_path / "jax_expr" / "latest")]) == 0
    loaded = create_model(_cfg(), testing=True)
    loaded.load(str(tmp_path / "jax_expr" / "latest"))
    for a, b in zip(jax.tree_util.tree_leaves(model.state.params),
                    jax.tree_util.tree_leaves(loaded.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    with open(tmp_path / "jax_expr" / "opt.json", "w") as f:
        json.dump(dataclasses.asdict(_cfg()), f)
    assert cli_main(["--export", "--chk", str(tmp_path / "jax_expr" / "latest"),
                     "--torch_out", str(tmp_path / "back.pt")]) == 0
    back = torch.load(str(tmp_path / "back.pt"), weights_only=False)
    np.testing.assert_allclose(
        back["netG_A_B"]["model.1.weight"].numpy(),
        ckpt["netG_A_B"]["model.1.weight"].numpy(), atol=1e-7)


def test_import_stoch_variant(tmp_path):
    nets = build_reference_nets(zdim=ZDIM, ngf=8, ndf=8, seed=21, aug=False)
    ckpt = reference_checkpoint(nets, aug=False, adam_steps=2)
    path = str(tmp_path / "stoch")
    torch.save(ckpt, path)
    model = create_model(_cfg("stoch_cycle_gan"), testing=True)
    import_torch_checkpoint(path, model)
    rng = np.random.RandomState(5)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    z = rng.randn(2, ZDIM).astype(np.float32)
    with torch.no_grad():
        ref = nets["netG_A_B"](torch.from_numpy(x),
                               torch.from_numpy(z[:, :, None, None]))
    got = np.asarray(model.predict_B(np.transpose(x, (0, 2, 3, 1)), z))
    np.testing.assert_allclose(got, _nhwc(ref), atol=2e-4, rtol=1e-3)
    # shared-group optimizer: netG_A_B and netG_B_A split optimizer_G
    assert int(np.asarray(model.state.opt_state["netG_A_B"].count)) == 2
    assert int(np.asarray(model.state.opt_state["netG_B_A"].count)) == 2


def test_imported_checkpoint_resumes_training(imported, tmp_path):
    """Full migration journey: a reference-format torch checkpoint becomes
    a native checkpoint that the train CLI RESUMES from (--continue_train),
    training onward from the imported weights."""
    import dataclasses
    import json
    import os

    from domain_transfer_gan_tpu.cli.import_torch import main as cli_main
    from domain_transfer_gan_tpu.cli.train import train_model
    from domain_transfer_gan_tpu.data.synthetic import write_synthetic_dataset

    nets, ckpt, model = imported
    root = tmp_path / "ds"
    write_synthetic_dataset(str(root), 48)

    expr = tmp_path / "ckpts" / "migrated"
    expr.mkdir(parents=True)
    torch.save(ckpt, str(tmp_path / "ref_latest"))
    with open(tmp_path / "opt.json", "w") as f:
        json.dump(dataclasses.asdict(_cfg()), f)
    assert cli_main(["--torch_chk", str(tmp_path / "ref_latest"),
                     "--out", str(expr / "latest")]) == 0

    trained = train_model(argv=[
        "--dataroot", str(root), "--name", "migrated",
        "--checkpoints_dir", str(tmp_path / "ckpts"), "--grid_size", "64",
        "--batchSize", "4", "--ngf", "8", "--nef", "8", "--ndf", "8",
        "--nlatent", str(ZDIM), "--niter", "1", "--niter_decay", "0",
        "--print_freq", "8", "--display_freq", "999999",
        "--save_epoch_freq", "1", "--seed", "5", "--dev_size", "8",
        "--num_devices", "1", "--eval_B_freq", "99", "--continue_train"])
    # parameters moved on from the imported values (training happened)
    import jax
    moved = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(
                    jax.tree_util.tree_leaves(model.state.params),
                    jax.tree_util.tree_leaves(trained.state.params)))
    assert moved > 0.0
    assert os.path.exists(str(expr / "best_A"))


def test_cross_framework_step_dynamics_parity(tmp_path):
    """The strongest dynamics-parity evidence: starting from IDENTICAL
    weights (fixture checkpoint imported), two consecutive two-phase train
    steps on identical (A, B, prior_z) produce the same losses in the
    torch reference math and this framework — step 2 additionally
    validates that the Adam updates + per-net clipping + updated-D
    ordering of step 1 moved both frameworks' parameters identically.

    Deterministic because the default config has stoch_enc off (posterior
    z = mu, reference model.py:417-419) and no dropout — prior_z is the
    only randomness and it is passed in.
    """
    import itertools

    import torch.nn.functional as F

    nets = build_reference_nets(zdim=ZDIM, ngf=8, ndf=8, nef=8, seed=21)
    ckpt = reference_checkpoint(nets, aug=True, adam_steps=0)
    path = str(tmp_path / "latest")
    torch.save(ckpt, path)
    model = create_model(_cfg(), testing=True)
    import_torch_checkpoint(path, model)

    rng = np.random.RandomState(17)
    A = rng.uniform(-1, 1, (4, 3, 64, 64)).astype(np.float32)
    B = rng.uniform(-1, 1, (4, 3, 64, 64)).astype(np.float32)
    zs = [rng.randn(4, ZDIM).astype(np.float32) for _ in range(2)]

    for net in nets.values():
        net.train()
    # the reference's 4 optimizers (model.py:379-389)
    adam = lambda params, lr: torch.optim.Adam(params, lr=lr,
                                               betas=(0.5, 0.999))
    optG_A = adam(nets["netG_B_A"].parameters(), 2e-4)
    optG_B = adam(itertools.chain(nets["netG_A_B"].parameters(),
                                  nets["netE_B"].parameters()), 2e-4)
    optD_A = adam(nets["netD_A"].parameters(), 2e-4 / 5)
    optD_B = adam(itertools.chain(nets["netD_B"].parameters(),
                                  nets["netD_z_B"].parameters()), 2e-4 / 5)

    def torch_step(z2d):
        tA, tB = torch.from_numpy(A), torch.from_numpy(B)
        z = torch.from_numpy(z2d)[:, :, None, None]
        mse, l1f = F.mse_loss, F.l1_loss
        fake_B = nets["netG_A_B"](tA, z)
        fake_A = nets["netG_B_A"](tB)
        mu, _ = nets["netE_B"](torch.cat([fake_A, tB], 1))
        post_z = mu[:, :, None, None]
        pa_f = nets["netD_A"](fake_A.detach())
        pa_t = nets["netD_A"](tA)
        d_a = 0.5 * (mse(pa_f, torch.zeros_like(pa_f))
                     + mse(pa_t, torch.ones_like(pa_t)))
        pb_f = nets["netD_B"](fake_B.detach())
        pb_t = nets["netD_B"](tB)
        d_b = 0.5 * (mse(pb_f, torch.zeros_like(pb_f))
                     + mse(pb_t, torch.ones_like(pb_t)))
        pz_f = nets["netD_z_B"](post_z.detach().flatten(1))
        pz_t = nets["netD_z_B"](z.flatten(1))
        d_z = 0.5 * (mse(pz_f, torch.zeros_like(pz_f))
                     + mse(pz_t, torch.ones_like(pz_t)))
        optD_A.zero_grad()
        optD_B.zero_grad()
        (d_a + d_b + d_z).backward()
        for m in ("netD_A", "netD_B", "netD_z_B"):
            torch.nn.utils.clip_grad_norm_(nets[m].parameters(), 500.0)
        optD_A.step()
        optD_B.step()
        # G phase vs the UPDATED discriminators (model.py:455-456)
        pa = nets["netD_A"](fake_A)
        g_a = mse(pa, torch.ones_like(pa))
        pb = nets["netD_B"](fake_B)
        g_b = mse(pb, torch.ones_like(pb))
        pz = nets["netD_z_B"](post_z.flatten(1))
        g_z = mse(pz, torch.ones_like(pz))
        rec_A = nets["netG_B_A"](fake_B)
        cyc_A = l1f(rec_A, tA)
        mu2, _ = nets["netE_B"](torch.cat([tA, fake_B], 1))
        cyc_z = l1f(mu2, z.flatten(1))
        rec_B = nets["netG_A_B"](fake_A, post_z)
        cyc_B = l1f(rec_B, tB)
        lg = g_a + g_b + g_z + cyc_A + cyc_B + 0.025 * cyc_z
        optG_A.zero_grad()
        optG_B.zero_grad()
        lg.backward()
        for m in ("netG_A_B", "netG_B_A", "netE_B"):
            torch.nn.utils.clip_grad_norm_(nets[m].parameters(), 500.0)
        optG_A.step()
        optG_B.step()
        return dict(D_A=float(d_a), D_B=float(d_b), D_z_B=float(d_z),
                    G_A=float(g_a), G_B=float(g_b), Cyc_A=float(cyc_A),
                    Cyc_B=float(cyc_B), Cyc_z_B=float(cyc_z))

    Aj = np.ascontiguousarray(np.transpose(A, (0, 2, 3, 1)))
    Bj = np.ascontiguousarray(np.transpose(B, (0, 2, 3, 1)))
    tols = [dict(rtol=2e-3, atol=2e-4),   # step 1: pure forward parity
            dict(rtol=3e-2, atol=3e-3)]   # step 2: through one Adam update
    for i, z2d in enumerate(zs):
        t_losses = torch_step(z2d)
        j_losses = model.train_instance(Aj, Bj, z2d)[0]
        for k, v in t_losses.items():
            assert np.isclose(float(j_losses[k]), v, **tols[i]), \
                (i, k, float(j_losses[k]), v)


def test_cross_framework_decay_boundary_parity(tmp_path):
    """Dynamics parity ACROSS the lr-decay boundary (Q11): the reference's
    update_learning_rate sets every optimizer's param groups — including
    D_A/D_B — to the full decayed lr (model.py:282-291,735-748), i.e. the
    D /5 discount vanishes the moment decay starts.  One pre-decay step,
    the decay, then two post-decay steps must track the torch reference:
    post-decay the D lr jumps ~5x, so a framework that kept lr/5 (the
    round-2 behavior) diverges in the D-dependent losses by step 3.

    Uses the stoch variant (fewest nets -> fastest), niter_decay=2 so the
    decayed lr is half of lr and the D jump is unmistakable (4e-5 -> 1e-4).
    """
    import itertools

    import torch.nn.functional as F

    nets = build_reference_nets(zdim=ZDIM, ngf=8, ndf=8, nef=8, seed=41,
                                aug=False)
    ckpt = reference_checkpoint(nets, aug=False, adam_steps=0)
    path = str(tmp_path / "latest")
    torch.save(ckpt, path)
    cfg = _cfg("stoch_cycle_gan")
    cfg.niter_decay = 2
    model = create_model(cfg, testing=True)
    import_torch_checkpoint(path, model)

    rng = np.random.RandomState(47)
    A = rng.uniform(-1, 1, (4, 3, 64, 64)).astype(np.float32)
    B = rng.uniform(-1, 1, (4, 3, 64, 64)).astype(np.float32)
    zs = [rng.randn(4, ZDIM).astype(np.float32) for _ in range(3)]

    for net in nets.values():
        net.train()
    adam = lambda params, lr: torch.optim.Adam(params, lr=lr,
                                               betas=(0.5, 0.999))
    optG = adam(itertools.chain(nets["netG_A_B"].parameters(),
                                nets["netG_B_A"].parameters()), 2e-4)
    optD = adam(itertools.chain(nets["netD_A"].parameters(),
                                nets["netD_B"].parameters()), 2e-4 / 5)

    def torch_step(z2d):
        tA, tB = torch.from_numpy(A), torch.from_numpy(B)
        z = torch.from_numpy(z2d)[:, :, None, None]
        mse, l1f = F.mse_loss, F.l1_loss
        fake_B = nets["netG_A_B"](tA, z)
        fake_A = nets["netG_B_A"](tB)
        pa_f = nets["netD_A"](fake_A.detach())
        pa_t = nets["netD_A"](tA)
        d_a = 0.5 * (mse(pa_f, torch.zeros_like(pa_f))
                     + mse(pa_t, torch.ones_like(pa_t)))
        pb_f = nets["netD_B"](fake_B.detach())
        pb_t = nets["netD_B"](tB)
        d_b = 0.5 * (mse(pb_f, torch.zeros_like(pb_f))
                     + mse(pb_t, torch.ones_like(pb_t)))
        optD.zero_grad()
        (d_a + d_b).backward()
        for m in ("netD_A", "netD_B"):
            torch.nn.utils.clip_grad_norm_(nets[m].parameters(), 500.0)
        optD.step()
        pa = nets["netD_A"](fake_A)
        g_a = mse(pa, torch.ones_like(pa))
        pb = nets["netD_B"](fake_B)
        g_b = mse(pb, torch.ones_like(pb))
        rec_A = nets["netG_B_A"](fake_B)
        cyc_A = l1f(rec_A, tA)
        rec_B = nets["netG_A_B"](fake_A, z)
        cyc_B = l1f(rec_B, tB)
        lg = g_a + g_b + cyc_A + cyc_B
        optG.zero_grad()
        lg.backward()
        for m in ("netG_A_B", "netG_B_A"):
            torch.nn.utils.clip_grad_norm_(nets[m].parameters(), 500.0)
        optG.step()
        return dict(D_A=float(d_a), D_B=float(d_b), G_A=float(g_a),
                    G_B=float(g_b), Cyc_A=float(cyc_A), Cyc_B=float(cyc_B))

    def torch_update_learning_rate(old_lr):
        # the reference's update_learning_rate verbatim semantics
        # (model.py:282-291): EVERY param group gets the decayed lr
        lr = old_lr - 2e-4 / cfg.niter_decay
        for g in optD.param_groups:
            g["lr"] = lr
        for g in optG.param_groups:
            g["lr"] = lr
        return lr

    Aj = np.ascontiguousarray(np.transpose(A, (0, 2, 3, 1)))
    Bj = np.ascontiguousarray(np.transpose(B, (0, 2, 3, 1)))
    tols = [dict(rtol=2e-3, atol=2e-4),    # pre-decay forward parity
            dict(rtol=3e-2, atol=3e-3),    # through 1 Adam update
            dict(rtol=8e-2, atol=8e-3)]    # through 2, incl. the D lr jump
    lr = 2e-4
    for i, z2d in enumerate(zs):
        if i == 1:  # cross the boundary after step 1
            lr = torch_update_learning_rate(lr)
            model.update_learning_rate()
            assert np.isclose(model.old_lr, lr)
            assert np.isclose(model.old_lr_d, lr)  # /5 discount gone
        t_losses = torch_step(z2d)
        j_losses = model.train_instance(Aj, Bj, z2d)[0]
        for k, v in t_losses.items():
            assert np.isclose(float(j_losses[k]), v, **tols[i]), \
                (i, k, float(j_losses[k]), v)


def test_cross_framework_step_dynamics_parity_stoch(tmp_path):
    """Same two-step dynamics parity for the stoch_cycle_gan variant
    (separate step implementation in models/steps.py: no E_B/D_z_B,
    2 optimizers, reference model.py:126-208)."""
    import itertools

    import torch.nn.functional as F

    nets = build_reference_nets(zdim=ZDIM, ngf=8, ndf=8, nef=8, seed=31,
                                aug=False)
    ckpt = reference_checkpoint(nets, aug=False, adam_steps=0)
    path = str(tmp_path / "latest")
    torch.save(ckpt, path)
    model = create_model(_cfg("stoch_cycle_gan"), testing=True)
    import_torch_checkpoint(path, model)

    rng = np.random.RandomState(27)
    A = rng.uniform(-1, 1, (4, 3, 64, 64)).astype(np.float32)
    B = rng.uniform(-1, 1, (4, 3, 64, 64)).astype(np.float32)
    zs = [rng.randn(4, ZDIM).astype(np.float32) for _ in range(2)]

    for net in nets.values():
        net.train()
    adam = lambda params, lr: torch.optim.Adam(params, lr=lr,
                                               betas=(0.5, 0.999))
    optG = adam(itertools.chain(nets["netG_A_B"].parameters(),
                                nets["netG_B_A"].parameters()), 2e-4)
    optD = adam(itertools.chain(nets["netD_A"].parameters(),
                                nets["netD_B"].parameters()), 2e-4 / 5)

    def torch_step(z2d):
        tA, tB = torch.from_numpy(A), torch.from_numpy(B)
        z = torch.from_numpy(z2d)[:, :, None, None]
        mse, l1f = F.mse_loss, F.l1_loss
        fake_B = nets["netG_A_B"](tA, z)
        fake_A = nets["netG_B_A"](tB)
        pa_f = nets["netD_A"](fake_A.detach())
        pa_t = nets["netD_A"](tA)
        d_a = 0.5 * (mse(pa_f, torch.zeros_like(pa_f))
                     + mse(pa_t, torch.ones_like(pa_t)))
        pb_f = nets["netD_B"](fake_B.detach())
        pb_t = nets["netD_B"](tB)
        d_b = 0.5 * (mse(pb_f, torch.zeros_like(pb_f))
                     + mse(pb_t, torch.ones_like(pb_t)))
        optD.zero_grad()
        (d_a + d_b).backward()
        for m in ("netD_A", "netD_B"):
            torch.nn.utils.clip_grad_norm_(nets[m].parameters(), 500.0)
        optD.step()
        pa = nets["netD_A"](fake_A)
        g_a = mse(pa, torch.ones_like(pa))
        pb = nets["netD_B"](fake_B)
        g_b = mse(pb, torch.ones_like(pb))
        rec_A = nets["netG_B_A"](fake_B)
        cyc_A = l1f(rec_A, tA)
        rec_B = nets["netG_A_B"](fake_A, z)
        cyc_B = l1f(rec_B, tB)
        lg = g_a + g_b + cyc_A + cyc_B
        optG.zero_grad()
        lg.backward()
        for m in ("netG_A_B", "netG_B_A"):
            torch.nn.utils.clip_grad_norm_(nets[m].parameters(), 500.0)
        optG.step()
        return dict(D_A=float(d_a), D_B=float(d_b), G_A=float(g_a),
                    G_B=float(g_b), Cyc_A=float(cyc_A), Cyc_B=float(cyc_B))

    Aj = np.ascontiguousarray(np.transpose(A, (0, 2, 3, 1)))
    Bj = np.ascontiguousarray(np.transpose(B, (0, 2, 3, 1)))
    tols = [dict(rtol=2e-3, atol=2e-4), dict(rtol=3e-2, atol=3e-3)]
    for i, z2d in enumerate(zs):
        t_losses = torch_step(z2d)
        j_losses = model.train_instance(Aj, Bj, z2d)[0]
        for k, v in t_losses.items():
            assert np.isclose(float(j_losses[k]), v, **tols[i]), \
                (i, k, float(j_losses[k]), v)


def test_cross_framework_supervised_step_parity(tmp_path):
    """Supervised-step dynamics parity, including the reference's
    shared-optimizer quirk: optimizer_D_B covers netD_B AND netD_z_B
    (model.py:386-389), so the supervised step's optimizer_D_B.step()
    (model.py:559-562) Adam-steps netD_B with ZERO gradients — under
    torch-0.3 zero_grad semantics the decayed moments still move its
    params. Sequence: one unsupervised step (gives netD_B real grads +
    moments, as train.py:206-216 interleaves), then two supervised steps.
    """
    import itertools

    import torch.nn.functional as F

    nets = build_reference_nets(zdim=ZDIM, ngf=8, ndf=8, nef=8, seed=51)
    ckpt = reference_checkpoint(nets, aug=True, adam_steps=0)
    path = str(tmp_path / "latest")
    torch.save(ckpt, path)
    model = create_model(_cfg(), testing=True)
    import_torch_checkpoint(path, model)

    rng = np.random.RandomState(37)
    A = rng.uniform(-1, 1, (4, 3, 64, 64)).astype(np.float32)
    B = rng.uniform(-1, 1, (4, 3, 64, 64)).astype(np.float32)
    zs = [rng.randn(4, ZDIM).astype(np.float32) for _ in range(3)]

    for net in nets.values():
        net.train()
    adam = lambda params, lr: torch.optim.Adam(params, lr=lr,
                                               betas=(0.5, 0.999))
    optG_A = adam(nets["netG_B_A"].parameters(), 2e-4)
    optG_B = adam(itertools.chain(nets["netG_A_B"].parameters(),
                                  nets["netE_B"].parameters()), 2e-4)
    optD_A = adam(nets["netD_A"].parameters(), 2e-4 / 5)
    optD_B = adam(itertools.chain(nets["netD_B"].parameters(),
                                  nets["netD_z_B"].parameters()), 2e-4 / 5)
    mse, l1f = F.mse_loss, F.l1_loss
    tA, tB = torch.from_numpy(A), torch.from_numpy(B)

    def torch_unsup(z2d):
        z = torch.from_numpy(z2d)[:, :, None, None]
        fake_B = nets["netG_A_B"](tA, z)
        fake_A = nets["netG_B_A"](tB)
        mu, _ = nets["netE_B"](torch.cat([fake_A, tB], 1))
        post_z = mu[:, :, None, None]
        pa_f = nets["netD_A"](fake_A.detach())
        pa_t = nets["netD_A"](tA)
        d_a = 0.5 * (mse(pa_f, torch.zeros_like(pa_f))
                     + mse(pa_t, torch.ones_like(pa_t)))
        pb_f = nets["netD_B"](fake_B.detach())
        pb_t = nets["netD_B"](tB)
        d_b = 0.5 * (mse(pb_f, torch.zeros_like(pb_f))
                     + mse(pb_t, torch.ones_like(pb_t)))
        pz_f = nets["netD_z_B"](post_z.detach().flatten(1))
        pz_t = nets["netD_z_B"](z.flatten(1))
        d_z = 0.5 * (mse(pz_f, torch.zeros_like(pz_f))
                     + mse(pz_t, torch.ones_like(pz_t)))
        optD_A.zero_grad()
        optD_B.zero_grad()
        (d_a + d_b + d_z).backward()
        for m in ("netD_A", "netD_B", "netD_z_B"):
            torch.nn.utils.clip_grad_norm_(nets[m].parameters(), 500.0)
        optD_A.step()
        optD_B.step()
        pa = nets["netD_A"](fake_A)
        pb = nets["netD_B"](fake_B)
        pz = nets["netD_z_B"](post_z.flatten(1))
        rec_A = nets["netG_B_A"](fake_B)
        mu2, _ = nets["netE_B"](torch.cat([tA, fake_B], 1))
        rec_B = nets["netG_A_B"](fake_A, post_z)
        lg = (mse(pa, torch.ones_like(pa)) + mse(pb, torch.ones_like(pb))
              + mse(pz, torch.ones_like(pz)) + l1f(rec_A, tA)
              + l1f(rec_B, tB) + 0.025 * l1f(mu2, z.flatten(1)))
        optG_A.zero_grad()
        optG_B.zero_grad()
        lg.backward()
        for m in ("netG_A_B", "netG_B_A", "netE_B"):
            torch.nn.utils.clip_grad_norm_(nets[m].parameters(), 500.0)
        optG_A.step()
        optG_B.step()

    def torch_sup(z2d):
        # reference model.py:541-604 with torch-0.3 zero_grad semantics
        # (set_to_none=False keeps zero .grad tensors on netD_B so the
        # shared optimizer_D_B step moves it via decayed moments)
        z = torch.from_numpy(z2d)[:, :, None, None]
        mu, _ = nets["netE_B"](torch.cat([tA, tB], 1))
        post_z = mu[:, :, None, None]
        pz_f = nets["netD_z_B"](post_z.detach().flatten(1))
        pz_t = nets["netD_z_B"](z.flatten(1))
        d_z = 0.5 * (mse(pz_f, torch.zeros_like(pz_f))
                     + mse(pz_t, torch.ones_like(pz_t)))
        optD_B.zero_grad(set_to_none=False)
        d_z.backward()
        torch.nn.utils.clip_grad_norm_(nets["netD_z_B"].parameters(), 500.0)
        optD_B.step()
        pred_B = nets["netG_A_B"](tA, post_z)
        pred_A = nets["netG_B_A"](tB)
        s_a = l1f(pred_A, tA)
        s_b = l1f(pred_B, tB)
        pz = nets["netD_z_B"](post_z.flatten(1))
        g_z = mse(pz, torch.ones_like(pz))
        lg = 0.1 * s_a + 0.1 * s_b + g_z
        optG_A.zero_grad(set_to_none=False)
        optG_B.zero_grad(set_to_none=False)
        lg.backward()
        for m in ("netG_A_B", "netG_B_A", "netE_B"):
            torch.nn.utils.clip_grad_norm_(nets[m].parameters(), 500.0)
        optG_A.step()
        optG_B.step()
        return dict(S_A=float(s_a), S_B=float(s_b), D_z_B=float(d_z))

    Aj = np.ascontiguousarray(np.transpose(A, (0, 2, 3, 1)))
    Bj = np.ascontiguousarray(np.transpose(B, (0, 2, 3, 1)))

    torch_unsup(zs[0])
    model.train_instance(Aj, Bj, zs[0])
    d_b_before = {k: v.clone() for k, v in nets["netD_B"].state_dict().items()}

    tols = [dict(rtol=5e-3, atol=5e-4), dict(rtol=3e-2, atol=3e-3)]
    for i, z2d in enumerate(zs[1:]):
        t_losses = torch_sup(z2d)
        j_losses = model.supervised_train_instance(Aj, Bj, z2d)
        for k, v in t_losses.items():
            assert np.isclose(float(j_losses[k]), v, **tols[i]), \
                (i, k, float(j_losses[k]), v)

    # the shared-optimizer quirk: netD_B moved despite zero grads, and it
    # moved IDENTICALLY in both frameworks
    moved = max(float((v - d_b_before[k]).abs().max())
                for k, v in nets["netD_B"].state_dict().items())
    assert moved > 0.0, "quirk inactive: netD_B did not move"
    out = str(tmp_path / "export.pt")
    export_torch_checkpoint(model, out)
    ex = torch.load(out, weights_only=False)
    for k, v in nets["netD_B"].state_dict().items():
        if "num_batches_tracked" in k:
            continue
        # atol ~5*lr_d: Adam's first-step update is ±lr per coordinate, so
        # a near-zero-gradient coordinate whose sign differs by fp noise
        # between frameworks lands 2*lr_d apart — not a divergence
        np.testing.assert_allclose(ex["netD_B"][k].numpy(), v.numpy(),
                                   atol=2e-4, rtol=1e-3)


def test_cross_framework_variational_ubo_parity(tmp_path):
    """The variational UBO/BPP eval (reference evaluate.py:21-148, the
    headline quality metric) agrees across frameworks on identical
    imported weights: an 80-step RMSprop-through-the-generator
    optimization lands within tens of nats of the torch oracle on a
    ~100k-nat objective (each arm draws its own dequant/eps noise; the
    observed cross-arm gap matches within-arm rerun noise)."""
    import math

    from domain_transfer_gan_tpu.eval.metrics import variational_ubo

    nets = build_reference_nets(zdim=ZDIM, ngf=8, ndf=8, nef=8, seed=61)
    ckpt = reference_checkpoint(nets, aug=True, adam_steps=0)
    path = str(tmp_path / "latest")
    torch.save(ckpt, path)
    model = create_model(_cfg(), testing=True)
    import_torch_checkpoint(path, model)

    rng = np.random.RandomState(77)
    A = rng.uniform(-1, 1, (4, 3, 64, 64)).astype(np.float32)
    B = rng.uniform(-1, 1, (4, 3, 64, 64)).astype(np.float32)
    STEPS = 80

    torch.manual_seed(5)
    for n in nets.values():
        n.train()
    tA, tB = torch.from_numpy(A), torch.from_numpy(B)
    dequant = torch.zeros_like(tB).uniform_(0, 1.0 / 127.5)
    with torch.no_grad():
        mu0, _ = nets["netE_B"](torch.cat([tA, tB], 1))
    mu = mu0.clone().detach().requires_grad_(True)
    logvar = torch.full((4, ZDIM), math.log(0.01), requires_grad=True)
    logvar_B = torch.full((1, 3, 64, 64), math.log(0.01))
    opt = torch.optim.RMSprop([mu, logvar], lr=1e-2)
    tBd = tB + dequant

    def reparam(mu, logvar):
        std = (0.5 * logvar).exp()
        return torch.clamp(mu + torch.randn_like(std) * std, -4.0, 4.0)

    z = reparam(mu, logvar)
    fake_B = nets["netG_A_B"](tA, z[:, :, None, None])
    for _ in range(STEPS):
        sd = (0.5 * logvar_B).exp()
        lp = (-0.5 * logvar_B - (tBd - fake_B).abs() / sd - math.log(2.0))
        lp = lp.reshape(4, -1).sum(1)
        kld = -0.5 * torch.sum(logvar + 1.0 - mu ** 2 - logvar.exp(), dim=1)
        ubo = (-lp + kld) + 64 * 64 * 3 * math.log(127.5)
        t_ubo, t_kld = float(ubo.mean()), float(kld.mean())
        t_bpp = t_ubo / (64 * 64 * 3 * math.log(2.0))
        opt.zero_grad()
        ubo.mean().backward()
        opt.step()
        z = reparam(mu, logvar)
        fake_B = nets["netG_A_B"](tA, z[:, :, None, None])

    Aj = np.ascontiguousarray(np.transpose(A, (0, 2, 3, 1)))
    Bj = np.ascontiguousarray(np.transpose(B, (0, 2, 3, 1)))
    j_ubo, j_kld, j_bpp = variational_ubo(model, Aj, Bj, STEPS)

    # measured rerun noise within one arm is ~10 nats on ~101k; allow 12x
    assert abs(float(j_ubo) - t_ubo) < 120.0, (float(j_ubo), t_ubo)
    assert abs(float(j_kld) - t_kld) < 3.0, (float(j_kld), t_kld)
    assert abs(float(j_bpp) - t_bpp) < 0.02, (float(j_bpp), t_bpp)


def test_cross_framework_step_dynamics_parity_sigmoid_bce(tmp_path):
    """Two-step dynamics parity in the vanilla-GAN mode (--no_lsgan:
    sigmoid discriminator heads + BCE, reference model.py:56-64): the
    same identical-weights/inputs protocol as the LSGAN test, exercising
    the torch-exact BCE (ops/numerics._bce_probs_torchlike) inside the
    full two-phase step, through one Adam update.

    The fixture D nets emit logits; the torch oracle applies sigmoid
    manually exactly where the reference's use_sigmoid nets place their
    nn.Sigmoid head, so the imported checkpoint (sigmoid adds no params)
    drives both frameworks from identical weights."""
    import itertools

    import torch.nn.functional as F

    nets = build_reference_nets(zdim=ZDIM, ngf=8, ndf=8, nef=8, seed=33)
    ckpt = reference_checkpoint(nets, aug=True, adam_steps=0)
    path = str(tmp_path / "latest")
    torch.save(ckpt, path)
    cfg = TrainConfig(model="aug_cycle_gan", grid_size=64, ngf=8, ndf=8,
                      nef=8, nlatent=ZDIM, batchSize=4, monitor_gnorm=False,
                      no_lsgan=True, seed=0)
    cfg.expr_dir = ""
    assert cfg.use_sigmoid
    model = create_model(cfg, testing=True)
    import_torch_checkpoint(path, model)

    rng = np.random.RandomState(29)
    A = rng.uniform(-1, 1, (4, 3, 64, 64)).astype(np.float32)
    B = rng.uniform(-1, 1, (4, 3, 64, 64)).astype(np.float32)
    zs = [rng.randn(4, ZDIM).astype(np.float32) for _ in range(2)]

    for net in nets.values():
        net.train()
    adam = lambda params, lr: torch.optim.Adam(params, lr=lr,
                                               betas=(0.5, 0.999))
    optG_A = adam(nets["netG_B_A"].parameters(), 2e-4)
    optG_B = adam(itertools.chain(nets["netG_A_B"].parameters(),
                                  nets["netE_B"].parameters()), 2e-4)
    optD_A = adam(nets["netD_A"].parameters(), 2e-4 / 5)
    optD_B = adam(itertools.chain(nets["netD_B"].parameters(),
                                  nets["netD_z_B"].parameters()), 2e-4 / 5)

    def bce(p, real):
        t = torch.ones_like(p) if real else torch.zeros_like(p)
        return F.binary_cross_entropy(p, t)

    def torch_step(z2d):
        tA, tB = torch.from_numpy(A), torch.from_numpy(B)
        z = torch.from_numpy(z2d)[:, :, None, None]
        sig = torch.sigmoid
        l1f = F.l1_loss
        fake_B = nets["netG_A_B"](tA, z)
        fake_A = nets["netG_B_A"](tB)
        mu, _ = nets["netE_B"](torch.cat([fake_A, tB], 1))
        post_z = mu[:, :, None, None]
        d_a = 0.5 * (bce(sig(nets["netD_A"](fake_A.detach())), False)
                     + bce(sig(nets["netD_A"](tA)), True))
        d_b = 0.5 * (bce(sig(nets["netD_B"](fake_B.detach())), False)
                     + bce(sig(nets["netD_B"](tB)), True))
        d_z = 0.5 * (bce(sig(nets["netD_z_B"](post_z.detach().flatten(1))),
                         False)
                     + bce(sig(nets["netD_z_B"](z.flatten(1))), True))
        optD_A.zero_grad()
        optD_B.zero_grad()
        (d_a + d_b + d_z).backward()
        for m in ("netD_A", "netD_B", "netD_z_B"):
            torch.nn.utils.clip_grad_norm_(nets[m].parameters(), 500.0)
        optD_A.step()
        optD_B.step()
        g_a = bce(sig(nets["netD_A"](fake_A)), True)
        g_b = bce(sig(nets["netD_B"](fake_B)), True)
        g_z = bce(sig(nets["netD_z_B"](post_z.flatten(1))), True)
        rec_A = nets["netG_B_A"](fake_B)
        cyc_A = l1f(rec_A, tA)
        mu2, _ = nets["netE_B"](torch.cat([tA, fake_B], 1))
        cyc_z = l1f(mu2, z.flatten(1))
        rec_B = nets["netG_A_B"](fake_A, post_z)
        cyc_B = l1f(rec_B, tB)
        lg = g_a + g_b + g_z + cyc_A + cyc_B + 0.025 * cyc_z
        optG_A.zero_grad()
        optG_B.zero_grad()
        lg.backward()
        for m in ("netG_A_B", "netG_B_A", "netE_B"):
            torch.nn.utils.clip_grad_norm_(nets[m].parameters(), 500.0)
        optG_A.step()
        optG_B.step()
        return dict(D_A=float(d_a), D_B=float(d_b), D_z_B=float(d_z),
                    G_A=float(g_a), G_B=float(g_b), Cyc_A=float(cyc_A),
                    Cyc_B=float(cyc_B), Cyc_z_B=float(cyc_z))

    Aj = np.ascontiguousarray(np.transpose(A, (0, 2, 3, 1)))
    Bj = np.ascontiguousarray(np.transpose(B, (0, 2, 3, 1)))
    tols = [dict(rtol=2e-3, atol=2e-4),   # step 1: pure forward parity
            dict(rtol=3e-2, atol=3e-3)]   # step 2: through one Adam update
    for i, z2d in enumerate(zs):
        t_losses = torch_step(z2d)
        j_losses = model.train_instance(Aj, Bj, z2d)[0]
        for k, v in t_losses.items():
            assert np.isclose(float(j_losses[k]), v, **tols[i]), \
                (i, k, float(j_losses[k]), v)
