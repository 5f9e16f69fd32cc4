"""End-to-end train-step tests for all three model variants and the static
flag combinations (SURVEY.md §7 'Stochastic-encoder branches')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from domain_transfer_gan_tpu.config import TrainConfig
from domain_transfer_gan_tpu.models import create_model


def tiny_cfg(**kw):
    base = dict(model="aug_cycle_gan", grid_size=64, ngf=4, nef=4, ndf=4,
                nlatent=8, batchSize=2, use_pallas=False, monitor_gnorm=True)
    base.update(kw)
    # expr_dir is post-parse state, not a TrainConfig field — honor the
    # kwarg instead of silently replacing it with ''
    expr_dir = base.pop("expr_dir", "")
    cfg = TrainConfig(**base)
    cfg.expr_dir = expr_dir
    return cfg


def batch(n=2, hw=64, c=3, seed=0):
    rng = np.random.RandomState(seed)
    A = jnp.asarray(rng.uniform(-1, 1, (n, hw, hw, c)).astype(np.float32))
    B = jnp.asarray(rng.uniform(-1, 1, (n, hw, hw, c)).astype(np.float32))
    return A, B


def _leaf_diff(a, b):
    da = jax.tree_util.tree_leaves(a)
    db = jax.tree_util.tree_leaves(b)
    return max((float(jnp.max(jnp.abs(x - y))) for x, y in zip(da, db)),
               default=0.0)


@pytest.mark.parametrize("model", ["cycle_gan", "stoch_cycle_gan",
                                   "aug_cycle_gan"])
def test_variant_step_finite_and_updates(model):
    cfg = tiny_cfg(model=model)
    m = create_model(cfg, testing=True)
    A, B = batch()
    p0 = jax.tree_util.tree_map(jnp.copy, m.state.params)
    out = m.train_instance(A, B)
    losses = out[0]
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{model}.{k} not finite"
    assert _leaf_diff(p0, m.state.params) > 0, "params did not update"
    assert int(m.state.step) == 1


@pytest.mark.parametrize("flags", [
    dict(stoch_enc=True),
    dict(z_gan=0),
    dict(enc_A_B=0),
    dict(no_lsgan=True),
    dict(stoch_enc=True, z_gan=0),
    dict(use_dropout=True),
])
def test_aug_flag_variants(flags):
    cfg = tiny_cfg(**flags)
    m = create_model(cfg, testing=True)
    A, B = batch()
    losses, visuals, gnorms = m.train_instance(A, B)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{flags}: {k} not finite"
    for k in ("real_A", "fake_B", "rec_A", "real_B", "fake_A", "rec_B"):
        assert visuals[k].shape == A.shape


def test_loss_keys_match_reference():
    cfg = tiny_cfg()
    m = create_model(cfg, testing=True)
    A, B = batch()
    losses, _, gnorms = m.train_instance(A, B)
    assert list(losses.keys()) == ["D_A", "G_A", "Cyc_A", "Cyc_z_B",
                                   "KLD_z_B", "D_B", "G_B", "Cyc_B", "D_z_B",
                                   "P_t_A", "P_f_A", "P_t_B", "P_f_B"]
    assert list(gnorms.keys()) == ["gnorm_G_A_B", "gnorm_G_B_A", "gnorm_E_B",
                                   "gnorm_D_B", "gnorm_D_z_B", "gnorm_D_A",
                                   "mu_min", "mu_max", "logvar_min",
                                   "logvar_max"]


def test_stoch_loss_keys_match_reference():
    cfg = tiny_cfg(model="stoch_cycle_gan")
    m = create_model(cfg, testing=True)
    A, B = batch()
    losses, _, gnorms = m.train_instance(A, B)
    assert list(losses.keys()) == ["D_A", "G_A", "Cyc_A", "D_B", "G_B",
                                   "Cyc_B", "P_t_A", "P_f_A", "P_t_B", "P_f_B"]


def test_cycle_gan_ignores_noise():
    """z is forced to 1: two different prior_z give identical losses."""
    A, B = batch()
    cfg = tiny_cfg(model="cycle_gan", seed=7)
    m1 = create_model(cfg, testing=True)
    z1 = jnp.full((2, 8), 5.0)
    l1, _, _ = m1.train_instance(A, B, z1)
    m2 = create_model(tiny_cfg(model="cycle_gan", seed=7), testing=True)
    z2 = jnp.full((2, 8), -3.0)
    l2, _, _ = m2.train_instance(A, B, z2)
    for k in l1:
        assert np.isclose(float(l1[k]), float(l2[k]), rtol=1e-5), k


def test_batch_stats_update_in_aug_step():
    cfg = tiny_cfg()
    m = create_model(cfg, testing=True)
    s0 = jax.tree_util.tree_map(jnp.copy, m.state.batch_stats["netE_B"])
    A, B = batch()
    m.train_instance(A, B)
    assert _leaf_diff(s0, m.state.batch_stats["netE_B"]) > 0


def test_supervised_step_runs():
    cfg = tiny_cfg(supervised=True)
    m = create_model(cfg, testing=True)
    A, B = batch()
    m.train_instance(A, B)
    losses = m.supervised_train_instance(A, B)
    assert list(losses.keys()) == ["S_A", "S_B", "KLD_z_B", "D_z_B",
                                   "gnorm_G_A_B", "gnorm_G_B_A", "gnorm_E_B",
                                   "gnorm_D_z_B"]
    for k, v in losses.items():
        assert np.isfinite(float(v))


def test_d_lr_is_fifth_of_g_lr():
    """One step from identical grads should move D params ~1/5 as far as G
    params would at the same gradient — verified indirectly through the Adam
    step size bound lr * (1 ± eps): first Adam step is ~ lr * sign(g)."""
    cfg = tiny_cfg(model="stoch_cycle_gan", lr=1e-3)
    m = create_model(cfg, testing=True)
    p0 = jax.tree_util.tree_map(jnp.copy, m.state.params)
    A, B = batch()
    m.train_instance(A, B)
    # first-step Adam update magnitude is ~lr per coordinate where grad != 0
    dG = _leaf_diff(p0["netG_A_B"], m.state.params["netG_A_B"])
    dD = _leaf_diff(p0["netD_B"], m.state.params["netD_B"])
    assert dG <= 1e-3 * 1.5
    assert dD <= 1e-3 / 5 * 1.5
    assert dD > 0


def test_d_lr_decay_schedule_q11(tmp_path):
    """Q11: the reference's update_learning_rate sets EVERY optimizer —
    including D — to the full decayed lr (model.py:282-291,735-748), so D's
    initial /5 discount exists only until decay starts.  Default mode is
    reference-faithful; --d_lr_mode ratio keeps the /5 scaling.  Restoring
    a checkpoint re-derives the D lr from old_lr on either side of the
    decay boundary."""
    cfg = tiny_cfg(model="stoch_cycle_gan", lr=1e-3, niter_decay=10)
    m = create_model(cfg, testing=True)
    assert np.isclose(m.old_lr_d, 1e-3 / 5)
    m.update_learning_rate()
    assert np.isclose(m.old_lr, 1e-3 - 1e-4)
    assert np.isclose(m.old_lr_d, m.old_lr)  # discount gone at decay start

    ratio = tiny_cfg(model="stoch_cycle_gan", lr=1e-3, niter_decay=10,
                     d_lr_mode="ratio")
    m2 = create_model(ratio, testing=True)
    m2.update_learning_rate()
    assert np.isclose(m2.old_lr_d, m2.old_lr / 5)

    # checkpoint round-trips re-derive lr_d: post-decay -> full lr,
    # pre-decay -> lr/5
    cfg.expr_dir = str(tmp_path)
    m.opt.expr_dir = str(tmp_path)
    m.save("decayed")
    m3 = create_model(tiny_cfg(model="stoch_cycle_gan", lr=1e-3,
                               niter_decay=10, seed=5), testing=True)
    m3.load(str(tmp_path / "decayed"))
    assert np.isclose(m3.old_lr_d, m3.old_lr) and m3.old_lr < 1e-3
    m4 = create_model(tiny_cfg(model="stoch_cycle_gan", lr=1e-3,
                               niter_decay=10, seed=6), testing=True)
    m4.opt.expr_dir = str(tmp_path)
    m4.save("fresh")
    m5 = create_model(tiny_cfg(model="stoch_cycle_gan", lr=1e-3,
                               niter_decay=10, seed=7), testing=True)
    m5.load(str(tmp_path / "fresh"))
    assert np.isclose(m5.old_lr_d, 1e-3 / 5)


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    cfg.expr_dir = str(tmp_path)
    m = create_model(cfg, testing=True)
    A, B = batch()
    m.train_instance(A, B)
    m.save("latest")

    m2 = create_model(tiny_cfg(seed=123), testing=True)
    m2.opt.expr_dir = str(tmp_path)
    m2.load(str(tmp_path / "latest"))
    assert _leaf_diff(m.state.params, m2.state.params) == 0.0
    assert _leaf_diff(m.state.opt_state, m2.state.opt_state) == 0.0
    # resumed training continues deterministically given same inputs/keys
    assert int(m2.state.step) == int(m.state.step)


def test_checkpoint_roundtrip_orbax(tmp_path):
    """--ckpt_backend orbax writes checkpoint dirs; loads auto-detect the
    backend by path type, including the async save path."""
    cfg = tiny_cfg(ckpt_backend="orbax")
    cfg.expr_dir = str(tmp_path)
    m = create_model(cfg, testing=True)
    A, B = batch()
    m.train_instance(A, B)
    m.epoch = 5
    m.save("latest", async_save=True)
    m.wait_for_saves()
    assert (tmp_path / "latest").is_dir()

    m2 = create_model(tiny_cfg(seed=123), testing=True)  # default backend
    m2.opt.expr_dir = str(tmp_path)
    m2.load(str(tmp_path / "latest"))
    assert _leaf_diff(m.state.params, m2.state.params) == 0.0
    assert _leaf_diff(m.state.opt_state, m2.state.opt_state) == 0.0
    assert m2.epoch == 5 and int(m2.state.step) == int(m.state.step)


def test_generation_api():
    cfg = tiny_cfg()
    m = create_model(cfg, testing=True)
    A, B = batch()
    z = m.sample_prior_z(2)
    vis = m.generate_cycle(A, B, z)
    assert list(vis.keys()) == ["real_A", "fake_B", "rec_A", "real_B",
                                "fake_A", "rec_B"]
    multi_z = m.sample_prior_z(6)  # 3 z's per sample
    out = m.generate_multi(A, multi_z)
    assert out.shape == (6, 64, 64, 3)
    fake_A, multi_fake_B = m.generate_cycle_B_multi(B, multi_z)
    assert fake_A.shape == B.shape and multi_fake_B.shape == (6, 64, 64, 3)
    imgs = m.generate_multi_cycle(B, steps=2)
    assert len(imgs) == 5
    rec = m.generate_noisy_cycle(B, std=1.0)
    assert rec.shape == B.shape
    inf = m.inference_multi(A, B)
    assert inf.shape == (4, 64, 64, 3)
    params = m.predict_enc_params(A, B)
    assert params[0].shape == (2, 8)


def test_same_seed_same_losses():
    """Seeded determinism: identical cfg/seed/data -> identical loss
    sequences (SURVEY.md §7 'Seeded determinism')."""
    A, B = batch()
    seqs = []
    for _ in range(2):
        m = create_model(tiny_cfg(seed=99), testing=True)
        losses = []
        for _ in range(2):
            l, _, _ = m.train_instance(A, B)
            losses.append({k: float(v) for k, v in l.items()})
        seqs.append(losses)
    for l1, l2 in zip(*seqs):
        for k in l1:
            assert l1[k] == l2[k], k


def test_concat_d_scoring_grad_equivalence():
    """The concatenated fake|real discriminator forward must produce the
    same loss and (up to reduction reassociation) the same gradients as
    two separate forwards — the invariant behind the concat optimization."""
    import functools
    from domain_transfer_gan_tpu.models.state import init_state
    from domain_transfer_gan_tpu.models.steps import apply_net
    from domain_transfer_gan_tpu.ops.numerics import criterion_gan

    gan = functools.partial(criterion_gan, use_sigmoid=False)
    cfg = tiny_cfg()
    nets, state = init_state(cfg, jax.random.PRNGKey(0), image_size=64)
    A, B = batch(4, seed=9)
    p, st = state.params["netD_B"], state.batch_stats["netD_B"]

    def loss_sep(p):
        pf, _ = apply_net(nets["netD_B"], p, st, A)
        pt, _ = apply_net(nets["netD_B"], p, st, B)
        return 0.5 * (gan(pf, False) + gan(pt, True))

    def loss_cat(p):
        pr, _ = apply_net(nets["netD_B"], p, st,
                          jnp.concatenate([A, B], axis=0))
        pf, pt = jnp.split(pr, 2, axis=0)
        return 0.5 * (gan(pf, False) + gan(pt, True))

    l1, g1 = jax.jit(jax.value_and_grad(loss_sep))(p)
    l2, g2 = jax.jit(jax.value_and_grad(loss_cat))(p)
    assert np.isclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_shared_forward_vjp_grad_equivalence():
    """The vjp-restructured G grads (shared phase-0 forward + pullback)
    must equal the naive formulation that re-runs the forwards inside the
    loss.  Checked on the stoch step's G objective with frozen D."""
    import functools
    from domain_transfer_gan_tpu.models.state import init_state
    from domain_transfer_gan_tpu.models.steps import apply_net
    from domain_transfer_gan_tpu.ops.numerics import criterion_gan, l1_loss

    gan = functools.partial(criterion_gan, use_sigmoid=False)
    cfg = tiny_cfg(model="stoch_cycle_gan")
    nets, state = init_state(cfg, jax.random.PRNGKey(1), image_size=64)
    A, B = batch(2, seed=10)
    z = jnp.asarray(np.random.RandomState(3).randn(2, 8).astype(np.float32))
    p, stats = state.params, state.batch_stats

    def g_obj(gp, fb, fa):
        pf_A, _ = apply_net(nets["netD_A"], p["netD_A"], stats["netD_A"], fa)
        pf_B, _ = apply_net(nets["netD_B"], p["netD_B"], stats["netD_B"], fb)
        rec_A, _ = apply_net(nets["netG_B_A"], gp["netG_B_A"],
                             stats["netG_B_A"], fb)
        rec_B, _ = apply_net(nets["netG_A_B"], gp["netG_A_B"],
                             stats["netG_A_B"], fa, z)
        return (gan(pf_A, True) + gan(pf_B, True)
                + l1_loss(rec_A, A) + l1_loss(rec_B, B))

    def shared(gp):
        fb, _ = apply_net(nets["netG_A_B"], gp["netG_A_B"],
                          stats["netG_A_B"], A, z)
        fa, _ = apply_net(nets["netG_B_A"], gp["netG_B_A"],
                          stats["netG_B_A"], B)
        return fb, fa

    gp = {k: p[k] for k in ("netG_A_B", "netG_B_A")}

    # naive: recompute the forwards inside the loss (round-1 structure)
    def naive_loss(gp):
        fb, fa = shared(gp)
        return g_obj(gp, fb, fa)
    g_naive = jax.jit(jax.grad(naive_loss))(gp)

    # restructured: primals once + pullback, direct grads added
    @jax.jit
    def restructured(gp):
        (fb, fa), pullback = jax.vjp(shared, gp)
        (d_fakes, g_direct) = jax.grad(
            lambda fakes, gp2: g_obj(gp2, *fakes), argnums=(0, 1))(
            (fb, fa), gp)
        (g_shared,) = pullback(d_fakes)
        return jax.tree_util.tree_map(jnp.add, g_shared, g_direct)
    g_new = restructured(gp)

    for a, b in zip(jax.tree_util.tree_leaves(g_naive),
                    jax.tree_util.tree_leaves(g_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_batch_norm_variant_step():
    """--norm batch puts BatchNorm into G_B_A/D_A/D_B; the step must thread
    their running stats through both phases."""
    cfg = tiny_cfg(norm="batch")
    m = create_model(cfg, testing=True)
    A, B = batch()
    s0 = jax.tree_util.tree_map(jnp.copy, m.state.batch_stats["netG_B_A"])
    losses, _, _ = m.train_instance(A, B)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert _leaf_diff(s0, m.state.batch_stats["netG_B_A"]) > 0
    assert _leaf_diff({}, m.state.batch_stats["netD_B"]) >= 0
    # eval mode uses the running stats without error
    m.eval()
    out = m.predict_A(B)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ema_tracking_and_swap(tmp_path):
    """--ema keeps an EMA shadow of the generator/encoder params inside the
    jitted step: after one step ema = d*p0 + (1-d)*p1; swap_ema exchanges
    live and shadow weights (and back); checkpoints round-trip the shadow."""
    cfg = tiny_cfg(ema=0.5, seed=3)
    cfg.expr_dir = str(tmp_path)
    m = create_model(cfg, testing=True)
    p0 = jax.tree_util.tree_map(np.asarray, m.state.params["netG_A_B"])
    assert set(m.state.ema) == {"netG_A_B", "netG_B_A", "netE_B"}
    assert _leaf_diff(m.state.ema["netG_A_B"], p0) == 0.0

    A, B = batch()
    m.train_instance(A, B)
    p1 = m.state.params["netG_A_B"]
    want = jax.tree_util.tree_map(lambda a, b: 0.5 * a + 0.5 * b, p0, p1)
    assert _leaf_diff(m.state.ema["netG_A_B"], want) < 1e-6
    # discriminators are not EMA-tracked
    assert "netD_A" not in m.state.ema

    # swap: predictions change, swap again restores exactly
    z = m.sample_prior_z(2)
    out_live = np.asarray(m.predict_B(A, z))
    m.swap_ema()
    out_ema = np.asarray(m.predict_B(A, z))
    assert not np.allclose(out_live, out_ema)
    m.swap_ema()
    assert np.allclose(np.asarray(m.predict_B(A, z)), out_live)

    # checkpoint round-trips the shadow
    m.save("latest")
    m2 = create_model(tiny_cfg(ema=0.5, seed=99), testing=True)
    m2.opt.expr_dir = str(tmp_path)
    m2.load(str(tmp_path / "latest"))
    assert _leaf_diff(m.state.ema, m2.state.ema) == 0.0


def test_ema_off_checkpoint_loads_into_ema_model(tmp_path):
    """A pre-EMA checkpoint (no 'ema' entry) still loads when the current
    config enables --ema (fallback reseeds the shadow from the params)."""
    cfg = tiny_cfg(seed=3)
    cfg.expr_dir = str(tmp_path)
    m = create_model(cfg, testing=True)
    A, B = batch()
    m.train_instance(A, B)
    m.save("latest")
    assert not m.state.ema

    m2 = create_model(tiny_cfg(ema=0.9, seed=4), testing=True)
    m2.opt.expr_dir = str(tmp_path)
    m2.load(str(tmp_path / "latest"))
    assert _leaf_diff(m.state.params, m2.state.params) == 0.0
    # the shadow is seeded from the LOADED params (not m2's random init),
    # so --use_ema immediately scores trained weights
    assert m2.state.ema
    for n in m2.state.ema:
        assert _leaf_diff(m2.state.ema[n], m.state.params[n]) == 0.0


def test_ema_mismatch_orbax_checkpoint(tmp_path):
    """The orbax backend tolerates the --ema on/off toggle across
    save/load like the flax-bytes backend does."""
    cfg = tiny_cfg(seed=3, ckpt_backend="orbax")
    cfg.expr_dir = str(tmp_path)
    m = create_model(cfg, testing=True)
    A, B = batch()
    m.train_instance(A, B)
    m.save("latest")
    m.wait_for_saves()

    m2 = create_model(tiny_cfg(ema=0.9, seed=4, ckpt_backend="orbax"),
                      testing=True)
    m2.opt.expr_dir = str(tmp_path)
    m2.load(str(tmp_path / "latest"))
    assert _leaf_diff(m.state.params, m2.state.params) == 0.0
    assert m2.state.ema


# ---------------------------------------------------------------------------
# --remat static-train handling (flax lifted remat needs positional static
# args; dropout / batch-norm branch on `not train` and crash on a tracer)
# ---------------------------------------------------------------------------

def test_remat_with_dropout_initializes_and_steps():
    m = create_model(tiny_cfg(remat=True, use_dropout=True, seed=5),
                     testing=True)
    A, B = batch()
    losses, _, _ = m.train_instance(A, B)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_remat_with_batchnorm_initializes_and_steps():
    m = create_model(tiny_cfg(remat=True, norm="batch", seed=6),
                     testing=True)
    A, B = batch()
    losses, _, _ = m.train_instance(A, B)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


# ---------------------------------------------------------------------------
# --use_dropout generation/eval helpers (train-mode forwards need a dropout
# rng; the reference dumps train-mode visuals with dropout active)
# ---------------------------------------------------------------------------

def test_generation_helpers_with_dropout_train_mode():
    m = create_model(tiny_cfg(use_dropout=True, seed=7), testing=True)
    assert m.training
    A, B = batch()
    z = m.sample_prior_z(2)
    vis = m.generate_cycle(A, B, z)
    for k, v in vis.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    # train-mode dropout draws fresh masks per call -> stochastic outputs
    out1 = m.predict_B(A, z)
    out2 = m.predict_B(A, z)
    assert float(jnp.max(jnp.abs(out1 - out2))) > 0.0
    # eval mode switches dropout off -> deterministic
    m.eval()
    out3 = m.predict_B(A, z)
    out4 = m.predict_B(A, z)
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(out4))


def test_generator_dropout_masks_independent():
    """The two generator forwards of a step must not share dropout masks.

    flax folds the rng with the module path; both generators have
    identically-named submodules, so handing them the SAME key gives
    bit-identical masks (the old bug).  _dropout_rngs_pair splits."""
    from domain_transfer_gan_tpu.models.steps import _dropout_rngs_pair
    from domain_transfer_gan_tpu.nn import networks as N

    net = N.define_G(input_nc=3, output_nc=3, ngf=4, norm="instance",
                     use_dropout=True, n_blocks=1, use_pallas=False)
    x = jnp.asarray(np.random.RandomState(0)
                    .uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x, train=False)

    key = jax.random.PRNGKey(42)
    rngs_ab, rngs_ba = _dropout_rngs_pair(key, True)
    apply = lambda rngs: net.apply(variables, x, True, rngs=rngs,
                                   mutable=["batch_stats"])[0]
    # same key twice -> identical masks (the pitfall)
    np.testing.assert_array_equal(np.asarray(apply({"dropout": key})),
                                  np.asarray(apply({"dropout": key})))
    # the pair -> independent masks
    assert float(jnp.max(jnp.abs(apply(rngs_ab) - apply(rngs_ba)))) > 0.0


# ---------------------------------------------------------------------------
# --pool_size changes across save/resume (the reference never persists a
# pool; a structure/shape mismatch must fall back to fresh pools, not crash)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("backend", ["flax", "orbax"])
@pytest.mark.parametrize("save_pool,load_pool", [(0, 8), (8, 0), (8, 4)])
def test_pool_size_change_across_resume(tmp_path, backend, save_pool,
                                        load_pool):
    cfg = tiny_cfg(model="stoch_cycle_gan", pool_size=save_pool, seed=8,
                   ckpt_backend=backend)
    cfg.expr_dir = str(tmp_path)
    m = create_model(cfg, testing=True)
    A, B = batch()
    m.train_instance(A, B)
    m.save("latest")
    m.wait_for_saves()

    cfg2 = tiny_cfg(model="stoch_cycle_gan", pool_size=load_pool, seed=9,
                    ckpt_backend=backend)
    cfg2.expr_dir = str(tmp_path)
    m2 = create_model(cfg2, testing=True)
    m2.load(str(tmp_path / "latest"))
    # params restore exactly; pools fall back to this config's fresh ones
    assert _leaf_diff(m.state.params, m2.state.params) == 0.0
    assert set(m2.state.pools) == ({"fake_A", "fake_B"} if load_pool
                                   else set())
    for p in m2.state.pools.values():
        assert p.buf.shape[0] == load_pool
        assert int(p.n) == 0
    # and the resumed model still trains
    losses = m2.train_instance(A, B)[0]
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
