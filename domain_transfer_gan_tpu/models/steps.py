"""The two-phase adversarial train steps, compiled to single XLA programs.

This is the TPU-native rebuild of the reference's hot loop
(model.py:126-208 StochCycleGAN, model.py:402-539 AugmentedCycleGAN,
model.py:541-604 supervised step).  The entire D-then-G sequence — shared
forward, discriminator loss/grad/clip/Adam update, then generator losses
scored against the *updated* discriminator (the deliberate ordering noted at
reference model.py:455-456), generator grad/clip/Adam update — is one jitted
function over the TrainState pytree.  There are no per-iteration host syncs;
losses/visuals come back as device arrays the driver fetches lazily.

Semantics preserved exactly:
- same z sample in both phases (the reparametrized posterior is computed with
  one eps and reused; reference computes it once and retains the graph),
- stop_gradient in the D phase where the reference detaches,
- per-network torch-style clipping before Adam.  The D learning rate is its
  OWN dynamic scalar (`lr_d`): the reference initializes D optimizers at
  lr/5 (model.py:112-114,384-389) but update_learning_rate later sets every
  optimizer — including D — to the full decayed lr (model.py:282-291,
  735-748, quirk Q11); models/api.py owns that schedule,
- batch-norm running stats updated once per reference-forward, in reference
  order (training-mode outputs never depend on running stats),
- the phase-0 generator/encoder forward runs exactly ONCE: jax.vjp keeps its
  pullback so the G phase backpropagates through the shared primals instead
  of recomputing them (matching the reference's single-forward graph reuse).

All config switches (stoch_enc / z_gan / enc_A_B / use_sigmoid / ignore_noise)
are Python-static so XLA specializes each of the variants (SURVEY.md §7
"Stochastic-encoder branches").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import TrainConfig
from ..parallel import pipeline as _pipeline
from ..ops.numerics import (
    criterion_gan,
    gauss_reparametrize_eps,
    kld_std_gauss,
    l1_loss,
    log_prob_gaussian,
)
from .pool import pool_query
from .state import TrainState, adam_tx, apply_net_update, ema_update

sg = jax.lax.stop_gradient


def apply_net(net, params, stats, *args, train: bool = True, rngs=None):
    """Run a network, returning (output, updated_batch_stats).

    Uniform across nets with/without batch-norm: nets without it just return
    their (empty) stats unchanged.
    """
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    # pipeline parallelism (trace-time contextvar, parallel.pipeline):
    # generators get their residual trunk injected as a GPipe schedule
    # over the 'pipe' mesh axis; every other net (and inactive context)
    # takes the normal path.
    extra = ()
    eng = _pipeline.active_engine()
    if eng is not None:
        tf = _pipeline.generator_trunk_fn(eng, net, params, train)
        if tf is not None:
            extra = (tf,)
    # train is passed POSITIONALLY: every net takes it as its last
    # positional arg, and flax's lifted remat (--remat) can only mark a
    # positional arg static (static_argnums has no kwarg form), so a
    # train= kwarg would crash remat-wrapped generators at trace time.
    out, mut = net.apply(variables, *args, train, *extra,
                         mutable=["batch_stats"], rngs=rngs)
    return out, mut.get("batch_stats", stats if stats else {})


def _dropout_rngs_pair(key, use_dropout):
    """Independent dropout rngs for the two generator forwards of a phase.

    The torch reference draws every forward's masks from the global RNG
    stream, so G_A_B and G_B_A never share masks; flax folds the rng with
    the module path, and both generators have identically-named submodules
    (block{i}/Dropout_0), so handing them the SAME key would give
    bit-identical masks."""
    if not use_dropout:
        return None, None
    k_ab, k_ba = jax.random.split(key)
    return {"dropout": k_ab}, {"dropout": k_ba}


def flat2d(x):
    """Collapse a discriminator prediction map to (B, -1).

    Numerics-preserving: the GAN criteria mean-reduce over all elements and
    log-sigmoid is elementwise, so losses and gradients are bit-identical.
    It keeps the loss-path tensors free of spatial dims, which stops GSPMD
    from trying to space-shard the [B,1,1,1] global logit of the edges
    discriminator on a data x space mesh (the involuntary-full-remat
    reshard warning in the dp x sp dryrun)."""
    return x.reshape((x.shape[0], -1))


# ---------------------------------------------------------------------------
# StochCycleGAN (also cycle_gan via ignore_noise)  — reference model.py:126-208
# ---------------------------------------------------------------------------

def make_score_pair(nets, concat_d: bool):
    """(fake_pred, real_pred, stats) scorer for an image discriminator: one
    concatenated fake|real forward when norms are per-sample (numerically
    identical, better MXU fill), two forwards otherwise (batch norm couples
    samples across the batch)."""
    def score_pair(name, d_params, d_stats, fake, real):
        if concat_d:
            pred, st = apply_net(nets[name], d_params, d_stats,
                                 jnp.concatenate([fake, real], axis=0))
            pf, pt = jnp.split(pred, 2, axis=0)
            return flat2d(pf), flat2d(pt), st
        pf, st = apply_net(nets[name], d_params, d_stats, fake)
        pt, st = apply_net(nets[name], d_params, st, real)
        return flat2d(pf), flat2d(pt), st
    return score_pair


def make_stoch_train_step(nets, cfg: TrainConfig, ignore_noise: bool):
    tx = adam_tx(cfg.beta1)
    use_sig = cfg.use_sigmoid
    gan = functools.partial(criterion_gan, use_sigmoid=use_sig)
    use_pool = getattr(cfg, "pool_size", 0) > 0
    # With per-sample norms (the default), scoring fake and real through a
    # discriminator in ONE concatenated forward is numerically identical to
    # two forwards and halves the D kernel launches / doubles MXU batch
    # efficiency.  Batch norm couples samples, so fall back there.
    concat_d = cfg.norm != "batch"

    def step(state: TrainState, real_A, real_B, prior_z, lr, lr_d, rng):
        p, stats = state.params, state.batch_stats
        k_drop0, k_drop1, k_poolA, k_poolB = jax.random.split(rng, 4)
        if ignore_noise:
            prior_z = jnp.ones_like(prior_z)  # model.py:128-129

        # ----- shared forward (phase 0), with its pullback kept --------
        # jax.vjp gives the primal fakes for the D phase AND the generator
        # cotangent path for the G phase, so the G_A->B / G_B->A forwards
        # run exactly ONCE per step (the reference reuses its phase-0 graph
        # the same way, model.py:404-407 vs :455-461).
        def shared_fwd(g_params):
            rngs0_ab, rngs0_ba = _dropout_rngs_pair(k_drop0, cfg.use_dropout)
            fake_B, st_GAB = apply_net(nets["netG_A_B"], g_params["netG_A_B"],
                                       stats["netG_A_B"], real_A, prior_z,
                                       rngs=rngs0_ab)
            fake_A, st_GBA = apply_net(nets["netG_B_A"], g_params["netG_B_A"],
                                       stats["netG_B_A"], real_B, rngs=rngs0_ba)
            return (fake_B, fake_A), (st_GAB, st_GBA)

        g_params = {k: p[k] for k in ("netG_A_B", "netG_B_A")}
        (fake_B, fake_A), shared_pullback, (st_GAB, st_GBA) = jax.vjp(
            shared_fwd, g_params, has_aux=True)

        # fake-image pool (opt-in): D trains on a fresh/replayed mix
        pools = dict(state.pools)
        if use_pool:
            pools["fake_A"], d_fake_A = pool_query(state.pools["fake_A"],
                                                   sg(fake_A), k_poolA)
            pools["fake_B"], d_fake_B = pool_query(state.pools["fake_B"],
                                                   sg(fake_B), k_poolB)
        else:
            d_fake_A, d_fake_B = sg(fake_A), sg(fake_B)

        # ----- phase 1: discriminators on detached fakes ---------------
        score_pair = make_score_pair(nets, concat_d)

        def d_loss_fn(d_params):
            pf_A, pt_A, stA = score_pair("netD_A", d_params["netD_A"],
                                         stats["netD_A"], d_fake_A, real_A)
            l_fA, l_tA = gan(pf_A, False), gan(pt_A, True)
            pf_B, pt_B, stB = score_pair("netD_B", d_params["netD_B"],
                                         stats["netD_B"], d_fake_B, real_B)
            l_fB, l_tB = gan(pf_B, False), gan(pt_B, True)
            loss_D_A = 0.5 * (l_fA + l_tA)
            loss_D_B = 0.5 * (l_fB + l_tB)
            aux = dict(loss_D_A=loss_D_A, loss_D_B=loss_D_B,
                       P_t_A=jnp.mean(pt_A), P_t_B=jnp.mean(pt_B),
                       st_D_A=stA, st_D_B=stB)
            return loss_D_A + loss_D_B, aux

        d_params = {k: p[k] for k in ("netD_A", "netD_B")}
        d_grads, d_aux = jax.grad(d_loss_fn, has_aux=True)(d_params)
        new_p, new_opt, gnorms = dict(p), dict(state.opt_state), {}
        for k in ("netD_A", "netD_B"):
            new_p[k], new_opt[k], gnorms["gnorm_" + k[3:]] = apply_net_update(
                tx, p[k], state.opt_state[k], d_grads[k], lr_d, cfg.max_gnorm)

        # ----- phase 2: generators vs the UPDATED discriminators -------
        # The G loss takes the phase-0 fakes as differentiable *inputs*;
        # their cotangents flow back through shared_pullback and sum with
        # the direct grads from the cycle forwards.
        def g_loss_fn(fakes, g_params):
            fb, fa = fakes
            pf_A, stA = apply_net(nets["netD_A"], new_p["netD_A"],
                                  d_aux["st_D_A"], fa)
            loss_G_A = gan(flat2d(pf_A), True)
            pf_B, stB = apply_net(nets["netD_B"], new_p["netD_B"],
                                  d_aux["st_D_B"], fb)
            loss_G_B = gan(flat2d(pf_B), True)
            rngs1_ab, rngs1_ba = _dropout_rngs_pair(k_drop1, cfg.use_dropout)
            rec_A, stGBA = apply_net(nets["netG_B_A"], g_params["netG_B_A"],
                                     st_GBA, fb, rngs=rngs1_ba)
            loss_cycle_A = l1_loss(rec_A, real_A)
            rec_B, stGAB = apply_net(nets["netG_A_B"], g_params["netG_A_B"],
                                     st_GAB, fa, prior_z, rngs=rngs1_ab)
            loss_cycle_B = l1_loss(rec_B, real_B)
            loss_G = (loss_G_A + loss_G_B
                      + loss_cycle_A * cfg.lambda_A + loss_cycle_B * cfg.lambda_B)
            aux = dict(loss_G_A=loss_G_A, loss_G_B=loss_G_B,
                       loss_cycle_A=loss_cycle_A, loss_cycle_B=loss_cycle_B,
                       P_f_A=jnp.mean(pf_A), P_f_B=jnp.mean(pf_B),
                       rec_A=rec_A, rec_B=rec_B,
                       st_D_A=stA, st_D_B=stB, st_GAB=stGAB, st_GBA=stGBA)
            return loss_G, aux

        (d_fakes, g_grads_direct), g_aux = jax.grad(
            g_loss_fn, argnums=(0, 1), has_aux=True)((fake_B, fake_A),
                                                     g_params)
        (g_grads_shared,) = shared_pullback(d_fakes)
        g_grads = jax.tree_util.tree_map(jnp.add, g_grads_shared,
                                         g_grads_direct)
        for k in ("netG_A_B", "netG_B_A"):
            new_p[k], new_opt[k], gnorms["gnorm_" + k[3:]] = apply_net_update(
                tx, p[k], state.opt_state[k], g_grads[k], lr, cfg.max_gnorm)

        new_stats = dict(stats)
        new_stats["netG_A_B"] = g_aux["st_GAB"]
        new_stats["netG_B_A"] = g_aux["st_GBA"]
        new_stats["netD_A"] = g_aux["st_D_A"]
        new_stats["netD_B"] = g_aux["st_D_B"]

        losses = {
            "D_A": d_aux["loss_D_A"], "G_A": g_aux["loss_G_A"],
            "Cyc_A": g_aux["loss_cycle_A"],
            "D_B": d_aux["loss_D_B"], "G_B": g_aux["loss_G_B"],
            "Cyc_B": g_aux["loss_cycle_B"],
            "P_t_A": d_aux["P_t_A"], "P_f_A": g_aux["P_f_A"],
            "P_t_B": d_aux["P_t_B"], "P_f_B": g_aux["P_f_B"],
        }
        visuals = {"real_A": real_A, "fake_B": fake_B,
                   "rec_A": g_aux["rec_A"], "real_B": real_B,
                   "fake_A": fake_A, "rec_B": g_aux["rec_B"]}
        # .replace() keeps any future TrainState fields intact (CLAUDE.md
        # invariant: never rebuild one from scratch)
        new_state = state.replace(params=new_p, batch_stats=new_stats,
                                  opt_state=new_opt, step=state.step + 1,
                                  pools=pools,
                                  ema=ema_update(state.ema, new_p,
                                                 getattr(cfg, "ema", 0.0)))
        return new_state, losses, visuals, gnorms

    return step


# ---------------------------------------------------------------------------
# AugmentedCycleGAN — reference model.py:402-539
# ---------------------------------------------------------------------------

def make_aug_train_step(nets, cfg: TrainConfig):
    tx = adam_tx(cfg.beta1)
    gan = functools.partial(criterion_gan, use_sigmoid=cfg.use_sigmoid)
    stoch_enc = bool(cfg.stoch_enc)
    z_gan = bool(cfg.z_gan)
    enc_A_B = bool(cfg.enc_A_B)
    use_pool = getattr(cfg, "pool_size", 0) > 0
    # one concatenated fake|real forward per image discriminator when the
    # norms are per-sample (exact; see make_stoch_train_step).  netD_z_B
    # uses BatchNorm1d, whose batch coupling forces separate forwards.
    concat_d = cfg.norm != "batch"

    def posterior(e_params, e_stats, a_img, b_img, eps):
        """E_B posterior of z given (A-ish, B); returns (z, mu, raw logvar,
        logvar_eff, updated stats)."""
        enc_in = jnp.concatenate([a_img, b_img], axis=-1) if enc_A_B else b_img
        (mu, logvar), st = apply_net(nets["netE_B"], e_params, e_stats, enc_in)
        if stoch_enc:
            z = gauss_reparametrize_eps(mu, logvar, eps)     # model.py:415-416
            logvar_eff = logvar
        else:
            z = mu                                           # model.py:417-419
            logvar_eff = logvar * 0.0
        return z, mu, logvar, logvar_eff, st

    def step(state: TrainState, real_A, real_B, prior_z, lr, lr_d, rng):
        p, stats = state.params, state.batch_stats
        k_eps, k_drop0, k_drop1, k_poolA, k_poolB = jax.random.split(rng, 5)
        eps_post = jax.random.normal(k_eps, prior_z.shape, prior_z.dtype)

        # ----- shared forward (phase 0), with its pullback kept --------
        # jax.vjp gives the primal fakes/posterior for the D phase AND the
        # generator/encoder cotangent path for the G phase, so G_A->B,
        # G_B->A and E_B each forward exactly ONCE per step (the reference
        # reuses its phase-0 graph the same way, model.py:404-419 vs
        # :455-464).
        def shared_fwd(g_params):
            rngs0_ab, rngs0_ba = _dropout_rngs_pair(k_drop0, cfg.use_dropout)
            fake_B, st_GAB = apply_net(nets["netG_A_B"], g_params["netG_A_B"],
                                       stats["netG_A_B"], real_A, prior_z,
                                       rngs=rngs0_ab)
            fake_A, st_GBA = apply_net(nets["netG_B_A"], g_params["netG_B_A"],
                                       stats["netG_B_A"], real_B, rngs=rngs0_ba)
            post_z, mu, logvar, logvar_eff, st_E = posterior(
                g_params["netE_B"], stats["netE_B"], fake_A, real_B, eps_post)
            return ((fake_B, fake_A, post_z, mu, logvar_eff),
                    (st_GAB, st_GBA, st_E))

        g_names = ("netG_A_B", "netG_B_A", "netE_B")
        g_params = {k: p[k] for k in g_names}
        ((fake_B, fake_A, post_z, mu_r, logvar_r_eff), shared_pullback,
         (st_GAB, st_GBA, st_E)) = jax.vjp(
            shared_fwd, g_params, has_aux=True)

        # fake-image pool (opt-in): D trains on a fresh/replayed mix
        pools = dict(state.pools)
        if use_pool:
            pools["fake_A"], d_fake_A = pool_query(state.pools["fake_A"],
                                                   sg(fake_A), k_poolA)
            pools["fake_B"], d_fake_B = pool_query(state.pools["fake_B"],
                                                   sg(fake_B), k_poolB)
        else:
            d_fake_A, d_fake_B = sg(fake_A), sg(fake_B)

        # ----- phase 1: discriminators on detached inputs --------------
        score_pair = make_score_pair(nets, concat_d)

        def d_loss_fn(d_params):
            pf_A, pt_A, stA = score_pair("netD_A", d_params["netD_A"],
                                         stats["netD_A"], d_fake_A, real_A)
            l_fA, l_tA = gan(pf_A, False), gan(pt_A, True)
            pf_B, pt_B, stB = score_pair("netD_B", d_params["netD_B"],
                                         stats["netD_B"], d_fake_B, real_B)
            l_fB, l_tB = gan(pf_B, False), gan(pt_B, True)
            pz_post, stZ = apply_net(nets["netD_z_B"], d_params["netD_z_B"],
                                     stats["netD_z_B"], sg(post_z))
            l_zpost = gan(pz_post, False)
            pz_prior, stZ = apply_net(nets["netD_z_B"], d_params["netD_z_B"],
                                      stZ, prior_z)
            l_zprior = gan(pz_prior, True)
            loss_D_A = 0.5 * (l_fA + l_tA)
            loss_D_B = 0.5 * (l_fB + l_tB)
            loss_D_z_B = 0.5 * (l_zpost + l_zprior)
            loss_D = loss_D_A + loss_D_B
            if z_gan and not stoch_enc:                      # model.py:438-439
                loss_D = loss_D + loss_D_z_B
            aux = dict(loss_D_A=loss_D_A, loss_D_B=loss_D_B,
                       loss_D_z_B=loss_D_z_B,
                       P_t_A=jnp.mean(pt_A), P_t_B=jnp.mean(pt_B),
                       st_D_A=stA, st_D_B=stB, st_D_z=stZ)
            return loss_D, aux

        d_names = ("netD_A", "netD_B", "netD_z_B")
        d_params = {k: p[k] for k in d_names}
        d_grads, d_aux = jax.grad(d_loss_fn, has_aux=True)(d_params)
        new_p, new_opt, gnorms = dict(p), dict(state.opt_state), {}
        for k in d_names:
            new_p[k], new_opt[k], gnorms["gnorm_" + k[3:]] = apply_net_update(
                tx, p[k], state.opt_state[k], d_grads[k], lr_d, cfg.max_gnorm)

        # ----- phase 2: generators/encoder vs UPDATED discriminators ---
        # The G loss takes the phase-0 fakes/posterior as differentiable
        # *inputs*; their cotangents flow back through shared_pullback and
        # sum with the direct grads from the cycle/z-cycle forwards.
        def g_loss_fn(fakes, g_params):
            fb, fa, pz, mu2, logvar2_eff = fakes

            pf_A, stA = apply_net(nets["netD_A"], new_p["netD_A"],
                                  d_aux["st_D_A"], fa)
            loss_G_A = gan(flat2d(pf_A), True)
            pf_B, stB = apply_net(nets["netD_B"], new_p["netD_B"],
                                  d_aux["st_D_B"], fb)
            loss_G_B = gan(flat2d(pf_B), True)
            pz_post, stZ = apply_net(nets["netD_z_B"], new_p["netD_z_B"],
                                     d_aux["st_D_z"], pz)
            loss_G_z_B = gan(pz_post, True)

            rngs1_ab, rngs1_ba = _dropout_rngs_pair(k_drop1, cfg.use_dropout)
            rec_A, stGBA = apply_net(nets["netG_B_A"], g_params["netG_B_A"],
                                     st_GBA, fb, rngs=rngs1_ba)
            loss_cycle_A = l1_loss(rec_A, real_A)

            # z-cycle: recover the prior z from (A, fake_B)  model.py:470-487
            enc_in2 = (jnp.concatenate([real_A, fb], axis=-1)
                       if enc_A_B else fb)
            (mu_f, logvar_f), stE = apply_net(nets["netE_B"],
                                              g_params["netE_B"], st_E, enc_in2)
            if stoch_enc:
                lp = log_prob_gaussian(prior_z, mu_f, logvar_f)
                loss_cycle_z_B = -1.0 * jnp.mean(lp)
            else:
                loss_cycle_z_B = l1_loss(mu_f, prior_z)

            kld_z_B = jnp.mean(kld_std_gauss(mu2, logvar2_eff))  # model.py:490

            rec_B, stGAB = apply_net(nets["netG_A_B"], g_params["netG_A_B"],
                                     st_GAB, fa, pz, rngs=rngs1_ab)
            loss_cycle_B = l1_loss(rec_B, real_B)

            loss_cycle = (loss_cycle_A * cfg.lambda_A
                          + loss_cycle_B * cfg.lambda_B
                          + loss_cycle_z_B * cfg.lambda_z_B)
            loss_G = loss_G_A + loss_G_B + loss_cycle
            if stoch_enc:                                    # model.py:501-502
                loss_G = loss_G + kld_z_B * cfg.lambda_z_B
            if z_gan and not stoch_enc:                      # model.py:504-505
                loss_G = loss_G + loss_G_z_B

            aux = dict(loss_G_A=loss_G_A, loss_G_B=loss_G_B,
                       loss_G_z_B=loss_G_z_B, loss_cycle_A=loss_cycle_A,
                       loss_cycle_B=loss_cycle_B, loss_cycle_z_B=loss_cycle_z_B,
                       kld_z_B=kld_z_B, P_f_A=jnp.mean(pf_A),
                       P_f_B=jnp.mean(pf_B),
                       rec_A=rec_A, rec_B=rec_B,
                       st_D_A=stA, st_D_B=stB, st_D_z=stZ, st_E=stE,
                       st_GAB=stGAB, st_GBA=stGBA)
            return loss_G, aux

        (d_fakes, g_grads_direct), g_aux = jax.grad(
            g_loss_fn, argnums=(0, 1), has_aux=True)(
            (fake_B, fake_A, post_z, mu_r, logvar_r_eff), g_params)
        (g_grads_shared,) = shared_pullback(d_fakes)
        g_grads = jax.tree_util.tree_map(jnp.add, g_grads_shared,
                                         g_grads_direct)
        for k in g_names:
            new_p[k], new_opt[k], gnorms["gnorm_" + k[3:]] = apply_net_update(
                tx, p[k], state.opt_state[k], g_grads[k], lr, cfg.max_gnorm)

        new_stats = dict(stats)
        new_stats.update(netG_A_B=g_aux["st_GAB"], netG_B_A=g_aux["st_GBA"],
                         netD_A=g_aux["st_D_A"], netD_B=g_aux["st_D_B"],
                         netD_z_B=g_aux["st_D_z"], netE_B=g_aux["st_E"])

        gnorms.update({
            "mu_min": jnp.min(mu_r), "mu_max": jnp.max(mu_r),
            "logvar_min": jnp.min(logvar_r_eff),
            "logvar_max": jnp.max(logvar_r_eff),
        })
        losses = {
            "D_A": d_aux["loss_D_A"], "G_A": g_aux["loss_G_A"],
            "Cyc_A": g_aux["loss_cycle_A"],
            "Cyc_z_B": g_aux["loss_cycle_z_B"], "KLD_z_B": g_aux["kld_z_B"],
            "D_B": d_aux["loss_D_B"], "G_B": g_aux["loss_G_B"],
            "Cyc_B": g_aux["loss_cycle_B"], "D_z_B": d_aux["loss_D_z_B"],
            "P_t_A": d_aux["P_t_A"], "P_f_A": g_aux["P_f_A"],
            "P_t_B": d_aux["P_t_B"], "P_f_B": g_aux["P_f_B"],
        }
        visuals = {"real_A": real_A, "fake_B": fake_B,
                   "rec_A": g_aux["rec_A"], "real_B": real_B,
                   "fake_A": fake_A, "rec_B": g_aux["rec_B"]}
        # .replace() keeps any future TrainState fields intact (CLAUDE.md
        # invariant: never rebuild one from scratch)
        new_state = state.replace(params=new_p, batch_stats=new_stats,
                                  opt_state=new_opt, step=state.step + 1,
                                  pools=pools,
                                  ema=ema_update(state.ema, new_p,
                                                 getattr(cfg, "ema", 0.0)))
        return new_state, losses, visuals, gnorms

    return step


# ---------------------------------------------------------------------------
# Supervised step (aug only) — reference model.py:541-604
# ---------------------------------------------------------------------------

def make_aug_supervised_step(nets, cfg: TrainConfig):
    tx = adam_tx(cfg.beta1)
    gan = functools.partial(criterion_gan, use_sigmoid=cfg.use_sigmoid)
    stoch_enc = bool(cfg.stoch_enc)
    z_gan = bool(cfg.z_gan)
    enc_A_B = bool(cfg.enc_A_B)

    def step(state: TrainState, real_A, real_B, prior_z, lr, lr_d, rng):
        p, stats = state.params, state.batch_stats
        k_eps, k_drop = jax.random.split(rng)
        eps_post = jax.random.normal(k_eps, prior_z.shape, prior_z.dtype)

        def enc_forward(e_params, e_stats):
            enc_in = (jnp.concatenate([real_A, real_B], axis=-1)
                      if enc_A_B else real_B)
            (mu, logvar), st = apply_net(nets["netE_B"], e_params, e_stats, enc_in)
            if stoch_enc:
                z = gauss_reparametrize_eps(mu, logvar, eps_post)
                logvar_eff = logvar
            else:
                z = mu
                logvar_eff = logvar * 0.0
            return z, mu, logvar_eff, st

        # g_loss_fn recomputes this exact encoder forward as its grad
        # primal; XLA CSE merges the two (measured: the compiled step
        # carries only the grad-primal's convs), so no vjp-sharing is
        # needed here — unlike the main steps, whose phase-2 re-scores
        # fakes under UPDATED discriminator params/stats.
        post_z, _, _, st_E0 = enc_forward(p["netE_B"], stats["netE_B"])

        # D_z_B phase
        def d_loss_fn(dz_params):
            pz_post, stZ = apply_net(nets["netD_z_B"], dz_params,
                                     stats["netD_z_B"], sg(post_z))
            l_post = gan(pz_post, False)
            pz_prior, stZ = apply_net(nets["netD_z_B"], dz_params, stZ, prior_z)
            l_prior = gan(pz_prior, True)
            loss = 0.5 * (l_post + l_prior)
            return loss, dict(loss_D_z_B=loss, st_D_z=stZ)

        dz_grads, d_aux = jax.grad(d_loss_fn, has_aux=True)(p["netD_z_B"])
        new_p, new_opt, gnorms = dict(p), dict(state.opt_state), {}
        new_p["netD_z_B"], new_opt["netD_z_B"], gnorms["gnorm_D_z_B"] = \
            apply_net_update(tx, p["netD_z_B"], state.opt_state["netD_z_B"],
                             dz_grads, lr_d, cfg.max_gnorm)
        # Faithful quirk: the reference shares optimizer_D_B between netD_B and
        # netD_z_B (model.py:386-389), so its step() in the supervised path
        # also applies an Adam step with ZERO gradients to netD_B
        # (momentum decay + bias correction still move the params).
        zero_g = jax.tree_util.tree_map(jnp.zeros_like, p["netD_B"])
        new_p["netD_B"], new_opt["netD_B"], _ = apply_net_update(
            tx, p["netD_B"], state.opt_state["netD_B"], zero_g, lr_d,
            cfg.max_gnorm)

        # G phase
        def g_loss_fn(g_params):
            rngs_ab, rngs_ba = _dropout_rngs_pair(k_drop, cfg.use_dropout)
            pz, mu2, logvar2_eff, _ = enc_forward(g_params["netE_B"],
                                                  stats["netE_B"])
            pred_B, stGAB = apply_net(nets["netG_A_B"], g_params["netG_A_B"],
                                      stats["netG_A_B"], real_A, pz,
                                      rngs=rngs_ab)
            pred_A, stGBA = apply_net(nets["netG_B_A"], g_params["netG_B_A"],
                                      stats["netG_B_A"], real_B, rngs=rngs_ba)
            loss_sup_A = l1_loss(pred_A, real_A)
            loss_sup_B = l1_loss(pred_B, real_B)
            pz_post, stZ = apply_net(nets["netD_z_B"], new_p["netD_z_B"],
                                     d_aux["st_D_z"], pz)
            loss_G_z_B = gan(pz_post, True)
            kld_z_B = jnp.mean(kld_std_gauss(mu2, logvar2_eff))
            loss_G = (loss_sup_A * cfg.lambda_sup_A
                      + loss_sup_B * cfg.lambda_sup_B)
            if stoch_enc:
                loss_G = loss_G + kld_z_B * cfg.lambda_z_B
            if z_gan and not stoch_enc:
                loss_G = loss_G + loss_G_z_B
            aux = dict(loss_sup_A=loss_sup_A, loss_sup_B=loss_sup_B,
                       kld_z_B=kld_z_B, st_D_z=stZ, st_GAB=stGAB,
                       st_GBA=stGBA)
            return loss_G, aux

        g_names = ("netG_A_B", "netG_B_A", "netE_B")
        g_params = {k: p[k] for k in g_names}
        g_grads, g_aux = jax.grad(g_loss_fn, has_aux=True)(g_params)
        for k in g_names:
            new_p[k], new_opt[k], gnorms["gnorm_" + k[3:]] = apply_net_update(
                tx, p[k], state.opt_state[k], g_grads[k], lr, cfg.max_gnorm)

        new_stats = dict(stats)
        new_stats.update(netE_B=st_E0, netD_z_B=g_aux["st_D_z"],
                         netG_A_B=g_aux["st_GAB"], netG_B_A=g_aux["st_GBA"])
        losses = {
            "S_A": g_aux["loss_sup_A"], "S_B": g_aux["loss_sup_B"],
            "KLD_z_B": g_aux["kld_z_B"], "D_z_B": d_aux["loss_D_z_B"],
            "gnorm_G_A_B": gnorms["gnorm_G_A_B"],
            "gnorm_G_B_A": gnorms["gnorm_G_B_A"],
            "gnorm_E_B": gnorms["gnorm_E_B"],
            "gnorm_D_z_B": gnorms["gnorm_D_z_B"],
        }
        new_state = state.replace(params=new_p, batch_stats=new_stats,
                                  opt_state=new_opt,
                                  ema=ema_update(state.ema, new_p,
                                                 getattr(cfg, "ema", 0.0)))
        return new_state, losses

    return step
