"""Gradient accumulation: big-batch train steps in microbatch-sized memory.

A scaling capability with no reference analogue (the reference's step is
single-batch only, model.py:126-208/402-539): ``--grad_accum K`` runs the
two-phase adversarial step over K sequential microbatches inside ONE jitted
program — a `lax.scan` accumulates each phase's gradients, the optimizers
apply the microbatch-mean once per phase — so the effective batch size is
decoupled from the activation memory high-water mark.  This is what makes
e.g. 256x256 training at reference-scale effective batches fit a single
chip (activations grow 16x with image area, BASELINE.md hires table), and
it composes with data parallelism (the microbatch split slices the batch
axis locally on every device).

Semantics relative to the fused steps (models/steps.py):

- Phase structure is preserved exactly: discriminators update on the
  microbatch-MEAN gradient over detached phase-0 fakes, then generators /
  encoder update on the microbatch-mean gradient scored against the
  UPDATED discriminators (the reference's deliberate ordering,
  model.py:455-456).  Torch-style clipping applies to the mean gradient,
  exactly as the fused step clips its full-batch gradient.
- For batch-statistics-free networks (instance/conditional-instance norms,
  the default) the result is numerically equivalent to the fused step at
  the full batch: every loss is a per-sample mean, so the mean of equal
  microbatch means IS the batch mean, for gradients too (pinned by
  tests/test_accum.py equivalence tests).
- The aug model's latent encoder / latent discriminator carry internal
  batch norm (networks.py:396-483 quirks), so there — as in every
  framework's gradient accumulation — normalization statistics are
  per-microbatch and running stats update once per microbatch instead of
  once per step.  The D phase's extra netE_B forward reads the step-entry
  stats and discards its update (train-mode batch norm never reads running
  stats, so outputs are unchanged), keeping the stats cadence at exactly
  one update per microbatch per encoder application — the microbatched
  analogue of the fused step's cadence, not 1.5x it.  Training-mode
  outputs never read running stats, so this affects only the stored
  batch_stats, not the loss/gradient path.
- The phase-0 forward is recomputed inside the G phase's gradient (the
  fused step shares it via jax.vjp); with K microbatches resident
  activations shrink ~K-fold at the cost of one extra generator forward
  per microbatch — the same trade --remat makes, composed here with the
  batch split.

Unsupported compositions raise at model build: the fake-image pool
(pool push/sample granularity is per-step in the reference), ``--norm
batch`` for the main networks (per-microbatch statistics would silently
change the model), pipeline parallelism (its own microbatching owns the
batch axis), and the supervised step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import TrainConfig
from ..ops.numerics import (
    criterion_gan,
    gauss_reparametrize_eps,
    kld_std_gauss,
    l1_loss,
    log_prob_gaussian,
)
from .state import TrainState, adam_tx, apply_net_update, ema_update
from .steps import _dropout_rngs_pair, apply_net, flat2d, make_score_pair

sg = jax.lax.stop_gradient


def _check_cfg(cfg: TrainConfig, what: str):
    k = int(getattr(cfg, "grad_accum", 1))
    if k < 2:
        raise ValueError("%s needs --grad_accum >= 2 (got %d)" % (what, k))
    if getattr(cfg, "pool_size", 0) > 0:
        raise ValueError("--grad_accum does not compose with --pool_size: "
                         "the reference's fake-image pool pushes/samples "
                         "once per step, which has no per-microbatch "
                         "equivalent")
    if cfg.norm == "batch":
        raise ValueError("--grad_accum with --norm batch would switch the "
                         "main networks to per-microbatch statistics; use "
                         "instance norms or drop --grad_accum")
    if getattr(cfg, "pipeline", 0) and cfg.pipeline > 1:
        raise ValueError("--grad_accum does not compose with --pipeline "
                         "(the GPipe schedule already owns the microbatch "
                         "split; raise --microbatches instead)")
    return k


def _split_micro(x, k: int):
    """(B, ...) -> (B/K, K, ...) so microbatch j is ``x[:, j]``.

    The interleaved layout keeps dim 0 — the axis DataParallel shards —
    as the leading axis, so under a data mesh the reshape and the
    per-microbatch slice both stay device-local (each device's contiguous
    B/D block maps to whole rows of the (B/K, K) view when (B/D) % K == 0).
    """
    b = x.shape[0]
    return x.reshape((b // k, k) + x.shape[1:])


def _at(x, j):
    return jax.lax.dynamic_index_in_dim(x, j, axis=1, keepdims=False)


def _zeros_like_tree(t):
    return jax.tree_util.tree_map(jnp.zeros_like, t)


def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def _tree_scale(t, s):
    return jax.tree_util.tree_map(lambda x: x * s, t)


def _merge_micro(v):
    """(K, m, ...) stacked scan outputs -> the original (B, ...) order."""
    return jnp.swapaxes(v, 0, 1).reshape((-1,) + v.shape[2:])


# ---------------------------------------------------------------------------
# StochCycleGAN / cycle_gan
# ---------------------------------------------------------------------------

def make_stoch_accum_step(nets, cfg: TrainConfig, ignore_noise: bool):
    """Accumulated variant of steps.make_stoch_train_step (same signature)."""
    k_micro = _check_cfg(cfg, "stoch accumulation step")
    tx = adam_tx(cfg.beta1)
    gan = functools.partial(criterion_gan, use_sigmoid=cfg.use_sigmoid)
    concat_d = cfg.norm != "batch"
    score_pair = make_score_pair(nets, concat_d)
    d_names = ("netD_A", "netD_B")
    g_names = ("netG_A_B", "netG_B_A")

    def step(state: TrainState, real_A, real_B, prior_z, lr, lr_d, rng):
        if real_A.shape[0] % k_micro:
            raise ValueError("batch %d not divisible by --grad_accum %d"
                             % (real_A.shape[0], k_micro))
        p, stats = state.params, state.batch_stats
        k_drop0, k_drop1, _k_poolA, _k_poolB = jax.random.split(rng, 4)
        if ignore_noise:
            prior_z = jnp.ones_like(prior_z)
        xs = tuple(_split_micro(x, k_micro)
                   for x in (real_A, real_B, prior_z))
        d_params = {k: p[k] for k in d_names}
        g_params = {k: p[k] for k in g_names}

        def fwd_fakes(gp, rA, rB, pz, j):
            r_ab, r_ba = _dropout_rngs_pair(
                jax.random.fold_in(k_drop0, j), cfg.use_dropout)
            fake_B, _ = apply_net(nets["netG_A_B"], gp["netG_A_B"],
                                  stats["netG_A_B"], rA, pz, rngs=r_ab)
            fake_A, _ = apply_net(nets["netG_B_A"], gp["netG_B_A"],
                                  stats["netG_B_A"], rB, rngs=r_ba)
            return fake_B, fake_A

        # ----- phase 1: D gradients accumulated over microbatches -------
        def d_micro(carry, j):
            acc_g, acc_l = carry
            rA, rB, pz = (_at(x, j) for x in xs)
            fake_B, fake_A = fwd_fakes(g_params, rA, rB, pz, j)

            def d_loss_fn(dp):
                pf_A, pt_A, _ = score_pair("netD_A", dp["netD_A"],
                                           stats["netD_A"], sg(fake_A), rA)
                pf_B, pt_B, _ = score_pair("netD_B", dp["netD_B"],
                                           stats["netD_B"], sg(fake_B), rB)
                loss_D_A = 0.5 * (gan(pf_A, False) + gan(pt_A, True))
                loss_D_B = 0.5 * (gan(pf_B, False) + gan(pt_B, True))
                aux = dict(D_A=loss_D_A, D_B=loss_D_B,
                           P_t_A=jnp.mean(pt_A), P_t_B=jnp.mean(pt_B))
                return loss_D_A + loss_D_B, aux

            grads, aux = jax.grad(d_loss_fn, has_aux=True)(d_params)
            return (_tree_add(acc_g, grads), _tree_add(acc_l, aux)), None

        zero_l = dict(D_A=0.0, D_B=0.0, P_t_A=0.0, P_t_B=0.0)
        zero_l = {k: jnp.zeros(()) for k in zero_l}
        (d_gsum, d_lsum), _ = jax.lax.scan(
            d_micro, (_zeros_like_tree(d_params), zero_l),
            jnp.arange(k_micro))
        d_grads = _tree_scale(d_gsum, 1.0 / k_micro)
        d_loss = _tree_scale(d_lsum, 1.0 / k_micro)

        new_p, new_opt, gnorms = dict(p), dict(state.opt_state), {}
        for k in d_names:
            new_p[k], new_opt[k], gnorms["gnorm_" + k[3:]] = apply_net_update(
                tx, p[k], state.opt_state[k], d_grads[k], lr_d, cfg.max_gnorm)

        # ----- phase 2: G gradients vs the UPDATED discriminators -------
        def g_micro(carry, j):
            acc_g, acc_l = carry
            rA, rB, pz = (_at(x, j) for x in xs)

            def g_loss_fn(gp):
                fake_B, fake_A = fwd_fakes(gp, rA, rB, pz, j)
                pf_A, _ = apply_net(nets["netD_A"], new_p["netD_A"],
                                    stats["netD_A"], fake_A)
                pf_B, _ = apply_net(nets["netD_B"], new_p["netD_B"],
                                    stats["netD_B"], fake_B)
                loss_G_A = gan(flat2d(pf_A), True)
                loss_G_B = gan(flat2d(pf_B), True)
                r_ab, r_ba = _dropout_rngs_pair(
                    jax.random.fold_in(k_drop1, j), cfg.use_dropout)
                rec_A, _ = apply_net(nets["netG_B_A"], gp["netG_B_A"],
                                     stats["netG_B_A"], fake_B, rngs=r_ba)
                rec_B, _ = apply_net(nets["netG_A_B"], gp["netG_A_B"],
                                     stats["netG_A_B"], fake_A, pz,
                                     rngs=r_ab)
                loss_cycle_A = l1_loss(rec_A, rA)
                loss_cycle_B = l1_loss(rec_B, rB)
                loss_G = (loss_G_A + loss_G_B
                          + loss_cycle_A * cfg.lambda_A
                          + loss_cycle_B * cfg.lambda_B)
                aux = (dict(G_A=loss_G_A, G_B=loss_G_B,
                            Cyc_A=loss_cycle_A, Cyc_B=loss_cycle_B,
                            P_f_A=jnp.mean(pf_A), P_f_B=jnp.mean(pf_B)),
                       dict(fake_B=fake_B, fake_A=fake_A,
                            rec_A=rec_A, rec_B=rec_B))
                return loss_G, aux

            grads, (laux, vis) = jax.grad(g_loss_fn, has_aux=True)(g_params)
            return (_tree_add(acc_g, grads), _tree_add(acc_l, laux)), vis

        zero_gl = {k: jnp.zeros(()) for k in
                   ("G_A", "G_B", "Cyc_A", "Cyc_B", "P_f_A", "P_f_B")}
        (g_gsum, g_lsum), vis_chunks = jax.lax.scan(
            g_micro, (_zeros_like_tree(g_params), zero_gl),
            jnp.arange(k_micro))
        g_grads = _tree_scale(g_gsum, 1.0 / k_micro)
        g_loss = _tree_scale(g_lsum, 1.0 / k_micro)
        for k in g_names:
            new_p[k], new_opt[k], gnorms["gnorm_" + k[3:]] = apply_net_update(
                tx, p[k], state.opt_state[k], g_grads[k], lr, cfg.max_gnorm)

        losses = {
            "D_A": d_loss["D_A"], "G_A": g_loss["G_A"],
            "Cyc_A": g_loss["Cyc_A"],
            "D_B": d_loss["D_B"], "G_B": g_loss["G_B"],
            "Cyc_B": g_loss["Cyc_B"],
            "P_t_A": d_loss["P_t_A"], "P_f_A": g_loss["P_f_A"],
            "P_t_B": d_loss["P_t_B"], "P_f_B": g_loss["P_f_B"],
        }
        # explicit reference order (train.py visualize_cycle lays grid
        # columns out of dict order): real_A, fake_B, rec_A, real_B,
        # fake_A, rec_B — same as the fused step's visuals
        vis = {k: _merge_micro(v) for k, v in vis_chunks.items()}
        visuals = {"real_A": real_A, "fake_B": vis["fake_B"],
                   "rec_A": vis["rec_A"], "real_B": real_B,
                   "fake_A": vis["fake_A"], "rec_B": vis["rec_B"]}
        new_state = state.replace(params=new_p, batch_stats=dict(stats),
                                  opt_state=new_opt, step=state.step + 1,
                                  pools=dict(state.pools),
                                  ema=ema_update(state.ema, new_p,
                                                 getattr(cfg, "ema", 0.0)))
        return new_state, losses, visuals, gnorms

    return step


# ---------------------------------------------------------------------------
# AugmentedCycleGAN
# ---------------------------------------------------------------------------

def make_aug_accum_step(nets, cfg: TrainConfig):
    """Accumulated variant of steps.make_aug_train_step (same signature)."""
    k_micro = _check_cfg(cfg, "aug accumulation step")
    tx = adam_tx(cfg.beta1)
    gan = functools.partial(criterion_gan, use_sigmoid=cfg.use_sigmoid)
    stoch_enc = bool(cfg.stoch_enc)
    z_gan = bool(cfg.z_gan)
    enc_A_B = bool(cfg.enc_A_B)
    concat_d = cfg.norm != "batch"
    score_pair = make_score_pair(nets, concat_d)
    d_names = ("netD_A", "netD_B", "netD_z_B")
    g_names = ("netG_A_B", "netG_B_A", "netE_B")

    def posterior(e_params, e_stats, a_img, b_img, eps):
        enc_in = (jnp.concatenate([a_img, b_img], axis=-1)
                  if enc_A_B else b_img)
        (mu, logvar), st = apply_net(nets["netE_B"], e_params, e_stats,
                                     enc_in)
        if stoch_enc:
            z = gauss_reparametrize_eps(mu, logvar, eps)
            logvar_eff = logvar
        else:
            z = mu
            logvar_eff = logvar * 0.0
        return z, mu, logvar, logvar_eff, st

    def step(state: TrainState, real_A, real_B, prior_z, lr, lr_d, rng):
        if real_A.shape[0] % k_micro:
            raise ValueError("batch %d not divisible by --grad_accum %d"
                             % (real_A.shape[0], k_micro))
        p, stats = state.params, state.batch_stats
        k_eps, k_drop0, k_drop1, _kpa, _kpb = jax.random.split(rng, 5)
        eps_full = jax.random.normal(k_eps, prior_z.shape, prior_z.dtype)
        xs = tuple(_split_micro(x, k_micro)
                   for x in (real_A, real_B, prior_z, eps_full))
        d_params = {k: p[k] for k in d_names}
        g_params = {k: p[k] for k in g_names}

        def fwd_phase0(gp, e_stats, rA, rB, pz, eps, j):
            r_ab, r_ba = _dropout_rngs_pair(
                jax.random.fold_in(k_drop0, j), cfg.use_dropout)
            fake_B, _ = apply_net(nets["netG_A_B"], gp["netG_A_B"],
                                  stats["netG_A_B"], rA, pz, rngs=r_ab)
            fake_A, _ = apply_net(nets["netG_B_A"], gp["netG_B_A"],
                                  stats["netG_B_A"], rB, rngs=r_ba)
            post = posterior(gp["netE_B"], e_stats, fake_A, rB, eps)
            return fake_B, fake_A, post

        # ----- phase 1: D gradients accumulated over microbatches -------
        # netD_z_B's BN1d running stats thread through the scan carry (one
        # update per microbatch).  netE_B's D-phase forward reads the
        # step-entry stats and DISCARDS its update: train-mode batch norm
        # never reads running stats, so the outputs are identical, and the
        # G phase below then advances netE_B's stats exactly once per
        # microbatch — matching the documented once-per-microbatch
        # semantics instead of the 3x cadence a carried D-phase update
        # would produce.
        def d_micro(carry, j):
            acc_g, acc_l, st_Dz = carry
            rA, rB, pz, eps = (_at(x, j) for x in xs)
            fake_B, fake_A, (post_z, mu, _lv, logvar_eff, _stE) = fwd_phase0(
                g_params, stats["netE_B"], rA, rB, pz, eps, j)

            def d_loss_fn(dp):
                pf_A, pt_A, _ = score_pair("netD_A", dp["netD_A"],
                                           stats["netD_A"], sg(fake_A), rA)
                pf_B, pt_B, _ = score_pair("netD_B", dp["netD_B"],
                                           stats["netD_B"], sg(fake_B), rB)
                pz_post, stZ = apply_net(nets["netD_z_B"], dp["netD_z_B"],
                                         st_Dz, sg(post_z))
                pz_prior, stZ = apply_net(nets["netD_z_B"], dp["netD_z_B"],
                                          stZ, pz)
                loss_D_A = 0.5 * (gan(pf_A, False) + gan(pt_A, True))
                loss_D_B = 0.5 * (gan(pf_B, False) + gan(pt_B, True))
                loss_D_z_B = 0.5 * (gan(pz_post, False) + gan(pz_prior, True))
                loss_D = loss_D_A + loss_D_B
                if z_gan and not stoch_enc:
                    loss_D = loss_D + loss_D_z_B
                aux = (dict(D_A=loss_D_A, D_B=loss_D_B, D_z_B=loss_D_z_B,
                            P_t_A=jnp.mean(pt_A), P_t_B=jnp.mean(pt_B)),
                       stZ)
                return loss_D, aux

            grads, (laux, st_Dz) = jax.grad(d_loss_fn, has_aux=True)(d_params)
            acc_l, ranges = acc_l
            ranges = dict(
                mu_min=jnp.minimum(ranges["mu_min"], jnp.min(mu)),
                mu_max=jnp.maximum(ranges["mu_max"], jnp.max(mu)),
                logvar_min=jnp.minimum(ranges["logvar_min"],
                                       jnp.min(logvar_eff)),
                logvar_max=jnp.maximum(ranges["logvar_max"],
                                       jnp.max(logvar_eff)))
            return (_tree_add(acc_g, grads), (_tree_add(acc_l, laux), ranges),
                    st_Dz), None

        zero_l = {k: jnp.zeros(()) for k in
                  ("D_A", "D_B", "D_z_B", "P_t_A", "P_t_B")}
        inf = jnp.array(jnp.inf)
        ranges0 = dict(mu_min=inf, mu_max=-inf,
                       logvar_min=inf, logvar_max=-inf)
        (d_gsum, (d_lsum, ranges), st_Dz1), _ = jax.lax.scan(
            d_micro,
            (_zeros_like_tree(d_params), (zero_l, ranges0),
             stats["netD_z_B"]),
            jnp.arange(k_micro))
        d_grads = _tree_scale(d_gsum, 1.0 / k_micro)
        d_loss = _tree_scale(d_lsum, 1.0 / k_micro)

        new_p, new_opt, gnorms = dict(p), dict(state.opt_state), {}
        for k in d_names:
            new_p[k], new_opt[k], gnorms["gnorm_" + k[3:]] = apply_net_update(
                tx, p[k], state.opt_state[k], d_grads[k], lr_d, cfg.max_gnorm)

        # ----- phase 2: G/E gradients vs the UPDATED discriminators -----
        def g_micro(carry, j):
            acc_g, acc_l, st_E, st_Dz = carry
            rA, rB, pz, eps = (_at(x, j) for x in xs)

            def g_loss_fn(gp):
                fake_B, fake_A, (post_z, mu2, _lv, logvar2_eff, stE) = \
                    fwd_phase0(gp, st_E, rA, rB, pz, eps, j)
                pf_A, _ = apply_net(nets["netD_A"], new_p["netD_A"],
                                    stats["netD_A"], fake_A)
                pf_B, _ = apply_net(nets["netD_B"], new_p["netD_B"],
                                    stats["netD_B"], fake_B)
                loss_G_A = gan(flat2d(pf_A), True)
                loss_G_B = gan(flat2d(pf_B), True)
                pz_post, stZ = apply_net(nets["netD_z_B"], new_p["netD_z_B"],
                                         st_Dz, post_z)
                loss_G_z_B = gan(pz_post, True)

                r_ab, r_ba = _dropout_rngs_pair(
                    jax.random.fold_in(k_drop1, j), cfg.use_dropout)
                rec_A, _ = apply_net(nets["netG_B_A"], gp["netG_B_A"],
                                     stats["netG_B_A"], fake_B, rngs=r_ba)
                loss_cycle_A = l1_loss(rec_A, rA)

                enc_in2 = (jnp.concatenate([rA, fake_B], axis=-1)
                           if enc_A_B else fake_B)
                (mu_f, logvar_f), stE = apply_net(nets["netE_B"],
                                                  gp["netE_B"], stE, enc_in2)
                if stoch_enc:
                    loss_cycle_z_B = -1.0 * jnp.mean(
                        log_prob_gaussian(pz, mu_f, logvar_f))
                else:
                    loss_cycle_z_B = l1_loss(mu_f, pz)
                kld_z_B = jnp.mean(kld_std_gauss(mu2, logvar2_eff))

                rec_B, _ = apply_net(nets["netG_A_B"], gp["netG_A_B"],
                                     stats["netG_A_B"], fake_A, post_z,
                                     rngs=r_ab)
                loss_cycle_B = l1_loss(rec_B, rB)

                loss_G = (loss_G_A + loss_G_B
                          + loss_cycle_A * cfg.lambda_A
                          + loss_cycle_B * cfg.lambda_B
                          + loss_cycle_z_B * cfg.lambda_z_B)
                if stoch_enc:
                    loss_G = loss_G + kld_z_B * cfg.lambda_z_B
                if z_gan and not stoch_enc:
                    loss_G = loss_G + loss_G_z_B
                aux = (dict(G_A=loss_G_A, G_B=loss_G_B, G_z_B=loss_G_z_B,
                            Cyc_A=loss_cycle_A, Cyc_B=loss_cycle_B,
                            Cyc_z_B=loss_cycle_z_B, KLD_z_B=kld_z_B,
                            P_f_A=jnp.mean(pf_A), P_f_B=jnp.mean(pf_B)),
                       dict(fake_B=fake_B, fake_A=fake_A,
                            rec_A=rec_A, rec_B=rec_B),
                       (stE, stZ))
                return loss_G, aux

            grads, (laux, vis, (st_E, st_Dz)) = jax.grad(
                g_loss_fn, has_aux=True)(g_params)
            return (_tree_add(acc_g, grads), _tree_add(acc_l, laux),
                    st_E, st_Dz), vis

        zero_gl = {k: jnp.zeros(()) for k in
                   ("G_A", "G_B", "G_z_B", "Cyc_A", "Cyc_B", "Cyc_z_B",
                    "KLD_z_B", "P_f_A", "P_f_B")}
        (g_gsum, g_lsum, st_E2, st_Dz2), vis_chunks = jax.lax.scan(
            g_micro,
            (_zeros_like_tree(g_params), zero_gl, stats["netE_B"], st_Dz1),
            jnp.arange(k_micro))
        g_grads = _tree_scale(g_gsum, 1.0 / k_micro)
        g_loss = _tree_scale(g_lsum, 1.0 / k_micro)
        for k in g_names:
            new_p[k], new_opt[k], gnorms["gnorm_" + k[3:]] = apply_net_update(
                tx, p[k], state.opt_state[k], g_grads[k], lr, cfg.max_gnorm)

        new_stats = dict(stats)
        new_stats.update(netE_B=st_E2, netD_z_B=st_Dz2)
        gnorms.update(ranges)
        losses = {
            "D_A": d_loss["D_A"], "G_A": g_loss["G_A"],
            "Cyc_A": g_loss["Cyc_A"],
            "Cyc_z_B": g_loss["Cyc_z_B"], "KLD_z_B": g_loss["KLD_z_B"],
            "D_B": d_loss["D_B"], "G_B": g_loss["G_B"],
            "Cyc_B": g_loss["Cyc_B"], "D_z_B": d_loss["D_z_B"],
            "P_t_A": d_loss["P_t_A"], "P_f_A": g_loss["P_f_A"],
            "P_t_B": d_loss["P_t_B"], "P_f_B": g_loss["P_f_B"],
        }
        vis = {k: _merge_micro(v) for k, v in vis_chunks.items()}
        visuals = {"real_A": real_A, "fake_B": vis["fake_B"],
                   "rec_A": vis["rec_A"], "real_B": real_B,
                   "fake_A": vis["fake_A"], "rec_B": vis["rec_B"]}
        new_state = state.replace(params=new_p, batch_stats=new_stats,
                                  opt_state=new_opt, step=state.step + 1,
                                  pools=dict(state.pools),
                                  ema=ema_update(state.ema, new_p,
                                                 getattr(cfg, "ema", 0.0)))
        return new_state, losses, visuals, gnorms

    return step
