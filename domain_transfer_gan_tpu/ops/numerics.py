"""Core math for the Augmented CycleGAN family, matching the reference
semantics exactly (reference model.py:15-72) but in pure-functional JAX.

Everything here is shape-polymorphic over a flat latent layout (B, nlatent);
the reference's (B, nlatent, 1, 1) tensors are an NCHW artifact we do not
carry.  Z-clamping to [-4, 4] (reference model.py:21, quirk Q9 in SURVEY.md)
is preserved because it changes training dynamics.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def gauss_reparametrize(key: jax.Array, mu: jax.Array, logvar: jax.Array,
                        n_sample: int = 1, clamp: float = 4.0) -> jax.Array:
    """Reparametrization trick with the reference's hard clamp.

    Reference model.py:15-22: z = clamp(mu + eps*exp(logvar/2), -4, 4) with
    eps ~ N(0, I), returning (B*n_sample, nlatent).  The clamp back-propagates
    zero gradient outside the interval (same as torch.clamp).
    """
    b, d = mu.shape
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, (b, n_sample, d), dtype=mu.dtype)
    z = eps * std[:, None, :] + mu[:, None, :]
    z = jnp.clip(z, -clamp, clamp)
    return z.reshape(b * n_sample, d)


def gauss_reparametrize_eps(mu: jax.Array, logvar: jax.Array, eps: jax.Array,
                            clamp: float = 4.0) -> jax.Array:
    """Same as :func:`gauss_reparametrize` but with the noise supplied.

    Needed because the two-phase GAN step must reuse the *same* z sample in
    both the discriminator and generator phases (the reference computes z once
    and retains its graph; model.py:415-419 + 463-464 + 493).
    """
    std = jnp.exp(0.5 * logvar)
    return jnp.clip(eps * std + mu, -clamp, clamp)


def log_prob_laplace(z, mu, log_var):
    """Elementwise Laplace log-density (reference model.py:24-28).

    Note the reference parametrizes scale as sd = exp(log_var/2) and the
    density as -0.5*log_var - |z-mu|/sd - log(2).
    """
    sd = jnp.exp(0.5 * log_var)
    return -0.5 * log_var - jnp.abs(z - mu) / sd - math.log(2.0)


def log_prob_gaussian(z, mu, log_var):
    """Elementwise Gaussian log-density (reference model.py:31-34)."""
    return (-0.5 * log_var
            - (z - mu) ** 2.0 / (2.0 * jnp.exp(log_var))
            - 0.5 * math.log(2 * math.pi))


def kld_std_gauss(mu, log_var):
    """KL(N(mu, exp(log_var)) || N(0, I)) summed over the latent dim.

    Reference model.py:45-53 (Kingma & Welling Appendix B).  Returns (B,).
    """
    return -0.5 * jnp.sum(log_var + 1.0 - mu ** 2 - jnp.exp(log_var), axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _bce_probs_torchlike(p: jax.Array, target_is_real: bool) -> jax.Array:
    """Elementwise BCE on sigmoid probabilities with torch's exact
    saturation semantics (aten binary_cross_entropy):

    - forward: log terms clamped at -100 (loss <= 100 per element);
    - backward: (p - t) / max(p * (1 - p), 1e-12) — huge but FINITE at
      the boundaries, which the train step's torch-style grad clipping
      then tames (reference model.py:159-160).

    A clipped-probability formulation instead NaNs in bfloat16 (1 - 1e-7
    rounds to 1.0, then 0 * log(0)) and gives an exactly-zero gradient
    for saturated predictions in fp32 — a generator facing a saturated
    discriminator would receive no adversarial signal at all, unlike any
    torch BCE baseline."""
    t = 1.0 if target_is_real else 0.0
    log_p = jnp.maximum(jnp.log(p), -100.0)
    log_1mp = jnp.maximum(jnp.log1p(-p), -100.0)
    return -(t * log_p + (1.0 - t) * log_1mp)


def _bce_fwd(p, target_is_real):
    return _bce_probs_torchlike(p, target_is_real), p


def _bce_bwd(target_is_real, p, g):
    t = 1.0 if target_is_real else 0.0
    grad = (p - t) / jnp.maximum(p * (1.0 - p), 1e-12)
    return (g * grad,)


_bce_probs_torchlike.defvjp(_bce_fwd, _bce_bwd)


def criterion_gan(pred: jax.Array, target_is_real: bool, use_sigmoid: bool) -> jax.Array:
    """GAN criterion (reference model.py:56-72).

    LSGAN (default, use_sigmoid=False): MSE against 0/1 targets.
    Vanilla (use_sigmoid=True): BCE on sigmoid *probabilities* — the nets
    end in a Sigmoid in this mode, and the loss reproduces torch
    F.binary_cross_entropy exactly, including its saturation clamps (the
    reference's long-target dtype bug, quirk Q4, stays fixed: targets are
    float).  Computed in float32 regardless of compute_dtype."""
    if use_sigmoid:
        p = pred.astype(jnp.float32)
        return jnp.mean(_bce_probs_torchlike(p, bool(target_is_real)))
    target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
    return jnp.mean((pred - target) ** 2)


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def mse_loss(a, b):
    return jnp.mean((a - b) ** 2)


def global_norm(tree) -> jax.Array:
    """Global L2 norm of a pytree of gradients."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros(())
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def clip_grads_torchlike(tree, max_norm: float):
    """Per-tree global-norm clipping with torch.nn.utils.clip_grad_norm
    semantics: scale by max_norm/(norm + 1e-6) only when norm exceeds max.

    The reference clips each network's gradients separately to max_gnorm
    (model.py:159-160,187-188,447-449,510-512).  Returns (clipped, norm)
    where norm is the *pre-clip* global norm (what the reference logs).
    """
    norm = global_norm(tree)
    scale = jnp.where(norm > max_norm, max_norm / (norm + 1e-6), 1.0)
    return jax.tree_util.tree_map(lambda g: g * scale.astype(g.dtype), tree), norm


def nats2bpp(nats, nc: int, npx: int):
    """nats -> bits-per-pixel (reference evaluate.py:150-152)."""
    return (nats / (npx * npx * nc)) / math.log(2.0)


def log_prob_gaussian_detail(z, mu, log_var, size):
    """Decomposed Gaussian log-density terms for debugging (reference
    model.py:36-43; unused by the reference's drivers, kept for inventory
    parity).  ``size`` must be 3-D — the reshape/.sum(2) demands it, same
    as the reference.  Returns (logvar term, quadratic term, normalizer)
    where the normalizer scales by the per-sample feature count (the
    reference hardcoded 3*64*64 there — quirk Q5 family; derived from
    shape here)."""
    if len(size) != 3:
        raise ValueError("size must be 3-D (batch, groups, feat), got %r"
                         % (size,))
    res1 = (-0.5 * log_var).reshape(size).sum(2).mean(1).mean(0)
    res2 = (-(z - mu) ** 2.0 / (2.0 * jnp.exp(log_var))
            ).reshape(size).sum(2).mean(1).mean(0)
    feat = z.size // (size[0] * size[1])
    res3 = -0.5 * math.log(2 * math.pi) * feat
    return res1, res2, res3
