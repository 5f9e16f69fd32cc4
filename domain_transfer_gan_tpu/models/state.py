"""TrainState pytree + per-network optimizers.

Optimizer semantics mirror the reference exactly (model.py:108-114,378-389):

- Adam(beta1=opt.beta1, beta2=0.999, eps=1e-8) — optax.scale_by_adam matches
  torch.optim.Adam's update (eps outside the sqrt).
- generators/encoder at lr, discriminators at lr/5.
- per-NETWORK global-norm clipping to max_gnorm with torch semantics
  (scale = max/(norm+1e-6), only when exceeded) applied before Adam
  (model.py:159-160,187-188,447-449,510-512).
- the learning rate is a dynamic scalar (linear decay after `niter` epochs is
  driven from the host, reference model.py:282-291), so the jitted step never
  recompiles on decay.

The reference groups several networks into one torch optimizer; since Adam
state is per-parameter and clipping is per-network, one optax state per
network is mathematically identical and keeps the pytree layout clean.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from ..config import TrainConfig
from ..nn import networks as N
from ..ops.numerics import clip_grads_torchlike

DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


@struct.dataclass
class TrainState:
    """Full training state for any of the three model variants.

    params / batch_stats / opt_state are dicts keyed by network name
    ('netG_A_B', 'netG_B_A', 'netD_A', 'netD_B' and, for aug_cycle_gan,
    'netE_B', 'netD_z_B').  Networks without batch-norm have empty
    batch_stats entries.
    """

    params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    opt_state: Dict[str, Any]
    step: jnp.ndarray  # int32 scalar
    pools: Dict[str, Any] = struct.field(default_factory=dict)  # fake-image pools (opt-in)
    ema: Dict[str, Any] = struct.field(default_factory=dict)  # EMA of generator/encoder params (opt-in, --ema)


def ema_update(ema: Dict[str, Any], new_params: Dict[str, Any],
               decay: float) -> Dict[str, Any]:
    """One EMA step over the tracked networks (keys of ``ema``); a no-op
    when EMA is off (empty dict).  Runs inside the jitted train step —
    a pure pytree lerp, negligible next to the conv work."""
    if not ema or decay <= 0.0:
        return ema
    return {
        k: jax.tree_util.tree_map(
            lambda e, p: (decay * e + (1.0 - decay) * p).astype(e.dtype),
            ema[k], new_params[k])
        for k in ema
    }


def adam_tx(beta1: float) -> optax.GradientTransformation:
    return optax.scale_by_adam(b1=beta1, b2=0.999, eps=1e-8)


def apply_net_update(tx: optax.GradientTransformation, params, opt_state,
                     grads, lr, max_gnorm: float):
    """clip (torch-style) -> adam -> p -= lr * update.  Returns
    (new_params, new_opt_state, pre-clip grad norm)."""
    clipped, gnorm = clip_grads_torchlike(grads, max_gnorm)
    updates, new_opt_state = tx.update(clipped, opt_state, params)
    new_params = jax.tree_util.tree_map(
        lambda p, u: (p - lr * u).astype(p.dtype), params, updates)
    return new_params, new_opt_state, gnorm


def build_networks(cfg: TrainConfig) -> Dict[str, Any]:
    """Instantiate the flax modules for the configured model variant.

    Mirrors the reference constructors (model.py:88-106 for StochCycleGAN,
    model.py:348-376 for AugmentedCycleGAN) including the hardcoded
    D_A ndf=32 (quirk Q8, model.py:101,367) and the encoder input channel
    count in+out when enc_A_B=1 (model.py:360-364).
    """
    dtype = DTYPES[cfg.compute_dtype]
    kw = dict(init_scheme=cfg.init_scheme, use_pallas=cfg.use_pallas, dtype=dtype)
    nets = {
        "netG_A_B": N.define_stochastic_G(
            nlatent=cfg.nlatent, input_nc=cfg.input_nc, output_nc=cfg.output_nc,
            ngf=cfg.ngf, use_dropout=cfg.use_dropout, n_blocks=cfg.n_blocks, **kw),
        "netG_B_A": N.define_G(
            input_nc=cfg.output_nc, output_nc=cfg.input_nc, ngf=cfg.ngf,
            norm=cfg.norm, use_dropout=cfg.use_dropout, n_blocks=cfg.n_blocks, **kw),
        "netD_A": N.define_D_A(input_nc=cfg.input_nc, ndf=32, norm=cfg.norm,
                               use_sigmoid=cfg.use_sigmoid, **kw),
        "netD_B": N.define_D_B(input_nc=cfg.output_nc, ndf=cfg.ndf, norm=cfg.norm,
                               use_sigmoid=cfg.use_sigmoid, **kw),
    }
    if cfg.model == "aug_cycle_gan":
        enc_input_nc = cfg.output_nc + (cfg.input_nc if cfg.enc_A_B else 0)
        # the reference encoder's flatten assumes 64x64 inputs; for any
        # other resolution global-average the final feature map instead
        # (new capability: aug_cycle_gan at arbitrary grid_size)
        nets["netE_B"] = N.define_E(nlatent=cfg.nlatent, input_nc=enc_input_nc,
                                    nef=cfg.nef, norm="batch",
                                    init_scheme=cfg.init_scheme,
                                    use_pallas=cfg.use_pallas, dtype=dtype,
                                    adaptive_pool=cfg.grid_size != 64)
        nets["netD_z_B"] = N.define_LAT_D(nlatent=cfg.nlatent, ndf=cfg.ndf,
                                          use_sigmoid=cfg.use_sigmoid,
                                          init_scheme=cfg.init_scheme,
                                          dtype=dtype)
    if getattr(cfg, "remat", False):
        # trade FLOPs for HBM traffic: recompute generator activations in the
        # backward pass instead of saving them (the step is bandwidth-bound).
        # The bool `train` arg must be STATIC under jax.checkpoint (dropout /
        # batch-norm branch on it with `not train`); flax's lifted remat
        # counts the module itself as argnum 0, so the index comes from the
        # __call__ signature position of `train` — and apply_net passes
        # train positionally for the same reason (static_argnums has no
        # kwarg form).
        import inspect

        import flax.linen as fnn
        for name in ("netG_A_B", "netG_B_A"):
            mod = nets[name]
            train_idx = list(
                inspect.signature(type(mod).__call__).parameters).index(
                    "train")
            nets[name] = fnn.remat(type(mod), static_argnums=(train_idx,))(
                **{f.name: getattr(mod, f.name)
                   for f in mod.__dataclass_fields__.values()
                   if f.name not in ("parent", "name")})
    return nets


def init_state(cfg: TrainConfig, rng: jax.Array,
               image_size: Optional[int] = None) -> Tuple[Dict[str, Any], TrainState]:
    """Initialize parameters + optimizer states for all networks.

    `image_size` defaults to cfg.grid_size; shapes only matter for tracing
    (the nets are fully convolutional except the latent encoder's flatten).
    """
    hw = image_size or cfg.grid_size
    if hw < 64:
        # Discriminator_edges (reference networks.py:352-393) and the latent
        # encoder (networks.py:438-483) both run four stride-2 convs into a
        # VALID 4x4 conv: below 64px the 4x4 head sees a <4px map and
        # produces an empty tensor — fail here with the real reason instead
        # of a deep flax shape error.
        raise ValueError(
            "grid_size/image_size must be >= 64 (got %d): the reference's "
            "edges-discriminator and latent-encoder heads collapse a 4x"
            "stride-2 stack into a valid 4x4 conv, which is empty below "
            "64px" % hw)
    nets = build_networks(cfg)
    b = 2  # tiny init batch
    a_img = jnp.zeros((b, hw, hw, cfg.input_nc), jnp.float32)
    b_img = jnp.zeros((b, hw, hw, cfg.output_nc), jnp.float32)
    z = jnp.zeros((b, cfg.nlatent), jnp.float32)

    keys = jax.random.split(rng, len(nets))
    params, batch_stats = {}, {}

    def init_net(name, key, *args):
        # positional train: remat-wrapped nets require it static
        variables = nets[name].init({"params": key}, *args, False)
        params[name] = variables["params"]
        batch_stats[name] = variables.get("batch_stats", {})

    init_net("netG_A_B", keys[0], a_img, z)
    init_net("netG_B_A", keys[1], b_img)
    init_net("netD_A", keys[2], a_img)
    init_net("netD_B", keys[3], b_img)
    if cfg.model == "aug_cycle_gan":
        enc_in = jnp.concatenate([a_img, b_img], axis=-1) if cfg.enc_A_B else b_img
        init_net("netE_B", keys[4], enc_in)
        init_net("netD_z_B", keys[5], z)

    tx = adam_tx(cfg.beta1)
    opt_state = {name: tx.init(params[name]) for name in params}
    pools = {}
    if getattr(cfg, "pool_size", 0) > 0:
        from .pool import init_pool
        pools = {
            "fake_A": init_pool(cfg.pool_size, (hw, hw, cfg.input_nc)),
            "fake_B": init_pool(cfg.pool_size, (hw, hw, cfg.output_nc)),
        }
    ema = {}
    if getattr(cfg, "ema", 0.0) > 0.0:
        gen_names = [n for n in ("netG_A_B", "netG_B_A", "netE_B")
                     if n in params]
        ema = {n: jax.tree_util.tree_map(jnp.array, params[n])
               for n in gen_names}
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=opt_state, step=jnp.zeros((), jnp.int32),
                       pools=pools, ema=ema)
    return nets, state
