"""Model classes mirroring the reference's per-model API surface
(model.py:75-325 StochCycleGAN, model.py:337-795 AugmentedCycleGAN):

train_instance / supervised_train_instance / generate_cycle / generate_multi /
generate_multi_cycle / generate_cycle_B_multi / generate_noisy_cycle /
inference_multi / predict_A / predict_B / predict_enc_params /
update_learning_rate / save / load / eval / train.

All tensors are NHWC; latent codes are flat (B, nlatent).  Every compute
entry point is jitted; the train steps donate the TrainState so device
memory stays flat.  Generation helpers never mutate batch-norm running
stats (the reference incidentally updated them during train-mode visual
dumps; outputs are identical either way since training-mode batch norm
ignores running stats).
"""

from __future__ import annotations

import functools
import os
from collections import OrderedDict
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..config import TrainConfig
from ..nn import networks as N
from ..ops.numerics import gauss_reparametrize
from .accum import make_aug_accum_step, make_stoch_accum_step
from .state import TrainState, init_state
from .steps import (
    apply_net,
    make_aug_supervised_step,
    make_aug_train_step,
    make_stoch_train_step,
)


def _accum_k(opt) -> int:
    """--grad_accum microbatch count (1 = the fused single-batch step)."""
    k = int(getattr(opt, "grad_accum", 1) or 1)
    if k > 1 and getattr(opt, "supervised", False):
        raise ValueError("--grad_accum does not support --supervised runs "
                         "(the supervised step is single-batch; drop one "
                         "of the two flags)")
    return k


def _as_jnp(x):
    return x if isinstance(x, jax.Array) else jnp.asarray(x)


def _reorder_visuals(visuals):
    """jit canonicalizes dict outputs to key-sorted order; restore the
    reference's visuals order (model.py:518-525 OrderedDict), which
    cli/train.py visualize_cycle turns into grid COLUMNS via .values()."""
    order = ("real_A", "fake_B", "rec_A", "real_B", "fake_A", "rec_B")
    return OrderedDict((k, visuals[k]) for k in order)


def _indexed_step(step_fn):
    """Fold the --device_data batch gather INTO the step program.

    The host-loop feed gathers each batch from the HBM-pinned train set
    with two standalone fancy-index dispatches before the step call; on
    the tunneled backend those extra per-step dispatches cost ~30% of
    delivered throughput (BASELINE.md round-5 loop rows, feed_bench.py
    attribution).  Here the tiny index vectors ride the step call itself
    and XLA gathers in-graph — one dispatch per step total.  Numerics:
    jnp.take of the same rows the host iterator would have gathered, so
    step inputs are bit-identical to the host feed."""
    def f(state, data_A, data_B, idx_A, idx_B, *rest):
        return step_fn(state, jnp.take(data_A, idx_A, axis=0),
                       jnp.take(data_B, idx_B, axis=0), *rest)
    return f


class _CycleGANBase:
    """Shared plumbing: state, jit caches, lr schedule, checkpoint IO."""

    net_names: Tuple[str, ...] = ()

    def __init__(self, opt: TrainConfig, testing: bool = False,
                 rng: Optional[jax.Array] = None, image_size: Optional[int] = None):
        self.opt = opt
        self.old_lr = opt.lr
        self.old_lr_d = opt.lr / 5.0   # D optimizers start at lr/5
        #                                (reference model.py:112-114,384-389)
        self.epoch = opt.epoch_count
        self.training = True
        seed = opt.seed if opt.seed is not None else 0
        root = rng if rng is not None else jax.random.PRNGKey(seed)
        self._rng, init_key = jax.random.split(root)
        self.nets, self.state = init_state(opt, init_key, image_size=image_size)
        self._step_counter = 0

        if not testing and opt.expr_dir:
            with open(os.path.join(opt.expr_dir, "nets.txt"), "w") as f:
                for name in self.net_names:
                    N.print_network(name, self.state.params[name], f)

        self._jit_cache: Dict[str, Any] = {}

    # -- rng ------------------------------------------------------------
    def next_key(self) -> jax.Array:
        self._rng, k = jax.random.split(self._rng)
        return k

    def sample_prior_z(self, batch: int) -> jax.Array:
        return jax.random.normal(self.next_key(), (batch, self.opt.nlatent))

    def _prep_prior(self, batch: int, prior_z_B) -> jax.Array:
        """Shared prior-z handling for every train entry: draw from the
        prior when the caller passes None, otherwise accept flat (B, nz)
        or image-layout (B, 1, 1, nz) codes."""
        if prior_z_B is None:
            return self.sample_prior_z(batch)
        prior_z_B = _as_jnp(prior_z_B)
        if prior_z_B.ndim == 4:
            prior_z_B = prior_z_B.reshape(prior_z_B.shape[0], -1)
        return prior_z_B

    def train_instance_indexed(self, data_A, data_B, idx_A, idx_B,
                               prior_z_B=None):
        """train_instance on rows idx_A/idx_B of the HBM-pinned train set:
        the gather happens inside the step program (_indexed_step), so one
        dispatch per step carries everything.  Same return contract as
        train_instance; bit-identical trajectory to feeding the gathered
        batches (tests/test_cli.py::test_device_data_feed_identical)."""
        idx_A, idx_B = jnp.asarray(idx_A), jnp.asarray(idx_B)
        prior_z_B = self._prep_prior(int(idx_A.shape[0]), prior_z_B)
        self.state, losses, visuals, gnorms = self._train_step_idx(
            self.state, _as_jnp(data_A), _as_jnp(data_B), idx_A, idx_B,
            prior_z_B, jnp.float32(self.old_lr), jnp.float32(self.old_lr_d),
            self.next_key())
        return self._format_train_out(losses, visuals, gnorms)

    # -- forward helpers (jitted, train-flag static) --------------------
    def _apply(self, name: str, *args, train: Optional[bool] = None):
        train = self.training if train is None else train
        # train-mode generator forwards need a dropout rng when
        # --use_dropout is set (the reference dumps train-mode visuals
        # with dropout active, train.py:47-94); drawing next_key() only
        # in that case keeps the default RNG stream untouched
        needs_drop = (train and bool(self.opt.use_dropout)
                      and name in ("netG_A_B", "netG_B_A"))
        key = ("apply", name, train)
        if key not in self._jit_cache:
            net = self.nets[name]

            if needs_drop:
                @jax.jit
                def f(params, stats, rng, *xs):
                    out, _ = apply_net(net, params, stats, *xs, train=train,
                                       rngs={"dropout": rng})
                    return out
            else:
                @jax.jit
                def f(params, stats, *xs):
                    out, _ = apply_net(net, params, stats, *xs, train=train)
                    return out

            self._jit_cache[key] = f
        lead = (self.next_key(),) if needs_drop else ()
        return self._jit_cache[key](self.state.params[name],
                                    self.state.batch_stats[name],
                                    *lead, *args)

    def predict_A(self, real_B):
        return self._apply("netG_B_A", _as_jnp(real_B))

    def predict_B(self, real_A, z_B):
        z_B = _as_jnp(z_B)
        if z_B.ndim == 4:
            z_B = z_B.reshape(z_B.shape[0], -1)
        return self._apply("netG_A_B", _as_jnp(real_A), z_B)

    # -- lr schedule (reference model.py:282-291, 735-748) --------------
    def update_learning_rate(self):
        """Linear decay.  The reference sets EVERY optimizer's param groups
        — including the discriminators' — to the full decayed lr, so D's
        initial /5 discount vanishes the moment decay starts (quirk Q11).
        That is the default here; --d_lr_mode ratio keeps D at lr/5 of the
        decayed schedule instead."""
        lrd = self.opt.lr / self.opt.niter_decay
        lr = self.old_lr - lrd
        print("update learning rate: %f -> %f" % (self.old_lr, lr))
        self.old_lr = lr
        if getattr(self.opt, "d_lr_mode", "reference") == "ratio":
            self.old_lr_d = lr / 5.0
        else:
            self.old_lr_d = lr

    def _derive_lr_d(self):
        """Recompute old_lr_d from a restored old_lr (checkpoints predate
        the split D schedule): old_lr < opt.lr iff at least one
        update_learning_rate call happened, i.e. decay has started."""
        decayed = self.old_lr < self.opt.lr
        reference = getattr(self.opt, "d_lr_mode", "reference") == "reference"
        # two-case schedule: D runs at lr/5 until decay starts; under the
        # reference-faithful mode decay then sets D to the full decayed lr
        # (pre-decay old_lr == opt.lr, so old_lr/5 covers both /5 cases)
        self.old_lr_d = self.old_lr if (reference and decayed) \
            else self.old_lr / 5.0

    # -- mode toggles ---------------------------------------------------
    def eval(self):
        self.training = False

    def train(self):
        self.training = True

    def swap_ema(self):
        """Swap the live generator/encoder params with their EMA shadow
        (--ema).  Call once before eval/export to score the averaged
        weights, and once after to resume training on the live ones.
        No-op when EMA tracking is off."""
        if not self.state.ema:
            return
        params = dict(self.state.params)
        ema = {}
        for name, shadow in self.state.ema.items():
            ema[name] = params[name]
            params[name] = shadow
        self.state = self.state.replace(params=params, ema=ema)

    # -- checkpoint IO (same latest/best_A/best_B contract, §5) ---------
    def _ckpt_payload(self) -> dict:
        payload = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "pools": self.state.pools,
            "step": self.state.step,
            "old_lr": np.float64(self.old_lr),
            "epoch": np.int64(self.epoch),
        }
        if self.state.ema:
            payload["ema"] = self.state.ema
        return payload

    def _orbax(self):
        if not hasattr(self, "_orbax_ckpt"):
            from ..utils.checkpoint import OrbaxCheckpointer
            self._orbax_ckpt = OrbaxCheckpointer()
        return self._orbax_ckpt

    def save(self, chk_name: str, async_save: bool = False):
        """Write a checkpoint; with async_save the disk write happens in the
        background (utils.checkpoint) so the train loop never stalls on IO.
        Backend per --ckpt_backend: 'flax' single-file bytes (default) or
        'orbax' checkpoint directories."""
        chk_path = os.path.join(self.opt.expr_dir, chk_name)
        payload = self._ckpt_payload()
        if jax.process_count() > 1:
            # multi-host: tensor-sharded params/moments span non-addressable
            # devices — gather the tree to the host in ONE compiled program
            # (replicated leaves are fetched as-is, no collective);
            # the gathered host tree then goes through the SAME backend
            # dispatch below, so --ckpt_backend orbax + async_save are
            # honored in multi-host runs too
            from ..parallel.multihost import to_host_tree
            payload = to_host_tree(payload)
        if getattr(self.opt, "ckpt_backend", "flax") == "orbax":
            self._orbax().save(chk_path, payload, async_save=async_save)
            return
        if async_save:
            if not hasattr(self, "_async_ckpt"):
                from ..utils.checkpoint import AsyncCheckpointer
                self._async_ckpt = AsyncCheckpointer()
            self._async_ckpt.save(chk_path, payload)
            return
        payload = jax.device_get(payload)
        # atomic publish (write-to-temp + rename, like utils.checkpoint's
        # async writer): a crash mid-write must never corrupt an existing
        # 'latest'/'best_*' — the direct open(chk_path,'wb') truncated it
        # before the bytes were even serialized
        tmp = chk_path + ".tmp"
        try:
            with open(tmp, "wb") as f:
                f.write(serialization.to_bytes(payload))
            os.replace(tmp, chk_path)
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise

    def wait_for_saves(self):
        if hasattr(self, "_async_ckpt"):
            self._async_ckpt.wait()
        if hasattr(self, "_orbax_ckpt"):
            self._orbax_ckpt.wait()

    def load(self, chk_path: str):
        """Restore a checkpoint, auto-detecting the backend by path type
        (directory -> orbax, file -> flax bytes) so either backend's
        checkpoints load regardless of the current --ckpt_backend."""
        self.wait_for_saves()

        def alt_target(target):
            # EMA-tracking mismatch between the checkpoint and this config
            # (--ema on/off changed): build the other payload structure.
            if "ema" in target:
                target.pop("ema")
            else:
                target["ema"] = {n: target["params"][n]
                                 for n in ("netG_A_B", "netG_B_A", "netE_B")
                                 if n in target["params"]}
            return target

        def pools_compatible(shapes: dict) -> bool:
            # shapes: {pool_name: buf shape} as stored in the checkpoint
            cur = self.state.pools
            return (set(shapes) == set(cur)
                    and all(tuple(shapes[k]) == tuple(cur[k].buf.shape)
                            for k in shapes))

        pools_ok = True
        if os.path.isdir(chk_path):
            target = self._ckpt_payload()
            meta = None
            try:
                meta = self._orbax().metadata(chk_path).item_metadata.tree
            except Exception:
                pass  # older orbax / foreign layout: fall back to retries
            if meta is not None:
                # probe the on-disk layout once instead of trial restores
                if ("ema" in meta) != ("ema" in target):
                    target = alt_target(target)
                if "pools" not in meta:
                    # pre-pools checkpoint: nothing on disk to restore
                    pools_ok = not self.state.pools
                    target = dict(target)
                    target.pop("pools", None)
                else:
                    disk_pools = meta["pools"]
                    pools_ok = pools_compatible(
                        {k: tuple(v["buf"].shape)
                         for k, v in disk_pools.items()})
                    if not pools_ok:
                        # --pool_size changed since the save: restore the
                        # on-disk pools against abstract leaves (orbax
                        # rejects structure mismatches), discarded below
                        target = dict(target)
                        target["pools"] = {
                            k: {"buf": jax.ShapeDtypeStruct(
                                    tuple(v["buf"].shape), v["buf"].dtype),
                                "n": jax.ShapeDtypeStruct((), jnp.int32)}
                            for k, v in disk_pools.items()}
                payload = self._orbax().restore(chk_path, target)
            else:
                try:
                    payload = self._orbax().restore(chk_path, target)
                except Exception as first:
                    # retry with the alternate EMA/non-EMA target but chain
                    # the original error so a genuinely corrupt checkpoint
                    # isn't masked by the second attempt's mismatch
                    try:
                        payload = self._orbax().restore(
                            chk_path, alt_target(self._ckpt_payload()))
                    except Exception as second:
                        raise second from first
        else:
            with open(chk_path, "rb") as f:
                data = f.read()
            # inspect the serialized structure for the 'ema' key (instead
            # of a blind retry) so --ema on/off mismatches are resolved
            # deliberately and real corruption surfaces as itself
            raw = serialization.msgpack_restore(data)
            target = self._ckpt_payload()
            if ("ema" in raw) != ("ema" in target):
                target = alt_target(target)
            raw_pools = raw.get("pools") or {}
            pools_ok = pools_compatible(
                {k: tuple(np.shape(v["buf"])) for k, v in raw_pools.items()})
            raw = dict(raw)
            raw.setdefault("pools", {})  # tolerate pre-pools checkpoints
            if not pools_ok:
                # --pool_size changed since the save: skip the pools during
                # structural restore and keep this config's fresh ones
                target = dict(target)
                target["pools"] = {}
                raw["pools"] = {}
            payload = serialization.from_state_dict(target, raw)
        if not pools_ok:
            print("warning: checkpoint pool buffers do not match this "
                  "config's --pool_size; starting with fresh pools")
            payload["pools"] = self.state.pools
        ema = payload.get("ema", {})
        if self.state.ema and not ema:
            # this config tracks EMA but the checkpoint predates it: seed
            # the shadow from the LOADED params (not this model's random
            # init) so --use_ema scores trained weights immediately
            ema = {n: payload["params"][n] for n in self.state.ema
                   if n in payload["params"]}
        # .replace() keeps any future TrainState fields intact (CLAUDE.md
        # invariant: never rebuild one from scratch)
        self.state = self.state.replace(
            params=payload["params"], batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            pools=payload.get("pools", self.state.pools),
            ema=ema,
            step=jnp.asarray(payload["step"], jnp.int32))
        self.old_lr = float(payload["old_lr"])
        self.epoch = int(payload["epoch"])
        self._derive_lr_d()

    # -- shared generation helpers --------------------------------------
    def generate_multi(self, real_A, multi_prior_z_B):
        """Tile each A over num z's and decode in ONE batched forward
        (reference model.py:268-280/687-696)."""
        real_A = _as_jnp(real_A)
        z = _as_jnp(multi_prior_z_B)
        if z.ndim == 4:
            z = z.reshape(z.shape[0], -1)
        num = z.shape[0] // real_A.shape[0]
        multi_A = jnp.repeat(real_A[:, None], num, axis=1).reshape(
            (-1,) + real_A.shape[1:])
        return self.predict_B(multi_A, z)

    def generate_cycle_B_multi(self, real_B, multi_prior_z_B):
        """B -> A once, then many z's for A -> B (model.py:235-245/698-708)."""
        real_B = _as_jnp(real_B)
        z = _as_jnp(multi_prior_z_B)
        if z.ndim == 4:
            z = z.reshape(z.shape[0], -1)
        fake_A = self.predict_A(real_B)
        num = z.shape[0] // real_B.shape[0]
        multi_fake_A = jnp.repeat(fake_A[:, None], num, axis=1).reshape(
            (-1,) + fake_A.shape[1:])
        multi_fake_B = self.predict_B(multi_fake_A, z)
        return fake_A, multi_fake_B


class StochCycleGAN(_CycleGANBase):
    """Stochastic CycleGAN; with ignore_noise=True it is the deterministic
    `cycle_gan` variant (z forced to 1, reference model.py:128-129)."""

    net_names = ("netG_A_B", "netG_B_A", "netD_A", "netD_B")

    def __init__(self, opt: TrainConfig, ignore_noise: bool = False,
                 testing: bool = False, **kw):
        self.ignore_noise = ignore_noise
        super().__init__(opt, testing=testing, **kw)
        raw_step = (make_stoch_accum_step(self.nets, opt, ignore_noise)
                    if _accum_k(opt) > 1
                    else make_stoch_train_step(self.nets, opt, ignore_noise))
        self._train_step = jax.jit(raw_step, donate_argnums=(0,))
        self._train_step_idx = jax.jit(_indexed_step(raw_step),
                                       donate_argnums=(0,))

    def train_instance(self, real_A, real_B, prior_z_B=None):
        real_A, real_B = _as_jnp(real_A), _as_jnp(real_B)
        prior_z_B = self._prep_prior(real_A.shape[0], prior_z_B)
        self.state, losses, visuals, gnorms = self._train_step(
            self.state, real_A, real_B, prior_z_B,
            jnp.float32(self.old_lr), jnp.float32(self.old_lr_d),
            self.next_key())
        return self._format_train_out(losses, visuals, gnorms)

    def _format_train_out(self, losses, visuals, gnorms):
        order = ["D_A", "G_A", "Cyc_A", "D_B", "G_B", "Cyc_B",
                 "P_t_A", "P_f_A", "P_t_B", "P_f_B"]
        losses = OrderedDict((k, losses[k]) for k in order)
        visuals = _reorder_visuals(visuals)
        if self.opt.monitor_gnorm:
            g = OrderedDict([("gnorm_G_A_B", gnorms["gnorm_G_A_B"]),
                             ("gnorm_G_B_A", gnorms["gnorm_G_B_A"]),
                             ("gnorm_D_B", gnorms["gnorm_D_B"]),
                             ("gnorm_D_A", gnorms["gnorm_D_A"])])
            return losses, visuals, g
        return losses, visuals

    def _prep_z(self, z):
        z = _as_jnp(z)
        if z.ndim == 4:
            z = z.reshape(z.shape[0], -1)
        return jnp.ones_like(z) if self.ignore_noise else z

    def predict_B(self, real_A, z_B):
        return super().predict_B(real_A, self._prep_z(z_B))

    def generate_cycle(self, real_A, real_B, prior_z_B):
        z = self._prep_z(prior_z_B)
        fake_B = self.predict_B(real_A, z)
        fake_A = self.predict_A(real_B)
        rec_A = self.predict_A(fake_B)
        rec_B = self.predict_B(fake_A, z)
        return OrderedDict([("real_A", real_A), ("fake_B", fake_B),
                            ("rec_A", rec_A), ("real_B", real_B),
                            ("fake_A", fake_A), ("rec_B", rec_B)])

    def generate_multi_cycle(self, real_B, steps: int):
        images = [_as_jnp(real_B)]
        B = images[0]
        for _ in range(steps):
            A = self.predict_A(B)
            z = self.sample_prior_z(B.shape[0])
            B = self.predict_B(A, z)
            images.extend([A, B])
        return images

    def generate_noisy_cycle(self, real_B, std):
        real_B = _as_jnp(real_B)
        fake_A = self.predict_A(real_B)
        z = self.sample_prior_z(real_B.shape[0])
        noise_std = std / 127.5
        noise = noise_std * jax.random.normal(self.next_key(), fake_A.shape)
        noisy_fake_A = jnp.clip(fake_A + noise, -1, 1)
        return self.predict_B(noisy_fake_A, z)


class AugmentedCycleGAN(_CycleGANBase):
    """Augmented CycleGAN (reference model.py:337-795): adds the latent
    encoder E_B and latent discriminator D_z_B, 4 optimizers, latent cycle
    and KLD/z-GAN losses."""

    net_names = ("netG_A_B", "netG_B_A", "netD_A", "netD_B",
                 "netD_z_B", "netE_B")

    def __init__(self, opt: TrainConfig, testing: bool = False, **kw):
        super().__init__(opt, testing=testing, **kw)
        raw_step = (make_aug_accum_step(self.nets, opt) if _accum_k(opt) > 1
                    else make_aug_train_step(self.nets, opt))
        self._train_step = jax.jit(raw_step, donate_argnums=(0,))
        self._train_step_idx = jax.jit(_indexed_step(raw_step),
                                       donate_argnums=(0,))
        self._sup_step = jax.jit(make_aug_supervised_step(self.nets, opt),
                                 donate_argnums=(0,))

    def train_instance(self, real_A, real_B, prior_z_B=None):
        real_A, real_B = _as_jnp(real_A), _as_jnp(real_B)
        prior_z_B = self._prep_prior(real_A.shape[0], prior_z_B)
        self.state, losses, visuals, gnorms = self._train_step(
            self.state, real_A, real_B, prior_z_B,
            jnp.float32(self.old_lr), jnp.float32(self.old_lr_d),
            self.next_key())
        return self._format_train_out(losses, visuals, gnorms)

    def _format_train_out(self, losses, visuals, gnorms):
        order = ["D_A", "G_A", "Cyc_A", "Cyc_z_B", "KLD_z_B", "D_B", "G_B",
                 "Cyc_B", "D_z_B", "P_t_A", "P_f_A", "P_t_B", "P_f_B"]
        losses = OrderedDict((k, losses[k]) for k in order)
        visuals = _reorder_visuals(visuals)
        if self.opt.monitor_gnorm:
            g = OrderedDict([("gnorm_G_A_B", gnorms["gnorm_G_A_B"]),
                             ("gnorm_G_B_A", gnorms["gnorm_G_B_A"]),
                             ("gnorm_E_B", gnorms["gnorm_E_B"]),
                             ("gnorm_D_B", gnorms["gnorm_D_B"]),
                             ("gnorm_D_z_B", gnorms["gnorm_D_z_B"]),
                             ("gnorm_D_A", gnorms["gnorm_D_A"]),
                             ("mu_min", gnorms["mu_min"]),
                             ("mu_max", gnorms["mu_max"]),
                             ("logvar_min", gnorms["logvar_min"]),
                             ("logvar_max", gnorms["logvar_max"])])
            return losses, visuals, g
        return losses, visuals

    def supervised_train_instance(self, real_A, real_B, prior_z_B=None):
        real_A, real_B = _as_jnp(real_A), _as_jnp(real_B)
        prior_z_B = self._prep_prior(real_A.shape[0], prior_z_B)
        self.state, losses = self._sup_step(
            self.state, real_A, real_B, prior_z_B,
            jnp.float32(self.old_lr), jnp.float32(self.old_lr_d),
            self.next_key())
        order = ["S_A", "S_B", "KLD_z_B", "D_z_B", "gnorm_G_A_B",
                 "gnorm_G_B_A", "gnorm_E_B", "gnorm_D_z_B"]
        return OrderedDict((k, losses[k]) for k in order)

    # -- posterior helpers ---------------------------------------------
    def predict_enc_params(self, real_A, real_B):
        real_A, real_B = _as_jnp(real_A), _as_jnp(real_B)
        enc_in = (jnp.concatenate([real_A, real_B], axis=-1)
                  if self.opt.enc_A_B else real_B)
        mu, logvar = self._apply("netE_B", enc_in)
        if self.opt.stoch_enc:
            return mu, logvar
        return (mu,)

    def _posterior_z(self, real_A_ish, real_B):
        enc_in = (jnp.concatenate([_as_jnp(real_A_ish), _as_jnp(real_B)],
                                  axis=-1)
                  if self.opt.enc_A_B else _as_jnp(real_B))
        mu, logvar = self._apply("netE_B", enc_in)
        if self.opt.stoch_enc:
            return gauss_reparametrize(self.next_key(), mu, logvar)
        return mu

    def generate_cycle(self, real_A, real_B, prior_z_B):
        prior_z_B = _as_jnp(prior_z_B)
        if prior_z_B.ndim == 4:
            prior_z_B = prior_z_B.reshape(prior_z_B.shape[0], -1)
        fake_B = self.predict_B(real_A, prior_z_B)
        fake_A = self.predict_A(real_B)
        rec_A = self.predict_A(fake_B)
        post_z = self._posterior_z(fake_A, real_B)
        rec_B = self.predict_B(fake_A, post_z)
        return OrderedDict([("real_A", real_A), ("fake_B", fake_B),
                            ("rec_A", rec_A), ("real_B", real_B),
                            ("fake_A", fake_A), ("rec_B", rec_B)])

    def generate_noisy_cycle(self, real_B, std):
        real_B = _as_jnp(real_B)
        fake_A = self.predict_A(real_B)
        noise_std = std / 127.5
        noise = noise_std * jax.random.normal(self.next_key(), fake_A.shape)
        noisy_fake_A = jnp.clip(fake_A + noise, -1, 1)
        post_z = self._posterior_z(fake_A, real_B)
        return self.predict_B(noisy_fake_A, post_z)

    def generate_multi_cycle(self, real_B, steps: int, from_prior: bool = True):
        images = [_as_jnp(real_B)]
        B = images[0]
        for _ in range(steps):
            A = self.predict_A(B)
            if from_prior:
                z = self.sample_prior_z(B.shape[0])
            else:
                z = self._posterior_z(A, B)
            B = self.predict_B(A, z)
            images.extend([A, B])
        return images

    def inference_multi(self, real_A, real_B):
        """Posterior-z transfer grid: every A decoded with every z inferred
        from the B batch (reference model.py:710-733)."""
        real_A, real_B = _as_jnp(real_A), _as_jnp(real_B)
        num = real_B.shape[0]
        multi_A = jnp.repeat(real_A[:, None], num, axis=1).reshape(
            (-1,) + real_A.shape[1:])
        fake_A = self.predict_A(real_B)
        post_z = self._posterior_z(fake_A, real_B)
        multi_z = jnp.tile(post_z, (real_A.shape[0], 1))
        return self.predict_B(multi_A, multi_z)


def create_model(opt: TrainConfig, testing: bool = False, **kw):
    """Model dispatch (reference train.py:157-166)."""
    if opt.model == "stoch_cycle_gan":
        return StochCycleGAN(opt, testing=testing, **kw)
    if opt.model == "cycle_gan":
        return StochCycleGAN(opt, ignore_noise=True, testing=testing, **kw)
    if opt.model == "aug_cycle_gan":
        return AugmentedCycleGAN(opt, testing=testing, **kw)
    raise NotImplementedError("Specified model is not implemented.")
