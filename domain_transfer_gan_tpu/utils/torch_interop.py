"""Checkpoint interop with the PyTorch reference implementation.

Lets a user of the reference (adrianalbert/domain-transfer-GAN) migrate a
trained checkpoint into this framework — and back — without retraining:

- :func:`import_torch_checkpoint` reads a reference ``torch.save`` checkpoint
  (the dict of per-net ``state_dict``s + optimizer state dicts written by
  reference model.py:293-303 / 750-764) and loads it into a model's
  TrainState: parameters, batch-norm running stats, and (optionally) the
  Adam first/second moments + step counts.
- :func:`export_torch_checkpoint` writes this framework's TrainState as a
  reference-format torch checkpoint (including the duplicate alias keys the
  reference's CINResnetBlock registers via ``add_module``,
  reference modules.py:145-146, so ``load_state_dict(strict=True)`` accepts
  it).

Layout/key-name knowledge is derived from the reference constructors:
CINResnetGenerator networks.py:149-197, ResnetGenerator networks.py:203-252,
Discriminator networks.py:308-349, Discriminator_edges networks.py:352-393,
DiscriminatorLatent networks.py:396-433, LatentEncoder networks.py:438-483,
CINResnetBlock/ResnetBlock modules.py:139-235, CondInstanceNorm
modules.py:104-132, InstanceNorm modules.py:64-98.

Weight-layout conversions (torch NCHW / OIHW -> our NHWC / HWIO):

- Conv2d weight (O, I, kh, kw)        -> kernel (kh, kw, I, O)
- ConvTranspose2d weight (I, O, kh, kw) -> kernel (kh, kw, I, O) with a
  spatial flip: torch's ConvTranspose2d is the *gradient* of a correlation
  (a convolution), while ops.convs.conv_transpose2d_torch correlates the
  dilated input with an unflipped kernel — identical outputs iff
  ours[i, j] = torch[..., kh-1-i, kw-1-j].
- Linear weight (O, I)                -> kernel (I, O)
- CIN's 1x1 convs on z (O, nlatent, 1, 1) -> Dense kernel (nlatent, O)

Optimizer import maps the reference's Adam groups (model.py:109-114 for
StochCycleGAN: G covers netG_A_B+netG_B_A, D covers netD_A+netD_B;
model.py:379-389 for AugmentedCycleGAN: G_A=netG_B_A, G_B=netG_A_B+netE_B,
D_A=netD_A, D_B=netD_B+netD_z_B) onto this framework's per-network
``optax.scale_by_adam`` states — mathematically identical since Adam state
is per-parameter and the torch groups never mix learning rates within a
group.  torch keys its optimizer state by the parameter's position in the
group (registration order), which this module reproduces from the layout
tables.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# layout tables: (torch_module_prefix, our_param_path, kind)
#   kind in {"conv", "convt", "dense", "in", "bn"}
# "cin" entries are expanded into two dense entries (shift then scale —
# registration order of CondInstanceNorm, reference modules.py:111-118).
# ---------------------------------------------------------------------------


def _cin(tk: str, path: Tuple[str, ...]):
    return [(tk + ".shift_conv.0", path + ("shift_conv",), "dense1x1"),
            (tk + ".scale_conv.0", path + ("scale_conv",), "dense1x1")]


def _norm(tk: str, base: Tuple[str, ...], norm: str):
    """A _NormRelu/_NormLRelu's inner norm: InstanceNorm at (<base>, 'norm'),
    BatchNorm2d at (<base>, 'norm', 'bn')."""
    if norm == "instance":
        return [(tk, base + ("norm",), "in")]
    return [(tk, base + ("norm", "bn"), "bn")]


def layout_G_A_B(use_dropout: bool = False):
    """CINResnetGenerator (reference networks.py:149-197): TwoInputSequential
    'model' indices 0 pad, 1 conv7, 2 CIN, 3 relu, 4 conv3, 5 CIN, 6 relu,
    7 conv3s2, 8 CIN, 9 relu, 10-12 CINResnetBlock, 13 convT, 14 CIN,
    15 relu, 16 conv3, 17 CIN, 18 relu, 19 conv7, 20 tanh."""
    e = [("model.1", ("conv0",), "conv")]
    e += _cin("model.2", ("cin0",))
    e += [("model.4", ("conv1",), "conv")]
    e += _cin("model.5", ("cin1",))
    e += [("model.7", ("conv2",), "conv")]
    e += _cin("model.8", ("cin2",))
    # CINResnetBlock conv_block (modules.py:148-183): 0 pad, 1 Merge(conv,
    # CIN), 2 relu, [3 dropout], 3/4 pad, 4/5 conv, 5/6 InstanceNorm
    ci = 5 if use_dropout else 4
    for i in range(3):
        p = "model.%d.conv_block" % (10 + i)
        b = ("block%d" % i,)
        e += [(p + ".1.module1", b + ("conv1",), "conv")]
        e += _cin(p + ".1.module2", b + ("cin1",))
        e += [(p + ".%d" % ci, b + ("conv2",), "conv"),
              (p + ".%d" % (ci + 1), b + ("norm2",), "in")]
    e += [("model.13", ("up0",), "convt")]
    e += _cin("model.14", ("cin3",))
    e += [("model.16", ("conv3",), "conv")]
    e += _cin("model.17", ("cin4",))
    e += [("model.19", ("conv4",), "conv")]
    return e


def layout_G_B_A(norm: str = "instance", use_dropout: bool = False):
    """ResnetGenerator (reference networks.py:203-252); same sequential
    indices as layout_G_A_B with plain norms in place of CINs."""
    e = [("model.1", ("conv0",), "conv")]
    e += _norm("model.2", ("nr0",), norm)
    e += [("model.4", ("conv1",), "conv")]
    e += _norm("model.5", ("nr1",), norm)
    e += [("model.7", ("conv2",), "conv")]
    e += _norm("model.8", ("nr2",), norm)
    # ResnetBlock conv_block (modules.py:199-230): 0 pad, 1 conv, 2 relu,
    # [3 dropout], 3/4 pad, 4/5 conv, 5/6 norm.  NB no norm after conv1.
    ci = 5 if use_dropout else 4
    for i in range(3):
        p = "model.%d.conv_block" % (10 + i)
        b = ("block%d" % i,)
        e += [(p + ".1", b + ("conv1",), "conv"),
              (p + ".%d" % ci, b + ("conv2",), "conv")]
        if norm == "instance":
            e += [(p + ".%d" % (ci + 1), b + ("norm2",), "in")]
        else:
            e += [(p + ".%d" % (ci + 1), b + ("norm2", "bn"), "bn")]
    e += [("model.13", ("up0",), "convt")]
    e += _norm("model.14", ("nr3",), norm)
    e += [("model.16", ("conv3",), "conv")]
    e += _norm("model.17", ("nr4",), norm)
    e += [("model.19", ("conv4",), "conv")]
    return e


def _layout_patch_D(norm: str):
    """Shared sequential shape of Discriminator / Discriminator_edges
    (networks.py:321-338 / :364-382): conv, lrelu, [conv, norm, lrelu] x3,
    conv -> indices 0, 2, 3, 5, 6, 8, 9, 11."""
    e = [("model.0", ("conv0",), "conv"),
         ("model.2", ("conv1",), "conv")]
    e += _norm("model.3", ("nl1",), norm)
    e += [("model.5", ("conv2",), "conv")]
    e += _norm("model.6", ("nl2",), norm)
    e += [("model.8", ("conv3",), "conv")]
    e += _norm("model.9", ("nl3",), norm)
    e += [("model.11", ("conv4",), "conv")]
    return e


def layout_D_z_B():
    """DiscriminatorLatent (networks.py:405-419): Linear/BatchNorm1d/LReLU
    x3 + Linear -> indices 0, 1, 3, 4, 6, 7, 9."""
    e = []
    for i, (fc, bn) in enumerate(((0, 1), (3, 4), (6, 7))):
        e += [("model.%d" % fc, ("fc%d" % i,), "dense"),
              ("model.%d" % bn, ("bn%d" % i, "bn"), "bn")]
    e += [("model.9", ("fc3",), "dense")]
    return e


def layout_E_B():
    """LatentEncoder (networks.py:444-482): conv_modules indices 0, 2, 3,
    5, 6, 8, 9, 11, 12 then enc_mu / enc_logvar heads.  Norm is always
    batch (reference model.py:364)."""
    e = [("conv_modules.0", ("conv0",), "conv"),
         ("conv_modules.2", ("conv1",), "conv"),
         ("conv_modules.3", ("nr1", "norm", "bn"), "bn"),
         ("conv_modules.5", ("conv2",), "conv"),
         ("conv_modules.6", ("nr2", "norm", "bn"), "bn"),
         ("conv_modules.8", ("conv3",), "conv"),
         ("conv_modules.9", ("nr3", "norm", "bn"), "bn"),
         ("conv_modules.11", ("conv4",), "conv"),
         ("conv_modules.12", ("nr4", "norm", "bn"), "bn"),
         ("enc_mu", ("enc_mu",), "conv"),
         ("enc_logvar", ("enc_logvar",), "conv")]
    return e


def reference_layouts(cfg) -> Dict[str, list]:
    """Per-network layout tables for the configured model variant."""
    layouts = {
        "netG_A_B": layout_G_A_B(cfg.use_dropout),
        "netG_B_A": layout_G_B_A(cfg.norm, cfg.use_dropout),
        "netD_A": _layout_patch_D(cfg.norm),
        "netD_B": _layout_patch_D(cfg.norm),
    }
    if cfg.model == "aug_cycle_gan":
        layouts["netD_z_B"] = layout_D_z_B()
        layouts["netE_B"] = layout_E_B()
    return layouts


# reference optimizer groups: checkpoint key -> networks in registration
# order (model.py:109-114, 379-389)
OPTIMIZER_GROUPS = {
    "aug_cycle_gan": {
        "optimizer_G_A": ("netG_B_A",),
        "optimizer_G_B": ("netG_A_B", "netE_B"),
        "optimizer_D_A": ("netD_A",),
        "optimizer_D_B": ("netD_B", "netD_z_B"),
    },
    "stoch_cycle_gan": {
        "optimizer_G": ("netG_A_B", "netG_B_A"),
        "optimizer_D": ("netD_A", "netD_B"),
    },
}
OPTIMIZER_GROUPS["cycle_gan"] = OPTIMIZER_GROUPS["stoch_cycle_gan"]


# ---------------------------------------------------------------------------
# tensor-layout conversions
# ---------------------------------------------------------------------------

def t2j_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def j2t_conv(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1)))


def t2j_convt(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(
        np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def j2t_convt(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(k, (2, 3, 0, 1))[:, :, ::-1, ::-1])


def t2j_dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def t2j_dense1x1(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def j2t_dense1x1(k: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(k.T[:, :, None, None])


# ---------------------------------------------------------------------------
# flat leaf maps
# ---------------------------------------------------------------------------

def _get(tree, path):
    node = tree
    for p in path:
        if p not in node:
            return None
        node = node[p]
    return node


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def leaf_map(layout, our_params) -> Tuple[list, list]:
    """Expand a layout into ordered per-leaf maps.

    Returns (param_leaves, buffer_leaves) where param_leaves is
    [(torch_key, our_path, transform)] in torch ``parameters()``
    registration order (the order torch's optimizer state is keyed by) and
    buffer_leaves covers batch-norm running stats.  Bias presence is read
    off the actual param tree (e.g. the encoder's middle convs are
    bias-free, reference networks.py:444-465).
    """
    params, buffers = [], []
    for tk, path, kind in layout:
        if kind == "conv":
            params.append((tk + ".weight", path + ("kernel",), "conv"))
            if _get(our_params, path + ("bias",)) is not None:
                params.append((tk + ".bias", path + ("bias",), "copy"))
        elif kind == "convt":
            params.append((tk + ".weight", path + ("kernel",), "convt"))
            if _get(our_params, path + ("bias",)) is not None:
                params.append((tk + ".bias", path + ("bias",), "copy"))
        elif kind == "dense":
            params.append((tk + ".weight", path + ("kernel",), "dense"))
            params.append((tk + ".bias", path + ("bias",), "copy"))
        elif kind == "dense1x1":
            params.append((tk + ".weight", path + ("kernel",), "dense1x1"))
            params.append((tk + ".bias", path + ("bias",), "copy"))
        elif kind == "in":
            params.append((tk + ".scale", path + ("scale",), "copy"))
            params.append((tk + ".shift", path + ("shift",), "copy"))
        elif kind == "bn":
            params.append((tk + ".weight", path + ("scale",), "copy"))
            params.append((tk + ".bias", path + ("bias",), "copy"))
            buffers.append((tk + ".running_mean", path + ("mean",)))
            buffers.append((tk + ".running_var", path + ("var",)))
        else:  # pragma: no cover
            raise ValueError("unknown layout kind %r" % kind)
    return params, buffers


_T2J = {"conv": t2j_conv, "convt": t2j_convt, "dense": t2j_dense,
        "dense1x1": t2j_dense1x1, "copy": lambda x: x}
_J2T = {"conv": j2t_conv, "convt": j2t_convt, "dense": t2j_dense,  # dense is its own inverse (transpose)
        "dense1x1": j2t_dense1x1, "copy": lambda x: x}


def _to_np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


# ---------------------------------------------------------------------------
# import
# ---------------------------------------------------------------------------

def load_reference_checkpoint(path: str) -> dict:
    """torch.load with the fallbacks needed for the reference's py2-era
    pickles (latin1 re-encoding)."""
    import torch
    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    except UnicodeDecodeError:
        return torch.load(path, map_location="cpu", weights_only=False,
                          encoding="latin1")


def import_torch_checkpoint(path: str, model,
                            import_optimizers: bool = True) -> List[str]:
    """Load a reference torch checkpoint into ``model``'s TrainState.

    Returns a report (one line per net/optimizer imported).  Structure
    mismatches (wrong --model/--norm/--ngf for the checkpoint) surface as
    KeyError/shape assertions naming the offending tensor.
    """
    import jax.numpy as jnp
    from ..models.state import TrainState

    ckpt = load_reference_checkpoint(path)
    cfg = model.opt
    layouts = reference_layouts(cfg)
    report = []

    new_params = {k: _copy_tree(v) for k, v in model.state.params.items()}
    new_stats = {k: _copy_tree(v) for k, v in model.state.batch_stats.items()}
    ordered: Dict[str, list] = {}

    for net, layout in layouts.items():
        sd = {k: _to_np(v) for k, v in ckpt[net].items()}
        pleaves, bleaves = leaf_map(layout, model.state.params[net])
        ordered[net] = pleaves
        for tk, path, tf in pleaves:
            cur = _get(new_params[net], path)
            val = _T2J[tf](sd[tk]).astype(np.float32)
            if cur is None or cur.shape != val.shape:
                # user-input validation (wrong --ngf/--norm for this
                # checkpoint), so a real error — not an assert that -O strips
                raise ValueError(
                    "shape mismatch importing %s -> %s: ckpt %s vs model %s"
                    % (tk, "/".join(path), val.shape,
                       None if cur is None else cur.shape))
            _set(new_params[net], path, jnp.asarray(val))
        for tk, path in bleaves:
            val = sd[tk].astype(np.float32)
            _set(new_stats[net], path, jnp.asarray(val))
        report.append("imported %s: %d tensors" % (net, len(pleaves) + len(bleaves)))

    new_opt = dict(model.state.opt_state)
    if import_optimizers:
        groups = OPTIMIZER_GROUPS[cfg.model]
        for opt_key, nets in groups.items():
            if opt_key not in ckpt:
                report.append("skipped %s: not in checkpoint" % opt_key)
                continue
            ok = _import_adam_group(ckpt[opt_key], nets, ordered, new_params,
                                    new_opt, report, opt_key)
            if ok:
                report.append("imported %s -> %s" % (opt_key, "+".join(nets)))

    new_ema = model.state.ema
    if new_ema:
        # --ema configs: seed the shadow from the freshly-imported params
        # (the torch reference has no EMA to migrate)
        new_ema = {n: new_params[n] for n in new_ema if n in new_params}
    model.state = model.state.replace(params=new_params,
                                      batch_stats=new_stats,
                                      opt_state=new_opt, ema=new_ema)
    return report


def _copy_tree(tree):
    if isinstance(tree, dict):
        return {k: _copy_tree(v) for k, v in tree.items()}
    return tree


def _import_adam_group(osd, nets, ordered, params, opt_state, report,
                       opt_key) -> bool:
    """Map one torch Adam state dict onto per-network optax states."""
    import jax.numpy as jnp

    state = osd.get("state", {})
    pgroups = osd.get("param_groups", [])
    idxs: Sequence[Any] = []
    for g in pgroups:
        idxs = list(idxs) + list(g.get("params", []))
    total = sum(len(ordered[n]) for n in nets)
    if len(idxs) != total:
        report.append("skipped %s: %d state entries vs %d params (id-keyed "
                      "0.3-era state?)" % (opt_key, len(idxs), total))
        return False

    pos = 0
    for net in nets:
        mu, nu = {}, {}
        count = 0
        for tk, path, tf in ordered[net]:
            pid = idxs[pos]
            pos += 1
            template = _get(params[net], path)
            ent = state.get(pid, state.get(str(pid)))
            if ent is None:  # param never stepped: zero moments
                m = np.zeros(template.shape, np.float32)
                v = np.zeros(template.shape, np.float32)
            else:
                m = _T2J[tf](_to_np(ent["exp_avg"])).astype(np.float32)
                v = _T2J[tf](_to_np(ent["exp_avg_sq"])).astype(np.float32)
                count = max(count, int(_to_np(ent["step"])))
            if m.shape != template.shape:
                raise ValueError("optimizer shape mismatch at %s: ckpt %s "
                                 "vs model %s" % (tk, m.shape, template.shape))
            _set(mu, path, jnp.asarray(m))
            _set(nu, path, jnp.asarray(v))
        old = opt_state[net]
        opt_state[net] = type(old)(count=jnp.asarray(count, jnp.int32),
                                   mu=mu, nu=nu)
    return True


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def _alias_keys(net: str, key: str) -> List[str]:
    """Duplicate state-dict aliases: CINResnetBlock registers every
    conv_block member a second time under its bare index
    (reference modules.py:145-146), so 'model.10.conv_block.1.module1.weight'
    also appears as 'model.10.1.module1.weight'."""
    if net != "netG_A_B":
        return []
    parts = key.split(".")
    if len(parts) >= 4 and parts[2] == "conv_block":
        return [".".join(parts[:2] + parts[3:])]
    return []


def export_torch_checkpoint(model, path: str) -> List[str]:
    """Write the model's TrainState as a reference-format torch checkpoint."""
    import jax
    import torch

    cfg = model.opt
    layouts = reference_layouts(cfg)
    params = jax.device_get(model.state.params)
    stats = jax.device_get(model.state.batch_stats)
    report = []
    ckpt: Dict[str, Any] = {}

    ordered: Dict[str, list] = {}
    for net, layout in layouts.items():
        sd: Dict[str, Any] = {}
        pleaves, bleaves = leaf_map(layout, params[net])
        ordered[net] = pleaves
        for tk, ppath, tf in pleaves:
            val = _J2T[tf](np.asarray(_get(params[net], ppath), np.float32))
            for k in [tk] + _alias_keys(net, tk):
                sd[k] = torch.from_numpy(np.array(val, copy=True))
        for tk, ppath in bleaves:
            val = np.asarray(_get(stats[net], ppath), np.float32)
            sd[tk] = torch.from_numpy(np.array(val, copy=True))
        ckpt[net] = sd
        report.append("exported %s: %d tensors" % (net, len(sd)))

    for opt_key, nets in OPTIMIZER_GROUPS[cfg.model].items():
        # D groups carry their own schedule (lr/5 until decay starts, the
        # full decayed lr after — reference model.py:282-291,735-748); the
        # model tracks it in old_lr_d so a mid-decay export resumes in the
        # reference at exactly the lr the reference itself would have.
        lr = (getattr(model, "old_lr_d", model.old_lr / 5.0)
              if "D" in opt_key else model.old_lr)
        state: Dict[int, Any] = {}
        pid = 0
        for net in nets:
            ost = model.state.opt_state[net]
            mu = jax.device_get(ost.mu)
            nu = jax.device_get(ost.nu)
            step = int(jax.device_get(ost.count))
            for tk, ppath, tf in ordered[net]:
                state[pid] = {
                    "step": step,
                    "exp_avg": torch.from_numpy(np.array(
                        _J2T[tf](np.asarray(_get(mu, ppath), np.float32)),
                        copy=True)),
                    "exp_avg_sq": torch.from_numpy(np.array(
                        _J2T[tf](np.asarray(_get(nu, ppath), np.float32)),
                        copy=True)),
                }
                pid += 1
        ckpt[opt_key] = {
            "state": state,
            "param_groups": [{
                "lr": lr, "betas": (cfg.beta1, 0.999), "eps": 1e-8,
                "weight_decay": 0, "amsgrad": False,
                "params": list(range(pid)),
            }],
        }
        report.append("exported %s: %d entries" % (opt_key, pid))

    torch.save(ckpt, path)
    return report
