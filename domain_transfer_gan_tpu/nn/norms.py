"""Normalization layers (NHWC, TPU-native).

Two distinct variance conventions exist in the reference and BOTH are kept
(quirk Q6 in SURVEY.md):

- :class:`InstanceNorm` uses the *biased* variance mean(centered^2)
  (reference modules.py:83-97),
- :class:`CondInstanceNorm` uses the *unbiased* variance with an (HW-1)
  divisor (reference modules.py:120-132, torch `.var()` default).

Statistics are always computed in float32 regardless of the compute dtype;
the hot fused paths live in ``ops.pallas`` and are swapped in via the
``use_pallas`` attribute (pure-XLA implementations remain the reference for
correctness tests).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .init import (
    batchnorm2d_scale_init,
    conv_kernel_init,
    instance_norm_scale_init,
    torch_linear_init,
)

Dtype = Any


def instance_norm_stats(x: jax.Array, eps: float, unbiased: bool):
    """Per-(sample, channel) mean/rstd over H,W on NHWC input, in fp32.

    Variance is computed as E[x^2] - mean^2 so the two reductions are
    independent over the same input and XLA multi-output-fuses them into a
    single HBM pass (the centered two-pass form cost ~24% of the train step
    in reduce fusions).  fp32 accumulation keeps the cancellation error
    negligible for activation-scale inputs.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    mean_sq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    if unbiased:
        hw = x.shape[1] * x.shape[2]
        var = var * (hw / max(hw - 1, 1))
    rstd = jax.lax.rsqrt(var + eps)
    return mean, rstd


def instance_norm_xla(x, scale, shift, eps: float, unbiased: bool,
                      relu: bool = False):
    """Reference-math instance norm (+affine broadcast, optional fused ReLU).

    scale/shift broadcast rules:
      - per-channel (C,) params -> broadcast over N,H,W   (InstanceNorm)
      - per-sample (N, C) maps -> broadcast over H,W      (CondInstanceNorm)
    """
    mean, rstd = instance_norm_stats(x, eps, unbiased)
    y = (x.astype(jnp.float32) - mean) * rstd
    if scale is not None:
        if scale.ndim == 1:
            y = y * scale[None, None, None, :] + shift[None, None, None, :]
        else:
            y = y * scale[:, None, None, :] + shift[:, None, None, :]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


class InstanceNorm(nn.Module):
    """The reference's custom InstanceNorm (modules.py:64-98): biased
    variance, affine params scale ~ N(0, 0.02) / shift = 0 under the
    'reference' init scheme (quirk Q7 — weights_init never touches them).
    """

    features: int
    affine: bool = True
    eps: float = 1e-5
    init_scheme: str = "reference"
    use_pallas: bool = False
    fuse_relu: bool = False  # apply ReLU inside the (possibly fused) kernel

    @nn.compact
    def __call__(self, x):
        scale = shift = None
        if self.affine:
            scale = self.param("scale", instance_norm_scale_init(self.init_scheme),
                               (self.features,), jnp.float32)
            shift = self.param("shift", nn.initializers.zeros,
                               (self.features,), jnp.float32)
        if self.use_pallas:
            from ..ops.pallas import instance_norm_pallas
            return instance_norm_pallas(x, scale, shift, eps=self.eps,
                                        unbiased=False, relu=self.fuse_relu)
        return instance_norm_xla(x, scale, shift, self.eps, unbiased=False,
                                 relu=self.fuse_relu)


class CondInstanceNorm(nn.Module):
    """Conditional instance norm — the latent-injection mechanism
    (reference modules.py:104-132).

    shift = ReLU(Conv1x1(z)), scale = ReLU(Conv1x1(z)) computed from the
    latent code z (B, nlatent); x is normalized over H,W with *unbiased*
    variance, then out = norm(x) * scale + shift.

    The z is spatially 1x1 in the reference ((B, nlatent, 1, 1)); here it is
    a flat (B, nlatent) vector and the 1x1 convs become Dense layers — the
    same math, but expressed as an MXU matmul.
    """

    features: int      # x channel count
    nlatent: int
    eps: float = 1e-5
    init_scheme: str = "reference"
    use_pallas: bool = False
    fuse_relu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z):
        kinit = conv_kernel_init(self.init_scheme)
        shift = nn.relu(nn.Dense(self.features, kernel_init=kinit,
                                 bias_init=nn.initializers.zeros,
                                 dtype=self.dtype, name="shift_conv")(z))
        scale = nn.relu(nn.Dense(self.features, kernel_init=kinit,
                                 bias_init=nn.initializers.zeros,
                                 dtype=self.dtype, name="scale_conv")(z))
        scale = scale.astype(jnp.float32)
        shift = shift.astype(jnp.float32)
        if self.use_pallas:
            from ..ops.pallas import instance_norm_pallas
            return instance_norm_pallas(x, scale, shift, eps=self.eps,
                                        unbiased=True, relu=self.fuse_relu)
        return instance_norm_xla(x, scale, shift, self.eps, unbiased=True,
                                 relu=self.fuse_relu)


class BatchNorm2d(nn.Module):
    """torch-flavored BatchNorm over N,H,W (NHWC input).

    momentum 0.1 (torch) == flax momentum 0.9; eps 1e-5.  Under 'reference'
    init, scale ~ N(1, 0.02) / bias = 0 (reference networks.py:19-21).
    """

    features: int
    init_scheme: str = "reference"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=batchnorm2d_scale_init(self.init_scheme),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="bn",
        )(x)


class BatchNorm1d(nn.Module):
    """torch BatchNorm1d with default init (scale=1) — weights_init matches
    only 'BatchNorm2d' by classname so the latent discriminator's 1-D norms
    keep torch defaults (quirk Q7; reference networks.py:405-419).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=nn.initializers.ones,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="bn",
        )(x)


def make_norm(kind: str, features: int, init_scheme: str = "reference",
              use_pallas: bool = False, dtype: Dtype = jnp.float32,
              name: Optional[str] = None):
    """Factory mirroring the reference's get_norm_layer (networks.py:23-30).

    Returns a callable norm(x, train) regardless of kind so callers thread
    `train` uniformly (InstanceNorm simply ignores it).
    """
    if kind == "instance":
        mod = InstanceNorm(features, affine=True, init_scheme=init_scheme,
                           use_pallas=use_pallas, name=name)
        return lambda x, train=True: mod(x)
    if kind == "batch":
        mod = BatchNorm2d(features, init_scheme=init_scheme, dtype=dtype, name=name)
        return lambda x, train=True: mod(x, train)
    raise NotImplementedError("normalization layer [%s] is not found" % kind)
