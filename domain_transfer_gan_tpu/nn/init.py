"""Weight-init schemes.

``reference`` reproduces the reference's init exactly, including its quirks
(SURVEY.md Q7):

- every conv kernel (incl. ConvTranspose and the 1x1 convs inside CIN and the
  encoder heads) ~ N(0, 0.02), bias = 0            (reference networks.py:13-18)
- BatchNorm2d scale ~ N(1, 0.02), bias = 0         (reference networks.py:19-21)
- the custom InstanceNorm keeps its own reset: scale ~ N(0, 0.02), shift = 0
  (near-zero gain!  reference modules.py:78-81 — weights_init never matches it)
- Linear and BatchNorm1d keep the torch defaults: Linear U(-1/sqrt(fan_in),
  1/sqrt(fan_in)) for weight and bias; BatchNorm1d scale = 1, bias = 0.

``sane`` swaps the odd ones for conventional choices (InstanceNorm scale = 1,
convs lecun-normal) while keeping shapes identical.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax.linen import initializers as flax_init


def normal002(key, shape, dtype=jnp.float32):
    """N(0, 0.02) — reference conv-weight init (networks.py:16)."""
    return 0.02 * jax.random.normal(key, shape, dtype)


def normal_one_002(key, shape, dtype=jnp.float32):
    """N(1, 0.02) — reference BatchNorm2d scale init (networks.py:20)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def torch_linear_init(fan_in: int):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def conv_kernel_init(scheme: str):
    if scheme == "reference":
        return normal002
    return flax_init.lecun_normal()


def instance_norm_scale_init(scheme: str):
    if scheme == "reference":
        return normal002  # quirk Q7: near-zero gain
    return flax_init.ones


def batchnorm2d_scale_init(scheme: str):
    if scheme == "reference":
        return normal_one_002
    return flax_init.ones
