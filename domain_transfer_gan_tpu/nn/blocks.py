"""Residual blocks (NHWC).

- :class:`ResnetBlock` — reference modules.py:193-235: pad -> conv3x3 -> ReLU
  -> [dropout] -> pad -> conv3x3 -> norm; out = ReLU(x + f(x)).  Note: there
  is NO norm after the first conv in the plain block (modules.py:211-212).
- :class:`CINResnetBlock` — reference modules.py:139-188: pad -> conv3x3 ->
  CIN(z) -> ReLU -> [dropout] -> pad -> conv3x3 -> InstanceNorm(affine);
  out = ReLU(x + f(x, z)).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.convs import reflect_pad2d, replicate_pad2d
from .init import conv_kernel_init
from .norms import CondInstanceNorm, InstanceNorm, make_norm

Dtype = Any


def _pad(x, padding_type: str, p: int):
    if padding_type == "reflect":
        return reflect_pad2d(x, p), 0
    if padding_type == "replicate":
        return replicate_pad2d(x, p), 0
    if padding_type == "zero":
        return x, p
    raise NotImplementedError("padding [%s] is not implemented" % padding_type)


class ResnetBlock(nn.Module):
    dim: int
    padding_type: str = "reflect"
    norm: str = "instance"
    use_dropout: bool = False
    use_bias: bool = True
    init_scheme: str = "reference"
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kinit = conv_kernel_init(self.init_scheme)
        h, p = _pad(x, self.padding_type, 1)
        h = nn.Conv(self.dim, (3, 3), padding=((p, p), (p, p)),
                    use_bias=self.use_bias, kernel_init=kinit,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h, p = _pad(h, self.padding_type, 1)
        h = nn.Conv(self.dim, (3, 3), padding=((p, p), (p, p)),
                    use_bias=self.use_bias, kernel_init=kinit,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="conv2")(h)
        h = make_norm(self.norm, self.dim, self.init_scheme, self.use_pallas,
                      self.dtype, name="norm2")(h, train)
        return nn.relu(x + h)


class CINResnetBlock(nn.Module):
    dim: int
    nlatent: int
    padding_type: str = "reflect"
    use_dropout: bool = False
    use_bias: bool = True
    init_scheme: str = "reference"
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z, train: bool = True):
        kinit = conv_kernel_init(self.init_scheme)
        h, p = _pad(x, self.padding_type, 1)
        h = nn.Conv(self.dim, (3, 3), padding=((p, p), (p, p)),
                    use_bias=self.use_bias, kernel_init=kinit,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="conv1")(h)
        h = CondInstanceNorm(self.dim, self.nlatent, init_scheme=self.init_scheme,
                             use_pallas=self.use_pallas, fuse_relu=True,
                             dtype=self.dtype, name="cin1")(h, z)
        # ReLU fused into the CIN kernel above (reference modules.py:165 order:
        # CIN then ReLU — identical because fuse_relu applies ReLU after affine).
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        h, p = _pad(h, self.padding_type, 1)
        h = nn.Conv(self.dim, (3, 3), padding=((p, p), (p, p)),
                    use_bias=self.use_bias, kernel_init=kinit,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="conv2")(h)
        h = InstanceNorm(self.dim, affine=True, init_scheme=self.init_scheme,
                         use_pallas=self.use_pallas, name="norm2")(h)
        return nn.relu(x + h)
