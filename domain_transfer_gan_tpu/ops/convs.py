"""Convolution geometry helpers: NHWC, TPU-native, with PyTorch-exact
output shapes and padding alignment.

The reference's network shapes are defined by torch Conv2d/ConvTranspose2d
geometry (networks.py:149-483).  XLA's 'SAME' padding pads asymmetrically
(low side gets the smaller pad) while torch pads symmetrically and truncates,
so a strided 'SAME' conv is shifted one pixel relative to torch.  We always
use explicit symmetric padding pairs to keep the classic pitfall out
(SURVEY.md §7 "ConvTranspose parity").

All helpers operate on NHWC (TPU-native layout) with HWIO kernels.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def reflect_pad2d(x: jax.Array, pad: int) -> jax.Array:
    """nn.ReflectionPad2d equivalent on NHWC."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def replicate_pad2d(x: jax.Array, pad: int) -> jax.Array:
    """nn.ReplicationPad2d equivalent on NHWC."""
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")


def conv2d_torch(x: jax.Array, w: jax.Array, b=None, stride: int = 1,
                 padding: int = 0, preferred_dtype=None) -> jax.Array:
    """2-D convolution with torch Conv2d geometry: symmetric `padding`,
    floor division output size.

    x: (N, H, W, Cin); w: (kh, kw, Cin, Cout); b: (Cout,) or None.
    out size = floor((H + 2p - k) / s) + 1, identical to torch.
    """
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=preferred_dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_transpose2d_torch(x: jax.Array, w: jax.Array, b=None, stride: int = 2,
                           padding: int = 1, output_padding: int = 1,
                           preferred_dtype=None) -> jax.Array:
    """ConvTranspose2d with torch geometry via input dilation.

    torch: out = (in - 1)*stride - 2*padding + kernel + output_padding.
    Implemented as an lhs-dilated convolution: dilate input by `stride`,
    pad low = k-1-p, pad high = k-1-p+output_padding, then VALID correlate.
    This reproduces the exact output size AND pixel alignment of torch's
    ConvTranspose2d(k, s, p, op) (the reference's upsampling layer,
    networks.py:178-179) without any 'SAME'-padding drift.

    w: (kh, kw, Cin, Cout) — note this is the *forward correlation* kernel;
    since we train from scratch there is no torch weight-flip to match.
    """
    kh, kw = w.shape[0], w.shape[1]
    pad_lo_h, pad_hi_h = kh - 1 - padding, kh - 1 - padding + output_padding
    pad_lo_w, pad_hi_w = kw - 1 - padding, kw - 1 - padding + output_padding
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((pad_lo_h, pad_hi_h), (pad_lo_w, pad_hi_w)),
        lhs_dilation=(stride, stride),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=preferred_dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def torch_conv_out_size(in_size: int, k: int, s: int, p: int) -> int:
    return (in_size + 2 * p - k) // s + 1


def torch_conv_transpose_out_size(in_size: int, k: int, s: int, p: int, op: int) -> int:
    return (in_size - 1) * s - 2 * p + k + op
