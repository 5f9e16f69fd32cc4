"""Fused instance-norm (+affine, +ReLU) Pallas TPU kernel with custom VJP.

This is the designated native-tier fusion for the reference's hot path
(SURVEY.md §3.5): every generator layer runs conv -> {InstanceNorm | CIN} ->
ReLU, and the norm's two reductions plus affine plus ReLU otherwise cost
several HBM round-trips.  The kernel keeps a (sample, channel-tile) block
VMEM-resident and does: one HBM read -> mean/var -> normalize -> affine ->
ReLU -> one HBM write.  The backward kernel fuses the three reductions of the
instance-norm VJP the same way.

Supports both reference variance conventions (quirk Q6):
  - biased  (divisor HW)   — InstanceNorm  (reference modules.py:88)
  - unbiased (divisor HW-1) — CondInstanceNorm (reference modules.py:128)
and both affine layouts:
  - per-channel (C,) scale/shift          — InstanceNorm
  - per-sample (N, C) maps from z         — CondInstanceNorm (latent injection)

Per-(sample, channel) operands (scale/shift/mean/rstd) are carried as
(N, 1, C) so every BlockSpec's trailing two dims satisfy the TPU tiling rule
(second-to-last == 1 == full dim; last == C or a 128-multiple tile).

Pure-XLA reference implementations live in ``nn.norms``; parity tests run
this kernel in interpret mode on CPU against them.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-(Nt, HW, Ct) block budget in *lane-padded* fp32 bytes.  Empirically the
# backward kernel's VMEM stack is ~9x the block size (x/dy/dx blocks, double
# buffered, plus pipeline slack): a 2 MiB block OOM'd at 17.91M scoped vmem
# on v5e (16 MiB core limit), so the budget is 1.25 MiB.
_VMEM_BLOCK_BUDGET = 5 * 1024 * 1024 // 4

_LANE = 128


def _padded_bytes(hw: int, ct: int) -> int:
    lanes = ((ct + _LANE - 1) // _LANE) * _LANE  # C pads up to the lane width
    return hw * lanes * 4


def _pick_ct(hw: int, c: int) -> Optional[int]:
    """Channel tile: full C if the padded block fits; else a 128-multiple."""
    if _padded_bytes(hw, c) <= _VMEM_BLOCK_BUDGET:
        return c
    ct = (c // 128) * 128
    while ct >= 128:
        if c % ct == 0 and _padded_bytes(hw, ct) <= _VMEM_BLOCK_BUDGET:
            return ct
        ct -= 128
    return None


def _pick_nt(n: int, hw: int, ct: int) -> int:
    """Samples per block: amortize grid-step overhead across the batch
    (a per-sample grid serializes tiny blocks and starves the VPU)."""
    per_sample = _padded_bytes(hw, ct)
    nt = max(1, _VMEM_BLOCK_BUDGET // per_sample)
    while nt > 1 and n % nt:
        nt -= 1
    return nt


def pallas_supported(hw: int, c: int) -> bool:
    return _pick_ct(hw, c) is not None


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, scale_ref, shift_ref, y_ref, mean_ref, rstd_ref,
                *, eps: float, unbiased: bool, relu: bool, hw: int):
    x = x_ref[...].astype(jnp.float32)                     # (Nt, HW, Ct)
    mean = jnp.mean(x, axis=1, keepdims=True)              # (Nt, 1, Ct)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=1, keepdims=True)
    if unbiased:
        var = var * (hw / max(hw - 1, 1))
    rstd = jax.lax.rsqrt(var + eps)
    y = centered * rstd
    y = y * scale_ref[...].astype(jnp.float32) + shift_ref[...].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    y_ref[...] = y.astype(y_ref.dtype)
    mean_ref[...] = mean
    rstd_ref[...] = rstd


def _fwd(x3, scale3, shift3, eps, unbiased, relu):
    """x3: (N, HW, C); scale3/shift3: (N, 1, C).  Returns y3, mean3, rstd3."""
    n, hw, c = x3.shape
    ct = _pick_ct(hw, c)
    assert ct is not None
    nt = _pick_nt(n, hw, ct)
    grid = (n // nt, c // ct)
    spec_x = pl.BlockSpec((nt, hw, ct), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    spec_nc = pl.BlockSpec((nt, 1, ct), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_kernel, eps=eps, unbiased=unbiased,
                               relu=relu, hw=hw)
    y, mean, rstd = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_x, spec_nc, spec_nc],
        out_specs=[spec_x, spec_nc, spec_nc],
        out_shape=[
            jax.ShapeDtypeStruct((n, hw, c), x3.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x3, scale3, shift3)
    return y, mean, rstd


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(x_ref, dy_ref, mean_ref, rstd_ref, scale_ref, shift_ref,
                dx_ref, dscale_ref, dshift_ref,
                *, unbiased: bool, relu: bool, hw: int):
    x = x_ref[...].astype(jnp.float32)                     # (Nt, HW, Ct)
    dy = dy_ref[...].astype(jnp.float32)
    mean = mean_ref[...]                                   # (Nt, 1, Ct)
    rstd = rstd_ref[...]
    centered = x - mean
    xhat = centered * rstd

    s = scale_ref[...].astype(jnp.float32)
    t = shift_ref[...].astype(jnp.float32)
    if relu:
        pre = xhat * s + t
        dy = jnp.where(pre > 0.0, dy, 0.0)

    dshift = jnp.sum(dy, axis=1, keepdims=True)            # (Nt, 1, Ct)
    dscale = jnp.sum(dy * xhat, axis=1, keepdims=True)

    dxhat = dy * s
    divisor = float(hw - 1 if unbiased else hw)
    sum_dxhat = jnp.sum(dxhat, axis=1, keepdims=True)
    sum_dxhat_c = jnp.sum(dxhat * centered, axis=1, keepdims=True)
    dx = (dxhat * rstd
          - sum_dxhat * rstd * (1.0 / hw)
          - centered * (rstd ** 3) * (sum_dxhat_c / divisor))
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dscale_ref[...] = dscale
    dshift_ref[...] = dshift


def _bwd(x3, dy3, mean3, rstd3, scale3, shift3, unbiased, relu):
    n, hw, c = x3.shape
    ct = _pick_ct(hw, c)
    nt = _pick_nt(n, hw, ct)
    grid = (n // nt, c // ct)
    spec_x = pl.BlockSpec((nt, hw, ct), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    spec_nc = pl.BlockSpec((nt, 1, ct), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_bwd_kernel, unbiased=unbiased, relu=relu, hw=hw)
    dx, dscale, dshift = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec_x, spec_x, spec_nc, spec_nc, spec_nc, spec_nc],
        out_specs=[spec_x, spec_nc, spec_nc],
        out_shape=[
            jax.ShapeDtypeStruct((n, hw, c), x3.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
        interpret=_interpret(),
    )(x3, dy3, mean3, rstd3, scale3, shift3)
    return dx, dscale, dshift


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _in_core(x3, scale3, shift3, eps, unbiased, relu):
    y, _, _ = _fwd(x3, scale3, shift3, eps, unbiased, relu)
    return y


def _in_core_fwd(x3, scale3, shift3, eps, unbiased, relu):
    y, mean, rstd = _fwd(x3, scale3, shift3, eps, unbiased, relu)
    return y, (x3, mean, rstd, scale3, shift3)


def _in_core_bwd(eps, unbiased, relu, res, dy):
    x3, mean, rstd, scale3, shift3 = res
    dx, dscale, dshift = _bwd(x3, dy, mean, rstd, scale3, shift3,
                              unbiased, relu)
    return dx, dscale, dshift


_in_core.defvjp(_in_core_fwd, _in_core_bwd)


def instance_norm_pallas(x, scale, shift, *, eps: float = 1e-5,
                         unbiased: bool = False, relu: bool = False):
    """Fused instance norm on NHWC input.

    scale/shift: None (no affine), (C,) per-channel, or (N, C) per-sample
    (the CIN latent-injection case).  Falls back to the XLA implementation
    when the single-pass VMEM block does not fit.
    """
    n, h, w, c = x.shape
    hw = h * w
    if not pallas_supported(hw, c):
        from ...nn.norms import instance_norm_xla
        return instance_norm_xla(x, scale, shift, eps, unbiased, relu)

    x3 = x.reshape(n, hw, c)
    if scale is None:
        scale3 = jnp.ones((n, 1, c), jnp.float32)
        shift3 = jnp.zeros((n, 1, c), jnp.float32)
    elif scale.ndim == 1:
        # broadcast outside the custom_vjp: autodiff sums dscale over N
        scale3 = jnp.broadcast_to(scale[None, None, :], (n, 1, c)).astype(jnp.float32)
        shift3 = jnp.broadcast_to(shift[None, None, :], (n, 1, c)).astype(jnp.float32)
    else:
        scale3 = scale[:, None, :].astype(jnp.float32)
        shift3 = shift[:, None, :].astype(jnp.float32)
    y3 = _in_core(x3, scale3, shift3, eps, unbiased, relu)
    return y3.reshape(n, h, w, c)
