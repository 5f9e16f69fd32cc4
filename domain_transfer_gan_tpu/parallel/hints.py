"""Trace-time activation-sharding hints for composed dp x sp meshes.

GSPMD propagates the batch/space input shardings through the whole train
step on its own; the one place propagation picks a degenerate layout is the
backward of DiscriminatorEdges' final 4x4 valid conv (the global-logit head,
reference networks.py:352-393): the [B,1,1,1] logit cotangent is
batch-sharded by the loss path, but the partitioner wants it sharded along
its size-1 H dim to produce the space-sharded input gradient of that conv,
and falls back to an "involuntary full rematerialization" reshard
(spmd_partitioner.cc) on every compile.  Pinning the head's 4x4 input
activation to batch-only sharding keeps the whole head — forward AND its
transpose — off the space axis: a ~64 KB all-gather replaces the degenerate
reshard and the dp x sp compile is warning-clean
(tests/test_parallel.py::test_dp_sp_compile_clean_of_involuntary_remat).

The hint is a contextvar that :class:`parallel.DataParallel` sets only
around its own step calls, so single-device traces never see it; the
constraint is numerically the identity either way.
"""

from __future__ import annotations

import contextlib
import contextvars

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

_SPATIAL: contextvars.ContextVar = contextvars.ContextVar(
    "dtg_spatial_hint", default=None)


@contextlib.contextmanager
def spatial_hints(mesh, data_axis: str, space_axis):
    """Activate batch-only pinning while tracing (no-op if no space axis)."""
    if space_axis is None:
        yield
        return
    tok = _SPATIAL.set((mesh, data_axis))
    try:
        yield
    finally:
        _SPATIAL.reset(tok)


def pin_batch_only(x):
    """`with_sharding_constraint(x, P(data, None, ...))` under an active
    spatial-hint context; identity otherwise."""
    hint = _SPATIAL.get()
    if hint is None:
        return x
    mesh, data_axis = hint
    spec = P(data_axis, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
