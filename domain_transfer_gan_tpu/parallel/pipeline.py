"""Pipeline parallelism (GPipe-style) for the generator residual trunks.

The reference has no pipeline story at all (it is a single-GPU torch-0.3
codebase; its only parallelism is `nn.parallel.data_parallel`,
networks.py:194-197).  This module adds the TPU-native fourth scaling axis
next to data / spatial / tensor (`parallel.mesh`): a 'pipe' mesh axis over
which the generators' residual trunks — the n_blocks identical CIN/plain
resnet blocks that dominate generator FLOPs, especially at the reference's
--n_blocks 9 factory setting (quirk Q1) — execute as a microbatched
GPipe schedule with `jax.shard_map` + neighbor `lax.ppermute` hops that
ride the ICI torus.

Design (why this shape and not a literal GPipe port):

- Only the trunk is pipelined.  Every block maps (B, H/2, W/2, 4*ngf) to
  the same shape, so the inter-stage payloads are uniform and a single
  ppermute schedule covers any stage count that divides n_blocks.  The
  heterogeneous stem/tail stay OUTSIDE the manual region, fully
  data-parallel over BOTH mesh axes: batches are sharded over the combined
  ('data','pipe') axes, GSPMD all-gathers each data group's shard at trunk
  entry and re-shards at exit, so no compute is ever replicated across
  pipe ranks.
- The schedule is the classic fill/steady/drain loop: T = M + S - 1 ticks
  for M microbatches over S stages, written as ONE `lax.scan` so XLA
  compiles a single program (no per-tick dispatch).  Stage s processes
  microbatch m = t - s at tick t; activations hop s -> s+1 via ppermute;
  the last stage accumulates results into an output buffer that a final
  psum over 'pipe' replicates to every rank (which is exactly the
  out_spec's "replicated over pipe" requirement).
- Bubble ticks compute on clamped garbage and their results are discarded
  by the predicated writes — the standard SPMD-GPipe trade: no
  data-dependent control flow, so the whole schedule stays one traced,
  statically-shaped XLA program.
- Differentiability is free: scan, ppermute, dynamic_update_slice and
  psum all have transposes, so `jax.vjp` through the pipelined trunk (the
  train step keeps the phase-0 pullback, models/steps.py) yields exactly
  the per-block gradients of the sequential loop.

Numerics: per-sample ops only (convs, instance/CIN norms reduce over
H,W per sample), so microbatched execution is bit-compatible with the
full-batch loop up to float reassociation — the equivalence tests pin it
to allclose at fp32 tolerances.  Pipelining is gated off for batch-norm
trunks and dropout (cross-sample state / rng plumbing would change
semantics) and is mutually exclusive with --spatial (instance norms
inside the manual region must see full H) and --tensor / --remat.

Activated — like `hints.spatial_hints` — by a trace-time contextvar that
:class:`parallel.DataParallel` sets only around its own step calls, so
single-device traces and the generation/eval helpers never see it.
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_PIPELINE: contextvars.ContextVar = contextvars.ContextVar(
    "dtg_pipeline_engine", default=None)


@dataclasses.dataclass(frozen=True)
class PipelineEngine:
    """Static description of the pipeline: which mesh axes, how many
    microbatches.  ``n_micro`` defaults to the stage count (the minimum
    that keeps every stage busy in steady state); more microbatches
    shrink the bubble fraction (S-1)/(M+S-1) at the cost of smaller
    per-tick convolutions."""

    mesh: Mesh
    data_axis: str
    pipe_axis: str
    n_micro: int

    @property
    def n_stages(self) -> int:
        return int(self.mesh.shape[self.pipe_axis])


@contextlib.contextmanager
def pipeline_hints(engine: Optional[PipelineEngine]):
    """Activate trunk pipelining while tracing (no-op when engine is None)."""
    if engine is None:
        yield
        return
    tok = _PIPELINE.set(engine)
    try:
        yield
    finally:
        _PIPELINE.reset(tok)


def active_engine() -> Optional[PipelineEngine]:
    return _PIPELINE.get()


def gpipe_apply(engine: PipelineEngine, block_apply: Callable,
                stacked_params: Any, h: jax.Array,
                z: Optional[jax.Array] = None) -> jax.Array:
    """Run ``h -> block_apply(p_0, h, z) -> ... -> block_apply(p_{n-1}, ., z)``
    as a GPipe schedule over the engine's 'pipe' mesh axis.

    ``stacked_params``: pytree whose leaves are stacked per-STAGE with
    leading axes (n_stages, blocks_per_stage, ...); each stage applies its
    ``blocks_per_stage`` consecutive blocks locally per tick.
    ``block_apply(block_params, h, z) -> h`` must be shape-preserving.
    ``z`` (optional, e.g. the CIN latent code) is microbatched alongside h.
    """
    S = engine.n_stages
    M = engine.n_micro
    da, pa = engine.data_axis, engine.pipe_axis
    h_spec = P(da, *([None] * (h.ndim - 1)))
    z_spec = None if z is None else P(da, *([None] * (z.ndim - 1)))

    def run(stk, h_loc, z_loc):
        # local stacked leaves are (1, bps, ...): this rank's stage
        stage = jax.tree_util.tree_map(lambda x: x[0], stk)
        bps = jax.tree_util.tree_leaves(stage)[0].shape[0]
        sidx = jax.lax.axis_index(pa)
        b = h_loc.shape[0]
        if b % M != 0:
            raise ValueError(
                "pipeline: per-data-group batch %d not divisible by "
                "microbatches %d (batchSize / data-axis size must be a "
                "multiple of --microbatches)" % (b, M))
        mb = b // M
        h_mb = h_loc.reshape(M, mb, *h_loc.shape[1:])
        z_mb = (None if z_loc is None
                else z_loc.reshape(M, mb, *z_loc.shape[1:]))

        def stage_fn(x, zx):
            for j in range(bps):
                pj = jax.tree_util.tree_map(lambda v, j=j: v[j], stage)
                x = block_apply(pj, x, zx)
            return x

        def tick(carry, t):
            h_prev, out_buf = carry
            # stage s processes microbatch m = t - s at tick t (clamped:
            # bubble ticks compute on stale data, discarded below)
            m = jnp.clip(t - sidx, 0, M - 1)
            inj = jax.lax.dynamic_index_in_dim(
                h_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            x_in = jnp.where(sidx == 0, inj, h_prev)
            zx = (None if z_mb is None
                  else jax.lax.dynamic_index_in_dim(z_mb, m, 0,
                                                    keepdims=False))
            y = stage_fn(x_in, zx)
            # last stage banks microbatch t-(S-1) once it's real
            w = jnp.clip(t - (S - 1), 0, M - 1)
            valid = jnp.logical_and(t >= S - 1, sidx == S - 1)
            old = jax.lax.dynamic_index_in_dim(out_buf, w, 0, keepdims=False)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, jnp.where(valid, y, old), w, 0)
            # neighbor hop s -> s+1 (rank 0's carry is never read)
            h_next = (jax.lax.ppermute(y, pa,
                                       [(i, i + 1) for i in range(S - 1)])
                      if S > 1 else y)
            return (h_next, out_buf), None

        init = (jnp.zeros_like(h_mb[0]), jnp.zeros_like(h_mb))
        (_, out_buf), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        # replicate the last stage's buffer to every pipe rank (satisfies
        # the out_spec, and downstream GSPMD re-shards over ('data','pipe'))
        out = jax.lax.psum(
            jnp.where(sidx == S - 1, out_buf, jnp.zeros_like(out_buf)), pa)
        return out.reshape(b, *h_loc.shape[1:])

    if z is None:
        fn = jax.shard_map(lambda stk, hh: run(stk, hh, None),
                           mesh=engine.mesh, in_specs=(P(pa), h_spec),
                           out_specs=h_spec, check_vma=False)
        return fn(stacked_params, h)
    fn = jax.shard_map(run, mesh=engine.mesh,
                       in_specs=(P(pa), h_spec, z_spec),
                       out_specs=h_spec, check_vma=False)
    return fn(stacked_params, h, z)


def _stack_stages(params: Any, n_blocks: int, n_stages: int):
    """[params['block0'] .. params['blockN-1']] -> leaves with leading
    (n_stages, blocks_per_stage) axes.  Differentiable (jnp.stack), so the
    per-block grads come back through the vjp of the stacking."""
    if n_blocks % n_stages != 0:
        raise ValueError(
            "pipeline: n_blocks %d not divisible by pipe stages %d"
            % (n_blocks, n_stages))
    bps = n_blocks // n_stages
    blocks = [params["block%d" % i] for i in range(n_blocks)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(n_stages, bps, *x.shape[1:]), stacked)


def generator_trunk_fn(engine: PipelineEngine, net, params,
                       train: bool) -> Optional[Callable]:
    """Build the pipelined trunk closure for a generator module, or None
    when ``net`` is not a pipelineable generator (discriminators, the
    encoder, remat-wrapped modules, batch-norm or dropout trunks)."""
    from ..nn.networks import CINResnetGenerator, ResnetGenerator

    if isinstance(net, CINResnetGenerator):
        if net.use_dropout:
            return None
        from ..nn.blocks import CINResnetBlock
        block = CINResnetBlock(4 * net.ngf, net.nlatent,
                               padding_type=net.padding_type,
                               use_dropout=False,
                               init_scheme=net.init_scheme,
                               use_pallas=net.use_pallas, dtype=net.dtype)

        def block_apply(p, h, zx):
            return block.apply({"params": p}, h, zx, train)
    elif isinstance(net, ResnetGenerator):
        if net.use_dropout or net.norm != "instance":
            return None
        from ..nn.blocks import ResnetBlock
        block = ResnetBlock(4 * net.ngf, padding_type=net.padding_type,
                            norm=net.norm, use_dropout=False,
                            init_scheme=net.init_scheme,
                            use_pallas=net.use_pallas, dtype=net.dtype)

        def block_apply(p, h, zx):
            return block.apply({"params": p}, h, train)
    else:
        return None

    stacked = _stack_stages(params, net.n_blocks, engine.n_stages)

    def trunk_fn(h, zx):
        return gpipe_apply(engine, block_apply, stacked, h, zx)

    return trunk_fn
