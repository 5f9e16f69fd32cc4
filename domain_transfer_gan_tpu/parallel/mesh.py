"""Data-parallel training over a device mesh — the TPU-native replacement
for the reference's single-process nn.parallel.data_parallel scatter/gather
(reference networks.py:194-197 etc.; SURVEY.md §2 & §5).

Recipe (the scaling-book pattern): build a 1-D ``Mesh(('data',))`` over ICI,
shard every batch on axis 0, replicate parameters, and jit the existing
train step — XLA's sharding propagation turns the loss means into
cross-device collectives (psum over the batch axis) automatically.  The same
code runs on 1 chip, a v5e-8, or a CPU host with
``--xla_force_host_platform_device_count=8``.

Batch-norm note: with a sharded batch the normalization means become
*global* batch statistics (an all-reduce over the mesh), which is stronger
than torch data_parallel's per-replica stats.
"""

from __future__ import annotations

import itertools
from typing import Any, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .hints import spatial_hints
from .pipeline import PipelineEngine, pipeline_hints


def _put(x, sh: NamedSharding):
    """device_put that also works on a multi-process (multi-host) mesh.

    Single-process: plain ``jax.device_put``.  Multi-process: every host
    holds the same global value (see parallel.multihost), and
    ``make_array_from_callback`` materializes only this process's
    addressable shards — each host transfers exactly its slice.
    """
    if jax.process_count() > 1 and not sh.is_fully_addressable:
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])
    return jax.device_put(jnp.asarray(x), sh)


def make_mesh(num_devices: int = 0, axis: str = "data",
              devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(n_data: int, n_space: int, axes=("data", "space"),
                 devices=None) -> Mesh:
    """2-D mesh for composed data x spatial parallelism.

    The spatial axis shards the image H dimension across chips; XLA GSPMD
    inserts the convolution halo exchanges and turns the instance-norm
    H,W reductions into cross-shard collectives automatically (the
    scaling-book recipe: annotate shardings, let the compiler place the
    communication on ICI).
    """
    devs = list(devices if devices is not None else jax.devices())
    need = n_data * n_space
    assert len(devs) >= need, "mesh needs %d devices, have %d" % (need, len(devs))
    return Mesh(np.array(devs[:need]).reshape(n_data, n_space), axes)


def make_mesh_axes(sizes, devices=None) -> Mesh:
    """N-D mesh from an ordered [(axis_name, size), ...] spec."""
    devs = list(devices if devices is not None else jax.devices())
    names = tuple(n for n, _ in sizes)
    shape = tuple(s for _, s in sizes)
    need = int(np.prod(shape))
    assert len(devs) >= need, "mesh needs %d devices, have %d" % (need,
                                                                  len(devs))
    return Mesh(np.array(devs[:need]).reshape(shape), names)


def param_shardings(mesh: Mesh, tree, axis: str = "model",
                    min_size: int = 1024):
    """Tensor-parallel placement rule: shard each large parameter leaf on its
    LAST axis (output channels for conv kernels, features for dense kernels)
    over the ``model`` mesh axis when divisible; everything else replicated.

    Applied uniformly to params AND the Adam moment trees (same shapes), so
    the optimizer state — the dominant memory after activations — is sharded
    too.  XLA GSPMD propagates the channel sharding through the convolutions
    and inserts the reduce/all-gather collectives (the scaling-book recipe:
    annotate, let the compiler place communication).
    """
    n = mesh.shape[axis]

    def spec(x):
        if (hasattr(x, "ndim") and x.ndim >= 1 and x.size >= min_size
                and x.shape[-1] % n == 0):
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def shard_params(mesh: Mesh, tree, axis: str = "model",
                 min_size: int = 1024):
    shardings = param_shardings(mesh, tree, axis, min_size)
    return jax.tree_util.tree_map(_put, tree, shardings)


def batch_sharding(mesh: Mesh, ndim: int = 4, axis: str = "data",
                   space_axis: Optional[str] = None) -> NamedSharding:
    """Shard axis 0 (batch); with `space_axis` on a 2-D mesh also shard the
    image H axis (axis 1 of NHWC tensors) spatially."""
    if space_axis is not None and space_axis in mesh.axis_names and ndim >= 3:
        return NamedSharding(mesh, P(axis, space_axis,
                                     *([None] * (ndim - 2))))
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data",
                space_axis: Optional[str] = None):
    """device_put every leaf with its batch axis (and, on a 2-D mesh, its
    image H axis) sharded over the mesh."""
    def put(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x  # already a global (multi-host) array — fed upstream
        x = np.asarray(x) if not hasattr(x, "ndim") else x
        return _put(x, batch_sharding(mesh, x.ndim, axis, space_axis))
    return jax.tree_util.tree_map(put, tree)


def replicate_state(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: _put(x, sh), tree)


def prefetch_to_device(iterator: Iterable, mesh: Optional[Mesh] = None,
                       size: int = 2, axis: str = "data",
                       space_axis: Optional[str] = None) -> Iterator:
    """Double-buffered host->HBM feed: keeps `size` batches in flight so
    input transfer overlaps with compute (the reference synchronously
    .cuda()'d every batch, train.py:198-201)."""
    queue = []
    it = iter(iterator)

    def put(batch):
        if mesh is not None:
            return shard_batch(mesh, batch, axis, space_axis)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x)), batch)

    for batch in it:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.pop(0)
    while queue:
        yield queue.pop(0)


class DataParallel:
    """Wraps a model (models.api.*) for multi-chip SPMD training.

    Replicates the TrainState over the mesh and shards incoming batches;
    the jitted step inside the model then runs SPMD with XLA-inserted
    gradient collectives.  Requires batchSize % n_data == 0.

    With ``spatial > 1`` the mesh gains a 'space' axis and image tensors
    are additionally sharded along H: convolutions get GSPMD halo
    exchanges, per-sample norm reductions become cross-shard collectives.
    This is the TPU-native scaling axis for resolutions that exceed
    per-chip HBM (SURVEY.md §5 "long-context" analogue); requires
    grid_size % spatial == 0.

    With ``tensor > 1`` the mesh gains a 'model' axis and parameters +
    Adam moments are channel-sharded over it (see :func:`param_shardings`)
    — tensor parallelism for configs whose weights/optimizer state exceed
    per-chip HBM (large ngf / n_blocks).  All three axes compose:
    num_devices = data * spatial * tensor.

    With ``pipeline > 1`` the mesh gains a 'pipe' axis: the generators'
    residual trunks execute as a microbatched GPipe schedule over it
    (see :mod:`parallel.pipeline`) while the stem/tail/discriminator work
    stays data-parallel over BOTH axes (batches are sharded over the
    combined ('data','pipe') axes).  Requires n_blocks % pipeline == 0,
    per-sample generator norms, no dropout, no --remat; mutually
    exclusive with spatial/tensor.
    """

    def __init__(self, model, num_devices: int = 0, axis: str = "data",
                 spatial: int = 0, space_axis: str = "space",
                 tensor: int = 0, tensor_axis: str = "model",
                 pipeline: int = 0, pipe_axis: str = "pipe",
                 microbatches: int = 0):
        self.model = model
        self._spatial = int(spatial) if spatial and spatial > 1 else 0
        self._tensor = int(tensor) if tensor and tensor > 1 else 0
        self._pipe = int(pipeline) if pipeline and pipeline > 1 else 0
        if microbatches and microbatches > 1 and not self._pipe:
            raise ValueError("--microbatches only applies to pipeline "
                             "parallelism; set --pipeline >= 2")
        if self._pipe:
            if self._spatial or self._tensor:
                raise ValueError("--pipeline is mutually exclusive with "
                                 "--spatial/--tensor")
            opt = getattr(model, "opt", None)
            if opt is not None:
                if getattr(opt, "remat", False):
                    raise ValueError("--pipeline is incompatible with "
                                     "--remat (lifted remat cannot take the "
                                     "trunk closure argument)")
                if getattr(opt, "use_dropout", False):
                    raise ValueError("--pipeline requires --use_dropout off "
                                     "(no rng plumbing into the manual "
                                     "pipeline region)")
                if getattr(opt, "norm", "instance") != "instance":
                    raise ValueError("--pipeline requires per-sample "
                                     "(instance) generator norms")
                if getattr(opt, "n_blocks", 0) % self._pipe != 0:
                    raise ValueError("--pipeline %d must divide n_blocks %d"
                                     % (self._pipe, opt.n_blocks))
        total = num_devices or len(jax.devices())
        per_data = (max(self._spatial, 1) * max(self._tensor, 1)
                    * max(self._pipe, 1))
        assert total % per_data == 0, \
            "devices (%d) not divisible by spatial*tensor*pipe (%d)" % (
                total, per_data)
        sizes = [(axis, total // per_data)]
        if self._spatial:
            sizes.append((space_axis, self._spatial))
        if self._tensor:
            sizes.append((tensor_axis, self._tensor))
        if self._pipe:
            sizes.append((pipe_axis, self._pipe))
        self.mesh = make_mesh_axes(sizes)
        # batches shard over ('data','pipe') jointly: stem/tail and
        # discriminators are data-parallel across every device; only the
        # trunk's manual region regroups per data shard
        self.axis = (axis, pipe_axis) if self._pipe else axis
        self.space_axis = space_axis if self._spatial else None
        self.tensor_axis = tensor_axis if self._tensor else None
        self.engine = None
        if self._pipe:
            self.engine = PipelineEngine(
                mesh=self.mesh, data_axis=axis, pipe_axis=pipe_axis,
                n_micro=int(microbatches) if microbatches and
                microbatches > 1 else self._pipe)
        if self._tensor:
            # Shard params/opt_state/ema DIRECTLY to their final placement:
            # tensor parallelism exists for configs whose weights + Adam
            # moments exceed per-chip HBM, so they must never pass through
            # a transient fully-replicated copy.  Only the small remaining
            # fields (batch_stats, pools, step — and, via .replace on an
            # emptied state, any future TrainState field) are replicated.
            st = model.state
            rep = replicate_state(self.mesh,
                                  st.replace(params={}, opt_state={}, ema={}))
            model.state = rep.replace(
                params=shard_params(self.mesh, st.params, tensor_axis),
                opt_state=shard_params(self.mesh, st.opt_state, tensor_axis),
                ema=shard_params(self.mesh, st.ema, tensor_axis))
        else:
            model.state = replicate_state(self.mesh, model.state)

    @property
    def n_devices(self) -> int:
        return self.mesh.devices.size

    def shard(self, *arrays):
        out = tuple(shard_batch(self.mesh, a, self.axis, self.space_axis)
                    for a in arrays)
        return out if len(out) > 1 else out[0]

    def train_instance(self, real_A, real_B, prior_z_B=None):
        real_A, real_B = self.shard(real_A), self.shard(real_B)
        if prior_z_B is not None:
            prior_z_B = self.shard(prior_z_B)
        # spatial_hints covers the first-call jit TRACE: with a space axis
        # active, DiscriminatorEdges pins its 4x4 head to batch-only
        # sharding (parallel/hints.py) so the dp x sp compile stays free of
        # GSPMD involuntary-remat resharding.  No-op without spatial.
        with spatial_hints(self.mesh, self.axis, self.space_axis), \
                pipeline_hints(self.engine):
            return self.model.train_instance(real_A, real_B, prior_z_B)

    def supervised_train_instance(self, real_A, real_B, prior_z_B=None):
        real_A, real_B = self.shard(real_A), self.shard(real_B)
        if prior_z_B is not None:
            prior_z_B = self.shard(prior_z_B)
        with spatial_hints(self.mesh, self.axis, self.space_axis), \
                pipeline_hints(self.engine):
            return self.model.supervised_train_instance(real_A, real_B,
                                                        prior_z_B)

    # -- sharded inference: generation helpers fan the batch over the mesh
    # (without this the replicated-param jit computes the full batch on
    # every device).  Falls back to replicated compute when the batch does
    # not divide the mesh.
    def _maybe_shard(self, x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x  # already a global (multi-host) array
        x = jnp.asarray(x)
        axes = self.axis if isinstance(self.axis, tuple) else (self.axis,)
        n_data = int(np.prod([self.mesh.shape[a] for a in axes]))
        ok = x.shape[0] % n_data == 0
        if ok and self.space_axis is not None and x.ndim >= 3:
            ok = x.shape[1] % self.mesh.shape[self.space_axis] == 0
        if not ok:
            return x
        return shard_batch(self.mesh, x, self.axis, self.space_axis)

    def predict_A(self, real_B):
        return self.model.predict_A(self._maybe_shard(real_B))

    def predict_B(self, real_A, z_B):
        return self.model.predict_B(self._maybe_shard(real_A),
                                    self._maybe_shard(z_B))

    def generate_multi(self, real_A, multi_prior_z_B):
        return self.model.generate_multi(self._maybe_shard(real_A),
                                         jnp.asarray(multi_prior_z_B))

    _own_attrs = frozenset({"model", "mesh", "axis", "space_axis",
                            "tensor_axis", "engine"})

    def __getattr__(self, name):
        return getattr(self.model, name)

    def __setattr__(self, name, value):
        # Delegate to the wrapped model (mirroring __getattr__) so driver
        # writes like ``model.epoch = epoch`` land on the inner model that
        # save() serializes, not on the wrapper.
        if name in DataParallel._own_attrs or name.startswith("_"):
            object.__setattr__(self, name, value)
        else:
            setattr(self.model, name, value)
