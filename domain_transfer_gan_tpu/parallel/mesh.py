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


def make_mesh(num_devices: int = 0, axis: str = "data",
              devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, ndim: int = 4, axis: str = "data"
                   ) -> NamedSharding:
    """Shard axis 0 (batch), replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """device_put every leaf with its batch axis sharded over the mesh."""
    def put(x):
        x = jnp.asarray(x)
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis))
    return jax.tree_util.tree_map(put, tree)


def replicate_state(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def prefetch_to_device(iterator: Iterable, mesh: Optional[Mesh] = None,
                       size: int = 2, axis: str = "data") -> Iterator:
    """Double-buffered host->HBM feed: keeps `size` batches in flight so
    input transfer overlaps with compute (the reference synchronously
    .cuda()'d every batch, train.py:198-201)."""
    queue = []
    it = iter(iterator)

    def put(batch):
        if mesh is not None:
            return shard_batch(mesh, batch, axis)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x)), batch)

    for batch in it:
        queue.append(put(batch))
        if len(queue) >= size:
            yield queue.pop(0)
    while queue:
        yield queue.pop(0)


class DataParallel:
    """Wraps a model (models.api.*) for multi-chip data-parallel training.

    Replicates the TrainState over the mesh and shards incoming batches;
    the jitted step inside the model then runs SPMD with XLA-inserted
    gradient collectives.  Requires batchSize % n_devices == 0.
    """

    def __init__(self, model, num_devices: int = 0, axis: str = "data"):
        self.model = model
        self.mesh = make_mesh(num_devices, axis)
        self.axis = axis
        model.state = replicate_state(self.mesh, model.state)

    @property
    def n_devices(self) -> int:
        return self.mesh.devices.size

    def shard(self, *arrays):
        out = tuple(shard_batch(self.mesh, a, self.axis) for a in arrays)
        return out if len(out) > 1 else out[0]

    def train_instance(self, real_A, real_B, prior_z_B=None):
        real_A, real_B = self.shard(jnp.asarray(real_A)), \
            self.shard(jnp.asarray(real_B))
        if prior_z_B is not None:
            prior_z_B = self.shard(jnp.asarray(prior_z_B))
        return self.model.train_instance(real_A, real_B, prior_z_B)

    def supervised_train_instance(self, real_A, real_B, prior_z_B=None):
        real_A, real_B = self.shard(jnp.asarray(real_A)), \
            self.shard(jnp.asarray(real_B))
        if prior_z_B is not None:
            prior_z_B = self.shard(jnp.asarray(prior_z_B))
        return self.model.supervised_train_instance(real_A, real_B, prior_z_B)

    _own_attrs = frozenset({"model", "mesh", "axis"})

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
