"""Multi-host (multi-process) SPMD support.

The reference has no multi-node capability at all — its only parallelism is
single-process ``nn.parallel.data_parallel`` scatter/gather
(reference networks.py:194-197; SURVEY.md §5: ``torch.distributed`` never
imported).  This module is the TPU-native extension beyond that: one JAX
process per host, a single global mesh over every host's devices (ICI
within a slice, DCN across slices), XLA collectives placed by GSPMD.

Model
-----
Every process runs the same program (multi-controller SPMD):

- all hosts load the same dataset and draw identical batches (the
  iterators are seeded identically — the reference's own global-seed
  discipline, train.py:102-108, extended across hosts);
- global device arrays are built with ``jax.make_array_from_callback``,
  which materializes only this process's addressable shards, so each host
  transfers exactly its slice of the batch to its local devices;
- train-step outputs (losses) are fully replicated scalars — any host can
  fetch them without communication;
- sharded eval/visual outputs are fetched with :func:`to_host`
  (``process_allgather``) and written by the primary process only.

Usage
-----
TPU pods: ``initialize()`` with no arguments auto-detects the coordinator
from the TPU metadata.  Manual clusters (or the CPU gloo backend used by
tests): pass ``coordinator`` ("host:port"), ``num_processes`` and
``process_id``.  CLI: ``--coordinator/--num_processes/--process_id``.
"""

from __future__ import annotations

import functools

import numpy as np

import jax

__all__ = ["initialize", "is_primary", "process_count", "to_host",
           "to_host_tree"]


def initialize(coordinator: str = "", num_processes: int = 0,
               process_id: int = -1) -> None:
    """Join (or create) a multi-process JAX cluster.

    No-op when called with no arguments outside a pod environment; with
    ``coordinator == "auto"`` forces the no-arg auto-detecting form.
    Must run before any other JAX call touches the backend.
    """
    if coordinator == "auto":
        jax.distributed.initialize()
        return
    if not coordinator and num_processes <= 1 and process_id < 0:
        return  # single-process (process_id >= 0 proves multi-host intent)
    # Manual cluster: all three must be given — a partial spec silently
    # running single-process would leave every host believing it is
    # primary and clobbering the same artifact dir on a shared FS.
    if not coordinator or num_processes <= 1 or \
            not (0 <= process_id < num_processes):
        raise ValueError(
            "multi-host needs --coordinator host:port, --num_processes > 1 "
            "AND --process_id in [0, num_processes); got coordinator=%r "
            "num_processes=%r process_id=%r (or use --coordinator auto on "
            "a TPU pod)" % (coordinator, num_processes, process_id))
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the process that owns artifact/checkpoint writes."""
    return jax.process_index() == 0


@functools.lru_cache(maxsize=32)
def _gather_fn(rep_sharding):
    """One compiled all-gather-to-replicated per target sharding (a fresh
    jit per call would recompile the gather every fetch)."""
    return jax.jit(lambda a: a, out_shardings=rep_sharding)


def to_host(x) -> np.ndarray:
    """Fetch a (possibly cross-host-sharded) global array to every host.

    Single-process (or fully-addressable / replicated input): a plain
    device fetch.  A cross-host-sharded global array is first re-laid-out
    to a replicated sharding (an XLA all-gather over DCN/ICI), after which
    every host can fetch the full value locally.
    """
    if (not isinstance(x, jax.Array) or x.is_fully_addressable
            or x.sharding.is_fully_replicated):
        return np.asarray(x)
    from jax.sharding import NamedSharding, PartitionSpec
    rep = NamedSharding(x.sharding.mesh, PartitionSpec())
    return np.asarray(_gather_fn(rep)(x))


def to_host_tree(tree):
    """to_host over a whole pytree with ONE compiled gather program.

    Per-leaf to_host calls dispatch one XLA collective per parameter/
    moment leaf (hundreds per checkpoint save); here every cross-host
    leaf rides a single jitted identity with replicated out_shardings,
    then each is fetched locally."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    local = [(not isinstance(x, jax.Array) or x.is_fully_addressable
              or x.sharding.is_fully_replicated) for x in leaves]
    remote_idx = [i for i, loc in enumerate(local) if not loc]
    if remote_idx:
        from jax.sharding import NamedSharding, PartitionSpec
        remote = [leaves[i] for i in remote_idx]
        rep = tuple(NamedSharding(x.sharding.mesh, PartitionSpec())
                    for x in remote)
        gathered = jax.jit(lambda xs: xs, out_shardings=rep)(tuple(remote))
        for i, g in zip(remote_idx, gathered):
            leaves[i] = g
    return jax.tree_util.tree_unflatten(
        treedef, [np.asarray(x) for x in leaves])
