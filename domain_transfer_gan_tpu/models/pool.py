"""Device-side buffered fake-image pool (jittable, functional).

The classic CycleGAN history trick (Shrivastava et al. / Zhu et al.): the
discriminator trains on a mix of freshly generated fakes and fakes replayed
from a buffer, stabilizing adversarial dynamics.  The reference fork does
NOT implement it (SURVEY.md §2 lists no pool); BASELINE.json's config 4
("buffered fake-image pool") names it as a target capability, so it is
provided here as an opt-in (--pool_size, default 0 = reference-parity off).

Semantics per incoming image (matching the torch ImagePool):
- while the pool is not full: insert the image, return the image;
- otherwise with p=0.5 return a random pool element and replace it with the
  incoming image, else return the incoming image.

Everything is expressed with masked scatters so the whole query lives inside
the jitted train step (no host round-trips).  When several batch elements
pick the same replacement slot the last write wins — the same kind of
order-dependence the sequential torch implementation has.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PoolState:
    buf: jnp.ndarray   # (pool_size, H, W, C)
    n: jnp.ndarray     # int32: number of filled slots


def init_pool(pool_size: int, image_shape, dtype=jnp.float32) -> PoolState:
    return PoolState(buf=jnp.zeros((pool_size,) + tuple(image_shape), dtype),
                     n=jnp.zeros((), jnp.int32))


def pool_query(pool: PoolState, images: jnp.ndarray,
               key: jax.Array) -> Tuple[PoolState, jnp.ndarray]:
    """Push a batch through the pool; returns (new_pool, images_for_D)."""
    pool_size = pool.buf.shape[0]
    b = images.shape[0]
    k_coin, k_slot = jax.random.split(key)

    # sequential insert positions for the not-yet-full case
    pos = pool.n + jnp.arange(b, dtype=jnp.int32)
    inserting = pos < pool_size

    coin = jax.random.bernoulli(k_coin, 0.5, (b,))
    rand_slot = jax.random.randint(k_slot, (b,), 0, pool_size)

    imgs = images.astype(pool.buf.dtype)
    # Inserts land BEFORE the replay gather: torch fills sequentially, so
    # by the time any element replays, every slot holds a real image — a
    # replay in the same batch that crosses the pool-full boundary must
    # see this batch's inserts, never a zero-initialized slot.  Non-
    # inserting elements scatter out of bounds and are dropped in place
    # (no extended-buffer copy).
    buf = pool.buf.at[jnp.where(inserting, pos, pool_size)].set(
        imgs, mode="drop")

    # replayed candidates: the slot's OLD content (gather precedes the
    # coin-swap writes, like torch's clone-then-replace)
    replaying = ~inserting & coin
    replay = buf[rand_slot]
    out = jnp.where(replaying[:, None, None, None], replay, images)

    # coin-swaps: the replayed slots take the incoming images
    buf = buf.at[jnp.where(replaying, rand_slot, pool_size)].set(
        imgs, mode="drop")

    new_n = jnp.minimum(pool.n + b, pool_size).astype(jnp.int32)
    return PoolState(buf=buf, n=new_n), out
