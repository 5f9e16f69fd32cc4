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

    # replayed candidates (gather BEFORE any writes, like torch's copy)
    replay = pool.buf[rand_slot]
    out = jnp.where((~inserting & coin)[:, None, None, None], replay, images)

    # writes: inserts go to `pos`, coin-swaps go to `rand_slot`;
    # non-writing elements are routed to a scratch row past the buffer end
    write_slot = jnp.where(inserting, pos,
                           jnp.where(coin, rand_slot, pool_size))
    buf_ext = jnp.concatenate(
        [pool.buf, jnp.zeros((1,) + pool.buf.shape[1:], pool.buf.dtype)], 0)
    buf_ext = buf_ext.at[write_slot].set(images.astype(pool.buf.dtype))
    new_buf = buf_ext[:pool_size]

    new_n = jnp.minimum(pool.n + b, pool_size).astype(jnp.int32)
    return PoolState(buf=new_buf, n=new_n), out
