"""Many-to-many (z-diversity) metric.

The whole point of Augmented CycleGAN over stochastic CycleGAN is that
G_A->B(a, z) produces DIVERSE outputs per input as z varies (the reference
visualizes this with generate_multi grids, train.py:61-74, but never
quantifies it — a mode-collapsed generator that ignores z would pass every
reference metric).  This module measures it:

- ``z_diversity_stats``: per-input mean pairwise distance of random-feature
  embeddings across z draws (``intra_z``), the mean pairwise distance
  between per-input mean embeddings (``inter_input``), and their ratio.
  A z-ignoring generator scores intra_z ~ 0 (exactly 0 up to float noise),
  a healthy many-to-many generator scores a ratio well above 0.
- ``eval_z_diversity``: drives a model's ``generate_multi`` (the same
  batched decode the reference uses for its grids) over a dataset batch.

Embeddings come from eval.fid's fixed-seed random-feature extractor so the
number is reproducible and comparable across arms/checkpoints, and the same
code scores torch-arm images (it is a pure function of image arrays).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from .fid import random_feature_extractor


def z_diversity_stats(multi_fake_B: np.ndarray, num_z: int,
                      extractor: Optional[Callable] = None) -> dict:
    """Diversity statistics of an input-major multi-z decode.

    ``multi_fake_B`` is (N * num_z, H, W, C) with input i's num_z decodes
    contiguous — exactly the layout ``generate_multi`` returns (each A
    tiled over its z draws).  Returns
    ``{"intra_z", "inter_input", "ratio"}`` where

    - intra_z: mean over inputs of the mean pairwise L2 distance between
      the num_z embeddings of that input (0 for a z-ignoring generator),
    - inter_input: mean pairwise L2 distance between per-input mean
      embeddings (the scale yardstick), and
    - ratio = intra_z / inter_input (scale-free; ~0 iff z is ignored).
    """
    multi_fake_B = np.asarray(multi_fake_B, np.float32)
    total = multi_fake_B.shape[0]
    if num_z < 2:
        raise ValueError("z-diversity needs num_z >= 2 z draws per input, "
                         "got %d" % num_z)
    if total % num_z != 0:
        raise ValueError("multi_fake_B length %d not divisible by num_z %d"
                         % (total, num_z))
    n = total // num_z
    extractor = extractor or random_feature_extractor()
    emb = extractor(multi_fake_B).reshape(n, num_z, -1)

    # mean pairwise distance across z, per input
    diffs = emb[:, :, None, :] - emb[:, None, :, :]      # (n, K, K, D)
    dists = np.sqrt(np.sum(diffs ** 2, axis=-1))          # (n, K, K)
    iu = np.triu_indices(num_z, k=1)
    intra = float(np.mean(dists[:, iu[0], iu[1]]))

    # scale yardstick: pairwise distance between per-input mean embeddings
    centers = emb.mean(axis=1)                            # (n, D)
    if n >= 2:
        cd = centers[:, None, :] - centers[None, :, :]
        cdists = np.sqrt(np.sum(cd ** 2, axis=-1))
        ciu = np.triu_indices(n, k=1)
        inter = float(np.mean(cdists[ciu]))
    else:
        inter = float("nan")
    ratio = intra / inter if inter and np.isfinite(inter) and inter > 0 \
        else float("nan")
    return {"intra_z": intra, "inter_input": inter, "ratio": ratio}


def eval_z_diversity(model, real_A, num_z: int = 10,
                     extractor: Optional[Callable] = None) -> dict:
    """Score a model's many-to-many behavior on a batch of A images.

    Draws num_z prior z's per input, decodes them in one batched
    ``generate_multi`` forward (reference train.py:61-74 layout) and
    returns :func:`z_diversity_stats` of the result.
    """
    import jax.numpy as jnp

    real_A = jnp.asarray(real_A)
    n = real_A.shape[0]
    multi_z = model.sample_prior_z(n * num_z)
    multi_fake_B = model.generate_multi(real_A, multi_z)
    return z_diversity_stats(np.asarray(multi_fake_B), num_z, extractor)
