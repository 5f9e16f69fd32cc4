"""In-memory npz bundle loading with the reference's exact normalization
semantics (reference dataloader.py:13-59):

- read key 'data' from {train,test}{A,B}.npz, keep the first 3 channels,
- NaN -> 0, per-sample-per-channel min-max rescale to [-1, 1], +-inf -> 0,
- optional resize to (grid_size, grid_size),
- deterministic seed-123 shuffle of the train split (bit-identical to the
  reference's Python-2 random.shuffle — see :func:`py2_seed123_permutation`),
- first DEV_SIZE samples become the dev split.

Layout difference from the reference: arrays stay NHWC (TPU-native) instead
of being transposed to NCHW (reference dataloader.py:33).
"""

from __future__ import annotations

import os
import random
from typing import Optional, Tuple

import numpy as np

DEV_SIZE = 200  # reference dataloader.py:11


def py2_seed123_permutation(n: int, seed: int = 123) -> np.ndarray:
    """The index permutation random.shuffle(range(n)) produces under
    Python 2 with random.seed(123) (reference dataloader.py:44-51).

    Python 2's shuffle is Fisher-Yates driven by random.random():
        for i in reversed(range(1, n)): j = int(random() * (i + 1)); swap
    The Mersenne-Twister float stream for an int seed is identical across
    Python 2/3, so replaying that exact algorithm reproduces the reference's
    train/dev split bit-for-bit.
    """
    r = random.Random(seed)
    idx = list(range(n))
    for i in reversed(range(1, n)):
        j = int(r.random() * (i + 1))
        idx[i], idx[j] = idx[j], idx[i]
    return np.asarray(idx, dtype=np.int64)


def normalize_bundle(arr: np.ndarray, use_native: bool = True) -> np.ndarray:
    """NaN->0, per-sample-per-channel min-max to [-1,1], inf scrubbed (NHWC).

    Dispatches to the threaded C++ implementation (csrc/npz_loader.cc,
    bit-exact vs this numpy path) when the native library is built.  Both
    paths cast to float32 *before* normalizing so the equivalence holds for
    any input dtype.  Quirk fix vs the reference: 3-D inputs gain their
    channel axis at position 3 (NHW -> NHWC) rather than the reference's
    axis=2 (dataloader.py:21-22, which produced NHCW under its NCHW
    transpose) — NHWC is this framework's native layout.
    """
    if use_native and arr.ndim == 4:
        from . import native
        out = np.ascontiguousarray(arr, dtype=np.float32)
        if native.normalize_batch_inplace(out):
            return out
    arr = np.nan_to_num(arr.astype(np.float32, copy=True))
    if arr.ndim == 3:
        arr = np.expand_dims(arr, axis=3)
    lo = arr.min(axis=(1, 2))[:, np.newaxis, np.newaxis]
    hi = arr.max(axis=(1, 2))[:, np.newaxis, np.newaxis]
    with np.errstate(divide="ignore", invalid="ignore"):
        arr = -1.0 + 2.0 * (arr - lo) / (hi - lo)
    arr = np.nan_to_num(arr)
    arr[arr == np.inf] = 0
    arr[arr == -np.inf] = 0
    return arr.astype(np.float32)


def resize_batch(arr: np.ndarray, grid_size: int,
                 antialias: bool = True) -> np.ndarray:
    """Resize an NHWC batch to (grid_size, grid_size).

    The reference used anti-aliased skimage.transform.resize per sample
    (dataloader.py:26-31); data/resize.py reproduces that pipeline
    (Gaussian pre-filter + linear interpolation).  antialias=False keeps
    the plain jax.image path.
    """
    from .resize import resize_batch as _rb
    return _rb(arr, grid_size, antialias=antialias)


def _load_one(root: str, fname: str, grid_size: Optional[int],
              antialias: bool = True) -> np.ndarray:
    print("Loading %s" % root)
    with np.load(os.path.join(root, fname)) as f:
        arr = f["data"][..., :3]
    arr = normalize_bundle(arr)
    if grid_size is not None:
        print("Resizing data to %d" % grid_size)
        arr = resize_batch(arr, grid_size, antialias=antialias)
    return arr


def load_numpy_data(root: str, shuffle: bool = True,
                    grid_size: Optional[int] = None,
                    dev_size: int = DEV_SIZE,
                    antialias: bool = True
                    ) -> Tuple[np.ndarray, ...]:
    """Returns (trainA, trainB, devA, devB, testA, testB), all NHWC float32.

    Mirrors reference dataloader.py:13-59 including the seed-123 shuffle and
    the first-DEV_SIZE dev split.
    """
    print("loading data numpy files...")
    trainA = _load_one(root, "trainA.npz", grid_size, antialias)
    trainB = _load_one(root, "trainB.npz", grid_size, antialias)
    testA = _load_one(root, "testA.npz", grid_size, antialias)
    testB = _load_one(root, "testB.npz", grid_size, antialias)
    print("done.")

    if shuffle:
        indx = py2_seed123_permutation(len(trainA))
        trainA = trainA[indx]
        trainB = trainB[indx]

    devA, devB = trainA[:dev_size], trainB[:dev_size]
    trainA, trainB = trainA[dev_size:], trainB[dev_size:]
    return trainA, trainB, devA, devB, testA, testB
