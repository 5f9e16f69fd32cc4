"""edges2shoes loading — restores the capability the reference's test.py
imports but lacks (quirk Q2: `from edges2shoes_data import load_edges2shoes`
at reference test.py:8 names a module that does not exist in the fork).

Two on-disk layouts are supported:

1. npz bundles ``{train,val|test}{A,B}.npz`` with key 'data' — the same
   contract as the numpy loader but already-normalized natural images.
2. the standard pix2pix edges2shoes folder: ``train/*.jpg`` and
   ``val/*.jpg`` where each jpg is the A|B pair concatenated side by side
   (A = edges on the left, B = shoe photo on the right).  Images are
   resized to ``size`` (default 64) and scaled to [-1, 1].

Returns the reference's 6-tuple (trainA, trainB, devA, devB, testA, testB),
NHWC float32, dev = first DEV_SIZE train samples.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from .npz import DEV_SIZE, py2_seed123_permutation


def _load_pair_folder(folder: str, size: int) -> Tuple[np.ndarray, np.ndarray]:
    from PIL import Image

    files = sorted(f for f in os.listdir(folder)
                   if f.lower().endswith((".jpg", ".jpeg", ".png")))
    A, B = [], []
    for f in files:
        img = Image.open(os.path.join(folder, f)).convert("RGB")
        w, h = img.size
        a = img.crop((0, 0, w // 2, h)).resize((size, size), Image.BILINEAR)
        b = img.crop((w // 2, 0, w, h)).resize((size, size), Image.BILINEAR)
        A.append(np.asarray(a, dtype=np.float32))
        B.append(np.asarray(b, dtype=np.float32))
    A = np.stack(A) / 127.5 - 1.0
    B = np.stack(B) / 127.5 - 1.0
    return A, B


def load_edges2shoes(root: str, size: int = 64, shuffle: bool = True,
                     dev_size: int = DEV_SIZE, antialias: bool = True):
    npz_train = os.path.join(root, "trainA.npz")
    if os.path.exists(npz_train):
        from .npz import load_numpy_data
        return load_numpy_data(root, shuffle=shuffle, grid_size=size,
                               dev_size=dev_size, antialias=antialias)

    train_dir = os.path.join(root, "train")
    val_dir = os.path.join(root, "val")
    if not os.path.isdir(val_dir):
        val_dir = os.path.join(root, "test")
    trainA, trainB = _load_pair_folder(train_dir, size)
    testA, testB = _load_pair_folder(val_dir, size)

    if shuffle:
        idx = py2_seed123_permutation(len(trainA))
        trainA, trainB = trainA[idx], trainB[idx]

    devA, devB = trainA[:dev_size], trainB[:dev_size]
    trainA, trainB = trainA[dev_size:], trainB[dev_size:]
    return trainA, trainB, devA, devB, testA, testB
