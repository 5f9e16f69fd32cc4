"""Per-file .npz dataset over dataroot/{trainA,trainB,testA,testB}/ dirs,
with a *working* multi-threaded loader (the reference's `--numpy_data 0`
path crashed on the never-defined opt.nThreads — quirk Q3; reference
dataloader.py:158-251).

Semantics preserved from the reference NumpyDataset:
- recursive .npz/.npy discovery, sorted then seed-123 shuffled,
- dev = first DEV_SIZE of train, train = the rest,
- `fraction` subsetting (used for the supervised split),
- unaligned mode draws a random B index per item,
- transform: resize to (grid_size, grid_size) then map to [-1, 1]
  (the reference's ToTensor+Normalize(0.5,0.5,0.5) composition).

Output batches are NHWC float32 dicts {'A':..., 'B':...}.  Threaded
prefetch uses a bounded queue so the host pipeline stays ahead of the
device without unbounded memory growth.
"""

from __future__ import annotations

import os
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

import numpy as np

from .npz import DEV_SIZE, py2_seed123_permutation

IMG_EXTENSIONS = [".npz", ".npy"]


def is_numpy_file(filename: str) -> bool:
    return any(filename.endswith(ext) for ext in IMG_EXTENSIONS)


def make_dataset(dir: str) -> List[str]:
    images = []
    assert os.path.isdir(dir), "%s is not a valid directory" % dir
    for root, _, fnames in sorted(os.walk(dir)):
        for fname in fnames:
            if is_numpy_file(fname):
                images.append(os.path.join(root, fname))
    return images


def _load_arr(path) -> np.ndarray:
    if isinstance(path, np.ndarray):
        return path
    from . import native
    if native.native_available():
        arr, kind = native.read_npz_f32(str(path), return_kind=True)
        if arr is not None:
            if kind == "u":
                # preserve integer-image semantics (ToTensor-style /255)
                return np.clip(arr, 0, 255).astype(np.uint8)
            return arr
    if str(path).endswith(".npy"):
        return np.load(path)
    with np.load(path) as f:
        return f["data"]


def default_transform(img: np.ndarray, grid_size: int,
                      antialias: bool = True) -> np.ndarray:
    """resize -> [-1, 1], HWC float32 (reference get_transform,
    dataloader.py:253-258; skimage-parity anti-aliased resize by default)."""
    if img.ndim == 2:
        img = img[..., None]
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    img = img.astype(np.float32)
    if img.shape[0] != grid_size or img.shape[1] != grid_size:
        from .resize import resize_batch
        img = resize_batch(img[None], grid_size, antialias=antialias)[0]
    return (img - 0.5) / 0.5


class NumpyDataset:
    def __init__(self, opt, subset: str, unaligned: bool, fraction: float = 1.0,
                 load_in_mem: bool = True, seed: Optional[int] = None):
        self.root = opt.dataroot
        self.subset = subset
        self.unaligned = unaligned
        self.grid_size = opt.grid_size
        self.antialias = bool(getattr(opt, "resize_antialias", 1))
        assert 0.0 < fraction <= 1.0
        if subset in ("dev", "train"):
            dir_A = os.path.join(self.root, "trainA")
            dir_B = os.path.join(self.root, "trainB")
        elif subset in ("test", "val"):
            dir_A = os.path.join(self.root, "testA")
            dir_B = os.path.join(self.root, "testB")
        else:
            raise NotImplementedError("subset %s not supported" % subset)

        A_paths = sorted(make_dataset(dir_A))
        B_paths = sorted(make_dataset(dir_B))
        idx = py2_seed123_permutation(len(A_paths))
        A_paths = [A_paths[i] for i in idx]
        B_paths = [B_paths[i] for i in idx]
        dev_size = int(getattr(opt, "dev_size", DEV_SIZE))
        if subset == "dev":
            A_paths, B_paths = A_paths[:dev_size], B_paths[:dev_size]
        elif subset == "train":
            A_paths, B_paths = A_paths[dev_size:], B_paths[dev_size:]

        subset_size = int(len(A_paths) * fraction)
        self.A_paths = A_paths[:subset_size]
        self.B_paths = B_paths[:subset_size]

        self._transformed = load_in_mem
        if load_in_mem:
            # the transform (uint8 scale, anti-aliased resize, [-1,1]) is
            # deterministic, so apply it ONCE at load time — re-running the
            # per-item resize on every epoch's every access would dispatch
            # through jax.image.resize from the loader threads each time
            self.A_paths = [default_transform(_load_arr(p), self.grid_size,
                                              self.antialias)
                            for p in self.A_paths]
            self.B_paths = [default_transform(_load_arr(p), self.grid_size,
                                              self.antialias)
                            for p in self.B_paths]

        self.A_size = len(self.A_paths)
        self.B_size = len(self.B_paths)
        self._rng = random.Random(seed)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        A = _load_arr(self.A_paths[index % self.A_size])
        if self.unaligned:
            index_B = self._rng.randint(0, self.B_size - 1)
        else:
            index_B = index % self.A_size
        B = _load_arr(self.B_paths[index_B])
        if self._transformed:
            return {"A": A, "B": B}
        return {"A": default_transform(A, self.grid_size, self.antialias),
                "B": default_transform(B, self.grid_size, self.antialias)}

    def __len__(self):
        return max(self.A_size, self.B_size)


class DataLoader:
    """Threaded batch loader (the working replacement for the reference's
    torch DataLoader wrapper, dataloader.py:235-251)."""

    def __init__(self, opt, subset: str, unaligned: bool, batchSize: int,
                 shuffle: bool = False, fraction: float = 1.0,
                 load_in_mem: bool = True, drop_last: bool = False,
                 num_workers: Optional[int] = None):
        self.opt = opt
        self.dataset = NumpyDataset(opt, subset, unaligned, fraction,
                                    load_in_mem)
        self.batch_size = batchSize
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = (num_workers if num_workers is not None
                            else int(getattr(opt, "nThreads", 4)))

    def _iter_batches(self):
        n = len(self.dataset)
        order = np.random.permutation(n) if self.shuffle else np.arange(n)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, n, self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        if self.num_workers <= 1:
            for idxs in batches:
                items = [self.dataset[int(i)] for i in idxs]
                yield {"A": np.stack([it["A"] for it in items]),
                       "B": np.stack([it["B"] for it in items])}
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            def fetch(idxs):
                items = list(pool.map(self.dataset.__getitem__,
                                      [int(i) for i in idxs]))
                return {"A": np.stack([it["A"] for it in items]),
                        "B": np.stack([it["B"] for it in items])}

            # bounded two-deep pipeline: prefetch next while current consumed
            pending = queue.Queue(maxsize=2)
            stop = object()
            cancel = threading.Event()

            def put_or_cancel(item) -> bool:
                while not cancel.is_set():
                    try:
                        pending.put(item, timeout=0.1)
                        return True
                    except queue.Full:
                        continue
                return False

            def producer():
                try:
                    for idxs in batches:
                        if cancel.is_set() or not put_or_cancel(fetch(idxs)):
                            return
                finally:
                    put_or_cancel(stop)

            t = threading.Thread(target=producer, daemon=True)
            t.start()
            try:
                while True:
                    item = pending.get()
                    if item is stop:
                        break
                    yield item
                t.join()
            finally:
                # a consumer that abandons the iterator early (break / GC)
                # must release the producer: it may be blocked in put() on
                # the full queue, and letting the pool shut down under it
                # would leak the thread plus the buffered batches forever
                cancel.set()
                t.join(timeout=30)

    def load_data(self):
        return self._iter_batches()

    def __iter__(self):
        return self._iter_batches()

    def __len__(self):
        return len(self.dataset)
