"""Minibatch iterators with the reference's exact protocol
(reference dataloader.py:61-155): dict batches {'A': ..., 'B': ...}, epoch
auto-reset via StopIteration, aligned (same order) vs unaligned (two
independent permutations, full-size batches via last-batch backoff).

Batches are NHWC numpy arrays; the model layer moves them on-device.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class AlignedIterator:
    """Paired minibatches in the same index order (dataloader.py:61-110)."""

    def __init__(self, data_A, data_B, batch_size: int = 100,
                 shuffle: bool = False, rng: Optional[np.random.RandomState] = None,
                 **kwargs):
        assert data_A.shape[0] == data_B.shape[0], "passed data differ in number!"
        self.data_A = data_A
        self.data_B = data_B
        self.num_samples = data_A.shape[0]
        self.batch_size = batch_size
        self.n_batches = self.num_samples // batch_size
        if self.num_samples % batch_size != 0:
            self.n_batches += 1
        self.shuffle = shuffle
        self.rng = rng or np.random
        self.reset()

    def __iter__(self):
        return self

    def reset(self):
        if self.shuffle:
            self.data_indices = self.rng.permutation(self.num_samples)
        else:
            self.data_indices = np.arange(self.num_samples)
        self.batch_idx = 0

    def __next__(self) -> Dict[str, np.ndarray]:
        if self.batch_idx == self.n_batches:
            self.reset()
            raise StopIteration
        idx = self.batch_idx * self.batch_size
        chosen = self.data_indices[idx:idx + self.batch_size]
        self.batch_idx += 1
        return {"A": self.data_A[chosen], "B": self.data_B[chosen]}

    next = __next__  # reference-era alias

    def __len__(self):
        return self.num_samples


class UnalignedIterator:
    """Unpaired minibatches: independent permutations per domain, every
    batch full-size via last-batch backoff (dataloader.py:112-155)."""

    def __init__(self, data_A, data_B, batch_size: int = 100,
                 rng: Optional[np.random.RandomState] = None, **kwargs):
        assert data_A.shape[0] == data_B.shape[0], "passed data differ in number!"
        self.data_A = data_A
        self.data_B = data_B
        self.num_samples = data_A.shape[0]
        self.batch_size = batch_size
        self.n_batches = self.num_samples // batch_size
        if self.num_samples % batch_size != 0:
            self.n_batches += 1
        self.rng = rng or np.random
        # index mode (cli/train.py --device_data fused feed): yield the
        # batch's row indices instead of gathered arrays, so the gather
        # can run inside the jitted step program.  Same RandomState, same
        # permutations, same rows — only WHERE the gather executes moves.
        self.yield_indices = False
        self.reset()

    def __iter__(self):
        return self

    def reset(self):
        self.data_indices = [self.rng.permutation(self.num_samples)
                             for _ in range(2)]
        self.batch_idx = 0

    def __next__(self) -> Dict[str, np.ndarray]:
        if self.batch_idx == self.n_batches:
            self.reset()
            raise StopIteration
        idx = self.batch_idx * self.batch_size
        if idx + self.batch_size >= len(self.data_indices[0]):
            idx = len(self.data_indices[0]) - self.batch_size
        chosen_A = self.data_indices[0][idx:idx + self.batch_size]
        chosen_B = self.data_indices[1][idx:idx + self.batch_size]
        self.batch_idx += 1
        if self.yield_indices:
            return {"A_idx": np.asarray(chosen_A, dtype=np.int32),
                    "B_idx": np.asarray(chosen_B, dtype=np.int32)}
        return {"A": self.data_A[chosen_A], "B": self.data_B[chosen_B]}

    next = __next__

    def __len__(self):
        return self.num_samples
