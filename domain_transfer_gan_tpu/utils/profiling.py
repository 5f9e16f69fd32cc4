"""Tracing/profiling hooks — the TPU-native upgrade of the reference's
wall-clock-only timing (reference train.py:172,243,307-308; SURVEY.md §5).

- :class:`StepTimer` measures steady-state step time without forcing device
  syncs every iteration (syncs only when a window closes).

(The --profile_dir jax.profiler window lives in cli/train.py, which traces
a bounded mid-run step window rather than a whole region.)
"""

from __future__ import annotations

import time


class StepTimer:
    """Windowed images/sec + step-time tracker.

    call .tick(batch_size) per step; .window() returns and resets
    (seconds_per_item, items_per_sec) for the elapsed window, syncing the
    device once so async-dispatched work is counted honestly.
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._items = 0
        self._steps = 0

    def tick(self, n_items: int):
        self._items += n_items
        self._steps += 1

    def window(self, sync_array=None):
        if sync_array is not None:
            # Sync via a real host fetch: on this environment's tunneled TPU
            # backend, block_until_ready can return before execution
            # completes (inflating throughput ~5x); a device->host value
            # transfer cannot be faked.
            import numpy as np
            float(np.asarray(sync_array).ravel()[0])
        dt = time.perf_counter() - self._t0
        sec_per_item = dt / max(self._items, 1)
        items_per_sec = self._items / dt if dt > 0 else float("inf")
        out = (sec_per_item, items_per_sec, dt, self._steps)
        self.reset()
        return out

