"""Checkpoint IO: single-file flax-serialized checkpoints with the
reference's naming contract (latest / best_A / best_B, reference
model.py:293-313,750-778) plus asynchronous saving.

The async path snapshots device arrays to host (cheap, device-to-host copy
is async-dispatch-friendly) and writes the file from a background thread so
the train loop never blocks on disk — the TPU-native upgrade of the
reference's synchronous torch.save (SURVEY.md §5 failure-detection row).
"""

from __future__ import annotations

import os
import threading
from typing import Optional

import jax
import numpy as np
from flax import serialization


class AsyncCheckpointer:
    """Serializes checkpoint writes on a single background thread.

    save() returns immediately; wait() blocks until all pending writes are
    durable (call before process exit or before loading what was saved).
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._pending: Optional[threading.Thread] = None

    def save(self, path: str, payload) -> None:
        host_payload = jax.device_get(payload)

        def write():
            data = serialization.to_bytes(host_payload)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)  # atomic publish

        with self._lock:
            if self._pending is not None:
                self._pending.join()
            t = threading.Thread(target=write, daemon=True)
            t.start()
            self._pending = t

    def wait(self) -> None:
        with self._lock:
            if self._pending is not None:
                self._pending.join()
                self._pending = None


def load_checkpoint(path: str, target):
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


class OrbaxCheckpointer:
    """Orbax-backed checkpoint backend (``--ckpt_backend orbax``).

    Writes a checkpoint *directory* per name (same latest/best_A/best_B
    contract); async saves go through orbax's AsyncCheckpointer so the
    train loop never blocks.  Loads are auto-detected by path type in
    models.api (directory -> orbax, file -> flax bytes), so the two
    backends' checkpoints interoperate.
    """

    def __init__(self):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self._sync = ocp.StandardCheckpointer()
        self._async = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path: str, payload, async_save: bool = False) -> None:
        path = os.path.abspath(path)
        if async_save:
            self._async.save(path,
                             args=self._ocp.args.StandardSave(payload),
                             force=True)
        else:
            self._sync.save(path, payload, force=True)

    def restore(self, path: str, template):
        # restore against the template's structure/shapes/dtypes
        return self._sync.restore(os.path.abspath(path),
                                  jax.device_get(template))

    def wait(self) -> None:
        self._async.wait_until_finished()
