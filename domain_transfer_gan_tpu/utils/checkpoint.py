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
        self._sync = ocp.Checkpointer(ocp.StandardCheckpointHandler())
        self._async = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._procs = []  # multi-host: in-flight subprocess writers

    def save(self, path: str, payload, async_save: bool = False) -> None:
        path = os.path.abspath(path)
        if jax.process_count() > 1:
            self._subprocess_save(path, payload, async_save)
            return
        ckpt = self._async if async_save else self._sync
        ckpt.save(path, args=self._ocp.args.StandardSave(payload), force=True)

    def _subprocess_save(self, path: str, payload, async_save: bool) -> None:
        """Multi-host: write through a fresh single-process interpreter.

        models.api gathers every leaf to host numpy before dispatching
        here, so the payload is fully process-local — but orbax's
        NumpyHandler only writes array data on global process 0
        (type_handlers.py gates ``_background_serialize`` on
        ``process_index() == 0``), so a rank > 0 process cannot write a
        numpy payload in-process no matter the MultiprocessingOptions.
        A subprocess (utils._orbax_write) has ``jax.process_count() == 1``
        and writes like any single-host save; each rank durably writes its
        own copy with zero cross-rank coordination (same per-rank
        discipline as the flax byte path / cli.train's .workerN scratch
        dirs).
        """
        import pickle
        import subprocess
        import sys
        import tempfile
        # serialize saves per checkpoint name: a still-running child for
        # the same path must finish before a new writer targets the same
        # orbax directory (back-to-back async 'latest' saves)
        still = []
        for proc, p in self._procs:
            if p == path and proc.poll() is None:
                if proc.wait() != 0:
                    raise RuntimeError(
                        "orbax writer subprocess failed (rc %d) for %s"
                        % (proc.returncode, p))
            else:
                still.append((proc, p))
        self._procs = still
        # unique staging file per save: back-to-back async saves to the
        # SAME checkpoint name (e.g. 'latest' every epoch) must not share
        # a staging path, or save N+1 truncates the file save N's child is
        # still reading (the child removes its own staging file when done)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fd, staging = tempfile.mkstemp(
            prefix=os.path.basename(path) + ".staging.", suffix=".pkl",
            dir=os.path.dirname(path) or ".")
        with os.fdopen(fd, "wb") as f:
            pickle.dump(jax.device_get(payload), f,
                        protocol=pickle.HIGHEST_PROTOCOL)
        pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        env = dict(os.environ)
        env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
        # drop any inherited cluster spec: the child must be single-process
        for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                  "JAX_PROCESS_ID", "XLA_FLAGS"):
            env.pop(k, None)
        proc = subprocess.Popen(
            [sys.executable, "-m",
             "domain_transfer_gan_tpu.utils._orbax_write", staging, path],
            env=env)
        if async_save:
            self._procs.append((proc, path))
            return
        if proc.wait() != 0:
            raise RuntimeError("orbax writer subprocess failed (rc %d) "
                               "for %s" % (proc.returncode, path))

    def restore(self, path: str, template):
        # restore against the template's structure/shapes/dtypes
        return self._sync.restore(
            os.path.abspath(path),
            args=self._ocp.args.StandardRestore(jax.device_get(template)))

    def wait(self) -> None:
        self._async.wait_until_finished()
        procs, self._procs = self._procs, []
        for proc, path in procs:
            if proc.wait() != 0:
                raise RuntimeError("orbax writer subprocess failed (rc %d) "
                                   "for %s" % (proc.returncode, path))
