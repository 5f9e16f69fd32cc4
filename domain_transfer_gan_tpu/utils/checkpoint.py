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
    """Serializes checkpoint writes on one long-lived background thread.

    save() is O(device_get): it snapshots to host and enqueues; the writer
    thread serializes + writes in submission order, so back-to-back saves
    never block the train loop on disk (the previous implementation joined
    the in-flight write under a lock — a full hidden sync).  wait() blocks
    until all pending writes are durable (call before process exit or
    before loading what was saved).

    A failed background write is NOT silent: the exception is captured and
    re-raised to the caller on the next save() or wait() — a checkpoint
    that looked saved but wasn't is worse than a crashed run.
    """

    def __init__(self):
        import queue as _queue
        self._queue: "_queue.Queue" = _queue.Queue()
        self._error: Optional[BaseException] = None
        self._error_lock = threading.Lock()
        self._thread: Optional[threading.Thread] = None

    def _writer(self):
        while True:
            item = self._queue.get()
            try:
                if item is None:
                    return
                path, host_payload = item
                data = serialization.to_bytes(host_payload)
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(data)
                os.replace(tmp, path)  # atomic publish
            except BaseException as e:  # propagate via save()/wait()
                with self._error_lock:
                    if self._error is None:
                        self._error = e
            finally:
                self._queue.task_done()

    def _raise_pending_error(self) -> None:
        with self._error_lock:
            err, self._error = self._error, None
        if err is not None:
            raise RuntimeError("async checkpoint write failed") from err

    def save(self, path: str, payload) -> None:
        self._raise_pending_error()
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(target=self._writer, daemon=True)
            self._thread.start()
        self._queue.put((path, jax.device_get(payload)))

    def wait(self) -> None:
        self._queue.join()
        self._raise_pending_error()


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
        for proc, p, stg in self._procs:
            if p == path and proc.poll() is None:
                if proc.wait() != 0:
                    self._unlink_quiet(stg)
                    raise RuntimeError(
                        "orbax writer subprocess failed (rc %d) for %s"
                        % (proc.returncode, p))
            else:
                still.append((proc, p, stg))
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
            self._procs.append((proc, path, staging))
            return
        if proc.wait() != 0:
            # the child unlinks staging only on success — don't leak the
            # (potentially multi-GB) pickle on failure
            self._unlink_quiet(staging)
            raise RuntimeError("orbax writer subprocess failed (rc %d) "
                               "for %s" % (proc.returncode, path))

    @staticmethod
    def _unlink_quiet(path: str) -> None:
        try:
            os.remove(path)
        except OSError:
            pass

    def restore(self, path: str, template):
        # restore against the template's structure/shapes/dtypes
        return self._sync.restore(
            os.path.abspath(path),
            args=self._ocp.args.StandardRestore(jax.device_get(template)))

    def metadata(self, path: str):
        """On-disk tree structure (dict with shape/dtype leaves) — lets a
        caller probe a checkpoint's layout (ema present? pool shapes?)
        without a trial restore."""
        return self._sync.metadata(os.path.abspath(path))

    def wait(self) -> None:
        self._async.wait_until_finished()
        procs, self._procs = self._procs, []
        failed = []
        for proc, path, staging in procs:
            if proc.wait() != 0:
                self._unlink_quiet(staging)
                failed.append((proc.returncode, path))
        if failed:
            raise RuntimeError("orbax writer subprocess(es) failed: %s"
                               % ", ".join("rc %d for %s" % f
                                           for f in failed))
