"""Process-local orbax checkpoint writer (multi-host save helper).

Orbax's NumpyHandler only writes array data on global process 0
(orbax _src/serialization/type_handlers.py, ``_background_serialize``:
``if multihost.process_index() == 0``), so in a multi-host run a rank > 0
process can never durably write a host-local numpy payload through orbax
in-process — ``MultiprocessingOptions(primary_host=None)`` notwithstanding
(the rank-1 directory finalizes with no array data and restore fails with
"No structure could be identified").  Multi-host saves therefore run THIS
module in a fresh single-process interpreter, where
``jax.process_count() == 1`` and orbax behaves like any single-host save.
``utils.checkpoint.OrbaxCheckpointer`` dispatches here; payloads are pure
host numpy by then (models.api gathers before dispatch).

Usage: ``python -m domain_transfer_gan_tpu.utils._orbax_write STAGING OUT``
where STAGING is a pickle of the pure-numpy payload tree.  STAGING is
deleted after a successful write.
"""

from __future__ import annotations

import os
import pickle
import sys


def main(staging: str, out: str) -> None:
    import jax
    # IO helper: never let platform-env rewrites hand this process a TPU
    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    with open(staging, "rb") as f:
        payload = pickle.load(f)
    ocp.Checkpointer(ocp.StandardCheckpointHandler()).save(
        out, args=ocp.args.StandardSave(payload), force=True)
    os.remove(staging)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
