"""Multi-host (multi-slice) initialisation.

The reference is single-process (SURVEY.md §2); within one TPU slice this
framework needs no process group at all — the Mesh + XLA collectives over ICI
cover it. For multi-host pods / multi-slice DCN jobs, call
``initialize_multihost()`` once at program start (before any jax call); it is
a thin, idempotent wrapper over ``jax.distributed.initialize`` that reads the
standard coordinator env vars and no-ops in single-process runs.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("hyperpocket_tpu.distributed")

_initialized = False


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Initialise jax.distributed when running multi-process; returns True if done.

    Arguments default to the ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES``
    / ``JAX_PROCESS_ID`` env vars (and TPU pod metadata when on Cloud TPU,
    where ``jax.distributed.initialize()`` autodetects everything).
    """
    global _initialized
    if _initialized:
        return True
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if coordinator_address is None and num_processes is None:
        log.debug("single-process run; skipping jax.distributed.initialize")
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    log.info("jax.distributed initialised: process %s/%s", jax.process_index(),
             jax.process_count())
    return True


def _int_env(name: str) -> int | None:
    val = os.environ.get(name)
    return int(val) if val is not None else None


def local_batch_slice(global_batch: int) -> slice:
    """This host's shard of a globally-sharded batch (per-host data loading)."""
    import jax

    per_host = global_batch // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)
