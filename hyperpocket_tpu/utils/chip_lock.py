"""Single-client lock for the axon TPU tunnel.

The axon backend reliably serves ONE client at a time: a long-running
client can wedge permanently when another axon client exits while it has
fetches in flight, and killing the wedged client can leave the backend
returning ``UNAVAILABLE`` to new clients for many minutes (observed twice
in round 3 — CLAUDE.md "CONCURRENT-CLIENT WEDGE"). This module codifies
the one-client-at-a-time policy so the framework's chip entry points (CLI
training/experiments, ``bench.py``) serialize on a pid lockfile instead of
relying on operator discipline.

Semantics:

- The lock is a pidfile created with ``O_CREAT | O_EXCL`` (atomic on every
  POSIX filesystem). Stale locks — holder pid no longer alive — are
  reclaimed automatically.
- The lock only engages when the process is actually pointed at a chip
  backend (``JAX_PLATFORMS`` / ``jax.config.jax_platforms`` mentions
  ``axon`` or ``tpu``). CPU runs (the test suite, the multichip dryrun)
  skip it entirely, so parallel CPU processes never serialize.
- ``HPCD_CHIP_LOCK=0`` disables the lock outright (escape hatch for an
  operator intentionally multiplexing the chip).

This is host-local by design: the axon tunnel terminates on this host, so
every potential client shares ``/tmp``.
"""

from __future__ import annotations

import errno
import os
import sys
import time
from contextlib import contextmanager
from typing import Iterator, Optional

DEFAULT_LOCK_PATH = "/tmp/hpcd_chip.lock"
DEFAULT_TIMEOUT_S = 3600.0
_POLL_S = 5.0


def _platform_is_chip() -> bool:
    """True when this process targets the axon/TPU backend.

    Reads only configuration (env + ``jax.config``) — never initializes the
    jax backend, since gating backend initialization is the whole point.
    """
    if os.environ.get("HPCD_CHIP_LOCK", "1") == "0":
        return False
    plats = os.environ.get("JAX_PLATFORMS", "")
    try:
        import jax

        cfg = jax.config.jax_platforms  # honours jax.config.update overrides
        if cfg:
            plats = cfg
    except Exception:  # pragma: no cover - jax always importable here
        pass
    plats = (plats or "").lower()
    return "axon" in plats or "tpu" in plats


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:  # pragma: no cover - exists, owned by another uid
        return True
    return True


def _try_acquire(path: str) -> bool:
    """One atomic acquisition attempt; reclaims stale locks."""
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except FileExistsError:
        try:
            with open(path, "r") as f:
                holder = int(f.read().strip() or "0")
        except (OSError, ValueError):
            holder = 0
        if holder and _pid_alive(holder):
            return False
        # Stale (holder dead or unreadable): reclaim. The unlink+retry pair
        # is racy only against other reclaimers, and O_EXCL re-arbitrates.
        try:
            os.unlink(path)
        except OSError as e:  # pragma: no cover - lost the reclaim race
            if e.errno != errno.ENOENT:
                return False
        return _try_acquire_once_after_reclaim(path)
    with os.fdopen(fd, "w") as f:
        f.write(str(os.getpid()))
    return True


def _try_acquire_once_after_reclaim(path: str) -> bool:
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as f:
        f.write(str(os.getpid()))
    return True


@contextmanager
def chip_lock(
    timeout_s: Optional[float] = None,
    path: str = DEFAULT_LOCK_PATH,
    poll_s: float = _POLL_S,
    force: bool = False,
) -> Iterator[None]:
    """Hold the single-client chip lock for the duration of the block.

    No-op unless the process targets the axon/TPU backend (or ``force``,
    used by tests). Raises ``TimeoutError`` naming the holder pid if the
    lock cannot be acquired within ``timeout_s`` (default
    ``HPCD_CHIP_LOCK_TIMEOUT_S`` or 3600 s).
    """
    if not (force or _platform_is_chip()):
        yield
        return
    if timeout_s is None:
        timeout_s = float(
            os.environ.get("HPCD_CHIP_LOCK_TIMEOUT_S", DEFAULT_TIMEOUT_S)
        )
    deadline = time.monotonic() + timeout_s
    warned = False
    while not _try_acquire(path):
        if not warned:
            print(
                f"chip_lock: waiting on {path} (held by a live client); "
                f"timeout {timeout_s:.0f}s",
                file=sys.stderr,
                flush=True,
            )
            warned = True
        if time.monotonic() >= deadline:
            try:
                with open(path, "r") as f:
                    holder = f.read().strip()
            except OSError:
                holder = "?"
            raise TimeoutError(
                f"chip lock {path} held by pid {holder} for >{timeout_s:.0f}s; "
                "one axon client at a time (set HPCD_CHIP_LOCK=0 to override)"
            )
        time.sleep(poll_s)
    try:
        yield
    finally:
        # Only the owner removes the file; guard against a reclaimer having
        # already replaced it after e.g. a long GC pause. Catch everything:
        # this can run during interpreter shutdown (holder crashed with the
        # generator live), where even builtins may already be torn down —
        # leaving the file is fine, the next acquirer reclaims it as stale.
        try:
            with open(path, "r") as f:
                if f.read().strip() == str(os.getpid()):
                    os.unlink(path)
        except Exception:
            pass
