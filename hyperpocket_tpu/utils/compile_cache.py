"""Persistent JAX/XLA compilation cache.

Mosaic compile times for the Pallas kernels are erratic over the axon device
tunnel (the same EMD kernel has been observed to take 17-290 s on different
runs), and a cold training session pays ~20-40 s per distinct jitted shape.
The persistent cache keys serialized executables by HLO hash + backend, so a
second session with the same shapes loads every kernel from disk instead of
recompiling — this removes both the cold-start cost and the compile-time
variance on repeat runs.

The reference has no analogue (torch eager has no compile step); this is a
TPU-framework concern, enabled by default everywhere a session starts
(Trainer, experiments mode, bench). Opt out with HPCD_COMPILE_CACHE=0 or
point HPCD_COMPILE_CACHE at a different directory.
"""

from __future__ import annotations

import logging
import os

# default inside the repo/install tree (kept out of git via .gitignore)
_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)
_enabled_dir: str | None = None


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache.

    Returns the active cache directory, or None when disabled
    (``HPCD_COMPILE_CACHE=0``) or unavailable on this backend.
    """
    global _enabled_dir
    env = os.environ.get("HPCD_COMPILE_CACHE")
    if env == "0":
        return None
    if _enabled_dir is not None:
        if cache_dir is not None and cache_dir != _enabled_dir:
            # first-call-wins is deliberate (re-pointing after executables
            # were cached would split the cache), but it must be VISIBLE:
            # a Trainer's explicit setup.compile_cache losing to an earlier
            # bench/CLI default was silent before
            logging.getLogger("hyperpocket_tpu").warning(
                "compile cache already active at %s; ignoring requested %s",
                _enabled_dir, cache_dir,
            )
        return _enabled_dir
    path = cache_dir or env or _DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # cache every executable, however small/fast to compile — the axon
        # tunnel makes even trivial compiles cost a round-trip
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as exc:  # backend without serialization support, RO fs
        logging.getLogger("hyperpocket_tpu").debug("compile cache unavailable: %s", exc)
        return None
    _enabled_dir = path
    return path
