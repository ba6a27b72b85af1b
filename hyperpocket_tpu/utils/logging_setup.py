"""Session setup: seeding and file+console logging.

Mirrors core/setup.py:12-54: DEBUG-level log file ``log.txt`` in the results
dir plus an INFO console handler; ``seed_setup`` seeds python/numpy (JAX RNG
is explicit-key based, so the training loop derives all device randomness
from ``jax.random.key(seed)`` — full determinism without global state).
"""

from __future__ import annotations

import logging
import random
from os import makedirs
from os.path import exists, join

import numpy as np


def seed_setup(seed: int = 0) -> int:
    random.seed(seed)
    np.random.seed(seed)
    return seed


def logging_setup(log_dir: str) -> None:
    makedirs(log_dir, exist_ok=True)
    logpath = join(log_dir, "log.txt")
    filemode = "a" if exists(logpath) else "w"
    logging.basicConfig(
        level=logging.DEBUG,
        format="%(asctime)s %(message)s",
        datefmt="%m-%d %H:%M:%S",
        filename=logpath,
        filemode=filemode,
        force=True,
    )
    console = logging.StreamHandler()
    console.setLevel(logging.INFO)
    console.setFormatter(logging.Formatter("%(asctime)s: %(levelname)-8s %(message)s"))
    logging.getLogger("").addHandler(console)
    # The DEBUG root level is for OUR loggers (reference core/setup.py:33-41
    # writes a DEBUG log.txt); jax's internal debug stream (per-dispatch
    # cache-key hashes — hundreds of lines per compile) would swamp the file
    # and burn single-core host time on a 400-epoch run. Cap libraries at
    # INFO; the app's hyperpocket_tpu.* loggers keep full DEBUG.
    for noisy in ("jax", "orbax", "absl", "urllib3"):
        logging.getLogger(noisy).setLevel(logging.INFO)
