"""CLI entry: ``python -m hyperpocket_tpu.cli --config settings/<x>.json``.

Mode switch mirrors the reference's ``core/main.py:24-190``: ``training``
drives the epoch loop; ``experiments`` restores a checkpoint and runs each
experiment whose config has ``execute: true``.
"""

from __future__ import annotations

import logging
from os import makedirs
from os.path import join

import jax

from hyperpocket_tpu.train.config import get_results_dir_path, parse_config


def main(config: dict) -> None:
    from hyperpocket_tpu.utils.chip_lock import chip_lock
    from hyperpocket_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(config.get("setup", {}).get("compile_cache"))
    # One axon client at a time: a concurrent client exiting mid-fetch can
    # wedge the remote TPU (utils/chip_lock.py). No-op on CPU backends.
    with chip_lock():
        _dispatch(config)


def _dispatch(config: dict) -> None:
    run_mode = config["mode"]
    if run_mode == "training":
        from hyperpocket_tpu.train.trainer import Trainer

        tg_logger = None
        if config.get("telegram_logger", {}).get("enable"):
            from hyperpocket_tpu.utils.telegram import TelegramLogger

            tg_logger = TelegramLogger.get_logger(config["telegram_logger"])
        trainer = Trainer(config)
        trainer.log.info("Current mode training; devices: %s", jax.devices())
        trainer.run(tg_logger=tg_logger)
    elif run_mode == "experiments":
        from hyperpocket_tpu.eval.experiments import run_experiments

        result_dir = get_results_dir_path(config, "experiments")
        makedirs(result_dir, exist_ok=True)
        from hyperpocket_tpu.utils.logging_setup import logging_setup

        logging_setup(result_dir)
        logging.getLogger("hyperpocket_tpu").info("Current mode experiments")
        run_experiments(config, result_dir)
    else:
        raise ValueError("mode should be `training` or `experiments`")


def _entry() -> None:
    """console_scripts entry point."""
    main(parse_config())


if __name__ == "__main__":
    _entry()
