"""Training runtime: config, optimizers, checkpointing, epoch driver."""

from hyperpocket_tpu.train.losses import kld_loss, reconstruction_loss
from hyperpocket_tpu.train.optim import make_optimizer, make_lr_schedule
from hyperpocket_tpu.train.checkpoint import (
    save_tree,
    load_tree,
    find_latest_epoch,
    resolve_restore_epoch,
)
from hyperpocket_tpu.train.trainer import Trainer

__all__ = [
    "kld_loss",
    "reconstruction_loss",
    "make_optimizer",
    "make_lr_schedule",
    "save_tree",
    "load_tree",
    "find_latest_epoch",
    "resolve_restore_epoch",
    "Trainer",
]
