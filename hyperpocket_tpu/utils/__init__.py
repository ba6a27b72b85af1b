"""Observability and misc helpers: logging, plotting, Telegram."""

from hyperpocket_tpu.utils.logging_setup import logging_setup, seed_setup
from hyperpocket_tpu.utils.telegram import TelegramLogger

__all__ = ["logging_setup", "seed_setup", "TelegramLogger"]
