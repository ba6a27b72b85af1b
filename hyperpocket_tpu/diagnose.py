"""Alias so the runbook command is short: ``python -m hyperpocket_tpu.diagnose``.

Implementation lives in :mod:`hyperpocket_tpu.utils.diagnose`.
"""

from hyperpocket_tpu.utils.diagnose import lock_holder, main, run_probe

__all__ = ["lock_holder", "main", "run_probe"]

if __name__ == "__main__":
    import sys

    sys.exit(main())
