"""Logger + optional wandb shim.

The reference logs via loguru and optionally wandb (rec_pangu/trainer.py:15,
46-49).  Neither is guaranteed in this environment, so: loguru-style output on
stdlib logging, and a no-op wandb stand-in when the real package is missing.
"""
from __future__ import annotations

import logging
import sys

logger = logging.getLogger("rec_pangu_tpu")
if not logger.handlers:
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        logging.Formatter(
            "%(asctime)s | %(levelname)s | %(name)s - %(message)s", "%Y-%m-%d %H:%M:%S"
        )
    )
    logger.addHandler(handler)
    logger.setLevel(logging.INFO)

try:  # pragma: no cover - depends on environment
    import wandb  # type: ignore

    HAS_WANDB = True
except ImportError:  # pragma: no cover
    HAS_WANDB = False

    class _NoopWandb:
        def init(self, *a, **k):
            return None

        def log(self, *a, **k):
            return None

        def finish(self, *a, **k):
            return None

    wandb = _NoopWandb()  # type: ignore
