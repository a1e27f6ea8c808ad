"""Version check (parity: rec_pangu/utils/check_version.py:19-44).

Queries PyPI for a newer release on a daemon thread; every failure is
swallowed (this environment typically has no egress).  Disabled unless
REC_PANGU_TPU_CHECK_VERSION=1 to avoid useless network attempts.
"""
from __future__ import annotations

import os
import threading

from .logging import logger


def _check(version: str) -> None:
    try:  # pragma: no cover - network dependent
        import json
        import urllib.request

        with urllib.request.urlopen(
            "https://pypi.org/pypi/rec-pangu-tpu/json", timeout=3
        ) as resp:
            latest = json.load(resp)["info"]["version"]
        if latest != version:
            logger.info(f"A newer version {latest} is available (installed {version})")
    except Exception:
        pass


def check_version(version: str) -> None:
    if os.environ.get("REC_PANGU_TPU_CHECK_VERSION") != "1":
        return
    threading.Thread(target=_check, args=(version,), daemon=True).start()
