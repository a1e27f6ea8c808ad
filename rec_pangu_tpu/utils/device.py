"""Device helpers (parity: rec_pangu/utils/gpu_utils.py).

* set_device     <- gpu_utils.py:22-48 — returns a jax.Device (TPU if
  available, else CPU); index -1 forces CPU.
* get_device_usage <- gpu_utils.py:7-19 (get_gpu_usage) — human-readable
  device memory string from PJRT memory_stats when the backend exposes them.
"""
from __future__ import annotations

import jax


def set_device(index: int = -1):
    if index >= 0:
        accel = [d for d in jax.devices() if d.platform != "cpu"]
        if accel:
            return accel[min(index, len(accel) - 1)]
    return jax.devices("cpu")[0]


def get_device_usage(device=None) -> str:
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return "n/a"
    used = stats.get("bytes_in_use", 0) / 1024**3
    limit = stats.get("bytes_limit", 0) / 1024**3
    return f"{used:.2f} G/{limit:.2f} G"
