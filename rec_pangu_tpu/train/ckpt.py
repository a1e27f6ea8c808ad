"""Checkpointing.

The reference saves bare ``state_dict`` files per epoch plus a 'best' and a
final bundle with the enc_dict (rec_pangu/trainer.py:124-164); loading is a
manual ``torch.load`` + ``load_state_dict``.  Here a checkpoint is one pickle
of numpy-ified pytrees ``{params, batch_stats, opt_state?, enc_dict, config,
step}`` — self-contained for inference (enc_dict travels with the weights) and
resumable (optimizer state included, which the reference never saved).
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str,
    params: Any,
    batch_stats: Any = None,
    opt_state: Any = None,
    enc_dict: Optional[dict] = None,
    config: Optional[dict] = None,
    step: int = 0,
) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {
        "params": _to_numpy(params),
        "batch_stats": _to_numpy(batch_stats) if batch_stats is not None else None,
        "opt_state": _to_numpy(opt_state) if opt_state is not None else None,
        "enc_dict": enc_dict,
        "config": config,
        "step": int(step),
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)
