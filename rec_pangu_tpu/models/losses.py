"""Loss registry — replaces the reference's ``eval(loss_fun)`` idiom
(rec_pangu/models/ranking/deepfm.py:31) with a lookup table.  Legacy strings
like ``'torch.nn.BCELoss()'`` are accepted and mapped for API compatibility.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

EPS = 1e-7


def bce_loss(pred: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy on probabilities (torch.nn.BCELoss parity)."""
    p = jnp.clip(pred.reshape(label.shape), EPS, 1.0 - EPS)
    return -jnp.mean(label * jnp.log(p) + (1.0 - label) * jnp.log(1.0 - p))


def mse_loss(pred: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred.reshape(label.shape) - label) ** 2)


_LOSSES = {
    "bce": bce_loss,
    "bceloss": bce_loss,
    "torch.nn.bceloss()": bce_loss,
    "mse": mse_loss,
    "torch.nn.mseloss()": mse_loss,
}


def get_loss_fn(name: str) -> Callable:
    if callable(name):
        return name
    key = str(name).lower().strip()
    if key not in _LOSSES:
        raise ValueError(f"Unknown loss: {name!r}; registered: {sorted(_LOSSES)}")
    return _LOSSES[key]
