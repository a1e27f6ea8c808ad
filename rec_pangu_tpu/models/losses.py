"""Loss registry — replaces the reference's ``eval(loss_fun)`` idiom
(rec_pangu/models/ranking/deepfm.py:31) with a lookup table.  Legacy strings
like ``'torch.nn.BCELoss()'`` are accepted and mapped for API compatibility.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

EPS = 1e-7


def bce_loss(pred: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy on probabilities (torch.nn.BCELoss parity).

    The clip is STRAIGHT-THROUGH (value clipped, gradient of identity): a
    plain ``jnp.clip`` zeroes the gradient once a prediction saturates past
    [eps, 1-eps], silencing exactly the confidently-wrong samples — torch's
    BCELoss instead clamps the backward denominator and keeps a large finite
    gradient (aten binary_cross_entropy: grad = (p-y)/max(p(1-p), 1e-12)).
    With the upstream sigmoid jacobian p(1-p), the straight-through form
    recovers the stable (p - y) logit gradient at saturation."""
    p_raw = pred.reshape(label.shape)
    p_clip = jnp.clip(p_raw, EPS, 1.0 - EPS)
    p = p_raw + jax.lax.stop_gradient(p_clip - p_raw)
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
