"""Shared multi-task pieces.

* TaskTower <- the setattr-loop towers every MTL model builds
  (rec_pangu/models/multi_task/sharebottom.py:40-50, mmoe.py:49-61):
  per layer Linear -> BatchNorm -> Dropout (no activation in the reference),
  then Linear(1) -> sigmoid.
* multi_task_bce <- the mean-weighted per-task BCE (sharebottom.py:84-92).

The reference's MMOE/MLMMOE keep their gates in plain Python lists so they are
never registered/trained (mmoe.py:43-48 — a bug per SURVEY.md §7.1); here all
gates are proper parameters.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..losses import bce_loss

# the MTL family initializes every Linear with xavier_normal + zero bias
# (reference _init_weights, base_model.py:28-39 — applied by all six MTL
# models instead of the ranking family's kaiming reset_parameters)
XAVIER = nn.initializers.xavier_normal()


class TaskTower(nn.Module):
    hidden_dim: Sequence[int] = (128, 64)
    dropouts: Sequence[float] = (0.2, 0.2)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        for units, drop in zip(self.hidden_dim, self.dropouts):
            x = nn.Dense(units, kernel_init=XAVIER,
                         bias_init=nn.initializers.zeros)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            if drop > 0:
                x = nn.Dropout(drop, deterministic=not train)(x)
        x = nn.Dense(1, kernel_init=XAVIER,
                     bias_init=nn.initializers.zeros)(x)
        return nn.sigmoid(x)[:, 0]


def multi_task_bce(task_preds, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean-weighted BCE over tasks; labels [B, T]."""
    T = len(task_preds)
    loss = 0.0
    for i, pred in enumerate(task_preds):
        loss = loss + bce_loss(pred, labels[:, i]) / T
    return loss
