"""Optimizer + LR-schedule construction.

Parity: trainer owns an Adam optimizer with torch defaults
(rec_pangu/trainer.py:75 — betas (0.9, 0.999), eps 1e-8, weight_decay 0) and
optional per-EPOCH schedulers StepLR / ExponentialLR / CosineAnnealingLR
(rec_pangu/trainer.py:79-88).  Schedules here are functions of the global step
that decay at epoch boundaries, so they compose with a single jitted train
step via ``optax.scale_by_schedule``-style injection.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import optax


def make_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    lr_scheduler_type: str = "",
    scheduler_params: Optional[dict] = None,
) -> Callable[[int], float]:
    p = dict(scheduler_params or {})
    spe = max(1, int(steps_per_epoch))

    if lr_scheduler_type == "":
        return lambda step: base_lr
    if lr_scheduler_type == "StepLR":
        step_size = int(p.get("step_size", 1))
        gamma = float(p.get("gamma", 0.1))
        return lambda step: base_lr * gamma ** ((step // spe) // step_size)
    if lr_scheduler_type == "ExponentialLR":
        gamma = float(p.get("gamma", 0.9))
        return lambda step: base_lr * gamma ** (step // spe)
    if lr_scheduler_type == "CosineAnnealingLR":
        t_max = int(p.get("T_max", 10))
        eta_min = float(p.get("eta_min", 0.0))
        return lambda step: eta_min + (base_lr - eta_min) * (
            1 + math.cos(math.pi * (step // spe) / t_max)
        ) / 2
    raise ValueError(f"Unknown scheduler type: {lr_scheduler_type}")


def make_optimizer(
    lr: float = 1e-3,
    steps_per_epoch: int = 1,
    lr_scheduler_type: str = "",
    scheduler_params: Optional[dict] = None,
    optimizer: str = "adam",
) -> optax.GradientTransformation:
    schedule = make_lr_schedule(lr, steps_per_epoch, lr_scheduler_type, scheduler_params)
    name = optimizer.lower()
    if name == "adam":
        return optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    if name == "adamw":
        return optax.adamw(schedule)
    if name == "sgd":
        return optax.sgd(schedule)
    if name == "adagrad":
        return optax.adagrad(schedule)
    raise ValueError(f"Unknown optimizer: {optimizer}")
