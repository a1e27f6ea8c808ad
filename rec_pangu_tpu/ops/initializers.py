"""Initializers matching the reference's effective init.

Every reference model constructor ends with ``self.reset_parameters()``
(rec_pangu/models/base_model.py:42-59), which kaiming-normal-initializes every
parameter with ndim >= 2 — OVERWRITING the ``torch.rand``/``torch.randn``/
0.01-normal inits written in the constructors.  The effective init is
therefore ``torch.nn.init.kaiming_normal_``, whose fan-in convention treats
``shape[1] * prod(shape[2:])`` as fan-in (torch stores Linear weights
[out, in]; for raw ``nn.Parameter`` tensors laid out [in, out] this makes the
*output* dim the "fan-in" — quirky, but it is what the reference executes).

* ``flax.linen.Dense`` kernels [in, out]: flax's
  ``variance_scaling(2.0, "fan_in", "normal")`` already equals torch kaiming
  on a Linear weight, nothing to do.
* raw ``self.param`` tensors: use :func:`torch_kaiming_normal` to reproduce
  torch's fan computation on the tensor's own shape.

1-D params are skipped by ``reset_parameters`` and keep their constructor
init — model files handle those individually.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_linear_bias(fan_in: int):
    """torch nn.Linear's DEFAULT bias init: uniform(-1/sqrt(fan_in),
    1/sqrt(fan_in)).  ``reset_parameters`` skips 1-D params, so every
    reference Linear-with-bias keeps this — flax's zeros default was the
    one remaining init divergence after the kaiming table fix."""
    bound = 1.0 / math.sqrt(max(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_kaiming_normal():
    """std = sqrt(2 / fan_in) with torch's fan_in = shape[1] * prod(shape[2:])."""

    def init(key, shape, dtype=jnp.float32):
        if len(shape) < 2:
            raise ValueError("torch_kaiming_normal is for >=2D params; "
                             "reset_parameters skips 1-D tensors")
        fan_in = shape[1] * int(math.prod(shape[2:]))
        std = math.sqrt(2.0 / fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init
