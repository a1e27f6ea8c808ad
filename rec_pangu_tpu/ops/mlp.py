"""Configurable MLP (parity: rec_pangu/models/layers/deep.py:11-92).

Per hidden layer: Dense -> [BatchNorm] -> activation -> [Dropout]; optional
output Dense + output activation.  Weight init matches the reference's
``reset_parameters`` (kaiming-normal on >=2D params, rec_pangu/models/base_model.py:42-59).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from .activations import Dice, get_activation
from .initializers import torch_linear_bias

KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class MLP(nn.Module):
    hidden_units: Sequence[int]
    output_dim: Optional[int] = None
    hidden_activations: Union[str, Sequence[str]] = "relu"
    output_activation: Optional[str] = None
    dropout_rates: Union[float, Sequence[float]] = 0.1
    batch_norm: bool = False
    use_bias: bool = True
    # None = the ranking family's convention (kaiming kernel + torch uniform
    # bias); the MTL family passes xavier_normal + zeros to match the
    # reference's _init_weights (base_model.py:28-39)
    kernel_init: Optional[object] = None
    bias_init: Optional[object] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        n = len(self.hidden_units)
        acts = (
            [self.hidden_activations] * n
            if isinstance(self.hidden_activations, str)
            else list(self.hidden_activations)
        )
        drops = (
            [self.dropout_rates] * n
            if not isinstance(self.dropout_rates, (list, tuple))
            else list(self.dropout_rates)
        )
        k_init = self.kernel_init or KERNEL_INIT
        for i, units in enumerate(self.hidden_units):
            x = nn.Dense(units, use_bias=self.use_bias, kernel_init=k_init,
                         bias_init=self.bias_init
                         or torch_linear_bias(x.shape[-1]))(x)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            if acts[i]:
                if isinstance(acts[i], str) and acts[i].lower() == "dice":
                    x = Dice()(x, train=train)
                else:
                    x = get_activation(acts[i])(x)
            if drops[i] and drops[i] > 0:
                x = nn.Dropout(rate=float(drops[i]), deterministic=not train)(x)
        if self.output_dim is not None:
            x = nn.Dense(self.output_dim, use_bias=self.use_bias,
                         kernel_init=k_init,
                         bias_init=self.bias_init
                         or torch_linear_bias(x.shape[-1]))(x)
        if self.output_activation is not None:
            x = get_activation(self.output_activation)(x)
        return x
