"""Activation resolver + Dice (parity: rec_pangu/models/layers/activation.py:10-59)."""
from __future__ import annotations

from typing import Callable, Union

import flax.linen as nn
import jax.numpy as jnp


class Dice(nn.Module):
    """Dice activation: ``p = sigmoid(BN(x)); out = p*x + (1-p)*alpha*x``.

    Matches rec_pangu/models/layers/activation.py:10-33 (BatchNorm with
    affine=False, eps=1e-9, torch momentum 0.01 -> flax momentum 0.99).
    """

    eps: float = 1e-9

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        bn = nn.BatchNorm(
            use_running_average=not train,
            use_bias=False,
            use_scale=False,
            momentum=0.99,
            epsilon=self.eps,
        )
        alpha = self.param("alpha", nn.initializers.zeros, (x.shape[-1],))
        p = nn.sigmoid(bn(x))
        return p * x + (1.0 - p) * alpha * x


_ACTIVATIONS = {
    "relu": nn.relu,
    "sigmoid": nn.sigmoid,
    "tanh": nn.tanh,
    "gelu": nn.gelu,
    "swish": nn.swish,
    "silu": nn.silu,
    "leakyrelu": nn.leaky_relu,
    "leaky_relu": nn.leaky_relu,
    "elu": nn.elu,
    "softplus": nn.softplus,
    "prelu": nn.leaky_relu,  # parameter-free approximation; PReLU users pass a module
    "identity": lambda x: x,
    "linear": lambda x: x,
    "none": lambda x: x,
}


def get_activation(activation: Union[str, Callable]) -> Callable:
    """String -> jnp activation fn (Dice is handled by callers needing params)."""
    if callable(activation):
        return activation
    name = activation.lower()
    if name == "dice":
        raise ValueError("Dice has parameters; instantiate ops.Dice directly")
    if name not in _ACTIVATIONS:
        raise ValueError(f"Unknown activation: {activation!r}")
    return _ACTIVATIONS[name]
