"""Convolutional feature layers.

* CCPMConvLayer <- rec_pangu/models/ranking/ccpm.py:78-107 (ZeroPad along the
  field axis + Conv2d (kh,1) + KMaxPooling + Tanh stack)
* NextItNet residual dilated-causal-conv stack <- rec_pangu/models/layers/conv.py:11-209

Convs use flax NHWC layout ([B, field/seq, emb, C]) — the natural TPU layout —
instead of torch NCHW.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .pooling import kmax_pooling

KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class CCPMConvLayer(nn.Module):
    """Input [B, F, D] -> stacked conv/kmax/tanh -> [B, 3, D, channels[-1]]."""

    num_fields: int
    channels: Sequence[int] = (3,)
    kernel_heights: Sequence[int] = (3,)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x[..., None]  # [B, F, D, 1]  (NHWC: field=H, emb=W)
        layers = len(self.channels)
        for i, (ch, kh) in enumerate(zip(self.channels, self.kernel_heights), start=1):
            x = jnp.pad(x, ((0, 0), (kh - 1, kh - 1), (0, 0), (0, 0)))
            x = nn.Conv(ch, kernel_size=(kh, 1), padding="VALID",
                        kernel_init=KERNEL_INIT)(x)
            if i < layers:
                k = max(3, int((1 - pow(float(i) / layers, layers - i)) * self.num_fields))
            else:
                k = 3
            x = kmax_pooling(x, k, axis=1)
            x = nn.tanh(x)
        return x


class MaskedConv1d(nn.Module):
    """Causal dilated 1-D conv over [B, L, C]: left-pad so output only sees
    the past (parity: rec_pangu/models/layers/conv.py MaskedConv1d)."""

    features: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel_size - 1) * self.dilation
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        return nn.Conv(self.features, kernel_size=(self.kernel_size,),
                       kernel_dilation=(self.dilation,), padding="VALID",
                       kernel_init=KERNEL_INIT)(x)


class NextItNetResBlock(nn.Module):
    """'b' residual block: LN -> relu -> causal conv (2 halved-channel convs)."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm()(x)
        h = nn.relu(h)
        h = MaskedConv1d(self.channels // 2, self.kernel_size, self.dilation)(h)
        h = nn.LayerNorm()(h)
        h = nn.relu(h)
        h = MaskedConv1d(self.channels, self.kernel_size, self.dilation * 2)(h)
        return x + h
