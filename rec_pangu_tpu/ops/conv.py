"""Convolutional feature layers.

* CCPMConvLayer <- rec_pangu/models/ranking/ccpm.py:78-107 (ZeroPad along the
  field axis + Conv2d (kh,1) + KMaxPooling + Tanh stack)
* NextItNet residual dilated-causal-conv stack <- rec_pangu/models/layers/conv.py:11-209

Convs use flax NHWC layout ([B, field/seq, emb, C]) — the natural TPU layout —
instead of torch NCHW.
"""
from __future__ import annotations

from typing import Optional, Sequence

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


class ResBlockTwoMasked(nn.Module):
    """NextItNet residual block (conv.py:178-209): causal conv(d) -> LN ->
    relu -> causal conv(2d) -> LN -> relu -> +x.  Channel-last [B, L, C]."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = MaskedConv1d(self.channels, self.kernel_size, self.dilation)(x)
        y = nn.relu(nn.LayerNorm(1e-5)(y))
        y = MaskedConv1d(self.channels, self.kernel_size, 2 * self.dilation)(y)
        y = nn.relu(nn.LayerNorm(1e-5)(y))
        return y + x


class ResBlockOneMasked(nn.Module):
    """NextItNet bottleneck block (conv.py:61-100), pre-activation form:
    relu(LN1(x)) -> 1x1 conv -> relu(LN2) -> causal conv(d) -> relu(LN3) ->
    1x1 conv -> +x."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = self.channels // 2
        y = nn.relu(nn.LayerNorm(1e-5)(x))
        y = nn.Dense(mid, kernel_init=KERNEL_INIT)(y)
        y = nn.relu(nn.LayerNorm(1e-5)(y))
        y = MaskedConv1d(mid, self.kernel_size, self.dilation)(y)
        y = nn.relu(nn.LayerNorm(1e-5)(y))
        y = nn.Dense(self.channels, kernel_init=KERNEL_INIT)(y)
        return y + x


class NextItNetLayer(nn.Module):
    """Dilated causal conv stack (conv.py:11-59): mask padding to zero, run
    residual blocks, read the state at the last valid position."""

    channels: int
    dilations: Optional[Sequence[int]] = None
    one_masked: bool = False
    kernel_size: int = 3
    feat_drop: float = 0.0

    @nn.compact
    def __call__(self, emb_seqs: jnp.ndarray, lens: jnp.ndarray,
                 train: bool = True) -> jnp.ndarray:
        dilations = self.dilations or ((1, 2, 4) if self.one_masked else (1, 4))
        block = ResBlockOneMasked if self.one_masked else ResBlockTwoMasked
        B, L, C = emb_seqs.shape
        pad = jnp.arange(L)[None, :] >= lens[:, None]
        x = jnp.where(pad[..., None], 0.0, emb_seqs)
        if self.feat_drop > 0:
            x = nn.Dropout(self.feat_drop, deterministic=not train)(x)
        for d in dilations:
            x = block(self.channels, self.kernel_size, d)(x)
        idx = jnp.clip(lens - 1, 0, L - 1)
        return jnp.take_along_axis(x, idx[:, None, None].repeat(C, axis=2), axis=1)[:, 0]
