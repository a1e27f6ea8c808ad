"""Attention modules (parity: rec_pangu/models/layers/attention.py:12-101).

One implementation serves AutoInt (align_to='output', final relu, residual)
and the AITM info-transfer attention.  Heads are split correctly
([B, L, H, dh] transpose) — the reference's ``view(B*H, -1, dh)`` reshape
mixes positions for H>1 (SURVEY.md §7.1 "bugs not replicated"); for the
default H=1 configs the two are identical.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def scaled_dot_product_attention(q, k, v, scale: Optional[float] = None,
                                 mask: Optional[jnp.ndarray] = None,
                                 dropout: Optional[nn.Dropout] = None):
    """q,k,v: [..., L, dh] -> ([..., L, dh], attention weights).

    ``mask`` follows the codebase-wide convention: boolean True = KEEP (or an
    additive float mask).  -1e6 (finite) is used so fully-masked rows degrade
    to uniform attention instead of NaN.  ``dropout`` (an already-configured
    nn.Dropout) is applied to the attention probabilities, matching the
    reference's ScaledDotProductAttention (attention.py:26-30).
    """
    att = jnp.einsum("...ld,...md->...lm", q, k)
    if scale:
        att = att / scale
    if mask is not None:
        if mask.dtype == jnp.bool_:
            att = jnp.where(mask, att, -1e6)
        else:
            att = att + mask
    att = nn.softmax(att, axis=-1)
    if dropout is not None:
        att = dropout(att)
    out = jnp.einsum("...lm,...md->...ld", att, v)
    return out, att


class MultiHeadAttention(nn.Module):
    attention_dim: Optional[int] = None
    num_heads: int = 1
    dropout_rate: float = 0.0
    use_residual: bool = True
    use_scale: bool = False
    layer_norm: bool = False
    align_to: str = "input"
    final_relu: bool = True  # the reference always relus its output
    # None = kaiming (ranking family); AITM passes xavier_normal to match
    # its _init_weights convention (base_model.py:28-39)
    kernel_init: Optional[object] = None

    @nn.compact
    def __call__(self, query, key, value, mask=None, train: bool = True):
        input_dim = query.shape[-1]
        dh = self.attention_dim or input_dim // self.num_heads
        output_dim = self.num_heads * dh
        scale = dh**0.5 if self.use_scale else None

        k_init = self.kernel_init or KERNEL_INIT

        def proj(x, name):
            return nn.Dense(output_dim, use_bias=False, kernel_init=k_init,
                            name=name)(x)

        B, L = query.shape[0], query.shape[1]
        q = proj(query, "W_q").reshape(B, L, self.num_heads, dh).transpose(0, 2, 1, 3)
        k = proj(key, "W_k").reshape(B, -1, self.num_heads, dh).transpose(0, 2, 1, 3)
        v = proj(value, "W_v").reshape(B, -1, self.num_heads, dh).transpose(0, 2, 1, 3)
        if mask is not None and mask.ndim == 3:
            mask = mask[:, None]
        # reference applies dropout twice: to the attention probabilities
        # (attention.py:59 via ScaledDotProductAttention) AND to the output
        att_drop = (nn.Dropout(self.dropout_rate, deterministic=not train)
                    if self.dropout_rate > 0 else None)
        out, att = scaled_dot_product_attention(q, k, v, scale, mask,
                                                dropout=att_drop)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, output_dim)

        residual = query
        if input_dim != output_dim:
            if self.align_to == "output":  # AutoInt style: project residual up
                residual = nn.Dense(output_dim, use_bias=False,
                                    kernel_init=k_init, name="W_res")(residual)
            else:  # transformer style: project output back down
                out = nn.Dense(input_dim, use_bias=False,
                               kernel_init=k_init, name="W_res")(out)
        if self.dropout_rate > 0:
            out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        if self.use_residual:
            out = out + residual
        if self.layer_norm:
            out = nn.LayerNorm(1e-5)(out)  # torch default eps (attention.py:60)
        if self.final_relu:
            out = nn.relu(out)
        return out, att


class MultiHeadSelfAttention(MultiHeadAttention):
    @nn.compact
    def __call__(self, x, train: bool = True):  # type: ignore[override]
        out, _ = super().__call__(x, x, x, train=train)
        return out
