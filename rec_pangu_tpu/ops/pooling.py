"""Masked/k-max poolings (parity: rec_pangu/models/layers/sequence.py:13-86)."""
from __future__ import annotations

import jax.numpy as jnp
import jax


def masked_average_pooling(embedding_matrix: jnp.ndarray) -> jnp.ndarray:
    """[B, L, D] -> [B, D]; rows whose embedding is all-zero are padding."""
    summed = jnp.sum(embedding_matrix, axis=1)
    non_padding = jnp.sum((embedding_matrix != 0), axis=1)
    return summed / (non_padding.astype(summed.dtype) + 1e-16)


def masked_sum_pooling(embedding_matrix: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(embedding_matrix, axis=1)


def kmax_pooling(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """Top-k values along ``axis`` kept in their ORIGINAL order."""
    moved = jnp.moveaxis(x, axis, -1)
    _, idx = jax.lax.top_k(moved, k)
    idx = jnp.sort(idx, axis=-1)
    out = jnp.take_along_axis(moved, idx, axis=-1)
    return jnp.moveaxis(out, -1, axis)
