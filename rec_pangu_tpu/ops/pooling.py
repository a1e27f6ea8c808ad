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
    """Top-k values along ``axis`` kept in their ORIGINAL order.

    Gather-free formulation: per-element ``take_along_axis`` is row-serial
    on TPU (~20 ns/element — 371 ms for CCPM's 1M x 31 pooling at the bench
    shape, 100x the whole rest of the step).  Instead: threshold at the k-th
    largest value (``top_k`` VALUES only — cheap), mark the selected
    positions (ties broken toward earlier positions, matching a stable
    top-k), compute each selected element's output slot as a running count,
    and emit the k outputs as masked sums — pure vectorized compares/adds,
    ~2 ms at the same shape."""
    moved = jnp.moveaxis(x, axis, -1)
    n = moved.shape[-1]
    if k >= n:
        return x
    kth = jax.lax.top_k(moved, k)[0][..., -1:]          # k-th largest value
    gt = moved > kth
    eq = moved == kth
    # among ties at the threshold, keep the earliest until k are selected
    need = k - jnp.sum(gt, axis=-1, keepdims=True)
    sel = gt | (eq & (jnp.cumsum(eq, axis=-1) <= need))
    slot = jnp.cumsum(sel, axis=-1) - 1                  # output slot per pos
    cols = []
    for j in range(k):
        m = sel & (slot == j)
        cols.append(jnp.sum(jnp.where(m, moved, 0), axis=-1))
    return jnp.moveaxis(jnp.stack(cols, axis=-1), -1, axis)
