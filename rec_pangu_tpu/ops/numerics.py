"""Numeric helpers safe under autodiff.

``jnp.linalg.norm`` has a NaN gradient at exactly-zero vectors (0/0) even when
the result is clamped afterwards — and zero vectors are everywhere here
(padding rows of ItemEmbedding are pinned to zero).  ``safe_l2norm`` uses
sqrt(sum + eps), which is differentiable everywhere and maps zero rows to
zero rows.
"""
from __future__ import annotations

import jax.numpy as jnp


def safe_l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)
