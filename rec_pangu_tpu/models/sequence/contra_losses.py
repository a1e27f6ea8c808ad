"""Contrastive losses shared by CLRec / ContraRec.

* clrec_contra_loss <- rec_pangu/models/sequence/clrec.py:62-102 (two-view
  user/target InfoNCE with identity positives).
* contrarec_contra_loss <- contrarec.py:93-144 (supervised contrastive loss
  over concatenated views, positives = same target item, self-contrast
  masked, scaled by temperature).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def clrec_contra_loss(features: jnp.ndarray, temperature: float = 0.1) -> jnp.ndarray:
    """features [B, 2, D] (already normalized)."""
    B = features.shape[0]
    mask = jnp.eye(B)
    dot = features[:, 0] @ features[:, 1].T / temperature
    logits = dot - jnp.max(dot, axis=1, keepdims=True)
    log_prob = logits - jnp.log(jnp.sum(jnp.exp(logits), axis=1, keepdims=True) + 1e-10)
    return -jnp.mean(jnp.sum(mask * log_prob, axis=1))


def contrarec_contra_loss(features: jnp.ndarray, labels: jnp.ndarray = None,
                          temperature: float = 0.2) -> jnp.ndarray:
    """features [B, V, D] normalized; labels [B] target items (positives =
    equal label); degenerates to InfoNCE when labels is None."""
    B, V, D = features.shape
    if labels is None:
        mask = jnp.eye(B)
    else:
        labels = labels.reshape(-1, 1)
        mask = (labels == labels.T).astype(features.dtype)
    contrast = features.transpose(1, 0, 2).reshape(B * V, D)
    dot = contrast @ contrast.T / temperature
    logits = dot - jnp.max(dot, axis=1, keepdims=True)
    mask = jnp.tile(mask, (V, V))
    logits_mask = 1.0 - jnp.eye(B * V)
    mask = mask * logits_mask
    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True) + 1e-10)
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / (jnp.sum(mask, axis=1) + 1e-10)
    return jnp.mean(-temperature * mean_log_prob_pos)
