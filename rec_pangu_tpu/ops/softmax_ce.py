"""Memory-fused full-softmax cross-entropy for large item vocabularies.

The reference computes sequence-recall loss as ``CE(user_emb @ items.T)``
(rec_pangu/models/base_model.py:124-138) — at production vocabularies the
``[B, V]`` logits dominate the step: 1024 x 1M f32 is 4 GB materialized and
re-read by softmax and again by the backward, ~12 GB of HBM traffic.

``fused_softmax_ce`` never materializes the logits: the forward runs an
online logsumexp over item chunks (flash-attention-style running max/sum),
and the custom backward recomputes each chunk's softmax from the saved
logsumexp — trading cheap MXU recompute for ~15x less HBM traffic.

Numerics: matmuls run at the same DEFAULT precision as the naive path;
the logsumexp is the numerically stable online form.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

CHUNK_V = 8192  # items per scan step: [B, CHUNK_V] logits stay on-chip


def _pad_items(items: jnp.ndarray):
    v, d = items.shape
    v_pad = -(-v // CHUNK_V) * CHUNK_V
    if v_pad != v:
        items = jnp.pad(items, ((0, v_pad - v), (0, 0)))
    return items, v, v_pad


def _chunk_logits(user, items_chunk, base, valid_v):
    """[B, C] logits with out-of-vocab padding rows masked to -inf."""
    logits = jnp.dot(user, items_chunk.T, preferred_element_type=jnp.float32)
    col = base + jnp.arange(items_chunk.shape[0])
    return jnp.where(col[None, :] < valid_v, logits, -jnp.inf)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_softmax_ce(user_emb: jnp.ndarray, items: jnp.ndarray,
                     pos_item: jnp.ndarray) -> jnp.ndarray:
    """mean_b [ logsumexp_v(user_b . item_v) - user_b . item_{pos_b} ]."""
    lse, _ = _forward_lse(user_emb, items)
    pos_score = jnp.sum(user_emb * jnp.take(items, pos_item, axis=0), axis=-1)
    return jnp.mean(lse - pos_score)


def _forward_lse(user, items):
    items_p, v, v_pad = _pad_items(items)
    chunks = items_p.reshape(v_pad // CHUNK_V, CHUNK_V, -1)
    b = user.shape[0]

    def step(carry, xs):
        m, s = carry
        idx, chunk = xs
        logits = _chunk_logits(user, chunk, idx * CHUNK_V, v)
        m2 = jnp.maximum(m, jnp.max(logits, axis=-1))
        s = s * jnp.exp(m - m2) + jnp.sum(jnp.exp(logits - m2[:, None]), axis=-1)
        return (m2, s), None

    init = (jnp.full((b,), -jnp.inf, jnp.float32), jnp.zeros((b,), jnp.float32))
    (m, s), _ = jax.lax.scan(
        step, init, (jnp.arange(chunks.shape[0]), chunks))
    return m + jnp.log(s), (v, v_pad)


def _fused_fwd(user_emb, items, pos_item):
    lse, _ = _forward_lse(user_emb, items)
    pos_rows = jnp.take(items, pos_item, axis=0)
    pos_score = jnp.sum(user_emb * pos_rows, axis=-1)
    loss = jnp.mean(lse - pos_score)
    return loss, (user_emb, items, pos_item, lse)


def _fused_bwd(res, g):
    user, items, pos_item, lse = res
    items_p, v, v_pad = _pad_items(items)
    chunks = items_p.reshape(v_pad // CHUNK_V, CHUNK_V, -1)
    b = user.shape[0]
    scale = g / b

    def step(d_user, xs):
        idx, chunk = xs
        logits = _chunk_logits(user, chunk, idx * CHUNK_V, v)
        p = jnp.exp(logits - lse[:, None])              # softmax chunk [B, C]
        d_user = d_user + jnp.dot(p, chunk, preferred_element_type=jnp.float32)
        d_chunk = jnp.dot(p.T, user, preferred_element_type=jnp.float32)
        return d_user, d_chunk * scale

    d_user, d_chunks = jax.lax.scan(
        step, jnp.zeros_like(user), (jnp.arange(chunks.shape[0]), chunks))
    d_items = d_chunks.reshape(v_pad, -1)[:v]
    # positive-class terms
    pos_rows = jnp.take(items, pos_item, axis=0)
    d_user = (d_user - pos_rows) * scale
    d_items = d_items.at[pos_item].add(-user * scale)
    return d_user, d_items, None


fused_softmax_ce.defvjp(_fused_fwd, _fused_bwd)


# naive path keeps bit-parity with the reference on small vocabularies
_FUSED_MIN_VOCAB = 65_536


def full_softmax_ce(user_emb: jnp.ndarray, items: jnp.ndarray,
                    pos_item: jnp.ndarray) -> jnp.ndarray:
    """Full-softmax CE; switches to the fused streaming form for big vocabs.

    Override: REC_PANGU_TPU_FUSED_CE=0 forces the naive [B,V] path,
    =1 forces fused regardless of size.
    """
    import os

    flag = os.environ.get("REC_PANGU_TPU_FUSED_CE", "auto")
    use_fused = (flag == "1") or (flag not in ("0", "off", "false")
                                  and items.shape[0] >= _FUSED_MIN_VOCAB)
    if use_fused:
        return fused_softmax_ce(user_emb, items, pos_item.reshape(-1))
    scores = jnp.dot(user_emb, items.T, preferred_element_type=jnp.float32)
    logprobs = jax.nn.log_softmax(scores, axis=-1)
    pos = pos_item.reshape(-1)
    nll = -jnp.take_along_axis(logprobs, pos[:, None], axis=1)[:, 0]
    return jnp.mean(nll)
