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


_NEG = -1e30  # finite -inf stand-in: exp underflows to exactly 0


def _multimax_chunk(user_embs, chunk, base, valid_v):
    """Running max over K interests for one item chunk — the [B, K, C]
    tensor never exists (16 GB of HBM traffic per scan at B=1024, K=4,
    V=1M).  Returns (z [B, C] masked, kstar [B, C] argmax interest)."""
    z = jnp.dot(user_embs[:, 0], chunk.T, preferred_element_type=jnp.float32)
    ks = jnp.zeros(z.shape, jnp.int32)
    for k in range(1, user_embs.shape[1]):
        lk = jnp.dot(user_embs[:, k], chunk.T,
                     preferred_element_type=jnp.float32)
        upd = lk > z
        z = jnp.where(upd, lk, z)
        ks = jnp.where(upd, k, ks)
    col = base + jnp.arange(chunk.shape[0])
    return jnp.where(col[None, :] < valid_v, z, _NEG), ks


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_multimax_softmax_ce(user_embs: jnp.ndarray, items: jnp.ndarray,
                              pos_item: jnp.ndarray) -> jnp.ndarray:
    """Multi-interest CE with a per-item max over K interests, streamed:

        mean_b [ logsumexp_v(max_k u_bk . item_v) - max_k u_bk . item_pos ]

    (IOCRec's recommendation loss, rec_pangu/models/sequence/iocrec.py:79-104
    — the naive form materializes [B, K, V] logits: 16 GB at B=1024, K=4,
    V=1M.)  Hand-written vjp: the backward recomputes each chunk's max/argmax
    and routes gradients to the winning interest — generic AD through the
    scan was 10x slower (it carried the full [V, D] item gradient AND the
    [B, C] comparison masks through every step)."""
    return _multimax_fwd(user_embs, items, pos_item)[0]


def _multimax_lse(user_embs, items_p, v, v_pad):
    chunks = items_p.reshape(v_pad // CHUNK_V, CHUNK_V, -1)
    b = user_embs.shape[0]

    def step(carry, xs):
        m, s = carry
        idx, chunk = xs
        z, _ = _multimax_chunk(user_embs, chunk, idx * CHUNK_V, v)
        m2 = jnp.maximum(m, jnp.max(z, axis=-1))
        s = s * jnp.exp(m - m2) + jnp.sum(jnp.exp(z - m2[:, None]), axis=-1)
        return (m2, s), None

    init = (jnp.full((b,), _NEG, jnp.float32), jnp.zeros((b,), jnp.float32))
    (m, s), _ = jax.lax.scan(step, init, (jnp.arange(chunks.shape[0]), chunks))
    return m + jnp.log(s)


def _pos_max(user_embs, items, pos):
    """(z_pos [B], kstar_pos [B]): best interest against the positive item."""
    pos_rows = jnp.take(items, pos, axis=0)                      # [B, D]
    scores = jnp.einsum("bkd,bd->bk", user_embs, pos_rows,
                        preferred_element_type=jnp.float32)
    return jnp.max(scores, axis=-1), jnp.argmax(scores, axis=-1)


def _use_multimax_kernel(user_embs) -> bool:
    """Route the K-max CE through the Pallas kernels (ops/kernels/multimax_ce)
    when on TPU (or interpret mode) and the shapes tile — the XLA scan
    materializes K [B, C] logit tensors per chunk in HBM and is ~4x slower at
    the bench shape (docs/perf_notes.md §5)."""
    import os

    from .kernels.embedding_grad import _interpret
    from .kernels.multimax_ce import multimax_kernel_ok

    flag = os.environ.get("REC_PANGU_TPU_MULTIMAX_KERNEL", "auto")
    if flag in ("0", "off", "false"):
        return False
    backend = jax.default_backend()
    if backend == "cpu" and not _interpret():
        # a TPU kernel only runs on cpu under interpret mode — even an
        # explicit =1 without REC_PANGU_TPU_PALLAS_INTERPRET cannot lower
        return False
    if backend not in ("cpu", "tpu", "axon"):
        return False  # gpu etc.: no TPU lowering
    b, k, d = user_embs.shape
    return multimax_kernel_ok(b, k, d)


def _multimax_fwd(user_embs, items, pos_item):
    items_p, v, v_pad = _pad_items(items)
    pos = pos_item.reshape(-1)
    if _use_multimax_kernel(user_embs):
        from .kernels.embedding_grad import _interpret
        from .kernels.multimax_ce import multimax_lse

        lse = multimax_lse(user_embs, items_p, v, interpret=_interpret())
    else:
        lse = _multimax_lse(user_embs, items_p, v, v_pad)
    z_pos, _ = _pos_max(user_embs, items, pos)
    loss = jnp.mean(lse - z_pos)
    return loss, (user_embs, items, pos, lse)


def _multimax_bwd(res, g):
    user_embs, items, pos, lse = res
    items_p, v, v_pad = _pad_items(items)
    b, K, d = user_embs.shape
    scale = g / b
    if _use_multimax_kernel(user_embs):
        from .kernels.embedding_grad import _interpret
        from .kernels.multimax_ce import multimax_grads

        du, d_items_p = multimax_grads(user_embs, items_p, lse, v,
                                       interpret=_interpret())
        d_items = d_items_p[:v]
        z_pos, ks_pos = _pos_max(user_embs, items, pos)
        pos_rows = jnp.take(items, pos, axis=0)
        onehot_k = jax.nn.one_hot(ks_pos, K, dtype=jnp.float32)
        du = (du - onehot_k[..., None] * pos_rows[:, None, :]) * scale
        u_star = jnp.einsum("bk,bkd->bd", onehot_k, user_embs)
        d_items = (d_items * scale).at[pos].add(-u_star * scale)
        return du.astype(user_embs.dtype), d_items.astype(items.dtype), None
    chunks = items_p.reshape(v_pad // CHUNK_V, CHUNK_V, -1)

    def step(d_user, xs):
        idx, chunk = xs
        z, ks = _multimax_chunk(user_embs, chunk, idx * CHUNK_V, v)
        p = jnp.exp(z - lse[:, None])                     # [B, C]
        d_chunk = jnp.zeros((chunk.shape[0], d), jnp.float32)
        du = []
        for k in range(K):
            mk = p * (ks == k)
            du.append(jnp.dot(mk, chunk, preferred_element_type=jnp.float32))
            d_chunk = d_chunk + jnp.dot(
                mk.T, user_embs[:, k], preferred_element_type=jnp.float32)
        return d_user + jnp.stack(du, axis=1), d_chunk * scale

    d_user, d_chunks = jax.lax.scan(
        step, jnp.zeros_like(user_embs, jnp.float32),
        (jnp.arange(chunks.shape[0]), chunks))
    d_items = d_chunks.reshape(v_pad, -1)[:v]
    # positive-class terms, routed to the winning interest
    z_pos, ks_pos = _pos_max(user_embs, items, pos)
    pos_rows = jnp.take(items, pos, axis=0)
    onehot_k = jax.nn.one_hot(ks_pos, K, dtype=jnp.float32)       # [B, K]
    d_user = (d_user - onehot_k[..., None] * pos_rows[:, None, :]) * scale
    u_star = jnp.einsum("bk,bkd->bd", onehot_k, user_embs)
    d_items = d_items.at[pos].add(-u_star * scale)
    return d_user.astype(user_embs.dtype), d_items.astype(items.dtype), None


fused_multimax_softmax_ce.defvjp(_multimax_fwd, _multimax_bwd)


# --------------------------------------------------------------------------- #
# capture variant for the fused-update train step (multi-interest models)
# --------------------------------------------------------------------------- #
@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_multimax_softmax_ce_captured(user_embs, items, pos_item, cap_t,
                                       table_rows: int):
    """``fused_multimax_softmax_ce`` whose item-table gradient routes to
    ``cap_t`` ([D, table_rows] zeros) instead of ``items`` — the seq
    fused-update step (train/fused_update.py) feeds that cotangent straight
    into the planned-Adam kernel.  Callers pass ``items`` under
    ``stop_gradient`` (typically ``output_items()``, whose zeroed row 0 the
    backward preserves: d row0 is pinned to 0)."""
    return _multimax_fwd(user_embs, items, pos_item)[0]


def _multimax_cap_fwd(user_embs, items, pos_item, cap_t, table_rows):
    loss, res = _multimax_fwd(user_embs, items, pos_item)
    return loss, res


def _multimax_cap_bwd(table_rows, res, g):
    du, d_items, _ = _multimax_bwd(res, g)
    v, d = d_items.shape
    # row 0 is the zeroed padding row of output_items(): its forward value
    # is identically 0, so the table gets no gradient through it
    d_items = d_items.at[0].set(0.0)
    d_items_t = jnp.zeros((d, table_rows), jnp.float32).at[:, :v].set(
        d_items.T)
    return du, jnp.zeros((v, d), jnp.float32), None, d_items_t


fused_multimax_softmax_ce_captured.defvjp(_multimax_cap_fwd,
                                          _multimax_cap_bwd)


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


# --------------------------------------------------------------------------- #
# zero-copy variant over a pre-padded parameter table
# --------------------------------------------------------------------------- #
@functools.lru_cache(maxsize=None)
def _padded_ce(valid_v: int, zero_row0: bool):
    """Streaming softmax-CE over a CHUNK_V-aligned table — no pad / slice /
    ``all_items`` copies.  ``valid_v`` marks the real vocabulary (rows beyond
    it are table padding, masked to -inf); ``zero_row0`` reproduces the
    padding-row semantics of ``all_items()`` (logit pinned to 0, no gradient
    to row 0) without materializing the zeroed copy.

    Layout: both scans stream ``items.T`` ([D, V_pad], a layout bitcast of
    the column-major parameter) via explicit dynamic slices, and the backward
    accumulates the table gradient TRANSPOSED into a [D, V_pad] carry — each
    chunk write is then layout-aligned (the row-major d_chunks variant spent
    8.6 ms/step in strided dynamic_update_slice at B=1024, V=1M, D=64)."""

    def _chunk_logits_t(user, chunk_t, base):
        logits = jnp.dot(user, chunk_t, preferred_element_type=jnp.float32)
        col = base + jnp.arange(chunk_t.shape[1])
        logits = jnp.where(col[None, :] < valid_v, logits, -jnp.inf)
        if zero_row0:
            logits = jnp.where(col[None, :] == 0, 0.0, logits)
        return logits

    def _lse_pos(user, items_t, pos):
        """One pass: (logsumexp, positive score).  The positive logit is
        extracted from the chunk that contains it — a full-table row gather
        of the positives would force XLA to re-lay-out the whole table
        (measured 1.2 ms/step at V=1M, D=64)."""
        b, k = user.shape[0], items_t.shape[1] // CHUNK_V

        def step(carry, idx):
            m, s, ps = carry
            chunk_t = jax.lax.dynamic_slice(
                items_t, (0, idx * CHUNK_V), (items_t.shape[0], CHUNK_V))
            logits = _chunk_logits_t(user, chunk_t, idx * CHUNK_V)
            loc = pos - idx * CHUNK_V
            hit = (loc >= 0) & (loc < CHUNK_V)
            val = jnp.take_along_axis(
                logits, jnp.clip(loc, 0, CHUNK_V - 1)[:, None], axis=1)[:, 0]
            ps = ps + jnp.where(hit, val, 0.0)
            m2 = jnp.maximum(m, jnp.max(logits, axis=-1))
            s = s * jnp.exp(m - m2) + jnp.sum(jnp.exp(logits - m2[:, None]),
                                              axis=-1)
            return (m2, s, ps), None

        init = (jnp.full((b,), -jnp.inf, jnp.float32),
                jnp.zeros((b,), jnp.float32), jnp.zeros((b,), jnp.float32))
        (m, s, ps), _ = jax.lax.scan(step, init, jnp.arange(k))
        return m + jnp.log(s), ps

    def _bwd_scan(user, items_p, pos, lse, g):
        """(d_user, d_items_t [D, V_pad]) — both already scaled by g/B."""
        v_pad = items_p.shape[0]
        items_t = items_p.T
        scale = g / user.shape[0]

        def step(carry, idx):
            d_user, d_items_t = carry
            chunk_t = jax.lax.dynamic_slice(
                items_t, (0, idx * CHUNK_V), (items_t.shape[0], CHUNK_V))
            logits = _chunk_logits_t(user, chunk_t, idx * CHUNK_V)
            p = jnp.exp(logits - lse[:, None])          # softmax chunk [B, C]
            col = idx * CHUNK_V + jnp.arange(CHUNK_V)
            # classic softmax-CE chunk gradient: dlogits = p - onehot(pos)
            p = p - (pos[:, None] == col[None, :]).astype(jnp.float32)
            if zero_row0:
                # the forward saw row 0 as a ZERO vector: its p contributes
                # to the denominator but neither to d_user nor to d_row0
                # (and a pos==0 target's grad is stopped the same way)
                p = jnp.where(col[None, :] == 0, 0.0, p)
            d_user = d_user + jax.lax.dot_general(
                p, chunk_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            d_chunk_t = jax.lax.dot_general(   # [D, C] = user^T @ p
                user, p, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            d_items_t = jax.lax.dynamic_update_slice(
                d_items_t, d_chunk_t * scale, (0, idx * CHUNK_V))
            return (d_user, d_items_t), None

        init = (jnp.zeros_like(user),
                jnp.zeros((user.shape[1], v_pad), jnp.float32))
        (d_user, d_items_t), _ = jax.lax.scan(
            step, init, jnp.arange(v_pad // CHUNK_V))
        return d_user * scale, d_items_t

    @jax.custom_vjp
    def ce(user, items_p, pos):
        lse, ps = _lse_pos(user, items_p.T, pos)
        return jnp.mean(lse - ps)

    def fwd(user, items_p, pos):
        lse, ps = _lse_pos(user, items_p.T, pos)
        return jnp.mean(lse - ps), (user, items_p, pos, lse)

    def bwd(res, g):
        user, items_p, pos, lse = res
        d_user, d_items_t = _bwd_scan(user, items_p, pos, lse, g)
        # .T back to the param's [V_pad, D]: a bitcast of the [D, V] grad
        return d_user, d_items_t.T, None

    ce.defvjp(fwd, bwd)

    # capture variant: the table is a nondiff bystander (callers pass it under
    # stop_gradient) and the gradient routes to ``cap_t`` [D, V_pad] — zeros
    # whose cotangent IS d_items_t, feeding the fused-Adam kernel directly
    # (train/fused_update.py sequence path) with no separate add/optimizer
    # pass over the table
    @jax.custom_vjp
    def ce_cap(user, items_p, pos, cap_t):
        lse, ps = _lse_pos(user, items_p.T, pos)
        return jnp.mean(lse - ps)

    def fwd_cap(user, items_p, pos, cap_t):
        lse, ps = _lse_pos(user, items_p.T, pos)
        return jnp.mean(lse - ps), (user, items_p, pos, lse)

    def bwd_cap(res, g):
        user, items_p, pos, lse = res
        d_user, d_items_t = _bwd_scan(user, items_p, pos, lse, g)
        # the table cotangent is structurally zero here (callers hold the
        # table out of autodiff); XLA DCEs the zeros_like
        return d_user, jnp.zeros_like(items_p), None, d_items_t

    ce_cap.defvjp(fwd_cap, bwd_cap)
    ce.capture_variant = ce_cap
    return ce


def fused_softmax_ce_padded(user_emb: jnp.ndarray, items_padded: jnp.ndarray,
                            pos_item: jnp.ndarray, valid_v: int,
                            zero_row0: bool = True) -> jnp.ndarray:
    """Streaming CE over the raw (pre-padded) parameter table.

    ``items_padded.shape[0]`` must be a CHUNK_V multiple (``padded_rows``
    guarantees this for big tables) — the table streams through the scan with
    zero full-table copies, the dominant cost of the pad/slice variant."""
    if items_padded.shape[0] % CHUNK_V:
        raise ValueError(
            f"table rows {items_padded.shape[0]} not a {CHUNK_V} multiple — "
            f"use fused_softmax_ce (copying) or pad the table (padded_rows)")
    return _padded_ce(int(valid_v), bool(zero_row0))(
        user_emb, items_padded, pos_item.reshape(-1))


def fused_softmax_ce_captured(user_emb: jnp.ndarray, items_padded: jnp.ndarray,
                              pos_item: jnp.ndarray, cap_t: jnp.ndarray,
                              valid_v: int, zero_row0: bool = True) -> jnp.ndarray:
    """``fused_softmax_ce_padded`` whose table gradient routes to ``cap_t``
    ([D, V_pad] zeros) instead of the table — for the fused-update train step
    (the caller must pass the table under ``stop_gradient``)."""
    return _padded_ce(int(valid_v), bool(zero_row0)).capture_variant(
        user_emb, items_padded, pos_item.reshape(-1), cap_t)


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
