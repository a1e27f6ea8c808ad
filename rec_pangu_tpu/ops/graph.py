"""Session-graph machinery, TPU-first.

Replaces the reference's host-side DGL batch-graph construction
(rec_pangu/models/utils.py:196-269) and DGL message passing
(rec_pangu/models/layers/graph.py:125-173) with fixed-shape per-sample dense
formulations that run entirely under jit:

* build_session_graph: per sample, unique-ify the (<=L) session items via a
  sort-based dense ranking, emit padded node ids [L], alias indices [L], and
  dense weighted adjacencies M_in/M_out [L, L] where
  ``M_in[j, i] = count(i->j) / out_degree(i)`` — exactly DGL's
  ``u_mul_e(1/deg)`` + sum reduction.
* SRGNNCell: message passing becomes two [B,L,L]x[B,L,D] matmuls (MXU) + a
  GRU-style gate over [in, out] messages.
* NGCFLayer for the bipartite graph-CF model.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
# Plain int (weak-typed in jnp ops): a module-level jnp constant would
# initialize the XLA backend at import time, which breaks
# jax.distributed.initialize-before-first-jax-call (tests/test_multihost.py).
_BIG = 2**30


def _adj_single(alias: jnp.ndarray, mask: jnp.ndarray):
    """alias [L] node ranks, mask [L] {0,1} -> (M_in, M_out [L, L])."""
    L = alias.shape[0]
    src, dst = alias[:-1], alias[1:]
    valid = mask[1:] * mask[:-1]  # edge t -> t+1 exists iff both valid
    oh_src = jax.nn.one_hot(src, L, dtype=jnp.float32)
    oh_dst = jax.nn.one_hot(dst, L, dtype=jnp.float32)
    counts = jnp.einsum("t,ti,tj->ij", valid.astype(jnp.float32), oh_src, oh_dst)

    out_deg = counts.sum(axis=1)
    m_in = (counts / jnp.maximum(out_deg, 1.0)[:, None]).T  # [dst, src]
    rev = counts.T
    out_deg_rev = rev.sum(axis=1)
    m_out = (rev / jnp.maximum(out_deg_rev, 1.0)[:, None]).T
    return m_in, m_out


def adj_from_alias(alias: jnp.ndarray, mask: jnp.ndarray):
    """Batched [B, L] alias + mask -> (M_in, M_out [B, L, L]) — the device
    half of the session-graph build when nodes/alias come from the host plan
    (attach_session_graph)."""
    return jax.vmap(_adj_single)(alias, mask)


def _session_graph_single(ids: jnp.ndarray, mask: jnp.ndarray):
    """ids [L] int, mask [L] {0,1} -> (nodes [L], alias [L], M_in, M_out [L,L])."""
    L = ids.shape[0]
    key = jnp.where(mask > 0, ids, _BIG)
    sorted_key, order = jax.lax.sort_key_val(key, jnp.arange(L))
    is_new = jnp.concatenate([jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]])
    rank = jnp.cumsum(is_new) - 1
    nodes = jnp.zeros((L,), ids.dtype).at[rank].set(
        jnp.where(sorted_key < _BIG, sorted_key, 0))
    alias = jnp.zeros((L,), jnp.int32).at[order].set(rank.astype(jnp.int32))
    m_in, m_out = _adj_single(alias, mask)
    return nodes, alias, m_in, m_out


def host_session_graph(hist_item_list, hist_mask_list):
    """NumPy replica of the unique/alias half of ``build_session_graph`` —
    runs on host per batch (the pattern proven by ``emb_plan``) so (a) the
    device step skips the per-sample sort-based ranking and (b) the node
    lookup's ids become host-visible, letting the planned/fused embedding
    path engage for the SRGNN family (they were the only sequence models
    whose ids were device-generated).  Bit-identical to the device build
    (pinned by tests/test_sequence_models.py)."""
    import numpy as np

    hist = np.asarray(hist_item_list)
    mask = np.asarray(hist_mask_list)
    B, L = hist.shape
    key = np.where(mask > 0, hist.astype(np.int64), _BIG)
    order = np.argsort(key, axis=1, kind="stable")
    sorted_key = np.take_along_axis(key, order, axis=1)
    is_new = np.concatenate(
        [np.ones((B, 1), bool), sorted_key[:, 1:] != sorted_key[:, :-1]], axis=1)
    rank = np.cumsum(is_new, axis=1) - 1
    nodes = np.zeros((B, L), np.int32)
    np.put_along_axis(nodes, rank,
                      np.where(sorted_key < _BIG, sorted_key, 0).astype(np.int32),
                      axis=1)
    alias = np.zeros((B, L), np.int32)
    np.put_along_axis(alias, order, rank.astype(np.int32), axis=1)
    return nodes, alias


def attach_session_graph(batch: dict) -> dict:
    """Add the host-built ``graph_nodes`` / ``graph_alias`` arrays to a
    sequence batch (idempotent).  Session-graph models read them instead of
    running the on-device unique/alias build, and the trainer builds the
    embedding sort plan from ``graph_nodes``."""
    if "graph_nodes" in batch or "hist_item_list" not in batch:
        return batch
    nodes, alias = host_session_graph(batch["hist_item_list"],
                                      batch["hist_mask_list"])
    batch["graph_nodes"] = nodes
    batch["graph_alias"] = alias
    return batch


def take_nodes(hidden: jnp.ndarray, alias: jnp.ndarray) -> jnp.ndarray:
    """seq_hidden[b, l] = hidden[b, alias[b, l]] as a one-hot batched matmul.

    The ``take_along_axis`` form lowers to a per-element gather (+ scatter in
    the backward) — ~62 ms/step for SRGNN at B=1024, L=50, D=64 on v5e; the
    [B, L, S] one-hot einsum is ~164M MACs and transposes to a matmul too."""
    onehot = jax.nn.one_hot(alias, hidden.shape[1], dtype=hidden.dtype)
    # Numerics: on TPU the DEFAULT matmul pass bf16-rounds the gathered
    # ACTIVATIONS (~4e-3 rel) where take_along_axis was exact.  That is one
    # extra bf16 rounding on values every downstream Dense/MXU op rounds to
    # bf16 anyway — unlike the embedding-grad kernels (which ACCUMULATE
    # cotangents and therefore error-compensate, see _grad_mode), so the
    # exact 2-pass/HIGHEST variants were measured and rejected: +6.4 ms/step
    # (27%) at SRGNN's bench shape for noise below the network's own floor.
    return jnp.einsum("bls,bsd->bld", onehot, hidden)


def build_session_graph(hist_item_list: jnp.ndarray, hist_mask_list: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched: [B, L] ids + mask -> (nodes, alias, M_in, M_out)."""
    return jax.vmap(_session_graph_single)(hist_item_list, hist_mask_list)


class SRGNNCell(nn.Module):
    """SR-GNN gated cell (graph.py:143-173): in/out graph convs + GRU gate."""

    dim: int

    @nn.compact
    def __call__(self, m_in: jnp.ndarray, m_out: jnp.ndarray,
                 hidden: jnp.ndarray) -> jnp.ndarray:
        input_in = jnp.einsum("bji,bid->bjd", m_in,
                              nn.Dense(self.dim, kernel_init=KERNEL_INIT,
                                       name="in_conv")(hidden))
        input_out = jnp.einsum("bji,bid->bjd", m_out,
                               nn.Dense(self.dim, kernel_init=KERNEL_INIT,
                                        name="out_conv")(hidden))
        inputs = jnp.concatenate([input_in, input_out], axis=-1)
        gi = nn.Dense(3 * self.dim, kernel_init=KERNEL_INIT, name="lin_ih")(inputs)
        gh = nn.Dense(3 * self.dim, kernel_init=KERNEL_INIT, name="lin_hh")(hidden)
        i_r, i_i, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_i, h_n = jnp.split(gh, 3, axis=-1)
        reset_gate = nn.sigmoid(i_r + h_r)
        input_gate = nn.sigmoid(i_i + h_i)
        new_gate = jnp.tanh(i_n + reset_gate * h_n)
        return (1 - input_gate) * hidden + input_gate * new_gate


class NGCFLayer(nn.Module):
    """NGCF bipartite message passing (graph.py:87-122): given the aggregated
    neighbor messages ``side`` for a node set, the update is
    leaky_relu(W1 ego + W1 side + W2 (ego ⊙ side)) -> dropout -> L2 norm."""

    out_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, side: jnp.ndarray, ego: jnp.ndarray,
                 train: bool = True) -> jnp.ndarray:
        from .numerics import safe_l2norm

        xavier = nn.initializers.xavier_normal()
        w1 = nn.Dense(self.out_dim, kernel_init=xavier, name="W1")
        w2 = nn.Dense(self.out_dim, kernel_init=xavier, name="W2")
        out = nn.leaky_relu(w1(ego) + w1(side) + w2(ego * side),
                            negative_slope=0.2)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return safe_l2norm(out)
