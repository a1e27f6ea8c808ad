"""Fused embedding engine — the single table behind every model.

Replaces the reference's per-feature ``nn.ModuleDict`` of embeddings
(rec_pangu/models/layers/embedding.py:28-71) and the sequence models'
``item_emb`` (rec_pangu/models/base_model.py:116-120) with ONE parameter table
per embedding dim:

* ranking fields: all F features share a fused ``[total_rows, D]`` table with
  static per-feature row offsets; a batch lookup is a **single gather** of
  ``[B, F]`` (+offsets) -> ``[B, F, D]`` — one HBM-friendly op instead of F
  tiny ones, and the natural unit to row-shard over the ``model`` mesh axis.
* sequence item/cate vocabularies: :class:`ItemEmbedding` with row 0 pinned to
  zero (parity with ``padding_idx=0``) by construction — row 0 is multiplied
  by a 0/1 mask on every read, which also zeroes its gradient.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..data.encoder import FeatureSpec
from .initializers import torch_kaiming_normal

# Dense kernels [in, out]: flax fan_in == torch Linear fan_in — same init.
EMB_INIT = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
# Embedding TABLES [rows, D]: torch's kaiming on nn.Embedding.weight uses
# fan_in = D (shape[1]), i.e. std = sqrt(2/D) INDEPENDENT of the vocab size.
# flax's variance_scaling reads fan_in = rows for a 2-D param, which shrank
# big tables' init by sqrt(rows/D) (~18x on the ratings leg, ~125x at V=1M)
# — products of embeddings (FiBiNet bilinear, capsule routing logits) then
# start ~300x smaller than the reference's.  Root cause of the round-3
# FiBiNet parity miss (VERDICT r3 item 3); see BASELINE.md.
TABLE_INIT = torch_kaiming_normal()


def xavier_table_init(spec: "FeatureSpec", dim: int):
    """Per-feature xavier_normal over the fused table: feature f's rows get
    std sqrt(2 / (rows_f + D)) — exactly torch ``xavier_normal_`` on each
    per-feature ``nn.Embedding(vocab_f + 1, D)`` weight, which is what the
    reference's multi-task ``_init_weights`` applies
    (rec_pangu/models/base_model.py:28-39; every MTL model runs
    ``self.apply(self._init_weights)`` instead of the ranking family's
    kaiming ``reset_parameters``)."""
    import numpy as np

    def init(key, shape, dtype=jnp.float32):
        stds = np.zeros((shape[0], 1), np.float32)
        offsets = spec.offsets
        for i, rows in enumerate(spec.sparse_vocab_rows):
            start = int(offsets[i])
            stds[start:start + int(rows)] = float(
                np.sqrt(2.0 / (int(rows) + dim)))
        return jax.random.normal(key, shape, dtype) * jnp.asarray(stds)

    return init


class FusedEmbedding(nn.Module):
    spec: FeatureSpec
    embedding_dim: int
    # "kaiming" = the ranking family's reset_parameters convention;
    # "xavier" = the MTL family's _init_weights convention (per-feature)
    init_mode: str = "kaiming"

    def setup(self):
        from .kernels.embedding_grad import padded_rows

        # big tables are padded to a tile multiple so the planned backward
        # writes the grad at its final shape (pad rows are never indexed)
        init = (xavier_table_init(self.spec, self.embedding_dim)
                if self.init_mode == "xavier" else TABLE_INIT)
        self.table = self.param(
            "table", init,
            (padded_rows(self.spec.total_rows), self.embedding_dim)
        )
        self._offsets = jnp.asarray(self.spec.offsets)

    def __call__(self, sparse_ids: jnp.ndarray,
                 plan: Optional[dict] = None) -> jnp.ndarray:
        """[B, F] int ids (per-feature local) -> [B, F, D].

        ``plan`` is the host-computed sort plan for this batch's fused ids
        (``make_sort_plan(host_fused_ids(spec, sparse), total_rows)``, shipped
        as ``batch["emb_plan"]``); when present and the table is big enough,
        the backward skips XLA's row-serial scatter entirely.
        """
        from .kernels.embedding_grad import (_planned_value, fused_gather,
                                             plan_matches, planned_gather,
                                             planned_path_ok)

        fused_ids = sparse_ids + self._offsets[None, :]
        cap = plan.get("capture") if isinstance(plan, dict) else None
        # capture leaves are keyed by this module's param path, so models
        # with several tables of the same dim (e.g. AFN's ensemble second
        # embedding) each get their own cotangent stream
        cap_key = "/".join(self.path)
        if cap is not None and cap_key in cap:
            # fused-update mode (train/fused_update.py): the table's update is
            # applied by the planned-Adam kernel from the cotangent of this
            # zero 'capture' leaf, so the table itself is held out of autodiff
            base_plan = {k: v for k, v in plan.items() if k != "capture"}
            val = _captured_planned_value(jax.lax.stop_gradient(self.table),
                                          fused_ids, base_plan)
            return val + cap[cap_key].reshape(val.shape)
        if (plan is not None
                and planned_path_ok(self.spec.total_rows, fused_ids.size,
                                    self.embedding_dim)):
            from ..parallel.mesh import active_mesh

            if (active_mesh() is None
                    and plan_matches(plan, fused_ids.size,
                                     self.table.shape[0],
                                     self.embedding_dim)):
                return planned_gather(self.table, fused_ids, plan)
            dp = _dp_plan_setup(plan, fused_ids.size, self.table.shape[0],
                                self.embedding_dim)
            if dp is not None:
                from .kernels.embedding_grad import planned_gather_dp

                return planned_gather_dp(self.table, fused_ids, plan, dp)
            tp = _tp_plan_setup(plan, fused_ids.size, self.table.shape[0],
                                self.embedding_dim)
            if tp is not None:
                from .kernels.embedding_grad import planned_gather_tp

                return planned_gather_tp(self.table, fused_ids, plan, tp)
            # plain plan under an active mesh (replicated partial batch):
            # keep the GSPMD-safe gather — a bare Pallas call must not reach
            # a multi-device jit outside shard_map
        return fused_gather(self.table, fused_ids)

    def lookup(self, name: str, ids: jnp.ndarray) -> jnp.ndarray:
        """Lookup one feature's sub-table with local ids of any shape."""
        i = self.spec.sparse_names.index(name)
        return jnp.take(self.table, ids + int(self.spec.offsets[i]), axis=0)


def host_fused_ids(spec: FeatureSpec, sparse) -> np.ndarray:
    """Host (numpy) replica of the fused-id computation in __call__."""
    return (np.asarray(sparse, dtype=np.int64)
            + np.asarray(spec.offsets, dtype=np.int64)[None, :]).reshape(-1)


def _captured_planned_value(table, ids, base_plan):
    """Forward-only planned lookup for capture mode (table stop-gradded by
    the caller).  Dispatches on the PLAN form first: a stacked per-shard plan
    requires the trainer's active mesh (loud error if missing — a desynced
    global would otherwise leak bare Pallas calls into a multi-device jit);
    a plain plan under an active mesh runs as a replicated shard_map region;
    no mesh -> the plain path."""
    from ..parallel.mesh import active_mesh
    from .kernels.embedding_grad import _planned_value, planned_value_dp

    mesh = active_mesh()
    if getattr(base_plan["meta"], "ndim", 1) == 2 and mesh is None:
        raise RuntimeError(
            "capture batch carries a per-shard plan but no mesh is active — "
            "call parallel.mesh.set_active_mesh(mesh) (the trainer does this "
            "before every train/eval pass)")
    if mesh is not None:
        return planned_value_dp(table, ids, base_plan, mesh)
    return _planned_value(table, ids, base_plan)


def _dp_plan_setup(plan, num_lookups: int, table_rows: int,
                   dim: int = 32):
    """Trace-time gate for the data-parallel planned path: a stacked
    per-shard plan (leading axis = data-shard count), an active mesh whose
    'model' axis is trivial (the table is replicated), and matching shapes.
    Returns the mesh to shard_map over, or None to fall back."""
    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS, active_mesh
    from .kernels.embedding_grad import sharded_plan_matches

    meta = plan.get("meta") if isinstance(plan, dict) else None
    if meta is None or getattr(meta, "ndim", 1) != 2:
        return None
    mesh = active_mesh()
    if mesh is None or mesh.shape[MODEL_AXIS] != 1:
        return None
    if not sharded_plan_matches(plan, num_lookups, table_rows,
                                mesh.shape[DATA_AXIS], dim):
        return None
    return mesh


def _tp_plan_setup(plan, num_lookups: int, table_rows: int,
                   dim: int = 32):
    """Trace-time gate for the tensor-parallel planned path: a TP plan
    ([n_data, n_model, ...] leaves), an active mesh with a non-trivial
    'model' axis over which the table row-shards evenly, matching shapes."""
    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS, active_mesh
    from .kernels.embedding_grad import tp_plan_matches

    meta = plan.get("meta") if isinstance(plan, dict) else None
    if meta is None or getattr(meta, "ndim", 1) != 3:
        return None
    mesh = active_mesh()
    if mesh is None or mesh.shape[MODEL_AXIS] == 1:
        return None
    if table_rows % mesh.shape[MODEL_AXIS]:
        return None
    if not tp_plan_matches(plan, num_lookups, table_rows,
                           mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS],
                           dim):
        return None
    return mesh


def attach_emb_plan(batch: dict, spec: FeatureSpec, embedding_dim: int,
                    force: bool = False, n_shards: int = 0,
                    with_global: bool = False, n_model: int = 1) -> dict:
    """Host-side: add ``batch["emb_plan"]`` when the planned backward applies.

    Called by the trainer/bench at batch-prep time; a no-op for small tables,
    CPU backends, or batches without a ``sparse`` field.  ``force`` waives the
    lookup-count threshold (a perf gate only) — the fused-update train step
    needs a plan on EVERY batch, including a small final partial one.
    ``n_shards`` >= 1 means MESH MODE: one plan per data shard (stacked
    leaves — a 1-device mesh still gets a leading [1] axis) for the
    shard_map-wrapped path; the batch axis must split evenly.  0 = the
    single-device plain plan.  ``with_global`` additionally ships
    ``batch["emb_plan_global"]`` (the whole-batch plan the mesh fused-update
    kernel consumes).
    """
    sparse = batch.get("sparse")
    if sparse is None or "emb_plan" in batch:
        return batch
    _attach_plans(batch, lambda: host_fused_ids(spec, sparse),
                  spec.total_rows, int(np.prod(sparse.shape)),
                  embedding_dim, force, n_shards, with_global,
                  batch_rows=sparse.shape[0], n_model=n_model)
    return batch


_TP_OVERFLOW_WARNED = False


def _warn_tp_overflow_once(n_model: int) -> None:
    """One log line the first time a batch's shard buckets overflow the TP
    plan capacity — otherwise the planned path could silently disengage for
    every batch (e.g. a skewed static feature layout) while the user
    benchmarks the GSPMD gather believing the kernels are active."""
    global _TP_OVERFLOW_WARNED
    if _TP_OVERFLOW_WARNED:
        return
    _TP_OVERFLOW_WARNED = True
    from ..utils.logging import logger

    logger.warning(
        f"TP embedding plan skipped: a table shard's id bucket overflowed "
        f"the capacity (REC_PANGU_TPU_TP_SLACK x N/{n_model}); this batch "
        f"(and any like it) uses the GSPMD gather instead of the planned "
        f"kernels.  Raise REC_PANGU_TPU_TP_SLACK if this repeats.")


def _attach_plans(batch, flat_ids_fn, total_rows, n, dim, force, n_shards,
                  with_global, batch_rows, n_model: int = 1):
    """Shared body of attach_emb_plan/attach_item_plan: gate, build the
    (per-shard / TP) plan, optionally the global plan — flat ids computed
    once.  ``n_model`` > 1 builds the tensor-parallel plan for a table
    row-sharded over 'model' (capacity overflow -> no plan, GSPMD gather)."""
    import os

    from .kernels.embedding_grad import (make_sharded_sort_plan,
                                         make_sort_plan, make_tp_sort_plan,
                                         padded_rows, planned_path_ok)

    if not planned_path_ok(total_rows, n if not force else 2**30, dim):
        return
    if n_shards and batch_rows % n_shards:
        return  # partial batch: _put replicates it; keep the gather
    # compact plans ship a third less data per batch at ~3 ms/step device
    # cost — for hosts whose device link, not the chip, is the bottleneck
    compact = os.environ.get("REC_PANGU_TPU_COMPACT_PLAN", "0") == "1"
    flat = flat_ids_fn()
    rows = padded_rows(total_rows)
    if n_model > 1:  # tensor-parallel: per-(data, model)-shard subset plans
        plan = make_tp_sort_plan(flat, rows, n_model,
                                 n_data=max(n_shards, 1), dim=dim)
        if plan is not None:
            batch["emb_plan"] = plan
        else:
            _warn_tp_overflow_once(n_model)
        return
    if n_shards:  # mesh mode: stacked per-shard plan (leading [n] axis)
        batch["emb_plan"] = make_sharded_sort_plan(flat, rows, n_shards,
                                                   compact=compact, dim=dim)
        if with_global:
            batch["emb_plan_global"] = make_sort_plan(flat, rows,
                                                      compact=compact,
                                                      dim=dim)
    else:
        batch["emb_plan"] = make_sort_plan(flat, rows, compact=compact,
                                           dim=dim)


class ItemEmbedding(nn.Module):
    """Sequence vocabulary table with padding row 0 pinned at zero.

    ``init_std`` overrides the torch-kaiming default (std sqrt(2/D)) —
    smaller inits (e.g. 0.01) measurably improve retrieval quality on small
    corpora (the round-3 numbers used an accidentally-tiny init and beat
    the reference's recall 2-5x; the parity default reproduces torch).
    Models plumb it from ``config['emb_init_std']``."""

    vocab_size: int
    embedding_dim: int
    init_std: Optional[float] = None

    def setup(self):
        from .kernels.embedding_grad import padded_rows

        init = TABLE_INIT
        if self.init_std is not None:
            init = nn.initializers.normal(stddev=float(self.init_std))
        # big vocabularies are padded like FusedEmbedding (pad rows are never
        # indexed and all_items slices them away)
        self.table = self.param(
            "table", init,
            (padded_rows(self.vocab_size), self.embedding_dim)
        )

    def all_items(self) -> jnp.ndarray:
        """Full table with row 0 zeroed (parity: item_emb.weight with padding_idx=0)."""
        row_ids = jnp.arange(self.vocab_size)[:, None]
        return self.table[: self.vocab_size] * (row_ids != 0)

    def __call__(self, ids: jnp.ndarray,
                 plan: Optional[dict] = None,
                 prefer_kernel_grad: bool = False) -> jnp.ndarray:
        """Lookup with optional host sort plan (``batch["emb_plan"]``): the
        trainer attaches one for the hist-list lookup so the backward skips
        XLA's row-serial scatter (the mask's backward composes on top).
        ``prefer_kernel_grad`` marks device-generated ids (e.g. contrastive
        augmentations) that can never carry a plan — in FAST_SCATTER=auto
        mode their backward uses the sorted-segment kernel."""
        from .kernels.embedding_grad import (_planned_value, fused_gather,
                                             plan_matches, planned_gather,
                                             planned_path_ok)

        cap = plan.get("capture") if isinstance(plan, dict) else None
        if cap is not None and "hist" in cap:
            # fused-update mode (train/fused_update.py seq path): the table's
            # update is applied by the planned-Adam kernel from the cotangent
            # of this zero 'capture' leaf; the table is held out of autodiff
            if cap["hist"].shape[0] == ids.size:
                base_plan = {k: v for k, v in plan.items() if k != "capture"}
                val = _captured_planned_value(
                    jax.lax.stop_gradient(self.table), ids, base_plan)
                emb = val + cap["hist"].reshape(val.shape)
                return emb * (ids != 0)[..., None]
            # a lookup the plan does not cover (e.g. the multi-interest
            # models' target-item read, used only inside argmax) — such uses
            # must be gradient-free, which fused_update_compatible asserts
            emb = fused_gather(jax.lax.stop_gradient(self.table), ids)
            return emb * (ids != 0)[..., None]
        if (plan is not None
                and planned_path_ok(self.vocab_size, ids.size,
                                    self.embedding_dim)):
            from ..parallel.mesh import active_mesh

            if (active_mesh() is None
                    and plan_matches(plan, ids.size, self.table.shape[0],
                                     self.embedding_dim)):
                emb = planned_gather(self.table, ids, plan)
                return emb * (ids != 0)[..., None]
            dp = _dp_plan_setup(plan, ids.size, self.table.shape[0],
                                self.embedding_dim)
            if dp is not None:
                from .kernels.embedding_grad import planned_gather_dp

                emb = planned_gather_dp(self.table, ids, plan, dp)
                return emb * (ids != 0)[..., None]
            tp = _tp_plan_setup(plan, ids.size, self.table.shape[0],
                                self.embedding_dim)
            if tp is not None:
                from .kernels.embedding_grad import planned_gather_tp

                emb = planned_gather_tp(self.table, ids, plan, tp)
                return emb * (ids != 0)[..., None]
            # plain plan + active mesh: GSPMD-safe gather (see FusedEmbedding)
        emb = fused_gather(self.table, ids, prefer_kernel=prefer_kernel_grad)
        return emb * (ids != 0)[..., None]


def attach_item_plan(batch: dict, vocab_size: int, embedding_dim: int,
                     force: bool = False, n_shards: int = 0,
                     with_global: bool = False, n_model: int = 1,
                     ids_key: str = "hist_item_list") -> dict:
    """Host-side: sort plan for the sequence item-table lookup.  ``force``
    waives the lookup-count threshold (a perf gate only) — the fused-update
    train step needs a plan on EVERY batch, including a small final one.
    ``n_shards`` > 1 builds a stacked per-data-shard plan (mesh path);
    ``with_global`` adds the whole-batch plan for the mesh fused update.
    ``ids_key`` selects which batch array the model actually looks up —
    ``graph_nodes`` for the session-graph family (attach_session_graph)."""
    hist = batch.get(ids_key)
    if hist is None or "emb_plan" in batch:
        return batch
    _attach_plans(batch,
                  lambda: np.asarray(hist, dtype=np.int64).reshape(-1),
                  vocab_size, int(np.prod(hist.shape)), embedding_dim,
                  force, n_shards, with_global, batch_rows=hist.shape[0],
                  n_model=n_model)
    return batch


class LRLayer(nn.Module):
    """Wide/linear part (parity: rec_pangu/models/layers/shallow.py:14-27):
    1-dim fused embedding of sparse features ++ dense passthrough -> Dense(1)."""

    spec: FeatureSpec

    @nn.compact
    def __call__(self, sparse_ids: jnp.ndarray, dense: jnp.ndarray,
                 plan: Optional[dict] = None) -> jnp.ndarray:
        emb = FusedEmbedding(self.spec, 1)(sparse_ids, plan)[..., 0]  # [B, F]
        x = jnp.concatenate([emb, dense], axis=1)
        from .initializers import torch_linear_bias

        return nn.Dense(1, kernel_init=EMB_INIT,
                        bias_init=torch_linear_bias(x.shape[-1]))(x)
