"""Train step with the embedding Adam update fused into the backward kernel.

The standard step (``steps.make_train_step``) materializes a dense [V, D]
embedding gradient and then runs a full-table optax Adam pass — 8 full-table
HBM passes per step for the big fused tables (docs/perf_notes.md §1).  This
step instead:

1. holds the fused tables out of autodiff (``FusedEmbedding`` 'capture' mode:
   the model adds a zero leaf to the gathered rows, whose cotangent IS
   d(loss)/d(rows) — no dense table gradient ever exists);
2. updates every non-table parameter with a masked optax Adam (identical
   schedule/betas);
3. updates each table with ``ops.kernels.fused_adam.planned_adam_update`` —
   the planned-backward grid applies dense-semantics Adam tile-by-tile while
   the gradient tile is still in VMEM.

Semantics match the unfused step (optax.adam over dense grads) to kernel
matmul precision; A/B'd in ``tests/test_fused_adam.py``.  Single-device,
TPU-only, plan-carrying batches only — ``fused_update_applicable`` gates it
and callers fall back to the standard step otherwise.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from ..ops.kernels.embedding_grad import (padded_rows, plan_matches,
                                          planned_path_ok, stream_ids)
from ..ops.kernels.fused_adam import adam_hyper, planned_adam_update
from .optim import make_lr_schedule
from .steps import TrainState

ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8  # torch defaults (trainer.py:75)


def _moment_dtype():
    """Storage dtype for the fused tables' Adam moments.

    ``REC_PANGU_TPU_MOMENT_DTYPE=bf16`` stores mu/nu in bfloat16 — the fused
    Adam pass is HBM-roofline-bound (6 full-table streams/step) and this
    removes a third of that traffic (~0.7 ms at the DeepFM bench shape).  The
    in-kernel math stays f32; storage rounding perturbs each step's effective
    update by ~2^-9 relative (measured quality on the MovieLens ratings CTR
    leg is within seed noise — docs/perf_notes.md §1).  Default f32 keeps
    bit-comparable optax parity."""
    import os

    v = os.environ.get("REC_PANGU_TPU_MOMENT_DTYPE", "f32").lower()
    if v in ("bf16", "bfloat16"):
        return jnp.bfloat16
    return jnp.float32


def find_fused_tables(params, total_rows: int) -> Optional[Dict[Tuple[str, ...], int]]:
    """Locate FusedEmbedding tables in a param tree: leaves named 'table' with
    ``padded_rows(total_rows)`` rows.  Returns {param_path: embedding_dim} —
    capture leaves are keyed by the owning MODULE's path, so several tables
    of the same dim (e.g. AFN's ensemble second embedding) each get their
    own cotangent stream."""
    rows = padded_rows(total_rows)
    flat = traverse_util.flatten_dict(params)
    by_path: Dict[Tuple[str, ...], int] = {}
    for path, leaf in flat.items():
        if path[-1] == "table" and getattr(leaf, "ndim", 0) == 2 \
                and leaf.shape[0] == rows:
            by_path[path] = leaf.shape[1]
    return by_path or None


def fused_update_applicable(model, params, sample_batch,
                            mesh=None) -> Optional[Dict[int, Tuple[str, ...]]]:
    """Gate: a TPU ranking/multi-task batch with a sort plan whose tables all
    qualify for the planned path.  Under a data-parallel mesh the batch must
    carry BOTH the per-shard plan (forward) and the global plan (update)."""
    spec = getattr(model, "spec", None)
    sparse = sample_batch.get("sparse")
    plan = sample_batch.get("emb_plan")
    if spec is None or sparse is None or plan is None:
        return None
    if mesh is not None:
        from ..parallel.mesh import MODEL_AXIS

        if mesh.shape[MODEL_AXIS] != 1:
            return None  # row-sharded tables keep the GSPMD path
        plan = sample_batch.get("emb_plan_global")
        if plan is None:
            return None
    tables = find_fused_tables(params, spec.total_rows)
    if not tables:
        return None
    from ..ops.kernels.fused_adam import fused_adam_fits

    n = int(np.prod(sparse.shape))
    rows = padded_rows(spec.total_rows)
    for _, dim in tables.items():
        if not planned_path_ok(spec.total_rows, n, dim):
            return None
        # fit computed at the PLAN's tile — a table dim above the plan's
        # build dim would otherwise pass the gate but blow VMEM at run time
        if not fused_adam_fits(rows, dim, plan=plan):
            return None
    emb_dim = max(tables.values())
    if (not plan_matches(plan, n, rows, emb_dim)
            or "tile_starts" not in plan):
        return None
    return tables


def init_fused_opt_state(params, tables: Dict[int, Tuple[str, ...]], lr: float,
                         steps_per_epoch: int, lr_scheduler_type: str = "",
                         scheduler_params: Optional[dict] = None):
    """(tx, opt_state) for the fused step: masked optax Adam over everything
    except the tables + zero Adam moments per table."""
    schedule = make_lr_schedule(lr, steps_per_epoch, lr_scheduler_type,
                                scheduler_params)
    table_paths = set(tables.keys())

    def mask(tree):
        flat = traverse_util.flatten_dict(tree)
        return traverse_util.unflatten_dict(
            {p: p not in table_paths for p in flat})

    tx = optax.masked(
        optax.adam(schedule, b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS), mask)
    flat = traverse_util.flatten_dict(params)
    mdt = _moment_dtype()
    emb_state = {
        "/".join(path): {"mu": jnp.zeros_like(flat[path], dtype=mdt),
                         "nu": jnp.zeros_like(flat[path], dtype=mdt)}
        for path in table_paths
    }
    return tx, (tx.init(params), emb_state)


def maybe_enable_fused_update(state: TrainState, model, sample_batch,
                              lr: float, steps_per_epoch: int,
                              lr_scheduler_type: str = "",
                              scheduler_params: Optional[dict] = None,
                              optimizer: str = "adam", mesh=None):
    """Swap a freshly-initialized TrainState onto the fused-update path when
    it applies.  Returns (state, train_step, tables) — train_step is None
    (and the state untouched) when the model/batch/backend does not qualify,
    the optimizer is not plain Adam, or REC_PANGU_TPU_FUSED_ADAM=0."""
    import os

    if optimizer.lower() != "adam":
        return state, None, None  # the kernel implements plain-Adam math only
    if os.environ.get("REC_PANGU_TPU_FUSED_ADAM", "1") not in ("1", "on", "true"):
        return state, None, None
    if int(state.step) != 0:
        return state, None, None  # moments would be lost; resume uses std step
    tables = fused_update_applicable(model, state.params, sample_batch,
                                     mesh=mesh)
    if not tables:
        return state, None, None
    tx, opt_state = init_fused_opt_state(
        state.params, tables, lr, steps_per_epoch, lr_scheduler_type,
        scheduler_params)
    state = state.replace(tx=tx, opt_state=opt_state)
    step = make_fused_update_train_step(
        model, tables, lr, steps_per_epoch, lr_scheduler_type,
        scheduler_params, has_batch_stats=state.batch_stats is not None,
        mesh=mesh)
    return state, step, tables


def _fused_step_fn(model, tables: Dict[int, Tuple[str, ...]],
                   lr: float, steps_per_epoch: int,
                   lr_scheduler_type: str = "",
                   scheduler_params: Optional[dict] = None,
                   has_batch_stats: bool = False, mesh=None):
    """Un-jitted (state, batch, rng) -> (state, out) with in-kernel table Adam.

    ``state.opt_state`` must be the pair from ``init_fused_opt_state`` and
    ``state.tx`` its masked transform.  Under a data-parallel ``mesh`` the
    batch carries a per-shard plan (forward) plus ``emb_plan_global`` (the
    update kernel's plan); the cotangent rows are all_gathered — the sparse-DP
    gradient exchange (see planned_adam_update_mesh) — and every chip runs
    the identical fused Adam pass.  Replicated partial batches ship one plain
    plan that serves both roles."""
    schedule = make_lr_schedule(lr, steps_per_epoch, lr_scheduler_type,
                                scheduler_params)
    offsets = np.asarray(model.spec.offsets, dtype=np.int64)
    paths = tuple(sorted(tables))  # param paths; capture key drops 'table'

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        rngs = {"dropout": step_rng, "routing": jax.random.fold_in(step_rng, 1)}
        plan = batch["emb_plan"]
        rows_sharded = getattr(plan["meta"], "ndim", 1) == 2  # trace-static
        gplan = batch.get("emb_plan_global", plan)
        sparse = batch["sparse"]
        n = int(np.prod(sparse.shape))

        def loss_fn(params, cap):
            b = dict(batch)
            b["emb_plan"] = {**plan, "capture": cap}
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                out, mutated = state.apply_fn(
                    variables, b, True, rngs=rngs, mutable=["batch_stats"])
                return out["loss"], (out, mutated.get("batch_stats"))
            out = state.apply_fn(variables, b, True, rngs=rngs)
            return out["loss"], (out, None)

        cap = {"/".join(p[:-1]): jnp.zeros((n, tables[p]), jnp.float32)
               for p in paths}
        (grads, cap_grads), (out, new_bs) = jax.grad(
            loss_fn, (0, 1), has_aux=True)(state.params, cap)

        base_state, emb_state = state.opt_state
        updates, new_base = state.tx.update(grads, base_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        hyper = adam_hyper(state.step + 1, schedule(state.step),
                           ADAM_B1, ADAM_B2, ADAM_EPS)
        flat = traverse_util.flatten_dict(new_params)
        new_emb_state = dict(emb_state)
        fused_ids = (jnp.asarray(sparse, jnp.int32)
                     + jnp.asarray(offsets, jnp.int32)[None, :]).reshape(-1)
        for path in paths:
            key = "/".join(path)
            cap_key = "/".join(path[:-1])
            table = flat[path]
            ids_stream = stream_ids(gplan, fused_ids, table.shape[0])
            if mesh is not None:
                from ..ops.kernels.fused_adam import planned_adam_update_mesh

                new_t, new_mu, new_nu = planned_adam_update_mesh(
                    gplan, ids_stream, cap_grads[cap_key], table,
                    emb_state[key]["mu"], emb_state[key]["nu"], hyper,
                    mesh, rows_sharded=rows_sharded)
            else:
                new_t, new_mu, new_nu = planned_adam_update(
                    gplan, ids_stream, cap_grads[cap_key], table,
                    emb_state[key]["mu"], emb_state[key]["nu"], hyper)
            flat[path] = new_t
            new_emb_state[key] = {"mu": new_mu, "nu": new_nu}
        new_params = traverse_util.unflatten_dict(flat)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs if has_batch_stats else None,
            opt_state=(new_base, new_emb_state),
        )
        return new_state, out

    return train_step


def make_fused_update_train_step(*args, **kwargs):
    """Jitted single-step fused-update trainer (see ``_fused_step_fn``).

    The state is intentionally NOT donated: donation compiles to must-alias
    pairs, forcing XLA to copy the Adam kernel's fresh [V, D] outputs back
    into the donated table buffers (3 full-table copies, ~2 ms at the bench
    shape) — and writing the kernel's outputs in-place instead (via
    input_output_aliases) serializes Mosaic's output write-back against the
    input fetches (scripts/exp_stream_sweep.py: 4.6 vs 2.8 ms for the 6-pass
    stream).  Fresh outputs + no donation is the fast configuration; the cost
    is one transient extra copy of the big tables (old + new live across the
    step), which the reference workloads have ample HBM for."""
    return jax.jit(_fused_step_fn(*args, **kwargs))


# --------------------------------------------------------------------------- #
# sequence-recall path: planned hist grads + streaming-CE dense grad, both
# applied by one kernel pass
# --------------------------------------------------------------------------- #
def seq_fused_applicable(model, params, sample_batch,
                         mesh=None) -> Optional[dict]:
    """Gate for the sequence fused update: a ``fused_update_compatible``
    model (its ONLY table uses are the planned hist lookup + full-softmax CE),
    a plan-carrying batch, and a big CHUNK_V-aligned table that fits the
    dense-stream kernel.  Under a data-parallel mesh the batch must also
    carry the global plan (``emb_plan_global``)."""
    from ..ops.softmax_ce import _FUSED_MIN_VOCAB, CHUNK_V

    if not getattr(model, "fused_update_compatible", False):
        return None
    cfg = getattr(model, "config", None) or {}
    if cfg.get("loss_type", "full") != "full":
        return None
    ids_key = getattr(model, "fused_lookup_key", "hist_item_list")
    hist = sample_batch.get(ids_key)
    plan = sample_batch.get("emb_plan")
    if hist is None or plan is None:
        return None
    if mesh is not None:
        from ..parallel.mesh import MODEL_AXIS

        if mesh.shape[MODEL_AXIS] != 1:
            return None  # row-sharded tables keep the GSPMD path
        plan = sample_batch.get("emb_plan_global")
        if plan is None:
            return None
    from ..data.encoder import OOV_SENTINEL

    item_col = cfg.get("item_col", "item_id")
    enc = getattr(model, "enc_dict", None) or {}
    if item_col not in enc:
        return None
    vocab = int(enc[item_col][OOV_SENTINEL])
    rows = padded_rows(vocab)
    if vocab < _FUSED_MIN_VOCAB or rows % CHUNK_V:
        return None
    flat = traverse_util.flatten_dict(params)
    path = ("item_emb", "table")
    leaf = flat.get(path)
    if leaf is None or leaf.shape[0] != rows:
        return None
    dim = leaf.shape[1]
    n = int(np.prod(hist.shape))
    if not planned_path_ok(vocab, n, dim):
        return None
    from ..ops.kernels.fused_adam import fused_adam_fits

    uses_ce = bool(getattr(model, "fused_uses_ce", True))
    if not fused_adam_fits(rows, dim, has_dense=uses_ce, plan=plan):
        return None
    if not plan_matches(plan, n, rows, dim) or "tile_starts" not in plan:
        return None
    return {"path": path, "dim": dim, "rows": rows, "vocab": vocab,
            "uses_ce": uses_ce}


def _seq_fused_step_fn(model, info: dict, lr: float, steps_per_epoch: int,
                       lr_scheduler_type: str = "",
                       scheduler_params: Optional[dict] = None, mesh=None):
    """Un-jitted sequence train step with in-kernel item-table Adam.

    The capture dict routes BOTH table-gradient sources to zero leaves:
    ``cap["hist"]`` (the planned hist-lookup rows, ItemEmbedding capture
    mode) and ``cap["ce_t"]`` (the streaming CE's transposed dense grad,
    ``fused_softmax_ce_captured``); one ``planned_adam_update`` pass applies
    their sum — no full-table add or separate optimizer pass."""
    schedule = make_lr_schedule(lr, steps_per_epoch, lr_scheduler_type,
                                scheduler_params)
    path, dim, rows = info["path"], info["dim"], info["rows"]
    key = "/".join(path)

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        rngs = {"dropout": step_rng, "routing": jax.random.fold_in(step_rng, 1)}
        plan = batch["emb_plan"]
        rows_sharded = getattr(plan["meta"], "ndim", 1) == 2  # trace-static
        gplan = batch.get("emb_plan_global", plan)
        # the ids the PLAN covers (graph_nodes for the session-graph family,
        # aug_all for host-augmented contrastive models, hist otherwise)
        hist = batch[getattr(model, "fused_lookup_key", "hist_item_list")]
        n = int(np.prod(hist.shape))

        def loss_fn(params, cap):
            b = dict(batch)
            b["emb_plan"] = {**plan, "capture": cap}
            out = state.apply_fn({"params": params}, b, True, rngs=rngs)
            return out["loss"], out

        cap = {"hist": jnp.zeros((n, dim), jnp.float32)}
        if info.get("uses_ce", True):
            # models without a full-softmax term (fused_uses_ce=False) skip
            # the dense capture — no zero [D, rows] stream through the kernel
            cap["ce_t"] = jnp.zeros((dim, rows), jnp.float32)
        (grads, cap_grads), out = jax.grad(
            loss_fn, (0, 1), has_aux=True)(state.params, cap)

        base_state, emb_state = state.opt_state
        updates, new_base = state.tx.update(grads, base_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        hyper = adam_hyper(state.step + 1, schedule(state.step),
                           ADAM_B1, ADAM_B2, ADAM_EPS)
        flat = traverse_util.flatten_dict(new_params)
        table = flat[path]
        ids = jnp.asarray(hist, jnp.int32).reshape(-1)
        ids_stream = stream_ids(gplan, ids, rows)
        if mesh is not None:
            from ..ops.kernels.fused_adam import planned_adam_update_mesh

            new_t, new_mu, new_nu = planned_adam_update_mesh(
                gplan, ids_stream, cap_grads["hist"], table,
                emb_state[key]["mu"], emb_state[key]["nu"], hyper,
                mesh, rows_sharded=rows_sharded,
                dense_grad_t=cap_grads.get("ce_t"))
        else:
            new_t, new_mu, new_nu = planned_adam_update(
                gplan, ids_stream, cap_grads["hist"], table,
                emb_state[key]["mu"], emb_state[key]["nu"], hyper,
                dense_grad_t=cap_grads.get("ce_t"))
        flat[path] = new_t
        new_params = traverse_util.unflatten_dict(flat)
        new_emb_state = {key: {"mu": new_mu, "nu": new_nu}}

        return state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=(new_base, new_emb_state),
        ), out

    return train_step


def maybe_enable_seq_fused_update(state: TrainState, model, sample_batch,
                                  lr: float, steps_per_epoch: int,
                                  lr_scheduler_type: str = "",
                                  scheduler_params: Optional[dict] = None,
                                  optimizer: str = "adam", mesh=None):
    """Sequence-trainer analogue of ``maybe_enable_fused_update``.  Returns
    (state, train_step, info) with train_step None when not applicable."""
    import os

    if optimizer.lower() != "adam":
        return state, None, None  # the kernel implements plain-Adam math only
    if os.environ.get("REC_PANGU_TPU_FUSED_ADAM", "1") not in ("1", "on", "true"):
        return state, None, None
    if os.environ.get("REC_PANGU_TPU_FUSED_CE", "auto") in ("0", "off", "false"):
        return state, None, None  # capture CE relies on the padded fused path
    if int(state.step) != 0 or state.batch_stats is not None:
        return state, None, None
    info = seq_fused_applicable(model, state.params, sample_batch, mesh=mesh)
    if not info:
        return state, None, None
    tx, opt_state = init_fused_opt_state(
        state.params, {info["path"]: info["dim"]}, lr, steps_per_epoch,
        lr_scheduler_type, scheduler_params)
    state = state.replace(tx=tx, opt_state=opt_state)
    # no donation — see make_fused_update_train_step (avoids 3 full-table
    # copy-backs into donated buffers)
    step = jax.jit(_seq_fused_step_fn(model, info, lr, steps_per_epoch,
                                      lr_scheduler_type, scheduler_params,
                                      mesh=mesh))
    return state, step, info


def make_fused_multi_step(num_steps: int, *args, **kwargs):
    """Fused K-step trainer: one dispatch scans ``num_steps`` fused-update
    steps over a stacked batch pytree (leading axis K; plans are arrays, so
    ``batch["emb_plan"]`` stacks like any other leaf).  Amortizes the host
    dispatch gap the same way ``steps.make_multi_step`` does for the standard
    step; returns per-step outputs with a leading [K] axis."""
    single = _fused_step_fn(*args, **kwargs)

    def multi_step(state: TrainState, stacked_batches, rng):
        def body(st, batch):
            return single(st, batch, rng)

        return jax.lax.scan(body, state, stacked_batches)

    # no donation — see make_fused_update_train_step
    return jax.jit(multi_step)


def make_seq_fused_multi_step(num_steps: int, *args, **kwargs):
    """Sequence analogue of ``make_fused_multi_step``: one dispatch scans
    ``num_steps`` seq-fused steps (planned hist grads + streaming-CE dense
    grad + in-kernel item-table Adam) over a stacked batch pytree.  The
    expensive sequence zoo pays one host dispatch per K optimizer steps."""
    single = _seq_fused_step_fn(*args, **kwargs)

    def multi_step(state: TrainState, stacked_batches, rng):
        def body(st, batch):
            return single(st, batch, rng)

        return jax.lax.scan(body, state, stacked_batches)

    # no donation — see make_fused_update_train_step
    return jax.jit(multi_step)
