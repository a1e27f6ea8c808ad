"""Trainer API layer — RankTrainer / SequenceTrainer.

API parity with rec_pangu/trainer.py (RankTrainer:23-236,
SequenceTrainer:239-409): same method names and fit() signature shape, same
checkpoint layout (per-epoch ``model_e_{i}``, ``model_best``, final
``model`` / ``model_all`` with enc_dict), same early-stopping semantics
(monitor metric must improve; patience in epochs, trainer.py:110-118), same
metric names.

Engine differences (the TPU-native part): one jitted fused
forward+backward+Adam step with donated state instead of a Python autograd
loop; metrics accumulated as device arrays and computed once per epoch on host
instead of per-batch sklearn calls on an ever-growing list
(model_pipeline.py:60-63).
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..data.dataset import MultiTaskDataset, RankingDataset
from ..data.loader import DataLoader
from ..eval.metrics import RollingMetricBuffer, compute_ranking_metrics
from ..eval.retrieval import evaluate_recall, get_recall_predict
from ..utils.logging import HAS_WANDB, logger, wandb
from .ckpt import load_checkpoint, save_checkpoint
from .optim import make_optimizer
from .steps import (TrainState, create_train_state, make_eval_step,
                    make_multi_step, make_step_rng, make_train_step,
                    strip_host_keys)


class _BaseTrainer:
    def __init__(self, num_task: int = 1, model_ckpt_dir: str = "./model_ckpt",
                 wandb_config: Optional[dict] = None):
        self.num_task = num_task
        self.model_ckpt_dir = model_ckpt_dir
        self.wandb_config = wandb_config
        self.use_wandb = wandb_config is not None and HAS_WANDB
        self.state: Optional[TrainState] = None
        self.model = None
        self._has_bs = False
        self._train_step = None
        self._eval_step = None
        self._pending_pretrained: List = []

    def set_pretrained_weights(self, model, col_name: str, pretrained_dict: dict,
                               trainable: bool = True):
        """Parity: BaseModel.set_pretrained_weights (base_model.py:61-90).
        Queued and applied when fit() initializes the parameters."""
        self._pending_pretrained.append((col_name, pretrained_dict, trainable))
        logger.info(f"Queued pretrained embedding for column:{col_name} "
                    f"With Trainable={trainable}")

    def _wandb_init(self):
        """Parity: rec_pangu/trainer.py:46-49 — pop the api key, login,
        then init with the remaining config."""
        cfg = dict(self.wandb_config)
        key = cfg.pop("key", None)
        if key:
            wandb.login(key=key)
        wandb.init(**cfg)

    def _put(self, batch, stacked: bool = False):
        """Shard a host batch over the data axis when a mesh is active.

        ``stacked`` marks multi-step batches [K, B, ...]: the batch axis is
        axis 1.  Batches whose batch axis is not divisible by the data-axis
        size (e.g. the final partial batch with drop_last=False) are placed
        replicated instead — correct, just not data-parallel for that batch.
        """
        if getattr(self, "mesh", None) is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        n_data = self.mesh.shape[DATA_AXIS]
        axis = 1 if stacked else 0
        # divisibility is judged on a batch-row leaf, not the plan sub-dict
        # (stacked per-shard plan leaves always divide by n_data)
        some = next(v for v in batch.values() if hasattr(v, "shape"))
        if some.shape[axis] % n_data != 0:
            return jax.device_put(
                batch, NamedSharding(self.mesh, P()))
        spec = P(None, DATA_AXIS) if stacked else P(DATA_AXIS)
        gplan = batch.get("emb_plan_global")
        if gplan is None:
            return jax.device_put(batch, NamedSharding(self.mesh, spec))
        # the global plan is consumed replicated by the fused update's
        # shard_map region (and its leaves need not divide the data axis)
        rest = {k: v for k, v in batch.items() if k != "emb_plan_global"}
        rest = jax.device_put(rest, NamedSharding(self.mesh, spec))
        rest["emb_plan_global"] = jax.device_put(
            gplan, NamedSharding(self.mesh, P()))
        return rest

    def _attach_plan(self, batch, force_fused: bool = False,
                     for_train: bool = True):
        """Host-side embedding sort plan (docs/perf_notes.md §1): skips XLA's
        row-serial scatter in the embedding backward.  Under a data-parallel
        mesh (trivial 'model' axis) the plan is built PER DATA SHARD and the
        lookup runs in a shard_map region; the fused-update TRAIN step
        additionally ships ``emb_plan_global`` for its all_gather+Adam kernel
        pass.  Eval/predict callers pass ``for_train=False``: plans remain a
        forward-only perf hint there (no forcing, no global plan).  Meshes
        that row-shard the tables ('model' axis > 1) get capacity-bounded
        TP bucket plans (make_tp_sort_plan); overflow falls back to the
        GSPMD gather for that batch."""
        n_shards = 0  # 0 = single-device plain plan; >=1 = mesh mode
        n_model = 1   # >1 = tensor-parallel row-sharded tables
        if getattr(self, "mesh", None) is not None:
            from ..parallel.mesh import DATA_AXIS, MODEL_AXIS

            n_model = self.mesh.shape[MODEL_AXIS]
            n_shards = self.mesh.shape[DATA_AXIS]
        model = getattr(self, "model", None)
        if model is None:
            return batch
        # fused-update mode needs a plan on EVERY train batch (the step's
        # optimizer state only updates through the kernel); ``force_fused``
        # (the enable-time probe) only adds the global plan — the lookup-count
        # perf gate still decides whether the fused path turns on at all
        force = for_train and getattr(self, "_fused_step", None) is not None
        with_global = (n_shards > 0 and n_model == 1 and for_train
                       and (force or force_fused))
        if "hist_item_list" in batch:  # sequence-recall batch
            cfg = getattr(model, "config", None)
            enc = getattr(model, "enc_dict", None)
            if not cfg or enc is None:
                return batch
            item_col = cfg.get("item_col", "item_id")
            if item_col not in enc:
                return batch
            from ..models.base import OOV_SENTINEL
            from ..ops.embedding import attach_item_plan

            vocab = int(enc[item_col][OOV_SENTINEL])
            dim = int(cfg["embedding_dim"])
            ids_key = "hist_item_list"
            if getattr(model, "host_aug", False) and for_train and not n_shards:
                # Under a DP mesh the [3B] = [hist; aug1; aug2] stack would
                # row-split across views, so device augmentation (unfused)
                # stays there — but the plain hist lookup below still gets
                # its planned-gather perf hint, as do eval batches.
                from ..models.sequence.contrarec import host_augment_sequences

                if "aug_all" not in batch:
                    hist = np.asarray(batch["hist_item_list"])
                    mask_token = vocab - 1
                    beta_a = float(cfg.get("beta_a", 3.0))
                    beta_b = float(cfg.get("beta_b", 3.0))
                    rng = getattr(self, "_aug_rng", None)
                    if rng is None:
                        rng = self._aug_rng = np.random.default_rng(10_301)
                    aug1 = host_augment_sequences(rng, hist, beta_a, beta_b,
                                                  mask_token)
                    aug2 = host_augment_sequences(rng, hist, beta_a, beta_b,
                                                  mask_token)
                    batch["aug_all"] = np.concatenate([hist, aug1, aug2],
                                                      axis=0)
                return attach_item_plan(batch, vocab, dim, force=force,
                                        ids_key="aug_all")
            if getattr(model, "session_graph", False):
                # SRGNN family: build nodes/alias on host (ops/graph.py) so
                # the lookup ids are host-visible — the sort plan (and the
                # fused update) then covers the NODE lookup
                from ..ops.graph import attach_session_graph

                attach_session_graph(batch)
                ids_key = "graph_nodes"
            extras = getattr(model, "lookup_extra", ())
            if extras and for_train:
                # fold the model's extra gradient-carrying id reads (target
                # items, host-sampled negatives) into one [B, L+len(extras)]
                # planned lookup (r5, VERDICT r4 item 5)
                if getattr(model, "host_negatives", False) \
                        and "neg_items" not in batch:
                    rng = getattr(self, "_aug_rng", None)
                    if rng is None:
                        rng = self._aug_rng = np.random.default_rng(10_301)
                    b_rows = np.asarray(batch["hist_item_list"]).shape[0]
                    batch["neg_items"] = rng.integers(
                        1, max(vocab - 1, 2), b_rows).astype(np.int32)
                if "lookup_all" not in batch \
                        and all(k in batch for k in extras):
                    hist_arr = np.asarray(batch["hist_item_list"])
                    parts = [hist_arr.reshape(hist_arr.shape[0], -1)]
                    parts += [np.asarray(batch[k]).reshape(
                        hist_arr.shape[0], -1) for k in extras]
                    batch["lookup_all"] = np.concatenate(
                        parts, axis=1).astype(np.int32)
                if "lookup_all" in batch:
                    ids_key = "lookup_all"
            if (n_shards and force
                    and batch["hist_item_list"].shape[0] % n_shards):
                # replicated partial batch on the fused path: one plain plan
                # serves both the capture forward and the update kernel
                return attach_item_plan(batch, vocab, dim, force=True,
                                        ids_key=ids_key)
            return attach_item_plan(batch, vocab, dim, force=force,
                                    n_shards=n_shards,
                                    with_global=with_global, n_model=n_model,
                                    ids_key=ids_key)
        spec = getattr(model, "spec", None)
        dim = getattr(model, "embedding_dim", None)
        if spec is None or dim is None:
            return batch
        from ..ops.embedding import attach_emb_plan

        sparse = batch.get("sparse")
        if (n_shards and force and sparse is not None
                and sparse.shape[0] % n_shards):
            # replicated partial batch on the fused path: one plain plan
            return attach_emb_plan(batch, spec, dim, force=True)
        return attach_emb_plan(batch, spec, dim, force=force,
                               n_shards=n_shards, with_global=with_global,
                               n_model=n_model)

    # ---------------------------------------------------------------- engine
    def _build_state(self, model, sample_batch, lr, steps_per_epoch,
                     lr_scheduler_type="", scheduler_params=None, seed=1029,
                     mesh=None):
        from ..utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
        if os.environ.get("REC_PANGU_TPU_DEBUG_NANS", "0") in ("1", "on", "true"):
            # debug aid (SURVEY.md §5): jit re-runs op-by-op on NaN and raises
            # with the producing op — costs recompiles, never use in production
            jax.config.update("jax_debug_nans", True)
        self.mesh = mesh
        from ..parallel.mesh import set_active_mesh

        set_active_mesh(mesh)  # trace-time mesh for the shard_map planned path
        tx = make_optimizer(lr, steps_per_epoch, lr_scheduler_type, scheduler_params)
        rng = jax.random.PRNGKey(seed)
        # init in eval mode when the sample batch has no labels (inference-only)
        train_init = "label" in sample_batch or "target_item" in sample_batch \
            or "pos_item_id" in sample_batch
        self.state = create_train_state(model, sample_batch, tx, rng, train=train_init)
        if self._pending_pretrained:
            from ..models.pretrained import freeze_rows_transform, inject_pretrained
            import optax

            params = self.state.params
            frozen = []
            for col_name, pre_dict, trainable in self._pending_pretrained:
                params, touched = inject_pretrained(
                    params, model.enc_dict, col_name, pre_dict, model.embedding_dim)
                if not trainable:
                    frozen.extend(touched)
                logger.info(f"Set pretrained embedding weights for column:{col_name}")
            if frozen:
                tx = optax.chain(tx, freeze_rows_transform(frozen))
            self.state = self.state.replace(params=params, opt_state=tx.init(params),
                                            tx=tx)
        if mesh is not None:
            from ..parallel import shard_state

            self.state = shard_state(self.state, mesh)
        self.model = model
        self._has_bs = self.state.batch_stats is not None
        self._train_step = make_train_step(self._has_bs)
        self._eval_step = make_eval_step(self._has_bs)
        self._rng = make_step_rng(seed + 1)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(self.state.params))
        logger.info(f"Model initialized: {n_params:,} parameters")

    def _activate_mesh(self):
        """Re-assert this trainer's mesh as the trace-time active mesh.
        Called at the top of every method that can (re)trace a step — two
        interleaved trainers on different meshes would otherwise desync the
        capture forward (traced against the global) from the update kernel
        (mesh captured in the step closure)."""
        from ..parallel.mesh import set_active_mesh

        set_active_mesh(getattr(self, "mesh", None))

    def _variables(self):
        v = {"params": self.state.params}
        if self._has_bs:
            v["batch_stats"] = self.state.batch_stats
        return v

    # ------------------------------------------------------------- ckpt api
    def save_model(self, model, model_ckpt_dir: str):
        """Weights-only checkpoint (parity: trainer.py:124-135 'model.pth')."""
        path = os.path.join(model_ckpt_dir, "model.ckpt")
        save_checkpoint(path, self.state.params, self.state.batch_stats,
                        step=int(self.state.step))
        logger.info(f"Model saved to {path}")

    def save_all(self, model, enc_dict: dict, model_ckpt_dir: str):
        """Weights + enc_dict bundle (parity: trainer.py:137-150)."""
        path = os.path.join(model_ckpt_dir, "model.ckpt")
        save_checkpoint(path, self.state.params, self.state.batch_stats,
                        opt_state=self.state.opt_state, enc_dict=enc_dict,
                        step=int(self.state.step))
        logger.info(f"Model+enc_dict saved to {path}")

    def save_train_model(self, model, model_ckpt_dir: str, model_str: str):
        """Per-epoch checkpoint 'model_{str}.ckpt' (parity: trainer.py:152-164),
        including optimizer state so fit(resume_from=...) truly resumes."""
        path = os.path.join(model_ckpt_dir, f"model_{model_str}.ckpt")
        save_checkpoint(path, self.state.params, self.state.batch_stats,
                        opt_state=self.state.opt_state, step=int(self.state.step))

    def resume(self, path: str):
        """True resume (beyond the reference, which only saves): restore
        params, batch_stats, optimizer state and step counter."""
        ckpt = load_checkpoint(path)
        replacements = dict(params=ckpt["params"], batch_stats=ckpt["batch_stats"])
        if ckpt.get("opt_state") is not None:
            saved = ckpt["opt_state"]
            same = (jax.tree_util.tree_structure(saved)
                    == jax.tree_util.tree_structure(self.state.opt_state))
            if same:
                replacements["opt_state"] = saved
            else:
                logger.warning(
                    "Checkpoint optimizer state has a different structure "
                    "(fused vs standard embedding update) — restoring params "
                    "only; optimizer restarts from scratch")
        import jax.numpy as jnp

        replacements["step"] = jnp.asarray(ckpt.get("step", 0), jnp.int32)
        self.state = self.state.replace(**replacements)
        logger.info(f"Resumed from {path} at step {int(self.state.step)}")

    def load_model(self, model, path: str):
        """Restore params (+batch_stats) from a checkpoint into the trainer."""
        ckpt = load_checkpoint(path)
        if self.state is None:
            raise RuntimeError("call fit() or _build_state() before load_model()")
        self.state = self.state.replace(params=ckpt["params"],
                                        batch_stats=ckpt["batch_stats"])
        return ckpt


class RankTrainer(_BaseTrainer):
    """Driver for CTR ranking and multi-task models (parity: trainer.py:23-236)."""

    def fit(self, model, train_loader: DataLoader, valid_loader: Optional[DataLoader] = None,
            epoch: int = 10, lr: float = 1e-3, device=None,
            use_earlystopping: bool = False, max_patience: int = 999,
            monitor_metric: Optional[str] = None, lr_scheduler_type: str = "",
            scheduler_params: Optional[dict] = None, seed: int = 1029,
            log_rounds: int = 100, mesh=None, resume_from: Optional[str] = None,
            profile_dir: Optional[str] = None,
            steps_per_call: int = 1) -> Dict[str, float]:
        if self.use_wandb:
            self._wandb_init()
        os.makedirs(self.model_ckpt_dir, exist_ok=True)

        sample_batch = next(iter(train_loader))
        self._build_state(model, sample_batch, lr, len(train_loader),
                          lr_scheduler_type, scheduler_params, seed, mesh=mesh)
        self._std_step = self._train_step
        # fuse the big tables' Adam update into the planned backward kernel
        # (docs/perf_notes.md §1) — fresh-state, plain-Adam; under a mesh the
        # 'model' axis must be trivial (fused_update_applicable gates it)
        if not resume_from and not self._pending_pretrained:
            from .fused_update import maybe_enable_fused_update
            from .steps import strip_host_keys as _shk

            sb, _ = _shk(sample_batch)
            sb = self._attach_plan(dict(sb), force_fused=True)
            self.state, fstep, ftables = maybe_enable_fused_update(
                self.state, model, sb, lr, len(train_loader),
                lr_scheduler_type, scheduler_params, mesh=mesh)
            if fstep is not None:
                self._fused_step = fstep
                self._fused_tables = ftables
                self._train_step = fstep
                logger.info("Embedding Adam update fused into the planned "
                            "backward kernel")
        if resume_from:
            self.resume(resume_from)
        self._profile_dir = profile_dir
        self._steps_per_call = max(1, int(steps_per_call))
        if self._steps_per_call > 1:
            if getattr(self, "_fused_step", None) is not None:
                from .fused_update import make_fused_multi_step

                self._multi_step = make_fused_multi_step(
                    self._steps_per_call, model, self._fused_tables, lr,
                    len(train_loader), lr_scheduler_type, scheduler_params,
                    has_batch_stats=self._has_bs, mesh=mesh)
            else:
                self._multi_step = make_multi_step(self._has_bs,
                                                   self._steps_per_call)

        logger.info("Model Starting Training")
        best_epoch, best_metric = -1, -np.inf
        train_metric: Dict[str, float] = {}
        for i in range(1, epoch + 1):
            train_metric = self._train_one_epoch(train_loader, i, log_rounds)
            logger.info(f"Epoch {i} Train Metric:{train_metric}")
            if self.use_wandb:
                wandb.log(train_metric)
            if valid_loader is not None:
                valid_metric = self.evaluate_model(self.model, valid_loader)
                self.save_train_model(self.model, self.model_ckpt_dir, f"e_{i}")
                if self.use_wandb:
                    wandb.log(valid_metric)
                if use_earlystopping:
                    assert monitor_metric in valid_metric, (
                        f"{monitor_metric} not in Valid Metric {valid_metric.keys()}")
                    if valid_metric[monitor_metric] > best_metric:
                        best_epoch = i
                        best_metric = valid_metric[monitor_metric]
                        self.save_train_model(self.model, self.model_ckpt_dir, "best")
                    if i - best_epoch >= max_patience:
                        logger.info(f"EarlyStopping at the Epoch {i} Valid Metric:{valid_metric}")
                        break
                logger.info(f"Epoch {i} Valid Metric:{valid_metric}")
        return train_metric

    def _train_one_epoch(self, train_loader, epoch_idx: int, log_rounds: int):
        self._activate_mesh()
        profiling = getattr(self, "_profile_dir", None) and epoch_idx == 1
        if profiling:
            jax.profiler.start_trace(self._profile_dir)
        # bounded train-metric accumulation: constant host memory per epoch
        # (REC_PANGU_TPU_TRAIN_METRIC_WINDOW samples; fixture-sized epochs
        # are below the cap, so metrics are unchanged)
        window = int(os.environ.get("REC_PANGU_TPU_TRAIN_METRIC_WINDOW",
                                    str(1 << 20)))
        preds = RollingMetricBuffer(window)
        labels = RollingMetricBuffer(window)
        max_iter = len(train_loader)
        start = time.time()
        K = getattr(self, "_steps_per_call", 1)
        n_seen = 0  # true processed count (the metric window is bounded)

        def record(out, label, k_axis=False):
            if self.num_task == 1:
                p = out["pred"]
            else:
                p = jax.numpy.concatenate(
                    [out[f"task{t + 1}_pred"][..., None]
                     for t in range(self.num_task)], axis=-1)
            if k_axis:  # multi-step outputs carry a leading [K] axis
                p = p.reshape(-1, p.shape[-1]) if p.ndim > 2 else p.reshape(-1)
                label = label.reshape(-1, label.shape[-1]) \
                    if label.ndim > 2 else label.reshape(-1)
            preds.append(p)
            labels.append(label)
            nonlocal n_seen
            n_seen += int(label.shape[0])

        group: List[Dict] = []
        idx = 0
        for batch in train_loader:
            batch, _ = strip_host_keys(batch)
            batch = self._attach_plan(batch)
            if K > 1:
                group.append(batch)
                # stackable = same label shape AND same pytree structure (a
                # TP-plan capacity overflow can drop 'emb_plan' per batch)
                s0 = jax.tree_util.tree_structure(group[0])
                full = all(
                    g["label"].shape == group[0]["label"].shape
                    and jax.tree_util.tree_structure(g) == s0 for g in group)
                if len(group) == K and full:
                    stacked = jax.tree.map(lambda *xs: np.stack(xs), *group)
                    stacked = self._put(stacked, stacked=True)
                    self.state, outs = self._multi_step(self.state, stacked, self._rng)
                    record(outs, stacked["label"], k_axis=True)
                    group = []
                    idx += K
                elif not full:
                    # flush the unstackable tail one step at a time
                    for g in group:
                        g = self._put(g)
                        self.state, out = self._train_step(self.state, g, self._rng)
                        record(out, g["label"])
                        idx += 1
                    group = []
                continue
            batch = self._put(batch)
            self.state, out = self._train_step(self.state, batch, self._rng)
            record(out, batch["label"])
            if idx % log_rounds == 0:
                loss = float(out["loss"])
                elapsed = time.time() - start
                remaining = round(((elapsed / (idx + 1)) * (max_iter - idx + 1)) / 60, 2)
                logger.info(
                    f"Iter {idx}/{max_iter} Remaining time:{remaining} min Loss:{round(loss, 4)}")
                if self.use_wandb:
                    # per-batch loss stream (parity: model_pipeline.py:65-67),
                    # sampled every log_rounds batches to avoid a device sync
                    # per step
                    wandb.log({"loss": loss})
            idx += 1
        for g in group:  # remainder when the loader ends mid-group
            g = self._put(g)
            self.state, out = self._train_step(self.state, g, self._rng)
            record(out, g["label"])
        if profiling:
            jax.profiler.stop_trace()
            logger.info(f"Profiler trace written to {self._profile_dir}")
        pred_arr = preds.concat()
        label_arr = labels.concat()
        elapsed = time.time() - start
        n_devices = len(self.mesh.devices.flat) if getattr(self, "mesh", None) is not None else 1
        eps = n_seen / max(elapsed, 1e-9)
        logger.info(f"Epoch throughput: {eps:,.0f} examples/s "
                    f"({eps / n_devices:,.0f} examples/s/chip)")
        return compute_ranking_metrics(label_arr, pred_arr, prefix="train_",
                                       num_task=self.num_task)

    def evaluate_model(self, model, test_loader: DataLoader, device=None) -> Dict[str, float]:
        """Parity: model_pipeline.test_model — names 'roc_auc_score'/'log_loss'
        for single task, 'test_task{i}_*' for multi-task."""
        self._activate_mesh()
        preds, labels = [], []
        for batch in test_loader:
            batch, _ = strip_host_keys(batch)
            batch = self._attach_plan(batch, for_train=False)  # scan-select fwd
            batch = self._put(batch)
            out = self._eval_step(self.state, batch)
            if self.num_task == 1:
                preds.append(np.asarray(out["pred"]).reshape(-1, 1))
            else:
                preds.append(np.concatenate(
                    [np.asarray(out[f"task{t + 1}_pred"]).reshape(-1, 1)
                     for t in range(self.num_task)], axis=1))
            labels.append(np.asarray(batch["label"]).reshape(len(batch["label"]), -1))
        pred_arr = np.concatenate(preds)
        label_arr = np.concatenate(labels)
        prefix = "" if self.num_task == 1 else "test_"
        return compute_ranking_metrics(label_arr, pred_arr, prefix=prefix,
                                       num_task=self.num_task)

    def predict_dataloader(self, model, test_loader: DataLoader, device=None) -> np.ndarray:
        """Parity: trainer.py:182-213."""
        self._activate_mesh()
        preds = []
        for batch in test_loader:
            batch, _ = strip_host_keys(batch)
            batch = self._attach_plan(batch, for_train=False)
            out = self._eval_step(self.state, batch)
            if self.num_task == 1:
                preds.append(np.asarray(out["pred"]).reshape(-1))
            else:
                preds.append(np.concatenate(
                    [np.asarray(out[f"task{t + 1}_pred"]).reshape(-1, 1)
                     for t in range(self.num_task)], axis=1))
        return np.concatenate(preds)

    def predict_dataframe(self, model, test_df: pd.DataFrame, enc_dict: dict,
                          schema: dict, batch_size: int = 1024, device=None) -> np.ndarray:
        """Parity: trainer.py:215-236 — encode a raw df with the saved enc_dict."""
        from ..data.process_data import get_single_dataloader

        if self.num_task > 1 and not isinstance(schema.get("label_col"), list):
            ds = MultiTaskDataset(schema, test_df, enc_dict=enc_dict)
            loader = DataLoader(ds, batch_size=batch_size, shuffle=False)
        else:
            loader = get_single_dataloader(test_df, schema, enc_dict, batch_size)
        return self.predict_dataloader(model, loader)


class SequenceTrainer(_BaseTrainer):
    """Driver for sequence-recall models (parity: trainer.py:239-409)."""

    def __init__(self, model_ckpt_dir: str = "./model_ckpt",
                 wandb_config: Optional[dict] = None):
        super().__init__(num_task=1, model_ckpt_dir=model_ckpt_dir,
                         wandb_config=wandb_config)

    def fit(self, model, train_loader: DataLoader, valid_loader: Optional[DataLoader] = None,
            epoch: int = 50, lr: float = 1e-3, device=None,
            use_earlystopping: bool = False, max_patience: int = 999,
            monitor_metric: Optional[str] = None, log_rounds: int = 100,
            topk_list: Optional[List[int]] = None, lr_scheduler_type: str = "",
            scheduler_params: Optional[dict] = None, seed: int = 1029,
            mesh=None, steps_per_call: int = 1) -> None:
        topk_list = topk_list or [20, 50, 100]
        if self.use_wandb:
            self._wandb_init()
        os.makedirs(self.model_ckpt_dir, exist_ok=True)

        sample_batch, _ = strip_host_keys(next(iter(train_loader)))
        self._build_state(model, sample_batch, lr, len(train_loader),
                          lr_scheduler_type, scheduler_params, seed, mesh=mesh)
        # fuse the item table's Adam update into the planned backward kernel,
        # with the streaming CE's dense grad as an extra kernel stream (under
        # a mesh: all_gather'd hist cotangent + psum'd CE grad, every chip
        # running the identical kernel pass — seq_fused_applicable gates it)
        from .fused_update import maybe_enable_seq_fused_update

        sb = self._attach_plan(dict(sample_batch), force_fused=True)
        if self._pending_pretrained:
            # frozen pretrained rows ride the masked-optax freeze chain, which
            # the fused kernel's whole-table Adam pass would bypass
            sb.pop("emb_plan", None), sb.pop("emb_plan_global", None)
        self.state, fstep, _finfo = maybe_enable_seq_fused_update(
            self.state, model, sb, lr, len(train_loader),
            lr_scheduler_type, scheduler_params, mesh=mesh)
        if fstep is not None:
            self._fused_step = fstep
            self._train_step = fstep
            logger.info("Item-table Adam update fused into the planned "
                        "backward kernel (hist + softmax-CE grads)")
        renorm_paths = tuple(getattr(model, "renorm_param_paths", ()) or ())
        if renorm_paths:
            # projected optimization (reference in-forward renorm, e.g. CMI):
            # L2-renormalize the declared rows after every step; project the
            # fresh init too (the reference's first forward normalizes the
            # init before anything reads it)
            from .steps import make_param_renorm

            renorm = make_param_renorm(renorm_paths)
            self.state = self.state.replace(params=renorm(self.state.params))
            base_step = self._train_step

            def _renormed_step(state, batch, rng, _bs=base_step):
                state, out = _bs(state, batch, rng)
                return state.replace(params=renorm(state.params)), out

            self._train_step = _renormed_step
            if getattr(self, "_fused_step", None) is not None:
                self._fused_step = _renormed_step
            steps_per_call = 1  # the projection is per-step
        # K-step scan: one host dispatch per K optimizer steps — the
        # expensive sequence zoo amortizes dispatch the same way RankTrainer
        # does (VERDICT r2 item 4)
        self._steps_per_call = max(1, int(steps_per_call))
        if self._steps_per_call > 1:
            if fstep is not None:
                from .fused_update import make_seq_fused_multi_step

                self._multi_step = make_seq_fused_multi_step(
                    self._steps_per_call, model, _finfo, lr,
                    len(train_loader), lr_scheduler_type, scheduler_params,
                    mesh=mesh)
            else:
                self._multi_step = make_multi_step(self._has_bs,
                                                   self._steps_per_call)

        logger.info("Model Starting Training")
        log_rows = []
        best_epoch, best_metric = -1, -np.inf
        K = self._steps_per_call
        for i in range(1, epoch + 1):
            self._activate_mesh()
            start = time.time()
            max_iter = len(train_loader)
            group: List[Dict] = []
            idx = 0
            for batch in train_loader:
                batch, _ = strip_host_keys(batch)
                batch = self._attach_plan(batch)
                if K > 1:
                    group.append(batch)
                    # stackable = same hist shape AND same pytree structure
                    s0 = jax.tree_util.tree_structure(group[0])
                    full = all(
                        g["hist_item_list"].shape == group[0]["hist_item_list"].shape
                        and jax.tree_util.tree_structure(g) == s0
                        for g in group)
                    if len(group) == K and full:
                        stacked = jax.tree.map(lambda *xs: np.stack(xs), *group)
                        stacked = self._put(stacked, stacked=True)
                        self.state, outs = self._multi_step(
                            self.state, stacked, self._rng)
                        if (idx // K) % max(1, log_rounds // K) == 0:
                            loss = float(np.asarray(outs["loss"])[-1])
                            logger.info(f"Iter {idx}/{max_iter} "
                                        f"Loss:{round(loss, 4)}")
                        group = []
                        idx += K
                    elif not full:
                        # flush the unstackable tail one step at a time
                        for g in group:
                            g = self._put(g)
                            self.state, out = self._train_step(
                                self.state, g, self._rng)
                            idx += 1
                        group = []
                    continue
                batch = self._put(batch)
                self.state, out = self._train_step(self.state, batch, self._rng)
                if idx % log_rounds == 0:
                    loss = float(out["loss"])
                    elapsed = time.time() - start
                    remaining = round(((elapsed / (idx + 1)) * (max_iter - idx + 1)) / 60, 2)
                    logger.info(
                        f"Iter {idx}/{max_iter} Remaining time:{remaining} min Loss:{round(loss, 4)}")
                    if self.use_wandb:
                        # per-batch loss stream (parity: model_pipeline.py:
                        # 265-266), sampled every log_rounds batches
                        wandb.log({"loss": loss})
                idx += 1
            for g in group:  # remainder when the loader ends mid-group
                g = self._put(g)
                self.state, out = self._train_step(self.state, g, self._rng)
            if valid_loader is not None:
                valid_metric = self.evaluate_model(self.model, valid_loader,
                                                   topk_list=topk_list)
                logger.info(f"Epoch {i} Valid Metric:{valid_metric}")
                if self.use_wandb:
                    wandb.log(valid_metric)
                log_rows.append({"epoch": i, **valid_metric})
                pd.DataFrame(log_rows).to_csv(
                    os.path.join(self.model_ckpt_dir, "log.csv"), index=False)
                self.save_train_model(self.model, self.model_ckpt_dir, f"e_{i}")
                if use_earlystopping:
                    assert monitor_metric in valid_metric, (
                        f"{monitor_metric} not in Valid Metric {valid_metric.keys()}")
                    if valid_metric[monitor_metric] > best_metric:
                        best_epoch = i
                        best_metric = valid_metric[monitor_metric]
                        self.save_train_model(self.model, self.model_ckpt_dir, "best")
                    if i - best_epoch >= max_patience:
                        logger.info(f"EarlyStopping at the Epoch {i} Valid Metric:{valid_metric}")
                        break

    def evaluate_model(self, model, test_loader: DataLoader, device=None,
                       topk_list: Optional[List[int]] = None,
                       approx_recall_target: Optional[float] = None) -> Dict[str, float]:
        """Parity: model_pipeline.test_sequence_model:281-318 — top-200
        retrieval then per-k recall/ndcg/hitrate.  ``approx_recall_target``
        (e.g. 0.99) opts into the TPU approx top-k candidate scorer."""
        topk_list = topk_list or [20, 50, 100]
        self._activate_mesh()
        test_gd = test_loader.dataset.get_test_gd()
        preds = get_recall_predict(self.model, self._variables(), test_loader,
                                   topn=200, mesh=getattr(self, "mesh", None),
                                   approx_recall_target=approx_recall_target)
        metric_dict: Dict[str, float] = {}
        for k in topk_list:
            res = evaluate_recall(preds, test_gd, k)
            logger.info(res)
            metric_dict.update(res)
        return metric_dict


from functools import partial


@partial(jax.jit, static_argnames=("k",))
def _masked_topk(user_embs, item_embs, user_idx, seen, k):
    """Score a chunk of users against the full item table, bias out each
    user's already-seen items, and take the top-k — all on device.  ``seen``
    is [B, S] item ids padded with V; an extra sentinel column absorbs the
    pads so the scatter needs no mask."""
    u = user_embs[user_idx]
    scores = jnp.dot(u, item_embs.T, preferred_element_type=jnp.float32)
    scores = jnp.pad(scores, ((0, 0), (0, 1)))
    rows = jnp.arange(u.shape[0])[:, None]
    scores = scores.at[rows, seen].set(-jnp.inf)
    _, idx = jax.lax.top_k(scores[:, :-1], k)
    return idx


class GraphTrainer(_BaseTrainer):
    """Driver for graph-CF models (parity: trainer.py:412-434 +
    model_pipeline.py:321-365): BPR sampling per step, full-corpus top-k eval
    with train items filtered out."""

    def __init__(self, model_ckpt_dir: str = "./model_ckpt"):
        super().__init__(num_task=1, model_ckpt_dir=model_ckpt_dir)

    def fit(self, model, train_dataset, epoch: int = 10, lr: float = 1e-3,
            device=None, batch_size: int = 1024, seed: int = 1029,
            mesh=None) -> None:
        os.makedirs(self.model_ckpt_dir, exist_ok=True)
        sample = train_dataset.sample(batch_size)
        steps_per_epoch = max(1, len(train_dataset) // batch_size)
        self._build_state(model, sample, lr, steps_per_epoch, seed=seed,
                          mesh=mesh)
        for i in range(1, epoch + 1):
            epoch_loss = 0.0
            for _ in range(steps_per_epoch):
                batch = train_dataset.sample(batch_size)
                self.state, out = self._train_step(self.state, batch, self._rng)
                epoch_loss += float(out["loss"])
            logger.info(f"Epoch {i} Loss:{round(epoch_loss, 4)}")

    def evaluate_model(self, model, train_dataset, test_dataset,
                       hidden_size: int = None, topN: int = 50) -> Dict[str, float]:
        """Parity: model_pipeline.test_graph_model:344-365 — inner-product
        top-k over the full corpus with items seen in training filtered out.

        Device-side: scoring, the seen-item filter (a large-negative bias
        scattered at each user's train items), and the top-k all run inside
        one jitted function — the reference's host argsort + Python seen-set
        loop never materializes the [B, V] scores on host.  Seen-filtering
        before top-k ranks the same unseen items in the same order as the
        reference's filter-after-top-1000, and cannot come up short of topN
        candidates the way the reference can when >950 of a user's top-1000
        are already seen."""
        out = self._eval_step(self.state, {})
        user_embs = out["user_emb"]
        item_embs = out["item_emb"]
        train_gd = train_dataset.test_gd
        test_gd = test_dataset.test_gd
        users = np.fromiter(test_gd.keys(), dtype=np.int64)
        V = int(item_embs.shape[0])
        k = min(1000, V)
        # Pad per-user seen lists to one [B, S] id array; the pad slot points
        # at an extra sentinel column so the scatter stays shape-static.
        max_seen = max([len(train_gd.get(int(u), [])) for u in users] or [0])
        seen = np.full((len(users), max(1, max_seen)), V, dtype=np.int64)
        for i, u in enumerate(users):
            s = train_gd.get(int(u), [])
            if s:
                seen[i, : len(s)] = s
        # Fixed-size user chunks -> a single compile regardless of |users|.
        chunk = min(1024, len(users))
        pad = (-len(users)) % chunk
        users_p = np.pad(users, (0, pad))
        seen_p = np.pad(seen, ((0, pad), (0, 0)), constant_values=V)
        mesh = getattr(self, "mesh", None)
        if mesh is not None:
            # sharded item table: two-stage distributed top-k with the
            # per-shard seen-filter (parallel/topk.py) — same ranking as the
            # single-device scatter, collectives ride the mesh
            from ..parallel.mesh import MODEL_AXIS
            from ..parallel.topk import distributed_masked_topk, pad_to_multiple

            n_model = mesh.shape[MODEL_AXIS]
            items_p = pad_to_multiple(jnp.asarray(item_embs), n_model, axis=0)
            with mesh:
                tops = [
                    np.asarray(distributed_masked_topk(
                        mesh, user_embs[jnp.asarray(users_p[s: s + chunk])],
                        items_p, jnp.asarray(seen_p[s: s + chunk]), k,
                        num_valid=V)[1])
                    for s in range(0, len(users_p), chunk)
                ]
        else:
            tops = [
                np.asarray(_masked_topk(user_embs, item_embs,
                                        jnp.asarray(users_p[s : s + chunk]),
                                        jnp.asarray(seen_p[s : s + chunk]), k))
                for s in range(0, len(users_p), chunk)
            ]
        top = np.concatenate(tops, axis=0)[: len(users)]
        preds = {int(u): top[i].tolist() for i, u in enumerate(users)}
        return evaluate_recall(preds, test_gd, topN)
