"""Run the reference (`/root/reference/rec_pangu`, torch-CPU) head-to-head on the
same bundled datasets / seeds / epoch budgets as `scripts/fill_baseline.py`, and
write `reference_results.json` for the BASELINE.md parity columns (VERDICT.md
round-1 item 1: "measure quality parity against the reference, in-image").

The reference's missing deps (loguru/wandb/faiss/dgl) are satisfied by the
minimal stand-ins in `scripts/ref_compat/` — see each shim's docstring for the
exact surface it provides.  Two in-process compatibility patches are applied
and documented below (pandas>=2 removed DataFrame.append; the reference's
MultiTaskDataset is broken as shipped).
"""
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, os.path.join(_HERE, "ref_compat"))
sys.path.insert(0, "/root/reference")

import numpy as np
import pandas as pd
import torch

# pandas 3.x removed DataFrame.append; the reference logs metrics with it
# (rec_pangu/trainer.py:324,361, benchmark_trainer.py:94).  Equivalent concat:
if not hasattr(pd.DataFrame, "append"):
    def _df_append(self, other, ignore_index=False):
        other_df = pd.DataFrame([other]) if isinstance(other, dict) else other
        return pd.concat([self, other_df], ignore_index=ignore_index)
    pd.DataFrame.append = _df_append

import rec_pangu.model_pipeline as _mp
from sklearn.metrics import log_loss as _sk_log_loss

# Latent reference bug worked around (bites with real faiss too): for 2-D
# user-emb models get_recall_predict stores *numpy arrays* in preds
# (rec_pangu/utils/evaluate.py:66 `preds[str(user)] = I[i, :]`), but
# evaluate_recall calls `preds[user][:topN].index(item_id)` (evaluate.py:122)
# — ndarray has no .index().  Convert each pred to a plain list after the
# original runs; list.index == first occurrence == the ranked position, so
# metric semantics are unchanged (the multi-interest branch already builds
# lists).
_orig_get_recall_predict = _mp.get_recall_predict

def _get_recall_predict_lists(*a, **kw):
    preds = _orig_get_recall_predict(*a, **kw)
    return {u: (p.tolist() if isinstance(p, np.ndarray) else p)
            for u, p in preds.items()}

_mp.get_recall_predict = _get_recall_predict_lists

# Reference bug worked around (bites on real data): the MTL losses add 1e-6
# to the sigmoid output before BCE (rec_pangu/models/multi_task/mmoe.py:127,
# essm.py:72-74, aitm.py:95-97); once training drives a prediction to exactly
# 1.0 in fp32, input > 1 crashes torch's binary_cross_entropy.  Minimal fix
# preserving the loss everywhere it is finite: clamp the input into [0, 1].
import torch.nn.functional as _F

_orig_bce = _F.binary_cross_entropy

def _bce_clamped(input, target, *a, **kw):
    return _orig_bce(input.clamp(0.0, 1.0), target, *a, **kw)

_F.binary_cross_entropy = _bce_clamped

# sklearn>=1.5 removed log_loss's eps kwarg; the reference passes eps=1e-7
# (rec_pangu/model_pipeline.py:83,121).  Same semantics: clip preds first.
def _log_loss_eps(y_true, y_pred, eps=1e-7, **kw):
    y_pred = np.clip(np.asarray(y_pred, dtype=np.float64), eps, 1.0 - eps)
    return _sk_log_loss(y_true, y_pred, **kw)

_mp.log_loss = _log_loss_eps

from rec_pangu.dataset import get_dataloader
from rec_pangu.dataset.multi_task_dataset import MultiTaskDataset
from rec_pangu.trainer import RankTrainer, SequenceTrainer, GraphTrainer
from rec_pangu.models.ranking import (DeepFM, DCN, xDeepFM, AutoInt, FiBiNet,
                                      MaskNet, LR, FM, WDL, NFM, AFM, AFN,
                                      AOANet, CCPM)
from rec_pangu.models.multi_task import (MMOE, ESSM, AITM, ShareBottom, OMOE,
                                         MLMMOE)
from rec_pangu.models.sequence import (YotubeDNN, GRU4Rec, NARM, ComirecSA,
                                       ComirecDR, MIND, SASRec, CLRec, IOCRec,
                                       SRGNN, GCSAN, NISER, STAMP, NextItNet,
                                       SINE, Re4, CMI, ContraRec)
from rec_pangu.models.utils import seed_everything

# The reference's MultiTaskDataset is broken as shipped: __init__ ends with
# `self.data()` (multi_task_dataset.py:53) but no such method exists (the
# inherited encoder is `enc_data()`, which fills `data_dict`), and __getitem__
# reads `self.data[col][index]` (:66-69).  Minimal fix matching the obvious
# intent: run enc_data() and alias `data` to the encoded dict.
_orig_mtl_init = MultiTaskDataset.__init__

def _fixed_mtl_init(self, config, df, enc_dict=None):
    try:
        _orig_mtl_init(self, config, df, enc_dict)
    except AttributeError:
        self.enc_data()
        self.data = self.data_dict

MultiTaskDataset.__init__ = _fixed_mtl_init

from parity_common import (GRAPH_BATCH, GRAPH_EPOCHS, GRAPH_TOPN,
                           RANKING_SCHEMA, RATINGS_SCHEMA, RATINGS_EPOCHS,
                           RATINGS_BATCH, RATINGS_MTL_SCHEMA, SEQ_EPOCHS,
                           SEQ_BATCH, SEQ_SEEDS3, RANKING_MODELS,
                           RANKING_MODELS_EXTRA, MTL_MODELS,
                           MTL_RATINGS_MODELS, MTL_RATINGS_MODELS_EXTRA,
                           SEQ_MODELS, SEQ_MODELS_EXTRA, SEQ_MODELS_EXTRA2,
                           load_graph_cf, load_ratings_ctr, load_ratings_mtl,
                           repo_path)

_OUT = os.path.join(_REPO, "reference_results.json")
results = {}
if os.path.exists(_OUT):  # resume a partial run
    with open(_OUT) as f:
        results = json.load(f)


def record(name, value):
    """Dump incrementally after EVERY model so a crash loses nothing
    (VERDICT r2 item 1)."""
    results[name] = value
    with open(_OUT, "w") as f:
        json.dump(results, f, indent=2, default=str)
    print(name, value, flush=True)


# Reference bug worked around (crashes on construction): LR subclasses
# nn.Module directly but calls self.reset_parameters()
# (rec_pangu/models/ranking/lr.py:12,28) — the method only exists on
# BaseModel (base_model.py:42).  Minimal intent fix: borrow BaseModel's
# (kaiming on >=2-D params, skip 1-D), which is what every sibling runs.
from rec_pangu.models.base_model import BaseModel as _RefBaseModel

LR.reset_parameters = _RefBaseModel.reset_parameters

_RANK_CLS = {c.__name__: c
             for c in [DeepFM, DCN, xDeepFM, AutoInt, FiBiNet, MaskNet,
                       LR, FM, WDL, NFM, AFM, AFN, AOANet, CCPM]}

# ---- ranking zoo (identical slices/budgets to scripts/fill_baseline.py) ----
df = pd.read_csv(repo_path("examples/ranking/sample_data/ranking_sample_data.csv"))
train_loader, valid_loader, test_loader, enc_dict = get_dataloader(
    df[:80], df[:90], df[:95], RANKING_SCHEMA, batch_size=512)
for name in RANKING_MODELS:
    if name in results:
        continue
    seed_everything(1029)
    model = _RANK_CLS[name](enc_dict=enc_dict)
    tr = RankTrainer(num_task=1, model_ckpt_dir=f"/tmp/ref_ckpt/{name}")
    t0 = time.time()
    tr.fit(model, train_loader, valid_loader, epoch=15, lr=1e-3,
           use_earlystopping=True, max_patience=3, monitor_metric="roc_auc_score")
    record(name, {"test": tr.evaluate_model(model, test_loader),
                  "train_s": round(time.time() - t0, 1)})

# ---- ratings CTR (the meaningful ranking leg: 100,836 rows) ----------------
rat_train, rat_valid, rat_test = load_ratings_ctr()
train_loader, valid_loader, test_loader, enc_dict = get_dataloader(
    rat_train, rat_valid, rat_test, RATINGS_SCHEMA, batch_size=RATINGS_BATCH)
for name in RANKING_MODELS + RANKING_MODELS_EXTRA:
    key = f"ratings/{name}"
    if key in results:
        continue
    seed_everything(1029)
    model = _RANK_CLS[name](enc_dict=enc_dict)
    tr = RankTrainer(num_task=1, model_ckpt_dir=f"/tmp/ref_ckpt/ratings_{name}")
    t0 = time.time()
    tr.fit(model, train_loader, valid_loader, epoch=RATINGS_EPOCHS, lr=1e-3)
    record(key, {"test": tr.evaluate_model(model, test_loader),
                 "train_s": round(time.time() - t0, 1)})

# ---- ratings CTR, 3-seed distribution (matches fill_baseline's ratings3/
# legs; seed_everything drives torch's init AND loader order) ----------------
SEEDS3 = [1029, 1030, 1031]
for name in RANKING_MODELS + RANKING_MODELS_EXTRA:
    key = f"ratings3/{name}"
    if key in results:
        continue
    runs = []
    t0 = time.time()
    for seed in SEEDS3:
        seed_everything(seed)
        model = _RANK_CLS[name](enc_dict=enc_dict)
        tr = RankTrainer(num_task=1,
                         model_ckpt_dir=f"/tmp/ref_ckpt/r3_{name}_{seed}")
        tr.fit(model, train_loader, valid_loader, epoch=RATINGS_EPOCHS, lr=1e-3)
        runs.append(tr.evaluate_model(model, test_loader))
    aucs = [r["roc_auc_score"] for r in runs]
    record(key, {"seeds": dict(zip(map(str, SEEDS3), runs)),
                 "auc_mean": round(sum(aucs) / len(aucs), 4),
                 "auc_min": min(aucs), "auc_max": max(aucs),
                 "train_s": round(time.time() - t0, 1)})

# ---- multi-task -------------------------------------------------------------
mt_schema = {**RANKING_SCHEMA, "label_col": ["click", "scroll"],
             "task_type": "multitask"}
mdf = pd.read_csv(
    repo_path("examples/multi_task/sample_data/multi_task_sample_data.csv"))
train_loader, valid_loader, test_loader, enc_dict = get_dataloader(
    mdf[:80], mdf[:90], mdf[:95], mt_schema, batch_size=512)
_MTL_CLS = {"MMOE": MMOE, "ESSM": ESSM}
for name in MTL_MODELS:
    if name in results:
        continue
    seed_everything(1029)
    model = _MTL_CLS[name](enc_dict=enc_dict)
    tr = RankTrainer(num_task=2, model_ckpt_dir=f"/tmp/ref_ckpt/{name}")
    t0 = time.time()
    tr.fit(model, train_loader, valid_loader, epoch=10, lr=1e-3)
    record(name, {"test": tr.evaluate_model(model, test_loader),
                  "train_s": round(time.time() - t0, 1)})

# ---- sequence recall ---------------------------------------------------------
seq_schema = {"user_col": "user_id", "item_col": "item_id", "cate_cols": ["genre"],
              "max_length": 20, "time_col": "timestamp", "task_type": "sequence"}
# device must be a torch.device: the reference stores config['device'] raw and
# calls .to(self.device) (base_model.py:114, comirec.py:48); torch>=2 rejects
# the reference examples' bare -1
config = {"embedding_dim": 64, "K": 4, "device": torch.device("cpu"),
          **seq_schema}
d = repo_path("examples/sequence_recall/sample_data")
train_loader, valid_loader, test_loader, enc_dict = get_dataloader(
    pd.read_csv(f"{d}/sample_train.csv"),
    pd.read_csv(f"{d}/sample_valid.csv"),
    pd.read_csv(f"{d}/sample_test.csv"),
    seq_schema, batch_size=SEQ_BATCH)
# Reference bug worked around: get_sequence_dataloader builds the TEST loader
# with drop_last=True (process_data.py:48-49), which silently drops the
# bundled 100-user test set entirely (100 < batch) and reports all-zero
# recall/ndcg/hitrate.  Rebuild the test loader keeping the last batch.
import torch.utils.data as D

test_loader = D.DataLoader(test_loader.dataset, batch_size=SEQ_BATCH,
                           shuffle=False, num_workers=0, drop_last=False)
# aliases for the round-5 seq3/ section (the ratings_mtl section below
# rebinds train_loader/test_loader/enc_dict)
seq_train_loader, seq_test_loader, enc_dict_seq = train_loader, test_loader, enc_dict
_SEQ_CLS = {c.__name__: c
            for c in [YotubeDNN, GRU4Rec, NARM, ComirecSA, ComirecDR, MIND,
                      SASRec, CLRec, IOCRec, SRGNN, GCSAN, NISER, STAMP,
                      NextItNet, SINE, Re4, CMI, ContraRec]}
for name in SEQ_MODELS + SEQ_MODELS_EXTRA + SEQ_MODELS_EXTRA2:
    if name in results:
        continue
    # the reference's SequenceTrainer writes log.csv without creating the
    # directory first (rec_pangu/trainer.py:327) — pre-create it
    os.makedirs(f"/tmp/ref_ckpt/{name}", exist_ok=True)
    seed_everything(1029)
    model = _SEQ_CLS[name](enc_dict=enc_dict, config=config)
    tr = SequenceTrainer(model_ckpt_dir=f"/tmp/ref_ckpt/{name}")
    t0 = time.time()
    tr.fit(model, train_loader, None, epoch=SEQ_EPOCHS, lr=1e-3, log_rounds=100)
    metric = tr.evaluate_model(model, test_loader)
    metric = {k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
              for k, v in metric.items()}
    record(name, {"test": metric, "train_s": round(time.time() - t0, 1)})

# ---- multi-task on meaningful data (ratings.csv, two binarized labels) -----
mtl_train, mtl_valid, mtl_test = load_ratings_mtl()
train_loader, valid_loader, test_loader, enc_dict = get_dataloader(
    mtl_train, mtl_valid, mtl_test, RATINGS_MTL_SCHEMA,
    batch_size=RATINGS_BATCH)
_MTLR_CLS = {"MMOE": MMOE, "ESSM": ESSM, "AITM": AITM,
             "ShareBottom": ShareBottom, "OMOE": OMOE, "MLMMOE": MLMMOE}
for name in MTL_RATINGS_MODELS + MTL_RATINGS_MODELS_EXTRA:
    key = f"ratings_mtl/{name}"
    if key in results:
        continue
    seed_everything(1029)
    model = _MTLR_CLS[name](enc_dict=enc_dict)
    tr = RankTrainer(num_task=2, model_ckpt_dir=f"/tmp/ref_ckpt/ratings_mtl_{name}")
    t0 = time.time()
    tr.fit(model, train_loader, valid_loader, epoch=RATINGS_EPOCHS, lr=1e-3)
    record(key, {"test": tr.evaluate_model(model, test_loader),
                 "train_s": round(time.time() - t0, 1)})

# ---- round 5: graph CF (NGCF), BPR protocol on ratings.csv -----------------
# Two reference bugs require minimal intent-preserving patches to run at all
# (both documented in VERDICT/SURVEY as "broken as shipped; do not replicate"):
#   1. GraphBaseModel defines `__int__` instead of `__init__`
#      (rec_pangu/models/base_model.py:228) — and that body sets
#      `self.num_user = num_item`.  Patch: a real __init__ with the obvious
#      intent (num_user = num_user).
#   2. GeneralGraphDataset.generate_test_gd() returns None
#      (rec_pangu/dataset/graph_dataset.py:33-35) but
#      GraphTrainer.evaluate_model uses its return value as the gd dict
#      (rec_pangu/trainer.py:430-431).  Patch: return the dict.
from rec_pangu.models.base_model import GraphBaseModel
from rec_pangu.models.graph.ngcf import NGCF  # no graph/__init__.py upstream
from rec_pangu.dataset.graph_dataset import GeneralGraphDataset
import torch.nn as _nn


def _graph_base_init(self, num_user, num_item, embedding_dim):
    _nn.Module.__init__(self)
    self.embedding_dim = embedding_dim
    self.num_user = num_user
    self.num_item = num_item
    self.user_emb_layer = _nn.Embedding(self.num_user, self.embedding_dim)
    self.item_emb_layer = _nn.Embedding(self.num_item, self.embedding_dim)


GraphBaseModel.__init__ = _graph_base_init

_orig_gen_gd = GeneralGraphDataset.generate_test_gd

def _gen_gd(self):
    _orig_gen_gd(self)
    return self.test_gd

GeneralGraphDataset.generate_test_gd = _gen_gd

if "graph/NGCF" not in results:
    g_train, g_test, n_user, n_item = load_graph_cf()
    seed_everything(1029)
    train_ds = GeneralGraphDataset(g_train, n_user, n_item, phase="train")
    test_ds = GeneralGraphDataset(g_test, n_user, n_item, phase="test")
    g = train_ds.generate_graph()
    model = NGCF(g, n_user, n_item, embedding_dim=64, hidden_size=[64, 64])
    tr = GraphTrainer()
    t0 = time.time()
    tr.fit(model, train_ds, epoch=GRAPH_EPOCHS, lr=1e-3,
           batch_size=GRAPH_BATCH)
    metric = tr.evaluate_model(model, train_ds, test_ds,
                               hidden_size=64 * 3, topN=GRAPH_TOPN)
    metric = {k: float(v) for k, v in metric.items()}
    record("graph/NGCF", {"test": metric,
                          "train_s": round(time.time() - t0, 1)})

# ---- round 5: sequence zoo at 3 seeds (VERDICT r4 item 3) ------------------
for name in SEQ_MODELS + SEQ_MODELS_EXTRA + SEQ_MODELS_EXTRA2:
    key = f"seq3/{name}"
    if key in results:
        continue
    runs = []
    t0 = time.time()
    for seed in SEQ_SEEDS3:
        os.makedirs(f"/tmp/ref_ckpt/s3_{name}_{seed}", exist_ok=True)
        seed_everything(seed)
        model = _SEQ_CLS[name](enc_dict=enc_dict_seq, config=config)
        str3 = SequenceTrainer(model_ckpt_dir=f"/tmp/ref_ckpt/s3_{name}_{seed}")
        str3.fit(model, seq_train_loader, None, epoch=SEQ_EPOCHS, lr=1e-3,
                 log_rounds=100)
        m = str3.evaluate_model(model, seq_test_loader)
        # the metric dict carries non-numeric entries (e.g. a phase tag) —
        # keep numerics only, as the single-seed section above does
        runs.append({k: float(v) for k, v in m.items()
                     if isinstance(v, (int, float, np.floating))})
    r50 = [r["recall@50"] for r in runs]
    record(key, {"seeds": dict(zip(map(str, SEQ_SEEDS3), runs)),
                 "recall50_mean": round(sum(r50) / len(r50), 4),
                 "recall50_min": min(r50), "recall50_max": max(r50),
                 "train_s": round(time.time() - t0, 1)})

# ---- round 5: ratings MTL at 3 seeds ---------------------------------------
for name in MTL_RATINGS_MODELS:
    key = f"mtl3/{name}"
    if key in results:
        continue
    runs = []
    t0 = time.time()
    for seed in SEQ_SEEDS3:
        seed_everything(seed)
        model = _MTLR_CLS[name](enc_dict=enc_dict)
        tr3 = RankTrainer(num_task=2,
                          model_ckpt_dir=f"/tmp/ref_ckpt/m3_{name}_{seed}")
        tr3.fit(model, train_loader, valid_loader, epoch=RATINGS_EPOCHS,
                lr=1e-3)
        runs.append(tr3.evaluate_model(model, test_loader))
    a1 = [r["test_task1_roc_auc_score"] for r in runs]
    a2 = [r["test_task2_roc_auc_score"] for r in runs]
    record(key, {"seeds": dict(zip(map(str, SEQ_SEEDS3), runs)),
                 "task1_auc_mean": round(sum(a1) / len(a1), 4),
                 "task2_auc_mean": round(sum(a2) / len(a2), 4),
                 "train_s": round(time.time() - t0, 1)})

print("DONE")
