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
from rec_pangu.trainer import RankTrainer, SequenceTrainer
from rec_pangu.models.ranking import DeepFM, DCN, xDeepFM, AutoInt, FiBiNet, MaskNet
from rec_pangu.models.multi_task import MMOE, ESSM, AITM
from rec_pangu.models.sequence import (YotubeDNN, GRU4Rec, NARM, ComirecSA,
                                       ComirecDR, MIND, SASRec, CLRec, IOCRec,
                                       SRGNN, GCSAN, NISER)
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

from parity_common import (RANKING_SCHEMA, RATINGS_SCHEMA, RATINGS_EPOCHS,
                           RATINGS_BATCH, RATINGS_MTL_SCHEMA, SEQ_EPOCHS,
                           SEQ_BATCH, RANKING_MODELS, MTL_MODELS,
                           MTL_RATINGS_MODELS, SEQ_MODELS, SEQ_MODELS_EXTRA,
                           load_ratings_ctr, load_ratings_mtl, repo_path)

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


_RANK_CLS = {c.__name__: c for c in [DeepFM, DCN, xDeepFM, AutoInt, FiBiNet, MaskNet]}

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
for name in RANKING_MODELS:
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
for name in RANKING_MODELS:
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
_SEQ_CLS = {c.__name__: c
            for c in [YotubeDNN, GRU4Rec, NARM, ComirecSA, ComirecDR, MIND,
                      SASRec, CLRec, IOCRec, SRGNN, GCSAN, NISER]}
for name in SEQ_MODELS + SEQ_MODELS_EXTRA:
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
_MTLR_CLS = {"MMOE": MMOE, "ESSM": ESSM, "AITM": AITM}
for name in MTL_RATINGS_MODELS:
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

print("DONE")
