"""Measure the BASELINE.md table: quality metrics for the headline configs on
the bundled datasets, plus train throughput.  Writes baseline_results.json.

Protocol (datasets / splits / seeds / budgets) is shared with the reference
runner via scripts/parity_common.py, so the two result files are directly
comparable column-by-column."""
import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parity_common import (GRAPH_BATCH, GRAPH_EPOCHS, GRAPH_TOPN,
                           RANKING_SCHEMA, RATINGS_SCHEMA, RATINGS_EPOCHS,
                           RATINGS_BATCH, RATINGS_MTL_SCHEMA, SEQ_EPOCHS,
                           SEQ_BATCH, SEQ_SEEDS3, RANKING_MODELS,
                           RANKING_MODELS_EXTRA, MTL_MODELS,
                           MTL_RATINGS_MODELS, MTL_RATINGS_MODELS_EXTRA,
                           SEQ_MODELS, SEQ_MODELS_EXTRA, SEQ_MODELS_EXTRA2,
                           load_graph_cf, load_ratings_ctr, load_ratings_mtl,
                           repo_path)

from rec_pangu_tpu.data import get_dataloader
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train import RankTrainer, SequenceTrainer
from rec_pangu_tpu.utils import seed_everything

_OUT = "/root/repo/baseline_results.json"
results = {}
if os.path.exists(_OUT) and os.environ.get("BASELINE_RESUME"):
    with open(_OUT) as f:
        results = json.load(f)


def record(name, value):
    results[name] = value
    with open(_OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(name, value, flush=True)


# ---- ranking zoo -----------------------------------------------------------
df = pd.read_csv(repo_path("examples/ranking/sample_data/ranking_sample_data.csv"))
loaders = get_dataloader(df[:80], df[:90], df[:95], RANKING_SCHEMA, batch_size=512)
train_loader, valid_loader, test_loader, enc_dict = loaders
for name in RANKING_MODELS:
    if name in results:
        continue
    seed_everything(1029)
    model = get_model(name)(enc_dict=enc_dict)
    tr = RankTrainer(num_task=1, model_ckpt_dir=f"/tmp/baseline_ckpt/{name}")
    t0 = time.time()
    tr.fit(model, train_loader, valid_loader, epoch=15, lr=1e-3,
           use_earlystopping=True, max_patience=3, monitor_metric="roc_auc_score")
    record(name, {"test": tr.evaluate_model(model, test_loader),
                  "train_s": round(time.time() - t0, 1)})

# ---- ratings CTR (the meaningful ranking leg: 100,836 rows) ----------------
rat_train, rat_valid, rat_test = load_ratings_ctr()
loaders = get_dataloader(rat_train, rat_valid, rat_test, RATINGS_SCHEMA,
                         batch_size=RATINGS_BATCH)
train_loader, valid_loader, test_loader, enc_dict = loaders
for name in RANKING_MODELS + RANKING_MODELS_EXTRA:
    key = f"ratings/{name}"
    if key in results:
        continue
    seed_everything(1029)
    model = get_model(name)(enc_dict=enc_dict)
    tr = RankTrainer(num_task=1, model_ckpt_dir=f"/tmp/baseline_ckpt/ratings_{name}")
    t0 = time.time()
    tr.fit(model, train_loader, valid_loader, epoch=RATINGS_EPOCHS, lr=1e-3)
    record(key, {"test": tr.evaluate_model(model, test_loader),
                 "train_s": round(time.time() - t0, 1)})

# ---- ratings CTR, 3-seed distribution (the honest comparison: single-draw
# legs above are +-0.015 seed noise — scripts/exp_ranking_seeds.py) ----------
from rec_pangu_tpu.data.loader import DataLoader as _DL

SEEDS3 = [1029, 1030, 1031]
for name in RANKING_MODELS + RANKING_MODELS_EXTRA:
    key = f"ratings3/{name}"
    if key in results:
        continue
    runs = []
    t0 = time.time()
    for seed in SEEDS3:
        seed_everything(seed)
        tl = _DL(train_loader.dataset, batch_size=RATINGS_BATCH,
                 shuffle=True, seed=seed)
        model = get_model(name)(enc_dict=enc_dict)
        tr = RankTrainer(num_task=1,
                         model_ckpt_dir=f"/tmp/baseline_ckpt/r3_{name}_{seed}")
        tr.fit(model, tl, valid_loader, epoch=RATINGS_EPOCHS, lr=1e-3,
               seed=seed)
        runs.append(tr.evaluate_model(model, test_loader))
    aucs = [r["roc_auc_score"] for r in runs]
    record(key, {"seeds": dict(zip(map(str, SEEDS3), runs)),
                 "auc_mean": round(sum(aucs) / len(aucs), 4),
                 "auc_min": min(aucs), "auc_max": max(aucs),
                 "train_s": round(time.time() - t0, 1)})

# ---- multi-task ------------------------------------------------------------
mt_schema = {**RANKING_SCHEMA, "label_col": ["click", "scroll"],
             "task_type": "multitask"}
mdf = pd.read_csv(
    repo_path("examples/multi_task/sample_data/multi_task_sample_data.csv"))
loaders = get_dataloader(mdf[:80], mdf[:90], mdf[:95], mt_schema, batch_size=512)
train_loader, valid_loader, test_loader, enc_dict = loaders
for name in MTL_MODELS:
    if name in results:
        continue
    seed_everything(1029)
    model = get_model(name)(enc_dict=enc_dict)
    tr = RankTrainer(num_task=2, model_ckpt_dir=f"/tmp/baseline_ckpt/{name}")
    t0 = time.time()
    tr.fit(model, train_loader, valid_loader, epoch=10, lr=1e-3)
    record(name, {"test": tr.evaluate_model(model, test_loader),
                  "train_s": round(time.time() - t0, 1)})

# ---- sequence recall -------------------------------------------------------
seq_schema = {"user_col": "user_id", "item_col": "item_id", "cate_cols": ["genre"],
              "max_length": 20, "time_col": "timestamp", "task_type": "sequence"}
config = {"embedding_dim": 64, "K": 4, "device": -1, **seq_schema}
d = repo_path("examples/sequence_recall/sample_data")
loaders = get_dataloader(pd.read_csv(f"{d}/sample_train.csv"),
                         pd.read_csv(f"{d}/sample_valid.csv"),
                         pd.read_csv(f"{d}/sample_test.csv"),
                         seq_schema, batch_size=SEQ_BATCH)
train_loader, valid_loader, test_loader, enc_dict = loaders
seq_train_loader, seq_test_loader, enc_dict_seq = \
    train_loader, test_loader, enc_dict  # aliases for the seq3/ section
for name in SEQ_MODELS + SEQ_MODELS_EXTRA + SEQ_MODELS_EXTRA2:
    if name in results:
        continue
    seed_everything(1029)
    model = get_model(name)(enc_dict=enc_dict, config=config)
    tr = SequenceTrainer(model_ckpt_dir=f"/tmp/baseline_ckpt/{name}")
    t0 = time.time()
    tr.fit(model, train_loader, None, epoch=SEQ_EPOCHS, lr=1e-3, log_rounds=100)
    record(name, {"test": tr.evaluate_model(model, test_loader),
                  "train_s": round(time.time() - t0, 1)})

# ---- multi-task on meaningful data (ratings.csv, two binarized labels) -----
mtl_train, mtl_valid, mtl_test = load_ratings_mtl()
loaders = get_dataloader(mtl_train, mtl_valid, mtl_test, RATINGS_MTL_SCHEMA,
                         batch_size=RATINGS_BATCH)
train_loader, valid_loader, test_loader, enc_dict = loaders
for name in MTL_RATINGS_MODELS + MTL_RATINGS_MODELS_EXTRA:
    key = f"ratings_mtl/{name}"
    if key in results:
        continue
    seed_everything(1029)
    model = get_model(name)(enc_dict=enc_dict)
    tr = RankTrainer(num_task=2,
                     model_ckpt_dir=f"/tmp/baseline_ckpt/ratings_mtl_{name}")
    t0 = time.time()
    tr.fit(model, train_loader, valid_loader, epoch=RATINGS_EPOCHS, lr=1e-3)
    record(key, {"test": tr.evaluate_model(model, test_loader),
                 "train_s": round(time.time() - t0, 1)})

# ---- round 5: graph CF (NGCF), BPR protocol on ratings.csv -----------------
if "graph/NGCF" not in results:
    from rec_pangu_tpu.data.graph_dataset import GeneralGraphDataset
    from rec_pangu_tpu.train import GraphTrainer

    g_train, g_test, n_user, n_item = load_graph_cf()
    seed_everything(1029)
    train_ds = GeneralGraphDataset(g_train, n_user, n_item, phase="train")
    test_ds = GeneralGraphDataset(g_test, n_user, n_item, phase="test")
    g = train_ds.generate_graph()
    model = get_model("NGCF")(num_user=n_user, num_item=n_item,
                              embedding_dim=64, hidden_size=[64, 64], g=g)
    gtr = GraphTrainer()
    t0 = time.time()
    gtr.fit(model, train_ds, epoch=GRAPH_EPOCHS, lr=1e-3,
            batch_size=GRAPH_BATCH)
    metric = gtr.evaluate_model(model, train_ds, test_ds, topN=GRAPH_TOPN)
    record("graph/NGCF", {"test": {k: float(v) for k, v in metric.items()},
                          "train_s": round(time.time() - t0, 1)})

# ---- round 5: sequence zoo at 3 seeds (VERDICT r4 item 3) ------------------
for name in SEQ_MODELS + SEQ_MODELS_EXTRA + SEQ_MODELS_EXTRA2:
    key = f"seq3/{name}"
    if key in results:
        continue
    runs = []
    t0 = time.time()
    for seed in SEQ_SEEDS3:
        seed_everything(seed)
        tl = _DL(seq_train_loader.dataset, batch_size=SEQ_BATCH,
                 shuffle=True, seed=seed)
        model = get_model(name)(enc_dict=enc_dict_seq, config=dict(config))
        str3 = SequenceTrainer(model_ckpt_dir=f"/tmp/baseline_ckpt/s3_{name}_{seed}")
        str3.fit(model, tl, None, epoch=SEQ_EPOCHS, lr=1e-3, log_rounds=100,
                 seed=seed)
        m = str3.evaluate_model(model, seq_test_loader)
        runs.append({k: float(v) for k, v in m.items()})
    r50 = [r["recall@50"] for r in runs]
    record(key, {"seeds": dict(zip(map(str, SEQ_SEEDS3), runs)),
                 "recall50_mean": round(sum(r50) / len(r50), 4),
                 "recall50_min": min(r50), "recall50_max": max(r50),
                 "train_s": round(time.time() - t0, 1)})

# ---- round 5: sampled-CE quality A/B (VERDICT r4 item 7) -------------------
# The scale knob has no reference counterpart; quality is compared against
# THIS framework's full-softmax legs above on the same protocol/seed.
for name in ["IOCRec", "ComirecSA", "MIND"]:
    key = f"sampled/{name}"
    if key in results:
        continue
    seed_everything(1029)
    cfg = dict(config, loss_type="sampled", num_negatives=1024)
    model = get_model(name)(enc_dict=enc_dict_seq, config=cfg)
    trs = SequenceTrainer(model_ckpt_dir=f"/tmp/baseline_ckpt/sampled_{name}")
    t0 = time.time()
    trs.fit(model, seq_train_loader, None, epoch=SEQ_EPOCHS, lr=1e-3,
            log_rounds=100)
    record(key, {"test": trs.evaluate_model(model, seq_test_loader),
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
        tl = _DL(train_loader.dataset, batch_size=RATINGS_BATCH,
                 shuffle=True, seed=seed)
        model = get_model(name)(enc_dict=enc_dict)
        tr3 = RankTrainer(num_task=2,
                          model_ckpt_dir=f"/tmp/baseline_ckpt/m3_{name}_{seed}")
        tr3.fit(model, tl, valid_loader, epoch=RATINGS_EPOCHS, lr=1e-3,
                seed=seed)
        runs.append(tr3.evaluate_model(model, test_loader))
    a1 = [r["test_task1_roc_auc_score"] for r in runs]
    a2 = [r["test_task2_roc_auc_score"] for r in runs]
    record(key, {"seeds": dict(zip(map(str, SEQ_SEEDS3), runs)),
                 "task1_auc_mean": round(sum(a1) / len(a1), 4),
                 "task2_auc_mean": round(sum(a2) / len(a2), 4),
                 "train_s": round(time.time() - t0, 1)})

print("DONE")
