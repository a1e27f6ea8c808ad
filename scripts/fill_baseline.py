"""Measure the BASELINE.md table: quality metrics for the headline configs on
the bundled datasets, plus train throughput.  Writes baseline_results.json."""
import json
import os
import time

import pandas as pd

from rec_pangu_tpu.data import get_dataloader
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train import RankTrainer, SequenceTrainer
from rec_pangu_tpu.utils import seed_everything

RANKING_SCHEMA = {
    "sparse_cols": ["user_id", "item_id", "item_type", "dayofweek", "is_workday",
                    "city", "county", "town", "village", "lbs_city", "lbs_district",
                    "hardware_platform", "hardware_ischarging", "os_type",
                    "network_type", "position"],
    "dense_cols": ["item_expo_1d", "item_expo_7d", "item_expo_14d", "item_expo_30d",
                   "item_clk_1d", "item_clk_7d", "item_clk_14d", "item_clk_30d",
                   "use_duration"],
    "label_col": "click",
    "task_type": "ranking",
}

results = {}

# ---- ranking zoo -----------------------------------------------------------
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
df = pd.read_csv(os.path.join(_REPO, "examples/ranking/sample_data/ranking_sample_data.csv"))
loaders = get_dataloader(df[:80], df[:90], df[:95], RANKING_SCHEMA, batch_size=512)
train_loader, valid_loader, test_loader, enc_dict = loaders
for name in ["DeepFM", "DCN", "xDeepFM", "AutoInt", "FiBiNet", "MaskNet"]:
    seed_everything(1029)
    model = get_model(name)(enc_dict=enc_dict)
    tr = RankTrainer(num_task=1, model_ckpt_dir=f"/tmp/baseline_ckpt/{name}")
    t0 = time.time()
    tr.fit(model, train_loader, valid_loader, epoch=15, lr=1e-3,
           use_earlystopping=True, max_patience=3, monitor_metric="roc_auc_score")
    results[name] = {"test": tr.evaluate_model(model, test_loader),
                     "train_s": round(time.time() - t0, 1)}
    print(name, results[name], flush=True)

# ---- multi-task ------------------------------------------------------------
mt_schema = {**RANKING_SCHEMA, "label_col": ["click", "scroll"],
             "task_type": "multitask"}
mdf = pd.read_csv(
    os.path.join(_REPO, "examples/multi_task/sample_data/multi_task_sample_data.csv"))
loaders = get_dataloader(mdf[:80], mdf[:90], mdf[:95], mt_schema, batch_size=512)
train_loader, valid_loader, test_loader, enc_dict = loaders
for name in ["MMOE", "ESSM"]:
    seed_everything(1029)
    model = get_model(name)(enc_dict=enc_dict)
    tr = RankTrainer(num_task=2, model_ckpt_dir=f"/tmp/baseline_ckpt/{name}")
    t0 = time.time()
    tr.fit(model, train_loader, valid_loader, epoch=10, lr=1e-3)
    results[name] = {"test": tr.evaluate_model(model, test_loader),
                     "train_s": round(time.time() - t0, 1)}
    print(name, results[name], flush=True)

# ---- sequence recall -------------------------------------------------------
seq_schema = {"user_col": "user_id", "item_col": "item_id", "cate_cols": ["genre"],
              "max_length": 20, "time_col": "timestamp", "task_type": "sequence"}
config = {"embedding_dim": 64, "K": 4, "device": -1, **seq_schema}
d = os.path.join(_REPO, "examples/sequence_recall/sample_data")
loaders = get_dataloader(pd.read_csv(f"{d}/sample_train.csv"),
                         pd.read_csv(f"{d}/sample_valid.csv"),
                         pd.read_csv(f"{d}/sample_test.csv"),
                         seq_schema, batch_size=256)
train_loader, valid_loader, test_loader, enc_dict = loaders
for name in ["YotubeDNN", "GRU4Rec", "NARM", "ComirecSA", "ComirecDR", "MIND"]:
    seed_everything(1029)
    model = get_model(name)(enc_dict=enc_dict, config=config)
    tr = SequenceTrainer(model_ckpt_dir=f"/tmp/baseline_ckpt/{name}")
    t0 = time.time()
    tr.fit(model, train_loader, None, epoch=2, lr=1e-3, log_rounds=100)
    results[name] = {"test": tr.evaluate_model(model, test_loader),
                     "train_s": round(time.time() - t0, 1)}
    print(name, results[name], flush=True)

with open("/root/repo/baseline_results.json", "w") as f:
    json.dump(results, f, indent=2)
print("DONE")
