"""Shared data protocol for the reference-vs-repo parity measurement.

Both `scripts/run_reference_parity.py` (torch-CPU reference) and
`scripts/fill_baseline.py` (this framework) import these helpers so the two
sides see byte-identical dataframes, splits, seeds, and epoch budgets.  The
ratings leg exists because the 80/90/95-row slices of the bundled sample CSVs
are noise-dominated (VERDICT r2): MovieLens `ratings.csv` (100,836 rows,
vendored at examples/ranking/sample_data/ratings.csv) binarized at rating>=4
is the smallest bundled dataset where CTR AUC deltas are meaningful.
"""
import os

import numpy as np
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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

RATINGS_SCHEMA = {
    "sparse_cols": ["userId", "movieId"],
    "dense_cols": ["timestamp"],
    "label_col": "click",
    "task_type": "ranking",
}

# Epoch budgets (identical on both sides).  Ratings: fixed 5 epochs, no early
# stopping — both sides evaluate the final model, so the column compares
# quality-at-equal-budget.  Sequence: 20 epochs (the reference example's
# budget); at 2 epochs the ~570-user protocol is noise.
RATINGS_EPOCHS = 5
RATINGS_BATCH = 512
SEQ_EPOCHS = 20
SEQ_BATCH = 256

RANKING_MODELS = ["DeepFM", "DCN", "xDeepFM", "AutoInt", "FiBiNet", "MaskNet"]
MTL_MODELS = ["MMOE", "ESSM"]
SEQ_MODELS = ["YotubeDNN", "GRU4Rec", "NARM", "ComirecSA", "ComirecDR", "MIND"]
# round-4 extension (VERDICT r3 item 2): the bench-headline sequence models
# get measured quality legs too — same 64k protocol
SEQ_MODELS_EXTRA = ["SASRec", "CLRec", "IOCRec", "SRGNN", "GCSAN", "NISER"]
# MTL on meaningful data: ratings.csv with two binarized labels (the 80-row
# multi_task_sample slices are noise-dominated)
MTL_RATINGS_MODELS = ["MMOE", "ESSM", "AITM"]
# round-5 extension (VERDICT r4 item 2): every registered model gets a
# measured leg.  AFM note: the reference's AFM is a verbatim FiBiNet clone
# (rec_pangu/models/ranking/afm.py:12 `# Fixme`); this framework implements
# the real paper model (SURVEY §7.1 "bugs not replicated"), so that column
# compares different architectures by design.
RANKING_MODELS_EXTRA = ["LR", "FM", "WDL", "NFM", "AFM", "AFN", "AOANet",
                        "CCPM"]
MTL_RATINGS_MODELS_EXTRA = ["ShareBottom", "OMOE", "MLMMOE"]
SEQ_MODELS_EXTRA2 = ["STAMP", "NextItNet", "SINE", "Re4", "CMI", "ContraRec"]
# round-5 (VERDICT r4 item 3): sequence + MTL parity at 3 seeds,
# ratings3-style.  seq3/<name> and mtl3/<name> keys on both sides.
SEQ_SEEDS3 = [1029, 1030, 1031]


def load_graph_cf():
    """Graph-CF (NGCF) protocol: MovieLens ratings.csv as a bipartite
    user-item interaction set, ids remapped to contiguous ints over the FULL
    frame (both sides build identical graphs), fixed shuffled 80/20 row
    split (seed 2026, load_ratings_ctr-style).  Returns
    (train_df, test_df, num_user, num_item) with columns user_id/item_id —
    the reference GeneralGraphDataset's expected names
    (rec_pangu/dataset/graph_dataset.py:20-22)."""
    df = pd.read_csv(repo_path("examples/ranking/sample_data/ratings.csv"))
    users = {u: i for i, u in enumerate(sorted(df["userId"].unique()))}
    items = {v: i for i, v in enumerate(sorted(df["movieId"].unique()))}
    out = pd.DataFrame({
        "user_id": df["userId"].map(users).astype(np.int64),
        "item_id": df["movieId"].map(items).astype(np.int64),
    })
    rng = np.random.RandomState(2026)
    order = rng.permutation(len(out))
    out = out.iloc[order].reset_index(drop=True)
    n_train = int(len(out) * 0.8)
    return (out.iloc[:n_train].reset_index(drop=True),
            out.iloc[n_train:].reset_index(drop=True),
            len(users), len(items))


GRAPH_EPOCHS = 5
GRAPH_BATCH = 512  # random.sample needs batch <= n_users (610)
GRAPH_TOPN = 50


def repo_path(*parts):
    return os.path.join(_REPO, *parts)


def load_ratings_mtl():
    """MovieLens ratings.csv -> two-task frames: task1 like = (rating >= 3),
    task2 click = (rating >= 4) — a nested-label pair shaped like the CTR/CVR
    protocols ESSM/AITM assume (task2 subset of task1).  Same fixed shuffled
    80/10/10 split as load_ratings_ctr."""
    df = pd.read_csv(repo_path("examples/ranking/sample_data/ratings.csv"))
    df["click"] = (df["rating"] >= 4.0).astype(np.int64)
    df["like"] = (df["rating"] >= 3.0).astype(np.int64)
    df["userId"] = df["userId"].astype(str)
    df["movieId"] = df["movieId"].astype(str)
    rng = np.random.RandomState(2026)
    order = rng.permutation(len(df))
    df = df.iloc[order].reset_index(drop=True)
    n = len(df)
    n_train, n_valid = int(n * 0.8), int(n * 0.9)
    return (df.iloc[:n_train].reset_index(drop=True),
            df.iloc[n_train:n_valid].reset_index(drop=True),
            df.iloc[n_valid:].reset_index(drop=True))


RATINGS_MTL_SCHEMA = {
    "sparse_cols": ["userId", "movieId"],
    "dense_cols": ["timestamp"],
    "label_col": ["like", "click"],
    "task_type": "multitask",
}


def load_ratings_ctr():
    """MovieLens ratings.csv -> CTR frames: click = (rating >= 4), fixed
    shuffled 80/10/10 split.  Returns (train_df, valid_df, test_df)."""
    df = pd.read_csv(repo_path("examples/ranking/sample_data/ratings.csv"))
    df["click"] = (df["rating"] >= 4.0).astype(np.int64)
    # Sparse ids as str: the reference's enc_dict is keyed by str (it
    # astype(str)'s the TRAIN df while fitting, base_dataset.py:58) but
    # encodes valid/test with the RAW values (base_dataset.py:92) — numeric
    # id columns silently map every valid/test row to OOV.  Feeding str ids
    # is the reference's intended usage (its bundled CSVs are strings) and
    # keeps both frameworks on identical inputs.
    df["userId"] = df["userId"].astype(str)
    df["movieId"] = df["movieId"].astype(str)
    rng = np.random.RandomState(2026)
    order = rng.permutation(len(df))
    df = df.iloc[order].reset_index(drop=True)
    n = len(df)
    n_train, n_valid = int(n * 0.8), int(n * 0.9)
    return (df.iloc[:n_train].reset_index(drop=True),
            df.iloc[n_train:n_valid].reset_index(drop=True),
            df.iloc[n_valid:].reset_index(drop=True))
