"""Data-layer semantics tests: enc_dict fit/apply parity with the reference
(rec_pangu/dataset/base_dataset.py, sequence_dataset.py)."""
import numpy as np
import pandas as pd

from rec_pangu_tpu.data import (
    DataLoader,
    FeatureSpec,
    RankingDataset,
    SequenceDataset,
    fit_enc_dict,
    get_dataloader,
)
from rec_pangu_tpu.data.encoder import encode_ranking_df

from conftest import RANKING_SCHEMA, SEQ_SCHEMA


def test_enc_dict_sparse_semantics():
    df = pd.DataFrame({"s": ["b", "a", "c", "a"], "d": [1.0, 2.0, 3.0, 4.0], "y": [0, 1, 0, 1]})
    schema = {"sparse_cols": ["s"], "dense_cols": ["d"], "label_col": "y", "task_type": "ranking"}
    enc = fit_enc_dict(df, schema)
    # sorted unique -> 0-based ids; vocab_size = nunique
    assert enc["s"]["a"] == 0 and enc["s"]["b"] == 1 and enc["s"]["c"] == 2
    assert enc["s"]["vocab_size"] == 3
    assert enc["d"]["min"] == 1.0 and enc["d"]["max"] == 4.0

    # OOV maps to vocab_size
    df2 = pd.DataFrame({"s": ["zzz"], "d": [2.0]})
    arrays = encode_ranking_df(df2, enc, schema)
    assert arrays["sparse"][0, 0] == 3
    # dense min-max with +1e-5 in denominator
    np.testing.assert_allclose(arrays["dense"][0, 0], (2.0 - 1.0) / (3.0 + 1e-5), rtol=1e-6)


def test_ranking_dataset_shapes(ranking_df):
    ds = RankingDataset(RANKING_SCHEMA, ranking_df[:80])
    assert ds.arrays["sparse"].shape == (80, 16)
    assert ds.arrays["dense"].shape == (80, 9)
    assert ds.arrays["label"].shape == (80,)
    spec = ds.spec
    assert spec.num_sparse == 16 and spec.num_dense == 9
    # fused table rows = sum(vocab+1)
    assert spec.total_rows == sum(
        ds.enc_dict[c]["vocab_size"] + 1 for c in spec.sparse_names
    )


def test_dataloader_batching(ranking_df):
    ds = RankingDataset(RANKING_SCHEMA, ranking_df[:80])
    loader = DataLoader(ds, batch_size=32, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["sparse"].shape == (32, 16)
    assert batches[-1]["sparse"].shape == (16, 16)
    # all rows covered exactly once
    total = np.concatenate([b["label"] for b in batches])
    assert len(total) == 80


def test_get_dataloader_dispatch(ranking_df):
    tr, va, te, enc = get_dataloader(ranking_df[:80], ranking_df[:90], ranking_df[:95],
                                     RANKING_SCHEMA, batch_size=512)
    assert len(tr.dataset) == 80 and len(va.dataset) == 90 and len(te.dataset) == 95
    # enc_dict fit on train only, shared
    assert va.dataset.enc_dict is enc


def test_sequence_dataset(seq_dfs):
    train, valid, test = seq_dfs
    ds = SequenceDataset(SEQ_SCHEMA, train, phase="train")
    U = len(ds.user_list)
    assert ds.arrays["hist_item_list"].shape == (U, 20)
    assert ds.arrays["hist_mask_list"].shape == (U, 20)
    assert ds.arrays["target_item"].shape == (U,)
    assert ds.arrays["next_item_list"].shape == (U, 10)
    # ids are 1-based with 0 = padding
    assert ds.arrays["hist_item_list"].min() >= 0
    assert ds.arrays["target_item"].min() >= 1
    # mask matches nonzero history
    nz = (ds.arrays["hist_item_list"] > 0).astype(np.float32)
    np.testing.assert_array_equal(nz, ds.arrays["hist_mask_list"])

    # eval phase: fixed 80% split + ground truth = last 20%
    ds_test = SequenceDataset(SEQ_SCHEMA, test, enc_dict=ds.enc_dict, phase="test")
    gd = ds_test.get_test_gd()
    assert len(gd) == len(ds_test.user_list)
    some_user = str(ds_test.user_list[0])
    items = ds_test.user2item[ds_test.user_list[0]]
    assert gd[some_user] == [int(x) for x in items[int(0.8 * len(items)):]]

    # resampling changes training windows between epochs
    before = ds.arrays["target_item"].copy()
    ds.resample(1)
    assert (before != ds.arrays["target_item"]).any()


def test_loader_per_host_sharding(ranking_df):
    from rec_pangu_tpu.data import RankingDataset

    ds = RankingDataset(RANKING_SCHEMA, ranking_df[:80])
    shards = []
    for rank in range(4):
        loader = DataLoader(ds, batch_size=32, shuffle=True, seed=11,
                            shard_rank=rank, num_shards=4)
        rows = np.concatenate([b["label"] for b in loader])
        shards.append(rows)
        assert len(rows) == 20
    # shards are disjoint and cover all rows (same shuffle seed across ranks)
    total = sum(len(s) for s in shards)
    assert total == 80


def test_get_single_dataloader(ranking_df, multitask_df):
    """Parity: process_data.py:80-90 — one never-shuffled loader over a raw
    df encoded with a saved enc_dict; MultiTaskDataset when label_col is a
    list, ranking dataset otherwise."""
    from rec_pangu_tpu.data import get_dataloader, get_single_dataloader

    _, _, _, enc = get_dataloader(ranking_df[:80], ranking_df[:90],
                                  ranking_df[:95], RANKING_SCHEMA, batch_size=32)
    loader = get_single_dataloader(ranking_df[:95], RANKING_SCHEMA, enc,
                                   batch_size=32)
    batches = list(loader)
    assert sum(len(b["label"]) for b in batches) == 95

    mt_schema = {**RANKING_SCHEMA, "label_col": ["click", "scroll"],
                 "task_type": "multitask"}
    _, _, _, enc = get_dataloader(multitask_df[:80], multitask_df[:90],
                                  multitask_df[:95], mt_schema, batch_size=32)
    loader = get_single_dataloader(multitask_df[:95], mt_schema, enc,
                                   batch_size=32)
    b = next(iter(loader))
    assert "task1_label" in b or "label" in b
