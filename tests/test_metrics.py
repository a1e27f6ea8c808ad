"""Metric parity: our numpy AUC/logloss vs sklearn, evaluate_recall semantics."""
import numpy as np
import pytest

from rec_pangu_tpu.eval.metrics import log_loss, roc_auc_score
from rec_pangu_tpu.eval.retrieval import evaluate_recall, merge_multi_interest

sklearn_metrics = pytest.importorskip("sklearn.metrics")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_auc_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, 500)
    y[0], y[1] = 0, 1  # both classes present
    # include ties
    p = np.round(rng.random(500), 2)
    assert roc_auc_score(y, p) == pytest.approx(sklearn_metrics.roc_auc_score(y, p), abs=1e-12)


def test_logloss_matches_sklearn():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 2, 300)
    p = rng.random(300)
    ours = log_loss(y, p)
    theirs = sklearn_metrics.log_loss(y, p, labels=[0, 1])
    assert ours == pytest.approx(theirs, abs=1e-9)


def test_evaluate_recall_basic():
    preds = {"u1": [5, 3, 9, 7], "u2": [1, 2, 3]}
    gd = {"u1": [3, 7], "u2": [99]}
    res = evaluate_recall(preds, gd, topn=4)
    # u1: both items hit -> recall 1.0; u2: miss -> 0
    assert res["recall@4"] == 0.5
    assert res["hitrate@4"] == 0.5
    # u1 dcg = 1/log2(1+2) + 1/log2(3+2)... positions: 3 at idx1, 7 at idx3
    dcg = 1 / np.log2(3) + 1 / np.log2(5)
    idcg = 1 / np.log2(2) + 1 / np.log2(3)
    assert res["ndcg@4"] == round(dcg / idcg / 2, 4)


def test_merge_multi_interest_dedup_and_skip_zero():
    ids = np.array([[3, 0, 5], [5, 7, 2]])
    scores = np.array([[0.9, 0.8, 0.7], [0.95, 0.5, 0.4]])
    merged = merge_multi_interest(ids, scores, topn=3)
    # sorted by score: 5(.95), 3(.9), 0 skipped, 5 dup skipped, 7(.5)
    assert merged == [5, 3, 7]


def test_rolling_metric_buffer_bounded_and_exact():
    from rec_pangu_tpu.eval.metrics import RollingMetricBuffer

    rng = np.random.default_rng(0)
    chunks = [rng.random(7).astype(np.float32) for _ in range(30)]

    # below the window: bit-identical to plain concatenation
    buf = RollingMetricBuffer(window=1000)
    for c in chunks:
        buf.append(c)
    np.testing.assert_array_equal(
        buf.concat().reshape(-1), np.concatenate(chunks))

    # above the window: holds exactly the trailing `window` samples and the
    # internal chunk list stays bounded (constant host memory per epoch)
    buf = RollingMetricBuffer(window=20)
    for c in chunks:
        buf.append(c)
    assert len(buf) == 20
    assert len(buf._chunks) <= 4  # ceil(20/7) + 1
    np.testing.assert_array_equal(
        buf.concat().reshape(-1), np.concatenate(chunks)[-20:])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batched_merge_matches_oracle(seed):
    """The jitted device merge must produce EXACTLY the per-user Python
    oracle's lists (order included) — duplicates across interests, id-0
    padding, score ties, and users with fewer than topn unique ids."""
    import jax.numpy as jnp

    from rec_pangu_tpu.eval.retrieval import batched_merge_multi_interest

    rng = np.random.default_rng(seed)
    B, K, N, topn = 17, 4, 20, 10
    # small id range forces many cross-interest duplicates + some zeros
    ids = rng.integers(0, 30, (B, K, N)).astype(np.int32)
    # quantized scores force ties
    scores = np.round(rng.random((B, K, N)), 1).astype(np.float32)
    merged, counts = batched_merge_multi_interest(
        jnp.asarray(ids.reshape(B, -1)), jnp.asarray(scores.reshape(B, -1)),
        topn)
    merged, counts = np.asarray(merged), np.asarray(counts)
    from rec_pangu_tpu.eval.retrieval import batched_merge_multi_interest_np

    merged_np, counts_np = batched_merge_multi_interest_np(
        ids.reshape(B, -1), scores.reshape(B, -1), topn)
    for i in range(B):
        expect = merge_multi_interest(ids[i], scores[i], topn)
        assert merged[i, :counts[i]].tolist() == expect
        assert not merged[i, counts[i]:].any()
        assert merged_np[i, :counts_np[i]].tolist() == expect
        assert not merged_np[i, counts_np[i]:].any()
