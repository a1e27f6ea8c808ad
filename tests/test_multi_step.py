"""Fused multi-step training (lax.scan over K batches per dispatch) matches
step-by-step training exactly (rng folds in the step counter inside the scan)."""
import numpy as np

from rec_pangu_tpu.data import DataLoader, RankingDataset
from rec_pangu_tpu.data.sequence import SequenceDataset
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train import RankTrainer, SequenceTrainer
from rec_pangu_tpu.utils import seed_everything

from conftest import RANKING_SCHEMA, SEQ_SCHEMA


def test_steps_per_call_matches_single(ranking_df, tmp_path):
    ds = RankingDataset(RANKING_SCHEMA, ranking_df[:80])
    enc = ds.enc_dict

    def run(k):
        model = get_model("DeepFM")(enc_dict=enc, embedding_dim=8, hidden_units=(16,))
        loader = DataLoader(ds, batch_size=20, shuffle=True, seed=5)
        tr = RankTrainer(num_task=1, model_ckpt_dir=str(tmp_path / f"k{k}"))
        m = tr.fit(model, loader, None, epoch=4, lr=1e-2, seed=9, steps_per_call=k)
        return m, tr.evaluate_model(model, DataLoader(ds, batch_size=80))

    m1, e1 = run(1)
    m2, e2 = run(2)
    assert m1 == m2, f"train metrics differ: {m1} vs {m2}"
    assert e1 == e2, f"eval metrics differ: {e1} vs {e2}"


def test_sequence_steps_per_call_matches_single(seq_dfs, tmp_path):
    train, _, test = seq_dfs
    enc = SequenceDataset(SEQ_SCHEMA, train, phase="train").enc_dict
    ds_test = SequenceDataset(SEQ_SCHEMA, test, enc_dict=enc, phase="test")
    config = {"embedding_dim": 16, "K": 2, **SEQ_SCHEMA}

    def run(k):
        seed_everything(7)
        # fresh dataset per run: SequenceDataset owns the window-sampling
        # RNG, so reusing one instance would give the second run different
        # random windows than the first
        ds = SequenceDataset(SEQ_SCHEMA, train, phase="train", seed=11)
        model = get_model("GRU4Rec")(enc_dict=enc, config=config)
        loader = DataLoader(ds, batch_size=64, shuffle=True, seed=5)
        tr = SequenceTrainer(model_ckpt_dir=str(tmp_path / f"seq_k{k}"))
        tr.fit(model, loader, None, epoch=2, lr=1e-2, seed=9, steps_per_call=k)
        return tr.evaluate_model(model, DataLoader(ds_test, batch_size=128),
                                 topk_list=[20])

    e1 = run(1)
    e2 = run(2)
    assert e1 == e2, f"eval metrics differ: {e1} vs {e2}"


def test_sequence_fused_steps_per_call_matches_single(tmp_path, monkeypatch):
    """K-step scan over the seq FUSED step (in-kernel item-table Adam +
    streaming-CE grad) trains to the same parameters as step-by-step."""
    import jax

    # the planned/fused kernels are TPU-gated; interpret mode runs them on CPU
    monkeypatch.setenv("REC_PANGU_TPU_PALLAS_INTERPRET", "1")

    VOCAB, B, L = 65537, 1024, 8  # >= _FUSED_MIN_VOCAB -> fused path on
    rng = np.random.default_rng(3)
    batches = []
    for _ in range(4):
        lens = rng.integers(2, L + 1, B)
        hist = np.zeros((B, L), dtype=np.int32)
        mask = np.zeros((B, L), dtype=np.float32)
        for i, n in enumerate(lens):
            hist[i, :n] = rng.integers(1, VOCAB, n)
            mask[i, :n] = 1.0
        batches.append({"hist_item_list": hist, "hist_mask_list": mask,
                        "target_item": rng.integers(1, VOCAB, B).astype(np.int32)})
    enc = {"item_id": {"vocab_size": VOCAB}}
    cfg = {"embedding_dim": 8, "max_length": L, "item_col": "item_id",
           "cate_cols": [], "device": -1}

    def run(k, tag):
        model = get_model("GRU4Rec")(enc_dict=enc, config=dict(cfg))
        tr = SequenceTrainer(model_ckpt_dir=str(tmp_path / tag))
        tr.fit(model, [dict(b) for b in batches], None, epoch=1, lr=1e-2,
               seed=5, steps_per_call=k)
        assert getattr(tr, "_fused_step", None) is not None, \
            "fused seq path did not engage"
        return tr

    t1 = run(1, "k1")
    t2 = run(2, "k2")
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
