"""Fused multi-step training (lax.scan over K batches per dispatch) matches
step-by-step training exactly (rng folds in the step counter inside the scan)."""
import numpy as np

from rec_pangu_tpu.data import DataLoader, RankingDataset
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train import RankTrainer

from conftest import RANKING_SCHEMA


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
