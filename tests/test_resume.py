"""Resume: save mid-training with optimizer state, restart, continue —
resumed run matches an uninterrupted run exactly."""
import numpy as np

from rec_pangu_tpu.data import DataLoader, RankingDataset
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train import RankTrainer

from conftest import RANKING_SCHEMA


def test_resume_matches_uninterrupted(ranking_df, tmp_path):
    ds = RankingDataset(RANKING_SCHEMA, ranking_df[:80])
    enc = ds.enc_dict

    def make():
        model = get_model("DeepFM")(enc_dict=enc, embedding_dim=8, hidden_units=(16,))
        loader = DataLoader(ds, batch_size=80, shuffle=False)
        return model, loader

    # uninterrupted: 6 epochs
    model, loader = make()
    tr_full = RankTrainer(num_task=1, model_ckpt_dir=str(tmp_path / "full"))
    tr_full.fit(model, loader, None, epoch=6, lr=1e-2, seed=42)
    full_metric = tr_full.evaluate_model(model, DataLoader(ds, batch_size=80))

    # interrupted at 3 + resumed 3
    model2, loader2 = make()
    tr_a = RankTrainer(num_task=1, model_ckpt_dir=str(tmp_path / "a"))
    tr_a.fit(model2, loader2, None, epoch=3, lr=1e-2, seed=42)
    tr_a.save_all(model2, enc, str(tmp_path / "a"))

    model3, loader3 = make()
    tr_b = RankTrainer(num_task=1, model_ckpt_dir=str(tmp_path / "b"))
    tr_b.fit(model3, loader3, None, epoch=3, lr=1e-2, seed=42,
             resume_from=str(tmp_path / "a" / "model.ckpt"))
    resumed_metric = tr_b.evaluate_model(model3, DataLoader(ds, batch_size=80))

    # same total optimization: identical metrics (deterministic data + rngs
    # differ only by the per-step fold-in, which uses the restored step)
    assert abs(full_metric["log_loss"] - resumed_metric["log_loss"]) < 1e-3
