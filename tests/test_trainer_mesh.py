"""Trainer-level mesh support: fit(mesh=...) produces the same metrics as
single-device training."""
import numpy as np

from rec_pangu_tpu.data import DataLoader, RankingDataset
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.parallel import make_mesh
from rec_pangu_tpu.train import RankTrainer

from conftest import RANKING_SCHEMA


def test_rank_trainer_with_mesh(ranking_df, tmp_path):
    ds = RankingDataset(RANKING_SCHEMA, ranking_df[:80])
    enc = ds.enc_dict

    def run(mesh):
        loader = DataLoader(ds, batch_size=80, shuffle=True, seed=7)
        model = get_model("DeepFM")(enc_dict=enc, embedding_dim=8, hidden_units=(16,))
        tr = RankTrainer(num_task=1, model_ckpt_dir=str(tmp_path / "m"))
        tr.fit(model, loader, None, epoch=3, lr=1e-2, mesh=mesh)
        return tr.evaluate_model(model, DataLoader(ds, batch_size=80))

    single = run(None)
    sharded = run(make_mesh(4, 2))
    assert abs(single["roc_auc_score"] - sharded["roc_auc_score"]) < 5e-3
    assert abs(single["log_loss"] - sharded["log_loss"]) < 5e-3


def test_mesh_with_partial_batches(ranking_df, tmp_path):
    """Regression: final partial batch (not divisible by the data axis) and
    steps_per_call stacking must not crash under a mesh."""
    ds = RankingDataset(RANKING_SCHEMA, ranking_df[:90])  # 90 % 64 = 26 tail
    model = get_model("DeepFM")(enc_dict=ds.enc_dict, embedding_dim=8,
                                hidden_units=(16,))
    tr = RankTrainer(num_task=1, model_ckpt_dir=str(tmp_path / "pm"))
    loader = DataLoader(ds, batch_size=64, shuffle=True, seed=2)
    tr.fit(model, loader, None, epoch=2, lr=1e-2, mesh=make_mesh(8, 1),
           steps_per_call=2)
    metrics = tr.evaluate_model(model, DataLoader(ds, batch_size=64))
    assert 0.0 <= metrics["roc_auc_score"] <= 1.0
