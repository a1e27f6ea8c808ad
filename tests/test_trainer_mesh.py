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
