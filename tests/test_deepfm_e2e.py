"""End-to-end slice: DeepFM on the bundled ranking CSV — schema -> enc ->
fused batches -> jitted train -> AUC/logloss (SURVEY.md §7.2 stage 6)."""
import numpy as np

from rec_pangu_tpu.data import get_dataloader
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train import RankTrainer

from conftest import RANKING_SCHEMA


def test_deepfm_end_to_end(ranking_df, tmp_path):
    train_df, valid_df, test_df = ranking_df[:80], ranking_df[:90], ranking_df[:95]
    train_loader, valid_loader, test_loader, enc_dict = get_dataloader(
        train_df, valid_df, test_df, RANKING_SCHEMA, batch_size=512
    )
    model = get_model("DeepFM")(enc_dict=enc_dict, embedding_dim=16, hidden_units=(32, 32))
    trainer = RankTrainer(num_task=1, model_ckpt_dir=str(tmp_path / "ckpt"))
    train_metric = trainer.fit(model, train_loader, valid_loader, epoch=60, lr=1e-3,
                               use_earlystopping=True, max_patience=20,
                               monitor_metric="roc_auc_score")
    assert "train_roc_auc_score" in train_metric
    # 60 epochs on 80 rows should comfortably overfit past random (the
    # torch-kaiming table init converges a touch slower on this fixture
    # than the old tiny init; train AUC hits 1.0 by epoch ~50)
    assert train_metric["train_roc_auc_score"] > 0.95

    test_metric = trainer.evaluate_model(model, test_loader)
    assert set(test_metric) == {"roc_auc_score", "log_loss"}
    assert 0.0 <= test_metric["roc_auc_score"] <= 1.0

    # save/load round trip + predict_dataframe (inference path parity)
    trainer.save_all(model, enc_dict, str(tmp_path / "ckpt"))
    preds = trainer.predict_dataframe(model, test_df, enc_dict, RANKING_SCHEMA)
    assert preds.shape == (95,)
    assert np.all((preds >= 0) & (preds <= 1))

    # predictions from dataloader and dataframe paths must agree
    preds2 = trainer.predict_dataloader(model, test_loader)
    np.testing.assert_allclose(preds, preds2, rtol=1e-5)
