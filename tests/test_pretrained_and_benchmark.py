"""Pretrained-embedding injection (+freezing) and BenchmarkTrainer sweep."""
import numpy as np

from rec_pangu_tpu.data import DataLoader, RankingDataset, get_dataloader
from rec_pangu_tpu.data.encoder import FeatureSpec
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train import RankTrainer
from rec_pangu_tpu.train.benchmark import BenchmarkTrainer

from conftest import RANKING_SCHEMA


def test_set_pretrained_weights_and_freeze(ranking_df, tmp_path):
    ds = RankingDataset(RANKING_SCHEMA, ranking_df[:80])
    loader = DataLoader(ds, batch_size=80)
    enc_dict = ds.enc_dict
    dim = 8
    # pretrained vectors for a few known city values
    cities = [v for v in enc_dict["city"] if v != "vocab_size"][:3]
    pre = {c: np.full(dim, 0.5, np.float32) + i for i, c in enumerate(cities)}

    model = get_model("WDL")(enc_dict=enc_dict, embedding_dim=dim)
    trainer = RankTrainer(num_task=1, model_ckpt_dir=str(tmp_path))
    trainer.set_pretrained_weights(model, "city", pre, trainable=False)
    trainer.fit(model, loader, None, epoch=3, lr=1e-2)

    spec = FeatureSpec.from_enc_dict(enc_dict)
    sl = spec.feature_slice("city")
    table = np.asarray(trainer.state.params["FusedEmbedding_0"]["table"])
    # frozen rows unchanged after 3 epochs of training
    for i, c in enumerate(cities):
        row = table[sl.start + enc_dict["city"][c]]
        np.testing.assert_allclose(row, np.full(dim, 0.5) + i, atol=1e-6)


def test_benchmark_trainer(ranking_df, tmp_path):
    loaders = get_dataloader(ranking_df[:80], ranking_df[:90], ranking_df[:95],
                             RANKING_SCHEMA, batch_size=512)
    train_loader, valid_loader, test_loader, enc_dict = loaders
    bt = BenchmarkTrainer(
        model_list=["LR", "FM"],
        model_ckpt_dir=str(tmp_path / "ckpt"),
        benchmark_res_path=str(tmp_path / "res.csv"),
    )
    df = bt.run(train_loader, valid_loader, test_loader, enc_dict, epoch=2,
                model_kwargs={"FM": {"embedding_dim": 8}})
    assert len(df) == 2
    assert {"model_name", "train_model_time(ms)", "test_model_time(ms)",
            "valid_roc_auc_score", "test_log_loss"} <= set(df.columns)
    assert (tmp_path / "res.csv").exists()


def test_benchmark_trainer_multi_task(multitask_df, tmp_path):
    from conftest import MULTITASK_SCHEMA

    loaders = get_dataloader(multitask_df, multitask_df, multitask_df,
                             MULTITASK_SCHEMA, batch_size=512)
    train_loader, valid_loader, test_loader, enc_dict = loaders
    names = ["ShareBottom", "ESSM"]
    bt = BenchmarkTrainer(
        model_list=names, num_task=2,
        model_ckpt_dir=str(tmp_path / "ckpt"),
        benchmark_res_path=str(tmp_path / "res.csv"),
    )
    df = bt.run(train_loader, valid_loader, test_loader, enc_dict, epoch=2)
    assert len(df) == 2
    # reference parity quirk: multi-task metric keys already carry a 'test_'
    # prefix (rec_pangu/model_pipeline.py:213), so the benchmark CSV columns
    # are doubly prefixed, exactly like the reference's sweep output
    assert "valid_test_task1_roc_auc_score" in df.columns
    assert "test_test_task2_roc_auc_score" in df.columns
