"""Serving: jitted scorers + SavedModel / StableHLO export round-trips."""
import jax
import numpy as np
import pytest

from rec_pangu_tpu.data import DataLoader, RankingDataset
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.serving import (
    construct_dummy_data,
    export2tf,
    export_stablehlo,
    make_ranking_scorer,
    make_retrieval_scorer,
)
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import create_train_state

from conftest import RANKING_SCHEMA


@pytest.fixture(scope="module")
def trained(ranking_df):
    ds = RankingDataset(RANKING_SCHEMA, ranking_df[:80])
    batch = next(iter(DataLoader(ds, batch_size=80)))
    model = get_model("DeepFM")(enc_dict=ds.enc_dict, embedding_dim=8,
                                hidden_units=(16,))
    state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                               jax.random.PRNGKey(0))
    return model, {"params": state.params}, ds.enc_dict, batch


def test_ranking_scorer(trained):
    model, variables, enc_dict, batch = trained
    score = make_ranking_scorer(model, variables)
    preds = np.asarray(score({"sparse": batch["sparse"], "dense": batch["dense"]}))
    assert preds.shape == (80,)
    assert np.all((preds >= 0) & (preds <= 1))


def test_export_stablehlo_roundtrip(trained, tmp_path):
    model, variables, enc_dict, batch = trained
    path = export_stablehlo(model, variables, enc_dict, str(tmp_path / "m.hlo"))
    from jax import export as jax_export

    with open(path, "rb") as f:
        rehydrated = jax_export.deserialize(f.read())
    dummy = construct_dummy_data(enc_dict)
    out = rehydrated.call(dummy)
    assert np.asarray(out).shape == (2,)


def test_export_savedmodel(trained, tmp_path):
    tf = pytest.importorskip("tensorflow")
    model, variables, enc_dict, batch = trained
    path = export2tf(model, variables, enc_dict, str(tmp_path / "serve"), version=1)
    loaded = tf.saved_model.load(path)
    dummy = construct_dummy_data(enc_dict, batch_size=5)
    out = loaded.f({"sparse": tf.constant(dummy["sparse"]),
                    "dense": tf.constant(dummy["dense"])})
    assert out.shape == (5,)
    # matches the jax scorer on the same input
    ours = np.asarray(make_ranking_scorer(model, variables)(dummy))
    np.testing.assert_allclose(out.numpy(), ours, rtol=1e-5)


def test_retrieval_scorer(ranking_df):
    # tiny sequence model for the retrieval endpoint
    mapping = {str(i): i for i in range(1, 30)}
    mapping["vocab_size"] = 30
    enc_dict = {"item_id": mapping}
    cfg = {"embedding_dim": 8, "max_length": 6, "item_col": "item_id",
           "cate_cols": [], "K": 2, "device": -1}
    model = get_model("YotubeDNN")(enc_dict=enc_dict, config=cfg)
    batch = {
        "hist_item_list": np.ones((4, 6), np.int32),
        "hist_mask_list": np.ones((4, 6), np.float32),
        "target_item": np.ones((4,), np.int32),
    }
    state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                               jax.random.PRNGKey(0))
    retrieve = make_retrieval_scorer(model, {"params": state.params}, topk=5)
    scores, ids = retrieve({k: batch[k] for k in ("hist_item_list", "hist_mask_list")})
    assert scores.shape == (4, 5) and ids.shape == (4, 5)
