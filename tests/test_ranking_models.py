"""Every ranking model: init + forward + one jitted train step on the bundled
CSV, on the CPU backend (smoke + contract test for the whole zoo)."""
import jax
import numpy as np
import pytest

from rec_pangu_tpu.data import DataLoader, RankingDataset
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import create_train_state, make_train_step, make_eval_step

from conftest import RANKING_SCHEMA

ALL_RANKING = ["LR", "FM", "WDL", "DeepFM", "NFM", "AFM", "FiBiNet", "AFN",
               "AOANet", "AutoInt", "CCPM", "xDeepFM", "DCN", "MaskNet"]


@pytest.fixture(scope="module")
def batch(ranking_df):
    ds = RankingDataset(RANKING_SCHEMA, ranking_df[:80])
    loader = DataLoader(ds, batch_size=80)
    return ds.enc_dict, next(iter(loader))


@pytest.mark.parametrize("name", ALL_RANKING)
def test_ranking_model_train_step(name, batch):
    enc_dict, b = batch
    kwargs = {"enc_dict": enc_dict}
    if name != "LR":
        kwargs["embedding_dim"] = 8
    model = get_model(name)(**kwargs)
    tx = make_optimizer(1e-3, 1)
    state = create_train_state(model, b, tx, jax.random.PRNGKey(0))
    step = make_train_step(state.batch_stats is not None)
    rng = jax.random.PRNGKey(1)

    state, out = step(state, b, rng)
    loss0 = float(out["loss"])
    assert np.isfinite(loss0)
    assert out["pred"].shape[0] == 80
    p = np.asarray(out["pred"]).reshape(-1)
    assert np.all((p >= 0) & (p <= 1))

    # loss decreases over a few steps (learning signal flows)
    for _ in range(10):
        state, out = step(state, b, rng)
    assert float(out["loss"]) < loss0

    # eval path
    ev = make_eval_step(state.batch_stats is not None)
    out_eval = ev(state, b)
    assert "loss" not in out_eval
    assert out_eval["pred"].shape[0] == 80
