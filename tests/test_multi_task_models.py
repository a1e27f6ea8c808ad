"""Multi-task zoo: init + train step + learning signal + per-task metric flow."""
import jax
import numpy as np
import pytest

from rec_pangu_tpu.data import DataLoader, MultiTaskDataset
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import create_train_state, make_train_step

from conftest import MULTITASK_SCHEMA

ALL_MTL = ["ShareBottom", "ESSM", "MMOE", "OMOE", "MLMMOE", "AITM"]


@pytest.fixture(scope="module")
def batch(multitask_df):
    ds = MultiTaskDataset(MULTITASK_SCHEMA, multitask_df[:80])
    loader = DataLoader(ds, batch_size=80)
    return ds.enc_dict, next(iter(loader))


@pytest.mark.parametrize("name", ALL_MTL)
def test_mtl_model_train_step(name, batch):
    enc_dict, b = batch
    assert b["label"].shape == (80, 2)
    model = get_model(name)(enc_dict=enc_dict, embedding_dim=8)
    # AITM's CVR tower saturates (then stalls — BCE grads vanish at deep
    # saturation, same as torch) when full-batch Adam at 1e-3 overshoots the
    # 80-row fixture with the kaiming table init; this is a wiring/learning-
    # signal test, so use a step size the fixture is stable at
    tx = make_optimizer(3e-4 if name == "AITM" else 1e-3, 1)
    state = create_train_state(model, b, tx, jax.random.PRNGKey(0))
    step = make_train_step(state.batch_stats is not None)
    rng = jax.random.PRNGKey(1)

    state, out = step(state, b, rng)
    assert {"task1_pred", "task2_pred", "loss"} <= set(out)
    loss0 = float(out["loss"])
    assert np.isfinite(loss0)
    for t in (1, 2):
        p = np.asarray(out[f"task{t}_pred"]).reshape(-1)
        assert p.shape == (80,)
        assert np.all((p >= 0) & (p <= 1))
    # learning signal: full-batch Adam is noisy step-to-step (AITM's
    # calibration term especially), so judge the best of the late steps
    losses = []
    for _ in range(30):
        state, out = step(state, b, rng)
        losses.append(float(out["loss"]))
    assert min(losses[-5:]) < loss0
