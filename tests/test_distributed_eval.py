"""Mesh-sharded retrieval eval matches the single-device path."""
import numpy as np

from rec_pangu_tpu.data import DataLoader
from rec_pangu_tpu.data.sequence import SequenceDataset
from rec_pangu_tpu.eval.retrieval import get_recall_predict
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.parallel import make_mesh
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import create_train_state

import jax

from conftest import SEQ_SCHEMA


def test_distributed_recall_matches_single(seq_dfs):
    train, _, test = seq_dfs
    cfg = {**SEQ_SCHEMA}
    ds_train = SequenceDataset(cfg, train, phase="train")
    ds_test = SequenceDataset(cfg, test, enc_dict=ds_train.enc_dict, phase="test")
    loader = DataLoader(ds_test, batch_size=256)

    model = get_model("YotubeDNN")(enc_dict=ds_train.enc_dict,
                                   config={**cfg, "embedding_dim": 16, "K": 2,
                                           "device": -1})
    sample = {k: v[:8] for k, v in ds_train.arrays.items()}
    state = create_train_state(model, sample, make_optimizer(1e-3, 1),
                               jax.random.PRNGKey(0))
    variables = {"params": state.params}

    preds_single = get_recall_predict(model, variables,
                                      DataLoader(ds_test, batch_size=256), topn=50)
    mesh = make_mesh(2, 4)
    preds_mesh = get_recall_predict(model, variables, loader, topn=50, mesh=mesh)

    users = list(preds_single)
    assert users == list(preds_mesh)
    same = sum(preds_single[u] == preds_mesh[u] for u in users)
    # identical up to tie-breaking between equal scores
    assert same / len(users) > 0.95
    for u in users[:50]:
        assert set(preds_single[u][:10]) == set(preds_mesh[u][:10])


def test_approx_topk_scorer_matches_exact_on_cpu():
    # approx_max_k degrades to exact selection at this tiny corpus size; the
    # point is to exercise the approx code path end-to-end
    from rec_pangu_tpu.eval.retrieval import make_topn_scorer

    rng = np.random.default_rng(0)
    items = rng.standard_normal((257, 16)).astype(np.float32)
    users = rng.standard_normal((9, 16)).astype(np.float32)
    s_exact, i_exact = make_topn_scorer(items, 10)(users)
    s_apx, i_apx = make_topn_scorer(items, 10, approx_recall_target=0.95)(users)
    # same candidate sets (order may differ within score ties)
    for r in range(users.shape[0]):
        assert set(np.asarray(i_apx)[r].tolist()) == set(np.asarray(i_exact)[r].tolist())
