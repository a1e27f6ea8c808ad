"""Graph-CF stack: GeneralGraphDataset sampling, NGCF training, eval."""
import numpy as np
import pandas as pd

from rec_pangu_tpu.data.graph_dataset import GeneralGraphDataset
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train import GraphTrainer

NUM_USER, NUM_ITEM = 30, 40


def make_df(rng, n=400):
    return pd.DataFrame({
        "user_id": rng.integers(0, NUM_USER, n),
        "item_id": rng.integers(0, NUM_ITEM, n),
    }).drop_duplicates()


def test_graph_dataset_and_ngcf(rng):
    train_df = make_df(rng)
    test_df = make_df(rng, 100)
    train_ds = GeneralGraphDataset(train_df, NUM_USER, NUM_ITEM, phase="train")
    test_ds = GeneralGraphDataset(test_df, NUM_USER, NUM_ITEM, phase="test")

    g = train_ds.generate_graph()
    assert g.shape == (NUM_USER, NUM_ITEM)
    # symmetric degree normalization: row/col sums bounded
    assert np.isfinite(g).all()

    batch = train_ds.sample(16)
    assert batch["user_id"].shape == (16,)
    # negatives never collide with the user's seen items
    for u, n in zip(batch["user_id"], batch["neg_item_id"]):
        assert int(n) not in set(train_ds.test_gd[int(u)])

    model = get_model("NGCF")(num_user=NUM_USER, num_item=NUM_ITEM,
                              embedding_dim=8, hidden_size=[8, 8], g=g)
    trainer = GraphTrainer()
    trainer.fit(model, train_ds, epoch=2, lr=1e-2, batch_size=64)
    metrics = trainer.evaluate_model(model, train_ds, test_ds, topN=20)
    assert set(metrics) == {"recall@20", "ndcg@20", "hitrate@20"}
    assert 0.0 <= metrics["recall@20"] <= 1.0

    # Device-side eval == reference semantics (model_pipeline.py:344-365):
    # host-numpy oracle does raw argsort top-1000 then filters seen items;
    # the jitted masked-top-k path must rank the same unseen items.
    from rec_pangu_tpu.eval.retrieval import evaluate_recall

    out = trainer._eval_step(trainer.state, {})
    user_embs = np.asarray(out["user_emb"])
    item_embs = np.asarray(out["item_emb"])
    oracle = {}
    for u in test_ds.test_gd:
        scores = user_embs[u] @ item_embs.T
        top = np.argsort(-scores)[: min(1000, item_embs.shape[0])]
        seen = set(train_ds.test_gd.get(u, []))
        oracle[u] = [int(x) for x in top if int(x) not in seen]
    oracle_metrics = evaluate_recall(oracle, test_ds.test_gd, 20)
    assert metrics == oracle_metrics
