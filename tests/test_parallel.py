"""Sharding tests on the forced 8-device CPU mesh: DP/TP train-step
equivalence with single-device execution, distributed top-k correctness."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.parallel import make_mesh, shard_batch, shard_state
from rec_pangu_tpu.parallel.topk import distributed_topk
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import create_train_state, make_train_step


def _synthetic(batch=64, num_sparse=4, num_dense=2, vocab=63, seed=0):
    rng = np.random.default_rng(seed)
    enc = {f"d{i}": {"min": 0.0, "max": 1.0} for i in range(num_dense)}
    for i in range(num_sparse):
        enc[f"s{i}"] = {"vocab_size": vocab}
    b = {
        "sparse": rng.integers(0, vocab, (batch, num_sparse), dtype=np.int32),
        "dense": rng.random((batch, num_dense), dtype=np.float32),
        "label": rng.integers(0, 2, (batch,)).astype(np.float32),
    }
    return enc, b


def test_dp_tp_train_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    enc, batch = _synthetic()
    model = get_model("DeepFM")(enc_dict=enc, embedding_dim=8, hidden_units=(16,))
    tx = make_optimizer(1e-2, 1)
    rng = jax.random.PRNGKey(0)
    step_rng = jax.random.PRNGKey(1)

    # single device
    state1 = create_train_state(model, batch, tx, rng)
    step = make_train_step(False)
    losses1 = []
    for _ in range(3):
        state1, out = step(state1, batch, step_rng)
        losses1.append(float(out["loss"]))

    # 4-way DP x 2-way TP (embedding rows sharded)
    mesh = make_mesh(4, 2)
    state2 = create_train_state(model, batch, tx, rng)
    with mesh:
        state2 = shard_state(state2, mesh)
        sbatch = shard_batch(batch, mesh)
        step2 = make_train_step(False)
        losses2 = []
        for _ in range(3):
            state2, out = step2(state2, sbatch, step_rng)
            losses2.append(float(out["loss"]))

    np.testing.assert_allclose(losses1, losses2, rtol=2e-5)
    p1 = jax.tree_util.tree_leaves(state1.params)
    p2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_distributed_topk_matches_dense():
    mesh = make_mesh(2, 4)
    rng = np.random.default_rng(0)
    users = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    items = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    with mesh:
        s, i = distributed_topk(mesh, users, items, k=10)
    dense_scores = np.asarray(users @ items.T)
    ref_ids = np.argsort(-dense_scores, axis=1)[:, :10]
    ref_scores = np.take_along_axis(dense_scores, ref_ids, axis=1)
    np.testing.assert_allclose(np.asarray(s), ref_scores, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i), ref_ids)
