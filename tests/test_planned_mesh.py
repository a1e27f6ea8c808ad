"""Data-parallel planned embedding path (SURVEY.md §2.6): per-shard host
plans + shard_map-wrapped Pallas kernels must match the plain gather/scatter
semantics exactly.  Runs on the forced 8-device CPU mesh with the kernels in
interpret mode (REC_PANGU_TPU_PALLAS_INTERPRET=1)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rec_pangu_tpu.parallel.mesh import make_mesh, set_active_mesh


@pytest.fixture(autouse=True)
def _interpret_kernels(monkeypatch):
    monkeypatch.setenv("REC_PANGU_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("REC_PANGU_TPU_EMB_GRAD_PRECISION", "highest")
    yield
    set_active_mesh(None)


def test_planned_gather_dp_matches_take():
    from rec_pangu_tpu.ops.kernels.embedding_grad import (
        make_sharded_sort_plan, padded_rows, planned_gather_dp)

    V, D, B, F, N_SHARDS = 65536, 16, 2048, 8, 4
    assert padded_rows(V) == V
    mesh = make_mesh(N_SHARDS, 1)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    ids = rng.integers(0, V, (B, F)).astype(np.int64)
    plan = make_sharded_sort_plan(ids.reshape(-1), V, N_SHARDS)
    assert plan["meta"].ndim == 2 and plan["meta"].shape[0] == N_SHARDS
    plan_j = {k: jnp.asarray(v) for k, v in plan.items()}
    ids_j = jnp.asarray(ids)

    out = planned_gather_dp(table, ids_j, plan_j, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[ids],
                               rtol=1e-6, atol=1e-6)

    w = jnp.asarray(rng.standard_normal((B, F, D)).astype(np.float32))

    def loss_dp(t):
        return (planned_gather_dp(t, ids_j, plan_j, mesh) * w).sum()

    def loss_ref(t):
        return (jnp.take(t, ids_j, axis=0) * w).sum()

    g_dp = jax.jit(jax.grad(loss_dp))(table)
    g_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_planned_gather_tp_matches_take():
    """Tensor-parallel path: table row-sharded over 'model', per-(data,
    model)-shard subset plans, all_gather reassembly — forward and table
    gradient must match the plain gather exactly."""
    from rec_pangu_tpu.ops.kernels.embedding_grad import (
        make_tp_sort_plan, planned_gather_tp, tp_plan_matches)

    V, D, B, F = 65536, 16, 2048, 8
    N_DATA, N_MODEL = 4, 2
    mesh = make_mesh(N_DATA, N_MODEL)
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    ids = rng.integers(0, V, (B, F)).astype(np.int64)
    plan = make_tp_sort_plan(ids.reshape(-1), V, N_MODEL, n_data=N_DATA)
    assert plan is not None and plan["meta"].ndim == 3
    assert tp_plan_matches(plan, ids.size, V, N_DATA, N_MODEL)
    plan_j = {k: jnp.asarray(v) for k, v in plan.items()}
    ids_j = jnp.asarray(ids)

    out = planned_gather_tp(table, ids_j, plan_j, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[ids],
                               rtol=1e-6, atol=1e-6)

    w = jnp.asarray(rng.standard_normal((B, F, D)).astype(np.float32))

    def loss_tp(t):
        return (planned_gather_tp(t, ids_j, plan_j, mesh) * w).sum()

    def loss_ref(t):
        return (jnp.take(t, ids_j, axis=0) * w).sum()

    g_tp = jax.jit(jax.grad(loss_tp))(table)
    g_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g_tp), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_planned_gather_tp_low_density_gather_branch():
    """Large shards vs few lookups route the TP forward through the per-slot
    gather branch (no scan kernel) — parity must still hold incl. grads."""
    from rec_pangu_tpu.ops.kernels.embedding_grad import (
        make_tp_sort_plan, planned_gather_tp)

    V, D, B, F = 2 ** 20, 8, 1024, 8  # slots*12 < shard_rows -> gather branch
    N_DATA, N_MODEL = 1, 2
    mesh = make_mesh(N_DATA, N_MODEL)
    rng = np.random.default_rng(9)
    table = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    ids = rng.integers(0, V, (B, F)).astype(np.int64)
    plan = make_tp_sort_plan(ids.reshape(-1), V, N_MODEL, n_data=N_DATA)
    assert plan is not None
    plan_j = {k: jnp.asarray(v) for k, v in plan.items()}
    ids_j = jnp.asarray(ids)
    out = planned_gather_tp(table, ids_j, plan_j, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[ids],
                               rtol=1e-6, atol=1e-6)
    w = jnp.asarray(rng.standard_normal((B, F, D)).astype(np.float32))
    g_tp = jax.jit(jax.grad(
        lambda t: (planned_gather_tp(t, ids_j, plan_j, mesh) * w).sum()))(table)
    g_ref = jax.grad(
        lambda t: (jnp.take(t, ids_j, axis=0) * w).sum())(table)
    np.testing.assert_allclose(np.asarray(g_tp), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_tp_plan_overflow_returns_none():
    """A batch whose ids all land on one table shard overflows the capacity
    -> make_tp_sort_plan returns None and callers keep the GSPMD gather."""
    from rec_pangu_tpu.ops.kernels.embedding_grad import make_tp_sort_plan

    V = 65536
    ids = np.full((8192,), 7, dtype=np.int64)  # all on shard 0
    assert make_tp_sort_plan(ids, V, n_model=4, n_data=1) is None


def test_fused_encoder_dp_matches_single_device():
    """Fused Pallas encoder under a DP mesh (shard_map per-shard kernels,
    VERDICT r4 item 4) must match the single-device kernel exactly —
    forward and grads, dropout off."""
    from rec_pangu_tpu.ops.kernels.fused_encoder import (
        encoder_mesh_ok, fused_encoder, fused_encoder_dp, pack_params)
    from rec_pangu_tpu.ops.sequence_enc import TransformerEncoder

    N, L, D, HEADS, INNER, LAYERS = 16, 10, 8, 2, 16, 2
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((N, L, D)), jnp.float32)
    lens = rng.integers(1, L + 1, N)
    key_valid = jnp.asarray(
        (np.arange(L)[None, :] < lens[:, None]).astype(np.float32))
    enc = TransformerEncoder(n_layers=LAYERS, n_heads=HEADS,
                             inner_size=INNER, hidden_dropout_prob=0.0,
                             attn_dropout_prob=0.0, hidden_act="relu",
                             layer_norm_eps=1e-12)
    causal = jnp.broadcast_to(
        jnp.asarray(key_valid)[:, None, None, :].astype(bool), (N, 1, L, L))
    causal = jnp.tril(causal)
    params = enc.init({"params": jax.random.PRNGKey(0)}, x, causal, False)
    packed = pack_params(params["params"], LAYERS)

    def run_single(xx, pp):
        return fused_encoder(xx, pp, key_valid, jnp.int32(0), LAYERS, HEADS,
                             INNER, 0.0, 0.0, 1e-12, False, 4, True)

    y_ref = run_single(x, packed)
    co = jnp.asarray(rng.standard_normal((N, L, D)), jnp.float32)
    gref_x, gref_p = jax.grad(
        lambda xx, pp: jnp.vdot(run_single(xx, pp), co), (0, 1))(x, packed)

    mesh = make_mesh(4, 1)
    set_active_mesh(mesh)
    ok, m, per_shard = encoder_mesh_ok(N)
    assert ok and m is mesh and per_shard == N // 4

    def run_dp(xx, pp):
        return fused_encoder_dp(xx, pp, key_valid, jnp.int32(0), mesh,
                                LAYERS, HEADS, INNER, 0.0, 0.0, 1e-12,
                                False, 4, True)

    y_dp = jax.jit(run_dp)(x, packed)
    np.testing.assert_allclose(np.asarray(y_dp), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)
    gdp_x, gdp_p = jax.jit(jax.grad(
        lambda xx, pp: jnp.vdot(run_dp(xx, pp), co), (0, 1)))(x, packed)
    np.testing.assert_allclose(np.asarray(gdp_x), np.asarray(gref_x),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(gdp_p, gref_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sasrec_trains_under_dp_mesh_with_fused_encoder(tmp_path, monkeypatch):
    """End-to-end: SASRec under a 4-device DP mesh with the fused encoder
    FORCED on must train (gates allow the mesh now) and produce params close
    to the single-device fused run on the same batches."""
    from rec_pangu_tpu.models import get_model
    from rec_pangu_tpu.train import SequenceTrainer

    monkeypatch.setenv("REC_PANGU_TPU_FUSED_ENCODER", "1")
    monkeypatch.setenv("REC_PANGU_TPU_FUSED_ADAM", "0")  # isolate encoder
    VOCAB, Bb, Lb = 4096, 64, 8
    rng = np.random.default_rng(11)
    lens = rng.integers(2, Lb + 1, Bb)
    hist = np.zeros((Bb, Lb), dtype=np.int32)
    mask = np.zeros((Bb, Lb), dtype=np.float32)
    for i, n in enumerate(lens):
        hist[i, :n] = rng.integers(1, VOCAB, n)
        mask[i, :n] = 1.0
    batch = {"hist_item_list": hist, "hist_mask_list": mask,
             "target_item": rng.integers(1, VOCAB, Bb).astype(np.int32)}
    enc = {"item_id": {"vocab_size": VOCAB}}
    cfg = {"embedding_dim": 8, "max_length": Lb, "item_col": "item_id",
           "cate_cols": [], "device": -1, "n_layers": 1, "n_heads": 2,
           # dropout off: the mesh path folds the shard index into the
           # dropout seed, so streams (correctly) differ from single-device
           "hidden_dropout_prob": 0.0, "attn_dropout_prob": 0.0}

    def run(mesh_shape, tag):
        mesh = make_mesh(*mesh_shape) if mesh_shape else None
        model = get_model("SASRec")(enc_dict=enc, config=dict(cfg))
        tr = SequenceTrainer(model_ckpt_dir=str(tmp_path / tag))
        tr.fit(model, [dict(batch)] * 2, None, epoch=1, lr=1e-2, seed=5,
               mesh=mesh)
        return tr

    t_mesh = run((4, 1), "mesh")
    t_single = run(None, "single")
    from jax.tree_util import keystr, tree_leaves_with_path

    for (ka, a), (_, b) in zip(
            tree_leaves_with_path(t_mesh.state.params),
            tree_leaves_with_path(t_single.state.params)):
        if "key']['bias" in keystr(ka):
            # softmax scores are invariant to the key projection's bias, so
            # its "gradient" is pure float-cancellation noise that Adam's
            # g/sqrt(v) normalization amplifies to lr scale — reduction
            # order (mesh psum vs single-device sum) legitimately changes
            # it.  Verified identical-math via the one-step gradient check
            # above; excluded here.
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=keystr(ka))


def test_trainer_tp_planned_matches_single_device(tmp_path):
    """RankTrainer on a (4 data x 2 model) mesh with row-sharded tables and
    TP plans trains to the same parameters as single-device."""
    from rec_pangu_tpu.models import get_model
    from rec_pangu_tpu.train import RankTrainer

    VOCAB = 8191  # 8 features x (vocab+1) rows = 65536
    rng = np.random.default_rng(11)
    batches = _mk_batches(rng, VOCAB)

    enc = {f"dense_{i}": {"min": 0.0, "max": 1.0} for i in range(4)}
    for i in range(8):
        enc[f"sparse_{i}"] = {"vocab_size": VOCAB}

    def run(mesh, tag):
        model = get_model("DeepFM")(enc_dict=enc, embedding_dim=8,
                                    hidden_units=(16,))
        tr = RankTrainer(num_task=1, model_ckpt_dir=str(tmp_path / tag))
        tr.fit(model, [dict(b) for b in batches], None, epoch=1, lr=1e-2,
               mesh=mesh, seed=13)
        return tr

    tr_tp = run(make_mesh(4, 2), "tp")
    sample = tr_tp._attach_plan(dict(batches[0]))
    assert "emb_plan" in sample and sample["emb_plan"]["meta"].ndim == 3
    tr_single = run(None, "tp_single")
    leaves_m = jax.tree_util.tree_leaves(tr_tp.state.params)
    leaves_s = jax.tree_util.tree_leaves(tr_single.state.params)
    for a, b in zip(leaves_m, leaves_s):
        # single-device uses the fused Adam kernel, TP the optax update —
        # identical math, different summation order
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=5e-5)


def _mk_batches(rng, vocab, n_batches=2, batch=2048, n_sparse=8, n_dense=4):
    out = []
    for _ in range(n_batches):
        out.append({
            "sparse": rng.integers(0, vocab, (batch, n_sparse)).astype(np.int32),
            "dense": rng.random((batch, n_dense)).astype(np.float32),
            "label": rng.integers(0, 2, (batch,)).astype(np.float32),
        })
    return out


def test_trainer_dp_planned_matches_single_device(tmp_path):
    """RankTrainer under an 8x1 mesh (sharded plans + shard_map kernels)
    trains to the same parameters as the single-device planned path."""
    from rec_pangu_tpu.models import get_model
    from rec_pangu_tpu.train import RankTrainer

    VOCAB = 8191  # 8 features x (vocab+1) rows = 65536 -> planned path on
    rng = np.random.default_rng(1)
    batches = _mk_batches(rng, VOCAB)
    enc = {f"dense_{i}": {"min": 0.0, "max": 1.0} for i in range(4)}
    for i in range(8):
        enc[f"sparse_{i}"] = {"vocab_size": VOCAB}

    def run(mesh, tag):
        model = get_model("DeepFM")(enc_dict=enc, embedding_dim=8,
                                    hidden_units=(16,))
        tr = RankTrainer(num_task=1, model_ckpt_dir=str(tmp_path / tag))
        tr.fit(model, [dict(b) for b in batches], None, epoch=1, lr=1e-2,
               mesh=mesh, seed=3)
        return tr

    tr_mesh = run(make_mesh(8, 1), "mesh")
    # the mesh run must actually have used sharded plans (not a fallback),
    # and the fused (in-kernel Adam, all_gather cotangent) path must engage
    sample = tr_mesh._attach_plan(dict(batches[0]))
    assert "emb_plan" in sample and sample["emb_plan"]["meta"].ndim == 2
    assert getattr(tr_mesh, "_fused_step", None) is not None
    assert "emb_plan_global" in sample
    tr_single = run(None, "single")

    leaves_m = jax.tree_util.tree_leaves(tr_mesh.state.params)
    leaves_s = jax.tree_util.tree_leaves(tr_single.state.params)
    assert len(leaves_m) == len(leaves_s)
    for a, b in zip(leaves_m, leaves_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    # eval under the mesh exercises the sharded-plan scan-select forward
    em = tr_mesh.evaluate_model(None, [dict(batches[0])])
    es = tr_single.evaluate_model(None, [dict(batches[0])])
    assert abs(em["roc_auc_score"] - es["roc_auc_score"]) < 1e-3
    assert abs(em["log_loss"] - es["log_loss"]) < 1e-3


def test_sequence_trainer_dp_planned_matches_single_device(tmp_path):
    """SequenceTrainer: the hist-item lookup's sharded plan + shard_map
    kernels train GRU4Rec to the same parameters as single-device."""
    from rec_pangu_tpu.models import get_model
    from rec_pangu_tpu.train import SequenceTrainer

    VOCAB, B, L = 65537, 1024, 8  # >= _MIN_TABLE_ROWS -> planned path on
    rng = np.random.default_rng(3)
    lens = rng.integers(2, L + 1, B)
    hist = np.zeros((B, L), dtype=np.int32)
    mask = np.zeros((B, L), dtype=np.float32)
    for i, n in enumerate(lens):
        hist[i, :n] = rng.integers(1, VOCAB, n)
        mask[i, :n] = 1.0
    batch = {"hist_item_list": hist, "hist_mask_list": mask,
             "target_item": rng.integers(1, VOCAB, B).astype(np.int32)}
    enc = {"item_id": {"vocab_size": VOCAB}}
    cfg = {"embedding_dim": 8, "max_length": L, "item_col": "item_id",
           "cate_cols": [], "device": -1}

    def run(mesh, tag):
        model = get_model("GRU4Rec")(enc_dict=enc, config=dict(cfg))
        tr = SequenceTrainer(model_ckpt_dir=str(tmp_path / tag))
        tr.fit(model, [dict(batch)], None, epoch=1, lr=1e-2, mesh=mesh,
               seed=5)
        return tr

    tr_mesh = run(make_mesh(8, 1), "seq_mesh")
    sample = tr_mesh._attach_plan(dict(batch))
    assert "emb_plan" in sample and sample["emb_plan"]["meta"].ndim == 2
    assert getattr(tr_mesh, "_fused_step", None) is not None
    assert "emb_plan_global" in sample
    tr_single = run(None, "seq_single")
    leaves_m = jax.tree_util.tree_leaves(tr_mesh.state.params)
    leaves_s = jax.tree_util.tree_leaves(tr_single.state.params)
    for a, b in zip(leaves_m, leaves_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_partial_batch_under_mesh_falls_back(tmp_path):
    """A batch whose row count does not divide the data axis gets no sharded
    plan and is replicated — correctness preserved."""
    from rec_pangu_tpu.models import get_model
    from rec_pangu_tpu.train import RankTrainer

    VOCAB = 8191
    rng = np.random.default_rng(2)
    batches = _mk_batches(rng, VOCAB, n_batches=1, batch=2048)
    batches.append({k: v[:100] for k, v in batches[0].items()})  # partial
    enc = {f"dense_{i}": {"min": 0.0, "max": 1.0} for i in range(4)}
    for i in range(8):
        enc[f"sparse_{i}"] = {"vocab_size": VOCAB}
    model = get_model("DeepFM")(enc_dict=enc, embedding_dim=8,
                                hidden_units=(16,))
    tr = RankTrainer(num_task=1, model_ckpt_dir=str(tmp_path / "pb"))
    tr.fit(model, batches, None, epoch=1, lr=1e-2, mesh=make_mesh(8, 1))
    out = tr.predict_dataloader(model, [batches[1]])
    assert out.shape == (100,)
    assert np.isfinite(out).all()
