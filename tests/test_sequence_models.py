"""Sequence zoo: init + train step + learning signal on a small synthetic
sequence batch (fast), with shape contracts for single/multi-interest."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import create_train_state, make_train_step, make_eval_step

CLASSIC = ["YotubeDNN", "GRU4Rec", "NARM", "SASRec", "STAMP", "NextItNet",
           "SINE", "CLRec", "ContraRec", "SRGNN", "GCSAN", "NISER"]
MULTI_INTEREST = ["ComirecSA", "ComirecDR", "MIND"]
# models whose train output has no (or differently-shaped) user_emb
SPECIAL = ["Re4", "CMI", "IOCRec"]

VOCAB = 50  # items 1..49, 0 = padding
L = 12
B = 16


def make_config(**over):
    cfg = {
        "embedding_dim": 16,
        "max_length": L,
        "item_col": "item_id",
        "cate_cols": [],
        "device": -1,
        "K": 4,
    }
    cfg.update(over)
    return cfg


@pytest.fixture(scope="module")
def seq_batch():
    rng = np.random.default_rng(0)
    lens = rng.integers(2, L + 1, B)
    hist = np.zeros((B, L), dtype=np.int32)
    mask = np.zeros((B, L), dtype=np.float32)
    for i, n in enumerate(lens):
        hist[i, :n] = rng.integers(1, VOCAB, n)
        mask[i, :n] = 1.0
    return {
        "hist_item_list": hist,
        "hist_mask_list": mask,
        "target_item": rng.integers(1, VOCAB, B).astype(np.int32),
        "next_item_list": rng.integers(1, VOCAB, (B, 10)).astype(np.int32),
        "next_mask_list": np.ones((B, 10), dtype=np.float32),
    }


@pytest.fixture(scope="module")
def enc_dict():
    mapping = {str(i): i for i in range(1, VOCAB)}
    mapping["vocab_size"] = VOCAB
    return {"item_id": mapping}


@pytest.mark.parametrize("name", CLASSIC + MULTI_INTEREST)
def test_sequence_model_train_step(name, seq_batch, enc_dict):
    model = get_model(name)(enc_dict=enc_dict, config=make_config())
    tx = make_optimizer(1e-3, 1)
    state = create_train_state(model, seq_batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(state.batch_stats is not None)
    rng = jax.random.PRNGKey(1)

    state, out = step(state, seq_batch, rng)
    loss0 = float(out["loss"])
    assert np.isfinite(loss0)
    if name in MULTI_INTEREST:
        assert out["user_emb"].shape == (B, 4, 16)
    else:
        assert out["user_emb"].shape == (B, 16)

    for _ in range(15):
        state, out = step(state, seq_batch, rng)
    assert float(out["loss"]) < loss0

    # eval path + output_items for retrieval
    ev = make_eval_step(state.batch_stats is not None)
    eval_batch = {k: v for k, v in seq_batch.items()
                  if k in ("hist_item_list", "hist_mask_list")}
    out_eval = ev(state, eval_batch)
    assert "loss" not in out_eval
    items = model.apply({"params": state.params}, method="output_items")
    assert items.shape == (VOCAB, 16)
    np.testing.assert_allclose(np.asarray(items[0]), 0.0)  # padding row zeroed


@pytest.mark.parametrize("name", SPECIAL)
def test_special_sequence_models(name, seq_batch, enc_dict):
    model = get_model(name)(enc_dict=enc_dict, config=make_config())
    tx = make_optimizer(1e-3, 1)
    state = create_train_state(model, seq_batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(state.batch_stats is not None)
    rng = jax.random.PRNGKey(1)
    state, out = step(state, seq_batch, rng)
    loss0 = float(out["loss"])
    assert np.isfinite(loss0)
    for _ in range(10):
        state, out = step(state, seq_batch, rng)
    assert float(out["loss"]) < loss0

    # eval path returns user_emb for retrieval
    ev = make_eval_step(state.batch_stats is not None)
    eval_batch = {k: v for k, v in seq_batch.items()
                  if k in ("hist_item_list", "hist_mask_list")}
    out_eval = ev(state, eval_batch)
    ue = out_eval["user_emb"]
    assert ue.shape[0] == B and ue.shape[-1] == 16
    assert np.all(np.isfinite(np.asarray(ue)))


def test_sampled_softmax_loss(seq_batch, enc_dict):
    model = get_model("GRU4Rec")(
        enc_dict=enc_dict,
        config=make_config(loss_type="sampled", num_negatives=32))
    tx = make_optimizer(1e-3, 1)
    state = create_train_state(model, seq_batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(state.batch_stats is not None)
    rng = jax.random.PRNGKey(1)
    state, out = step(state, seq_batch, rng)
    loss0 = float(out["loss"])
    assert np.isfinite(loss0)
    for _ in range(15):
        state, out = step(state, seq_batch, rng)
    assert float(out["loss"]) < loss0


def test_iocrec_batch_concat_equivariance(seq_batch, enc_dict):
    """The [3B] fused-view pass is only valid if _intention_emb is
    batch-parallel: encoding a concatenated batch must equal concatenating
    the encodings (train=False -> dropout off -> deterministic)."""
    from rec_pangu_tpu.models.sequence.iocrec import IOCRec

    model = get_model("IOCRec")(enc_dict=enc_dict, config=make_config())
    tx = make_optimizer(1e-3, 1)
    state = create_train_state(model, seq_batch, tx, jax.random.PRNGKey(0))

    hist = seq_batch["hist_item_list"]
    seq_len = seq_batch["hist_mask_list"].sum(-1).astype(np.int32)
    half = B // 2
    s1, s2 = hist[:half], hist[half:]
    l1, l2 = seq_len[:half], seq_len[half:]

    def enc(seq, lens):
        return model.apply({"params": state.params}, jnp.asarray(seq),
                           jnp.asarray(lens), False,
                           method=IOCRec._intention_emb)

    both = enc(np.concatenate([s1, s2]), np.concatenate([l1, l2]))
    sep = jnp.concatenate([enc(s1, l1), enc(s2, l2)], axis=0)
    np.testing.assert_allclose(np.asarray(both), np.asarray(sep),
                               rtol=1e-5, atol=1e-6)


def test_iocrec_factored_disentangle_matches_naive():
    """The factored intention tensor (DisentangleFactors) must equal the
    reference formula LN5(score_fuse * item_emb) elementwise — the factoring
    LN(s*e) = s/sqrt(s^2 var + eps) (e - mean) * gamma + beta is exact for
    the positive softmax-product scores (iocrec.py:257-313).  Naive path
    reimplemented here in numpy from the module's own params."""
    import math

    from rec_pangu_tpu.models.sequence.iocrec import DisentangleEncoder

    Bn, Ln, Dn, Kn = 6, 9, 16, 4
    rng = np.random.default_rng(7)
    local = rng.standard_normal((Bn, Ln, Dn)).astype(np.float32)
    glob = rng.standard_normal((Bn, Ln, Dn)).astype(np.float32)
    seq_len = rng.integers(1, Ln + 1, Bn).astype(np.int32)
    mod = DisentangleEncoder(k_intention=Kn, max_len=Ln)
    params = mod.init(jax.random.PRNGKey(3), jnp.asarray(local),
                      jnp.asarray(glob), jnp.asarray(seq_len))["params"]
    # randomize LN5 away from its (1, 0) init
    params = jax.tree_util.tree_map(np.asarray, params)
    params["layer_norm_5"]["scale"] = (
        params["layer_norm_5"]["scale"] + rng.standard_normal(Dn) * 0.3
    ).astype(np.float32)
    params["layer_norm_5"]["bias"] = (
        rng.standard_normal(Dn) * 0.1).astype(np.float32)

    dense = np.asarray(mod.apply({"params": params}, jnp.asarray(local),
                                 jnp.asarray(glob), jnp.asarray(seq_len)))

    eps = 1e-5

    def ln(p, x):
        mu = x.mean(-1, keepdims=True)
        v = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(v + eps) * p["scale"] + p["bias"]

    def softmax(x):
        m = x.max(-1, keepdims=True)
        e = np.exp(x - m)
        return e / e.sum(-1, keepdims=True)

    def naive(item_emb):
        logits = np.einsum(
            "bld,kd->blk", ln(params["layer_norm_1"], item_emb),
            ln(params["layer_norm_2"], params["intentions"]))
        i2i = softmax(logits / math.sqrt(Dn))
        idx = np.clip(seq_len - 1, 0, Ln - 1)
        q = item_emb[np.arange(Bn), idx]
        q = q + params["pos_fai"][idx] + params["rou"]
        item_query = ln(params["layer_norm_3"], q)[:, None, :]
        key_hat = ln(params["layer_norm_4"],
                     item_emb + params["pos_fai"][None, :Ln])
        item_key = key_hat + np.maximum(
            key_hat @ params["W"]["kernel"] + params["W"]["bias"], 0.0)
        att = softmax(np.einsum("bqd,bld->bql", item_query,
                                item_key)[:, 0] / math.sqrt(Dn))
        s = (i2i * att[..., None]).transpose(0, 2, 1)[..., None]  # [B,K,L,1]
        return ln(params["layer_norm_5"], s * item_emb[:, None])

    np.testing.assert_allclose(dense, naive(local) + naive(glob),
                               rtol=2e-4, atol=2e-5)

    # and the factored gather equals the dense gather
    factors = mod.apply({"params": params}, jnp.asarray(local),
                        jnp.asarray(glob), jnp.asarray(seq_len),
                        factored=True)
    idx = np.clip(seq_len - 1, 0, Ln - 1)
    u = np.asarray(factors.gather_user_emb(jnp.asarray(idx)))
    d_gather = dense[np.arange(Bn), :, idx]
    np.testing.assert_allclose(u, d_gather, rtol=1e-5, atol=1e-6)


def test_contrarec_batch_concat_equivariance(seq_batch, enc_dict):
    """Same property for ContraRec's encoder (backs the [2B] fused
    augmented-view pass), across all three encoder choices."""
    from rec_pangu_tpu.models.sequence.contrarec import ContraRec

    for encoder_name in ("BERT4Rec", "GRU4Rec", "Caser"):
        model = get_model("ContraRec")(
            enc_dict=enc_dict, config=make_config(encoder_name=encoder_name))
        tx = make_optimizer(1e-3, 1)
        state = create_train_state(model, seq_batch, tx, jax.random.PRNGKey(0))

        hist = seq_batch["hist_item_list"]
        lens = seq_batch["hist_mask_list"].sum(-1).astype(np.int32)
        half = B // 2

        def enc(seq, ln):
            def run(mdl, s, l):
                return mdl._encode(mdl.item_emb(jnp.asarray(s)),
                                   jnp.asarray(l), False)
            return model.apply({"params": state.params}, seq, ln, method=run)

        both = enc(hist, lens)
        sep = jnp.concatenate([enc(hist[:half], lens[:half]),
                               enc(hist[half:], lens[half:])], axis=0)
        np.testing.assert_allclose(np.asarray(both), np.asarray(sep),
                                   rtol=1e-5, atol=1e-6)


def test_host_session_graph_matches_device(seq_batch):
    """attach_session_graph's numpy nodes/alias must be bit-identical to the
    on-device build, and the model must produce the same forward through
    either path."""
    from rec_pangu_tpu.ops.graph import (build_session_graph,
                                         host_session_graph)

    hist, mask = seq_batch["hist_item_list"], seq_batch["hist_mask_list"]
    d_nodes, d_alias, _, _ = build_session_graph(jnp.asarray(hist),
                                                 jnp.asarray(mask))
    h_nodes, h_alias = host_session_graph(hist, mask)
    np.testing.assert_array_equal(np.asarray(d_nodes), h_nodes)
    np.testing.assert_array_equal(np.asarray(d_alias), h_alias)


@pytest.mark.parametrize("name", ["SRGNN", "GCSAN", "NISER"])
def test_session_graph_plan_forward_equal(name, seq_batch, enc_dict):
    """Forward through the host-graph (graph_nodes/graph_alias) path equals
    the on-device build path exactly."""
    from rec_pangu_tpu.ops.graph import attach_session_graph

    model = get_model(name)(enc_dict=enc_dict, config=make_config())
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        seq_batch, False)
    out_dev = model.apply(variables, seq_batch, False)
    planned = attach_session_graph(dict(seq_batch))
    out_host = model.apply(variables, planned, False)
    np.testing.assert_allclose(np.asarray(out_dev["user_emb"]),
                               np.asarray(out_host["user_emb"]),
                               rtol=1e-6, atol=1e-6)


def test_srgnn_fused_update_engages(tmp_path, monkeypatch):
    """With the host session graph + node-lookup plan, the SRGNN family is
    fused_update_compatible: the fused step must engage and train to the
    same params as the standard path (r4: the family previously could not
    fuse because its lookup ids were device-generated)."""
    from rec_pangu_tpu.train import SequenceTrainer

    monkeypatch.setenv("REC_PANGU_TPU_PALLAS_INTERPRET", "1")
    VOCAB_BIG, B_BIG, L_BIG = 65537, 1024, 8
    rng = np.random.default_rng(3)
    lens = rng.integers(2, L_BIG + 1, B_BIG)
    hist = np.zeros((B_BIG, L_BIG), dtype=np.int32)
    mask = np.zeros((B_BIG, L_BIG), dtype=np.float32)
    for i, n in enumerate(lens):
        hist[i, :n] = rng.integers(1, VOCAB_BIG, n)
        mask[i, :n] = 1.0
    batch = {"hist_item_list": hist, "hist_mask_list": mask,
             "target_item": rng.integers(1, VOCAB_BIG, B_BIG).astype(np.int32)}
    enc = {"item_id": {"vocab_size": VOCAB_BIG}}
    cfg = {"embedding_dim": 8, "max_length": L_BIG, "item_col": "item_id",
           "cate_cols": [], "device": -1}

    model = get_model("SRGNN")(enc_dict=enc, config=dict(cfg))
    tr = SequenceTrainer(model_ckpt_dir=str(tmp_path / "fused"))
    tr.fit(model, [dict(batch)], None, epoch=2, lr=1e-2, seed=5)
    assert getattr(tr, "_fused_step", None) is not None, \
        "SRGNN fused seq path did not engage"

    # standard (unfused) path for comparison
    monkeypatch.setenv("REC_PANGU_TPU_FUSED_ADAM", "0")
    model2 = get_model("SRGNN")(enc_dict=enc, config=dict(cfg))
    tr2 = SequenceTrainer(model_ckpt_dir=str(tmp_path / "std"))
    tr2.fit(model2, [dict(batch)], None, epoch=2, lr=1e-2, seed=5)
    assert getattr(tr2, "_fused_step", None) is None
    monkeypatch.delenv("REC_PANGU_TPU_FUSED_ADAM")
    import jax as _jax
    for a, b in zip(_jax.tree_util.tree_leaves(tr.state.params),
                    _jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_iocrec_fused_update_engages(tmp_path, monkeypatch):
    """With host-side augmented views + the [3B] lookup plan, IOCRec is
    fused_update_compatible: the fused step must engage and train to the
    same params as the standard path on identical augmentations (r4)."""
    from rec_pangu_tpu.train import SequenceTrainer

    monkeypatch.setenv("REC_PANGU_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("REC_PANGU_TPU_FUSED_ENCODER", "0")  # isolate update
    VOCAB_BIG, B_BIG, L_BIG = 65537, 512, 8
    rng = np.random.default_rng(3)
    lens = rng.integers(2, L_BIG + 1, B_BIG)
    hist = np.zeros((B_BIG, L_BIG), dtype=np.int32)
    mask = np.zeros((B_BIG, L_BIG), dtype=np.float32)
    for i, n in enumerate(lens):
        hist[i, :n] = rng.integers(1, VOCAB_BIG, n)
        mask[i, :n] = 1.0
    batch = {"hist_item_list": hist, "hist_mask_list": mask,
             "target_item": rng.integers(1, VOCAB_BIG, B_BIG).astype(np.int32)}
    enc = {"item_id": {"vocab_size": VOCAB_BIG}}
    cfg = {"embedding_dim": 8, "max_length": L_BIG, "item_col": "item_id",
           "cate_cols": [], "device": -1, "K": 2, "num_blocks": 1,
           "num_heads": 2}

    def run(fused, tag):
        if not fused:
            monkeypatch.setenv("REC_PANGU_TPU_FUSED_ADAM", "0")
        model = get_model("IOCRec")(enc_dict=enc, config=dict(cfg))
        tr = SequenceTrainer(model_ckpt_dir=str(tmp_path / tag))
        tr._aug_rng = np.random.default_rng(99)  # identical augs both runs
        # ONE step: beyond it the K-max argmax + InfoNCE make the
        # trajectory chaotic and tiny kernel-order deltas amplify
        tr.fit(model, [dict(batch)], None, epoch=1, lr=1e-2, seed=5)
        if not fused:
            monkeypatch.delenv("REC_PANGU_TPU_FUSED_ADAM")
        return tr

    t_fused = run(True, "fused")
    assert getattr(t_fused, "_fused_step", None) is not None, \
        "IOCRec fused seq path did not engage"
    t_std = run(False, "std")
    assert getattr(t_std, "_fused_step", None) is None
    import jax as _jax
    for a, b in zip(_jax.tree_util.tree_leaves(t_fused.state.params),
                    _jax.tree_util.tree_leaves(t_std.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=5e-7)


def test_multimax_sampled_loss(seq_batch, enc_dict):
    """Sampled K-max CE (VERDICT r4 item 7): K=1 equals the single-interest
    sampled loss on the same rng stream; K>1 trains IOCRec to a decreasing
    loss."""
    model = get_model("IOCRec")(enc_dict=enc_dict, config=make_config())
    tx = make_optimizer(1e-3, 1)
    state = create_train_state(model, seq_batch, tx, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((B, 16)), jnp.float32)
    pos = jnp.asarray(seq_batch["target_item"])
    rngs = {"dropout": jax.random.PRNGKey(9)}

    single = model.apply(
        {"params": state.params}, u, pos, 64, rngs=rngs,
        method=lambda m, a, b, n: m.calculate_sampled_loss(a, b, n))
    kmax1 = model.apply(
        {"params": state.params}, u[:, None, :], pos, 64, rngs=rngs,
        method=lambda m, a, b, n: m.calculate_multimax_sampled_loss(a, b, n))
    np.testing.assert_allclose(float(single), float(kmax1), rtol=1e-6)

    # end-to-end: IOCRec under loss_type='sampled' learns
    cfg = make_config(loss_type="sampled", num_negatives=32)
    model2 = get_model("IOCRec")(enc_dict=enc_dict, config=cfg)
    state2 = create_train_state(model2, seq_batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(state2.batch_stats is not None)
    rng2 = jax.random.PRNGKey(0)
    state2, out = step(state2, seq_batch, rng2)
    loss0 = float(out["loss"])
    assert np.isfinite(loss0)
    for _ in range(15):
        state2, out = step(state2, seq_batch, rng2)
    assert float(out["loss"]) < loss0


@pytest.mark.parametrize("name", ["SINE", "Re4", "CLRec", "CMI"])
def test_r5_models_fused_update_engages(name, tmp_path, monkeypatch):
    """Round-5 fused-table-Adam coverage (VERDICT r4 item 5): the four
    models that sat off the fused path must now engage it and train to the
    same params as the standard step."""
    from rec_pangu_tpu.train import SequenceTrainer

    monkeypatch.setenv("REC_PANGU_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("REC_PANGU_TPU_FUSED_ENCODER", "0")  # isolate update
    # B*L must clear _MIN_LOOKUPS (8192) for the planned path to engage
    VOCAB_BIG, B_BIG, L_BIG = 65537, 1024, 8
    rng = np.random.default_rng(7)
    lens = rng.integers(2, L_BIG + 1, B_BIG)
    hist = np.zeros((B_BIG, L_BIG), dtype=np.int32)
    mask = np.zeros((B_BIG, L_BIG), dtype=np.float32)
    for i, n in enumerate(lens):
        hist[i, :n] = rng.integers(1, VOCAB_BIG, n)
        mask[i, :n] = 1.0
    batch = {"hist_item_list": hist, "hist_mask_list": mask,
             "target_item": rng.integers(1, VOCAB_BIG, B_BIG).astype(np.int32)}
    enc = {"item_id": {"vocab_size": VOCAB_BIG}}
    cfg = {"embedding_dim": 8, "max_length": L_BIG, "item_col": "item_id",
           "cate_cols": [], "device": -1, "K": 2, "prototype_size": 20}

    def run(fused, tag):
        if not fused:
            monkeypatch.setenv("REC_PANGU_TPU_FUSED_ADAM", "0")
        model = get_model(name)(enc_dict=enc, config=dict(cfg))
        tr = SequenceTrainer(model_ckpt_dir=str(tmp_path / tag))
        tr.fit(model, [dict(batch)], None, epoch=1, lr=1e-2, seed=5)
        if not fused:
            monkeypatch.delenv("REC_PANGU_TPU_FUSED_ADAM")
        return tr

    t_fused = run(True, "fused")
    assert getattr(t_fused, "_fused_step", None) is not None, \
        f"{name} fused seq path did not engage"
    t_std = run(False, "std")
    assert getattr(t_std, "_fused_step", None) is None
    for a, b in zip(jax.tree_util.tree_leaves(t_fused.state.params),
                    jax.tree_util.tree_leaves(t_std.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=5e-7)


def test_srgnn_trains_under_dp_mesh(tmp_path, monkeypatch):
    """SRGNN's host session graph + node-lookup plan must work under a
    data-parallel mesh (per-shard plans; fused update mesh path)."""
    from rec_pangu_tpu.parallel import make_mesh
    from rec_pangu_tpu.train import SequenceTrainer

    monkeypatch.setenv("REC_PANGU_TPU_PALLAS_INTERPRET", "1")
    VOCAB_BIG, B_BIG, L_BIG = 65537, 512, 8
    rng = np.random.default_rng(3)
    lens = rng.integers(2, L_BIG + 1, B_BIG)
    hist = np.zeros((B_BIG, L_BIG), dtype=np.int32)
    mask = np.zeros((B_BIG, L_BIG), dtype=np.float32)
    for i, n in enumerate(lens):
        hist[i, :n] = rng.integers(1, VOCAB_BIG, n)
        mask[i, :n] = 1.0
    batch = {"hist_item_list": hist, "hist_mask_list": mask,
             "target_item": rng.integers(1, VOCAB_BIG, B_BIG).astype(np.int32)}
    enc = {"item_id": {"vocab_size": VOCAB_BIG}}
    cfg = {"embedding_dim": 8, "max_length": L_BIG, "item_col": "item_id",
           "cate_cols": [], "device": -1}
    model = get_model("SRGNN")(enc_dict=enc, config=dict(cfg))
    tr = SequenceTrainer(model_ckpt_dir=str(tmp_path))
    tr.fit(model, [dict(batch)], None, epoch=1, lr=1e-2, seed=5,
           mesh=make_mesh(4, 1))
    assert np.isfinite(
        float(np.asarray(tr.state.params["item_emb"]["table"]).sum()))
