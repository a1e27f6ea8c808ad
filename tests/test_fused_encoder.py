"""Fused Pallas encoder vs the flax TransformerEncoder: forward and grads
(dropout off) must agree; dropout-on path sanity-checked on shapes/scale.
Runs in interpret mode on CPU; the chip lane re-runs it on hardware."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_pangu_tpu.ops.kernels.fused_encoder import (fused_encoder,
                                                     pack_params)
from rec_pangu_tpu.ops.sequence_enc import TransformerEncoder

N, L, D, HEADS, INNER, LAYERS = 16, 12, 8, 2, 16, 3
EPS = 1e-12
INTERP = jax.default_backend() == "cpu"


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, L, D)), jnp.float32)
    lens = rng.integers(1, L + 1, N)
    key_valid = (np.arange(L)[None, :] < lens[:, None]).astype(np.float32)
    enc = TransformerEncoder(n_layers=LAYERS, n_heads=HEADS, inner_size=INNER,
                             hidden_dropout_prob=0.5, attn_dropout_prob=0.5,
                             hidden_act="relu", layer_norm_eps=EPS)
    keep = jnp.asarray(key_valid)[:, None, None, :]
    keep = jnp.broadcast_to(keep.astype(bool), (N, 1, L, L))
    causal = jnp.tril(keep)  # same mask construction as IOCRec._causal_mask
    params = enc.init({"params": jax.random.PRNGKey(0)}, x, causal, False)
    return x, key_valid, enc, causal, params


def _run_fused(x, params_packed, key_valid, train=False, tb=4, seed=7):
    return fused_encoder(x, params_packed, jnp.asarray(key_valid),
                         jnp.int32(seed), LAYERS, HEADS, INNER,
                         0.5 if train else 0.0, 0.5 if train else 0.0,
                         EPS, train, tb, INTERP)


def test_fused_encoder_forward_matches_flax(setup):
    x, key_valid, enc, causal, params = setup
    ref = enc.apply(params, x, causal, False)
    packed = pack_params(params["params"], LAYERS)
    got = _run_fused(x, packed, key_valid, train=False)
    # rows are compared only at VALID QUERY positions: the flax path lets
    # fully-masked rows (query beyond the sequence) attend uniformly, the
    # kernel masks them too — both are garbage rows the models never read
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_encoder_grads_match_flax(setup):
    x, key_valid, enc, causal, params = setup
    packed = pack_params(params["params"], LAYERS)
    co = jnp.asarray(np.random.default_rng(1).standard_normal(
        (N, L, D)), jnp.float32)

    def loss_ref(p, xx):
        return jnp.vdot(enc.apply({"params": p}, xx, causal, False), co)

    def loss_fused(packed_p, xx):
        return jnp.vdot(_run_fused(xx, packed_p, key_valid, train=False), co)

    gref_p, gref_x = jax.grad(loss_ref, argnums=(0, 1))(params["params"], x)
    gfu_p, gfu_x = jax.grad(loss_fused, argnums=(0, 1))(packed, x)
    # device matmuls run as bf16 passes in both paths but in different
    # contraction orders: ~0.4% relative on a fraction of elements
    tol = dict(rtol=5e-4, atol=5e-4) if INTERP else dict(rtol=8e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gfu_x), np.asarray(gref_x), **tol)
    ref_packed = pack_params(gref_p, LAYERS)
    for a, b in zip(gfu_p, ref_packed):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)


@pytest.mark.skipif(INTERP, reason="in-kernel PRNG needs the TPU backend")
def test_fused_encoder_dropout_stats(setup):
    x, key_valid, enc, causal, params = setup
    packed = pack_params(params["params"], LAYERS)
    y1 = _run_fused(x, packed, key_valid, train=True, seed=3)
    y2 = _run_fused(x, packed, key_valid, train=True, seed=3)
    y3 = _run_fused(x, packed, key_valid, train=True, seed=4)
    # deterministic per seed; different seeds differ
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert np.abs(np.asarray(y1) - np.asarray(y3)).max() > 1e-3


def test_iocrec_fused_encoder_forward_equal(monkeypatch):
    """IOCRec's eval forward through the fused encoder equals the flax
    path (same params, dropout off)."""
    from rec_pangu_tpu.models import get_model

    monkeypatch.setenv("REC_PANGU_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(0)
    B, L2, V = 16, 12, 50
    enc_dict = {"item_id": {"vocab_size": V}}
    config = {"embedding_dim": 8, "max_length": L2, "K": 2, "num_heads": 2,
              "num_blocks": 2}
    batch = {
        "hist_item_list": rng.integers(1, V, (B, L2), dtype=np.int32),
        "hist_mask_list": (rng.random((B, L2)) < 0.9).astype(np.float32),
        "target_item": rng.integers(1, V, (B,), dtype=np.int32),
    }
    model = get_model("IOCRec")(enc_dict=enc_dict, config=config)
    monkeypatch.setenv("REC_PANGU_TPU_FUSED_ENCODER", "0")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)
    ref = model.apply(variables, batch, False)
    monkeypatch.setenv("REC_PANGU_TPU_FUSED_ENCODER", "1")
    got = model.apply(variables, batch, False)
    np.testing.assert_allclose(np.asarray(got["user_emb"]),
                               np.asarray(ref["user_emb"]),
                               rtol=5e-4, atol=5e-4)


def test_global_attn_kernel_matches_xla(monkeypatch):
    """GlobalSeqEncoder's fused kernel (ops/kernels/global_attn.py) equals
    the XLA einsum path — forward and grads, dropout off."""
    from rec_pangu_tpu.models.sequence.iocrec import GlobalSeqEncoder

    rng = np.random.default_rng(2)
    B, L2, D2 = 8, 10, 16
    x = jnp.asarray(rng.standard_normal((B, L2, D2)), jnp.float32)
    enc = GlobalSeqEncoder(max_len=L2, dropout=0.5)
    monkeypatch.setenv("REC_PANGU_TPU_FUSED_ENCODER", "0")
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x, False)
    co = jnp.asarray(rng.standard_normal((B, L2, D2)), jnp.float32)

    def loss(p, xx, flag):
        monkeypatch.setenv("REC_PANGU_TPU_FUSED_ENCODER", flag)
        return jnp.vdot(enc.apply({"params": p}, xx, False), co)

    ref = enc.apply(variables, x, False)
    gref_p, gref_x = jax.grad(loss, argnums=(0, 1))(
        variables["params"], x, "0")
    monkeypatch.setenv("REC_PANGU_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("REC_PANGU_TPU_FUSED_ENCODER", "1")
    got = enc.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
    gfu_p, gfu_x = jax.grad(loss, argnums=(0, 1))(variables["params"], x, "1")
    tol = dict(rtol=5e-4, atol=5e-4) if INTERP else dict(rtol=8e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gfu_x), np.asarray(gref_x), **tol)
    flat_ref = jax.tree_util.tree_leaves(gref_p)
    flat_fu = jax.tree_util.tree_leaves(gfu_p)
    for a, b in zip(flat_fu, flat_ref):
        b = np.asarray(b)
        leaf_tol = dict(tol)
        if not INTERP:
            # on device BOTH paths carry DEFAULT-precision (bf16-MXU)
            # rounding of order ~3e-3 x the leaf's gradient scale — the
            # flax reference is not exact either (the Q_s grad measured
            # ~0.047 abs deviation at grad scale ~25 with the kernel's own
            # dots forced to HIGHEST); compare at a scale-aware atol
            leaf_tol["atol"] = max(tol["atol"],
                                   3e-3 * float(np.abs(b).max() or 1.0))
        np.testing.assert_allclose(np.asarray(a), b, **leaf_tol)


def test_bert4rec_fused_encoder_forward_equal(monkeypatch):
    """BERT4RecEncoder through the fused kernel (bidirectional mask, no
    dropout) equals the flax path."""
    from rec_pangu_tpu.ops.sequence_enc import BERT4RecEncoder

    rng = np.random.default_rng(0)
    B, L2, H = 16, 12, 8
    seq = jnp.asarray(rng.standard_normal((B, L2, H)), jnp.float32)
    lengths = jnp.asarray(rng.integers(1, L2 + 1, B), jnp.int32)
    enc = BERT4RecEncoder(max_his=L2, num_layers=2, num_heads=2)
    monkeypatch.setenv("REC_PANGU_TPU_FUSED_ENCODER", "0")
    variables = enc.init({"params": jax.random.PRNGKey(0)}, seq, lengths, False)
    ref = enc.apply(variables, seq, lengths, False)
    monkeypatch.setenv("REC_PANGU_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("REC_PANGU_TPU_FUSED_ENCODER", "1")
    got = enc.apply(variables, seq, lengths, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("name", ["SASRec", "GCSAN"])
def test_model_fused_encoder_forward_equal(name, monkeypatch):
    """SASRec/GCSAN eval forward through the fused encoder (gelu FFN,
    causal x padding mask) equals the flax path."""
    from rec_pangu_tpu.models import get_model

    monkeypatch.setenv("REC_PANGU_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(0)
    B, L2, V = 16, 12, 50
    enc_dict = {"item_id": {"vocab_size": V}}
    config = {"embedding_dim": 8, "max_length": L2, "n_heads": 2}
    lens = rng.integers(2, L2 + 1, B)
    hist = np.zeros((B, L2), dtype=np.int32)
    maskm = np.zeros((B, L2), dtype=np.float32)
    for i, n in enumerate(lens):
        hist[i, :n] = rng.integers(1, V, n)
        maskm[i, :n] = 1.0
    batch = {"hist_item_list": hist, "hist_mask_list": maskm,
             "target_item": rng.integers(1, V, (B,)).astype(np.int32)}
    model = get_model(name)(enc_dict=enc_dict, config=config)
    monkeypatch.setenv("REC_PANGU_TPU_FUSED_ENCODER", "0")
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, False)
    ref = model.apply(variables, batch, False)
    monkeypatch.setenv("REC_PANGU_TPU_FUSED_ENCODER", "1")
    got = model.apply(variables, batch, False)
    np.testing.assert_allclose(np.asarray(got["user_emb"]),
                               np.asarray(ref["user_emb"]),
                               rtol=5e-4, atol=5e-4)
