"""Fused embedding-Adam kernel and train step (ops/kernels/fused_adam.py,
train/fused_update.py).

The kernel applies dense-semantics Adam to a planned embedding table inside
the gradient-accumulation grid; semantics must match optax.adam over the
dense scatter gradient (the reference's torch.optim.Adam over nn.Embedding
grads, rec_pangu/trainer.py:75) to kernel matmul precision.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.ops.embedding import attach_emb_plan
from rec_pangu_tpu.ops.kernels.embedding_grad import make_sort_plan, stream_ids
from rec_pangu_tpu.train.fused_update import (fused_update_applicable,
                                              maybe_enable_fused_update)
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import create_train_state, make_train_step

tpu_only = pytest.mark.skipif(jax.default_backend() == "cpu",
                              reason="pallas TPU kernel needs a TPU backend")


def _ranking_fixture(batch=1024, n_sparse=8, vocab=16_384, seed=0):
    """Just above the planned-path thresholds (>=64k fused rows, >=8k lookups)."""
    rng = np.random.default_rng(seed)
    enc = {f"sparse_{i}": {"vocab_size": vocab} for i in range(n_sparse)}
    enc.update({f"dense_{i}": {"min": 0.0, "max": 1.0} for i in range(3)})
    data = {
        "sparse": rng.integers(0, vocab, (batch, n_sparse), dtype=np.int32),
        "dense": rng.random((batch, 3), dtype=np.float32),
        "label": rng.integers(0, 2, (batch,)).astype(np.float32),
    }
    return enc, data


@tpu_only
def test_kernel_matches_dense_optax_adam():
    from rec_pangu_tpu.ops.kernels.fused_adam import (adam_hyper,
                                                      planned_adam_update)

    rng = np.random.default_rng(0)
    V, D, N = 4096, 32, 2048
    ids_np = rng.integers(0, V, (N,), dtype=np.int64)
    plan = {k: jnp.asarray(v) for k, v in make_sort_plan(ids_np, V).items()}
    ids = jnp.asarray(ids_np, jnp.int32)
    ids_stream = stream_ids(plan, ids, V)
    rows = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    p0 = jnp.asarray(rng.standard_normal((V, D)), jnp.float32) * 0.01

    tx = optax.adam(1e-3)
    opt = tx.init(p0)
    p_ref, p_f = p0, p0
    mu = nu = jnp.zeros_like(p0)
    for t in (1, 2, 3):
        g = jax.ops.segment_sum(rows, jnp.asarray(ids_np), V)
        upd, opt = tx.update(g, opt, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
        hyper = adam_hyper(jnp.asarray(t, jnp.int32), 1e-3)
        p_f, mu, nu = planned_adam_update(plan, ids_stream, rows, p_f, mu, nu,
                                          hyper)
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(opt[0].mu), atol=2e-4)
    np.testing.assert_allclose(np.asarray(nu), np.asarray(opt[0].nu), atol=2e-4)


@tpu_only
@pytest.mark.parametrize("name", ["DeepFM", "WDL", "AFN"])
def test_fused_step_matches_standard_step(name):
    # WDL: two tables of different dims; AFN: TWO SAME-DIM tables (ensemble
    # second embedding) — capture leaves are keyed by module path
    enc, data = _ranking_fixture()
    model = get_model(name)(enc_dict=enc, embedding_dim=32)
    batch = dict(data)
    attach_emb_plan(batch, model.spec, 32)
    assert "emb_plan" in batch, "fixture must qualify for the planned path"

    rng = jax.random.PRNGKey(0)
    srng = jax.random.PRNGKey(1)

    def run(fused: bool, steps: int = 3):
        state = create_train_state(model, batch,
                                   make_optimizer(1e-3, steps_per_epoch=1), rng)
        if fused:
            state, step, _ = maybe_enable_fused_update(state, model, batch,
                                                    lr=1e-3, steps_per_epoch=1)
            assert step is not None
        else:
            step = make_train_step(state.batch_stats is not None)
        losses = []
        for _ in range(steps):
            state, out = step(state, batch, srng)
            losses.append(float(out["loss"]))
        return state, losses

    # ONE step compares bit-tight (same grads, same Adam math); multi-step
    # param comparison is chaotic — ReLU kinks amplify one-ULP Adam rounding
    # (measured: a 1e-8 init nudge diverges the STANDARD path from itself
    # 10x more than fused-vs-std after 3 steps), so steps 2-3 only check the
    # loss trajectory
    f1, _ = run(True, steps=1)
    s1, _ = run(False, steps=1)
    for a, b in zip(jax.tree_util.tree_leaves(f1.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    f_state, f_losses = run(True)
    s_state, s_losses = run(False)
    np.testing.assert_allclose(f_losses, s_losses, rtol=1e-3)
    # step counters advanced identically
    assert int(f_state.step) == int(s_state.step) == 3


@tpu_only
def test_fused_step_dense_semantics_moments_decay():
    """Rows absent from the batch still get dense-Adam updates (moment decay
    + bias-corrected first-moment drift) — parity with torch dense Adam."""
    enc, data = _ranking_fixture()
    model = get_model("DeepFM")(enc_dict=enc, embedding_dim=32)
    b1 = dict(data)
    attach_emb_plan(b1, model.spec, 32)
    state = create_train_state(model, b1, make_optimizer(1e-3, 1),
                               jax.random.PRNGKey(0))
    state, step, _ = maybe_enable_fused_update(state, model, b1, 1e-3, 1)
    state, _ = step(state, b1, jax.random.PRNGKey(1))
    _, emb_state = state.opt_state
    (key, slots), = emb_state.items()
    mu1 = np.asarray(slots["mu"])
    state, _ = step(state, b1, jax.random.PRNGKey(1))
    _, emb_state = state.opt_state
    mu2 = np.asarray(emb_state[key]["mu"])
    # every touched row's first moment moved; crucially the kernel visited
    # every tile (dense semantics), so shapes/moments stay full-table
    assert mu1.shape[0] >= model.spec.total_rows
    assert np.any(mu1 != 0)
    assert not np.allclose(mu1, mu2)


@tpu_only
def test_fused_multi_step_matches_single_steps():
    """K scanned fused steps == K dispatched fused steps (same rng fold)."""
    from rec_pangu_tpu.train.fused_update import make_fused_multi_step

    enc, data = _ranking_fixture()
    model = get_model("DeepFM")(enc_dict=enc, embedding_dim=32)
    batch = dict(data)
    attach_emb_plan(batch, model.spec, 32)
    rng, srng = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    K = 3

    state = create_train_state(model, batch, make_optimizer(1e-3, 1), rng)
    state, step, tables = maybe_enable_fused_update(state, model, batch,
                                                    1e-3, 1)
    assert step is not None
    single = state
    losses = []
    for _ in range(K):
        single, out = step(single, batch, srng)
        losses.append(float(out["loss"]))

    state2 = create_train_state(model, batch, make_optimizer(1e-3, 1), rng)
    state2, _, _ = maybe_enable_fused_update(state2, model, batch, 1e-3, 1)
    multi = make_fused_multi_step(K, model, tables, 1e-3, 1)
    stacked = jax.tree.map(lambda x: np.stack([np.asarray(x)] * K), batch)
    state2, outs = multi(state2, stacked, srng)

    np.testing.assert_allclose(np.asarray(outs["loss"]), losses, rtol=1e-6)
    assert int(state2.step) == K
    for a, b in zip(jax.tree_util.tree_leaves(single.params),
                    jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def _seq_fixture(batch=512, L=24, vocab=70_000, seed=0):
    """Above the planned-path + fused-CE thresholds (vocab >= 64k/65536)."""
    rng = np.random.default_rng(seed)
    enc = {"item_id": {"vocab_size": vocab}}
    data = {
        "hist_item_list": rng.integers(1, vocab, (batch, L), dtype=np.int32),
        "hist_mask_list": (rng.random((batch, L)) < 0.9).astype(np.float32),
        "target_item": rng.integers(1, vocab, (batch,), dtype=np.int32),
    }
    return enc, data


@tpu_only
def test_seq_fused_step_matches_standard_step():
    """The sequence fused step (planned hist grads + streaming-CE dense grad
    in one kernel) matches the standard step: params bit-tight after 1 step,
    loss trajectory over 3."""
    from rec_pangu_tpu.ops.embedding import attach_item_plan
    from rec_pangu_tpu.train.fused_update import maybe_enable_seq_fused_update

    enc, data = _seq_fixture()
    model = get_model("GRU4Rec")(enc_dict=enc,
                                 config={"embedding_dim": 32, "max_length": 24})
    batch = dict(data)
    attach_item_plan(batch, 70_000, 32, force=True)
    assert "emb_plan" in batch

    rng, srng = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    def run(fused: bool, steps: int = 3):
        state = create_train_state(model, batch, make_optimizer(1e-3, 1), rng)
        if fused:
            state, step, info = maybe_enable_seq_fused_update(
                state, model, batch, 1e-3, 1)
            assert step is not None, "fixture must qualify"
        else:
            step = make_train_step(state.batch_stats is not None)
        losses = []
        for _ in range(steps):
            state, out = step(state, batch, srng)
            losses.append(float(out["loss"]))
        return state, losses

    f1, _ = run(True, steps=1)
    s1, _ = run(False, steps=1)
    flat_f = jax.tree_util.tree_leaves_with_path(f1.params)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(s1.params))
    for path, a in flat_f:
        b = flat_s[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-6,
            err_msg=jax.tree_util.keystr(path))

    _, f_losses = run(True)
    _, s_losses = run(False)
    np.testing.assert_allclose(f_losses, s_losses, rtol=1e-3)


@tpu_only
def test_multi_interest_fused_step_matches_standard():
    """ComirecSA's target-item read is gradient-free (argmax only), so the
    fused step must match the standard step exactly."""
    from rec_pangu_tpu.ops.embedding import attach_item_plan
    from rec_pangu_tpu.train.fused_update import maybe_enable_seq_fused_update

    enc, data = _seq_fixture()
    model = get_model("ComirecSA")(
        enc_dict=enc, config={"embedding_dim": 32, "max_length": 24, "K": 2})
    batch = dict(data)
    attach_item_plan(batch, 70_000, 32, force=True)
    rng, srng = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    def run(fused: bool):
        state = create_train_state(model, batch, make_optimizer(1e-3, 1), rng)
        if fused:
            state, step, info = maybe_enable_seq_fused_update(
                state, model, batch, 1e-3, 1)
            assert step is not None, "fixture must qualify"
        else:
            step = make_train_step(state.batch_stats is not None)
        state, out = step(state, batch, srng)
        return state, float(out["loss"])

    f1, fl = run(True)
    s1, sl = run(False)
    np.testing.assert_allclose(fl, sl, rtol=1e-6)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(s1.params))
    for path, a in jax.tree_util.tree_leaves_with_path(f1.params):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat_s[path]), atol=5e-6,
            err_msg=jax.tree_util.keystr(path))


def test_seq_applicability_gates():
    """Runs on any backend: incompatible models / CPU never fuse."""
    from rec_pangu_tpu.ops.embedding import attach_item_plan
    from rec_pangu_tpu.train.fused_update import (
        maybe_enable_seq_fused_update, seq_fused_applicable)

    enc, data = _seq_fixture(batch=8)
    cfg = {"embedding_dim": 32, "max_length": 24}
    batch = dict(data)
    attach_item_plan(batch, 70_000, 32)
    # CLRec (r5: fused via the combined [hist | target] lookup plan) must
    # still REFUSE a batch whose plan covers only the hist ids — its
    # contrastive target read would silently lose its gradient
    model = get_model("CLRec")(enc_dict=enc, config=cfg)
    assert getattr(model, "fused_lookup_key", "") == "lookup_all"
    state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                               jax.random.PRNGKey(0))
    assert "lookup_all" not in batch
    assert seq_fused_applicable(model, state.params, batch) is None

    if jax.default_backend() == "cpu":
        model = get_model("SASRec")(enc_dict=enc, config=cfg)
        state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                                   jax.random.PRNGKey(0))
        _, step, _i = maybe_enable_seq_fused_update(state, model, batch, 1e-3, 1)
        assert step is None


def test_applicability_gates():
    """Runs on any backend: CPU must never enable the fused path."""
    enc, data = _ranking_fixture(batch=8)
    model = get_model("DeepFM")(enc_dict=enc, embedding_dim=32)
    batch = dict(data)
    # tiny batch: attach_emb_plan declines, so the gate sees no plan
    attach_emb_plan(batch, model.spec, 32)
    state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                               jax.random.PRNGKey(0))
    if jax.default_backend() == "cpu" or "emb_plan" not in batch:
        assert fused_update_applicable(model, state.params, batch) is None
        _, step, _t = maybe_enable_fused_update(state, model, batch, 1e-3, 1)
        assert step is None


def test_fused_path_engages_at_d128(monkeypatch):
    """Regression: the pre-dim-aware VMEM sizing used a fixed 2048-row tile,
    which at D=128 exceeded the 10 MB budget and SILENTLY disabled fusion
    (embedding_grad.py _tile_rows docstring).  Dim-aware tiles must keep
    every supported dim on the fused path."""
    monkeypatch.setenv("REC_PANGU_TPU_PALLAS_INTERPRET", "1")
    from rec_pangu_tpu.ops.kernels.embedding_grad import (_tile_rows,
                                                          padded_rows)
    from rec_pangu_tpu.ops.kernels.fused_adam import fused_adam_fits

    rows = padded_rows(8 * 16_385)
    for dim in (8, 32, 64, 128):
        assert fused_adam_fits(rows, dim), f"D={dim} does not fit VMEM"
        assert fused_adam_fits(rows, dim, has_dense=True), \
            f"D={dim} dense stream does not fit VMEM"
    assert _tile_rows(rows, 128) <= 1024  # 14*128*2048*4 = 14.7 MB > budget

    # end-to-end: the gate must return tables for a D=128 model
    enc, data = _ranking_fixture()
    model = get_model("DeepFM")(enc_dict=enc, embedding_dim=128,
                                hidden_units=(16,))
    batch = attach_emb_plan(dict(data), model.spec, 128, force=True)
    state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                               jax.random.PRNGKey(0))
    assert fused_update_applicable(model, state.params, batch) is not None


def test_plan_tile_rejects_mismatched_plan():
    """ADVICE r2: _plan_tile must not silently infer a non-power-of-two tile
    from a plan built for a different table (wrong row_base would drop or
    misplace gradient rows)."""
    from rec_pangu_tpu.ops.kernels.fused_adam import _plan_tile

    # plan's tile_starts says 8+1 entries; a 1000-row table would infer
    # tile=125 — invalid, must raise instead
    plan = {"tile_starts": np.zeros(9, dtype=np.int32)}
    with pytest.raises(ValueError, match="inconsistent"):
        _plan_tile(plan, 1000, 32)


def test_fused_adam_fits_uses_plan_tile():
    """ADVICE r2: the VMEM fit must be computed at the PLAN's tile, not the
    dim's own default tile — a D=64 table riding a D=32 plan's 4096-row tile
    needs 12*64*4096*4 ≈ 12.6 MB > 10 MB."""
    from rec_pangu_tpu.ops.kernels.embedding_grad import _tile_rows
    from rec_pangu_tpu.ops.kernels.fused_adam import fused_adam_fits

    rows = 65536 * 4  # large table: D=32 tile = 4096, D=64 tile = 2048
    assert _tile_rows(rows, 32) == 4096 and _tile_rows(rows, 64) == 2048
    plan_at_32 = {"tile_starts": np.zeros(rows // 4096 + 1, dtype=np.int32)}
    assert fused_adam_fits(rows, 64)                      # own-tile fit: ok
    assert not fused_adam_fits(rows, 64, plan=plan_at_32)  # plan-tile: too big


def test_bf16_moment_storage_tracks_f32(monkeypatch):
    """REC_PANGU_TPU_MOMENT_DTYPE=bf16 stores mu/nu in bfloat16 (halving the
    roofline-bound m/v HBM streams) while the in-kernel Adam math stays f32:
    the updated table must track the f32-moment path to bf16 rounding, and
    the moment outputs must keep their storage dtype."""
    from rec_pangu_tpu.ops.kernels.fused_adam import (adam_hyper,
                                                      planned_adam_update)
    from rec_pangu_tpu.train.fused_update import _moment_dtype

    monkeypatch.setenv("REC_PANGU_TPU_MOMENT_DTYPE", "bf16")
    if jax.default_backend() == "cpu":
        monkeypatch.setenv("REC_PANGU_TPU_PALLAS_INTERPRET", "1")
    assert _moment_dtype() == jnp.bfloat16

    rng = np.random.default_rng(1)
    V, D, N = 4096, 32, 2048
    ids_np = rng.integers(0, V, (N,), dtype=np.int64)
    plan = {k: jnp.asarray(v) for k, v in make_sort_plan(ids_np, V).items()}
    ids_stream = stream_ids(plan, jnp.asarray(ids_np, jnp.int32), V)
    rows = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    p0 = jnp.asarray(rng.standard_normal((V, D)), jnp.float32) * 0.01

    p32, mu32, nu32 = p0, jnp.zeros_like(p0), jnp.zeros_like(p0)
    p16 = p0
    mu16 = jnp.zeros_like(p0, dtype=jnp.bfloat16)
    nu16 = jnp.zeros_like(p0, dtype=jnp.bfloat16)
    for t in (1, 2, 3):
        hyper = adam_hyper(jnp.asarray(t, jnp.int32), 1e-3)
        p32, mu32, nu32 = planned_adam_update(plan, ids_stream, rows, p32,
                                              mu32, nu32, hyper)
        p16, mu16, nu16 = planned_adam_update(plan, ids_stream, rows, p16,
                                              mu16, nu16, hyper)
    assert mu16.dtype == jnp.bfloat16 and nu16.dtype == jnp.bfloat16
    # per-step update magnitude is ~lr; three steps of bf16 moment rounding
    # must stay well inside one lr of drift
    np.testing.assert_allclose(np.asarray(p16), np.asarray(p32), atol=1e-4)
