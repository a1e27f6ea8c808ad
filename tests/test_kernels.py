"""Pallas kernel parity: sorted-segment accumulate vs XLA scatter-add
(interpret-safe on CPU via the thresholds falling back, plus direct kernel
check through the public fused_gather on forced-on mode with small sizes
exercised through grad)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_pangu_tpu.ops.kernels.embedding_grad import (
    _MIN_LOOKUPS,
    _MIN_TABLE_ROWS,
    fused_gather,
    sorted_segment_accumulate,
)


def test_fused_gather_forward_matches_take():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((500, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 500, (16, 4)), jnp.int32)
    np.testing.assert_array_equal(np.asarray(fused_gather(table, ids)),
                                  np.asarray(jnp.take(table, ids, axis=0)))


def test_fused_gather_grad_matches_take_grad():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((500, 8)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 500, (64,)), jnp.int32)

    def loss_take(t):
        return jnp.sum(jnp.take(t, ids, axis=0) ** 2)

    def loss_fused(t):
        return jnp.sum(fused_gather(t, ids) ** 2)

    g1 = jax.grad(loss_take)(table)
    g2 = jax.grad(loss_fused)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="pallas TPU kernel needs a TPU backend")
def test_sorted_segment_accumulate_matches_scatter_tpu():
    rng = np.random.default_rng(0)
    V, D, N = max(_MIN_TABLE_ROWS, 70_000), 32, max(_MIN_LOOKUPS, 9_000)
    ids = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    rows = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    ref = jnp.zeros((V, D), jnp.float32).at[ids].add(rows)
    got = sorted_segment_accumulate(ids, rows, V)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Host-planned backward (make_sort_plan + planned_gather)
# ---------------------------------------------------------------------------
from rec_pangu_tpu.ops.kernels.embedding_grad import (  # noqa: E402
    CHUNK,
    _tile_rows,
    make_sort_plan,
    padded_rows,
    plan_chunks,
    planned_gather,
)


def test_make_sort_plan_invariants():
    rng = np.random.default_rng(3)
    num_rows = padded_rows(70_000)
    n = 5_000
    ids = rng.integers(0, 70_000, n).astype(np.int32)
    plan = make_sort_plan(ids, num_rows)
    K = plan_chunks(n, num_rows)
    assert plan["meta"].shape == (K,)
    assert plan["perm"].shape == (K * CHUNK,)
    assert plan["inv_perm"].shape == (n,)
    tile = _tile_rows(num_rows)
    t = num_rows // tile
    meta = plan["meta"].astype(np.int64)
    tiles_, first, real = meta >> 2, (meta >> 1) & 1, meta & 1
    # exactly one zero-init chunk per output tile; tiles in ascending order
    assert first.sum() == t
    assert (np.diff(tiles_) >= 0).all()
    # rebuild the id stream the way the device does (gather by perm)
    perm = plan["perm"]
    real_slots = perm >= 0
    flat = np.where(real_slots, ids[np.clip(perm, 0, None)], num_rows + tile)
    assert real_slots.sum() == n
    np.testing.assert_array_equal(np.sort(ids), np.sort(flat[real_slots]))
    # inv_perm round-trips every entry to its slot
    np.testing.assert_array_equal(flat[plan["inv_perm"]], ids)
    # every real slot's id belongs to its chunk's tile
    chunk_of = np.repeat(np.arange(K), CHUNK)
    assert (flat[real_slots] // tile == tiles_[chunk_of[real_slots]]).all()
    # chunks flagged real actually contain entries; sentinel chunks do not
    has_entry = real_slots.reshape(K, CHUNK).any(axis=1)
    np.testing.assert_array_equal(real.astype(bool), has_entry)


def test_padded_rows():
    assert padded_rows(100) == 100          # small tables untouched
    big = 1_600_016
    assert padded_rows(big) % 1024 == 0 and padded_rows(big) >= big


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="pallas TPU kernel needs a TPU backend")
def test_planned_gather_grad_matches_take_tpu():
    rng = np.random.default_rng(4)
    V, D, N = 131_072, 32, 9_216  # V divisible by 2048 -> no output slice
    ids_np = rng.integers(0, V, N).astype(np.int32)
    plan = {k: jnp.asarray(v) for k, v in make_sort_plan(ids_np, V).items()}
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    ids = jnp.asarray(ids_np)
    co = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    # at this density the forward takes the scan-select path (split2 mode:
    # two error-compensated bf16 passes), so compare with its ~1e-5 tolerance
    f_ref = np.asarray(jnp.take(table, ids, axis=0))
    f_plan = np.asarray(planned_gather(table, ids, plan))
    np.testing.assert_allclose(f_plan, f_ref, atol=5e-5 * np.abs(f_ref).max())

    g_ref = jax.grad(lambda t: jnp.vdot(jnp.take(t, ids, axis=0), co))(table)
    g_plan = jax.grad(lambda t: jnp.vdot(planned_gather(t, ids, plan), co))(table)
    # default split2 mode: two error-compensated bf16 passes, ~1e-5 rel
    scale = float(jnp.max(jnp.abs(g_ref)))
    np.testing.assert_allclose(np.asarray(g_plan), np.asarray(g_ref),
                               atol=5e-5 * scale)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="pallas TPU kernel needs a TPU backend")
def test_planned_gather_rejects_mismatched_plan():
    rng = np.random.default_rng(5)
    V, N = 131_072, 9_216
    ids_np = rng.integers(0, V, N).astype(np.int32)
    # plan built for a smaller batch: chunk count no longer matches
    plan = {k: jnp.asarray(v)
            for k, v in make_sort_plan(ids_np[:2_048], V).items()}
    table = jnp.asarray(rng.standard_normal((V, 32)), jnp.float32)
    ids = jnp.asarray(ids_np)
    with pytest.raises(ValueError, match="different table"):
        jax.grad(lambda t: jnp.sum(planned_gather(t, ids, plan)))(table)


def test_make_sort_plan_rejects_out_of_range_ids():
    with pytest.raises(ValueError, match="out of range"):
        make_sort_plan(np.array([70_001]), 70_000)


# ---------------------------------------------------------------------------
# Fused (streaming) full-softmax CE
# ---------------------------------------------------------------------------
def test_fused_softmax_ce_matches_naive():
    from rec_pangu_tpu.ops.softmax_ce import fused_softmax_ce

    rng = np.random.default_rng(6)
    B, V, D = 32, 10_000, 16  # V not a CHUNK_V multiple: exercises padding
    user = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    items = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, V, (B,)), jnp.int32)

    def naive(u, it):
        scores = jnp.dot(u, it.T, preferred_element_type=jnp.float32)
        lp = jax.nn.log_softmax(scores, axis=-1)
        return -jnp.mean(jnp.take_along_axis(lp, pos[:, None], axis=1)[:, 0])

    l1 = naive(user, items)
    l2 = fused_softmax_ce(user, items, pos)
    # TPU default-precision matmuls + different reduction order: ~1e-4 rel
    np.testing.assert_allclose(float(l1), float(l2), rtol=5e-4)

    g1u, g1i = jax.grad(naive, argnums=(0, 1))(user, items)
    g2u, g2i = jax.grad(
        lambda u, it: fused_softmax_ce(u, it, pos), argnums=(0, 1))(user, items)
    # compare on absolute scale: both paths use default (bf16-pass) matmuls
    # in different orders, so near-zero elements have large relative noise
    tol_u = 5e-3 * float(np.abs(np.asarray(g1u)).max())
    tol_i = 5e-3 * float(np.abs(np.asarray(g1i)).max())
    np.testing.assert_allclose(np.asarray(g1u), np.asarray(g2u), atol=tol_u)
    np.testing.assert_allclose(np.asarray(g1i), np.asarray(g2i), atol=tol_i)


def test_padded_softmax_ce_matches_all_items_semantics():
    """The zero-copy padded CE == naive CE over all_items() (row 0 zeroed,
    pad rows excluded) — values AND both gradients, incl. no grad to row 0
    or the pad rows."""
    from rec_pangu_tpu.ops.softmax_ce import CHUNK_V, fused_softmax_ce_padded

    rng = np.random.default_rng(7)
    B, vocab, D = 32, 12_000, 16
    v_pad = -(-vocab // CHUNK_V) * CHUNK_V
    user = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    table = jnp.asarray(rng.standard_normal((v_pad, D)), jnp.float32)
    pos = jnp.asarray(rng.integers(1, vocab, (B,)), jnp.int32)

    def naive(u, t):
        all_items = t[:vocab] * (jnp.arange(vocab) != 0)[:, None]
        scores = jnp.dot(u, all_items.T, preferred_element_type=jnp.float32)
        lp = jax.nn.log_softmax(scores, axis=-1)
        return -jnp.mean(jnp.take_along_axis(lp, pos[:, None], axis=1)[:, 0])

    def padded(u, t):
        return fused_softmax_ce_padded(u, t, pos, vocab)

    l1, l2 = naive(user, table), padded(user, table)
    np.testing.assert_allclose(float(l1), float(l2), rtol=5e-4)

    g1u, g1t = jax.grad(naive, argnums=(0, 1))(user, table)
    g2u, g2t = jax.grad(padded, argnums=(0, 1))(user, table)
    tol_u = 5e-3 * float(np.abs(np.asarray(g1u)).max())
    tol_t = 5e-3 * float(np.abs(np.asarray(g1t)).max())
    np.testing.assert_allclose(np.asarray(g1u), np.asarray(g2u), atol=tol_u)
    np.testing.assert_allclose(np.asarray(g1t), np.asarray(g2t), atol=tol_t)
    g2t = np.asarray(g2t)
    assert np.all(g2t[0] == 0), "row 0 must get no gradient"
    assert np.all(g2t[vocab:] == 0), "pad rows must get no gradient"


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="pallas TPU kernel needs a TPU backend")
def test_planned_gather_compact_plan_tpu():
    """Compact plans (no shipped sorted_ids) rebuild the stream on device."""
    rng = np.random.default_rng(8)
    V, D, N = 131_072, 32, 9_216
    ids_np = rng.integers(0, V, N).astype(np.int32)
    plan = {k: jnp.asarray(v)
            for k, v in make_sort_plan(ids_np, V, compact=True).items()}
    assert "sorted_ids" not in plan
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    ids = jnp.asarray(ids_np)
    co = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    g_ref = jax.grad(lambda t: jnp.vdot(jnp.take(t, ids, axis=0), co))(table)
    g_plan = jax.grad(lambda t: jnp.vdot(planned_gather(t, ids, plan), co))(table)
    scale = float(jnp.max(jnp.abs(g_ref)))
    np.testing.assert_allclose(np.asarray(g_plan), np.asarray(g_ref),
                               atol=5e-5 * scale)


def test_fused_multimax_softmax_ce_matches_naive():
    """IOCRec's streamed K-max CE equals the naive [B, K, V] formulation."""
    import jax
    import jax.numpy as jnp

    from rec_pangu_tpu.ops.softmax_ce import fused_multimax_softmax_ce

    rng = np.random.default_rng(0)
    B, K, D, V = 8, 3, 16, 1000  # V not CHUNK_V-aligned: exercises padding
    u = jnp.asarray(rng.standard_normal((B, K, D)).astype(np.float32))
    items = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, V, (B,)))

    def naive(u, items, pos):
        logits = jnp.einsum("bkd,nd->bkn", u, items)
        ml = jnp.max(logits, axis=1)
        logp = jax.nn.log_softmax(ml, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, pos[:, None], axis=1))

    # HIGHEST matmul precision: on TPU both formulations otherwise run
    # bf16 passes whose rounding differs (and can even flip argmax ties)
    with jax.default_matmul_precision("highest"):
        ref = naive(u, items, pos)
        got = fused_multimax_softmax_ce(u, items, pos)
        np.testing.assert_allclose(float(got), float(ref),
                                   rtol=2e-5, atol=2e-5)

        g_ref = jax.grad(lambda a, b: naive(a, b, pos), (0, 1))(u, items)
        g_got = jax.grad(
            lambda a, b: fused_multimax_softmax_ce(a, b, pos), (0, 1))(
            u, items)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_multimax_softmax_ce_multi_chunk(monkeypatch):
    """Multi-chunk coverage: shrink CHUNK_V so the online-logsumexp carry and
    per-chunk gradient stacking run across many chunks (the production path
    is V=1M = 123 chunks; the default test fits in one)."""
    import jax
    import jax.numpy as jnp

    from rec_pangu_tpu.ops import softmax_ce as sc

    monkeypatch.setattr(sc, "CHUNK_V", 64)
    rng = np.random.default_rng(3)
    B, K, D, V = 8, 3, 16, 1000  # -> 16 chunks incl. a padded tail
    u = jnp.asarray(rng.standard_normal((B, K, D)).astype(np.float32))
    items = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, V, (B,)))

    def naive(u, items, pos):
        logits = jnp.einsum("bkd,nd->bkn", u, items)
        ml = jnp.max(logits, axis=1)
        logp = jax.nn.log_softmax(ml, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, pos[:, None], axis=1))

    with jax.default_matmul_precision("highest"):
        ref = naive(u, items, pos)
        got = sc.fused_multimax_softmax_ce(u, items, pos)
        np.testing.assert_allclose(float(got), float(ref),
                                   rtol=2e-5, atol=2e-5)
        g_ref = jax.grad(lambda a, b: naive(a, b, pos), (0, 1))(u, items)
        g_got = jax.grad(
            lambda a, b: sc.fused_multimax_softmax_ce(a, b, pos), (0, 1))(
            u, items)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_multimax_pallas_kernel_matches_scan(monkeypatch):
    """The Pallas K-max CE kernels (ops/kernels/multimax_ce.py) must equal
    the XLA-scan formulation — loss and both gradients — including vocab
    padding and argmax routing.  Interpret mode exercises the kernels on
    CPU; the chip lane re-runs this on hardware."""
    import jax
    import jax.numpy as jnp

    from rec_pangu_tpu.ops.softmax_ce import fused_multimax_softmax_ce

    rng = np.random.default_rng(5)
    B, K, D, V = 8, 4, 16, 1000
    u = jnp.asarray(rng.standard_normal((B, K, D)).astype(np.float32))
    items = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    pos = jnp.asarray(rng.integers(0, V, (B,)))

    def run():
        with jax.default_matmul_precision("highest"):
            loss = fused_multimax_softmax_ce(u, items, pos)
            grads = jax.grad(
                lambda a, b: fused_multimax_softmax_ce(a, b, pos), (0, 1))(
                u, items)
        return float(loss), grads

    monkeypatch.setenv("REC_PANGU_TPU_MULTIMAX_KERNEL", "0")
    loss_scan, g_scan = run()
    monkeypatch.setenv("REC_PANGU_TPU_MULTIMAX_KERNEL", "1")
    if jax.default_backend() == "cpu":
        monkeypatch.setenv("REC_PANGU_TPU_PALLAS_INTERPRET", "1")
    loss_k, g_k = run()

    np.testing.assert_allclose(loss_k, loss_scan, rtol=2e-5, atol=2e-5)
    for a, b in zip(g_k, g_scan):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_multimax_kernel_gate_covers_bench_shape(monkeypatch):
    """The auto gate must route the production IOCRec shape (B=1024, K=4,
    D=64) to the Pallas kernels, and REC_PANGU_TPU_MULTIMAX_KERNEL=0 must
    force the scan fallback."""
    from rec_pangu_tpu.ops.kernels.multimax_ce import (_choose_tile,
                                                       multimax_kernel_ok)
    from rec_pangu_tpu.ops.softmax_ce import _use_multimax_kernel

    assert multimax_kernel_ok(1024, 4, 64)
    # v_pad for V=1M at CHUNK_V=8192 padding; T=1024 is the r5 measured
    # optimum (scripts/exp_multimax_roofline.py: 11.0 vs 12.7 ms fwd)
    assert _choose_tile(1024, 123 * 8192) == 1024
    u = jnp.zeros((1024, 4, 64), jnp.float32)
    monkeypatch.setenv("REC_PANGU_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("REC_PANGU_TPU_MULTIMAX_KERNEL", "auto")
    assert _use_multimax_kernel(u)
    monkeypatch.setenv("REC_PANGU_TPU_MULTIMAX_KERNEL", "0")
    assert not _use_multimax_kernel(u)
