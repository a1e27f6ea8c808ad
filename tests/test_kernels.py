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
