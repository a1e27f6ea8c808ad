"""Measure the multi-interest eval-merge speedup (dev script, VERDICT r3
item 7): per-user Python merge loop vs the jitted batched merge at the
protocol shape (B=512 users, K=4 interests, top-200 candidates from a
V=200k corpus)."""
import time

import numpy as np

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from rec_pangu_tpu.eval.retrieval import (batched_merge_multi_interest,
                                          batched_merge_multi_interest_np,
                                          merge_multi_interest)

B, K, TOPN, V = 512, 4, 200, 200_000
rng = np.random.default_rng(0)
ids = rng.integers(0, V, (B, K, TOPN)).astype(np.int32)
scores = np.sort(rng.random((B, K, TOPN)).astype(np.float32))[..., ::-1].copy()

t0 = time.perf_counter()
loop_out = [merge_multi_interest(ids[i], scores[i], TOPN) for i in range(B)]
t_loop = time.perf_counter() - t0

dids = jnp.asarray(ids.reshape(B, -1))
dscores = jnp.asarray(scores.reshape(B, -1))
merged, counts = batched_merge_multi_interest(dids, dscores, TOPN)
merged.block_until_ready()
t0 = time.perf_counter()
for _ in range(10):
    merged, counts = batched_merge_multi_interest(dids, dscores, TOPN)
_ = float(jnp.sum(counts))
t_dev = (time.perf_counter() - t0) / 10

merged_np, counts_np = np.asarray(merged), np.asarray(counts)
for i in range(0, B, 97):
    assert merged_np[i, :counts_np[i]].tolist() == loop_out[i], i

t0 = time.perf_counter()
for _ in range(10):
    m2, c2 = batched_merge_multi_interest_np(
        ids.reshape(B, -1), scores.reshape(B, -1), TOPN)
t_np = (time.perf_counter() - t0) / 10
for i in range(0, B, 97):
    assert m2[i, :c2[i]].tolist() == loop_out[i], i
print(f"python per-user loop : {t_loop * 1e3:.1f} ms for {B} users")
print(f"batched device merge : {t_dev * 1e3:.2f} ms  ({t_loop / t_dev:.1f}x)")
print(f"batched numpy merge  : {t_np * 1e3:.2f} ms  ({t_loop / t_np:.0f}x)")
