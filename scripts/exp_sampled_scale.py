"""Sampled K-max CE at industrial vocabulary (VERDICT r4 item 7 "done"
criterion): IOCRec train step at V=10M with ``loss_type='sampled'`` — a
scale point where the exact K-max CE cannot go (the exact kernel streams
the full 10M-row table through VMEM every step: ~10x the V=1M CE's 34 ms,
i.e. the CE alone would dominate a ~400 ms step).  Also measures ComirecSA
(best-interest single sampled CE) at the same shape.
"""
import time

import numpy as np

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import create_train_state, make_train_step

B, L, V, D, K = 1024, 50, 10_000_000, 64, 4

rng = np.random.default_rng(0)
enc = {"item_id": {"vocab_size": V}}
batch = {
    "hist_item_list": rng.integers(1, V, (B, L), dtype=np.int32),
    "hist_mask_list": (rng.random((B, L)) < 0.9).astype(np.float32),
    "target_item": rng.integers(1, V, (B,), dtype=np.int32),
}


def bench(name, extra_cfg):
    config = {"embedding_dim": D, "max_length": L, "K": K,
              "loss_type": "sampled", "num_negatives": 8192, **extra_cfg}
    model = get_model(name)(enc_dict=enc, config=config)
    state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                               jax.random.PRNGKey(0))
    step = make_train_step(state.batch_stats is not None)
    dbatch = jax.device_put(batch)
    rngk = jax.random.PRNGKey(1)
    st = state
    for _ in range(5):
        st, out = step(st, dbatch, rngk)
    _ = float(out["loss"])
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        st, out = step(st, dbatch, rngk)
    _ = float(out["loss"])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name} V=10M sampled(8192): {dt*1e3:.1f} ms/step "
          f"({B/dt:,.0f} ex/s/chip)", flush=True)


bench("IOCRec", {})
bench("ComirecSA", {})
