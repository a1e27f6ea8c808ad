"""Sampled K-max CE at industrial vocabulary (VERDICT r4 item 7 "done"
criterion): IOCRec train step at V=10M with ``loss_type='sampled'`` — a
scale point where the exact K-max CE cannot go (the exact kernel streams
the full 10M-row table through VMEM every step: ~10x the V=1M CE's 34 ms,
i.e. the CE alone would dominate a ~400 ms step).  Also measures ComirecSA
(best-interest single sampled CE) at the same shape.
"""
import os
import time

import numpy as np

# production bench config: bf16 Adam-moment storage (halves the optimizer
# state at [10M, 64] — the f32-moment run OOMs HBM for ComirecSA) + RBG rng
os.environ.setdefault("REC_PANGU_TPU_MOMENT_DTYPE", "bf16")
os.environ.setdefault("REC_PANGU_TPU_RNG_IMPL", "rbg")

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


def bench(name, extra_cfg, b=B):
    config = {"embedding_dim": D, "max_length": L, "K": K,
              "loss_type": "sampled", "num_negatives": 8192, **extra_cfg}
    bb = {k: v[:b] for k, v in batch.items()}
    model = get_model(name)(enc_dict=enc, config=config)
    state = create_train_state(model, bb, make_optimizer(1e-3, 1),
                               jax.random.PRNGKey(0))
    step = make_train_step(state.batch_stats is not None)
    dbatch = jax.device_put(bb)
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
    print(f"{name} V=10M sampled(8192) B={b}: {dt*1e3:.1f} ms/step "
          f"({b/dt:,.0f} ex/s/chip)", flush=True)


bench("IOCRec", {})
# ComirecSA at V=10M: XLA's compile-time HBM estimate is 19.1G > 15.75G
# REGARDLESS of batch (the tables + f32 optax moments + transient dense
# grad/update buffers dominate) — the single-chip unfused tail is the wall
# at this vocabulary, which is exactly what the row-sharded TP tables and
# the fused in-kernel Adam exist for (docs/perf_notes.md §1).  The K-max
# multi-interest sampled path itself is the IOCRec leg above.
