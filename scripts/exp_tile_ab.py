"""A/B the full fused DeepFM step and the forward pieces at tile 2048 vs 4096
(dev script; monkeypatches _tile_rows in both kernel modules)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import rec_pangu_tpu.ops.kernels.embedding_grad as eg
import rec_pangu_tpu.ops.kernels.fused_adam as fa
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.ops.embedding import attach_emb_plan
from rec_pangu_tpu.train.fused_update import maybe_enable_fused_update
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import create_train_state

BATCH, F, VOCAB, DIM = 8192, 16, 100_000, 32
rng = np.random.default_rng(0)
enc = {f"dense_{i}": {"min": 0.0, "max": 1.0} for i in range(9)}
enc.update({f"sparse_{i}": {"vocab_size": VOCAB} for i in range(F)})
base_batch = {
    "sparse": rng.integers(0, VOCAB, (BATCH, F), dtype=np.int32),
    "dense": rng.random((BATCH, 9), dtype=np.float32),
    "label": rng.integers(0, 2, (BATCH,)).astype(np.float32),
}

orig = eg._tile_rows
for tile in (4096, 8192):
    eg._tile_rows = lambda n, _t=tile: _t
    fa._tile_rows = eg._tile_rows
    batch = dict(base_batch)
    model = get_model("DeepFM")(enc_dict=enc, embedding_dim=DIM)
    attach_emb_plan(batch, model.spec, DIM)
    K = batch["emb_plan"]["meta"].shape[0]
    state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                               jax.random.PRNGKey(0))
    state, fstep, _ = maybe_enable_fused_update(state, model, batch, 1e-3, 1)
    assert fstep is not None, f"fused path off at tile {tile}"
    dbatch = jax.device_put(batch)
    srng = jax.random.PRNGKey(1)
    for _ in range(4):
        state, out = fstep(state, dbatch, srng)
    _ = float(out["loss"])
    t0 = time.perf_counter()
    for _ in range(30):
        state, out = fstep(state, dbatch, srng)
    _ = float(out["loss"])
    ms = (time.perf_counter() - t0) / 30 * 1e3
    print(f"tile {tile}: fused step {ms:.2f} ms ({BATCH / ms * 1e3:,.0f} ex/s)"
          f"  K={K} chunks", flush=True)
eg._tile_rows = orig
fa._tile_rows = orig
