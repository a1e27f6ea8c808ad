"""Profile the SASRec train step at the BASELINE.md shape (dev script):
B=1024, L=50, V=1M, D=64."""
import time
import numpy as np
import jax, jax.numpy as jnp

from rec_pangu_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.ops.embedding import attach_item_plan
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import create_train_state, make_train_step

B, L, V, D = 1024, 50, 1_000_000, 64
rng = np.random.default_rng(0)
enc = {"item_id": {"vocab_size": V}}
config = {"embedding_dim": D, "max_length": L}
batch = {
    "hist_item_list": rng.integers(1, V, (B, L), dtype=np.int32),
    "hist_mask_list": (rng.random((B, L)) < 0.9).astype(np.float32),
    "target_item": rng.integers(1, V, (B,), dtype=np.int32),
}
model = get_model("SASRec")(enc_dict=enc, config=config)
attach_item_plan(batch, V + 1, D)
print("plan attached:", "emb_plan" in batch)
state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                           jax.random.PRNGKey(0))
step = make_train_step(state.batch_stats is not None)
dbatch = jax.device_put(batch)
srng = jax.random.PRNGKey(1)
for _ in range(4):
    state, out = step(state, dbatch, srng)
_ = float(out["loss"])
t0 = time.perf_counter()
N = 20
for _ in range(N):
    state, out = step(state, dbatch, srng)
_ = float(out["loss"])
dt = (time.perf_counter() - t0) / N
print(f"step: {dt*1e3:.2f} ms  ({B/dt:,.0f} ex/s)")

with jax.profiler.trace("/tmp/sasrec_trace"):
    for _ in range(5):
        state, out = step(state, dbatch, srng)
    _ = float(out["loss"])
print("traced to /tmp/sasrec_trace")
