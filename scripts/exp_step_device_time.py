"""Device-busy vs wall-clock for a model's train step at the bench shape
(dev script): traces N steps and sums the device-lane XLA module events.
Distinguishes device-bound legs from relay-dispatch-bound legs (the axon
tunnel adds ~10+ ms of per-dispatch latency that a K-step scan amortizes).

Usage: exp_step_device_time.py [MODEL] [K]
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax

from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.ops.embedding import attach_item_plan
from rec_pangu_tpu.train.fused_update import maybe_enable_seq_fused_update
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import (create_train_state, make_multi_step,
                                       make_step_rng, make_train_step)

name = sys.argv[1] if len(sys.argv) > 1 else "IOCRec"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1
B, L, V, D = 1024, 50, 1_000_000, 64
rng = np.random.default_rng(0)
enc = {"item_id": {"vocab_size": V}}
config = {"embedding_dim": D, "max_length": L, "K": 4}
batch = {
    "hist_item_list": rng.integers(1, V, (B, L), dtype=np.int32),
    "hist_mask_list": (rng.random((B, L)) < 0.9).astype(np.float32),
    "target_item": rng.integers(1, V, (B,), dtype=np.int32),
}
model = get_model(name)(enc_dict=enc, config=config)
if getattr(model, "session_graph", False):
    from rec_pangu_tpu.ops.graph import attach_session_graph

    attach_session_graph(batch)
    attach_item_plan(batch, V + 1, D, ids_key="graph_nodes")
else:
    attach_item_plan(batch, V + 1, D)
state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                           jax.random.PRNGKey(0))
state, train_step, _ = maybe_enable_seq_fused_update(
    state, model, batch, lr=1e-3, steps_per_epoch=1)
fused = train_step is not None
if not fused:
    train_step = make_train_step(state.batch_stats is not None)
rngk = make_step_rng(1)

if K > 1:
    # K-step scan over a stacked batch: one dispatch per K optimizer steps
    multi = make_multi_step(state.batch_stats is not None, K)
    stacked = jax.tree.map(lambda x: np.stack([x] * K), batch)
    dstacked = jax.device_put(stacked)

    def run(state):
        return multi(state, dstacked, rngk)
else:
    dbatch = jax.device_put(batch)

    def run(state):
        return train_step(state, dbatch, rngk)

for _ in range(3):
    state, out = run(state)
_ = float(np.asarray(out["loss"]).reshape(-1)[-1])
reps = 10
t0 = time.perf_counter()
for _ in range(reps):
    state, out = run(state)
_ = float(np.asarray(out["loss"]).reshape(-1)[-1])
wall = (time.perf_counter() - t0) / reps * 1e3
print(f"{name} K={K}: wall {wall:.1f} ms/dispatch "
      f"({wall / K:.1f} ms/step, {B * K / wall * 1e3:,.0f} ex/s)", flush=True)

trace_dir = f"/tmp/step_trace_{name}_{K}"
with jax.profiler.trace(trace_dir):
    for _ in range(5):
        state, out = run(state)
    _ = float(np.asarray(out["loss"]).reshape(-1)[-1])

time.sleep(1)
files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
busy = defaultdict(float)
for fn in files[-1:]:
    with gzip.open(fn, "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        n = ev.get("name", "")
        if n.startswith("jit_") or n.startswith("pallas") or n == "fusion":
            busy[n] += ev.get("dur", 0)
total = sum(busy.values())
print(f"device jit-module busy over 5 reps: {total / 5 / 1e3:.1f} ms/rep "
      f"({total / 5 / K / 1e3:.2f} ms/step)")
for n, d in sorted(busy.items(), key=lambda t: -t[1])[:6]:
    print(f"  {d / 5 / 1e3:7.2f} ms  {n[:80]}")
