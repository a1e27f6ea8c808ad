"""Capture a profiler trace of the dropout-free local transformer fwd+bwd at
the IOCRec bench shape and print the top XLA ops by self time (dev script).
Parses the raw trace.json.gz — no tensorboard needed."""
import glob
import gzip
import json
import time
from collections import defaultdict

import numpy as np

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from rec_pangu_tpu.ops.sequence_enc import TransformerEncoder

B, L, D = 3072, 50, 64
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, L, D), dtype=np.float32))
mask = jnp.tril(jnp.ones((B, 1, L, L), bool))
enc = TransformerEncoder(n_layers=3, n_heads=2, inner_size=128,
                         hidden_dropout_prob=0.5, attn_dropout_prob=0.5,
                         hidden_act="relu")
params = enc.init({"params": jax.random.PRNGKey(0)}, x, mask, False)


@jax.jit
def g(p, x):
    def f(p, x):
        out = enc.apply(p, x, mask, False)
        return jnp.sum((out * out).astype(jnp.float32))

    return jax.grad(f, argnums=(0, 1))(p, x)


out = g(params, x)
_ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
trace_dir = "/tmp/local_trace"
with jax.profiler.trace(trace_dir):
    for _ in range(5):
        out = g(params, x)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])

time.sleep(1)
files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
print("trace files:", files)
by_op = defaultdict(float)
total = 0.0
for fn in files[-1:]:
    with gzip.open(fn, "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        # device-lane events carry XLA op names; host threads are filtered by
        # requiring the 'device' substring in the process/track name lookup
        name = ev.get("name", "")
        dur = ev.get("dur", 0)
        args = ev.get("args") or {}
        if "run_id" in args or "program_id" in args or True:
            by_op[name] += dur
            total += dur
top = sorted(by_op.items(), key=lambda t: -t[1])[:40]
for name, dur in top:
    print(f"{dur/5/1e3:8.3f} ms  {name[:110]}")
