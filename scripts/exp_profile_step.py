"""Capture jax.profiler traces of the DeepFM bench step for scatter vs
planned embedding backward.  Parses the trace and prints top device ops.
Run: python scripts/exp_profile_step.py [scatter|planned|parse]"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(mode):
    import numpy as np
    import jax
    from rec_pangu_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    from rec_pangu_tpu.models import get_model
    from rec_pangu_tpu.ops.embedding import attach_emb_plan
    from rec_pangu_tpu.train.optim import make_optimizer
    from rec_pangu_tpu.train.steps import create_train_state, make_train_step

    BATCH, F, VOCAB, D = 8192, 16, 100_000, 32
    rng = np.random.default_rng(0)
    enc_dict = {f"dense_{i}": {"min": 0.0, "max": 1.0} for i in range(9)}
    for i in range(F):
        enc_dict[f"sparse_{i}"] = {"vocab_size": VOCAB}
    batch = {
        "sparse": rng.integers(0, VOCAB, (BATCH, F), dtype=np.int32),
        "dense": rng.random((BATCH, 9), dtype=np.float32),
        "label": rng.integers(0, 2, (BATCH,)).astype(np.float32),
    }
    model = get_model("DeepFM")(enc_dict=enc_dict, embedding_dim=D)
    if mode == "planned":
        attach_emb_plan(batch, model.spec, D)
    tx = make_optimizer(1e-3, steps_per_epoch=1)
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    train_step = make_train_step(False)
    key = jax.random.PRNGKey(1)
    batch = jax.device_put(batch)
    for _ in range(5):
        state, out = train_step(state, batch, key)
    float(out["loss"])
    outdir = f"/tmp/prof_{mode}"
    with jax.profiler.trace(outdir):
        for _ in range(10):
            state, out = train_step(state, batch, key)
        float(out["loss"])
    print("trace written", outdir)


def parse(mode):
    files = glob.glob(f"/tmp/prof_{mode}/**/*.trace.json.gz", recursive=True)
    if not files:
        print(f"[{mode}] no trace found")
        return
    f = max(files, key=os.path.getmtime)
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    # device-track events: pick pids whose process name mentions TPU/device
    pid_names = {}
    for ev in data["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "Device" in n or "XLA" in n.upper()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for ev in data["traceEvents"]:
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
            tot[ev["name"]] += ev.get("dur", 0) / 1000.0
            cnt[ev["name"]] += 1
    print(f"== {mode}: top device ops (total ms over 10 steps) ==")
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{ms:9.2f} ms  x{cnt[name]:4d}  {name[:110]}")
    print(f"   (process names: {sorted(set(pid_names.values()))[:8]})")


if __name__ == "__main__":
    arg = sys.argv[1] if len(sys.argv) > 1 else "all"
    if arg in ("scatter", "planned"):
        run(arg)
    elif arg == "parse":
        parse("scatter")
        parse("planned")
