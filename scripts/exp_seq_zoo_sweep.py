"""Sequence-zoo perf sweep: ms/step, XLA-estimated FLOPs, and achieved MFU
for every sequence model at the bench shape (B=1024, L=50, V=1M, D=64).

FLOPs come from XLA's own cost analysis of the compiled train step
(compile().cost_analysis()['flops']) — the same program that runs, not a
hand model.  MFU is quoted against both v5e peaks (bf16 197 TF/s — what
DEFAULT-precision f32 matmuls actually run on the MXU — and f32 49 TF/s).  Writes docs/seq_zoo_mfu.json; `--models A,B` restricts the sweep.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_seq_zoo_sweep.py
"""
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("REC_PANGU_TPU_MOMENT_DTYPE", "bf16")
os.environ.setdefault("REC_PANGU_TPU_RNG_IMPL", "rbg")

from rec_pangu_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax

from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.ops.embedding import attach_item_plan
from rec_pangu_tpu.train.fused_update import maybe_enable_seq_fused_update
from rec_pangu_tpu.train.optim import make_optimizer
from rec_pangu_tpu.train.steps import (create_train_state, make_step_rng,
                                       make_train_step)

B, L, V, D = 1024, 50, 1_000_000, 64
PEAK_BF16 = 197e12
PEAK_F32 = 49e12

ALL = ["YotubeDNN", "GRU4Rec", "NARM", "SASRec", "STAMP", "NextItNet",
       "SINE", "ComirecSA", "ComirecDR", "MIND", "Re4", "CMI", "ContraRec",
       "CLRec", "IOCRec", "SRGNN", "GCSAN", "NISER"]


def bench_one(name):
    rng = np.random.default_rng(0)
    enc = {"item_id": {"vocab_size": V}}
    config = {"embedding_dim": D, "max_length": L, "K": 4}
    batch = {
        "hist_item_list": rng.integers(1, V, (B, L), dtype=np.int32),
        "hist_mask_list": (rng.random((B, L)) < 0.9).astype(np.float32),
        "target_item": rng.integers(1, V, (B,), dtype=np.int32),
        "next_item_list": rng.integers(1, V, (B, 10), dtype=np.int32),
        "next_mask_list": np.ones((B, 10), dtype=np.float32),
    }
    model = get_model(name)(enc_dict=enc, config=config)
    if getattr(model, "session_graph", False):
        from rec_pangu_tpu.ops.graph import attach_session_graph

        attach_session_graph(batch)
        attach_item_plan(batch, V + 1, D, ids_key="graph_nodes")
    elif getattr(model, "host_aug", False):
        from rec_pangu_tpu.models.sequence.contrarec import \
            host_augment_sequences

        aug_rng = np.random.default_rng(7)
        hist = batch["hist_item_list"]
        aug1 = host_augment_sequences(aug_rng, hist, 3.0, 3.0, V - 1)
        aug2 = host_augment_sequences(aug_rng, hist, 3.0, 3.0, V - 1)
        batch["aug_all"] = np.concatenate([hist, aug1, aug2], axis=0)
        attach_item_plan(batch, V + 1, D, ids_key="aug_all")
    elif getattr(model, "lookup_extra", ()):
        # CLRec/CMI-style combined [hist | target (| host negs)] plan (r5)
        if getattr(model, "host_negatives", False):
            batch["neg_items"] = rng.integers(1, max(V - 1, 2), B).astype(np.int32)
        parts = [batch["hist_item_list"]]
        parts += [np.asarray(batch[k]).reshape(B, -1)
                  for k in model.lookup_extra]
        batch["lookup_all"] = np.concatenate(parts, axis=1).astype(np.int32)
        attach_item_plan(batch, V + 1, D, ids_key="lookup_all")
    else:
        attach_item_plan(batch, V + 1, D)
    state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                               jax.random.PRNGKey(0))
    state, train_step, _ = maybe_enable_seq_fused_update(
        state, model, batch, lr=1e-3, steps_per_epoch=1)
    fused = train_step is not None
    if not fused:
        train_step = make_train_step(state.batch_stats is not None)  # jitted
    rngk = make_step_rng(1)
    dbatch = jax.device_put(batch)
    # FLOPs from the compiled step itself
    flops = None
    try:
        lowered = (train_step.lower(state, dbatch, rngk)
                   if hasattr(train_step, "lower") else None)
        if lowered is not None:
            ca = lowered.compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
    except Exception as e:
        print(f"[{name}] cost_analysis failed: {e}", file=sys.stderr)
    for _ in range(3):
        state, out = train_step(state, dbatch, rngk)
    _ = float(out["loss"])
    t0 = time.perf_counter()
    steps = 10
    for _ in range(steps):
        state, out = train_step(state, dbatch, rngk)
    _ = float(out["loss"])
    dt = (time.perf_counter() - t0) / steps
    return {
        "ms_per_step": round(dt * 1e3, 2),
        "examples_per_s": round(B / dt, 1),
        "fused": fused,
        "gflops_per_step": round(flops / 1e9, 1) if flops else None,
        "mfu_bf16_pct": round(flops / dt / PEAK_BF16 * 100, 2) if flops else None,
        "mfu_f32_pct": round(flops / dt / PEAK_F32 * 100, 2) if flops else None,
    }


def main():
    models = ALL
    for i, a in enumerate(sys.argv):
        if a == "--models":
            models = sys.argv[i + 1].split(",")
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "seq_zoo_mfu.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    for name in models:
        if name in results and "--force" not in sys.argv:
            continue
        t0 = time.time()
        try:
            results[name] = bench_one(name)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        results[name]["wall_s"] = round(time.time() - t0, 1)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        print(name, results[name], flush=True)


if __name__ == "__main__":
    main()
