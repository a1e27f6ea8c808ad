"""Headline benchmark: DeepFM CTR train-step throughput (examples/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config mirrors the reference's DeepFM defaults (embedding_dim=32,
hidden_units=[64,64,64], Adam 1e-3 — rec_pangu/models/ranking/deepfm.py:14-18,
rec_pangu/trainer.py:75) on a production-shaped synthetic workload
(batch 8192, 16 sparse features x 100k vocab, 9 dense).

Baseline: the same model/config in plain PyTorch on CPU (the reference is
CPU/GPU torch; this image has CPU torch), measured by scripts/baseline_torch.py
on this machine: 16,883 examples/s.

The step uses the host-planned embedding backward (docs/perf_notes.md §1):
the batch carries a host-computed sort plan so the embedding gradient is
dense per-tile MXU matmuls instead of XLA's row-serial scatter.
"""
import json
import time

import numpy as np

BATCH = 8192
NUM_SPARSE = 16
NUM_DENSE = 9
VOCAB = 100_000
DIM = 32
STEPS = 48
WARMUP = 5
# fused steps scanned per dispatch; 1 measured fastest — JAX's async dispatch
# already overlaps the host gap with device execution, and the scan's stacked-
# batch slicing costs more than it saves (scripts/exp_profile_fused.py)
K_PER_CALL = 1

BASELINE_EXAMPLES_PER_S = 16_883.0  # torch-cpu (scripts/baseline_torch.py)


def main():
    import jax

    from rec_pangu_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # relay compiles are bursty; reuse executables

    from rec_pangu_tpu.models import get_model
    from rec_pangu_tpu.train.optim import make_optimizer
    from rec_pangu_tpu.train.steps import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    enc_dict = {}
    for i in range(NUM_DENSE):
        enc_dict[f"dense_{i}"] = {"min": 0.0, "max": 1.0}
    for i in range(NUM_SPARSE):
        enc_dict[f"sparse_{i}"] = {"vocab_size": VOCAB}
    batch = {
        "sparse": rng.integers(0, VOCAB, (BATCH, NUM_SPARSE), dtype=np.int32),
        "dense": rng.random((BATCH, NUM_DENSE), dtype=np.float32),
        "label": rng.integers(0, 2, (BATCH,)).astype(np.float32),
    }

    model = get_model("DeepFM")(enc_dict=enc_dict, embedding_dim=DIM)
    # host-side embedding sort plan: the backward becomes permute-gather +
    # dense MXU tile accumulation instead of XLA's row-serial scatter
    from rec_pangu_tpu.ops.embedding import attach_emb_plan

    attach_emb_plan(batch, model.spec, DIM)
    tx = make_optimizer(1e-3, steps_per_epoch=1)
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    # fuse the table Adam update into the planned backward kernel — the dense
    # [V, D] embedding gradient never reaches HBM (docs/perf_notes.md §1)
    from rec_pangu_tpu.train.fused_update import maybe_enable_fused_update

    state, train_step, tables = maybe_enable_fused_update(
        state, model, batch, lr=1e-3, steps_per_epoch=1)
    step_rng = jax.random.PRNGKey(1)

    k = 1
    if train_step is not None and K_PER_CALL > 1:
        # one dispatch scans K fused steps — amortizes the host dispatch gap
        from rec_pangu_tpu.train.fused_update import make_fused_multi_step

        k = K_PER_CALL
        multi = make_fused_multi_step(
            k, model, tables, 1e-3, 1,
            has_batch_stats=state.batch_stats is not None)
        batch = jax.tree.map(lambda x: np.stack([x] * k), batch)

        def train_step(st, b, rng):
            st, outs = multi(st, b, rng)
            return st, jax.tree.map(lambda x: x[-1], outs)
    elif train_step is None:
        train_step = make_train_step(state.batch_stats is not None)

    batch = jax.device_put(batch)
    calls = max(1, STEPS // k)
    for _ in range(WARMUP):
        state, out = train_step(state, batch, step_rng)
    # sync via scalar fetch: block_until_ready alone is unreliable over the
    # axon relay, and fetching a scalar forces the whole dependent chain
    float(out["loss"])

    start = time.perf_counter()
    for _ in range(calls):
        state, out = train_step(state, batch, step_rng)
    float(out["loss"])
    elapsed = time.perf_counter() - start

    eps = BATCH * calls * k / elapsed
    print(json.dumps({
        "metric": "deepfm_train_examples_per_s_per_chip",
        "value": round(eps, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(eps / BASELINE_EXAMPLES_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
