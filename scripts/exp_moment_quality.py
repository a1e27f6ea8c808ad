"""Quality A/B for bf16 Adam-moment storage at a shape where the fused path
actually engages (dev script).

The bundled CSV datasets are all below the planned-path gate
(_MIN_TABLE_ROWS = 64k), so REC_PANGU_TPU_MOMENT_DTYPE is inert on them; this
script instead trains DeepFM at the bench shape (16 x 100k vocab) on a
PLANTED logistic task — labels drawn from a hidden per-(feature,id) weight
table — so learning dynamics are real and held-out AUC is meaningful.  Both
arms see identical data and seeds; the only difference is the moment storage
dtype inside the fused Adam kernel.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_moment_quality.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# VOCAB=8192 keeps total rows (16*8192=131k) above the planned-path gate
# while giving each row ~8 training hits, so held-out AUC measures real
# generalization (at 100k vocab test ids are unseen and AUC pins to 0.5).
BATCH, F, VOCAB, DIM, NDENSE = 8192, 16, 8192, 32, 9
STEPS = 300
N_TRAIN_BATCHES = 8


def make_batches(rng, w, n):
    out = []
    for _ in range(n):
        sparse = rng.integers(0, VOCAB, (BATCH, F), dtype=np.int32)
        logit = w[np.arange(F)[None, :], sparse].sum(axis=1) / np.sqrt(F)
        p = 1.0 / (1.0 + np.exp(-logit))
        out.append({
            "sparse": sparse,
            "dense": rng.random((BATCH, NDENSE), dtype=np.float32),
            "label": (rng.random(BATCH) < p).astype(np.float32),
        })
    return out


def run(dtype_flag):
    os.environ["REC_PANGU_TPU_MOMENT_DTYPE"] = dtype_flag
    import jax

    from rec_pangu_tpu.eval.metrics import roc_auc_score
    from rec_pangu_tpu.models import get_model
    from rec_pangu_tpu.ops.embedding import attach_emb_plan
    from rec_pangu_tpu.train.fused_update import maybe_enable_fused_update
    from rec_pangu_tpu.train.optim import make_optimizer
    from rec_pangu_tpu.train.steps import create_train_state

    rng = np.random.default_rng(7)
    w = rng.standard_normal((F, VOCAB)).astype(np.float32) * 2.0
    train_batches = make_batches(rng, w, N_TRAIN_BATCHES)
    test_batches = make_batches(rng, w, 2)

    enc = {f"dense_{i}": {"min": 0.0, "max": 1.0} for i in range(NDENSE)}
    enc.update({f"sparse_{i}": {"vocab_size": VOCAB} for i in range(F)})
    model = get_model("DeepFM")(enc_dict=enc, embedding_dim=DIM)
    for b in train_batches:
        attach_emb_plan(b, model.spec, model.embedding_dim)
    state = create_train_state(model, train_batches[0], make_optimizer(1e-3, 1),
                               jax.random.PRNGKey(0))
    state, step, _ = maybe_enable_fused_update(state, model, train_batches[0],
                                               lr=1e-3, steps_per_epoch=1)
    assert step is not None, "fused path must engage for this A/B"
    dev_batches = [jax.device_put(b) for b in train_batches]
    rngk = jax.random.PRNGKey(1)
    t0 = time.time()
    losses = []
    for s in range(STEPS):
        state, out = step(state, dev_batches[s % N_TRAIN_BATCHES], rngk)
        if s % 50 == 0 or s == STEPS - 1:
            losses.append((s, float(out["loss"])))
    # held-out AUC/logloss with the trained params
    ys, ps = [], []
    for b in test_batches:
        scores = model.apply({"params": state.params}, b, False)["pred"]
        ps.append(np.asarray(scores).reshape(-1))
        ys.append(b["label"])
    y = np.concatenate(ys); p = np.concatenate(ps)
    auc = roc_auc_score(y, p)
    eps = 1e-7
    ll = -np.mean(y * np.log(np.clip(p, eps, 1)) +
                  (1 - y) * np.log(np.clip(1 - p, eps, 1)))
    print(f"{dtype_flag:5s} losses={losses} test_auc={auc:.4f} "
          f"logloss={ll:.4f} ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    from rec_pangu_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    run("f32")
    run("bf16")
