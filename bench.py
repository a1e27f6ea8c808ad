"""Driver benchmark suite: train-step throughput (examples/s/chip) for the
headline workloads across all three zoos, with a fused-path-engaged assertion
and a >15% regression guard (VERDICT.md round-1 item 2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "suite",
"regressions"} — the headline metric stays DeepFM CTR throughput vs the
torch-CPU reference implementation (16,883 ex/s, scripts/baseline_torch.py).
Exits 1 (after printing) if a fused path silently disengaged or any suite
number regressed >15% vs the recorded round numbers below.  The EXPECTED
floors are measurements from THIS machine's tunneled TPU; on different
hardware set REC_PANGU_TPU_BENCH_NO_GUARD=1 to report without gating.

`bench.py --selftest` instead runs the chip-gated Pallas kernel tests
(REC_PANGU_TPU_TEST_BACKEND=device) and records pass/fail in CHIPTEST.json —
the per-round hardware-verification artifact.

Configs mirror the reference's defaults (embedding_dim=32 ranking —
rec_pangu/models/ranking/deepfm.py:14-18; Adam 1e-3 — rec_pangu/trainer.py:75)
on production-shaped synthetic workloads:
  ranking/MTL: batch 8192, 16 sparse x 100k vocab, 9 dense
  sequence:    batch 1024, len 50, 1M-item vocab, dim 64
"""
import json
import os
import sys
import time

import numpy as np

BATCH = 8192
NUM_SPARSE = 16
NUM_DENSE = 9
VOCAB = 100_000
DIM = 32

SEQ_B, SEQ_L, SEQ_V, SEQ_D = 1024, 50, 1_000_000, 64

BASELINE_EXAMPLES_PER_S = 16_883.0  # DeepFM torch-cpu (scripts/baseline_torch.py)

# Most recent committed same-session measurements; a suite value more than
# 15% below its entry here means a regression (e.g. a silent fallback from
# the planned/fused kernels to the XLA scatter, which is 3.6x) and fails the
# run.  The tunneled TPU shows ~5-10% ambient session-to-session variance
# (round-1 BASELINE.md numbers were measured a few % higher), so the floor is
# the latest in-session sweep, not the best-ever number.
EXPECTED = {
    "DeepFM": 1_695_000,  # r05 closing sweep (1,695,631 measured)
    "WDL": 1_089_000,
    "MMOE": 1_695_000,
    "SASRec": 51_300,     # r05, fused encoder + CE tile bump
    "GRU4Rec": 58_700,
    "IOCRec": 12_370,     # r05, factored disentangle + global-attn kernel
                          # + CE tile bump + K-step leg (bar >= 12,000 MET)
    "SRGNN": 60_900,      # r04 host session graph + fused table-Adam
}
REGRESSION_TOLERANCE = 0.15

# Models whose fused table-Adam step MUST engage at the bench shape; a None
# return from maybe_enable_*_fused_update is a hard failure, not a fallback.
MUST_FUSE = {"DeepFM", "WDL", "MMOE", "SASRec", "GRU4Rec", "SRGNN", "IOCRec"}


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _time_steps(train_step, state, batch, rng, warmup=5, steps=30):
    import jax

    batch = jax.device_put(batch)
    for _ in range(warmup):
        state, out = train_step(state, batch, rng)
    # sync via scalar fetch: block_until_ready alone is unreliable over the
    # axon relay, and fetching a scalar forces the whole dependent chain
    # (multi-step outputs carry a leading [K] axis — fetch the last)
    float(np.asarray(out["loss"]).reshape(-1)[-1])
    start = time.perf_counter()
    for _ in range(steps):
        state, out = train_step(state, batch, rng)
    float(np.asarray(out["loss"]).reshape(-1)[-1])
    return (time.perf_counter() - start) / steps


def bench_ranking(name, num_task=1, steps=30):
    """DeepFM/WDL/MMOE-style models on the CTR bench shape.  Returns
    (examples_per_s, fused_engaged)."""
    import jax

    from rec_pangu_tpu.models import get_model
    from rec_pangu_tpu.ops.embedding import attach_emb_plan
    from rec_pangu_tpu.train.fused_update import maybe_enable_fused_update
    from rec_pangu_tpu.train.optim import make_optimizer
    from rec_pangu_tpu.train.steps import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    enc_dict = {f"dense_{i}": {"min": 0.0, "max": 1.0} for i in range(NUM_DENSE)}
    for i in range(NUM_SPARSE):
        enc_dict[f"sparse_{i}"] = {"vocab_size": VOCAB}
    label = (rng.integers(0, 2, (BATCH,)).astype(np.float32) if num_task == 1
             else rng.integers(0, 2, (BATCH, num_task)).astype(np.float32))
    batch = {
        "sparse": rng.integers(0, VOCAB, (BATCH, NUM_SPARSE), dtype=np.int32),
        "dense": rng.random((BATCH, NUM_DENSE), dtype=np.float32),
        "label": label,
    }
    kwargs = {"enc_dict": enc_dict}
    if num_task > 1:
        kwargs["num_task"] = num_task
    else:
        kwargs["embedding_dim"] = DIM
    model = get_model(name)(**kwargs)
    # host-side embedding sort plan: the backward becomes permute-gather +
    # dense MXU tile accumulation instead of XLA's row-serial scatter
    attach_emb_plan(batch, model.spec, model.embedding_dim)
    tx = make_optimizer(1e-3, steps_per_epoch=1)
    state = create_train_state(model, batch, tx, jax.random.PRNGKey(0))
    # fuse the table Adam update into the planned backward kernel — the dense
    # [V, D] embedding gradient never reaches HBM (docs/perf_notes.md §1)
    state, train_step, tables = maybe_enable_fused_update(
        state, model, batch, lr=1e-3, steps_per_epoch=1)
    fused = train_step is not None
    if not fused:
        train_step = make_train_step(state.batch_stats is not None)
    from rec_pangu_tpu.train.steps import make_step_rng

    # NOTE (r5): a K-step lax.scan bench variant measured NET SLOWER for
    # these legs (DeepFM 1.69M -> 1.25M ex/s) — the scan carry forces
    # full-table copy-backs between iterations that single-step dispatch
    # avoids (the same effect the no-donation note on
    # make_fused_update_train_step documents).  Single-step stays.
    dt = _time_steps(train_step, state, batch, make_step_rng(1), steps=steps)
    return BATCH / dt, fused


def bench_sequence(name, steps=20, extra_config=None, steps_per_call=1):
    """Sequence-recall models on the retrieval bench shape.  Returns
    (examples_per_s, fused_engaged).  ``steps_per_call`` > 1 measures the
    trainers' K-step-scan production path — a win only for expensive steps
    (IOCRec: +2%), because the scan carry copies the tables back each
    iteration (see the note in bench_ranking)."""
    import jax

    from rec_pangu_tpu.models import get_model
    from rec_pangu_tpu.ops.embedding import attach_item_plan
    from rec_pangu_tpu.train.fused_update import maybe_enable_seq_fused_update
    from rec_pangu_tpu.train.optim import make_optimizer
    from rec_pangu_tpu.train.steps import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    enc = {"item_id": {"vocab_size": SEQ_V}}
    config = {"embedding_dim": SEQ_D, "max_length": SEQ_L, "K": 4,
              **(extra_config or {})}
    batch = {
        "hist_item_list": rng.integers(1, SEQ_V, (SEQ_B, SEQ_L), dtype=np.int32),
        "hist_mask_list": (rng.random((SEQ_B, SEQ_L)) < 0.9).astype(np.float32),
        "target_item": rng.integers(1, SEQ_V, (SEQ_B,), dtype=np.int32),
    }
    model = get_model(name)(enc_dict=enc, config=config)
    if getattr(model, "session_graph", False):
        # SRGNN family: host-built nodes/alias; the sort plan covers the
        # node lookup (ops/graph.attach_session_graph)
        from rec_pangu_tpu.ops.graph import attach_session_graph

        attach_session_graph(batch)
        attach_item_plan(batch, SEQ_V + 1, SEQ_D, ids_key="graph_nodes")
    elif getattr(model, "host_aug", False):
        # IOCRec-style contrastive models: host-side augmented views make
        # the [3B, L] lookup plannable (and the fused update applicable)
        from rec_pangu_tpu.models.sequence.contrarec import \
            host_augment_sequences

        hist = batch["hist_item_list"]
        aug_rng = np.random.default_rng(7)
        aug1 = host_augment_sequences(aug_rng, hist, 3.0, 3.0, SEQ_V - 1)
        aug2 = host_augment_sequences(aug_rng, hist, 3.0, 3.0, SEQ_V - 1)
        batch["aug_all"] = np.concatenate([hist, aug1, aug2], axis=0)
        attach_item_plan(batch, SEQ_V + 1, SEQ_D, ids_key="aug_all")
    else:
        attach_item_plan(batch, SEQ_V + 1, SEQ_D)
    state = create_train_state(model, batch, make_optimizer(1e-3, 1),
                               jax.random.PRNGKey(0))
    state, train_step, finfo = maybe_enable_seq_fused_update(
        state, model, batch, lr=1e-3, steps_per_epoch=1)
    fused = train_step is not None
    if not fused:
        train_step = make_train_step(state.batch_stats is not None)
    from rec_pangu_tpu.train.steps import make_step_rng

    if fused and steps_per_call > 1:
        from rec_pangu_tpu.train.fused_update import make_seq_fused_multi_step

        K = steps_per_call
        multi = make_seq_fused_multi_step(K, model, finfo, lr=1e-3,
                                          steps_per_epoch=1)
        stacked = jax.tree_util.tree_map(
            lambda x: np.stack([np.asarray(x)] * K), batch)
        dt_k = _time_steps(multi, state, stacked, make_step_rng(1),
                           warmup=2, steps=max(steps // K, 4))
        return SEQ_B * K / dt_k, fused
    # single-step default — see the K-step scan note in bench_ranking
    dt = _time_steps(train_step, state, batch, make_step_rng(1), steps=steps)
    return SEQ_B / dt, fused


def selftest():
    """Run the chip-gated Pallas kernel tests on the real accelerator and
    record the outcome in CHIPTEST.json (the standing round artifact the
    judge asked for: proof the kernel paths pass on hardware, not only in
    interpret mode on CPU)."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["REC_PANGU_TPU_TEST_BACKEND"] = "device"
    tests = ["tests/test_kernels.py", "tests/test_fused_adam.py",
             "tests/test_fused_encoder.py"]
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", *tests, "-q", "--no-header"],
            cwd=repo, env=env, capture_output=True, text=True, timeout=3600)
        passed, rc = proc.returncode == 0, proc.returncode
        lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
        summary = lines[-1] if lines else "(no output)"
        tail = proc.stdout[-4000:]
    except subprocess.TimeoutExpired:
        # a wedged relay must not leave a STALE CHIPTEST.json from a previous
        # round silently standing in for this one
        passed, rc = False, 124
        summary = "timeout: chip tests exceeded 3600s (wedged relay?)"
        tail = summary
    result = {
        "backend": "device",
        "tests": tests,
        "passed": passed,
        "summary": summary,
    }
    with open(os.path.join(repo, "CHIPTEST.json"), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))
    if not passed:
        _log(tail)
        sys.exit(1 if rc != 124 else 124)


PLANS = [
    ("DeepFM", lambda: bench_ranking("DeepFM")),
    ("WDL", lambda: bench_ranking("WDL")),
    ("MMOE", lambda: bench_ranking("MMOE", num_task=2)),
    ("SASRec", lambda: bench_sequence("SASRec")),
    ("GRU4Rec", lambda: bench_sequence("GRU4Rec")),
    ("IOCRec", lambda: bench_sequence("IOCRec", steps=8, steps_per_call=4)),
    ("SRGNN", lambda: bench_sequence("SRGNN")),
]

# Per-leg wall-clock cap for the subprocess watchdog below.  The tunneled
# TPU's relay compiles are bursty and have been observed to WEDGE outright
# (a request that never returns) — one stuck leg must not hang the whole
# driver bench.
LEG_TIMEOUT_S = int(os.environ.get("REC_PANGU_TPU_BENCH_LEG_TIMEOUT", "1500"))


def _bench_env_defaults():
    """Production bench config (see main() for the measured A/Bs):
    bf16 Adam-moment storage + TPU-native RBG step rng."""
    os.environ.setdefault("REC_PANGU_TPU_MOMENT_DTYPE", "bf16")
    os.environ.setdefault("REC_PANGU_TPU_RNG_IMPL", "rbg")


def run_one(name: str):
    """--one NAME: run a single suite leg in this process and print one JSON
    line {name, eps, fused} (the watchdog parent parses it)."""
    _bench_env_defaults()
    from rec_pangu_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    fn = dict(PLANS)[name]
    eps, fused = fn()
    print(json.dumps({"name": name, "eps": eps, "fused": fused}), flush=True)


class LegTimeout(RuntimeError):
    """A bench leg's subprocess hit the watchdog timeout — an environmental
    relay wedge, classified by TYPE (not by substring-matching str(e))."""


def _run_leg_watchdogged(name: str):
    """Run one leg in a subprocess with a timeout; returns (eps, fused) or
    raises LegTimeout/RuntimeError with the failure description."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True, text=True, timeout=LEG_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        raise LegTimeout(f"timed out after {LEG_TIMEOUT_S}s (wedged relay?)")
    if proc.stderr:
        for line in proc.stderr.strip().splitlines():
            if "WARNING" not in line:
                _log(f"[bench:{name}] {line}")
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(f"subprocess failed rc={proc.returncode}")
    out = json.loads(lines[-1])
    return float(out["eps"]), bool(out["fused"])


def main():
    if "--selftest" in sys.argv:
        return selftest()
    if "--one" in sys.argv:
        return run_one(sys.argv[sys.argv.index("--one") + 1])
    # Production bench config: store the fused tables' Adam moments in bf16
    # (REC_PANGU_TPU_MOMENT_DTYPE) — the fused Adam pass is HBM-roofline-
    # bound and this removes a third of its traffic.  Measured A/B at these
    # shapes (scripts/exp_moment_dtype.py): DeepFM 1.557M -> 1.673M ex/s,
    # WDL +6%, GRU4Rec +4%; quality parity: tests/test_fused_adam.py (3-step
    # drift bound) + scripts/exp_moment_quality.py (planted-task held-out
    # AUC 0.6315 vs 0.6316 f32).  Export REC_PANGU_TPU_MOMENT_DTYPE=f32 to
    # bench the default.  RNG_IMPL=rbg likewise (r04: scripts/exp_iocrec_local.py).
    _bench_env_defaults()

    suite = {}
    failures = []
    timeouts = []  # environmental (wedged relay) — reported, not failing
    n_timed_out = 0

    for name, fn in PLANS:
        if n_timed_out >= 2:
            # circuit breaker: two wedged legs means the relay is down, not
            # the models — don't burn LEG_TIMEOUT_S x the remaining legs
            timeouts.append(f"{name} (skipped, relay wedged)")
            _log(f"[bench] {name} skipped (relay wedged)")
            continue
        t0 = time.perf_counter()
        try:
            if os.environ.get("REC_PANGU_TPU_BENCH_INPROC"):
                from rec_pangu_tpu.utils import enable_compilation_cache

                enable_compilation_cache()
                eps, fused = fn()
            else:
                eps, fused = _run_leg_watchdogged(name)
        except LegTimeout as e:
            # a leg that never returns is the RELAY wedging (observed: the
            # same cached program runs in 30 s or hangs 90+ min in
            # back-to-back sessions) — report it, but don't turn an
            # environment outage into a perf-regression failure
            _log(f"[bench] {name} FAILED: {e}")
            timeouts.append(name)
            n_timed_out += 1
            continue
        except Exception as e:  # record, keep benching the rest
            _log(f"[bench] {name} FAILED: {type(e).__name__}: {e}")
            failures.append(f"{name}: crashed: {e}")
            continue
        suite[name] = round(eps, 1)
        _log(f"[bench] {name}: {eps:,.0f} ex/s/chip (fused={fused}, "
             f"{time.perf_counter() - t0:.0f}s incl. compile)")
        if name in MUST_FUSE and not fused:
            failures.append(f"{name}: fused table-Adam path did not engage")
        exp = EXPECTED.get(name)
        if exp and eps < exp * (1 - REGRESSION_TOLERANCE):
            failures.append(
                f"{name}: {eps:,.0f} ex/s is >{REGRESSION_TOLERANCE:.0%} "
                f"below the recorded {exp:,.0f}")

    if os.environ.get("REC_PANGU_TPU_BENCH_NO_GUARD"):
        # different hardware: the EXPECTED floors don't apply — report only
        _log(f"[bench] guard disabled; would-be failures: {failures}")
        failures = []
    headline = suite.get("DeepFM", 0.0)
    print(json.dumps({
        "metric": "deepfm_train_examples_per_s_per_chip",
        "value": round(headline, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(headline / BASELINE_EXAMPLES_PER_S, 2),
        "suite": suite,
        "regressions": failures,
        "relay_timeouts": timeouts,
    }))
    if failures:
        sys.exit(1)
    if not suite or "DeepFM" not in suite:
        # a fully-wedged run (every leg timed out) must not read as passing:
        # exit with a DISTINCT code so consumers keying on rc see no-data
        _log("[bench] no usable legs (headline missing) — exiting 75")
        sys.exit(75)  # EX_TEMPFAIL: environmental, retryable


if __name__ == "__main__":
    main()
