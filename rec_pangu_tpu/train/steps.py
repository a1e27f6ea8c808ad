"""Jitted train/eval steps — the engine.

Replaces the reference's per-batch Python loop with host->device copies,
``loss.backward()``, per-batch sklearn AUC and device->host syncs
(rec_pangu/model_pipeline.py:47-77) with ONE compiled XLA program per step:
forward + backward + Adam update fused, donated state, metrics fetched lazily
at epoch end.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax


def make_param_renorm(paths):
    """Jitted rowwise L2 projection of the given param-tree paths (zero rows
    stay zero, matching torch F.normalize).  Used by trainers for models
    declaring ``renorm_param_paths`` — the functional equivalent of the
    reference's in-place ``weight.copy_(F.normalize(weight))`` at the top of
    each forward (e.g. CMI, rec_pangu/models/sequence/cmi.py:62-69)."""
    from flax import traverse_util

    path_set = {tuple(p) for p in paths}

    @jax.jit
    def renorm(params):
        flat = traverse_util.flatten_dict(params)
        for p in path_set:
            w = flat[p]
            n = jnp.linalg.norm(w, axis=-1, keepdims=True)
            flat[p] = w / jnp.maximum(n, 1e-12)
        return traverse_util.unflatten_dict(flat)

    return renorm


def make_step_rng(seed: int) -> jax.Array:
    """Per-step dropout/routing rng root.  REC_PANGU_TPU_RNG_IMPL=rbg swaps
    the threefry generator for the TPU-native RBG: same distribution,
    different stream, and the in-step random-bit generation (dropout masks,
    augmentations) drops off the critical path — measured -6 ms on the
    IOCRec [3B] encoder (scripts/exp_iocrec_local.py: threefry 32.2 ms vs
    rbg 26.5 ms fwd+bwd).  Param INIT keys stay threefry regardless, so
    initial weights are bit-identical across the flag."""
    import os

    impl = os.environ.get("REC_PANGU_TPU_RNG_IMPL", "")
    if impl:
        return jax.random.key(seed, impl=impl)
    return jax.random.PRNGKey(seed)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any  # None when the model has no BatchNorm
    opt_state: Any
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)


def create_train_state(
    model,
    sample_batch: Dict[str, Any],
    tx: optax.GradientTransformation,
    rng: jax.Array,
    train: bool = True,
) -> TrainState:
    init_rng, dropout_rng, routing_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": init_rng, "dropout": dropout_rng, "routing": routing_rng},
        sample_batch, train,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", None)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


def _train_step_fn(has_batch_stats: bool):
    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        # 'routing' feeds MIND's per-step gaussian routing-logit init
        rngs = {"dropout": step_rng, "routing": jax.random.fold_in(step_rng, 1)}

        def loss_fn(params):
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                out, mutated = state.apply_fn(
                    variables, batch, True,
                    rngs=rngs, mutable=["batch_stats"],
                )
                return out["loss"], (out, mutated.get("batch_stats"))
            out = state.apply_fn(variables, batch, True, rngs=rngs)
            return out["loss"], (out, None)

        grads, (out, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs if has_batch_stats else None,
            opt_state=new_opt_state,
        )
        return new_state, out

    return train_step


def make_train_step(has_batch_stats: bool):
    """Build a jitted (state, batch, rng) -> (state, out) step."""
    return jax.jit(_train_step_fn(has_batch_stats), donate_argnums=(0,))


def make_multi_step(has_batch_stats: bool, num_steps: int):
    """Fused K-step trainer: one dispatch runs ``num_steps`` optimizer steps
    via lax.scan over a stacked batch pytree (leading axis K).  Keeps the TPU
    busy without per-step host round-trips; returns per-step losses and the
    last step's outputs."""
    single = _train_step_fn(has_batch_stats)

    def multi_step(state: TrainState, stacked_batches, rng):
        def body(st, batch):
            st, out = single(st, batch, rng)
            return st, out

        state, outs = jax.lax.scan(body, state, stacked_batches)
        return state, outs

    return jax.jit(multi_step, donate_argnums=(0,))


def make_eval_step(has_batch_stats: bool):
    def eval_step(state: TrainState, batch):
        variables = {"params": state.params}
        if has_batch_stats:
            variables["batch_stats"] = state.batch_stats
        return state.apply_fn(variables, batch, False)

    return jax.jit(eval_step)


def strip_host_keys(batch: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Split off host-only entries (e.g. the 'user' id strings) before jit."""
    device_batch = {k: v for k, v in batch.items() if v.dtype != object}
    host = {k: v for k, v in batch.items() if v.dtype == object}
    return device_batch, host
