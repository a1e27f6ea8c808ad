"""Model export for serving.

Parity target: rec_pangu/serving/ranking_server.py:35-61 (export2tf — torch ->
ONNX -> TensorFlow SavedModel for TF-Serving).  TPU-native path:

* export2tf: jax2tf-convert the jitted scorer and write a TF SavedModel with
  dynamic batch dims under ``{serving_dir}/{version}`` — directly loadable by
  TF-Serving, no ONNX hop.
* export_stablehlo: portable jax.export serialization (StableHLO bytes) for
  non-TF runtimes.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..utils.logging import logger
from .scorer import construct_dummy_data, make_ranking_scorer


def export2tf(model, variables, enc_dict: dict, serving_dir: str,
              version: int = 1) -> str:
    import tensorflow as tf
    from jax.experimental import jax2tf

    # plan attachment is a host-side step; the exported graph must stay pure
    score = make_ranking_scorer(model, variables, attach_plan=False)
    dummy = construct_dummy_data(enc_dict)
    f, d = dummy["sparse"].shape[1], dummy["dense"].shape[1]
    # only the batch dim is polymorphic; feature counts are baked into the model
    tf_fn = jax2tf.convert(
        lambda b: score(b),
        polymorphic_shapes=[{"sparse": f"(b, {f})", "dense": f"(b, {d})"}])

    module = tf.Module()
    module.f = tf.function(
        tf_fn,
        autograph=False,
        input_signature=[{
            "sparse": tf.TensorSpec([None, dummy["sparse"].shape[1]], tf.int32,
                                    name="sparse"),
            "dense": tf.TensorSpec([None, dummy["dense"].shape[1]], tf.float32,
                                   name="dense"),
        }],
    )
    path = os.path.join(serving_dir, str(version))
    tf.saved_model.save(module, path,
                        signatures=module.f.get_concrete_function())
    logger.info(f"SavedModel exported to {path}")
    return path


def export_stablehlo(model, variables, enc_dict: dict, path: str) -> str:
    import jax
    from jax import export as jax_export

    score = make_ranking_scorer(model, variables, attach_plan=False)
    dummy = construct_dummy_data(enc_dict)
    exported = jax_export.export(jax.jit(score))(
        {k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in dummy.items()})
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    logger.info(f"StableHLO export written to {path} ({len(blob)} bytes)")
    return path
