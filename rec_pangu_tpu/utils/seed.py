"""Deterministic seeding for host-side RNG.

Parity target: rec_pangu/models/utils.py:16-27 (seed_everything), minus the
torch/cuda-specific lines.  On the JAX side determinism comes from explicit
`jax.random.PRNGKey` threading, so this only needs to cover host numpy/python
randomness used by the data pipeline.
"""
import os
import random

import numpy as np


def seed_everything(seed: int = 1029) -> None:
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
