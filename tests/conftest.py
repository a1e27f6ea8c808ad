"""Test configuration: force an 8-device CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4)."""
import os

# REC_PANGU_TPU_TEST_BACKEND=device runs the suite on the real accelerator
# (exercises the TPU-gated pallas-kernel tests); default pins to CPU.
_use_device = os.environ.get("REC_PANGU_TPU_TEST_BACKEND", "cpu") == "device"

if not _use_device:
    os.environ["JAX_PLATFORMS"] = "cpu"  # override the env's axon default
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start, which routes every compile through the remote TPU relay (~10s per
# jit).  Re-pin to cpu before any backend initializes.
import jax  # noqa: E402

if not _use_device:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_RANKING_CSV = os.path.join(_REPO, "examples/ranking/sample_data/ranking_sample_data.csv")
REF_MULTITASK_CSV = os.path.join(_REPO, "examples/multi_task/sample_data/multi_task_sample_data.csv")
REF_SEQ_DIR = os.path.join(_REPO, "examples/sequence_recall/sample_data")

RANKING_SCHEMA = {
    "sparse_cols": ["user_id", "item_id", "item_type", "dayofweek", "is_workday", "city",
                    "county", "town", "village", "lbs_city", "lbs_district",
                    "hardware_platform", "hardware_ischarging", "os_type", "network_type",
                    "position"],
    "dense_cols": ["item_expo_1d", "item_expo_7d", "item_expo_14d", "item_expo_30d",
                   "item_clk_1d", "item_clk_7d", "item_clk_14d", "item_clk_30d",
                   "use_duration"],
    "label_col": "click",
    "task_type": "ranking",
}

MULTITASK_SCHEMA = {**RANKING_SCHEMA, "label_col": ["click", "scroll"], "task_type": "multitask"}

SEQ_SCHEMA = {
    "user_col": "user_id",
    "item_col": "item_id",
    "cate_cols": ["genre"],
    "time_col": "timestamp",
    "max_length": 20,
    "task_type": "sequence",
    "embedding_dim": 32,
    "device": -1,
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tests (multi-process bring-up etc.)")


@pytest.fixture(scope="session")
def ranking_df():
    return pd.read_csv(REF_RANKING_CSV)


@pytest.fixture(scope="session")
def multitask_df():
    return pd.read_csv(REF_MULTITASK_CSV)


@pytest.fixture(scope="session")
def seq_dfs():
    train = pd.read_csv(f"{REF_SEQ_DIR}/sample_train.csv")
    valid = pd.read_csv(f"{REF_SEQ_DIR}/sample_valid.csv")
    test = pd.read_csv(f"{REF_SEQ_DIR}/sample_test.csv")
    return train, valid, test


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
