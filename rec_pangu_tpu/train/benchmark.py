"""BenchmarkTrainer — sweep runner.

Parity: rec_pangu/benchmark_trainer.py:18-95 — iterate model NAMES, train each
with RankTrainer on the same loaders, record wall-clock train/test times and
valid/test metrics into a CSV.  Dispatch goes through the model registry
instead of ``eval(model_name)`` (benchmark_trainer.py:66).
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import pandas as pd

from ..models import get_model
from ..utils.logging import logger
from .trainer import RankTrainer


class BenchmarkTrainer:
    def __init__(self, model_list: List[str], num_task: int = 1,
                 model_ckpt_dir: str = "./benchmark_ckpt",
                 benchmark_res_path: str = "./benchmark_res.csv"):
        self.model_list = model_list
        self.num_task = num_task
        self.model_ckpt_dir = model_ckpt_dir
        self.benchmark_res_path = benchmark_res_path

    def run(self, train_loader, valid_loader, test_loader, enc_dict: dict,
            epoch: int = 10, lr: float = 1e-3, device=None,
            model_kwargs: Optional[Dict[str, dict]] = None,
            mesh=None) -> pd.DataFrame:
        rows = []
        model_kwargs = model_kwargs or {}
        for model_name in self.model_list:
            logger.info(f"Benchmark: training {model_name}")
            model_cls = get_model(model_name)
            model = model_cls(enc_dict=enc_dict, **model_kwargs.get(model_name, {}))
            trainer = RankTrainer(
                num_task=self.num_task,
                model_ckpt_dir=os.path.join(self.model_ckpt_dir, model_name))
            t0 = time.time()
            trainer.fit(model, train_loader, valid_loader, epoch=epoch, lr=lr,
                        mesh=mesh)
            train_s = time.time() - t0
            train_ms = round(train_s * 1000, 1)
            n_examples = epoch * sum(
                len(b["label"]) for b in train_loader)
            valid_metric = trainer.evaluate_model(model, valid_loader)
            t0 = time.time()
            test_metric = trainer.evaluate_model(model, test_loader)
            test_ms = round((time.time() - t0) * 1000, 1)
            row = {"model_name": model_name,
                   "train_model_time(ms)": train_ms,
                   "test_model_time(ms)": test_ms,
                   # north-star throughput counter (wall-clock incl. compile)
                   "examples_per_s": round(n_examples / max(train_s, 1e-9), 1)}
            row.update({f"valid_{k}": v for k, v in valid_metric.items()})
            row.update({f"test_{k}": v for k, v in test_metric.items()})
            rows.append(row)
            pd.DataFrame(rows).to_csv(self.benchmark_res_path, index=False)
            logger.info(f"Benchmark row: {row}")
        return pd.DataFrame(rows)
