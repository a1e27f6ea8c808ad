"""Multi-task benchmark sweep — mirrors
/root/reference/examples/multi_task/run_multi_task_benchmark_example.py."""
import sys

sys.path.append("../../")
import pandas as pd

from rec_pangu_tpu.data import get_dataloader
from rec_pangu_tpu.train.benchmark import BenchmarkTrainer
import os

_HERE = os.path.dirname(os.path.abspath(__file__))

if __name__ == "__main__":
    df = pd.read_csv(
        os.path.join(_HERE, "sample_data", "multi_task_sample_data.csv")
    )
    schema = {
        "sparse_cols": ["user_id", "item_id", "item_type", "dayofweek", "is_workday",
                        "city", "county", "town", "village", "lbs_city", "lbs_district",
                        "hardware_platform", "hardware_ischarging", "os_type",
                        "network_type", "position"],
        "dense_cols": ["item_expo_1d", "item_expo_7d", "item_expo_14d", "item_expo_30d",
                       "item_clk_1d", "item_clk_7d", "item_clk_14d", "item_clk_30d",
                       "use_duration"],
        "label_col": ["click", "scroll"],
        "task_type": "multitask",
    }
    train_loader, valid_loader, test_loader, enc_dict = get_dataloader(
        df, df, df, schema, batch_size=512
    )
    model_list = ["MMOE", "AITM", "ShareBottom", "ESSM", "OMOE", "MLMMOE"]
    benchmark = BenchmarkTrainer(
        model_list=model_list,
        num_task=2,
        model_ckpt_dir="./multi_task_benchmark_ckpt",
        benchmark_res_path="./multi_task_benchmark_res.csv",
    )
    # every multi-task model defaults to num_task=2 (ESSM/AITM are fixed 2-task)
    results = benchmark.run(
        train_loader, valid_loader, test_loader, enc_dict, epoch=3, lr=1e-3,
    )
    print(results)
