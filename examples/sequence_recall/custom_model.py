"""Extension-point example — mirrors
/root/reference/examples/sequence_recall/custom_model.py: users subclass
SequenceModelBase, get item embeddings / full-softmax loss / registry for free."""
import sys

sys.path.append("../../")
import jax.numpy as jnp

from rec_pangu_tpu.models import SequenceModelBase, register_model
from rec_pangu_tpu.ops.mlp import MLP
import os

_HERE = os.path.dirname(os.path.abspath(__file__))


@register_model("CustomModel")
class CustomModel(SequenceModelBase):
    """Masked-mean pooling + a small MLP head."""

    def setup(self):
        self.setup_base()
        self.head = MLP(hidden_units=(self.embedding_dim,),
                        output_dim=self.embedding_dim, dropout_rates=0.0)

    def __call__(self, batch, train: bool = True):
        seq_emb = self.item_emb(batch["hist_item_list"])
        mask = batch["hist_mask_list"][..., None]
        pooled = jnp.sum(seq_emb * mask, axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)
        user_emb = self.head(pooled, train)
        out = {"user_emb": user_emb}
        if train:
            out["loss"] = self.calculate_loss(user_emb, batch["target_item"])
        return out


if __name__ == "__main__":
    import pandas as pd

    from rec_pangu_tpu.data import get_dataloader
    from rec_pangu_tpu.train import SequenceTrainer

    schema = {"user_col": "user_id", "item_col": "item_id", "cate_cols": ["genre"],
              "max_length": 20, "time_col": "timestamp", "task_type": "sequence"}
    config = {"embedding_dim": 64, "K": 4, "device": -1, **schema}
    data_dir = os.path.join(_HERE, "sample_data")
    loaders = get_dataloader(pd.read_csv(f"{data_dir}/sample_train.csv"),
                             pd.read_csv(f"{data_dir}/sample_valid.csv"),
                             pd.read_csv(f"{data_dir}/sample_test.csv"),
                             schema, batch_size=256)
    train_loader, valid_loader, test_loader, enc_dict = loaders
    model = CustomModel(enc_dict=enc_dict, config=config)
    trainer = SequenceTrainer(model_ckpt_dir="./model_ckpt_custom")
    trainer.fit(model, train_loader, valid_loader, epoch=2, lr=1e-3, log_rounds=10)
    print("Test metric:", trainer.evaluate_model(model, test_loader))
