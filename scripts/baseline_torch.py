"""Reference-style baseline: DeepFM in plain PyTorch on CPU, same config as
bench.py, measuring train-step examples/s.

The reference framework itself cannot be imported here (its deps faiss/dgl/
wandb/loguru are not in the image), so this reproduces its DeepFM compute
graph (rec_pangu/models/ranking/deepfm.py:41-66: per-feature embedding lookups,
FM product_sum_pooling, [64,64,64] MLP, BCE) with torch defaults (Adam 1e-3)
on the same synthetic data as bench.py.  Run once; the resulting number is
frozen into bench.py as BASELINE_EXAMPLES_PER_S.
"""
import time

import numpy as np
import torch
from torch import nn

BATCH = 8192
NUM_SPARSE = 16
NUM_DENSE = 9
VOCAB = 100_000
DIM = 32
HIDDEN = [64, 64, 64]
STEPS = 30
WARMUP = 5


class TorchDeepFM(nn.Module):
    def __init__(self):
        super().__init__()
        self.embs = nn.ModuleList(
            [nn.Embedding(VOCAB + 1, DIM) for _ in range(NUM_SPARSE)]
        )
        layers = []
        in_dim = NUM_SPARSE * DIM + NUM_DENSE
        for h in HIDDEN:
            layers += [nn.Linear(in_dim, h), nn.ReLU()]
            in_dim = h
        layers += [nn.Linear(in_dim, 1)]
        self.mlp = nn.Sequential(*layers)
        self.loss_fn = nn.BCELoss()

    def forward(self, sparse, dense, label):
        emb = torch.stack([e(sparse[:, i]) for i, e in enumerate(self.embs)], dim=1)
        sum_sq = emb.sum(dim=1) ** 2
        sq_sum = (emb**2).sum(dim=1)
        fm = ((sum_sq - sq_sum) * 0.5).sum(dim=-1, keepdim=True)
        dnn_in = torch.cat([emb.flatten(1), dense], dim=1)
        logit = fm + self.mlp(dnn_in)
        pred = torch.sigmoid(logit)
        return self.loss_fn(pred.squeeze(-1), label)


def main():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    sparse = torch.from_numpy(rng.integers(0, VOCAB, (BATCH, NUM_SPARSE)).astype(np.int64))
    dense = torch.from_numpy(rng.random((BATCH, NUM_DENSE), dtype=np.float32))
    label = torch.from_numpy(rng.integers(0, 2, (BATCH,)).astype(np.float32))

    model = TorchDeepFM()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    for _ in range(WARMUP):
        loss = model(sparse, dense, label)
        loss.backward()
        opt.step()
        model.zero_grad()

    start = time.perf_counter()
    for _ in range(STEPS):
        loss = model(sparse, dense, label)
        loss.backward()
        opt.step()
        model.zero_grad()
    elapsed = time.perf_counter() - start
    eps = BATCH * STEPS / elapsed
    print(f"torch-cpu DeepFM: {eps:,.0f} examples/s  ({elapsed/STEPS*1000:.1f} ms/step)")


if __name__ == "__main__":
    main()
