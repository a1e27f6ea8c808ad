"""NumPy stand-in for the single faiss surface the reference uses:
`faiss.IndexFlatIP(d)` + `.add(vectors)` + `.search(queries, k)`
(rec_pangu/utils/evaluate.py:36-37,63,75; model_pipeline.py:352-360).

Exact brute-force inner-product top-k, scores sorted descending — the same
contract as faiss's IndexFlatIP, so reference eval metrics are unchanged.
"""
import numpy as np


class IndexFlatIP:
    def __init__(self, d: int):
        self.d = int(d)
        self._chunks = []

    @property
    def ntotal(self) -> int:
        return sum(c.shape[0] for c in self._chunks)

    def add(self, x):
        x = np.ascontiguousarray(np.asarray(x, dtype=np.float32))
        assert x.ndim == 2 and x.shape[1] == self.d
        self._chunks.append(x)

    def search(self, q, k: int):
        base = np.concatenate(self._chunks, axis=0)
        q = np.asarray(q, dtype=np.float32)
        scores = q @ base.T                      # [Q, N]
        k = min(int(k), base.shape[0])
        idx = np.argpartition(-scores, kth=k - 1, axis=1)[:, :k]
        part = np.take_along_axis(scores, idx, axis=1)
        order = np.argsort(-part, axis=1, kind="stable")
        indices = np.take_along_axis(idx, order, axis=1).astype(np.int64)
        dists = np.take_along_axis(part, order, axis=1)
        return dists, indices
