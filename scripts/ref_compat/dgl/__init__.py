"""Minimal functional dgl stand-in for the exact surface the reference's
session-graph path touches (rec_pangu/models/utils.py:250-260 builds the
graphs; rec_pangu/models/layers/graph.py:134-140 runs
``update_all(fn.u_mul_e('h','edge_weight','m'), fn.sum('m','h'))``).

Implemented with plain torch index_add — numerically identical message
passing (h_dst = sum_{edges (s,d)} h_s * w_e), so the in-image reference
SRGNN/GCSAN/NISER parity legs measure the real model.  ``out_degrees`` /
``in_degrees`` are bincounts over inferred node ids; ``ndata`` assignment
accepts the caller's [N, D] tensor as the node count (dgl infers N from the
max edge id, which equals the session-graph total by construction).
"""
import torch


class _TensorDict(dict):
    pass


class DGLGraph:
    def __init__(self, src, dst=None):
        if dst is None:  # DGLGraph((src, dst)) form (graph_dataset.py:32)
            src, dst = src
        self.src = src.long().reshape(-1)
        self.dst = dst.long().reshape(-1)
        n = 0
        if self.src.numel():
            n = int(torch.maximum(self.src.max(), self.dst.max())) + 1
        self._num_nodes = n
        self.ndata = _TensorDict()
        self.edata = _TensorDict()

    def num_nodes(self):
        return self._num_nodes

    def out_degrees(self):
        return torch.bincount(self.src, minlength=self._num_nodes)

    def in_degrees(self):
        return torch.bincount(self.dst, minlength=self._num_nodes)

    def to(self, device):
        self.src = self.src.to(device)
        self.dst = self.dst.to(device)
        for d in (self.ndata, self.edata):
            for k in d:
                d[k] = d[k].to(device)
        return self

    def update_all(self, message_func, reduce_func):
        if getattr(reduce_func, "kind", None) != "sum":
            raise NotImplementedError(
                "dgl shim: only sum reduction (the reference surface)")
        if getattr(message_func, "kind", None) == "u_mul_e":
            h = self.ndata[message_func.src_field]
            w = self.edata[message_func.edge_field]
            msg = h[self.src] * w  # [E, D] * [E, 1]
            out_field = reduce_func.out_field
            out = torch.zeros_like(h)
        elif callable(message_func):
            # NGCFLayer's custom message_fun (layers/graph.py:107-110):
            # gets an EdgeBatch view exposing edges.src[field]/edges.dst[field]
            edges = _EdgeBatch(self)
            msg = message_func(edges)[reduce_func.msg_field]
            out_field = reduce_func.out_field
            # size the output to the caller's node features ('h'), not the
            # edge-inferred node count — isolated tail nodes may extend past
            # the max edge id
            n = max(self._num_nodes, self.ndata["h"].shape[0]) \
                if "h" in self.ndata else self._num_nodes
            out = torch.zeros((n, msg.shape[1]),
                              dtype=msg.dtype, device=msg.device)
        else:
            raise NotImplementedError(
                "dgl shim: unsupported message function")
        out.index_add_(0, self.dst, msg)
        self.ndata[out_field] = out


class _EdgeBatch:
    """edges.src['h'] / edges.dst['h'] views for custom message functions."""

    class _View:
        def __init__(self, ndata, idx):
            self._ndata, self._idx = ndata, idx

        def __getitem__(self, field):
            return self._ndata[field][self._idx]

    def __init__(self, g):
        self.src = _EdgeBatch._View(g.ndata, g.src)
        self.dst = _EdgeBatch._View(g.ndata, g.dst)


def graph(edges, num_nodes=None):
    src, dst = edges
    g = DGLGraph(src, dst)
    if num_nodes is not None:
        g._num_nodes = int(num_nodes)
    return g


def batch(graphs):
    raise NotImplementedError("dgl shim: dgl.batch is not used by the reference")
