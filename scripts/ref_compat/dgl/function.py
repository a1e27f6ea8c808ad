"""dgl.function stand-in: descriptor objects consumed by DGLGraph.update_all
(see package __init__).  Only the two builders the reference uses
(rec_pangu/models/layers/graph.py:138-139)."""


class _Builtin:
    def __init__(self, kind, **fields):
        self.kind = kind
        for k, v in fields.items():
            setattr(self, k, v)


def u_mul_e(src_field, edge_field, out_field):
    return _Builtin("u_mul_e", src_field=src_field, edge_field=edge_field,
                    out_field=out_field)


def sum(msg, out):  # noqa: A001 - dgl's own name
    return _Builtin("sum", msg_field=msg, out_field=out)
