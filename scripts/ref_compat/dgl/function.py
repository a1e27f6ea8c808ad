"""dgl.function stand-in (import-only; see package docstring)."""


def _unavailable(*args, **kw):
    raise RuntimeError("dgl shim: message passing unavailable in-image.")


u_mul_e = _unavailable
copy_u = _unavailable
sum = _unavailable
e_mul_u = _unavailable
u_mul_v = _unavailable
