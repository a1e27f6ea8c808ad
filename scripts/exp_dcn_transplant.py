"""Transplant test for the DCN ratings-leg gap (dev script): initialize the
reference (torch) and repo (jax) DCN with IDENTICAL weights, feed the same
encoded batch, and compare forward pred, loss, and per-parameter grads, then
run N identical full-batch Adam steps on both and compare the loss curves.
Pins whether the measured 0.021 AUC gap is semantic (diverging math) or
environmental (data order / seed noise)."""
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "ref_compat"))
sys.path.insert(0, "/root/reference")

import torch

from parity_common import RATINGS_SCHEMA, load_ratings_ctr

rat_train, rat_valid, rat_test = load_ratings_ctr()

# ---- repo side: loaders + model ------------------------------------------
from rec_pangu_tpu.data import get_dataloader
from rec_pangu_tpu.models import get_model
from rec_pangu_tpu.utils import seed_everything

train_loader, _, _, enc_dict = get_dataloader(
    rat_train, rat_valid, rat_test, RATINGS_SCHEMA, batch_size=512)
seed_everything(1029)
model = get_model("DCN")(enc_dict=enc_dict)

import jax
import jax.numpy as jnp

batch = next(iter(train_loader))
variables = model.init({"params": jax.random.PRNGKey(0)}, batch, True)
params = variables["params"]
print("repo param tree:",
      jax.tree_util.tree_map(lambda x: x.shape, params), flush=True)

# ---- reference side ------------------------------------------------------
from rec_pangu.dataset import get_dataloader as ref_get_dataloader
from rec_pangu.models.ranking import DCN as RefDCN
from rec_pangu.models.utils import seed_everything as ref_seed

_, _, _, ref_enc = ref_get_dataloader(rat_train, rat_valid, rat_test,
                                      RATINGS_SCHEMA, batch_size=512)
ref_seed(1029)
ref_model = RefDCN(enc_dict=ref_enc)
print("ref params:", [(n, tuple(p.shape))
                      for n, p in ref_model.named_parameters()], flush=True)

# ---- transplant: torch -> jax -------------------------------------------
sd = {n: p.detach().numpy() for n, p in ref_model.named_parameters()}
spec = model.spec
new = jax.tree_util.tree_map(np.asarray, params)


def put(d, path, val):
    ks = path.split("/")
    cur = d
    for k in ks[:-1]:
        cur = cur[k]
    assert cur[ks[-1]].shape == val.shape, (path, cur[ks[-1]].shape, val.shape)
    cur[ks[-1]] = val.astype(np.float32)


new = jax.tree_util.tree_map(lambda x: np.array(x), params)
# embedding: per-feature tables -> fused rows at spec offsets
table = np.array(new["FusedEmbedding_0"]["table"])
for i, name in enumerate(spec.sparse_names):
    w = sd[f"embedding_layer.embedding_layer.{name}.weight"]
    off = int(spec.offsets[i])
    table[off:off + w.shape[0]] = w
new["FusedEmbedding_0"]["table"] = table
for i in range(3):
    put(new, f"CrossNet_0/w_{i}", sd[f"crossnet.cross_net.{i}.weight.weight"].T)
    put(new, f"CrossNet_0/b_{i}", sd[f"crossnet.cross_net.{i}.bias"])
put(new, "Dense_0/kernel", sd["fc.weight"].T)
put(new, "Dense_0/bias", sd["fc.bias"])
new = jax.tree_util.tree_map(jnp.asarray, new)

# ---- identical batch through both ----------------------------------------
# repo batch -> reference per-feature dict
ref_batch = {}
for i, name in enumerate(spec.sparse_names):
    ref_batch[name] = torch.tensor(np.asarray(batch["sparse"][:, i]),
                                   dtype=torch.long)
for i, name in enumerate(spec.dense_names):
    ref_batch[name] = torch.tensor(np.asarray(batch["dense"][:, i]),
                                   dtype=torch.float32)
ref_batch["label"] = torch.tensor(np.asarray(batch["label"]),
                                  dtype=torch.float32)

out_ref = ref_model(ref_batch, is_training=True)
pred_ref = out_ref["pred"].detach().numpy().reshape(-1)

out_jax = model.apply({"params": new}, batch, True)
pred_jax = np.asarray(out_jax["pred"]).reshape(-1)
print("pred max|delta|:", np.abs(pred_ref - pred_jax).max(), flush=True)
print("loss ref/jax:", float(out_ref["loss"]), float(out_jax["loss"]), flush=True)

# ---- grads ---------------------------------------------------------------
out_ref["loss"].backward()
ref_grads = {n: p.grad.detach().numpy() for n, p in ref_model.named_parameters()}

g = jax.grad(lambda p: model.apply({"params": p}, batch, True)["loss"])(new)
gt = np.asarray(g["FusedEmbedding_0"]["table"])
for i, name in enumerate(spec.sparse_names):
    gr = ref_grads[f"embedding_layer.embedding_layer.{name}.weight"]
    off = int(spec.offsets[i])
    d = np.abs(gt[off:off + gr.shape[0]] - gr).max()
    print(f"grad emb[{name}] max|delta|: {d:.3e}  (|g|max {np.abs(gr).max():.3e})")
for i in range(3):
    d = np.abs(np.asarray(g["CrossNet_0"][f"w_{i}"])
               - ref_grads[f"crossnet.cross_net.{i}.weight.weight"].T).max()
    print(f"grad w_{i} max|delta|: {d:.3e}")
d = np.abs(np.asarray(g["Dense_0"]["kernel"]) - ref_grads["fc.weight"].T).max()
print(f"grad fc max|delta|: {d:.3e}")

# ---- N identical Adam steps on the same batch ----------------------------
import optax

tx = optax.adam(1e-3)
opt_state = tx.init(new)
p_j = new
opt_t = torch.optim.Adam(ref_model.parameters(), lr=1e-3)
for step in range(30):
    out_t = ref_model(ref_batch, True)
    opt_t.zero_grad(); out_t["loss"].backward(); opt_t.step()
    l, gr = jax.value_and_grad(
        lambda p: model.apply({"params": p}, batch, True)["loss"])(p_j)
    up, opt_state = tx.update(gr, opt_state, p_j)
    p_j = optax.apply_updates(p_j, up)
    if step % 5 == 0 or step == 29:
        print(f"step {step}: loss ref {float(out_t['loss']):.6f} "
              f"jax {float(l):.6f}", flush=True)
