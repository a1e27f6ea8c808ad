"""Layer-library unit tests against NumPy oracles (SURVEY.md §4): the kernel
math of FM / CrossNet / CIN / SENET / bilinear / capsule routing / k-max."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rec_pangu_tpu.ops.field_graph import FiGNNLayer
from rec_pangu_tpu.ops.interactions import (
    BilinearInteraction,
    CompressedInteractionNet,
    CrossNet,
    SENETLayer,
    inner_product,
)
from rec_pangu_tpu.ops.pooling import kmax_pooling

B, F, D = 4, 5, 8


@pytest.fixture(scope="module")
def emb(rng):
    return jnp.asarray(rng.standard_normal((B, F, D)), jnp.float32)


def test_inner_product_oracle(emb):
    x = np.asarray(emb)
    # product_sum_pooling = 0.5 * ((sum_f x)^2 - sum_f x^2) summed over D
    expected = 0.5 * ((x.sum(1) ** 2 - (x**2).sum(1))).sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(inner_product(emb, "product_sum_pooling")),
                               expected, rtol=1e-5)
    # inner_product mode = all pairwise dots, upper triangle order
    pairs = []
    for i in range(F):
        for j in range(i + 1, F):
            pairs.append((x[:, i] * x[:, j]).sum(-1))
    np.testing.assert_allclose(np.asarray(inner_product(emb, "inner_product")),
                               np.stack(pairs, 1), rtol=1e-5)


def test_crossnet_oracle(emb, rng):
    x0 = np.asarray(emb).reshape(B, -1)
    net = CrossNet(num_layers=2)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x0))["params"]
    out = np.asarray(net.apply({"params": params}, jnp.asarray(x0)))
    # manual recurrence
    xi = x0
    for i in range(2):
        w = np.asarray(params[f"w_{i}"])
        b = np.asarray(params[f"b_{i}"])
        xi = xi + (xi @ w) * x0 + b
    np.testing.assert_allclose(out, xi, rtol=1e-4)


def test_cin_oracle(emb):
    net = CompressedInteractionNet(num_fields=F, cin_layer_units=[3], output_dim=1)
    params = net.init(jax.random.PRNGKey(0), emb)["params"]
    out = np.asarray(net.apply({"params": params}, emb))
    x = np.asarray(emb)
    k = np.asarray(params["conv_0_kernel"])   # [F*F, 3]
    bias = np.asarray(params["conv_0_bias"])
    had = np.einsum("bhd,bmd->bhmd", x, x).reshape(B, F * F, D)
    xi = np.einsum("bcd,co->bod", had, k) + bias[None, :, None]
    pooled = xi.sum(-1)  # [B, 3]
    fc_k = np.asarray(params["Dense_0"]["kernel"])
    fc_b = np.asarray(params["Dense_0"]["bias"])
    np.testing.assert_allclose(out, pooled @ fc_k + fc_b, rtol=1e-4)


def test_senet_rescales_fields(emb):
    net = SENETLayer(reduction_ratio=3)
    params = net.init(jax.random.PRNGKey(0), emb)["params"]
    out = np.asarray(net.apply({"params": params}, emb))
    x = np.asarray(emb)
    # each field is a nonneg scalar multiple of the input field
    ratio = out / np.where(np.abs(x) < 1e-9, 1.0, x)
    per_field = ratio.mean(-1)
    np.testing.assert_allclose(ratio, per_field[..., None] * np.ones_like(ratio),
                               rtol=1e-3, atol=1e-4)
    assert (per_field >= -1e-6).all()


def test_bilinear_field_all_oracle(emb):
    net = BilinearInteraction("field_all")
    params = net.init(jax.random.PRNGKey(0), emb)["params"]
    out = np.asarray(net.apply({"params": params}, emb))
    x = np.asarray(emb)
    W = np.asarray(params["weight"])
    k = 0
    for i in range(F):
        for j in range(i + 1, F):
            np.testing.assert_allclose(out[:, k], (x[:, i] @ W) * x[:, j], rtol=1e-4)
            k += 1


def test_kmax_keeps_order():
    x = jnp.asarray([[3.0, 9.0, 1.0, 7.0, 5.0]])
    out = np.asarray(kmax_pooling(x, 3, axis=1))
    np.testing.assert_array_equal(out, [[9.0, 7.0, 5.0]])  # original order


def test_fignn_shapes(emb):
    net = FiGNNLayer(num_fields=F, embedding_dim=D, gnn_layers=2)
    params = net.init(jax.random.PRNGKey(0), emb)["params"]
    out = net.apply({"params": params}, emb)
    assert out.shape == (B, F, D)
    assert np.isfinite(np.asarray(out)).all()


def test_generalized_interaction_matches_reference_math():
    """AOANet GIN layer: the contracted einsum formulation equals the
    reference's explicit outer-product fusion (rec_pangu/models/ranking/
    aoanet.py:107-115; torch .repeat TILES, so pair index n = s*F + f)."""
    import jax.numpy as jnp
    from flax.core import freeze

    from rec_pangu_tpu.models.ranking.aoanet import GeneralizedInteraction

    rng = np.random.default_rng(0)
    B, F, S_in, S_out, D = 4, 5, 3, 2, 6
    b0 = rng.standard_normal((B, F, D)).astype(np.float32)
    bi = rng.standard_normal((B, S_in, D)).astype(np.float32)
    alpha = rng.standard_normal((S_in * F, S_out)).astype(np.float32)
    W = rng.standard_normal((S_out, D, D)).astype(np.float32)
    h = rng.standard_normal((S_out, D, 1)).astype(np.float32)

    left = np.tile(b0, (1, S_in, 1))
    right = np.tile(bi, (1, 1, F)).reshape(B, -1, D)
    outer = np.einsum("bnh,bnd->bnhd", left, right)
    fusion = np.einsum("bnhd,no->bohd", outer, alpha)
    ref = np.einsum("bohd,odk->boh", W[None] * fusion, h)

    layer = GeneralizedInteraction(S_in, S_out, F, D)
    out = layer.apply(
        {"params": {"W": jnp.asarray(W), "alpha": jnp.asarray(alpha),
                    "h": jnp.asarray(h)}},
        jnp.asarray(b0), jnp.asarray(bi))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
