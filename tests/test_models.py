"""Model-semantics tests: verify the flax modules reproduce the reference
math (`/root/reference/models.py`) — hand-rolled LayerNorm, SAGE concat
ordering, order-0 dense layers, L2-normalized head."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_tpu.models.gnn import GNN, GCN, GraphSage, build_model
from gnn_tpu.ops import sparse as sops


def _identity_adj(n):
    idx = np.arange(n, dtype=np.int32)
    return sops.pack_coo(idx, idx, np.ones(n, np.float32), n, n, n, n,
                         nnz_pad=n)


def _torch_style_forward_sage_layer(x, adj_dense, sampled, W, bW, B, bB,
                                    scale, offset, order):
    """Numpy oracle for one GraphSageConvolution (`models.py:16-25`)."""
    if order > 0:
        feat = adj_dense @ x
        out = np.concatenate([x[sampled] @ B.T + bB, feat @ W.T + bW],
                             axis=1)
    else:
        out = x @ W.T + bW
    out = np.where(out > 0, out, np.expm1(out))  # ELU
    mean = out.mean(axis=1, keepdims=True)
    var = out.var(axis=1, keepdims=True) + 1e-9
    return (out - mean) * scale / np.sqrt(var) + offset


def test_sage_conv_matches_reference_math():
    rng = np.random.RandomState(0)
    n, f, h = 128, 24, 16
    x = rng.randn(n, f).astype(np.float32)
    rows, cols = np.divmod(rng.choice(n * n, 500, replace=False), n)
    vals = rng.rand(500).astype(np.float32)
    adj = sops.pack_coo(rows.astype(np.int32), cols.astype(np.int32), vals,
                        n, n, n, n, nnz_pad=512)
    sampled = rng.permutation(n).astype(np.int32)

    from gnn_tpu.models.gnn import SageConv
    layer = SageConv(n_out=h, order=1)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), adj,
                        jnp.asarray(sampled))
    out = layer.apply(params, jnp.asarray(x), adj, jnp.asarray(sampled))

    p = params["params"]
    dense = np.zeros((n, n), np.float32)
    dense[rows, cols] = vals
    expected = _torch_style_forward_sage_layer(
        x, dense, sampled,
        np.asarray(p["linearW"]["kernel"]).T,
        np.asarray(p["linearW"]["bias"]),
        np.asarray(p["linearB"]["kernel"]).T,
        np.asarray(p["linearB"]["bias"]),
        np.asarray(p["scale"]), np.asarray(p["offset"]), order=1)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                               atol=1e-4)
    # concat ordering: first half = self path (linearB), second = agg path
    assert out.shape == (n, 2 * h)


def test_order0_layer_is_dense_only():
    """order==0 skips aggregation entirely (`models.py:17-21`)."""
    rng = np.random.RandomState(1)
    x = rng.randn(64, 10).astype(np.float32)
    from gnn_tpu.models.gnn import SageConv
    layer = SageConv(n_out=8, order=0)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), None, None)
    out = layer.apply(params, jnp.asarray(x), None, None)
    assert out.shape == (64, 8)


@pytest.mark.parametrize("model", ["graphsage", "gcn"])
def test_full_model_shapes_and_grads(model):
    rng = np.random.RandomState(2)
    n, f, h, c = 128, 12, 8, 5
    orders = (1, 0, 1)
    x = rng.randn(n, f).astype(np.float32)
    adjs = [_identity_adj(n), None, _identity_adj(n)]
    sampled = [jnp.arange(n, dtype=jnp.int32)] * 3
    net = build_model(model, h, orders, c)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x), adjs, sampled)
    out = net.apply(params, jnp.asarray(x), adjs, sampled)
    assert out.shape == (n, c)

    def loss_fn(p):
        o = net.apply(p, jnp.asarray(x), adjs, sampled)
        return jnp.sum(o ** 2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)


def test_head_l2_normalizes():
    """`models.py:94`: encoder output rows are L2-normalized before the
    classifier. Feed an encoder-free probe by checking GNN with a GCN
    encoder whose output we can re-derive."""
    rng = np.random.RandomState(3)
    n, f, h, c = 32, 6, 4, 3
    x = rng.randn(n, f).astype(np.float32)
    adjs = [_identity_adj(n)]
    sampled = [jnp.arange(n, dtype=jnp.int32)]
    enc = GCN(nhid=h, orders=(1,), dropout=0.0)
    net = GNN(encoder=enc, num_classes=c, dropout=0.0)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x), adjs, sampled)
    enc_out = enc.apply({"params": params["params"]["encoder"]},
                        jnp.asarray(x), adjs, sampled, deterministic=True)
    normed = np.asarray(enc_out)
    normed = normed / np.maximum(
        np.linalg.norm(normed, axis=1, keepdims=True), 1e-12)
    k = np.asarray(params["params"]["linear"]["kernel"])
    b = np.asarray(params["params"]["linear"]["bias"])
    expected = normed @ k + b
    out = net.apply(params, jnp.asarray(x), adjs, sampled)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5,
                               atol=1e-5)


def test_dropout_active_in_training_mode():
    rng = np.random.RandomState(4)
    n, f = 64, 10
    x = rng.randn(n, f).astype(np.float32)
    adjs = [_identity_adj(n)]
    sampled = [jnp.arange(n, dtype=jnp.int32)]
    net = build_model("gcn", 8, (1,), 3, dropout=0.5)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x), adjs, sampled)
    o1 = net.apply(params, jnp.asarray(x), adjs, sampled,
                   deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = net.apply(params, jnp.asarray(x), adjs, sampled,
                   deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_gin_conv_math():
    """GINConv: h = LN(MLP((1+eps)*x_self + A@x)) — verified against a
    manual numpy computation."""
    import jax
    import jax.numpy as jnp

    from gnn_tpu.models.gnn import GINConv
    from gnn_tpu.ops import sparse as sops

    rng = np.random.RandomState(0)
    n, f, h = 32, 8, 6
    dense = (rng.rand(n, n) < 0.2).astype(np.float32)
    r, c = np.nonzero(dense)
    adj = sops.pack_coo(r.astype(np.int32), c.astype(np.int32),
                        dense[r, c], n, n, n, n)
    x = rng.randn(n, f).astype(np.float32)
    sampled = np.arange(n, dtype=np.int32)
    layer = GINConv(n_out=h, order=1)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jax.tree_util.tree_map(jnp.asarray, adj),
                        jnp.asarray(sampled))
    got = np.asarray(layer.apply(params, jnp.asarray(x),
                                 jax.tree_util.tree_map(jnp.asarray, adj),
                                 jnp.asarray(sampled)))

    p = params["params"]
    eps = float(p["eps"])
    feat = (1 + eps) * x + dense @ x
    h1 = np.maximum(feat @ np.asarray(p["mlp1"]["kernel"])
                    + np.asarray(p["mlp1"]["bias"]), 0)
    h2 = h1 @ np.asarray(p["mlp2"]["kernel"]) + np.asarray(
        p["mlp2"]["bias"])
    mean = h2.mean(1, keepdims=True)
    var = h2.var(1, keepdims=True) + 1e-9
    want = (h2 - mean) * np.asarray(p["scale"]) / np.sqrt(var) \
        + np.asarray(p["offset"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gin_trains_e2e(small_graph):
    from tests.test_train_e2e import _make_trainer
    tr = _make_trainer(small_graph, world_size=1, model="gin", lr=0.05)
    m0 = tr.train_epoch(small_graph.train_nodes, 0)
    m1 = tr.train_epoch(small_graph.train_nodes, 1)
    assert np.isfinite(m0.train_loss)
    assert m1.train_loss < m0.train_loss + 0.2
