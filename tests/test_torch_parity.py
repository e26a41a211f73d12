"""Numerical parity vs the reference's torch substrate.

BASELINE.md demands per-layer activation parity ("allclose") with the
reference. The reference's modules can't be imported here (their import
JIT-builds a CUDA extension, `custom_sparse_ops.py:8`), so these tests
re-create the reference forward recipe with REAL torch ops
(`/root/reference/models.py`, `utils.py:129-140`) — torch.nn.Linear,
F.elu, Tensor.var(unbiased=False), torch.rsqrt, F.normalize,
BCEWithLogitsLoss / CrossEntropyLoss — load the SAME weights into the
flax model, and compare layer by layer.
"""
import numpy as np
import pytest
import scipy.sparse as sp

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from gnn_tpu.models.gnn import GNN, GCN, GraphSage
from gnn_tpu.ops import sparse as sops
from gnn_tpu.train.loss import masked_loss


def _rand_adj(rng, nr, nc, density=0.1):
    m = sp.random(nr, nc, density=density, format="coo", random_state=rng,
                  dtype=np.float32)
    dense = np.zeros((nr, nc), np.float32)
    dense[m.row, m.col] = m.data
    adj = sops.pack_coo(m.row.astype(np.int32), m.col.astype(np.int32),
                        m.data, nr, nc, nr, nc)
    return dense, adj


class _TorchSageConv(torch.nn.Module):
    """The reference GraphSageConvolution recipe (`models.py:6-25`),
    written against torch ops (dense adj stands in for the CUDA spmm —
    the authors' own validation stand-in, `custom_sparse_ops.py:25`)."""

    def __init__(self, n_in, n_out, order):
        super().__init__()
        self.linearW = torch.nn.Linear(n_in, n_out)
        self.linearB = torch.nn.Linear(n_in, n_out)
        self.offset = torch.nn.Parameter(torch.zeros((1 + order) * n_out))
        self.scale = torch.nn.Parameter(torch.ones((1 + order) * n_out))
        self.order = order

    def forward(self, x, adj_dense, sampled):
        if self.order > 0:
            feat = adj_dense @ x
            feat = torch.cat([self.linearB(x[sampled]),
                              self.linearW(feat)], 1)
        else:
            feat = self.linearW(x)
        out = torch.nn.functional.elu(feat)
        mean = out.mean(dim=1).view(out.shape[0], 1)
        var = out.var(dim=1, unbiased=False).view(out.shape[0], 1) + 1e-9
        return (out - mean) * self.scale * torch.rsqrt(var) + self.offset


def _copy_linear(tl: "torch.nn.Linear"):
    return {"kernel": jnp.asarray(tl.weight.detach().numpy().T),
            "bias": jnp.asarray(tl.bias.detach().numpy())}


def test_sage_layer_parity_with_torch():
    rng = np.random.RandomState(0)
    n, f, h = 96, 20, 12
    torch.manual_seed(0)
    tl = _TorchSageConv(f, h, order=1)
    x = rng.randn(n, f).astype(np.float32)
    dense, adj = _rand_adj(rng, n, n)
    sampled = rng.permutation(n)

    with torch.no_grad():
        expected = tl(torch.from_numpy(x), torch.from_numpy(dense),
                      torch.from_numpy(sampled)).numpy()

    from gnn_tpu.models.gnn import SageConv
    layer = SageConv(n_out=h, order=1)
    params = {"params": {
        "linearW": _copy_linear(tl.linearW),
        "linearB": _copy_linear(tl.linearB),
        "scale": jnp.asarray(tl.scale.detach().numpy()),
        "offset": jnp.asarray(tl.offset.detach().numpy()),
    }}
    got = layer.apply(params, jnp.asarray(x), adj,
                      jnp.asarray(sampled.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4,
                               atol=1e-4)


def test_full_model_parity_with_torch():
    """2-layer GraphSage + GNN head vs the torch recipe, per layer."""
    rng = np.random.RandomState(1)
    n, f, h, c = 64, 10, 8, 5
    torch.manual_seed(1)
    t1 = _TorchSageConv(f, h, 1)
    t2 = _TorchSageConv(2 * h, h, 1)
    head = torch.nn.Linear(2 * h, c)
    x = rng.randn(n, f).astype(np.float32)
    d1, a1 = _rand_adj(rng, n, n)
    d2, a2 = _rand_adj(rng, n, n)
    s1 = np.arange(n)
    s2 = rng.permutation(n)

    with torch.no_grad():
        xt = torch.from_numpy(x)
        h1 = t1(xt, torch.from_numpy(d1), torch.from_numpy(s1))
        h2 = t2(h1, torch.from_numpy(d2), torch.from_numpy(s2))
        normed = torch.nn.functional.normalize(h2, p=2, dim=1)
        expected = head(normed).numpy()

    enc = GraphSage(nhid=h, orders=(1, 1), dropout=0.0)
    net = GNN(encoder=enc, num_classes=c, dropout=0.0)
    params = {"params": {
        "encoder": {
            "gcs_0": {"linearW": _copy_linear(t1.linearW),
                      "linearB": _copy_linear(t1.linearB),
                      "scale": jnp.asarray(t1.scale.detach().numpy()),
                      "offset": jnp.asarray(t1.offset.detach().numpy())},
            "gcs_1": {"linearW": _copy_linear(t2.linearW),
                      "linearB": _copy_linear(t2.linearB),
                      "scale": jnp.asarray(t2.scale.detach().numpy()),
                      "offset": jnp.asarray(t2.offset.detach().numpy())},
        },
        "linear": _copy_linear(head),
    }}
    got = net.apply(params, jnp.asarray(x), [a1, a2],
                    [jnp.asarray(s1.astype(np.int32)),
                     jnp.asarray(s2.astype(np.int32))])
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4,
                               atol=2e-4)


def test_gcn_layer_parity_with_torch():
    rng = np.random.RandomState(2)
    n, f, h = 48, 12, 8
    torch.manual_seed(2)
    lin = torch.nn.Linear(f, h)
    scale = torch.ones(h)
    offset = torch.zeros(h)
    x = rng.randn(n, f).astype(np.float32)
    dense, adj = _rand_adj(rng, n, n)
    with torch.no_grad():
        feat = torch.from_numpy(dense) @ torch.from_numpy(x)
        out = torch.nn.functional.elu(lin(feat))
        mean = out.mean(dim=1, keepdim=True)
        var = out.var(dim=1, unbiased=False, keepdim=True) + 1e-9
        expected = ((out - mean) * scale * torch.rsqrt(var)
                    + offset).numpy()
    from gnn_tpu.models.gnn import GraphConv
    layer = GraphConv(n_out=h, order=1)
    params = {"params": {"linear": _copy_linear(lin),
                         "scale": jnp.asarray(scale.numpy()),
                         "offset": jnp.asarray(offset.numpy())}}
    got = layer.apply(params, jnp.asarray(x), adj)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4,
                               atol=1e-4)


def test_loss_parity_with_torch():
    """masked_loss vs the reference's exact torch loss construction
    (`utils.py:129-140`)."""
    rng = np.random.RandomState(3)
    b, c = 16, 6
    preds = rng.randn(b, c).astype(np.float32)
    labels = (rng.rand(b, c) < 0.3).astype(np.float32)
    mask = np.ones(b, np.float32)

    pt, lt = torch.from_numpy(preds), torch.from_numpy(labels)
    norm = torch.ones(b) / b
    expected_bce = torch.nn.BCEWithLogitsLoss(
        weight=norm.unsqueeze(1), reduction="sum")(pt, lt).item()
    got = float(masked_loss(jnp.asarray(preds), jnp.asarray(labels),
                            jnp.asarray(mask), sigmoid_loss=True))
    np.testing.assert_allclose(got, expected_bce, rtol=1e-5)

    onehot = np.zeros((b, c), np.float32)
    onehot[np.arange(b), rng.randint(0, c, b)] = 1.0
    ls = torch.nn.CrossEntropyLoss(reduction="none")(
        pt, torch.from_numpy(onehot))
    expected_ce = (norm * ls).sum().item()
    got = float(masked_loss(jnp.asarray(preds), jnp.asarray(onehot),
                            jnp.asarray(mask), sigmoid_loss=False))
    np.testing.assert_allclose(got, expected_ce, rtol=1e-5)


class _TorchGNN(torch.nn.Module):
    """Reference full model (`models.py:27-44,86-97`) against torch ops:
    GraphSage encoder stack + L2-normalized linear head (dropout 0 for
    determinism)."""

    def __init__(self, f, h, c, orders):
        super().__init__()
        widths = [f] + [(1 + orders[i]) * h for i in range(len(orders))]
        self.convs = torch.nn.ModuleList(
            [_TorchSageConv(widths[i], h, orders[i])
             for i in range(len(orders))])
        self.head = torch.nn.Linear(widths[-1], c)

    def forward(self, x, adjs_dense, sampled):
        for conv, a, s in zip(self.convs, adjs_dense, sampled):
            x = conv(x, a, s)
        x = torch.nn.functional.normalize(x, p=2, dim=1)
        return self.head(x)


def test_e2e_training_parity_with_torch(small_graph):
    """END-TO-END accuracy parity: train the reference recipe (torch,
    dense-adj stand-in for its CUDA spmm) and this framework's model on
    the SAME LADIES minibatches from the same init with the same
    optimizer (Adam, clip-5, CE loss) — per-step losses must track and
    the final val micro-F1 must match closely. This is the strongest
    in-environment substitute for real-dataset reference runs (no
    dataset egress here; see BASELINE.md)."""
    import optax

    from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample
    from gnn_tpu.train.loss import calc_f1, predict_proba
    from gnn_tpu.utils.normalize import build_laplacian

    f = small_graph.feats.shape[1]
    h, c = 16, small_graph.num_classes
    orders = (1, 1)
    lap = build_laplacian(small_graph.adj_full, "graphsage")
    cfg = SamplerConfig(batch_size=32, samp_num=64, orders=orders,
                        num_nodes=lap.shape[0], num_classes=c,
                        compress=False)

    torch.manual_seed(0)
    tm = _TorchGNN(f, h, c, orders)
    enc = GraphSage(nhid=h, orders=orders, dropout=0.0)
    net = GNN(encoder=enc, num_classes=c, dropout=0.0)
    params = {"params": {
        "encoder": {
            f"gcs_{i}": {
                "linearW": _copy_linear(tm.convs[i].linearW),
                "linearB": _copy_linear(tm.convs[i].linearB),
                "scale": jnp.asarray(
                    tm.convs[i].scale.detach().numpy()),
                "offset": jnp.asarray(
                    tm.convs[i].offset.detach().numpy())}
            for i in range(len(orders))},
        "linear": _copy_linear(tm.head),
    }}

    opt = optax.adam(0.01)
    opt_state = opt.init(params)
    topt = torch.optim.Adam(tm.parameters(), lr=0.01)
    feats = small_graph.feats.astype(np.float32)

    def jax_loss(p, x, adjs, sampled, labels, mask):
        out = net.apply(p, x, adjs, sampled)
        return masked_loss(out, labels, mask, sigmoid_loss=False)

    from gnn_tpu.train.trainer import clip_by_global_norm
    grad_fn = jax.jit(jax.value_and_grad(jax_loss))

    losses_j, losses_t = [], []
    for step in range(10):
        mb = ladies_sample(cfg, 100 + step,
                           small_graph.train_nodes[step * 32:
                                                   (step + 1) * 32],
                           lap, small_graph.labels)
        x = feats[mb.input_nodes] * mb.input_mask[:, None]
        adjs = [jax.tree_util.tree_map(jnp.asarray, a) for a in mb.adjs]
        sampled = [jnp.asarray(s) for s in mb.sampled_nodes]

        lj, grads = grad_fn(params, jnp.asarray(x), adjs, sampled,
                            jnp.asarray(mb.labels),
                            jnp.asarray(mb.label_mask))
        grads = clip_by_global_norm(grads, 5.0)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses_j.append(float(lj))

        dense_adjs = [torch.from_numpy(np.asarray(sops.to_dense(a)))
                      for a in adjs]
        xt = torch.from_numpy(x)
        st = [torch.from_numpy(np.asarray(s, np.int64)) for s in sampled]
        out = tm(xt, dense_adjs, st)
        msk = torch.from_numpy(mb.label_mask.astype(bool))
        norm = msk.float() / msk.float().sum()
        per = torch.nn.CrossEntropyLoss(reduction="none")(
            out, torch.from_numpy(mb.labels))
        lt = (norm * per).sum()
        topt.zero_grad()
        lt.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 5.0)
        topt.step()
        losses_t.append(float(lt))

    np.testing.assert_allclose(losses_j, losses_t, rtol=5e-3, atol=5e-3)

    # final val F1 parity on one held-out batch
    mb = ladies_sample(cfg, 999, small_graph.valid_nodes[:32], lap,
                       small_graph.labels)
    x = feats[mb.input_nodes] * mb.input_mask[:, None]
    adjs = [jax.tree_util.tree_map(jnp.asarray, a) for a in mb.adjs]
    sampled = [jnp.asarray(s) for s in mb.sampled_nodes]
    out_j = net.apply(params, jnp.asarray(x), adjs, sampled)
    with torch.no_grad():
        out_t = tm(torch.from_numpy(x),
                   [torch.from_numpy(np.asarray(sops.to_dense(a)))
                    for a in adjs],
                   [torch.from_numpy(np.asarray(s, np.int64))
                    for s in sampled]).numpy()
    mask = mb.label_mask.astype(bool)
    f1_j, _ = calc_f1(mb.labels[mask],
                      np.asarray(predict_proba(out_j, False))[
                          : mb.labels.shape[0]][mask], False)
    f1_t, _ = calc_f1(mb.labels[mask],
                      np.asarray(predict_proba(jnp.asarray(out_t),
                                               False))[
                          : mb.labels.shape[0]][mask], False)
    assert abs(f1_j - f1_t) <= 0.05
