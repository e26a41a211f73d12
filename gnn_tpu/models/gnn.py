"""GNN model family: GraphSAGE / GCN encoders + classification head.

Faithful TPU-native re-implementation of the reference model semantics
(`/root/reference/models.py`) as flax.linen modules:

* ``SageConv`` — reference ``GraphSageConvolution`` (`models.py:6-25`):
  for ``order > 0``: ``feat = concat([B(x[sampled]), W(A @ x)])``; for
  ``order == 0``: ``feat = W(x)``. Then ELU and a hand-rolled per-row
  LayerNorm with learned ``scale``/``offset`` of width ``(1+order)*n_out``
  (`models.py:13-14, 22-25`; biased variance + 1e-9).
* ``GraphConv`` — reference ``GraphConvolution`` (`models.py:48-64`):
  ``elu(linear(A @ x))`` + the same per-row LayerNorm.
* ``GraphSage`` / ``GCN`` — layer stacks (`models.py:27-44, 67-84`) with
  dropout 0.1 after every layer; GraphSage layer ``i`` consumes width
  ``(1+orders[i-1])*nhid`` (`models.py:36`).
* ``GNN`` — head (`models.py:86-97`): encoder -> row-wise L2 normalize ->
  dropout -> linear classifier.

All forwards take per-layer adjacency + ``sampled_nodes`` lists exactly like
the reference (`models.py:37-44`), but with static padded shapes so the
whole stack jits. Padded (invalid) rows flow through harmlessly — LayerNorm
is per-row and the loss masks them.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gnn_tpu.ops.sparse import spmm


def _row_layernorm(out: jnp.ndarray, scale: jnp.ndarray,
                   offset: jnp.ndarray) -> jnp.ndarray:
    """Hand-rolled per-row LayerNorm matching `models.py:22-25`:
    biased variance, eps added to var (not std), scale applied before
    rsqrt multiplication (algebraically identical to after)."""
    mean = jnp.mean(out, axis=1, keepdims=True)
    var = jnp.var(out, axis=1, keepdims=True) + 1e-9
    return (out - mean) * scale * jax.lax.rsqrt(var) + offset


class SageConv(nn.Module):
    """GraphSAGE convolution (reference `models.py:6-25`)."""

    n_out: int
    order: int

    @nn.compact
    def __call__(self, x, adj, sampled_nodes):
        if self.order > 0:
            feat = spmm(adj, x)
            x_self = jnp.take(x, sampled_nodes, axis=0)
            feat = jnp.concatenate(
                [nn.Dense(self.n_out, name="linearB")(x_self),
                 nn.Dense(self.n_out, name="linearW")(feat)], axis=1)
        else:
            feat = nn.Dense(self.n_out, name="linearW")(x)
        out = nn.elu(feat)
        width = (1 + self.order) * self.n_out
        scale = self.param("scale", nn.initializers.ones, (width,))
        offset = self.param("offset", nn.initializers.zeros, (width,))
        return _row_layernorm(out, scale, offset)


class GraphConv(nn.Module):
    """GCN convolution (reference `models.py:48-64`)."""

    n_out: int
    order: int

    @nn.compact
    def __call__(self, x, adj, sampled_nodes=None):
        feat = x
        if self.order > 0:
            feat = spmm(adj, feat)
        out = nn.elu(nn.Dense(self.n_out, name="linear")(feat))
        scale = self.param("scale", nn.initializers.ones, (self.n_out,))
        offset = self.param("offset", nn.initializers.zeros, (self.n_out,))
        return _row_layernorm(out, scale, offset)


class GraphSage(nn.Module):
    """Stack of SageConv layers (reference `models.py:27-44`)."""

    nhid: int
    orders: Sequence[int]
    dropout: float = 0.1

    @property
    def out_dim(self) -> int:
        # reference `models.py:31`: self.nhid = (1 + orders[-1]) * nhid
        return (1 + self.orders[-1]) * self.nhid

    @nn.compact
    def __call__(self, x, adjs, sampled_nodes, *, deterministic: bool):
        for i, order in enumerate(self.orders):
            x = SageConv(self.nhid, order, name=f"gcs_{i}")(
                x, adjs[i], sampled_nodes[i])
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class GCN(nn.Module):
    """Stack of GraphConv layers (reference `models.py:67-84`)."""

    nhid: int
    orders: Sequence[int]
    dropout: float = 0.1

    @property
    def out_dim(self) -> int:
        return self.nhid

    @nn.compact
    def __call__(self, x, adjs, sampled_nodes, *, deterministic: bool):
        for i, order in enumerate(self.orders):
            x = GraphConv(self.nhid, order, name=f"gcs_{i}")(x, adjs[i])
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class GINConv(nn.Module):
    """Graph Isomorphism Network layer (Xu et al., ICLR'19; beyond the
    reference's model family): ``h = MLP((1 + eps) * x_self + A @ x)``
    with a learnable ``eps``. Aggregation rides the same spmm op as
    SAGE/GCN, so every device path (COO / blocked / hot) works
    unchanged; the per-row LayerNorm keeps padded rows harmless like the
    other layers. Under the LADIES pipeline the adjacency carries
    row-normalized + debiased weights (mean- rather than sum-aggregation
    — the standard minibatch-sampling variant of GIN)."""

    n_out: int
    order: int

    @nn.compact
    def __call__(self, x, adj, sampled_nodes):
        if self.order > 0:
            agg = spmm(adj, x)
            x_self = jnp.take(x, sampled_nodes, axis=0)
            eps = self.param("eps", nn.initializers.zeros, ())
            feat = (1.0 + eps) * x_self + agg
        else:
            feat = x
        h = nn.Dense(self.n_out, name="mlp1")(feat)
        h = nn.relu(h)
        h = nn.Dense(self.n_out, name="mlp2")(h)
        scale = self.param("scale", nn.initializers.ones, (self.n_out,))
        offset = self.param("offset", nn.initializers.zeros,
                            (self.n_out,))
        return _row_layernorm(h, scale, offset)


class GIN(nn.Module):
    """Stack of GINConv layers, drop-in alongside GraphSage/GCN."""

    nhid: int
    orders: Sequence[int]
    dropout: float = 0.1

    @property
    def out_dim(self) -> int:
        return self.nhid

    @nn.compact
    def __call__(self, x, adjs, sampled_nodes, *, deterministic: bool):
        for i, order in enumerate(self.orders):
            x = GINConv(self.nhid, order, name=f"gcs_{i}")(
                x, adjs[i], sampled_nodes[i])
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class GNN(nn.Module):
    """Encoder + classification head (reference `models.py:86-97`)."""

    encoder: nn.Module
    num_classes: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feat, adjs, sampled_nodes, *,
                 deterministic: bool = True):
        x = self.encoder(feat, adjs, sampled_nodes,
                         deterministic=deterministic)
        # row-wise L2 normalization (`models.py:94` F.normalize p=2 dim=1);
        # torch clamps the norm at 1e-12. The tiny additive term keeps the
        # sqrt gradient finite on all-zero (padded) rows, where a plain
        # max(sqrt(0), eps) yields 0 * inf = NaN under autodiff.
        norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True) + 1e-24)
        x = x / jnp.maximum(norm, 1e-12)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.num_classes, name="linear")(x)


def build_model(model: str, nhid: int, orders: Sequence[int],
                num_classes: int, dropout: float = 0.1) -> GNN:
    """Build the full model the way `main.py:91-97` does."""
    if model == "graphsage":
        encoder = GraphSage(nhid=nhid, orders=tuple(orders), dropout=dropout)
    elif model == "gcn":
        encoder = GCN(nhid=nhid, orders=tuple(orders), dropout=dropout)
    elif model == "gin":
        encoder = GIN(nhid=nhid, orders=tuple(orders), dropout=dropout)
    elif model == "gat":
        from gnn_tpu.models.gat import GATEncoder
        encoder = GATEncoder(nhid=nhid, orders=tuple(orders),
                             dropout=dropout)
    else:
        raise ValueError(f"unknown model {model!r}")
    return GNN(encoder=encoder, num_classes=num_classes, dropout=dropout)
