"""Full-graph (non-sampled) distributed training over an edge-partitioned
mesh — the scale-out mode for graphs whose per-layer aggregation spans
chips (BASELINE configs 4-5: ogbn-products on 1 host, papers100M on N
hosts).

The model math matches `gnn_tpu.models.gnn` (GCN/GraphSAGE layer recipe
from `/root/reference/models.py`), but aggregation is the halo-exchange
distributed SpMM (`gnn_tpu.parallel.halo`): each chip owns a row
partition of the graph and of every layer's activations; one
``all_to_all`` per layer moves boundary rows over ICI, overlapped with
the intra-partition aggregation.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from gnn_tpu.parallel.halo import (build_halo_plan, halo_spmm_local,
                                   partition_features)
from gnn_tpu.parallel.mesh import DATA_AXIS, make_mesh
from gnn_tpu.train.trainer import clip_by_global_norm


def _layer_params(rng, n_in, n_out):
    k1, k2 = jax.random.split(rng)
    # match flax Dense defaults (lecun_normal, zero bias)
    w = jax.nn.initializers.lecun_normal()(k1, (n_in, n_out))
    return {"kernel": w, "bias": jnp.zeros((n_out,)),
            "scale": jnp.ones((n_out,)), "offset": jnp.zeros((n_out,))}


def init_fullgraph_params(rng, n_feats: int, nhid: int,
                          orders: Sequence[int], num_classes: int):
    params = {}
    widths = [n_feats] + [nhid] * len(list(orders))
    for i in range(len(list(orders))):
        rng, sub = jax.random.split(rng)
        params[f"gcs_{i}"] = _layer_params(sub, widths[i], widths[i + 1])
    rng, sub = jax.random.split(rng)
    w = jax.nn.initializers.lecun_normal()(sub, (nhid, num_classes))
    params["head"] = {"kernel": w, "bias": jnp.zeros((num_classes,))}
    return params


def _gcn_layer_local(p, x, aggregate, order: int):
    feat = aggregate(x) if order > 0 else x
    out = jax.nn.elu(feat @ p["kernel"] + p["bias"])
    mean = jnp.mean(out, axis=1, keepdims=True)
    var = jnp.var(out, axis=1, keepdims=True) + 1e-9
    return (out - mean) * p["scale"] * jax.lax.rsqrt(var) + p["offset"]


def fullgraph_forward_local(params, plan_local, x_local,
                            orders: Sequence[int], axis=DATA_AXIS):
    """One chip's forward over its node partition (inside shard_map)."""
    h = x_local
    for i, order in enumerate(orders):
        agg = lambda z: halo_spmm_local(plan_local, z, axis=axis)
        h = _gcn_layer_local(params[f"gcs_{i}"], h, agg, order)
    norm = jnp.sqrt(jnp.sum(h * h, axis=1, keepdims=True) + 1e-24)
    h = h / jnp.maximum(norm, 1e-12)
    return h @ params["head"]["kernel"] + params["head"]["bias"]


@dataclasses.dataclass
class FullGraphTrainer:
    """Full-batch distributed GCN trainer."""

    adj: object                  # scipy CSR (already normalized laplacian)
    feats: np.ndarray
    labels_dense: np.ndarray     # [N, C] float32
    train_mask: np.ndarray       # [N] bool
    orders: Sequence[int]
    nhid: int
    num_classes: int
    n_devices: int = 0
    lr: float = 0.01
    sigmoid_loss: bool = False
    seed: int = 0
    # optional externally-built mesh; a multi-axis ('data', 'part') hybrid
    # mesh partitions the graph over the row-major flattened axes, so the
    # halo all_to_all's intra-host legs ride ICI and only cross-partition
    # boundaries that straddle hosts touch DCN (SURVEY.md §5.8)
    mesh: object = None

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh(self.n_devices or None)
        self.axes = tuple(self.mesh.axis_names)
        D = self.mesh.devices.size
        self.plan, self.owner = build_halo_plan(self.adj, D)
        nl = self.plan.n_local
        self.x = partition_features(self.feats, self.owner, D, nl)
        self.y = partition_features(self.labels_dense.astype(np.float32),
                                    self.owner, D, nl)
        m = np.zeros((D, nl), np.float32)
        for d in range(D):
            mine = np.flatnonzero(self.owner == d)
            m[d, : len(mine)] = self.train_mask[mine].astype(np.float32)
        self.mask = m

        sh = NamedSharding(self.mesh, P(self.axes))
        put = lambda a: jax.device_put(jnp.asarray(a), sh)
        self.plan_dev = jax.tree_util.tree_map(
            lambda a: put(a) if hasattr(a, "ndim") else a, self.plan)
        self.x_dev, self.y_dev = put(self.x), put(self.y)
        self.mask_dev = put(self.mask)

        self.params = init_fullgraph_params(
            jax.random.PRNGKey(self.seed), self.feats.shape[1], self.nhid,
            self.orders, self.num_classes)
        self.optimizer = optax.adam(self.lr)
        self.opt_state = self.optimizer.init(self.params)
        self._step = self._build_step()

    def _build_step(self):
        orders = tuple(self.orders)
        sigmoid = self.sigmoid_loss
        optimizer = self.optimizer
        axes = self.axes

        def local_loss(params, plan_d, x, y, mask):
            out = fullgraph_forward_local(params, plan_d, x[0], orders,
                                          axis=axes)
            # global mean over train nodes: sum local, divide by psum count
            n_valid = jax.lax.psum(jnp.sum(mask[0]), axes)
            w = mask[0] / jnp.maximum(n_valid, 1.0)
            if sigmoid:
                per = (jnp.maximum(out, 0) - out * y[0]
                       + jnp.log1p(jnp.exp(-jnp.abs(out))))
                local = jnp.sum(per * w[:, None])
            else:
                logp = jax.nn.log_softmax(out, axis=1)
                local = jnp.sum(-jnp.sum(y[0] * logp, axis=1) * w)
            # globally-normalized LOCAL partial sum: param grads accumulate
            # on the device that computed each term, so the step psums the
            # grads (the all_to_all's own transpose routes x-grads back to
            # their owner chips automatically).
            return local

        def step(params, opt_state, plan_d, x, y, mask):
            loss, grads = jax.value_and_grad(local_loss)(
                params, plan_d, x, y, mask)
            grads = jax.lax.psum(grads, axes)
            loss = jax.lax.psum(loss, axes)
            grads = clip_by_global_norm(grads, 5.0)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        sh = P(self.axes)
        return jax.jit(jax.shard_map(
            step, mesh=self.mesh,
            in_specs=(P(), P(), sh, sh, sh, sh),
            out_specs=(P(), P(), P()),
            check_vma=False))

    def train_steps(self, n: int):
        losses = []
        for _ in range(n):
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, self.plan_dev, self.x_dev,
                self.y_dev, self.mask_dev)
            losses.append(float(loss))
        return losses

    def predict(self):
        orders = tuple(self.orders)
        axes = self.axes

        def f(params, plan_d, x):
            return fullgraph_forward_local(params, plan_d, x[0],
                                           orders, axis=axes)[None]

        sh = P(self.axes)
        fwd = jax.jit(jax.shard_map(
            f, mesh=self.mesh,
            in_specs=(P(), sh, sh),
            out_specs=sh, check_vma=False))
        out = np.asarray(fwd(self.params, self.plan_dev, self.x_dev))
        # un-partition back to node order
        D, nl, C = out.shape
        full = np.zeros((len(self.owner), C), np.float32)
        for d in range(D):
            mine = np.flatnonzero(self.owner == d)
            full[mine] = out[d, : len(mine)]
        return full
