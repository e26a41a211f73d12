"""Op-bucket timing probes (`--op_timing`): per-step spmm fwd/bwd and
communication seconds from isolated jitted ops on a representative
batch — the reference's `main.py:196` spmm/communication buckets.

Split out of `gnn_tpu.train.trainer` (round-4 refactor, zero behavior
change).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gnn_tpu.train.stepfns import _squeeze_batch, prepare_adjs


class OpTimingMixin:
    """`measure_op_buckets` and helpers (mixin over `Trainer`)."""

    def _layer_widths(self):
        """Per-layer input feature widths of the encoder stack (for
        representative spmm operands)."""
        enc = self.net.encoder
        orders = list(getattr(enc, "orders", []))
        widths = [self.n_feats]
        for i in range(1, len(orders)):
            if type(enc).__name__ == "GraphSage":
                # reference `models.py:36`: layer i input width
                widths.append((1 + orders[i - 1]) * enc.nhid)
            else:
                widths.append(enc.nhid)
        return widths

    def measure_op_buckets(self):
        """Per-step spmm-fwd / spmm-bwd / communication seconds, estimated
        by timing the isolated jitted ops on the epoch's last batch (the
        reference brackets its eager calls the same way conceptually,
        `custom_sparse_ops.py:21-27`, `main.py:150-168`). Cached keyed
        on the CURRENT scale factor — shapes are epoch-invariant only
        until the live ScaleFactorTuner changes cfg.scale_factor
        (sampled-set sizes shift buckets), so a factor change
        invalidates the cache (round-4 advice)."""
        sf_key = float(getattr(self.pipeline.cfg, "scale_factor", 1.0))
        cached = getattr(self, "_op_buckets", None)
        if cached is not None and cached[0] == sf_key:
            return cached[1]
        if getattr(self, "_last_dev_batch", None) is None:
            # packed transport keeps the last batch host-side; ship it
            # once here for the isolated-op timing
            if getattr(self, "_last_host_batch", None) is None:
                return (float("nan"),) * 3
            put = (self._put_gb if
                   getattr(self, "_last_is_grouped", False) else
                   self._put_b)
            self._last_dev_batch = put(self._last_host_batch)
            self._last_plan = put(self._last_host_plan) \
                if self._last_host_plan != () else ()
        from gnn_tpu.ops.sparse import spmm, spmm_transpose

        last_batch, last_plan = self._last_dev_batch, self._last_plan
        if getattr(self, "_last_is_grouped", False):
            # grouped dispatch: drop the leading group axis first
            last_batch = jax.tree_util.tree_map(lambda a: a[0], last_batch)
            last_plan = jax.tree_util.tree_map(lambda a: a[0], last_plan)
        one = jax.tree_util.tree_map(lambda a: a[0], last_batch)
        widths = self._layer_widths()
        on_tpu = jax.default_backend() == "tpu"

        def timeit(fn, *args):
            if on_tpu:
                from benchmarks.timing import chain_time
                return chain_time(fn, args[0], n=8, args=args[1:])
            f = jax.jit(fn)
            jax.block_until_ready(f(*args))
            t0 = time.perf_counter()
            for _ in range(3):
                jax.block_until_ready(f(*args))
            return (time.perf_counter() - t0) / 3

        t_fwd = t_bwd = 0.0
        rng = np.random.default_rng(0)
        if self.part_axis is not None:
            # part-sharded aggregation state only exists inside
            # shard_map, so each layer's isolated op is timed as a
            # shard_mapped probe: the resident rebuild of layer l + one
            # spmm/spmm_transpose over the sharded hot blocks (incl.
            # their psum). Slightly wider scope than the replicated
            # branch (which times the op on a pre-materialized layer),
            # but that's the true per-step cost of the sharded path.
            from gnn_tpu.ops.residentgraph import ResidentLayerRef
            agg_spec = P(self.part_axis)
            batch_spec = P(self._rep_axes)

            def make_probe(l, transpose):
                def inner(x, agg_state, batch):
                    b = _squeeze_batch(batch)
                    agg = jax.tree_util.tree_map(lambda a: a[0],
                                                 agg_state)
                    adj = prepare_adjs(b, agg)[l]
                    return (spmm_transpose(adj, x) if transpose
                            else spmm(adj, x))
                return jax.shard_map(
                    inner, mesh=self.mesh,
                    in_specs=(P(), agg_spec, batch_spec),
                    out_specs=P(), check_vma=False)

            for l, a in enumerate(list(one.adjs)):
                if not isinstance(a, ResidentLayerRef):
                    continue
                w = widths[l] if l < len(widths) else widths[-1]
                x = jnp.asarray(rng.normal(size=(a.ncols, w)).astype(
                    np.float32))
                g = jnp.asarray(rng.normal(size=(a.nrows, w)).astype(
                    np.float32))
                t_fwd += timeit(make_probe(l, False), x,
                                self.agg_state, last_batch)
                t_bwd += timeit(make_probe(l, True), g,
                                self.agg_state, last_batch)
        else:
            from gnn_tpu.ops.sparse import PatternAdj
            adjs = prepare_adjs(one, self.agg_state)
            for l, adj in enumerate(adjs):
                if adj is None or isinstance(adj, PatternAdj):
                    # pattern layers (GAT) have no standalone spmm to
                    # time — their aggregation weights are computed
                    # inside the model from q.k scores
                    continue
                w = widths[l] if l < len(widths) else widths[-1]
                x = jnp.asarray(rng.normal(size=(adj.ncols, w)).astype(
                    np.float32))
                g = jnp.asarray(rng.normal(size=(adj.nrows, w)).astype(
                    np.float32))
                # the adjacency MUST ride as an argument, not a closure —
                # a closure would bake its arrays (including the GB-scale
                # resident hot blocks) into the timing jit as constants
                t_fwd += timeit(lambda u, a: spmm(a, u), x, adj)
                t_bwd += timeit(lambda u, a: spmm_transpose(a, u), g, adj)

        # communication: the gradient psum (`main.py:149-168`'s manual
        # all-reduce, which also flattens grads into one vector) + the
        # feature cache's all_to_all gather, if any. The psum spans the
        # replica axes — under part sharding grads are already identical
        # across parts, so the data axes are its real scope.
        t_comm = 0.0
        if self.params is not None:
            flat = jnp.concatenate(
                [jnp.ravel(p) for p in
                 jax.tree_util.tree_leaves(self.params)])
            axes = self._rep_axes
            psum_fn = jax.shard_map(
                lambda g: jax.lax.psum(g, axes), mesh=self.mesh,
                in_specs=P(), out_specs=P(), check_vma=False)
            t_comm = timeit(psum_fn, flat)
        if hasattr(self.feature_source, "plan") and \
                last_plan not in ((), None):
            b_spec = P(self._rep_axes)
            gather_fn = jax.jit(jax.shard_map(
                lambda fs, pl, bat: self.feature_source.gather(
                    fs, pl, bat.input_nodes[0], bat.input_mask[0]),
                mesh=self.mesh,
                in_specs=(self.feature_source.state_spec(), b_spec,
                          b_spec),
                out_specs=b_spec, check_vma=False))
            try:
                jax.block_until_ready(gather_fn(
                    self.feat_state, last_plan, last_batch))
                t0 = time.perf_counter()
                jax.block_until_ready(gather_fn(
                    self.feat_state, last_plan, last_batch))
                t_comm += time.perf_counter() - t0
            except Exception:
                pass
        self._op_buckets = (sf_key, (t_fwd, t_bwd, t_comm))
        return self._op_buckets[1]
