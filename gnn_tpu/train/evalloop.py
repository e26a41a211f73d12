"""Evaluation + model selection: val batches, sharded full-sweep test
(reference `main.py:178-199,217-241` semantics — including evaluating
the test sweep with the BEST params, fixing the reference's latent
last-model bug at `main.py:235`).

Split out of `gnn_tpu.train.trainer` (round-4 refactor, zero behavior
change).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gnn_tpu.parallel.mesh import put_replicated
from gnn_tpu.sampling.ladies import to_device_batch
from gnn_tpu.train.loss import calc_f1, predict_proba


class EvalMixin:
    """Evaluation/test methods of `Trainer` (mixin: reads Trainer
    state only)."""

    def evaluate(self, target_nodes, batch_size: int = 128,
                 mode: str = "val"):
        """Micro-F1 + loss over eval batches (reference
        `main.py:178-199, 217-241`). Full-sweep test evaluation on a
        multi-device mesh runs sharded — ws batches per dispatch through
        the same feature-cache gather as training."""
        if mode == "test" and self.params is not None and (
                self.pipeline.world_size > 1 or self.packed_transport):
            # full sweeps run through the mesh (ws batches/dispatch,
            # device-side feature gather); with packed transport this
            # also collapses each dispatch's H2D to one array
            return self._evaluate_sharded(target_nodes, batch_size)
        if self.part_axis is not None and self.params is not None:
            # part-sharded aggregation state lives only inside the
            # shard_mapped step fns — run val batches through eval_step
            # with the batch repeated across the replica axes (every
            # replica computes the same batch; row 0 is the answer)
            ws = int(np.prod([self.mesh.shape[a]
                              for a in self._rep_axes]))
            total_f1 = total_n = 0
            total_loss = 0.0
            n_batches = 0
            rep = lambda a: np.repeat(np.asarray(a), ws, axis=0)
            for mb in self.pipeline.eval_batches(target_nodes,
                                                 batch_size, mode):
                batch = jax.tree_util.tree_map(rep, to_device_batch(mb))
                plan = jax.tree_util.tree_map(
                    rep, self.feature_source.plan(mb))
                outs, losses = self.fns.eval_step(
                    self.params, self.feat_state, self.agg_state,
                    self._put_b(batch), self._put_b(plan))
                labels = mb.labels[0]
                mask = mb.label_mask[0].astype(bool)
                proba = np.asarray(predict_proba(np.asarray(outs)[0],
                                                 self.sigmoid_loss))
                f1_mic, _ = calc_f1(labels[mask],
                                    proba[: labels.shape[0]][mask],
                                    self.sigmoid_loss)
                n = int(mask.sum())
                total_f1 += f1_mic * n
                total_n += n
                total_loss += float(np.asarray(losses)[0])
                n_batches += 1
            return (total_f1 / max(total_n, 1),
                    total_loss / max(n_batches, 1))
        total_f1 = 0.0
        total_n = 0
        total_loss = 0.0
        n_batches = 0
        for mb in self.pipeline.eval_batches(target_nodes, batch_size,
                                              mode):
            batch = to_device_batch(mb)
            x = self.feature_source.host_gather(mb.input_nodes[0],
                                                mb.input_mask[0])
            out, loss = self.fns.eval_forward(self.params, jnp.asarray(x),
                                              self.agg_state, batch)
            labels = mb.labels[0]
            mask = mb.label_mask[0].astype(bool)
            proba = np.asarray(predict_proba(out, self.sigmoid_loss))
            f1_mic, _ = calc_f1(labels[mask], proba[: labels.shape[0]][mask],
                                self.sigmoid_loss)
            n = int(mask.sum())
            total_f1 += f1_mic * n
            total_n += n
            total_loss += float(loss)
            n_batches += 1
        return (total_f1 / max(total_n, 1),
                total_loss / max(n_batches, 1))

    def _evaluate_sharded(self, target_nodes, batch_size: int):
        """Mesh-sharded full sweep: each dispatch evaluates world_size
        batches (cache gather + forward inside shard_map); F1 weighting
        matches the reference's per-batch weighted average
        (`main.py:226-241`)."""
        total_f1 = 0.0
        total_n = 0
        total_loss = 0.0
        n_batches = 0
        for mb in self.pipeline.eval_batches_sharded(target_nodes,
                                                     batch_size):
            batch = to_device_batch(mb)
            plan = self.feature_source.plan(mb)
            if self.packed_transport == "typed":
                tspec = self._typed_spec((batch, plan), 0)
                key = ("typed-eval", tspec.key())
                fn = self._packed_fns.get(key)
                if fn is None:
                    fn = self.fns.make_typed_eval_step(tspec)
                    self._packed_fns[key] = fn
                pools = tspec.pack((batch, plan), pool=self._buf_pool)
                dev_pools = self._put_pools(pools)
                outs, losses = fn(self.params, self.feat_state,
                                  self.agg_state, dev_pools)
            elif self.packed_transport:
                from gnn_tpu.parallel import packbuf
                spec = packbuf.PackSpec.from_tree((batch, plan), 0)
                key = ("eval", spec.key())
                fn = self._packed_fns.get(key)
                if fn is None:
                    fn = self.fns.make_packed_eval_step(spec)
                    self._packed_fns[key] = fn
                buf = packbuf.pack(
                    spec, (batch, plan),
                    out=None if self._buf_pool is None else
                    self._buf_pool.get(
                        spec.ws, spec.row_bytes + packbuf.TRAILER_BYTES))
                dev_buf = jax.device_put(buf, self._batch_sh)
                outs, losses = fn(self.params, self.feat_state,
                                  self.agg_state, dev_buf)
            else:
                dev_batch = self._put_b(batch)
                dev_plan = self._put_b(plan)
                outs, losses = self.fns.eval_step(
                    self.params, self.feat_state, self.agg_state,
                    dev_batch, dev_plan)
            outs = np.asarray(outs)
            losses = np.asarray(losses)
            for r in range(outs.shape[0]):
                labels = mb.labels[r]
                mask = mb.label_mask[r].astype(bool)
                if not mask.any():  # padded filler replica
                    continue
                proba = np.asarray(predict_proba(outs[r],
                                                 self.sigmoid_loss))
                f1_mic, _ = calc_f1(labels[mask],
                                    proba[: labels.shape[0]][mask],
                                    self.sigmoid_loss)
                n = int(mask.sum())
                total_f1 += f1_mic * n
                total_n += n
                total_loss += float(losses[r])
                n_batches += 1
        return (total_f1 / max(total_n, 1),
                total_loss / max(n_batches, 1))

    def test(self, test_nodes, batch_size: int = 128,
             use_best: bool = True):
        """Full-sweep weighted micro-F1 (reference `main.py:217-241`) —
        evaluated with the *best* checkpoint (the reference intended this
        but had a latent bug running the last model, `main.py:235`)."""
        if use_best and self.best_params is not None:
            saved = self.params
            self.params = put_replicated(self.mesh, self.best_params)
            f1, _ = self.evaluate(test_nodes, batch_size, "test")
            self.params = saved
            return f1
        f1, _ = self.evaluate(test_nodes, batch_size, "test")
        return f1
