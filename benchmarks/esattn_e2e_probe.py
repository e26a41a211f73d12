"""On-chip probe for the canonical-GAT-trains-at-chance bug: compare
`hot_attention_aggregate` on MATERIALIZED stream-tile vs per-edge-cold
adjacencies of the SAME sampled batch — identical hot part, different
cold path — exactly the tensors the e2e step consumes. All CPU /
interpreter checks and the synthetic-buffer TPU smoke pass while the
e2e run does not learn, so the divergence must involve the real
buffers (native direct-to-tiles pack, stack/repad, ShapeBook pads) or
the composed forward.

Stages per layer (raw batch, then stacked G=4 through a ShapeBook):
  1. forward: aggregate(stream) vs aggregate(per-edge) on chip
  2. grads wrt q/k/v of a fixed-weight loss, both routes
  3. if forward diverges: pass-level rowmax/terms drilldown on the
     materialized buffers (kernel vs per-edge oracle on chip)

Run ALONE (single-TPU-process rule):
    PYTHONPATH=/root/.axon_site:/root/repo \
        python benchmarks/esattn_e2e_probe.py
Env: GNN_PROBE_SMALL=1 -> tiny graph (CPU logic validation).
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    os.environ.setdefault("GNN_TPU_SYNTH_CACHE", "/tmp/gnn_tpu_synth")

    from gnn_tpu.data.loaders import load_dataset
    from gnn_tpu.models.gat import hot_attention_aggregate
    from gnn_tpu.ops import pallas_esattn as esat
    from gnn_tpu.ops.hotdense import HotSpec, build_hot_dense
    from gnn_tpu.ops.residentgraph import (ResidentGraph,
                                           build_resident_graph,
                                           materialize_adjs)
    from gnn_tpu.placement.engine import compute_sample_prob
    from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample
    from gnn_tpu.sampling.pipeline import ShapeBook, stack_minibatches
    from gnn_tpu.utils.normalize import build_laplacian

    small = os.environ.get("GNN_PROBE_SMALL") == "1"
    print("backend:", jax.default_backend(), "small:", small,
          flush=True)
    if small:
        ds = "synthetic:nodes=20000,deg=20,feats=64,classes=7"
        hot_k, samp, batch = 2048, 2048, 256
    else:
        ds = "synthetic:nodes=232965,deg=100,feats=602,classes=41"
        hot_k, samp, batch = 32768, 8192, 512
    g = load_dataset(ds, "data")
    lap = build_laplacian(g.adj_full, "gat")
    orders = (1, 1)
    prob = compute_sample_prob(lap, g.train_nodes, sum(orders))
    spec = HotSpec.from_sample_prob(prob, hot_k)
    dense, dense_t = build_hot_dense(lap, spec, np.dtype(np.float32)
                                     if small else jnp.bfloat16)
    host = build_resident_graph(lap, spec, dense, dense_t)
    n, kk = host.pop("n"), host.pop("k")
    host.pop("val_free")
    rg = ResidentGraph(**{f: jnp.asarray(v) for f, v in host.items()},
                       n=n, k=kk)
    del dense, dense_t
    base = dict(batch_size=batch, samp_num=samp, orders=orders,
                num_nodes=lap.shape[0], num_classes=g.labels.shape[1],
                hot_spec=spec, adj_format="resident", compress=False,
                resident_ship_cold=True, resident_val_free=True)
    cfg_s = SamplerConfig(**base, resident_stream_tiles=True)
    cfg_c = SamplerConfig(**base, resident_stream_tiles=False)

    rng = np.random.RandomState(0)
    n_out, H = 512, 1
    # canonical-run score magnitudes are |s| ~ 50-100 (the round-4 NaN
    # fix proved f32-exp-range scores occur); GNN_PROBE_QSCALE scales
    # q/k to probe magnitude-dependent divergence
    qscale = float(os.environ.get("GNN_PROBE_QSCALE", "1"))

    # rg passed as a jit ARGUMENT: closure capture embeds the 4.3 GB
    # tables as program constants, which the remote-compile service
    # rejects (HTTP 413)
    mat_f = jax.jit(materialize_adjs)

    def mat(rg, mb):
        import dataclasses as dcm
        out = mat_f(rg, list(mb.adjs),
                    [jnp.asarray(s) for s in mb.sampled_nodes],
                    jnp.asarray(mb.input_nodes))
        # re-alias the passthrough resident block to the ONE device
        # copy (each jit output otherwise holds its own 2+2 GiB block
        # buffer; the real trainer materializes INSIDE the step jit and
        # never holds these) and free the copies
        fixed = []
        for a in out:
            if a is not None and hasattr(a, "dense") \
                    and a.dense is not None \
                    and a.dense.shape == rg.dense.shape:
                a = dcm.replace(a, dense=rg.dense, dense_t=rg.dense_t)
            fixed.append(a)
        del out
        import gc
        gc.collect()
        return fixed

    def drill(tag, a_s, a_c):
        """Pass-level kernel-vs-oracle on the materialized buffers."""
        nrows, ncols = a_s.nrows, a_s.ncols
        interp = jax.default_backend() != "tpu"
        q = jnp.asarray(rng.randn(nrows, n_out).astype(np.float32)
                        * qscale)
        k = jnp.asarray(rng.randn(ncols, n_out).astype(np.float32)
                        * qscale)
        v = jnp.asarray(rng.randn(ncols, n_out).astype(np.float32))
        er = a_c.rows.astype(jnp.int32)
        ec = a_c.cols.astype(jnp.int32)
        lv = a_c.vals.astype(jnp.float32) != 0
        s = jnp.einsum("ed,ed->e", jnp.take(q, er, axis=0),
                       jnp.take(k, ec, axis=0))
        s = jnp.where(lv, s, -jnp.inf)
        m_or = jax.ops.segment_max(s, er, num_segments=nrows)
        m_es = esat.cold_attention_rowmax(
            a_s.es_coords, a_s.es_rc, a_s.es_off, q, k, n_heads=H,
            bm=a_s.es_bm, bk=a_s.es_bk, interpret=interp)[:, 0]
        has = np.asarray(jax.ops.segment_sum(
            lv.astype(jnp.int32), er, num_segments=nrows)) > 0
        m_es_n, m_or_n = np.asarray(m_es), np.asarray(m_or)
        dmax = float(np.max(np.abs(m_es_n[has] - m_or_n[has]))) \
            if has.any() else 0.0
        print(f"{tag}: rowmax max|d|={dmax:.3e} "
              f"sentinel_ok="
              f"{bool((m_es_n[~has] <= esat.NEG_SENTINEL/2).all())}",
              flush=True)

        rm = jnp.asarray(np.where(has, m_or_n, 0.0).astype(np.float32))
        e_exp = jnp.where(lv, jnp.exp(s - jnp.take(rm, er)), 0.0)
        den_or = jax.ops.segment_sum(e_exp, er, num_segments=nrows)
        num_or = jax.ops.segment_sum(
            e_exp[:, None] * jnp.take(v, ec, axis=0), er,
            num_segments=nrows)
        den_es, num_es = esat.cold_attention_terms(
            a_s.es_coords, a_s.es_rc, a_s.es_off, a_s.es_ord, q, k, v,
            rm[:, None], n_heads=H, bm=a_s.es_bm, bk=a_s.es_bk,
            interpret=interp)
        dd = float(jnp.max(jnp.abs(den_es[:, 0] - den_or)))
        dn = float(jnp.max(jnp.abs(num_es - num_or)))
        print(f"{tag}: den max|d|={dd:.3e} num max|d|={dn:.3e} "
              f"(scales {float(jnp.max(den_or)):.2e} "
              f"{float(jnp.max(jnp.abs(num_or))):.2e})", flush=True)

    def compare(tag, a_s, a_c):
        nrows, ncols = a_s.nrows, a_s.ncols
        q = jnp.asarray(rng.randn(nrows, n_out).astype(np.float32)
                        * qscale)
        k = jnp.asarray(rng.randn(ncols, n_out).astype(np.float32)
                        * qscale)
        v = jnp.asarray(rng.randn(ncols, n_out).astype(np.float32))
        w = jnp.asarray(rng.randn(nrows, n_out).astype(np.float32))

        def loss(adj, q_, k_, v_):
            return jnp.sum(hot_attention_aggregate(adj, q_, k_, v_, H)
                           * w)

        # adj must be a jit ARGUMENT — closure capture embeds the
        # materialized block slices as per-program device constants
        # (HBM exhaustion after a few layers)
        f = jax.jit(lambda adj, q_, k_, v_:
                    hot_attention_aggregate(adj, q_, k_, v_, H))
        gf = jax.jit(jax.grad(loss, argnums=(1, 2, 3)))
        outs, grads = {}, {}
        for nm, adj in (("stream", a_s), ("peredge", a_c)):
            outs[nm] = np.asarray(f(adj, q, k, v))
            grads[nm] = [np.asarray(x) for x in gf(adj, q, k, v)]
        do = float(np.max(np.abs(outs["stream"] - outs["peredge"])))
        so = float(np.max(np.abs(outs["peredge"]))) + 1e-9
        print(f"{tag}: FWD max|d|={do:.3e} (rel {do/so:.2e})",
              flush=True)
        for gi, nm in enumerate("qkv"):
            d = float(np.max(np.abs(grads["stream"][gi]
                                    - grads["peredge"][gi])))
            sc = float(np.max(np.abs(grads["peredge"][gi]))) + 1e-9
            print(f"{tag}: d{nm} max|d|={d:.3e} (rel {d/sc:.2e})",
                  flush=True)
        if do / so > 1e-2:
            drill(tag + " DRILL", a_s, a_c)

    # ---- stage A: raw batches ----
    mb_s = ladies_sample(cfg_s, 0, g.train_nodes[:batch], lap, g.labels)
    mb_c = ladies_sample(cfg_c, 0, g.train_nodes[:batch], lap, g.labels)
    adjs_s, adjs_c = mat(rg, mb_s), mat(rg, mb_c)
    for li, (a_s, a_c) in enumerate(zip(adjs_s, adjs_c)):
        compare(f"raw L{li}", a_s, a_c)

    # ---- stage B: stacked G=4 through a ShapeBook (slice b back out) ----
    import dataclasses

    def slice_b(stacked_adj, b):
        fields = {}
        for f in dataclasses.fields(stacked_adj):
            v = getattr(stacked_adj, f.name)
            if isinstance(v, (np.ndarray, jnp.ndarray)) and v.ndim > 0 \
                    and v.shape[0] == 4:
                fields[f.name] = v[b]
        a = dataclasses.replace(stacked_adj, **fields)
        return dataclasses.replace(
            a, n_valid_rows=np.asarray(a.n_valid_rows).reshape(()),
            n_valid_cols=np.asarray(a.n_valid_cols).reshape(()))

    book = ShapeBook()
    mbs_s = [ladies_sample(cfg_s, i, g.train_nodes[:batch], lap,
                           g.labels) for i in range(4)]
    mbs_c = [ladies_sample(cfg_c, i, g.train_nodes[:batch], lap,
                           g.labels) for i in range(4)]
    st_s = stack_minibatches(mbs_s, book)
    st_c = stack_minibatches(mbs_c, book)
    for b in (0, 3):
        from types import SimpleNamespace
        mb_sb = SimpleNamespace(
            adjs=[slice_b(a, b) for a in st_s.adjs],
            sampled_nodes=[s_[b] for s_ in st_s.sampled_nodes],
            input_nodes=st_s.input_nodes[b])
        mb_cb = SimpleNamespace(
            adjs=[slice_b(a, b) for a in st_c.adjs],
            sampled_nodes=[s_[b] for s_ in st_c.sampled_nodes],
            input_nodes=st_c.input_nodes[b])
        a_sb, a_cb = mat(rg, mb_sb), mat(rg, mb_cb)
        for li, (a_s, a_c) in enumerate(zip(a_sb, a_cb)):
            compare(f"stacked[b{b}] L{li}", a_s, a_c)
    # ---- stage C: the kernels inside lax.scan over the stacked G=4
    # leading axis (the e2e dispatch shape: shard_map(scan(step)));
    # Mosaic under scan is the one context the smoke never ran. The
    # full resident block rides as an explicit jit ARG shared by all
    # scan steps (stacking it 4x or capturing it would blow HBM /
    # the remote-compile size limit) ----
    import dataclasses as dcm

    def stack_mat(st):
        per_b = []
        from types import SimpleNamespace
        for b in range(4):
            mbb = SimpleNamespace(
                adjs=[slice_b(a, b) for a in st.adjs],
                sampled_nodes=[s_[b] for s_ in st.sampled_nodes],
                input_nodes=st.input_nodes[b])
            per_b.append(mat(rg, mbb))
        out = []
        for li in range(len(per_b[0])):
            a0 = per_b[0][li]
            fields = {}
            for f in dataclasses.fields(a0):
                v0 = getattr(a0, f.name)
                if isinstance(v0, jnp.ndarray) and not (
                        hasattr(rg, "dense")
                        and v0.shape == rg.dense.shape):
                    fields[f.name] = jnp.stack(
                        [getattr(per_b[b][li], f.name)
                         for b in range(4)])
            out.append(dataclasses.replace(a0, **fields))
        del per_b
        import gc
        gc.collect()
        return out

    def scan_fwd(a, q, k, v):
        arr = lambda x: isinstance(x, jnp.ndarray) \
            and getattr(x, "ndim", 0) > 0 and x.shape[0] == 4
        leaves = {f.name: getattr(a, f.name)
                  for f in dataclasses.fields(a)
                  if arr(getattr(a, f.name))}
        base = dcm.replace(a, **{k2: None for k2 in leaves})

        def run(lv, dn, dnt, q_, k_, v_):
            def body(_, sl):
                adj = dcm.replace(base, **sl, dense=dn, dense_t=dnt)
                adj = dcm.replace(
                    adj, n_valid_rows=adj.n_valid_rows.reshape(()),
                    n_valid_cols=adj.n_valid_cols.reshape(()))
                return None, hot_attention_aggregate(adj, q_, k_, v_, H)

            return jax.lax.scan(body, None, lv)[1]

        return np.asarray(jax.jit(run)(
            leaves, rg.dense, rg.dense_t, q, k, v))

    st_mat_s = stack_mat(st_s)
    st_mat_c = stack_mat(st_c)
    for li in range(len(st_mat_s)):
        a_s, a_c = st_mat_s[li], st_mat_c[li]
        nrows, ncols = a_s.nrows, a_s.ncols
        q = jnp.asarray(rng.randn(nrows, n_out).astype(np.float32)
                        * qscale)
        k = jnp.asarray(rng.randn(ncols, n_out).astype(np.float32)
                        * qscale)
        v = jnp.asarray(rng.randn(ncols, n_out).astype(np.float32))
        outs_s = scan_fwd(a_s, q, k, v)
        outs_c = scan_fwd(a_c, q, k, v)
        d = float(np.max(np.abs(outs_s - outs_c)))
        sc = float(np.max(np.abs(outs_c))) + 1e-9
        print(f"scan L{li}: FWD max|d|={d:.3e} (rel {d/sc:.2e})",
              flush=True)
    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
