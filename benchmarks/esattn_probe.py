"""Bisect the bwd_kv Mosaic abort: run kernel variants on the chip and
report which combination of (visit order, output count, input keying)
faults. Run ALONE (single-TPU-process rule)."""
from __future__ import annotations

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from gnn_tpu.ops import pallas_esattn as esat
    from gnn_tpu.ops.pallas_edgestream import pack_edge_tiles

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    nr, nc = 512, 768
    key = np.unique(rng.randint(0, nr, 20000).astype(np.int64) * nc
                    + rng.randint(0, nc, 20000))
    rows, cols = (key // nc).astype(np.int32), (key % nc).astype(np.int32)
    t = pack_edge_tiles(rows, cols, nr, nc, bm=256, bk=256, ecap=256,
                        use_native=True)
    t = jax.tree_util.tree_map(jnp.asarray, t)
    H, n_out, d = 1, 512, 512
    q = jnp.asarray(rng.randn(nr, n_out).astype(np.float32))
    k = jnp.asarray(rng.randn(nc, n_out).astype(np.float32))
    v = jnp.asarray(rng.randn(nc, n_out).astype(np.float32))
    rm_p = jnp.zeros((nr, esat.HP), jnp.float32)
    gd_p = jnp.ones((nr, esat.HP), jnp.float32)
    gn = jnp.ones((nr, n_out), jnp.float32)
    on_tpu = jax.default_backend() == "tpu"
    cast = (lambda a: a.astype(jnp.bfloat16)) if on_tpu else (lambda a: a)
    qc, kc, vc, gnc = cast(q), cast(k), cast(v), cast(gn)
    nb = t.blk_rc.shape[0]
    arange = jnp.arange(nb, dtype=jnp.int32)

    ins_kv = [qc, kc, vc, rm_p.T, gd_p.T, gnc]
    tail_kv = [esat._rt_spec((256, n_out)), esat._ct_spec((256, n_out)),
               esat._ct_spec((256, n_out)), esat._rt_spec_t((esat.HP, 256)),
               esat._rt_spec_t((esat.HP, 256)),
               esat._rt_spec((256, n_out))]
    two_out = (jax.ShapeDtypeStruct((nc, n_out), jnp.float32),
               jax.ShapeDtypeStruct((nc, n_out), jnp.float32))
    two_spec = (esat._ct_spec((256, n_out)), esat._ct_spec((256, n_out)))

    def run(name, fn):
        try:
            jax.block_until_ready(fn())
            print(f"{name}: OK", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    kw = dict(bm=256, bk=256, H=H, d=d, interpret=False,
              flops_per_entry=1)
    run("V1 bwd_kv t_order 2-out", lambda: esat._call(
        "bwd_kv", t.coords, t.blk_rc, t.off, t.t_order, ins_kv,
        two_out, two_spec, tail_kv, **kw))
    run("V2 bwd_kv ARANGE 2-out", lambda: esat._call(
        "bwd_kv", t.coords, t.blk_rc, t.off, arange, ins_kv,
        two_out, two_spec, tail_kv, **kw))
    # V3: single-output variant of the same body (dk only) via a probe
    # mode that reuses bwd_kv math but one out — emulate by passing the
    # SAME out spec twice is still 2 outs, so instead test terms with
    # t_order (2 outs keyed rt, permuted order):
    rm_in = [qc, kc, vc, rm_p]
    tail_t = [esat._rt_spec((256, n_out)), esat._ct_spec((256, n_out)),
              esat._ct_spec((256, n_out)), esat._rt_spec((256, esat.HP))]
    run("V4 terms T_ORDER 2-out", lambda: esat._call(
        "terms", t.coords, t.blk_rc, t.off, t.t_order, rm_in,
        (jax.ShapeDtypeStruct((nr, esat.HP), jnp.float32),
         jax.ShapeDtypeStruct((nr, n_out), jnp.float32)),
        (esat._rt_spec((256, esat.HP)), esat._rt_spec((256, n_out))),
        tail_t, **kw))
    run("V5 bwd_q T_ORDER 1-out", lambda: esat._call(
        "bwd_q", t.coords, t.blk_rc, t.off, t.t_order,
        [qc, kc, vc, rm_p, gd_p, gnc],
        jax.ShapeDtypeStruct((nr, n_out), jnp.float32),
        esat._rt_spec((256, n_out)),
        [esat._rt_spec((256, n_out)), esat._ct_spec((256, n_out)),
         esat._ct_spec((256, n_out)), esat._rt_spec((256, esat.HP)),
         esat._rt_spec((256, esat.HP)), esat._rt_spec((256, n_out))],
        **kw))
    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
