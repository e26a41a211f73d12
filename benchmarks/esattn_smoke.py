"""On-chip smoke + microbench of the edge-stream ATTENTION kernels
(`gnn_tpu.ops.pallas_esattn`): compile the real (non-interpret) Mosaic
kernels at deployed tile shapes, check forward + VJP against the
interpreter, and time the four passes at a canonical-cold-layer-sized
entry count.

Run alone (single-TPU-process rule):
    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/esattn_smoke.py
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from gnn_tpu.ops import pallas_esattn as esat
    from gnn_tpu.ops.pallas_edgestream import pack_edge_tiles

    on_tpu = jax.default_backend() == "tpu"
    print(f"backend: {jax.default_backend()}", flush=True)

    rng = np.random.RandomState(0)
    # small correctness shapes (2x3 tiles of 256x256)
    nr, nc = 512, 768
    nnz = 20000
    key = np.unique(rng.randint(0, nr, nnz).astype(np.int64) * nc
                    + rng.randint(0, nc, nnz))
    rows, cols = (key // nc).astype(np.int32), (key % nc).astype(np.int32)
    t = pack_edge_tiles(rows, cols, nr, nc, bm=256, bk=256, ecap=256,
                        use_native=True)
    t = jax.tree_util.tree_map(jnp.asarray, t)

    for H in (1, 4):
        n_out = 512
        d = n_out // H
        q = jnp.asarray(rng.randn(nr, n_out).astype(np.float32))
        k = jnp.asarray(rng.randn(nc, n_out).astype(np.float32))
        v = jnp.asarray(rng.randn(nc, n_out).astype(np.float32))
        kw = dict(n_heads=H, bm=256, bk=256)

        def stage(name, fn):
            try:
                out = jax.block_until_ready(fn())
                print(f"H={H} {name}: OK", flush=True)
                return out
            except Exception as e:
                print(f"H={H} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:600]}", flush=True)
                raise SystemExit(1)

        m_intp = esat.cold_attention_rowmax(t.coords, t.blk_rc, t.off,
                                            q, k, interpret=True, **kw)
        m_real = stage("rowmax", lambda: esat.cold_attention_rowmax(
            t.coords, t.blk_rc, t.off, q, k, **kw))
        dm = float(jnp.max(jnp.abs(m_real - m_intp)))
        rm = jnp.where(m_intp > esat.NEG_SENTINEL / 2, m_intp, 0.0)
        rm_p = jnp.zeros((nr, esat.HP), jnp.float32).at[:, :H].set(rm)

        # staged per-kernel checks (pinpoint which Mosaic program
        # faults; each blocks before the next launches)
        terms_r = stage("terms-fwd", lambda: esat._terms_fwd_call(
            t.coords, t.blk_rc, t.off, rm_p, q, k, v, H=H, bm=256,
            bk=256, interpret=False))
        gden = jnp.ones((nr, esat.HP), jnp.float32)
        gnum = jnp.ones((nr, n_out), jnp.float32)
        ins = [a.astype(jnp.bfloat16) if on_tpu else a
               for a in (q, k, v)] + [rm_p, gden,
                                      gnum.astype(jnp.bfloat16)
                                      if on_tpu else gnum]
        tail = [esat._rt_spec((256, n_out)), esat._ct_spec((256, n_out)),
                esat._ct_spec((256, n_out)), esat._rt_spec((256, esat.HP)),
                esat._rt_spec((256, esat.HP)),
                esat._rt_spec((256, n_out))]
        nb = t.blk_rc.shape[0]
        stage("bwd-q", lambda: esat._call(
            "bwd_q", t.coords, t.blk_rc, t.off,
            jnp.arange(nb, dtype=jnp.int32), ins,
            jax.ShapeDtypeStruct((nr, n_out), jnp.float32),
            esat._rt_spec((256, n_out)), tail,
            bm=256, bk=256, H=H, d=d, interpret=False,
            flops_per_entry=1))
        ins_kv = ins[:3] + [ins[3].T, ins[4].T, ins[5]]
        tail_kv = [esat._rt_spec((256, n_out)),
                   esat._ct_spec((256, n_out)),
                   esat._ct_spec((256, n_out)),
                   esat._rt_spec_t((esat.HP, 256)),
                   esat._rt_spec_t((esat.HP, 256)),
                   esat._rt_spec((256, n_out))]
        stage("bwd-kv", lambda: esat._call(
            "bwd_kv", t.coords, t.blk_rc, t.off, t.t_order, ins_kv,
            (jax.ShapeDtypeStruct((nc, n_out), jnp.float32),
             jax.ShapeDtypeStruct((nc, n_out), jnp.float32)),
            (esat._ct_spec((256, n_out)), esat._ct_spec((256, n_out))),
            tail_kv, bm=256, bk=256, H=H, d=d, interpret=False,
            flops_per_entry=1))

        def loss(fn_interp, q_, k_, v_):
            dn, nm = esat.cold_attention_terms(
                t.coords, t.blk_rc, t.off, t.t_order, q_, k_, v_, rm,
                interpret=fn_interp, **kw)
            return jnp.sum(nm ** 2) + jnp.sum(dn ** 2)

        g_real = stage("full-grad", lambda: jax.grad(
            loss, argnums=(1, 2, 3))(False, q, k, v))
        g_intp = jax.grad(loss, argnums=(1, 2, 3))(True, q, k, v)
        rel = [float(jnp.max(jnp.abs(a - b))
                     / (jnp.max(jnp.abs(b)) + 1e-9))
               for a, b in zip(g_real, g_intp)]
        print(f"H={H}: rowmax max|d|={dm:.2e}  "
              f"grad rel err q/k/v = {rel[0]:.2e} {rel[1]:.2e} "
              f"{rel[2]:.2e}", flush=True)
        # bf16 MXU on chip vs f32 interpreter: loose tolerance
        tol = 5e-2 if on_tpu else 1e-4
        assert dm < (0.05 if on_tpu else 1e-4), dm
        assert all(r < tol for r in rel), rel

    # ---- timing at canonical-cold-layer scale (L1-ish: ~2120 entries,
    # 256x256, F=512) ----
    if not on_tpu:
        print("CPU backend: skipping timing", flush=True)
        return
    from benchmarks.timing import chain_time

    nr2, nc2 = 8704 // 256 * 256, 16896 // 256 * 256
    e2 = 214_000
    key = np.unique(rng.randint(0, nr2, e2).astype(np.int64) * nc2
                    + rng.randint(0, nc2, e2))
    r2, c2 = (key // nc2).astype(np.int32), (key % nc2).astype(np.int32)
    t2 = pack_edge_tiles(r2, c2, nr2, nc2, bm=256, bk=256, ecap=256,
                         use_native=True)
    nb = int(t2.blk_rc.shape[0])
    t2 = jax.tree_util.tree_map(jnp.asarray, t2)
    H, n_out = 1, 512
    q = jnp.asarray(rng.randn(nr2, n_out).astype(np.float32))
    k = jnp.asarray(rng.randn(nc2, n_out).astype(np.float32))
    v = jnp.asarray(rng.randn(nc2, n_out).astype(np.float32))
    kw = dict(n_heads=H, bm=256, bk=256)
    m = esat.cold_attention_rowmax(t2.coords, t2.blk_rc, t2.off, q, k,
                                   **kw)
    rm = jnp.where(m > esat.NEG_SENTINEL / 2, m, 0.0)

    def f_max(q_, k_):
        return esat.cold_attention_rowmax(t2.coords, t2.blk_rc, t2.off,
                                          q_, k_, **kw)

    def f_terms(q_, k_, v_):
        return esat.cold_attention_terms(t2.coords, t2.blk_rc, t2.off,
                                         t2.t_order, q_, k_, v_, rm,
                                         **kw)

    def loss2(q_, k_, v_):
        dn, nm = f_terms(q_, k_, v_)
        return jnp.sum(nm ** 2) + jnp.sum(dn ** 2)

    grad2 = jax.jit(jax.grad(loss2, argnums=(0, 1, 2)))
    t_max = chain_time(lambda q_, kk: f_max(q_, kk)[:, :1], q, n=8,
                       args=(k,))
    t_fwd = chain_time(lambda q_, kk: f_terms(q_, kk, v)[1], q, n=8,
                       args=(k,))
    t_all = chain_time(lambda q_, kk: grad2(q_, kk, v)[0], q, n=8,
                       args=(k,))
    print(f"esattn timing ({nb} entries, F=512, H=1): "
          f"max {t_max * 1e3:.2f} ms, fwd-terms {t_fwd * 1e3:.2f} ms, "
          f"fwd+max+bwd(jit grad) {t_all * 1e3:.2f} ms "
          f"({t_all / nb * 1e6:.2f} us/entry full)", flush=True)
    print("SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
