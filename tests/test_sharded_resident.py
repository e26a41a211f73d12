"""Part-axis-sharded resident graph (gnn_tpu/parallel/shardedresident):
psum-gather lookups, the partial-psum hot matmul, and the hybrid
DP x part train step must all agree exactly with the replicated
resident path (same batches, same math — only the state layout and the
collectives differ)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gnn_tpu.ops.hotdense import HotSpec, build_hot_dense
from gnn_tpu.ops.residentgraph import ResidentGraph, build_resident_graph
from gnn_tpu.ops.sparse import spmm, spmm_transpose
from gnn_tpu.parallel.shardedresident import (ShardedResidentGraph,
                                              build_sharded_resident,
                                              local_shard)
from gnn_tpu.placement.engine import compute_sample_prob
from gnn_tpu.sampling.ladies import SamplerConfig, ladies_sample
from gnn_tpu.utils.normalize import build_laplacian

N_PARTS = 4


def _part_mesh():
    if jax.device_count() < N_PARTS:
        pytest.skip("needs 4 virtual devices")
    return Mesh(np.asarray(jax.devices()[:N_PARTS]), ("part",))


def _setup(graph, hot_k=256, orders=(1, 1), samp=128, batch=64,
           val_free=True, ship_cold=True):
    lap = build_laplacian(graph.adj_full, "graphsage")
    prob = compute_sample_prob(lap, graph.train_nodes, sum(orders))
    spec = HotSpec.from_sample_prob(prob, hot_k)
    dense, dense_t = build_hot_dense(lap, spec, np.float32)
    cfg = SamplerConfig(batch_size=batch, samp_num=samp, orders=orders,
                        num_nodes=graph.adj_full.shape[0],
                        num_classes=graph.num_classes, hot_spec=spec,
                        adj_format="resident", compress=False,
                        resident_ship_cold=ship_cold,
                        resident_val_free=val_free and ship_cold)
    host = build_resident_graph(lap, spec, dense, dense_t)
    n, k = host.pop("n"), host.pop("k")
    host.pop("val_free")
    g_rep = ResidentGraph(**{f: jnp.asarray(v) for f, v in host.items()},
                          n=n, k=k)
    g_sh, const = build_sharded_resident(lap, spec, dense, dense_t,
                                         N_PARTS,
                                         ship_csr=not ship_cold)
    assert const is True  # binary synthetic adjacency
    return lap, spec, cfg, g_rep, g_sh


def test_sharded_lookups_match_table(small_graph):
    mesh = _part_mesh()
    lap, spec, cfg, g_rep, g_sh = _setup(small_graph)
    n = lap.shape[0]
    rng = np.random.default_rng(0)
    # mix of real ids, the pad id n, and ids inside the last shard's
    # padded tail
    ids = np.concatenate([rng.integers(0, n, 500),
                          [n, n - 1, 0, N_PARTS * g_sh.nsh - 1]])
    ids = jnp.asarray(ids.astype(np.int32))

    def f(gs, ids):
        g = local_shard(gs)
        return (g.slot_lookup(ids)[None], g.rowval_lookup(ids)[None])

    slots, rowv = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P("part"), P()),
        out_specs=(P("part"), P("part")), check_vma=False))(g_sh, ids)
    slots, rowv = np.asarray(slots), np.asarray(rowv)
    want_slot = np.asarray(g_rep.slot_lookup(ids))
    want_rv = np.asarray(g_rep.rowval_lookup(ids))
    # rowval_lookup differs on the pad id by design (clip vs 0) — both
    # are masked downstream; compare real ids exactly
    real = np.asarray(ids) < n
    for p in range(N_PARTS):
        np.testing.assert_array_equal(slots[p], want_slot)
        np.testing.assert_allclose(rowv[p][real], want_rv[real])


@pytest.mark.parametrize("val_free", [True, False])
@pytest.mark.parametrize("orders", [(1, 1), (1, 0, 1)])
def test_sharded_materialize_matches_replicated(small_graph, orders,
                                                val_free):
    """Forward and transpose aggregation through the sharded blocks
    (partial matmul + psum) equal the replicated resident rebuild on
    every part."""
    mesh = _part_mesh()
    lap, spec, cfg, g_rep, g_sh = _setup(small_graph, orders=orders,
                                         val_free=val_free)
    mb = ladies_sample(cfg, 5, small_graph.train_nodes[:64], lap,
                       small_graph.labels)
    adjs = list(mb.adjs)
    samp = [jnp.asarray(s) for s in mb.sampled_nodes]
    inp = jnp.asarray(mb.input_nodes)

    from gnn_tpu.ops.residentgraph import materialize_adjs
    ref_adjs = materialize_adjs(g_rep, adjs, samp, inp)
    rng = np.random.default_rng(1)
    xs = [None if a is None else
          jnp.asarray(rng.normal(size=(a.ncols, 8)).astype(np.float32))
          for a in ref_adjs]
    gs = [None if a is None else
          jnp.asarray(rng.normal(size=(a.nrows, 8)).astype(np.float32))
          for a in ref_adjs]

    def f(g_stacked, adjs, samp, inp, xs, gs):
        g = local_shard(g_stacked)
        mat = materialize_adjs(g, adjs, samp, inp)
        ys = [spmm(a, x)[None] for a, x in zip(mat, xs) if a is not None]
        dxs = [spmm_transpose(a, gg)[None]
               for a, gg in zip(mat, gs) if a is not None]
        return ys, dxs

    ys, dxs = jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(P("part"), P(), P(), P(), P(), P()),
        out_specs=(P("part"), P("part")), check_vma=False))(
        g_sh, adjs, samp, inp, xs, gs)

    li = 0
    for l, a in enumerate(ref_adjs):
        if a is None:
            continue
        want_y = np.asarray(spmm(a, xs[l]))
        want_dx = np.asarray(spmm_transpose(a, gs[l]))
        got_y, got_dx = np.asarray(ys[li]), np.asarray(dxs[li])
        li += 1
        for p in range(N_PARTS):
            np.testing.assert_allclose(got_y[p], want_y, rtol=2e-5,
                                       atol=2e-5, err_msg=f"l{l} p{p}")
            np.testing.assert_allclose(got_dx[p], want_dx, rtol=2e-5,
                                       atol=2e-5, err_msg=f"l{l} p{p}")


def test_sharded_full_expansion_matches_replicated(small_graph):
    """Full-expansion mode (``resident_ship_cold=False``, zero per-edge
    payload) on the part-sharded mesh: each part expands only the CSR
    row ranges it owns and one psum of the partial cold aggregation
    restores the replicated rebuild exactly (this combination used to
    raise NotImplementedError)."""
    mesh = _part_mesh()
    lap, spec, cfg, g_rep, g_sh = _setup(small_graph, ship_cold=False)
    assert g_sh.row_ptr_shard is not None
    mb = ladies_sample(cfg, 5, small_graph.train_nodes[:64], lap,
                       small_graph.labels)
    adjs = list(mb.adjs)
    # full-expansion refs ship nothing per-edge
    assert adjs[0].cols is None and adjs[0].e_cap > 0
    samp = [jnp.asarray(s) for s in mb.sampled_nodes]
    inp = jnp.asarray(mb.input_nodes)

    from gnn_tpu.ops.residentgraph import materialize_adjs
    ref_adjs = materialize_adjs(g_rep, adjs, samp, inp)
    rng = np.random.default_rng(1)
    xs = [jnp.asarray(rng.normal(size=(a.ncols, 8)).astype(np.float32))
          for a in ref_adjs]
    gs = [jnp.asarray(rng.normal(size=(a.nrows, 8)).astype(np.float32))
          for a in ref_adjs]

    def f(g_stacked, adjs, samp, inp, xs, gs):
        g = local_shard(g_stacked)
        mat = materialize_adjs(g, adjs, samp, inp)
        assert all(a.cold_partial for a in mat)
        ys = [spmm(a, x)[None] for a, x in zip(mat, xs)]
        dxs = [spmm_transpose(a, gg)[None] for a, gg in zip(mat, gs)]
        return ys, dxs

    ys, dxs = jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(P("part"), P(), P(), P(), P(), P()),
        out_specs=(P("part"), P("part")), check_vma=False))(
        g_sh, adjs, samp, inp, xs, gs)

    for l, a in enumerate(ref_adjs):
        want_y = np.asarray(spmm(a, xs[l]))
        want_dx = np.asarray(spmm_transpose(a, gs[l]))
        got_y, got_dx = np.asarray(ys[l]), np.asarray(dxs[l])
        for p in range(N_PARTS):
            np.testing.assert_allclose(got_y[p], want_y, rtol=2e-5,
                                       atol=2e-5, err_msg=f"l{l} p{p}")
            np.testing.assert_allclose(got_dx[p], want_dx, rtol=2e-5,
                                       atol=2e-5, err_msg=f"l{l} p{p}")


def test_sharded_full_expansion_trainer_matches_replicated(small_graph):
    """Trainer plumbing for the sharded full-expansion mode
    (``resident_parts=4, resident_ship_cold=False``): one epoch + val
    match the replicated full-expansion trainer."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.parallel.multihost import make_hybrid_mesh
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer

    lap, spec, cfg, g_rep, g_sh = _setup(small_graph, ship_cold=False)
    from gnn_tpu.ops.hotdense import build_hot_dense
    from gnn_tpu.ops.residentgraph import build_resident_graph
    dense, dense_t = build_hot_dense(lap, spec, np.float32)
    host = build_resident_graph(lap, spec, dense, dense_t)

    results = {}
    for name, mesh, parts in [
            ("rep", make_mesh(2), 0),
            ("sharded", make_hybrid_mesh(dp=2, part=N_PARTS), N_PARTS)]:
        pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                             pool_num=2)
        net = build_model("graphsage", nhid=32, orders=cfg.orders,
                          num_classes=small_graph.num_classes)
        tr = Trainer(net, pipe, small_graph.feats, mesh=mesh, lr=0.05,
                     sigmoid_loss=False, seed=3, resident_graph=host,
                     resident_parts=parts)
        m = tr.train_epoch(small_graph.train_nodes, epoch=0)
        f1, vloss = tr.evaluate(small_graph.valid_nodes, 128, "val")
        results[name] = (m.train_loss, vloss, f1)

    assert results["sharded"][0] == pytest.approx(results["rep"][0],
                                                  abs=2e-4)
    assert results["sharded"][1] == pytest.approx(results["rep"][1],
                                                  abs=2e-3)
    assert results["sharded"][2] == pytest.approx(results["rep"][2],
                                                  abs=2e-2)


@pytest.mark.parametrize("ship_cold", [True, False])
def test_sharded_hot_attention_matches_replicated(small_graph,
                                                  ship_cold):
    """GAT hot-block attention on the part-sharded resident state: each
    part masks to its owned slot columns and the softmax terms combine
    via pmax/psum — outputs equal the replicated hot attention on every
    part, in both lite (replicated cold) and sharded full-expansion
    (cold_partial) modes."""
    mesh = _part_mesh()
    lap, spec, cfg, g_rep, g_sh = _setup(small_graph,
                                         ship_cold=ship_cold)
    mb = ladies_sample(cfg, 7, small_graph.train_nodes[:64], lap,
                       small_graph.labels)
    adjs = list(mb.adjs)
    samp = [jnp.asarray(s) for s in mb.sampled_nodes]
    inp = jnp.asarray(mb.input_nodes)

    from gnn_tpu.models.gat import GATConv
    from gnn_tpu.ops.residentgraph import materialize_adjs
    ref_adjs = materialize_adjs(g_rep, adjs, samp, inp)
    a_rep = ref_adjs[0]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(a_rep.ncols, 16)).astype(np.float32))
    conv = GATConv(n_out=32, n_heads=2)
    variables = conv.init(jax.random.PRNGKey(0), x, a_rep, samp[0])
    want = np.asarray(conv.apply(variables, x, a_rep, samp[0]))

    n_rows = int(np.asarray(a_rep.n_valid_rows))

    def loss(vars_, adj):
        return jnp.sum(conv.apply(vars_, x, adj, samp[0])[:n_rows] ** 2)

    want_grad = jax.grad(loss)(variables, a_rep)

    def f(g_stacked, adjs, samp, inp):
        g = local_shard(g_stacked)
        mat = materialize_adjs(g, adjs, samp, inp)
        out = conv.apply(variables, x, mat[0], samp[0])[None]
        # training must differentiate THROUGH the sharded attention
        # (pmax rides behind stop_gradient; the psums transpose cleanly)
        grads = jax.grad(loss)(variables, mat[0])
        return out, jax.tree_util.tree_map(lambda a: a[None], grads)

    got, got_grads = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P("part"), P(), P(), P()),
        out_specs=(P("part"), P("part")), check_vma=False))(
        g_sh, adjs, samp, inp)
    got = np.asarray(got)
    for p in range(N_PARTS):
        np.testing.assert_allclose(got[p][:n_rows], want[:n_rows],
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"p{p}")
    jax.tree_util.tree_map(
        lambda a, b: [np.testing.assert_allclose(
            np.asarray(a)[p], np.asarray(b), rtol=5e-3, atol=5e-4)
            for p in range(N_PARTS)],
        got_grads, want_grad)


def test_sharded_train_step_matches_dp(small_graph):
    """One DP(2) x part(4) hybrid train step == the plain DP(2) step
    with the replicated resident graph: identical loss and parameters
    (the sharded hot psum reconstructs the same layer outputs, and the
    gradient psum spans only the data axis)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import optax

    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.mesh import make_mesh, put_replicated
    from gnn_tpu.parallel.multihost import make_hybrid_mesh
    from gnn_tpu.sampling.ladies import to_device_batch
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import (ReplicatedFeatures,
                                       build_step_fns, prepare_adjs)

    lap, spec, cfg, g_rep, g_sh = _setup(small_graph)
    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                         pool_num=2)
    mbs = list(pipe.train_epoch(small_graph.train_nodes, epoch=0))[:2]
    net = build_model("graphsage", nhid=16, orders=cfg.orders,
                      num_classes=small_graph.num_classes)
    feats = ReplicatedFeatures(small_graph.feats)
    opt = optax.adam(0.05)

    batch0 = to_device_batch(mbs[0])
    one = jax.tree_util.tree_map(lambda a: a[0], batch0)
    x0 = jnp.zeros((one.input_nodes.shape[0], small_graph.feats.shape[1]),
                   jnp.float32)
    params0 = net.init(jax.random.PRNGKey(0), x0,
                       prepare_adjs(one, (g_rep,)),
                       list(one.sampled_nodes))
    rng = jax.random.PRNGKey(7)

    results = {}
    for name, mesh, agg, part_axis in [
            ("dp", make_mesh(2), (g_rep,), None),
            ("hybrid", make_hybrid_mesh(dp=2, part=N_PARTS), (g_sh,),
             "part")]:
        fns = build_step_fns(net, opt, False, mesh, feats,
                             part_axis=part_axis)
        # fresh buffers per mesh: the donated train step deletes its
        # inputs, and device_put can alias on the CPU backend
        copy = jax.tree_util.tree_map(jnp.array, params0)
        params = put_replicated(mesh, copy)
        opt_state = put_replicated(mesh, opt.init(copy))
        feat_state = put_replicated(mesh, feats.state())
        losses = []
        for mb in mbs:
            batch = to_device_batch(mb)
            plan = feats.plan(mb)
            params, opt_state, loss = fns.train_step(
                params, opt_state, feat_state, agg, batch, plan, rng)
            losses.append(float(loss))
        results[name] = (jax.tree_util.tree_map(np.asarray, params),
                         losses)

    np.testing.assert_allclose(results["hybrid"][1], results["dp"][1],
                               rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4,
                                                atol=2e-5),
        results["hybrid"][0], results["dp"][0])


def test_sharded_multi_step_and_eval_match_dp(small_graph):
    """The grouped lax.scan train path and the sharded eval path also
    work with part-sharded aggregation state: G=2 steps in one dispatch
    match the plain DP multi-step, and eval losses agree."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import optax

    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.mesh import make_mesh, put_replicated
    from gnn_tpu.parallel.multihost import make_hybrid_mesh
    from gnn_tpu.sampling.ladies import to_device_batch
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import (ReplicatedFeatures,
                                       build_step_fns, prepare_adjs)

    lap, spec, cfg, g_rep, g_sh = _setup(small_graph)
    pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                         pool_num=2)
    mbs = list(pipe.train_epoch(small_graph.train_nodes, epoch=0))[:2]
    net = build_model("graphsage", nhid=16, orders=cfg.orders,
                      num_classes=small_graph.num_classes)
    feats = ReplicatedFeatures(small_graph.feats)
    opt = optax.adam(0.05)

    batch0 = to_device_batch(mbs[0])
    one = jax.tree_util.tree_map(lambda a: a[0], batch0)
    x0 = jnp.zeros((one.input_nodes.shape[0], small_graph.feats.shape[1]),
                   jnp.float32)
    params0 = net.init(jax.random.PRNGKey(0), x0,
                       prepare_adjs(one, (g_rep,)),
                       list(one.sampled_nodes))
    rng = jax.random.PRNGKey(7)
    rngs = jnp.stack([rng, jax.random.fold_in(rng, 1)])
    valid = jnp.array([True, True])

    gmb, n_valid = next(iter(pipe.train_epoch_grouped(
        small_graph.train_nodes, epoch=0, group=2)))
    assert n_valid == 2
    batches = to_device_batch(gmb)
    plans = ()

    results = {}
    for name, mesh, agg, part_axis in [
            ("dp", make_mesh(2), (g_rep,), None),
            ("hybrid", make_hybrid_mesh(dp=2, part=N_PARTS), (g_sh,),
             "part")]:
        fns = build_step_fns(net, opt, False, mesh, feats,
                             part_axis=part_axis)
        copy = jax.tree_util.tree_map(jnp.array, params0)
        params = put_replicated(mesh, copy)
        opt_state = put_replicated(mesh, opt.init(copy))
        feat_state = put_replicated(mesh, feats.state())
        params, opt_state, losses = fns.train_multi_step(
            params, opt_state, feat_state, agg, batches, plans, rngs,
            valid)
        _, eloss = fns.eval_step(params, feat_state, agg, batch0,
                                 feats.plan(mbs[0]))
        results[name] = (np.asarray(losses), np.asarray(eloss))

    np.testing.assert_allclose(results["hybrid"][0], results["dp"][0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results["hybrid"][1], results["dp"][1],
                               rtol=1e-5, atol=1e-6)


def test_sharded_trainer_e2e_matches_replicated(small_graph):
    """Full Trainer plumbing (`resident_parts=4` on the hybrid mesh):
    one epoch of training + val evaluation + full test sweep match the
    replicated resident trainer (same seeds; only the state layout and
    collectives differ)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.parallel.multihost import make_hybrid_mesh
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer

    lap, spec, cfg, g_rep, g_sh = _setup(small_graph)
    from gnn_tpu.ops.hotdense import build_hot_dense
    from gnn_tpu.ops.residentgraph import build_resident_graph
    dense, dense_t = build_hot_dense(lap, spec, np.float32)
    host = build_resident_graph(lap, spec, dense, dense_t)

    from gnn_tpu.parallel.feature_cache import PartShardedFeatures
    results = {}
    for name, mesh, parts in [
            ("rep", make_mesh(2), 0),
            ("sharded", make_hybrid_mesh(dp=2, part=N_PARTS), N_PARTS)]:
        pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                             pool_num=2)
        net = build_model("graphsage", nhid=32, orders=cfg.orders,
                          num_classes=small_graph.num_classes)
        # the sharded config also shards the FEATURE table over 'part'
        # (psum gather) — equality vs the replicated-table run below
        # proves the whole sharded input path exact
        src = (PartShardedFeatures(small_graph.feats, parts)
               if parts else None)
        tr = Trainer(net, pipe, small_graph.feats, mesh=mesh, lr=0.05,
                     sigmoid_loss=False, seed=3, resident_graph=host,
                     resident_parts=parts, feature_source=src)
        m = tr.train_epoch(small_graph.train_nodes, epoch=0)
        f1, vloss = tr.evaluate(small_graph.valid_nodes, 128, "val")
        test_f1 = tr.test(small_graph.test_nodes, batch_size=128)
        results[name] = (m.train_loss, vloss, f1, test_f1)

    assert results["sharded"][0] == pytest.approx(results["rep"][0],
                                                  abs=2e-4)
    assert results["sharded"][1] == pytest.approx(results["rep"][1],
                                                  abs=2e-3)
    assert results["sharded"][2] == pytest.approx(results["rep"][2],
                                                  abs=2e-2)
    assert results["sharded"][3] == pytest.approx(results["rep"][3],
                                                  abs=2e-2)


def _sharded_trainer(graph):
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.ops.hotdense import build_hot_dense
    from gnn_tpu.ops.residentgraph import build_resident_graph
    from gnn_tpu.parallel.multihost import make_hybrid_mesh
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer

    lap, spec, cfg, g_rep, g_sh = _setup(graph)
    dense, dense_t = build_hot_dense(lap, spec, np.float32)
    host = build_resident_graph(lap, spec, dense, dense_t)
    pipe = BatchPipeline(cfg, lap, graph.labels, world_size=2,
                         pool_num=2)
    net = build_model("graphsage", nhid=32, orders=cfg.orders,
                      num_classes=graph.num_classes)
    return Trainer(net, pipe, graph.feats,
                   mesh=make_hybrid_mesh(dp=2, part=N_PARTS), lr=0.05,
                   sigmoid_loss=False, seed=3, resident_graph=host,
                   resident_parts=N_PARTS)


def test_sharded_resume_reproduces_loss_curve(small_graph, tmp_path):
    """Exact-replay resume holds with part-sharded aggregation state
    (checkpoints carry params/opt_state only; the sharded state is
    rebuilt at construction, and sampling/dropout are epoch-keyed)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    tr_full = _sharded_trainer(small_graph)
    hist_full = tr_full.fit(small_graph.train_nodes,
                            small_graph.valid_nodes, epochs=3, log=False)
    ck = str(tmp_path / "sh_ck")
    tr_a = _sharded_trainer(small_graph)
    tr_a.fit(small_graph.train_nodes, small_graph.valid_nodes, epochs=1,
             log=False, checkpoint_dir=ck)
    del tr_a
    tr_b = _sharded_trainer(small_graph)
    hist_b = tr_b.fit(small_graph.train_nodes, small_graph.valid_nodes,
                      epochs=3, log=False, checkpoint_dir=ck,
                      resume=True)
    assert [m.epoch for m in hist_b] == [1, 2]
    for m_resumed in hist_b:
        np.testing.assert_allclose(
            m_resumed.train_loss, hist_full[m_resumed.epoch].train_loss,
            rtol=1e-5)


def test_sharded_init_shape_only_and_all_leaves_sharded(small_graph,
                                                        monkeypatch):
    """Param init with ``resident_parts`` must (a) never run the
    resident rebuild eagerly (that would materialize the full [k, k]
    blocks on the default device — the OOM `resident_parts` exists to
    avoid), (b) yield bit-identical params to the replicated-path init
    (params depend on shapes only), and (c) leave NO unsharded leaf in
    the trainer's aggregation state."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.ops.hotdense import build_hot_dense
    from gnn_tpu.ops.residentgraph import build_resident_graph
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.parallel.multihost import make_hybrid_mesh
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer

    lap, spec, cfg, g_rep, g_sh = _setup(small_graph)
    dense, dense_t = build_hot_dense(lap, spec, np.float32)
    host = build_resident_graph(lap, spec, dense, dense_t)

    def build(parts):
        pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                             pool_num=2)
        net = build_model("graphsage", nhid=32, orders=cfg.orders,
                          num_classes=small_graph.num_classes)
        mesh = (make_hybrid_mesh(dp=2, part=N_PARTS) if parts
                else make_mesh(2))
        return Trainer(net, pipe, small_graph.feats, mesh=mesh, lr=0.05,
                       sigmoid_loss=False, seed=3, resident_graph=host,
                       resident_parts=parts)

    tr_rep = build(0)
    tr_sh = build(N_PARTS)

    # (c) every array leaf of the sharded agg_state is part-sharded
    leaves = jax.tree_util.tree_leaves(tr_sh.agg_state)
    assert leaves, "sharded agg_state has no leaves?"
    for leaf in leaves:
        assert not leaf.sharding.is_fully_replicated, leaf.shape
        assert leaf.sharding.spec[0] == "part", leaf.sharding.spec

    # (a) init must not touch the resident rebuild (shape-only stubs)
    import gnn_tpu.ops.residentgraph as rgmod

    def boom(*a, **k):
        raise AssertionError("materialize_adjs ran during param init")

    batch = tr_sh._peek_batch(small_graph.train_nodes)
    monkeypatch.setattr(rgmod, "materialize_adjs", boom)
    tr_sh._init_params(batch)
    monkeypatch.undo()
    tr_rep._init_params(batch)

    # (b) bit-identical params (flax param RNG depends only on module
    # structure and input shapes, never on adjacency values)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        tr_sh.params, tr_rep.params)


def test_sharded_op_timing_produces_numbers(small_graph):
    """`--op_timing` on the part-sharded path: the shard_mapped probes
    must return finite spmm fwd/bwd + communication buckets (this used
    to return NaN under part sharding)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    tr = _sharded_trainer(small_graph)
    tr.train_epoch(small_graph.train_nodes, epoch=0)
    fwd, bwd, comm = tr.measure_op_buckets()
    assert np.isfinite(fwd) and fwd > 0
    assert np.isfinite(bwd) and bwd > 0
    assert np.isfinite(comm) and comm > 0


def test_sharded_memory_divides(small_graph):
    """The per-part resident footprint is ~1/P of the replicated one
    (the reason this mode exists: MAG240M-class state per chip)."""
    lap, spec, cfg, g_rep, g_sh = _setup(small_graph)
    rep_bytes = sum(np.asarray(a).nbytes for a in
                    jax.tree_util.tree_leaves(
                        (g_rep.slot_of_node, g_rep.row_val, g_rep.dense,
                         g_rep.dense_t)))
    part_bytes = sum(np.asarray(a).nbytes // N_PARTS for a in
                     jax.tree_util.tree_leaves(g_sh))
    assert part_bytes <= rep_bytes / N_PARTS * 1.05


def _per_device_committed_bytes(tree):
    """Sum of COMMITTED backend buffer bytes per device over every array
    leaf — `Shard.data.nbytes` is the real allocated shard buffer, not a
    shape-derived estimate (a replicated leaf contributes its full size
    on EVERY device; a part-sharded leaf 1/P on each)."""
    per_dev = {}
    for leaf in jax.tree_util.tree_leaves(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        seen = set()
        for s in leaf.addressable_shards:
            if s.device in seen:  # one buffer per device per leaf
                continue
            seen.add(s.device)
            per_dev[s.device] = per_dev.get(s.device, 0) + s.data.nbytes
    return per_dev


def test_sharded_trainer_hbm_divides_by_P(small_graph):
    """Memory-honest evidence for the sharded-resident claims: build the
    Trainer at a K where the resident blocks dominate (2x [K,K] f32 =
    32 MiB, >> params/features) and assert each device's COMMITTED bytes
    for (agg_state, feat_state) are ~1/P of the replicated trainer's —
    measured from backend shard buffers, not array shapes."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    from gnn_tpu.data.synthetic import make_powerlaw_graph
    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.ops.hotdense import HotSpec, build_hot_dense
    from gnn_tpu.ops.residentgraph import build_resident_graph
    from gnn_tpu.parallel.feature_cache import PartShardedFeatures
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.parallel.multihost import make_hybrid_mesh
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer

    P_ = 8
    graph = make_powerlaw_graph(6000, 10, 32, 7, seed=0)
    lap = build_laplacian(graph.adj_full, "graphsage")
    prob = compute_sample_prob(lap, graph.train_nodes, 2)
    spec = HotSpec.from_sample_prob(prob, 2048)
    assert spec.k == 2048
    dense, dense_t = build_hot_dense(lap, spec, np.float32)
    host = build_resident_graph(lap, spec, dense, dense_t)
    cfg = SamplerConfig(batch_size=32, samp_num=64, orders=(1, 1),
                        num_nodes=6000, num_classes=7, hot_spec=spec,
                        adj_format="resident", compress=False,
                        resident_ship_cold=True, resident_val_free=True)

    footprints = {}
    for name, mesh, parts in [
            ("rep", make_mesh(1), 0),
            ("sharded", make_hybrid_mesh(dp=1, part=P_), P_)]:
        pipe = BatchPipeline(cfg, lap, graph.labels, world_size=1,
                             pool_num=2)
        net = build_model("graphsage", nhid=16, orders=(1, 1),
                          num_classes=7)
        src = (PartShardedFeatures(graph.feats, parts) if parts
               else None)
        tr = Trainer(net, pipe, graph.feats, mesh=mesh, lr=0.05,
                     sigmoid_loss=False, seed=3, resident_graph=host,
                     resident_parts=parts, feature_source=src)
        footprints[name] = _per_device_committed_bytes(
            (tr.agg_state, tr.feat_state))
        del tr

    rep_total = sum(footprints["rep"].values())  # one device, full copy
    assert rep_total > 32 * 2 ** 20  # the 2x[K,K] blocks dominate
    sharded = footprints["sharded"]
    assert len(sharded) == P_, "state missing on some devices"
    for dev, nbytes in sharded.items():
        # per-chip committed bytes divide by P (pad rows allow ~6%)
        assert nbytes <= rep_total / P_ * 1.06, (
            dev, nbytes, rep_total / P_)


def test_sharded_gat_stream_trainer_matches_replicated(small_graph):
    """GAT + SDDMM-direction edge-stream cold attention under
    part-sharded resident state: the hot blocks shard by slot columns
    (partial scores + pmax/psum softmax combine) while the stream-tile
    cold attention runs replicated (lite mode) — one epoch + val must
    match the replicated resident run (same seeds). This is the full
    composition of gnn_tpu.ops.pallas_esattn with
    gnn_tpu.parallel.shardedresident through the Trainer."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    import dataclasses

    from gnn_tpu.models.gnn import build_model
    from gnn_tpu.parallel.feature_cache import PartShardedFeatures
    from gnn_tpu.parallel.mesh import make_mesh
    from gnn_tpu.parallel.multihost import make_hybrid_mesh
    from gnn_tpu.sampling.pipeline import BatchPipeline
    from gnn_tpu.train.trainer import Trainer

    lap, spec, cfg, g_rep, g_sh = _setup(small_graph)
    cfg = dataclasses.replace(cfg, resident_stream_tiles=True)
    from gnn_tpu.ops.residentgraph import build_resident_graph
    dense, dense_t = build_hot_dense(lap, spec, np.float32)
    host = build_resident_graph(lap, spec, dense, dense_t)

    results = {}
    for name, mesh, parts in [
            ("rep", make_mesh(2), 0),
            ("sharded", make_hybrid_mesh(dp=2, part=N_PARTS),
             N_PARTS)]:
        pipe = BatchPipeline(cfg, lap, small_graph.labels, world_size=2,
                             pool_num=2)
        net = build_model("gat", nhid=32, orders=cfg.orders,
                          num_classes=small_graph.num_classes)
        src = (PartShardedFeatures(small_graph.feats, parts)
               if parts else None)
        tr = Trainer(net, pipe, small_graph.feats, mesh=mesh, lr=0.05,
                     sigmoid_loss=False, seed=3, resident_graph=host,
                     resident_parts=parts, feature_source=src)
        m = tr.train_epoch(small_graph.train_nodes, epoch=0)
        f1, vloss = tr.evaluate(small_graph.valid_nodes, 128, "val")
        results[name] = (m.train_loss, vloss, f1)

    assert results["sharded"][0] == pytest.approx(results["rep"][0],
                                                  abs=2e-4)
    assert results["sharded"][1] == pytest.approx(results["rep"][1],
                                                  abs=2e-3)
    assert results["sharded"][2] == pytest.approx(results["rep"][2],
                                                  abs=2e-2)
