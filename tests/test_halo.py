"""Halo-exchange distributed SpMM: must equal the single-matrix product."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
from jax.sharding import NamedSharding, PartitionSpec as P

from gnn_tpu.parallel.halo import (build_halo_plan, make_distributed_spmm,
                                   partition_features)
from gnn_tpu.parallel.mesh import DATA_AXIS, make_mesh


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_distributed_spmm_matches_dense(ndev):
    rng = np.random.RandomState(0)
    n, f = 600, 24
    adj = sp.random(n, n, density=0.02, format="csr", random_state=rng,
                    dtype=np.float32)
    plan, owner = build_halo_plan(adj, ndev)
    mesh = make_mesh(ndev)
    feats = rng.randn(n, f).astype(np.float32)
    x = partition_features(feats, owner, ndev, plan.n_local)

    sh = NamedSharding(mesh, P(DATA_AXIS))
    plan_dev = jax.tree_util.tree_map(
        lambda a: jax.device_put(jnp.asarray(a), sh)
        if hasattr(a, "ndim") else a, plan)
    x_dev = jax.device_put(jnp.asarray(x), sh)

    spmm = make_distributed_spmm(mesh, plan)
    y = np.asarray(spmm(plan_dev, x_dev))

    expected_full = adj @ feats
    for d in range(ndev):
        mine = np.flatnonzero(owner == d)
        np.testing.assert_allclose(y[d, : len(mine)], expected_full[mine],
                                   rtol=1e-4, atol=1e-4)
        # padding rows stay zero
        assert np.allclose(y[d, len(mine):], 0)


def test_halo_plan_partition_covers_all_nodes():
    adj = sp.random(100, 100, density=0.05, format="csr",
                    random_state=np.random.RandomState(1),
                    dtype=np.float32)
    plan, owner = build_halo_plan(adj, 4)
    assert owner.min() == 0 and owner.max() <= 3
    counts = np.bincount(owner, minlength=4)
    assert counts.sum() == 100
    assert plan.n_local >= counts.max()
