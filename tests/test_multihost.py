"""Multi-host helpers (single-process degenerate forms on the virtual
mesh; real multi-process runs exercise the same code paths)."""
import jax
import numpy as np

from gnn_tpu.parallel.multihost import (initialize_multihost,
                                        make_hybrid_mesh,
                                        process_local_rank_span)


def test_initialize_noop_single_process():
    initialize_multihost()  # must not raise or hang


def test_hybrid_mesh_shapes():
    mesh = make_hybrid_mesh(dp=2, part=4)
    assert mesh.shape == {"data": 2, "part": 4}
    mesh1 = make_hybrid_mesh(dp=8, part=1)
    assert mesh1.shape == {"data": 8, "part": 1}


def test_hybrid_mesh_runs_2d_collectives():
    """psum over 'data' x all_gather over 'part' on the 2-D mesh."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    mesh = make_hybrid_mesh(dp=2, part=4)

    def f(x):
        s = jax.lax.psum(x, "data")
        return jax.lax.all_gather(s, "part", axis=0, tiled=True)

    g = jax.jit(jax.shard_map(f, mesh=mesh,
                              in_specs=P("data", "part"),
                              out_specs=P("data", None),
                              check_vma=False))
    x = jnp.arange(2 * 4 * 8.0).reshape(2, 32)
    out = np.asarray(g(x))  # global [2*4, 8]
    blocks = np.asarray(x).reshape(2, 4, 8)
    expected = blocks.sum(axis=0)          # psum over 'data' -> [4, 8]
    np.testing.assert_allclose(out[:4], expected)
    np.testing.assert_allclose(out[4:], expected)


def test_rank_span_covers_all():
    s, e = process_local_rank_span(100)
    assert (s, e) == (0, 100)  # single process owns everything
