"""Multi-controller smoke test: 2 real OS processes form a JAX
distributed cluster over localhost and psum across their devices —
the actual `initialize_multihost` code path (`gnn_tpu.parallel.multihost`)
that single-process virtual-mesh tests can't reach."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from gnn_tpu.parallel.multihost import (initialize_multihost,
                                        make_hybrid_mesh,
                                        process_local_rank_span)
coord, pid = sys.argv[1], int(sys.argv[2])
initialize_multihost(coordinator_address=coord, num_processes=2,
                     process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = make_hybrid_mesh(dp=2, part=2)
# per-device distinct values via axis_index; the psum must see all four
# devices across both processes
g = jax.jit(jax.shard_map(
    lambda: (jax.lax.axis_index("data") * 2
             + jax.lax.axis_index("part") + 1).astype(jnp.float32)[None],
    mesh=mesh, in_specs=(), out_specs=P(("data", "part")),
    check_vma=False))
ranks = g()
total = jax.jit(jax.shard_map(
    lambda v: jax.lax.psum(v[0], ("data", "part"))[None],
    mesh=mesh, in_specs=P(("data", "part")),
    out_specs=P(None), check_vma=False))(ranks)
got = float(np.asarray(total)[0])
assert got == 10.0, got  # 1+2+3+4
span = process_local_rank_span(100)
print(f"OK pid={pid} psum={got} span={span}", flush=True)
"""


def test_two_process_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH",
                                                            "")
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=180)
            outs.append((p.returncode, out.decode(), err.decode()))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out")
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        assert "OK pid=" in out
    assert "span=(0, 50)" in outs[0][1]
    assert "span=(50, 100)" in outs[1][1]
