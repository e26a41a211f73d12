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


_TRAIN_WORKER = r"""
import os, sys
nprocs = int(sys.argv[1])
local_devs = 4 // nprocs
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_devs}")
import jax
jax.config.update("jax_platforms", "cpu")
if nprocs > 1:
    coord, pid = sys.argv[2], int(sys.argv[3])
    from gnn_tpu.parallel.multihost import initialize_multihost
    initialize_multihost(coordinator_address=coord, num_processes=nprocs,
                         process_id=pid)
    assert jax.device_count() == 4, jax.device_count()

import numpy as np
from gnn_tpu.data.synthetic import make_powerlaw_graph
from gnn_tpu.models.gnn import build_model
from gnn_tpu.ops.hotdense import HotSpec, build_hot_dense
from gnn_tpu.ops.residentgraph import build_resident_graph
from gnn_tpu.parallel.multihost import make_hybrid_mesh
from gnn_tpu.placement.engine import compute_sample_prob
from gnn_tpu.sampling.ladies import SamplerConfig
from gnn_tpu.sampling.pipeline import BatchPipeline
from gnn_tpu.train.trainer import Trainer
from gnn_tpu.utils.normalize import build_laplacian

# every process builds the same graph/batches (seeded) and feeds the
# global batch; device_put slices out the local shards
graph = make_powerlaw_graph(512, 8, 32, 7, seed=0)
lap = build_laplacian(graph.adj_full, "graphsage")
prob = compute_sample_prob(lap, graph.train_nodes, 2)
spec = HotSpec.from_sample_prob(prob, 128)
dense, dense_t = build_hot_dense(lap, spec, np.float32)
host = build_resident_graph(lap, spec, dense, dense_t)
cfg = SamplerConfig(batch_size=32, samp_num=64, orders=(1, 1),
                    num_nodes=512, num_classes=7, hot_spec=spec,
                    adj_format="resident", compress=False,
                    resident_ship_cold=True, resident_val_free=True)
net = build_model("graphsage", nhid=16, orders=(1, 1), num_classes=7)
pipe = BatchPipeline(cfg, lap, graph.labels, world_size=2, pool_num=2)
mesh = make_hybrid_mesh(dp=2, part=2)
tr = Trainer(net, pipe, graph.feats, mesh=mesh, lr=0.05,
             sigmoid_loss=False, seed=3, resident_graph=host,
             resident_parts=2)
m = tr.train_epoch(graph.train_nodes[:128], epoch=0)
print(f"TRAINLOSS {m.train_loss:.10f}", flush=True)

from gnn_tpu.train.fullgraph import FullGraphTrainer
labels = np.asarray(graph.labels.todense(), np.float32)
mask = np.zeros(512, bool)
mask[graph.train_nodes] = True
fg = FullGraphTrainer(mesh=mesh, adj=lap, feats=graph.feats,
                      labels_dense=labels, train_mask=mask,
                      orders=(1, 1), nhid=16,
                      num_classes=labels.shape[1], lr=0.05)
losses = fg.train_steps(2)
print(f"FGLOSS {losses[0]:.10f} {losses[1]:.10f}", flush=True)
"""


def _parse_losses(out: str):
    tl = fg = None
    for line in out.splitlines():
        if line.startswith("TRAINLOSS "):
            tl = float(line.split()[1])
        elif line.startswith("FGLOSS "):
            fg = [float(t) for t in line.split()[1:]]
    assert tl is not None and fg is not None, out
    return tl, fg


def _worker_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH",
                                                            "")
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


@pytest.fixture(scope="module")
def single_process_losses():
    """Golden losses from the identical single-process 4-device run
    (computed once, shared by the 2- and 4-process cluster tests)."""
    single = subprocess.run(
        [sys.executable, "-c", _TRAIN_WORKER, "1"],
        capture_output=True, timeout=420, env=_worker_env())
    assert single.returncode == 0, single.stderr.decode()[-2000:]
    return _parse_losses(single.stdout.decode())


def _run_train_cluster(nprocs: int, timeout: int):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = _worker_env()
    procs = [subprocess.Popen(
        [sys.executable, "-c", _TRAIN_WORKER, str(nprocs), coord,
         str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env)
        for pid in range(nprocs)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out.decode(), err.decode()))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed training workers timed out")
    return outs


def _assert_losses_match(outs, want):
    want_tl, want_fg = want
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-3000:]}"
        got_tl, got_fg = _parse_losses(out)
        assert got_tl == pytest.approx(want_tl, rel=1e-5), (got_tl,
                                                            want_tl)
        assert got_fg == pytest.approx(want_fg, rel=1e-5), (got_fg,
                                                            want_fg)


def test_two_process_training_matches_single_process(
        single_process_losses):
    """SURVEY §7 step 8 beyond the psum smoke: one minibatch Trainer
    epoch (part-sharded resident state, DP(2) x part(2)) and two
    FullGraphTrainer halo steps run on a REAL 2-process jax.distributed
    cluster, and their losses equal the identical single-process
    4-device run — the training programs' collective layouts and
    per-process feeding work across process boundaries, not just
    axis-index psums."""
    outs = _run_train_cluster(2, timeout=420)
    _assert_losses_match(outs, single_process_losses)


def test_four_process_training_matches_single_process(
        single_process_losses):
    """The same DP(2) x part(2) hybrid programs on a FOUR-process
    cluster, one device per process — now BOTH mesh axes cross process
    boundaries (each data-parallel replica's part pair spans two
    processes, and the gradient psum spans all four), the multi-host
    shape SURVEY §7 step 8 / BASELINE's scale-out target describes.
    Losses must equal the single-process 4-device run exactly."""
    outs = _run_train_cluster(4, timeout=600)
    _assert_losses_match(outs, single_process_losses)


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
