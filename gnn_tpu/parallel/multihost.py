"""Multi-host (pod-slice) support.

The reference cannot run multi-node at all (its "collectives" are a
Python list + threading.Barrier inside one process, `main.py:149-168`;
torch.distributed is imported but never initialized — SURVEY.md §5.8).
Here multi-host comes from JAX's multi-controller runtime: every host
runs the same program, `jax.distributed.initialize` forms the global
device set, and the meshes below lay axes out so that:

* the **graph-partition axis** (halo all_to_all traffic, latency/BW
  critical) maps to ICI within each slice, and
* the **data-parallel axis** (one psum per step, latency tolerant) maps
  across DCN between hosts.

Mesh-axis order matters: `create_hybrid_device_mesh` puts DCN on the
outer axis, so ``('data', 'part')`` gives DP across hosts and
partitioning within a host's chips.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
PART_AXIS = "part"


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Join the multi-controller job (no-op for single-process runs).

    With TPU VMs the arguments are discovered from the metadata server;
    elsewhere pass them explicitly or via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def make_hybrid_mesh(dp: Optional[int] = None,
                     part: Optional[int] = None) -> Mesh:
    """2-D ('data', 'part') mesh over all global devices.

    Defaults: partition axis = chips per host (ICI domain), data axis =
    number of hosts (DCN domain). On a single host this degrades to
    (1, n_local_chips).
    """
    n = jax.device_count()
    if part is None:
        part = max(jax.local_device_count(), 1)
    if dp is None:
        dp = n // part
    assert dp * part == n, (dp, part, n)
    try:
        from jax.experimental.mesh_utils import create_hybrid_device_mesh
        devices = create_hybrid_device_mesh(
            (1, part), (dp, 1), devices=jax.devices())
    except Exception:
        devices = np.asarray(jax.devices()).reshape(dp, part)
    return Mesh(devices, (DATA_AXIS, PART_AXIS))


def process_local_rank_span(total: int) -> tuple[int, int]:
    """[start, end) slice of ``total`` work items owned by this process —
    for host-side sharded data loading in multi-controller runs."""
    p = jax.process_index()
    np_ = jax.process_count()
    chunk = (total + np_ - 1) // np_
    return p * chunk, min((p + 1) * chunk, total)
