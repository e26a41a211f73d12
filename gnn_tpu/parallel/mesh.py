"""Device mesh construction and sharding helpers.

The TPU-native replacement for the reference's thread-per-GPU world
(`/root/reference/main.py:291-297`): one process drives a
`jax.sharding.Mesh` with a ``data`` axis; XLA compiles the collectives
(psum over ICI) that the reference hand-rolls with a Python list +
threading.Barrier (`main.py:149-168`).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (device) axis of stacked minibatch leaves over
    ALL mesh axes (row-major): on a 1-D ('data',) mesh this is plain DP;
    on a 2-D ('data', 'part') hybrid mesh, global rank r = d*part + p."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def put_batch(mesh: Mesh, batch_pytree):
    """Device-put a stacked minibatch: every array leaf is sharded on its
    leading device axis."""
    sh = data_sharded(mesh)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sh), batch_pytree)


def put_grouped_batch(mesh: Mesh, batch_pytree):
    """Device-put a multi-step batch whose leaves are ``[group, ws, ...]``:
    the group axis stays whole (scanned over on device), the device axis
    is sharded over the mesh."""
    sh = NamedSharding(mesh, P(None, tuple(mesh.axis_names)))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sh), batch_pytree)


def put_replicated(mesh: Mesh, pytree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), pytree)
