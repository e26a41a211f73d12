"""Single-buffer minibatch transport: pack the whole per-step pytree
into ONE ``[ws, nbytes]`` uint8 array on host, ship it with a single
``device_put``, and unpack with static slices + bitcasts inside the
jitted step.

Why: through this environment's TPU relay every host->device call pays
a ~35-45 ms fixed round trip, and ``device_put`` of a pytree issues one
transfer per leaf. The canonical minibatch (batch + gather plan) is 55
leaves / 10.5 MiB — 2.36 s of pure per-leaf latency for 40 ms of device
work (benchmarks/RESULTS.md, step decomposition probe). Packing makes
the per-step H2D cost one call: latency amortizes over the entire
payload, and the device-side unpack (slice + bitcast + reshape of
statically-shaped regions) fuses into the consumers, i.e. costs
nothing. The same trick replaces the reference's per-tensor
`.to(device)` loop (`/root/reference/main.py:129-134`) rather than
translating it.

Layout: leaves in ``jax.tree_util.tree_leaves`` order, each stored as
its per-device-row bytes (the shard axis moved to the front), then an
8-byte replicated trailer ``(base_step: uint32, n_valid: uint32)`` so
the step index / grouped-valid count ride along instead of being extra
device_put calls. The buffer's leading axis is the device axis: it
shards with ``PartitionSpec(mesh.axis_names)`` exactly like the
unpacked leaves did, so DP / hybrid-mesh semantics are unchanged.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

TRAILER_BYTES = 8  # (base_step, n_valid) as little-endian uint32


@dataclasses.dataclass(frozen=True)
class PackSpec:
    """Static description of one packed pytree layout.

    Hashable — used as the jit-cache key for the packed step functions
    (a new nnz bucket => new shapes => new spec => fresh compile, the
    same recompile the unpacked path would have hit).
    """

    treedef: object
    shapes: Tuple[Tuple[int, ...], ...]   # full host shapes
    dtypes: Tuple[str, ...]               # np.dtype names
    shard_axis: int                       # 0: [ws,...] leaves; 1: [G,ws,...]
    ws: int
    row_bytes: int                        # payload bytes per device row

    @staticmethod
    def from_tree(tree, shard_axis: int = 0) -> "PackSpec":
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        if not leaves:
            raise ValueError("packbuf: empty pytree")
        ws = None
        shapes, dtypes = [], []
        row_bytes = 0
        for a in leaves:
            a = np.asarray(a)
            if a.ndim <= shard_axis:
                raise ValueError(
                    f"packbuf: leaf rank {a.ndim} lacks shard axis "
                    f"{shard_axis} (shape {a.shape})")
            w = a.shape[shard_axis]
            if ws is None:
                ws = w
            elif w != ws:
                raise ValueError(
                    f"packbuf: inconsistent shard-axis sizes {ws} vs {w}")
            shapes.append(tuple(a.shape))
            dtypes.append(a.dtype.name)
            row_bytes += (a.size // w) * a.dtype.itemsize
        return PackSpec(treedef=treedef, shapes=tuple(shapes),
                        dtypes=tuple(dtypes), shard_axis=shard_axis,
                        ws=ws, row_bytes=row_bytes)

    def key(self):
        return (self.treedef, self.shapes, self.dtypes, self.shard_axis,
                self.ws)

    def inner_shape(self, i: int) -> Tuple[int, ...]:
        """Leaf i's shape with the shard axis removed."""
        s = self.shapes[i]
        return s[: self.shard_axis] + s[self.shard_axis + 1:]


def _np_dtype(name: str) -> np.dtype:
    if name == "bfloat16":
        import ml_dtypes
        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


class BufferPool:
    """Reusable pre-faulted host staging buffers for :func:`pack`.

    On this host first-touch page faults cost ~70 us/page — writing a
    fresh ``np.empty`` of 44 MB costs ~3 s (measured; a warmed buffer
    takes 25 ms). Allocating the pack output per step would therefore
    cost more than the transfer it feeds. The pool keeps up to
    ``depth`` buffers per size and evicts least-recently-used sizes
    beyond a total cap.

    ``depth`` sizing: ``jax.device_put`` may return before the H2D
    transfer completes (PJRT immutable-until-transfer semantics), so a
    buffer must not be rewritten while its transfer can still be in
    flight. With a transfer lookahead of L prepped groups outstanding,
    up to L+1 buffers can be awaiting/undergoing transfer while the
    next pack wants a fresh one — callers pass ``depth >= L + 2``
    (the Trainer does). The default 2 is the plain serial double
    buffer.
    """

    def __init__(self, max_buffers: int = 12, depth: int = 2):
        self._pools = {}          # size key -> {"bufs": [...], "i": int}
        self._order = []          # LRU of size keys
        self.depth = max(int(depth), 2)
        self.max_buffers = max(max_buffers, 3 * self.depth)

    def get(self, nrows: int, nbytes: int, tag=None) -> np.ndarray:
        key = (nrows, nbytes, tag)
        pool = self._pools.get(key)
        if pool is None:
            pool = {"bufs": [], "i": 0}
            self._pools[key] = pool
        if key in self._order:
            self._order.remove(key)
        self._order.append(key)
        if len(pool["bufs"]) < self.depth:
            while (sum(len(p["bufs"]) for p in self._pools.values())
                   >= self.max_buffers and len(self._order) > 1):
                old = self._order.pop(0)
                if old == key:
                    self._order.append(key)
                    break
                del self._pools[old]
            buf = np.empty((nrows, nbytes), np.uint8)
            buf.fill(0)  # pre-fault every page once, off the hot path
            pool["bufs"].append(buf)
            return buf
        i = pool["i"]
        pool["i"] = (i + 1) % len(pool["bufs"])
        return pool["bufs"][i]


def pack(spec: PackSpec, tree, base_step: int = 0,
         n_valid: int = 1, out: np.ndarray = None) -> np.ndarray:
    """Host-side pack: ``uint8 [ws, row_bytes + TRAILER_BYTES]``.

    One memcpy of the payload (~ms at minibatch sizes) buys the removal
    of ~40 ms/leaf of relay latency; the trailer is replicated into
    every row so each device can read it locally. Pass ``out`` (from a
    :class:`BufferPool`) to avoid the first-touch page-fault cost of a
    fresh allocation.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    shape = (spec.ws, spec.row_bytes + TRAILER_BYTES)
    if out is None:
        out = np.empty(shape, np.uint8)
    elif out.shape != shape or out.dtype != np.uint8:
        raise ValueError(f"pack: out buffer {out.shape} != {shape}")
    off = 0
    for a in leaves:
        a = np.asarray(a)
        if spec.shard_axis:
            a = np.moveaxis(a, spec.shard_axis, 0)
        rows = np.ascontiguousarray(a).reshape(spec.ws, -1).view(np.uint8)
        n = rows.shape[1]
        out[:, off: off + n] = rows
        off += n
    trailer = np.array([base_step, n_valid], dtype="<u4").view(np.uint8)
    out[:, off:] = trailer[None, :]
    return out


class TypedPackSpec:
    """Like :class:`PackSpec` but leaves are grouped into ONE array per
    dtype ("pools") instead of one uint8 blob.

    Why not the single blob: one big put is a single wire stream, and
    the relay throttles per stream — the interleaved transport probe
    (benchmarks/RESULTS.md) measured the blob 3-5x slower SUSTAINED
    than the same bytes as a few separate arrays. Typed pools also
    keep the device-side unpack element-aligned slicing with no
    bitcasts. The per-step H2D call count is the number of distinct
    dtypes (4-6) instead of the leaf count (~55/G).
    """

    def __init__(self, tree, shard_axis: int = 0):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        if not leaves:
            raise ValueError("packbuf: empty pytree")
        self.treedef = treedef
        self.shard_axis = shard_axis
        ws = None
        pools = {}                    # dtype name -> elem count
        entries = []                  # (dtype name, offset, shape)
        for a in leaves:
            a = np.asarray(a)
            if a.ndim <= shard_axis:
                raise ValueError(
                    f"packbuf: leaf rank {a.ndim} lacks shard axis "
                    f"{shard_axis} (shape {a.shape})")
            w = a.shape[shard_axis]
            if ws is None:
                ws = w
            elif w != ws:
                raise ValueError(
                    f"packbuf: inconsistent shard-axis sizes {ws} vs {w}")
            d = a.dtype.name
            off = pools.get(d, 0)
            n = a.size // w
            pools[d] = off + n
            entries.append((d, off, tuple(a.shape)))
        # reserve two int32 slots for (base_step, n_valid) metadata
        self.meta_off = pools.get("int32", 0)
        pools["int32"] = self.meta_off + 2
        self.ws = ws
        self.pool_counts = dict(sorted(pools.items()))
        self.entries = tuple(entries)

    def key(self):
        return (self.treedef, self.entries, self.shard_axis, self.ws)

    def pool_names(self):
        return tuple(self.pool_counts)

    def pack(self, tree, base_step: int = 0, n_valid: int = 1,
             pool: "BufferPool" = None):
        """Host pack: dict of ``{dtype: [ws, count] typed array}``.

        ``pool`` (optional BufferPool) supplies pre-faulted staging
        memory (viewed as the right dtype) — see BufferPool for why.
        """
        leaves = jax.tree_util.tree_leaves(tree)
        out = {}
        for d, c in self.pool_counts.items():
            dt = _np_dtype(d)
            if pool is not None:
                raw = pool.get(self.ws, c * dt.itemsize, tag=d)
                out[d] = raw.view(dt).reshape(self.ws, c)
            else:
                out[d] = np.empty((self.ws, c), dt)
        for a, (d, off, _) in zip(leaves, self.entries):
            a = np.asarray(a)
            if self.shard_axis:
                a = np.moveaxis(a, self.shard_axis, 0)
            n = a.size // self.ws
            out[d][:, off: off + n] = a.reshape(self.ws, n)
        out["int32"][:, self.meta_off] = base_step
        out["int32"][:, self.meta_off + 1] = n_valid
        return out

    def unpack_local(self, pools):
        """Device-side unpack from local pool shards (each
        ``[lw, count]``): static element-aligned slices + reshapes.
        Returns ``(tree, base_step, n_valid)``."""
        leaves = []
        for d, off, shape in self.entries:
            pool = pools[d]
            lw = pool.shape[0]
            inner = shape[: self.shard_axis] + shape[self.shard_axis + 1:]
            n = int(np.prod(inner, dtype=np.int64)) if inner else 1
            arr = jax.lax.slice_in_dim(pool, off, off + n, axis=1)
            arr = arr.reshape((lw,) + inner)
            if self.shard_axis:
                arr = jnp.moveaxis(arr, 0, self.shard_axis)
            leaves.append(arr)
        meta = pools["int32"][0, self.meta_off: self.meta_off + 2]
        return (jax.tree_util.tree_unflatten(self.treedef, leaves),
                meta[0], meta[1])


def unpack_local(spec: PackSpec, buf):
    """Device-side unpack of the LOCAL shard ``uint8 [lw, row_bytes+8]``
    (as seen inside ``shard_map`` with the buffer sharded on axis 0;
    ``lw`` is usually 1, or more when the mesh has fewer devices than
    the batch's device rows).

    Returns ``(tree, base_step, n_valid)`` where the tree's leaves have
    shard-axis extent ``lw`` (exactly what the unpacked sharded step
    bodies received). Everything here is a static slice + bitcast +
    reshape — XLA folds it into the consumers.
    """
    lw = buf.shape[0]
    leaves = []
    off = 0
    for i in range(len(spec.shapes)):
        dtype = _np_dtype(spec.dtypes[i])
        inner = spec.inner_shape(i)
        itemsize = dtype.itemsize
        n = int(np.prod(inner, dtype=np.int64)) * itemsize if inner \
            else itemsize
        chunk = jax.lax.slice_in_dim(buf, off, off + n, axis=1)
        if dtype == np.bool_:
            arr = chunk.reshape((lw,) + inner).astype(jnp.bool_)
        elif itemsize == 1:
            arr = jax.lax.bitcast_convert_type(
                chunk.reshape((lw,) + inner), dtype)
        else:
            arr = jax.lax.bitcast_convert_type(
                chunk.reshape((lw,) + inner + (itemsize,)), dtype)
        if spec.shard_axis:
            arr = jnp.moveaxis(arr, 0, spec.shard_axis)
        leaves.append(arr)
        off += n
    trailer = jax.lax.bitcast_convert_type(
        jax.lax.slice_in_dim(buf, off, off + TRAILER_BYTES, axis=1)[0]
        .reshape(2, 4), jnp.uint32)
    tree = jax.tree_util.tree_unflatten(spec.treedef, leaves)
    return tree, trailer[0], trailer[1]
