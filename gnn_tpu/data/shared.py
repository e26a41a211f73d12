"""Zero-copy shared-memory CSR for multi-process host sampling.

The reference sketches (but never uses) a multiprocessing variant that
shares the CSR arrays across sampler processes
(`/root/reference/preprocess.py:427-446`, ``mp.Array``). Here it is a
working implementation on ``multiprocessing.shared_memory``: the graph is
published once, worker processes attach without copying, and the ~GB-scale
laplacian never crosses a pipe. Use when thread-level parallelism (the
default pipeline) is GIL-bound — the native sampler core releases the GIL,
so threads usually suffice; processes are the escape hatch for pure-numpy
fallback environments.
"""
from __future__ import annotations

import dataclasses
from multiprocessing import shared_memory
from typing import List, Tuple

import numpy as np
import scipy.sparse as sp


@dataclasses.dataclass
class SharedCSRHandle:
    """Picklable descriptor of a CSR published in shared memory."""

    names: Tuple[str, str, str]
    dtypes: Tuple[str, str, str]
    lens: Tuple[int, int, int]
    shape: Tuple[int, int]


class SharedCSR:
    """Owner-side wrapper; call ``close()`` (or use as context manager)
    to release the segments."""

    def __init__(self, csr: sp.csr_matrix, prefix: str = "gnn_tpu"):
        self._segs: List[shared_memory.SharedMemory] = []
        arrays = (np.ascontiguousarray(csr.indptr),
                  np.ascontiguousarray(csr.indices),
                  np.ascontiguousarray(csr.data))
        names = []
        for i, a in enumerate(arrays):
            seg = shared_memory.SharedMemory(
                create=True, size=max(a.nbytes, 1))
            np.ndarray(a.shape, a.dtype, buffer=seg.buf)[:] = a
            self._segs.append(seg)
            names.append(seg.name)
        self.handle = SharedCSRHandle(
            names=tuple(names),
            dtypes=tuple(str(a.dtype) for a in arrays),
            lens=tuple(len(a) for a in arrays),
            shape=tuple(csr.shape))

    def close(self):
        for seg in self._segs:
            seg.close()
            try:
                seg.unlink()
            except FileNotFoundError:
                pass
        self._segs = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def attach_shared_csr(handle: SharedCSRHandle):
    """Worker-side: attach and reconstruct the CSR (no copy).

    Returns (csr_matrix, segments) — keep ``segments`` alive while the
    matrix is in use.
    """
    segs = [shared_memory.SharedMemory(name=n) for n in handle.names]
    arrays = [np.ndarray((l,), np.dtype(d), buffer=s.buf)
              for s, d, l in zip(segs, handle.dtypes, handle.lens)]
    csr = sp.csr_matrix((arrays[2], arrays[1], arrays[0]),
                        shape=handle.shape)
    return csr, segs
