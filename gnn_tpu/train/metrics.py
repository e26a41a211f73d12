"""Metrics registry / structured logging.

The reference's observability is a single per-epoch print
(`/root/reference/main.py:196`). This registry keeps the same measurement
set (SpMM time, data movement, communication, execution, loss, F1, memory)
as structured records, optionally appended to a JSONL file, and exposes
device-memory stats the way `torch.cuda.max_memory_reserved` does.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional


class MetricsRegistry:
    def __init__(self, jsonl_path: Optional[str] = None):
        self.records: List[Dict[str, Any]] = []
        self.jsonl_path = jsonl_path
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)

    def log(self, **fields) -> Dict[str, Any]:
        rec = {"ts": time.time(), **fields}
        self.records.append(rec)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec

    def latest(self, key: str):
        for rec in reversed(self.records):
            if key in rec:
                return rec[key]
        return None


def device_memory_stats() -> Dict[str, int]:
    """Per-device HBM usage (the TPU analog of `main.py:196`'s
    max_memory_reserved print)."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d)] = int(s.get("bytes_in_use", 0))
        except Exception:
            pass
    return out


class ScaleFactorTuner:
    """The locality-sampling scale-factor controller the reference left
    commented out (`/root/reference/main.py:200-212`), implemented live:
    double the factor while data movement dominates (ratio >= 0.2), bisect
    back when it undershoots (< 0.1), stop at 16 or on convergence."""

    def __init__(self, initial: float = 1.0, max_factor: float = 16.0):
        self.scale_factor = initial
        self.max_factor = max_factor
        self.active = True
        # bisection lower bound starts at the INITIAL factor, not 0:
        # with initial > 1 and an immediate ratio < 0.1, (0 + sf)/2
        # would halve toward factors below the visited range
        # (round-4 advice)
        self._before = initial
        self._after = initial

    def update(self, movement_time: float, execution_time: float) -> float:
        if not self.active or execution_time <= 0:
            return self.scale_factor
        ratio = movement_time / execution_time
        if self.scale_factor >= self.max_factor:
            self.active = False
        elif ratio >= 0.2:
            self._before = self.scale_factor
            self.scale_factor *= 2
        elif ratio < 0.1 and self.scale_factor != 1.0:
            self._after = self.scale_factor
            self.scale_factor = (self._before + self._after) / 2
        else:
            self.active = False
        return self.scale_factor

# --- EpochMetrics (round-4 split) ---------------------------------------
# The reference's per-epoch timing line (`main.py:196`) as a dataclass,
# moved here from `trainer.py` so both the epoch loop (`trainer.py`) and
# the grouped dispatch (`dispatch.py`) can build it without a cycle.
import dataclasses

import numpy as np


@dataclasses.dataclass
class EpochMetrics:
    """The reference's per-epoch timing line (`main.py:196`), carrying all
    of its buckets: spmm fwd/bwd time (`custom_sparse_ops.py:11-12`),
    data-movement, communication, and execution time.

    ``spmm_*`` and ``communication_time`` are isolated-op estimates:
    everything inside one jitted program can't be bracketed the way the
    reference brackets eager torch calls, so the per-layer aggregation
    ops and the gradient psum / cache all_to_all are timed standalone on
    the epoch's final batch and scaled by the step count (XLA may overlap
    them in the real program, so these are upper bounds on their cost)."""

    epoch: int
    train_loss: float
    valid_loss: float
    valid_f1: float
    data_movement_time: float
    execution_time: float
    sample_wait_time: float
    spmm_fwd_time: float = float("nan")
    spmm_bwd_time: float = float("nan")
    communication_time: float = float("nan")
    # true wall time of the training loop INCLUDING the end-of-epoch
    # device sync (async dispatch means the per-step buckets alone
    # under-count queued device work)
    total_time: float = float("nan")

    def format(self, scale_factor: float = 1.0) -> str:
        ratio = (self.data_movement_time / self.execution_time
                 if self.execution_time else 0.0)
        buckets = ""
        if np.isfinite(self.total_time):
            buckets += f"(total {self.total_time:.2f}s)"
        if np.isfinite(self.spmm_fwd_time):
            buckets += (f"(spmm {self.spmm_fwd_time:.2f}s/"
                        f"{self.spmm_bwd_time:.2f}s)"
                        f"(comm {self.communication_time:.2f}s)")
        return (f"Epoch: {self.epoch} ({self.sample_wait_time:.2f}s)"
                f"({self.data_movement_time:.2f}s)"
                f"({self.execution_time:.2f}s) {buckets}"
                f"Train Loss: {self.train_loss:.2f}    "
                f"Valid Loss: {self.valid_loss:.2f} "
                f"Valid F1: {self.valid_f1:.3f}    "
                f"scale_factor: {scale_factor:.3f}     "
                f"ratio: {ratio:.3f}")
