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
        self._before = 0.0
        self._after = 0.0

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
