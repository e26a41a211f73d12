"""Checkpointing (extends the reference's whole-module `torch.save`
best-model dump, `/root/reference/main.py:197-199`, with real
step/optimizer state and resume — which the reference lacks entirely,
SURVEY.md §5.4).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(ckpt_dir: str, params: Any, step: int = 0,
                    opt_state: Any = None, name: str = "best",
                    best_val: float = -1.0) -> str:
    """Atomic write (tmp + rename) so a crash mid-save never corrupts
    the previous checkpoint."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"{name}_model.msgpack")
    host_params = jax.tree_util.tree_map(np.asarray, params)
    payload = {"params": host_params, "step": step,
               "best_val": float(best_val)}
    if opt_state is not None:
        payload["opt_state"] = jax.tree_util.tree_map(np.asarray, opt_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(payload))
    os.replace(tmp, path)
    return path


def load_checkpoint(ckpt_dir: str, template: Any,
                    opt_template: Any = None,
                    name: str = "best",
                    ) -> Tuple[Any, int, Optional[Any], float]:
    """Restore into structures shaped like ``template``. Returns
    (params, step, opt_state, best_val)."""
    path = os.path.join(ckpt_dir, f"{name}_model.msgpack")
    target = {"params": template, "step": 0, "best_val": -1.0}
    if opt_template is not None:
        target["opt_state"] = opt_template
    with open(path, "rb") as f:
        payload = serialization.from_bytes(target, f.read())
    return (payload["params"], payload["step"],
            payload.get("opt_state"), float(payload.get("best_val",
                                                        -1.0)))
