"""Training state checkpoint/resume via orbax.

The reference restarts training with a fresh AdamW (trainers/utils.py:470-476
resumes LoRA weights only). Here the full train state — LoRA params,
optimizer state, step counter, RNG key — round-trips through orbax, so
preemption recovery continues exactly (first-class on TPU pods).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import jax


def save_train_state(path: str, step: int, lora, opt_state, rng=None):
    import orbax.checkpoint as ocp
    from ..parallel.distributed import is_main_process
    if not is_main_process():
        return path  # rank-0-only IO under multi-host
    path = os.path.abspath(path)
    ckpt = {
        "step": np.asarray(step),
        "lora": lora,
        "opt_state": jax.tree_util.tree_map(np.asarray, opt_state),
    }
    if rng is not None:
        ckpt["rng"] = np.asarray(rng)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, ckpt, force=True)
    return path


def restore_train_state(path: str, like: Optional[Dict[str, Any]] = None):
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    if like is not None:
        restored = ckptr.restore(os.path.abspath(path), item=like)
    else:
        restored = ckptr.restore(os.path.abspath(path))
    return restored


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Find the newest 'state-<step>' checkpoint directory."""
    if not os.path.isdir(output_dir):
        return None
    cands = [d for d in os.listdir(output_dir) if d.startswith("state-")]
    if not cands:
        return None
    best = max(cands, key=lambda d: int(d.split("-")[1]))
    return os.path.join(output_dir, best)
