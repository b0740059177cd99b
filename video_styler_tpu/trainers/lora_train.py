"""Trainable LoRA adapters on param pytrees (peft-equivalent).

The reference injects peft LoRA modules into the torch graph
(trainers/utils.py:388-408). Functionally: LoRA params are a separate small
pytree {dotted.path: {"A": (..., in, r), "B": (..., r, out)}}; each step the
base weights are materialized as W + scale * (A @ B) (cheap next to the
forward FLOPs, fused by XLA), gradients flow only into A/B.

Stacked block weights get stacked LoRA factors (leading layer axis), so one
target pattern covers all layers at once.

Export produces reference-compatible key names
('vace_blocks.{i}.self_attn.q.lora_A.weight' style, transposed to torch
layout) so LoRAs trained here load in the reference and vice versa.
"""
from __future__ import annotations

import fnmatch
import re
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# Ditto recipe targets (train.sh:1-19): q k v o ffn.0 ffn.2 on every block
DEFAULT_TARGETS = ("blocks.self_attn.q", "blocks.self_attn.k",
                   "blocks.self_attn.v", "blocks.self_attn.o",
                   "blocks.cross_attn.q", "blocks.cross_attn.k",
                   "blocks.cross_attn.v", "blocks.cross_attn.o",
                   "blocks.ffn.fc1", "blocks.ffn.fc2")


def _walk_linears(params, prefix=""):
    """Yield (dotted_path, node) for every {"w": ...} linear node."""
    if isinstance(params, dict):
        if "w" in params and not isinstance(params["w"], dict):
            yield prefix, params
            return
        for k, v in params.items():
            yield from _walk_linears(v, f"{prefix}.{k}" if prefix else k)


def init_lora(key, params, rank: int = 128,
              targets: Tuple[str, ...] = DEFAULT_TARGETS,
              dtype=jnp.float32) -> Dict:
    """A ~ N(0, 1/r) (kaiming-ish), B = 0 — standard LoRA init."""
    lora = {}
    for path, node in _walk_linears(params):
        if not any(fnmatch.fnmatch(path, pat) or path == pat for pat in targets):
            continue
        w = node["w"]
        key, k1 = jax.random.split(key)
        if w.ndim == 3:            # stacked blocks: (L, in, out)
            a_shape = (w.shape[0], w.shape[1], rank)
            b_shape = (w.shape[0], rank, w.shape[2])
        else:
            a_shape = (w.shape[0], rank)
            b_shape = (rank, w.shape[1])
        lora[path] = {
            "A": (jax.random.normal(k1, a_shape, jnp.float32) / rank).astype(dtype),
            "B": jnp.zeros(b_shape, dtype),
        }
    if not lora:
        raise ValueError(f"no LoRA targets matched {targets}")
    return lora


def apply_lora(params, lora: Dict, scale: float = 1.0):
    """Return params with W + scale * A@B materialized (new pytree)."""
    params = jax.tree_util.tree_map(lambda x: x, params)
    for path, ab in lora.items():
        node = params
        parts = path.split(".")
        for p in parts[:-1]:
            node = node[p]
        leaf = node[parts[-1]]
        A, B = ab["A"].astype(jnp.float32), ab["B"].astype(jnp.float32)
        if A.ndim == 3:
            delta = jnp.einsum("lir,lro->lio", A, B)
        else:
            delta = A @ B
        node[parts[-1]] = dict(leaf, w=(leaf["w"].astype(jnp.float32)
                                        + scale * delta).astype(leaf["w"].dtype))
    return params


_TORCH_NAME = {
    "ffn.fc1": "ffn.0", "ffn.fc2": "ffn.2",
}


def export_lora_state_dict(lora: Dict, prefix: str = "",
                           block_key: str = "blocks") -> Dict[str, np.ndarray]:
    """LoRA pytree -> reference-style torch state dict (fp32 numpy).

    'blocks.self_attn.q' with stacked (L, in, r) factors becomes
    '{prefix}blocks.{i}.self_attn.q.lora_A.weight' of shape (r, in) — the
    torch (out, in) layout the reference GeneralLoRALoader consumes.
    """
    out = {}
    for path, ab in lora.items():
        name = path
        for ours, theirs in _TORCH_NAME.items():
            name = name.replace(ours, theirs)
        A = np.asarray(ab["A"], np.float32)
        B = np.asarray(ab["B"], np.float32)
        if A.ndim == 3:
            head, tail = name.split(f"{block_key}.", 1)
            for i in range(A.shape[0]):
                base = f"{prefix}{head}{block_key}.{i}.{tail}"
                out[f"{base}.lora_A.weight"] = A[i].T
                out[f"{base}.lora_B.weight"] = B[i].T
        else:
            out[f"{prefix}{name}.lora_A.weight"] = A.T
            out[f"{prefix}{name}.lora_B.weight"] = B.T
    return out


def save_lora_safetensors(lora: Dict, path: str, prefix: str = ""):
    from safetensors.numpy import save_file
    save_file(export_lora_state_dict(lora, prefix=prefix), path)
