"""LoRA loading and merging on param pytrees.

Replaces GeneralLoRALoader (/root/reference/diffsynth/lora/__init__.py:5-46):
the reference mutates nn.Module weights in place (W += alpha * B @ A); here a
LoRA state dict is resolved against the DiT pytree by name-munging and merged
functionally, returning a new pytree. Hotload (keeping A/B separate and
applying per-forward) is unnecessary on TPU — merging is a one-time pytree op
and jit caches the merged weights.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().float().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def extract_lora_pairs(lora_sd: Dict) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Collect {target_name: (A, B)} from a LoRA state dict.

    Handles the key styles the reference loader does (lora/__init__.py:13-27):
    '...lora_B.weight'/'...lora_A.weight', the peft '...lora_B.default.weight'
    variant, and diffusers '...lora.up/down.weight'.
    """
    pairs = {}
    for key in lora_sd:
        for b_tag, a_tag in (("lora_B", "lora_A"), ("lora.up", "lora.down")):
            if b_tag in key:
                a_key = key.replace(b_tag, a_tag)
                if a_key not in lora_sd:
                    continue
                target = key.split(b_tag)[0].rstrip(".")
                for prefix in ("diffusion_model.", "transformer.", "model."):
                    if target.startswith(prefix):
                        target = target[len(prefix):]
                pairs[target] = (_np(lora_sd[a_key]), _np(lora_sd[key]))
    return pairs


def _resolve(params: Dict, path: str):
    """Walk a dotted reference module path to the matching pytree linear node.

    Reference names look like 'blocks.0.self_attn.q' or 'vace_blocks.1.ffn.0';
    our pytree stacks blocks, so block indices select a leading-axis slice.
    """
    parts = path.split(".")
    ffn_map = {"0": "fc1", "2": "fc2"}
    node = params
    idx = None
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("blocks", "vace_blocks", "single_blocks"):
            node = node["single_blocks" if p == "single_blocks" else "blocks"]
            idx = int(parts[i + 1])
            i += 2
            continue
        if p == "ffn" and i + 1 < len(parts) and parts[i + 1] in ffn_map:
            node = node["ffn"][ffn_map[parts[i + 1]]]
            i += 2
            continue
        if p == "before_proj":
            return params["before_proj"], None
        if p == "after_proj":
            return params["after_proj"], idx
        if isinstance(node, dict) and p in node:
            node = node[p]
            i += 1
            continue
        raise KeyError(f"cannot resolve LoRA target '{path}' at '{p}'")
    return node, idx


def merge_lora(params: Dict, lora_sd: Dict, alpha: float = 1.0) -> Dict:
    """Return a new pytree with W += alpha * (B @ A)^T merged in.

    Torch linears store W as (out, in) and compute x@W^T; our 'w' is (in, out),
    so the delta is (B @ A)^T = A^T @ B^T.
    """
    import jax
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    pairs = extract_lora_pairs(lora_sd)
    if not pairs:
        raise ValueError("no LoRA A/B pairs found in state dict")
    for target, (A, B) in pairs.items():
        node, idx = _resolve(params, target)
        delta = (A.T @ B.T).astype(np.float32) * alpha      # (in, out)
        w = node["w"]
        if idx is not None and w.ndim == delta.ndim + 1:
            node["w"] = w.at[idx].set(
                (w[idx].astype(jnp.float32) + delta).astype(w.dtype))
        else:
            node["w"] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    return params
