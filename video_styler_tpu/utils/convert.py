"""Checkpoint converters: reference (torch) state dicts -> param pytrees.

Replaces the reference ModelManager / state-dict-hash zoo
(/root/reference/diffsynth/models/model_manager.py) with explicit converters
that map official Wan checkpoints into this package's pytrees once. Tensors
arrive as numpy arrays (from safetensors) or torch tensors; we emit jnp arrays.

Naming contracts follow the reference module definitions:
  wan_video_dit.py  WanModel        -> convert_wan_dit
  wan_video_vace.py VaceWanModel    -> convert_vace
  wan_video_text_encoder.py         -> convert_t5
  wan_video_vae.py  WanVideoVAE     -> convert_wan_vae (in models/wan_vae.py)
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from ..models.wan_dit import WanDiTConfig, stack_blocks
from ..models.wan_vace import VaceConfig


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    try:
        import torch
        if isinstance(t, torch.Tensor):
            return t.detach().to(torch.float32).cpu().numpy()
    except ImportError:
        pass
    return np.asarray(t)


def _j(t, dtype):
    return jnp.asarray(_np(t), dtype=dtype)


def _lin(sd, name: str, dtype, transpose: bool = True):
    p = {"w": _j(sd[f"{name}.weight"], dtype).T if transpose else _j(sd[f"{name}.weight"], dtype)}
    if f"{name}.bias" in sd:
        p["b"] = _j(sd[f"{name}.bias"], dtype)
    return p


def _conv_as_lin(sd, name: str, dtype):
    """ConvNd(stride=kernel) weight (out, in, *k) -> {"w": (in*prod(k), out)}."""
    w = _np(sd[f"{name}.weight"])
    w = w.reshape(w.shape[0], -1).T
    p = {"w": jnp.asarray(w, dtype)}
    if f"{name}.bias" in sd:
        p["b"] = _j(sd[f"{name}.bias"], dtype)
    return p


def _rms(sd, name: str, dtype):
    return {"scale": _j(sd[f"{name}.weight"], dtype)}


def _ln(sd, name: str, dtype):
    p = {}
    if f"{name}.weight" in sd:
        p["scale"] = _j(sd[f"{name}.weight"], dtype)
    if f"{name}.bias" in sd:
        p["bias"] = _j(sd[f"{name}.bias"], dtype)
    return p


def _attn(sd, prefix: str, dtype, cross_image: bool = False):
    p = {
        "q": _lin(sd, f"{prefix}.q", dtype),
        "k": _lin(sd, f"{prefix}.k", dtype),
        "v": _lin(sd, f"{prefix}.v", dtype),
        "o": _lin(sd, f"{prefix}.o", dtype),
        "norm_q": _rms(sd, f"{prefix}.norm_q", dtype),
        "norm_k": _rms(sd, f"{prefix}.norm_k", dtype),
    }
    if cross_image:
        p["k_img"] = _lin(sd, f"{prefix}.k_img", dtype)
        p["v_img"] = _lin(sd, f"{prefix}.v_img", dtype)
        p["norm_k_img"] = _rms(sd, f"{prefix}.norm_k_img", dtype)
    return p


def _dit_block(sd, prefix: str, dtype, has_image_input: bool):
    return {
        "self_attn": _attn(sd, f"{prefix}.self_attn", dtype),
        "cross_attn": _attn(sd, f"{prefix}.cross_attn", dtype, cross_image=has_image_input),
        "norm3": _ln(sd, f"{prefix}.norm3", dtype),
        "ffn": {
            "fc1": _lin(sd, f"{prefix}.ffn.0", dtype),
            "fc2": _lin(sd, f"{prefix}.ffn.2", dtype),
        },
        "modulation": _j(sd[f"{prefix}.modulation"], dtype),
    }


def convert_wan_dit(sd: Dict, cfg: WanDiTConfig, dtype=jnp.bfloat16):
    """Reference WanModel state dict (civitai layout) -> wan_dit param pytree."""
    params = {
        "patch_embedding": _conv_as_lin(sd, "patch_embedding", dtype),
        "text_embedding": {
            "fc1": _lin(sd, "text_embedding.0", dtype),
            "fc2": _lin(sd, "text_embedding.2", dtype),
        },
        "time_embedding": {
            "fc1": _lin(sd, "time_embedding.0", dtype),
            "fc2": _lin(sd, "time_embedding.2", dtype),
        },
        "time_projection": _lin(sd, "time_projection.1", dtype),
        "head": {
            "head": _lin(sd, "head.head", dtype),
            "modulation": _j(sd["head.modulation"], dtype),
        },
        "blocks": stack_blocks([
            _dit_block(sd, f"blocks.{i}", dtype, cfg.has_image_input)
            for i in range(cfg.num_layers)
        ]),
    }
    if cfg.has_image_input:
        img = {
            "norm_in": _ln(sd, "img_emb.proj.0", dtype),
            "fc1": _lin(sd, "img_emb.proj.1", dtype),
            "fc2": _lin(sd, "img_emb.proj.3", dtype),
            "norm_out": _ln(sd, "img_emb.proj.4", dtype),
        }
        if "img_emb.emb_pos" in sd:
            img["emb_pos"] = _j(sd["img_emb.emb_pos"], dtype)
        params["img_emb"] = img
    if cfg.has_ref_conv and "ref_conv.weight" in sd:
        params["ref_conv"] = _conv_as_lin(sd, "ref_conv", dtype)
    if any(k.startswith("control_adapter.") for k in sd):
        # Fun-Camera models carry a SimpleAdapter inside the DiT
        # (wan_video_dit.py:334-335)
        from ..models.wan_controllers import convert_simple_adapter
        params["control_adapter"] = convert_simple_adapter(
            {k[len("control_adapter."):]: v for k, v in sd.items()
             if k.startswith("control_adapter.")}, dtype)
    return params


def convert_vace(sd: Dict, cfg: VaceConfig, dtype=jnp.bfloat16):
    """Reference VaceWanModel state dict -> vace param pytree.

    Accepts keys with or without the leading 'vace' file prefix used in the
    combined checkpoint (wan_video_vace.py:98-99).
    """
    n = len(cfg.vace_layers)
    blocks = [_dit_block(sd, f"vace_blocks.{i}", dtype, cfg.has_image_input)
              for i in range(n)]
    after = [_lin(sd, f"vace_blocks.{i}.after_proj", dtype) for i in range(n)]
    return {
        "patch_embedding": _conv_as_lin(sd, "vace_patch_embedding", dtype),
        "before_proj": _lin(sd, "vace_blocks.0.before_proj", dtype),
        "blocks": stack_blocks(blocks),
        "after_proj": stack_blocks(after),
    }
