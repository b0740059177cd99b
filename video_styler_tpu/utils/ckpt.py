"""Checkpoint loading: safetensors/pth -> numpy state dicts, hash detection.

Replaces the reference ModelManager + detector machinery
(/root/reference/diffsynth/models/model_manager.py:148-467) with explicit
loading. The state-dict key hash is kept as a checkpoint-identification helper
(models/utils.py hash_state_dict_keys): known Wan hashes map to architecture
configs so users can point at an official checkpoint file and get the right
model, without the full 95-entry zoo.
"""
from __future__ import annotations

import hashlib
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..models.wan_dit import (
    WanDiTConfig, WAN_T2V_1_3B, WAN_T2V_14B, WAN_I2V_14B, WAN_TI2V_5B)
from ..models.wan_vace import VaceConfig, VACE_14B, VACE_1_3B


def load_state_dict(path: str, prefix: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Load one .safetensors / .pth / .bin file into numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        try:
            sd = load_file(path)
        except Exception:
            # bf16 tensors need the torch loader
            from safetensors.torch import load_file as load_torch
            sd = {k: v.float().numpy() for k, v in load_torch(path).items()}
    else:
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=True)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        if "model_state" in sd:
            sd = sd["model_state"]
        sd = {k: v.float().numpy() if hasattr(v, "numpy") else v
              for k, v in sd.items()}
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    return sd


def load_state_dict_files(paths: List[str]) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    for p in sorted(paths):
        sd.update(load_state_dict(p))
    return sd


def hash_state_dict_keys(sd: Dict, with_shape: bool = True) -> str:
    """md5 of sorted keys (+shapes) — same contract as the reference
    (models/utils.py) so official checkpoints hash identically."""
    keys_str = ",".join(sorted(sd.keys()))
    if with_shape:
        shapes = ",".join(str(tuple(sd[k].shape)) for k in sorted(sd.keys()))
        keys_str += "|" + shapes
    return hashlib.md5(keys_str.encode()).hexdigest()


# Known civitai-layout hashes -> DiT config (wan_video_dit.py:506-751).
# Keyed on the *keys-only* hash (reference hashes sorted keys without shapes
# by default in from_civitai).
def detect_wan_dit_config(sd: Dict) -> Optional[WanDiTConfig]:
    """Detect the Wan DiT architecture from state-dict structure."""
    if "blocks.0.self_attn.q.weight" not in sd:
        return None
    dim = sd["blocks.0.self_attn.q.weight"].shape[0]
    num_layers = 0
    while f"blocks.{num_layers}.self_attn.q.weight" in sd:
        num_layers += 1
    ffn_dim = sd["blocks.0.ffn.0.weight"].shape[0]
    in_dim = sd["patch_embedding.weight"].shape[1]
    out_dim = sd["head.head.weight"].shape[0] // 4  # patch (1,2,2) -> 4
    has_image_input = "blocks.0.cross_attn.k_img.weight" in sd
    has_image_pos_emb = "img_emb.emb_pos" in sd
    has_ref_conv = "ref_conv.weight" in sd
    heads_by_dim = {1536: 12, 5120: 40, 3072: 24}
    num_heads = heads_by_dim.get(dim, dim // 128)
    seperated = dim == 3072 and in_dim == 48
    return WanDiTConfig(
        dim=dim, in_dim=in_dim, ffn_dim=ffn_dim, out_dim=out_dim,
        num_heads=num_heads, num_layers=num_layers,
        has_image_input=has_image_input, has_image_pos_emb=has_image_pos_emb,
        has_ref_conv=has_ref_conv, seperated_timestep=seperated,
        require_clip_embedding=not seperated and has_image_input,
        require_vae_embedding=not seperated,
        fuse_vae_embedding_in_latents=seperated)


def detect_vace_config(sd: Dict) -> Optional[VaceConfig]:
    if "vace_blocks.0.before_proj.weight" not in sd:
        return None
    dim = sd["vace_blocks.0.before_proj.weight"].shape[0]
    n = 0
    while f"vace_blocks.{n}.after_proj.weight" in sd:
        n += 1
    if dim == 5120:
        return VACE_14B
    if dim == 1536 and n == 15:
        return VACE_1_3B
    ffn = sd["vace_blocks.0.ffn.0.weight"].shape[0]
    heads = {1536: 12, 5120: 40}.get(dim, dim // 128)
    vace_in = sd["vace_patch_embedding.weight"].shape[1]
    # assume evenly spaced layers if unknown
    return VaceConfig(vace_layers=tuple(range(n)), vace_in_dim=vace_in,
                      dim=dim, num_heads=heads, ffn_dim=ffn)


def detect_model_kind(sd: Dict) -> str:
    """Structural architecture detection — the ModelManager analog
    (reference diffsynth/models/model_manager.py hash registry + 4
    detectors), keyed on key structure instead of state-dict hashes so
    finetunes resolve too. Covers every ported family."""
    keys = sd.keys()
    # non-Wan families first (their keys never collide with Wan's)
    if any(k.startswith("double_blocks.") for k in keys) or \
            "img_in.weight" in sd:
        return "flux_dit"                      # BFL layout
    if any(k.startswith("controlnet_x_embedder.") for k in keys):
        return "flux_controlnet"
    if any(k.startswith("ipadapter_modules.") or k.startswith("ip_adapter.")
           for k in keys) and any("to_k_ip" in k for k in keys):
        return "flux_ipadapter" if any("norm_added_k" in k or
                                       "image_proj.proj" in k for k in keys) \
            else "ipadapter"
    if any(k.startswith("joint_blocks.") for k in keys):
        return "sd3_dit"
    if any(k.startswith("single_blocks.") and "linear1" in k for k in keys):
        return "hunyuan_video_dit"
    if any(".rota1.q_norm." in k or ".Wqkv." in k for k in keys):
        return "hunyuan_dit"
    if any(k.startswith("llm.layers.") for k in keys):
        return "omnigen"
    if any(k.startswith("encoder.layers.") and "self_attention.query_key_value"
           in k for k in keys):
        return "kolors_text_encoder"
    if any(k.startswith("transformer_blocks.") and "attn1.norm_q" in k
           for k in keys):
        return "qwen_image_dit"
    if any(".mix_factor" in k for k in keys):
        return "svd_unet"
    if any(k.startswith("input_blocks.") or k.startswith(
            "model.diffusion_model.input_blocks.") for k in keys):
        return "sd_unet"
    if any(k.startswith("wav2vec2.") or k.startswith(
            "feature_extractor.conv_layers.") for k in keys):
        return "wav2vec"
    if "casual_audio_encoder.weights" in sd:
        return "s2v"
    if any(k.startswith("face_adapter.") or k.startswith("pose_patch_embedding.")
           for k in keys):
        return "animate"
    if any(k.startswith("vace_blocks.") or k.startswith("vace.vace_blocks.") for k in keys):
        if "blocks.0.self_attn.q.weight" in sd:
            return "dit+vace"
        return "vace"
    if "blocks.0.self_attn.q.weight" in sd:
        return "dit"
    if any(k.endswith("encoder.conv1.weight") or k.startswith("encoder.conv1") for k in keys):
        return "vae"
    if "token_embedding.weight" in sd:
        return "t5"
    if "visual.patch_embedding.weight" in sd or "textual.token_embedding.weight" in sd:
        return "clip"
    raise ValueError(f"cannot detect model kind from keys like "
                     f"{sorted(list(keys))[:5]}")
