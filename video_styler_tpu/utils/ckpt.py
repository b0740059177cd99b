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


def load_model(path: str, dtype=None):
    """ModelManager.load_model analog: point at an official checkpoint file
    and get `(kind, params)` with the right converter applied
    (reference diffsynth/models/model_manager.py:395-467, structural
    detection instead of the 95-entry hash table).

    Kinds whose converter needs extra context (tokenizers, paired text
    encoders) return the converted params; wiring them into a pipeline is
    the caller's job, same as the reference's fetch_model step.
    """
    import jax.numpy as jnp
    dtype = dtype or jnp.bfloat16
    sd = load_state_dict(path)
    kind = detect_model_kind(sd)
    params = _convert_by_kind(kind, sd, dtype)
    return kind, params


def _convert_by_kind(kind: str, sd: Dict, dtype):
    import jax.numpy as jnp
    if kind in ("dit", "dit+vace", "vace"):
        from .convert import convert_wan_dit, convert_vace
        out = {}
        if kind in ("dit", "dit+vace"):
            cfg = detect_wan_dit_config(sd)
            out["dit"] = convert_wan_dit(sd, cfg, dtype=dtype)
            out["dit_cfg"] = cfg
        if kind in ("vace", "dit+vace"):
            vcfg = detect_vace_config(sd)
            out["vace"] = convert_vace(sd, vcfg, dtype=dtype)
            out["vace_cfg"] = vcfg
        return out
    if kind == "vae":
        from ..models import wan_vae as V
        is38 = any(".conv3." in k for k in sd) or any(
            getattr(v, "shape", (0,)) and getattr(v, "shape", (0,))[0] == 96
            and k.endswith("conv1.weight") for k, v in sd.items())
        cfg = V.WAN22_VAE if is38 else V.WAN21_VAE
        return {"vae": V.convert_wan_vae(sd, dtype=dtype), "vae_cfg": cfg}
    if kind == "t5":
        from ..models.t5 import convert_t5, UMT5_XXL
        return convert_t5(sd, UMT5_XXL, dtype=dtype)
    if kind == "clip":
        from ..models.clip_vit import convert_clip_vit
        return convert_clip_vit(sd, dtype=dtype)
    if kind == "flux_dit":
        from ..models.flux_dit import (convert_flux_dit, FLUX_DEV,
                                       FLUX_SCHNELL)
        cfg = FLUX_DEV if any("guidance" in k for k in sd) else FLUX_SCHNELL
        return convert_flux_dit(sd, cfg, dtype=dtype)
    if kind == "flux_controlnet":
        from ..models import flux_controlnet as FC
        from ..models.flux_dit import FLUX_DEV
        cfg = FC.FluxControlNetConfig(
            dit=FLUX_DEV,
            num_joint_blocks=1 + max((int(k.split(".")[1]) for k in sd
                                      if k.startswith("controlnet_blocks.")),
                                     default=-1),
            num_single_blocks=1 + max(
                (int(k.split(".")[1]) for k in sd
                 if k.startswith("controlnet_single_blocks.")), default=-1),
            guidance_embed="guidance_embedder.timestep_embedder.0.weight" in sd)
        return FC.convert_flux_controlnet(sd, cfg, dtype=dtype)
    if kind == "sd3_dit":
        from ..models.sd3_dit import convert_sd3_dit
        return convert_sd3_dit(sd, cfg=None, dtype=dtype)   # auto-infers
    if kind == "hunyuan_video_dit":
        from ..models.hunyuan_video_dit import (convert_hunyuan_video_dit,
                                                HUNYUAN_VIDEO)
        return convert_hunyuan_video_dit(sd, HUNYUAN_VIDEO, dtype=dtype)
    if kind == "qwen_image_dit":
        from ..models.qwen_image_dit import (convert_qwen_image_dit,
                                             QWEN_IMAGE)
        return convert_qwen_image_dit(sd, QWEN_IMAGE, dtype=dtype)
    if kind == "qwen_image_blockwise_controlnet":
        from ..models.qwen_image_controlnet import \
            convert_qwen_blockwise_controlnet
        return convert_qwen_blockwise_controlnet(sd, dtype=dtype)
    if kind == "flux_lora_encoder":
        from ..models.flux_adapters import convert_flux_lora_encoder
        return convert_flux_lora_encoder(sd, dtype=dtype)
    if kind == "flux_value_encoder":
        from ..models.flux_adapters import convert_value_encoder
        return convert_value_encoder(sd, dtype=dtype)
    if kind == "flux_infiniteyou_projector":
        from ..models.flux_adapters import convert_infiniteyou_projector
        if "image_proj" in sd and not hasattr(sd["image_proj"], "shape"):
            sd = sd["image_proj"]
        return convert_infiniteyou_projector(sd, dtype=dtype)
    if kind == "stepvideo_text_encoder":
        from ..models.stepvideo_llm import convert_step1_llm, STEP1_LLM
        return convert_step1_llm(sd, STEP1_LLM, dtype=dtype)
    if kind == "motion_modules":
        from ..models.motion import convert_motion_model
        return convert_motion_model(sd, dtype=dtype)
    if kind in ("sd_unet", "svd_unet", "svd_unet_exvideo"):
        from ..models.sd import convert_sd_module
        return convert_sd_module(sd, dtype)
    if kind == "ipadapter":
        from ..models.ipadapter import convert_ipadapter
        return convert_ipadapter(sd, dtype=dtype)
    if kind == "flux_ipadapter":
        from ..models.flux_controlnet import convert_flux_ipadapter
        return convert_flux_ipadapter(sd, dtype=dtype)
    if kind == "kolors_text_encoder":
        from ..models.kolors_text_encoder import convert_chatglm, CHATGLM3_6B
        return convert_chatglm(sd, CHATGLM3_6B, dtype=dtype)
    if kind == "wav2vec":
        from ..models.wav2vec import convert_wav2vec, WAV2VEC2_XLSR_53
        return convert_wav2vec(sd, WAV2VEC2_XLSR_53, dtype=dtype)
    raise NotImplementedError(
        f"detected '{kind}' — use its family pipeline/converter directly")


def detect_model_kind(sd: Dict) -> str:
    """Structural architecture detection — the ModelManager analog
    (reference diffsynth/models/model_manager.py hash registry + 4
    detectors), keyed on key structure instead of state-dict hashes so
    finetunes resolve too. Covers every ported family."""
    keys = sd.keys()
    # non-Wan families first (their keys never collide with Wan's)
    if any(k.startswith("controlnet_blocks.") and ".x_rms." in k
           for k in keys):
        return "qwen_image_blockwise_controlnet"
    if any(k.startswith("embedder.model_dict.") for k in keys):
        return "flux_lora_encoder"
    if "prefer_value_embedder.0.weight" in sd:
        return "flux_value_encoder"
    if any(k.endswith(".0.to_kv.weight") for k in keys) and \
            ("latents" in sd or "image_proj" in sd):
        return "flux_infiniteyou_projector"
    if "tok_embeddings.word_embeddings.weight" in sd:
        return "stepvideo_text_encoder"
    if any(k.startswith("motion_modules.") and "transformer_blocks" in k
           for k in keys):
        return "motion_modules"
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
    if any(".positional_conv." in k for k in keys):
        return "svd_unet_exvideo"   # ExVideo-SVD-128f patched UNet
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


def apply_state_dict_patch(base_sd: Dict, patch_sd: Dict) -> Dict:
    """FromPatchedSingleFile semantics (reference model_manager.py:232-312,
    patch configs model_config.py:197-199): the patched model is the base
    model rebuilt with the patch's extra modules (e.g. ExVideo's trained
    128-frame positional tables + reflect convs) and the patch's finetuned
    weights overlaid on the base weights."""
    out = dict(base_sd)
    out.update(patch_sd)
    return out
