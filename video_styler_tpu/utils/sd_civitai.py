"""Algorithmic civitai/LDM -> internal-name converters for SD-1.5.

The reference ships ~700-entry static rename tables
(sd_unet.py:414+, sd_text_encoder.py, sd_vae_*.py from_civitai). Those
tables are just the LDM checkpoint layout zipped against the sequential
block program, so here the mapping is *derived*: walk the UNet block
program and the LDM module order together (they enumerate the same
res/attn/down/up sequence), then apply per-module leaf renames. Tests use
the reference tables as an oracle.

A civitai single file splits by prefix:
  model.diffusion_model.*  -> UNet
  first_stage_model.*      -> VAE encoder+decoder
  cond_stage_model.*       -> CLIP text encoder
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# LDM UNet module order: (ldm_path, kind) — input blocks, middle, output
_LDM_INPUT = []
for _i in range(1, 12):
    if _i in (3, 6, 9):
        _LDM_INPUT.append((f"input_blocks.{_i}.0.op", "down"))
    elif _i in (10, 11):
        _LDM_INPUT.append((f"input_blocks.{_i}.0", "res"))
    else:
        _LDM_INPUT.append((f"input_blocks.{_i}.0", "res"))
        _LDM_INPUT.append((f"input_blocks.{_i}.1", "attn"))

_LDM_MID = [("middle_block.0", "res"), ("middle_block.1", "attn"),
            ("middle_block.2", "res")]

_LDM_OUTPUT = []
for _i in range(12):
    _LDM_OUTPUT.append((f"output_blocks.{_i}.0", "res"))
    if _i >= 3:
        _LDM_OUTPUT.append((f"output_blocks.{_i}.1", "attn"))
    if _i in (2, 5, 8):
        up_sub = 1 if _i == 2 else 2
        _LDM_OUTPUT.append((f"output_blocks.{_i}.{up_sub}.conv", "up"))

LDM_UNET_ORDER = _LDM_INPUT + _LDM_MID + _LDM_OUTPUT

_RES_LEAVES = {
    "in_layers.0": "norm1", "in_layers.2": "conv1",
    "emb_layers.1": "time_emb_proj",
    "out_layers.0": "norm2", "out_layers.3": "conv2",
    "skip_connection": "conv_shortcut",
}
_ATTN_LEAVES = {
    "norm": "norm", "proj_in": "proj_in", "proj_out": "proj_out",
    "transformer_blocks.0.norm1": "transformer_blocks.0.norm1",
    "transformer_blocks.0.norm2": "transformer_blocks.0.norm2",
    "transformer_blocks.0.norm3": "transformer_blocks.0.norm3",
    "transformer_blocks.0.attn1.to_q": "transformer_blocks.0.attn1.to_q",
    "transformer_blocks.0.attn1.to_k": "transformer_blocks.0.attn1.to_k",
    "transformer_blocks.0.attn1.to_v": "transformer_blocks.0.attn1.to_v",
    "transformer_blocks.0.attn1.to_out.0": "transformer_blocks.0.attn1.to_out",
    "transformer_blocks.0.attn2.to_q": "transformer_blocks.0.attn2.to_q",
    "transformer_blocks.0.attn2.to_k": "transformer_blocks.0.attn2.to_k",
    "transformer_blocks.0.attn2.to_v": "transformer_blocks.0.attn2.to_v",
    "transformer_blocks.0.attn2.to_out.0": "transformer_blocks.0.attn2.to_out",
    "transformer_blocks.0.ff.net.0.proj": "transformer_blocks.0.act_fn.proj",
    "transformer_blocks.0.ff.net.2": "transformer_blocks.0.ff",
}


def sd_unet_rename_map() -> Dict[str, str]:
    """ldm-module-path -> internal 'blocks.N'-style prefix map."""
    from ..models.sd import SD_UNET_PROGRAM
    program_slots = [(i, kind) for i, (kind, _) in enumerate(SD_UNET_PROGRAM)
                     if kind in ("res", "attn", "down", "up")]
    assert len(program_slots) == len(LDM_UNET_ORDER)
    mapping = {}
    for (blk_idx, kind), (ldm_path, ldm_kind) in zip(program_slots, LDM_UNET_ORDER):
        assert kind == ldm_kind, (kind, ldm_kind, ldm_path)
        if kind == "res":
            for src, dst in _RES_LEAVES.items():
                mapping[f"{ldm_path}.{src}"] = f"blocks.{blk_idx}.{dst}"
        elif kind == "attn":
            for src, dst in _ATTN_LEAVES.items():
                mapping[f"{ldm_path}.{src}"] = f"blocks.{blk_idx}.{dst}"
        else:  # down / up samplers: conv module
            mapping[ldm_path] = f"blocks.{blk_idx}.conv"
    mapping["input_blocks.0.0"] = "conv_in"
    mapping["time_embed.0"] = "time_embedding.0"
    mapping["time_embed.2"] = "time_embedding.2"
    mapping["out.0"] = "conv_norm_out"
    mapping["out.2"] = "conv_out"
    return mapping


def convert_sd_unet_from_civitai(sd: Dict) -> Dict:
    prefix = "model.diffusion_model."
    mapping = sd_unet_rename_map()
    out = {}
    for name, param in sd.items():
        if not name.startswith(prefix):
            continue
        tail = name[len(prefix):]
        module, leaf = tail.rsplit(".", 1)
        if module not in mapping:
            continue
        new = f"{mapping[module]}.{leaf}"
        if ".proj_in." in new or ".proj_out." in new:
            param = np.asarray(param).squeeze()
        out[new] = param
    return out


# ---------------------------------------------------------------- VAE

def _vae_attn_map(ldm: str, internal: str) -> Dict[str, str]:
    return {
        f"{ldm}.norm": f"{internal}.norm",
        f"{ldm}.q": f"{internal}.transformer_blocks.0.to_q",
        f"{ldm}.k": f"{internal}.transformer_blocks.0.to_k",
        f"{ldm}.v": f"{internal}.transformer_blocks.0.to_v",
        f"{ldm}.proj_out": f"{internal}.transformer_blocks.0.to_out",
    }


def _vae_res_map(ldm: str, internal: str) -> Dict[str, str]:
    return {
        f"{ldm}.norm1": f"{internal}.norm1", f"{ldm}.conv1": f"{internal}.conv1",
        f"{ldm}.norm2": f"{internal}.norm2", f"{ldm}.conv2": f"{internal}.conv2",
        f"{ldm}.nin_shortcut": f"{internal}.conv_shortcut",
    }


def sd_vae_encoder_rename_map() -> Dict[str, str]:
    m = {}
    blk = 0
    for stage in range(4):
        for j in range(2):
            m.update(_vae_res_map(f"encoder.down.{stage}.block.{j}",
                                  f"blocks.{blk}"))
            blk += 1
        if stage < 3:
            m[f"encoder.down.{stage}.downsample.conv"] = f"blocks.{blk}.conv"
            blk += 1
    m.update(_vae_res_map("encoder.mid.block_1", f"blocks.{blk}"))
    m.update(_vae_attn_map("encoder.mid.attn_1", f"blocks.{blk + 1}"))
    m.update(_vae_res_map("encoder.mid.block_2", f"blocks.{blk + 2}"))
    m["encoder.conv_in"] = "conv_in"
    m["encoder.norm_out"] = "conv_norm_out"
    m["encoder.conv_out"] = "conv_out"
    m["quant_conv"] = "quant_conv"
    return m


def sd_vae_decoder_rename_map() -> Dict[str, str]:
    m = {}
    m.update(_vae_res_map("decoder.mid.block_1", "blocks.0"))
    m.update(_vae_attn_map("decoder.mid.attn_1", "blocks.1"))
    m.update(_vae_res_map("decoder.mid.block_2", "blocks.2"))
    blk = 3
    # ldm decoder.up index 3 runs first (512ch), 0 last
    for stage in (3, 2, 1, 0):
        for j in range(3):
            m.update(_vae_res_map(f"decoder.up.{stage}.block.{j}",
                                  f"blocks.{blk}"))
            blk += 1
        if stage > 0:
            m[f"decoder.up.{stage}.upsample.conv"] = f"blocks.{blk}.conv"
            blk += 1
    m["decoder.conv_in"] = "conv_in"
    m["decoder.norm_out"] = "conv_norm_out"
    m["decoder.conv_out"] = "conv_out"
    m["post_quant_conv"] = "post_quant_conv"
    return m


def _convert_vae(sd: Dict, prefix: str, mapping: Dict[str, str]) -> Dict:
    out = {}
    for name, param in sd.items():
        if not name.startswith(prefix):
            continue
        tail = name[len(prefix):]
        if "." not in tail:
            continue
        module, leaf = tail.rsplit(".", 1)
        if module not in mapping:
            continue
        new = f"{mapping[module]}.{leaf}"
        if ".transformer_blocks." in new:
            param = np.asarray(param).squeeze()
            if leaf == "weight" and param.ndim == 2:
                pass
        out[new] = param
    return out


def convert_sd_vae_encoder_from_civitai(sd: Dict) -> Dict:
    return _convert_vae(sd, "first_stage_model.", sd_vae_encoder_rename_map())


def convert_sd_vae_decoder_from_civitai(sd: Dict) -> Dict:
    return _convert_vae(sd, "first_stage_model.", sd_vae_decoder_rename_map())


# ---------------------------------------------------------------- text enc

def convert_sd_text_encoder_from_civitai(sd: Dict) -> Dict:
    prefix = "cond_stage_model.transformer.text_model."
    leaf_map = {
        "self_attn.q_proj": "attn.to_q", "self_attn.k_proj": "attn.to_k",
        "self_attn.v_proj": "attn.to_v", "self_attn.out_proj": "attn.to_out",
        "layer_norm1": "layer_norm1", "layer_norm2": "layer_norm2",
        "mlp.fc1": "fc1", "mlp.fc2": "fc2",
    }
    out = {}
    for name, param in sd.items():
        if not name.startswith(prefix):
            continue
        tail = name[len(prefix):]
        if tail == "embeddings.token_embedding.weight":
            out["token_embedding.weight"] = param
        elif tail == "embeddings.position_embedding.weight":
            out["position_embeds"] = np.asarray(param)[None]
        elif tail.startswith("final_layer_norm."):
            out[tail] = param
        elif tail.startswith("encoder.layers."):
            parts = tail.split(".")
            layer, module, leaf = parts[2], ".".join(parts[3:-1]), parts[-1]
            if module in leaf_map:
                out[f"encoders.{layer}.{leaf_map[module]}.{leaf}"] = param
    return out


def convert_sd_civitai(sd: Dict) -> Dict[str, Dict]:
    """Full civitai single file -> {'unet', 'text_encoder', 'vae_encoder',
    'vae_decoder'} internal-name state dicts."""
    return {
        "unet": convert_sd_unet_from_civitai(sd),
        "text_encoder": convert_sd_text_encoder_from_civitai(sd),
        "vae_encoder": convert_sd_vae_encoder_from_civitai(sd),
        "vae_decoder": convert_sd_vae_decoder_from_civitai(sd),
    }
