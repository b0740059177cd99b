"""Qwen-Image VAE: the Wan2.1 causal VAE under diffusers-flavored key names.

The reference QwenImageVAE (/root/reference/diffsynth/models/qwen_image_vae.py
:640-736) is architecturally identical to the Wan2.1 VideoVAE_ (same dims,
z=16, same causal convs / RMS norms / resamples, and the SAME latent
mean/std constants), applied to single frames (unsqueeze(2)). We rename its
keys into the wan_vae pytree and reuse that forward.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import wan_vae as V


_RENAMES = [
    ("encoder.conv_in", "encoder.conv1"),
    ("encoder.down_blocks.", "encoder.downsamples."),
    ("encoder.mid_block.resnets.0", "encoder.middle.0"),
    ("encoder.mid_block.attentions.0", "encoder.middle.1"),
    ("encoder.mid_block.resnets.1", "encoder.middle.2"),
    ("encoder.norm_out", "encoder.head.0"),
    ("encoder.conv_out", "encoder.head.2"),
    ("decoder.conv_in", "decoder.conv1"),
    ("decoder.mid_block.resnets.0", "decoder.middle.0"),
    ("decoder.mid_block.attentions.0", "decoder.middle.1"),
    ("decoder.mid_block.resnets.1", "decoder.middle.2"),
    ("decoder.norm_out", "decoder.head.0"),
    ("decoder.conv_out", "decoder.head.2"),
    ("quant_conv", "conv1"),
    ("post_quant_conv", "conv2"),
]

_LEAF_RENAMES = [
    ("norm1.gamma", "residual.0.gamma"),
    ("conv1.weight", "residual.2.weight"), ("conv1.bias", "residual.2.bias"),
    ("norm2.gamma", "residual.3.gamma"),
    ("conv2.weight", "residual.6.weight"), ("conv2.bias", "residual.6.bias"),
    ("conv_shortcut.", "shortcut."),
]


def _flatten_up_blocks(sd, num_res_blocks: int):
    """decoder.up_blocks.i.{resnets.j | upsamplers.0} -> the flat Wan
    'upsamples.N' indexing (QwenImageUpBlock, qwen_image_vae.py:452-520 vs
    wan_video_vae.py Decoder3d)."""
    out = {}
    for k, v in sd.items():
        if not k.startswith("decoder.up_blocks."):
            out[k] = v
            continue
        parts = k.split(".")
        i = int(parts[2])
        per_block = num_res_blocks + 1 + 1          # resnets + upsampler slot
        base = i * (num_res_blocks + 2)
        # blocks before i may not all have an upsampler (the last one
        # doesn't), but the last block is also the last group so indices
        # computed cumulatively stay correct
        if parts[3] == "resnets":
            j = int(parts[4])
            idx = base + j
            out[f"decoder.upsamples.{idx}." + ".".join(parts[5:])] = v
        elif parts[3] == "upsamplers":
            idx = base + num_res_blocks + 1
            out[f"decoder.upsamples.{idx}." + ".".join(parts[5:])] = v
        else:
            out[k] = v
    return out


def convert_qwen_image_vae(sd, dtype=jnp.float32, num_res_blocks: int = None):
    if num_res_blocks is None:
        # count decoder.up_blocks.0.resnets.N
        n = 0
        while f"decoder.up_blocks.0.resnets.{n}.conv1.weight" in sd:
            n += 1
        num_res_blocks = max(n - 1, 1)
    sd = _flatten_up_blocks(dict(sd), num_res_blocks)
    renamed = {}
    for k, v in sd.items():
        for old, new in _RENAMES:
            if k.startswith(old):
                k = new + k[len(old):]
                break
        # leaf renames apply only inside residual blocks (the top-level
        # quant convs are also named conv1/conv2 after the prefix rename)
        if any(t in k for t in ("downsamples.", "upsamples.", "middle.")):
            for old, new in _LEAF_RENAMES:
                if f".{old}" in k:
                    k = k.replace(old, new)
                    break
        renamed[k] = v
    return V.convert_wan_vae(renamed, dtype=dtype)


def qwen_vae_encode(params, image, cfg: V.WanVAEConfig = V.WAN21_VAE):
    """image (B, 3, H, W) in [-1, 1] -> latents (B, z, H/8, W/8)
    (QwenImageVAE.encode, :707-714)."""
    return V.vae_encode(params, image[:, :, None], cfg)[:, :, 0]


def qwen_vae_decode(params, latents, cfg: V.WanVAEConfig = V.WAN21_VAE):
    return V.vae_decode(params, latents[:, :, None], cfg, clamp=False)[:, :, 0]
