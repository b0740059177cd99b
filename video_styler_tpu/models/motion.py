"""AnimateDiff motion modules for SD / SDXL, TPU-native.

Re-designs of SDMotionModel (/root/reference/diffsynth/models/sd_motion.py
:95-144) and SDXLMotionModel (sdxl_motion.py:6-53): TemporalBlocks run after
mapped UNet blocks, attending across the frame axis per pixel with learned
positional embeddings.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.basic import linear, layer_norm
from .sd import group_norm, attn
from .svd import _geglu

SD_MOTION_CALL_BLOCK_ID = {
    1: 0, 4: 1, 9: 2, 12: 3, 17: 4, 20: 5, 24: 6, 26: 7, 29: 8, 32: 9,
    34: 10, 36: 11, 40: 12, 43: 13, 46: 14, 50: 15, 53: 16, 56: 17, 60: 18,
    63: 19, 66: 20}                                  # (sd_motion.py:121-143)
SDXL_MOTION_CALL_BLOCK_ID = {
    0: 0, 2: 1, 7: 2, 10: 3, 15: 4, 18: 5, 25: 6, 28: 7, 31: 8, 35: 9,
    38: 10, 41: 11, 44: 12, 46: 13, 48: 14}          # (sdxl_motion.py:37-53)


def temporal_transformer_block(p, h, num_heads: int):
    """TemporalTransformerBlock (sd_motion.py:6-50). h: (HW, T, C) — the
    frames-as-batch tensor already regrouped per pixel."""
    T = h.shape[1]
    nh = layer_norm(p["norm1"], h, 1e-5)
    nh = nh + p["pe1"][:, :T].astype(nh.dtype)
    h = h + attn(p["attn1"], nh, num_heads=num_heads)
    nh = layer_norm(p["norm2"], h, 1e-5)
    nh = nh + p["pe2"][:, :T].astype(nh.dtype)
    h = h + attn(p["attn2"], nh, num_heads=num_heads)
    nh = layer_norm(p["norm3"], h, 1e-5)
    return h + linear(p["ff"], _geglu(p["act_fn"], nh))


def temporal_block(p, x, num_heads: int = 8, eps: float = 1e-6):
    """TemporalBlock (sd_motion.py:53-93). x: (T, C, H, W) frames-as-batch."""
    T, C, H, W = x.shape
    residual = x
    h = group_norm(p["norm"], x, eps=eps)
    h = h.transpose(0, 2, 3, 1).reshape(T, H * W, C)
    h = linear(p["proj_in"], h)
    # (b f) hw c -> (b hw) f c with b=1
    h = h.transpose(1, 0, 2)
    for i in sorted(p["transformer_blocks"], key=int):
        h = temporal_transformer_block(p["transformer_blocks"][i], h, num_heads)
    h = h.transpose(1, 0, 2)
    h = linear(p["proj_out"], h)
    h = h.reshape(T, H, W, C).transpose(0, 3, 1, 2)
    return h + residual


def convert_motion_model(sd, dtype=jnp.float32):
    from .sd import convert_sd_module
    return convert_sd_module(sd, dtype=dtype)
