"""SD3 / FLUX image VAE (16-channel latents), TPU-native.

Re-design of the reference SD3VAEEncoder/SD3VAEDecoder
(/root/reference/diffsynth/models/sd3_vae_encoder.py:8-95,
sd3_vae_decoder.py:8-90) and their FLUX subclasses
(flux_vae.py:5-25, which only change scaling/shift). The block sequence is
identical to the SD 1.x VAE (same ResnetBlock/DownSampler/UpSampler/
VAEAttentionBlock modules), so the SD block programs from models/sd.py are
reused; only the latent width (16), the absence of quant convs, and the
(shift, scale) affine differ.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .sd import (
    conv2d, group_norm, _silu, resnet_block, vae_attention_block, downsample,
    upsample, SD_VAE_DECODER_PROGRAM, SD_VAE_ENCODER_PROGRAM,
)


@dataclass(frozen=True)
class SD3VAEConfig:
    z_dim: int = 16
    scaling_factor: float = 1.5305
    shift_factor: float = 0.0609


SD3_VAE = SD3VAEConfig()
FLUX_VAE = SD3VAEConfig(scaling_factor=0.3611, shift_factor=0.1159)


def sd3_vae_encoder_forward(params, sample, cfg: SD3VAEConfig = SD3_VAE):
    """SD3VAEEncoder.forward (sd3_vae_encoder.py:53-74): image (B, 3, H, W)
    in [-1, 1] -> latents (B, 16, H/8, W/8)."""
    h = conv2d(params["conv_in"], sample)
    for i, (kind, eps) in enumerate(SD_VAE_ENCODER_PROGRAM):
        p = params["blocks"].get(str(i), {})
        if kind == "res":
            pp = dict(p)
            pp["_eps"] = eps
            h = resnet_block(pp, h, None)
        elif kind == "vattn":
            h = vae_attention_block(p, h, eps)
        elif kind == "downx":
            h = downsample(p, h, padding=0, extra_padding=True)
    h = group_norm(params["conv_norm_out"], h, eps=1e-6)
    h = _silu(h)
    h = conv2d(params["conv_out"], h)
    h = h[:, :cfg.z_dim]
    return (h - cfg.shift_factor) * cfg.scaling_factor


def sd3_vae_decoder_forward(params, sample, cfg: SD3VAEConfig = SD3_VAE):
    """SD3VAEDecoder.forward (sd3_vae_decoder.py:54-77)."""
    h = sample / cfg.scaling_factor + cfg.shift_factor
    h = conv2d(params["conv_in"], h)
    for i, (kind, eps) in enumerate(SD_VAE_DECODER_PROGRAM):
        p = params["blocks"].get(str(i), {})
        if kind == "res":
            pp = dict(p)
            pp["_eps"] = eps
            h = resnet_block(pp, h, None)
        elif kind == "vattn":
            h = vae_attention_block(p, h, eps)
        elif kind == "up":
            h = upsample(p, h)
    h = group_norm(params["conv_norm_out"], h, eps=1e-6)
    h = _silu(h)
    return conv2d(params["conv_out"], h)


def convert_sd3_vae(sd, dtype=jnp.float32):
    from .sd import convert_sd_module
    return convert_sd_module(sd, dtype=dtype)
