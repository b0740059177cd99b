"""HunyuanVideo causal 3D VAE, TPU-native.

Re-design of HunyuanVideoVAEEncoder / HunyuanVideoVAEDecoder
(/root/reference/diffsynth/models/hunyuan_video_vae_encoder.py:10-295,
hunyuan_video_vae_decoder.py:10-495): causal convs use REPLICATE padding
(spatial symmetric + temporal left, CausalConv3d :10-21), GroupNorm resnets,
a mid block with frame-causal full attention, stride-conv downsampling and
first-frame-pinned nearest upsampling. 4x temporal / 8x spatial compression,
z=16, scaling 0.476986. 3-D tiled encode/decode with min(t,h,w) ramp masks
mirrors tile_forward (:432-485).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class HunyuanVAEConfig:
    z_dim: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    num_groups: int = 32
    time_compression: int = 4
    spatial_compression: int = 8
    scaling_factor: float = 0.476986
    eps: float = 1e-6


HUNYUAN_VAE = HunyuanVAEConfig()
HUNYUAN_VAE_TINY = HunyuanVAEConfig(z_dim=4, block_out_channels=(8, 16, 16, 16),
                                    layers_per_block=1, num_groups=4)


# --------------------------------------------------------------------------
# Primitives (params follow torch module naming)
# --------------------------------------------------------------------------

def causal_conv3d(p, x, stride=(1, 1, 1)):
    """CausalConv3d with replicate padding (hunyuan_video_vae_decoder.py:10-21)."""
    k = p["weight"].shape[2]
    pad = k // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (k - 1, 0), (pad, pad), (pad, pad)),
                mode="edge")
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), stride, "VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)[None, :, None, None, None]
    return y.astype(x.dtype)


def group_norm_3d(p, x, groups: int, eps: float):
    b, c, t, h, w = x.shape
    xf = x.astype(jnp.float32).reshape(b, groups, c // groups, t, h, w)
    mean = jnp.mean(xf, axis=(2, 3, 4, 5), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(2, 3, 4, 5), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, c, t, h, w)
    y = y * p["weight"].astype(jnp.float32)[None, :, None, None, None]
    y = y + p["bias"].astype(jnp.float32)[None, :, None, None, None]
    return y.astype(x.dtype)


def _silu(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


def resnet_block(p, x, cfg: HunyuanVAEConfig):
    """ResnetBlockCausal3D (hunyuan_video_vae_decoder.py:64-105)."""
    h = group_norm_3d(p["norm1"], x, cfg.num_groups, cfg.eps)
    h = causal_conv3d(p["conv1"], _silu(h))
    h = group_norm_3d(p["norm2"], h, cfg.num_groups, cfg.eps)
    h = causal_conv3d(p["conv2"], _silu(h))
    if "conv_shortcut" in p:
        x = causal_conv3d(p["conv_shortcut"], x)
    return x + h


def mid_attention(p, x, cfg: HunyuanVAEConfig):
    """Single-head frame-causal attention over (f h w) tokens
    (Attention + prepare_causal_attention_mask, :107-160)."""
    b, c, t, h, w = x.shape
    y = group_norm_3d(p["group_norm"], x, cfg.num_groups, cfg.eps)
    tok = y.transpose(0, 2, 3, 4, 1).reshape(b, t * h * w, c)

    def lin(q, v):
        out = jnp.dot(v, q["weight"].astype(v.dtype).T,
                      preferred_element_type=jnp.float32)
        return (out + q["bias"].astype(jnp.float32)).astype(v.dtype)

    q = lin(p["to_q"], tok)
    k = lin(p["to_k"], tok)
    v = lin(p["to_v"], tok)
    scale = 1.0 / np.sqrt(c)
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    frame = jnp.arange(t * h * w) // (h * w)
    mask = frame[:, None] >= frame[None, :]
    logits = jnp.where(mask[None], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = lin({"weight": p["to_out"]["0"]["weight"],
               "bias": p["to_out"]["0"]["bias"]}, out)
    out = out.reshape(b, t, h, w, c).transpose(0, 4, 1, 2, 3)
    return x + out


def mid_block(p, x, cfg: HunyuanVAEConfig):
    x = resnet_block(p["resnets"]["0"], x, cfg)
    x = mid_attention(p["attentions"]["0"], x, cfg)
    return resnet_block(p["resnets"]["1"], x, cfg)


def upsample_causal(p, x, factor):
    """UpsampleCausal3D (:24-61): first frame spatial-only nearest upsample,
    remaining frames full-factor, then causal conv."""
    ft, fh, fw = factor
    first = x[:, :, :1]
    first = jnp.repeat(jnp.repeat(first, fh, axis=-2), fw, axis=-1)
    rest = x[:, :, 1:]
    if rest.shape[2] > 0:
        rest = jnp.repeat(rest, ft, axis=2)
        rest = jnp.repeat(jnp.repeat(rest, fh, axis=-2), fw, axis=-1)
        x = jnp.concatenate([first, rest], axis=2)
    else:
        x = first
    return causal_conv3d(p["conv"], x)


def _down_plan(cfg: HunyuanVAEConfig):
    n = len(cfg.block_out_channels)
    ns = int(np.log2(cfg.spatial_compression))
    nt = int(np.log2(cfg.time_compression))
    plan = []
    for i in range(n):
        s = i < ns
        t = i >= (n - 1 - nt) and i != n - 1
        stride = ((2 if t else 1), (2 if s else 1), (2 if s else 1))
        plan.append((s or t, stride))
    return plan


def _up_plan(cfg: HunyuanVAEConfig):
    n = len(cfg.block_out_channels)
    ns = int(np.log2(cfg.spatial_compression))
    nt = int(np.log2(cfg.time_compression))
    plan = []
    for i in range(n):
        s = i < ns
        t = i >= (n - 1 - nt) and i != n - 1
        factor = ((2 if t else 1), (2 if s else 1), (2 if s else 1))
        plan.append((s or t, factor))
    return plan


def encoder_forward(p, x, cfg: HunyuanVAEConfig):
    """EncoderCausal3D.forward (hunyuan_video_vae_encoder.py:129-163)."""
    h = causal_conv3d(p["conv_in"], x)
    for i, (has_down, stride) in enumerate(_down_plan(cfg)):
        bp = p["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            h = resnet_block(bp["resnets"][str(j)], h, cfg)
        if has_down:
            h = causal_conv3d(bp["downsamplers"]["0"]["conv"], h, stride=stride)
    h = mid_block(p["mid_block"], h, cfg)
    h = group_norm_3d(p["conv_norm_out"], h, cfg.num_groups, cfg.eps)
    return causal_conv3d(p["conv_out"], _silu(h))


def decoder_forward(p, z, cfg: HunyuanVAEConfig):
    """DecoderCausal3D.forward (hunyuan_video_vae_decoder.py:331-367)."""
    h = causal_conv3d(p["conv_in"], z)
    h = mid_block(p["mid_block"], h, cfg)
    for i, (has_up, factor) in enumerate(_up_plan(cfg)):
        bp = p["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            h = resnet_block(bp["resnets"][str(j)], h, cfg)
        if has_up:
            h = upsample_causal(bp["upsamplers"]["0"], h, factor)
    h = group_norm_3d(p["conv_norm_out"], h, cfg.num_groups, cfg.eps)
    return causal_conv3d(p["conv_out"], _silu(h))


def vae_encode(params, video, cfg: HunyuanVAEConfig = HUNYUAN_VAE):
    """(B, 3, T, H, W) in [-1,1] -> scaled mean latents
    (HunyuanVideoVAEEncoder.forward, :199-204)."""
    m = encoder_forward(params["encoder"], video, cfg)
    m = causal_conv3d(params["quant_conv"], m)
    return m[:, :cfg.z_dim] * cfg.scaling_factor


def vae_decode(params, latents, cfg: HunyuanVAEConfig = HUNYUAN_VAE):
    """(HunyuanVideoVAEDecoder.forward, :401-405)."""
    z = latents / cfg.scaling_factor
    z = causal_conv3d(params["post_quant_conv"], z)
    return decoder_forward(params["decoder"], z, cfg)


# --------------------------------------------------------------------------
# 3-D tiling (tile_forward, hunyuan_video_vae_decoder.py:432-485)
# --------------------------------------------------------------------------

def _mask_1d(length, left_bound, right_bound, border):
    x = np.ones((length,), np.float32)
    if border > 0:
        if not left_bound:
            x[:border] = (np.arange(border) + 1) / border
        if not right_bound:
            x[-border:] = ((np.arange(border) + 1) / border)[::-1]
    return x


def _mask_3d(T, H, W, is_bound, border):
    t = _mask_1d(T, is_bound[0], is_bound[1], border[0])
    h = _mask_1d(H, is_bound[2], is_bound[3], border[1])
    w = _mask_1d(W, is_bound[4], is_bound[5], border[2])
    m = np.minimum.reduce(np.broadcast_arrays(
        t[:, None, None], h[None, :, None], w[None, None, :]))
    return m[None, None]


def _tile_tasks(T, dims, sizes, strides):
    tasks = []
    (size_t, size_h, size_w) = sizes
    (st, sh, sw) = strides
    H, W = dims
    for t in range(0, T, st):
        if t - st >= 0 and t - st + size_t >= T:
            continue
        for h in range(0, H, sh):
            if h - sh >= 0 and h - sh + size_h >= H:
                continue
            for w in range(0, W, sw):
                if w - sw >= 0 and w - sw + size_w >= W:
                    continue
                tasks.append((t, min(t + size_t, T), h, min(h + size_h, H),
                              w, min(w + size_w, W)))
    return tasks


def tiled_decode(params, latents, cfg: HunyuanVAEConfig = HUNYUAN_VAE,
                 tile_size=(17, 32, 32), tile_stride=(12, 24, 24)):
    B, C, T, H, W = latents.shape
    up = cfg.spatial_compression
    ut = cfg.time_compression
    out_T = (T - 1) * ut + 1
    values = np.zeros((B, 3, out_T, H * up, W * up), np.float32)
    weight = np.zeros((1, 1, out_T, H * up, W * up), np.float32)
    size_t, size_h, size_w = tile_size
    for t, t_, h, h_, w, w_ in _tile_tasks(T, (H, W), tile_size, tile_stride):
        tile = vae_decode(params, latents[:, :, t:t_, h:h_, w:w_], cfg)
        tile = np.asarray(tile, np.float32)
        if t > 0:
            tile = tile[:, :, 1:]
        mask = _mask_3d(tile.shape[2], tile.shape[3], tile.shape[4],
                        (t == 0, t_ >= T, h == 0, h_ >= H, w == 0, w_ >= W),
                        ((size_t - tile_stride[0]) * ut,
                         (size_h - tile_stride[1]) * up,
                         (size_w - tile_stride[2]) * up))
        tt = 0 if t == 0 else t * ut + 1
        values[:, :, tt:tt + tile.shape[2], h * up:h * up + tile.shape[3],
               w * up:w * up + tile.shape[4]] += tile * mask
        weight[:, :, tt:tt + tile.shape[2], h * up:h * up + tile.shape[3],
               w * up:w * up + tile.shape[4]] += mask
    return jnp.asarray(values / weight)


def tiled_encode(params, video, cfg: HunyuanVAEConfig = HUNYUAN_VAE,
                 tile_size=(65, 240, 240), tile_stride=(48, 160, 160)):
    """Pixel-space tiles (HunyuanVideoVAEEncoder.tile_forward semantics)."""
    B, C, T, H, W = video.shape
    up = cfg.spatial_compression
    ut = cfg.time_compression
    out_T = (T - 1) // ut + 1
    values = np.zeros((B, cfg.z_dim, out_T, H // up, W // up), np.float32)
    weight = np.zeros((1, 1, out_T, H // up, W // up), np.float32)
    size_t, size_h, size_w = tile_size
    for t, t_, h, h_, w, w_ in _tile_tasks(T, (H, W), tile_size, tile_stride):
        tile = vae_encode(params, video[:, :, t:t_, h:h_, w:w_], cfg)
        tile = np.asarray(tile, np.float32)
        if t > 0:
            tile = tile[:, :, 1:]
        mask = _mask_3d(tile.shape[2], tile.shape[3], tile.shape[4],
                        (t == 0, t_ >= T, h == 0, h_ >= H, w == 0, w_ >= W),
                        ((size_t - tile_stride[0]) // ut,
                         (size_h - tile_stride[1]) // up,
                         (size_w - tile_stride[2]) // up))
        tt = 0 if t == 0 else t // ut + 1
        values[:, :, tt:tt + tile.shape[2], h // up:h // up + tile.shape[3],
               w // up:w // up + tile.shape[4]] += tile * mask
        weight[:, :, tt:tt + tile.shape[2], h // up:h // up + tile.shape[3],
               w // up:w // up + tile.shape[4]] += mask
    return jnp.asarray(values / weight)


# --------------------------------------------------------------------------
# Conversion / init
# --------------------------------------------------------------------------

def convert_hunyuan_vae(sd, dtype=jnp.float32):
    """Nest the reference module state dict into the pytree the forward
    functions consume. CausalConv3d wraps its Conv3d as `.conv`, so one
    trailing '.conv' level before the leaf is stripped
    ('conv_in.conv.weight' -> 'conv_in.weight',
    'downsamplers.0.conv.conv.weight' -> 'downsamplers.0.conv.weight')."""
    root = {}
    for key, val in sd.items():
        parts = key.split(".")
        if len(parts) >= 2 and parts[-2] == "conv" \
                and parts[-1] in ("weight", "bias"):
            parts = parts[:-2] + parts[-1:]
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if hasattr(val, "detach"):
            val = val.detach().float().cpu().numpy()
        node[parts[-1]] = jnp.asarray(np.asarray(val), dtype)
    return root
