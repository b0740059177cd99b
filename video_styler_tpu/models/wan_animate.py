"""Wan-Animate adapter: pose + face conditioning, TPU-native.

Functional port of WanAnimateAdapter
(/root/reference/diffsynth/models/wan_video_animate_adapter.py:50-670):

  - pose_patch_embedding: pose latents added to trunk after patch embedding
    (frames 1..) — after_patch_embedding (:582-602)
  - motion encoder: StyleGAN-style appearance encoder (equalized conv/linear,
    blur-downsample ResBlocks) + EqualLinear motion head + QR-orthogonalized
    Direction basis (:396-650)
  - FaceEncoder: causal conv1d pyramid -> per-frame motion tokens (:67-115)
  - FaceAdapter: cross-attention FaceBlocks fused after every 5th DiT layer
    (:193-303, :604-609)

Params nest by torch module names (generic converter); fp32.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from einops import rearrange

from ..ops.basic import layer_norm
from ..ops.attention import sdpa


# ------------------------------------------------------------- StyleGAN ops

def upfirdn2d(x, kernel, up: int = 1, down: int = 1, pad=(0, 0)):
    """upfirdn2d_native (:361-381). x: (B, C, H, W); kernel: (kh, kw)."""
    b, c, in_h, in_w = x.shape
    kh, kw = kernel.shape
    if up > 1:
        x = x.reshape(b, c, in_h, 1, in_w, 1)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, up - 1), (0, 0), (0, up - 1)))
        x = x.reshape(b, c, in_h * up, in_w * up)
    pad_y0, pad_y1, pad_x0, pad_x1 = pad[0], pad[1], pad[0], pad[1]
    x = jnp.pad(x, ((0, 0), (0, 0),
                    (max(pad_y0, 0), max(pad_y1, 0)),
                    (max(pad_x0, 0), max(pad_x1, 0))))
    x = x[:, :, max(-pad_y0, 0): x.shape[2] - max(-pad_y1, 0),
          max(-pad_x0, 0): x.shape[3] - max(-pad_x1, 0)]
    w = jnp.flip(kernel, (0, 1))[None, None].astype(x.dtype)
    xr = x.reshape(b * c, 1, x.shape[2], x.shape[3])
    y = jax.lax.conv_general_dilated(
        xr, w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(b, c, y.shape[2], y.shape[3])
    return y[:, :, ::down, ::down]


def blur(p, x, pad):
    return upfirdn2d(x, p["kernel"], pad=pad)


def equal_conv2d(p, x, stride=1, padding=0):
    w = p["weight"]
    scale = 1 / math.sqrt(w.shape[1] * w.shape[2] ** 2)
    y = jax.lax.conv_general_dilated(
        x, (w * scale).astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(y.dtype)[None, :, None, None]
    return y


def fused_leaky_relu_mod(p, x, negative_slope=0.2, scale=2 ** 0.5):
    y = x + p["bias"].astype(x.dtype)
    return jnp.where(y >= 0, y, negative_slope * y) * scale


def equal_linear(p, x, lr_mul: float = 1.0, activation=None):
    w = p["weight"]
    scale = (1 / math.sqrt(w.shape[1])) * lr_mul
    out = x @ (w.T * scale).astype(x.dtype)
    if activation:
        out = out + p["bias"].astype(x.dtype) * lr_mul
        return jnp.where(out >= 0, out, 0.2 * out) * (2 ** 0.5)
    return out + p["bias"].astype(x.dtype) * lr_mul


def conv_layer(p, x, kernel_size: int, downsample: bool, activate: bool = True,
               bias: bool = True, blur_kernel=(1, 3, 3, 1)):
    """ConvLayer (:452-489): [Blur?] EqualConv2d [FusedLeakyReLU?]."""
    idx = 0
    if downsample:
        factor = 2
        pl = (len(blur_kernel) - factor) + (kernel_size - 1)
        pad0, pad1 = (pl + 1) // 2, pl // 2
        x = blur(p["0"], x, (pad0, pad1))
        idx = 1
        stride, padding = 2, 0
    else:
        stride, padding = 1, kernel_size // 2
    x = equal_conv2d(p[str(idx)], x, stride=stride, padding=padding)
    if activate:
        x = fused_leaky_relu_mod(p[str(idx + 1)], x)
    return x


def res_block(p, x):
    out = conv_layer(p["conv1"], x, 3, downsample=False)
    out = conv_layer(p["conv2"], out, 3, downsample=True)
    skip = conv_layer(p["skip"], x, 1, downsample=True, activate=False, bias=False)
    return (out + skip) / math.sqrt(2)


_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128, 256: 64,
             512: 32, 1024: 16}


def encoder_app(p, x, size: int = 512):
    """EncoderApp (:511-550) -> (B, w_dim) feature."""
    log_size = int(math.log(size, 2))
    h = conv_layer(p["convs"]["0"], x, 1, downsample=False)
    idx = 1
    for i in range(log_size, 2, -1):
        h = res_block(p["convs"][str(idx)], h)
        idx += 1
    h = equal_conv2d(p["convs"][str(idx)], h, padding=0)
    return h[:, :, 0, 0]


def get_motion(p, imgs, size: int = 512):
    """Generator.get_motion (:640-650): appearance encode -> EqualLinear
    stack -> QR direction projection."""
    h = encoder_app(p["enc"]["net_app"], imgs, size)
    for i in range(5):
        h = equal_linear(p["enc"]["fc"][str(i)], h)
    weight = p["dec"]["direction"]["weight"].astype(jnp.float32) + 1e-8
    Q, _ = jnp.linalg.qr(weight)
    input_diag = jax.vmap(jnp.diag)(h.astype(jnp.float32))   # (B, m, m)
    out = jnp.einsum("bmn,nk->bmk", input_diag, Q.T)
    return jnp.sum(out, axis=1).astype(imgs.dtype)


# ------------------------------------------------------------- face encoder

def _causal_conv1d(p, x, stride=1):
    k = p["weight"].shape[2]
    x = jnp.pad(x, ((0, 0), (0, 0), (k - 1, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (stride,), [(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)[None, :, None]).astype(x.dtype)


def face_encoder(p, x, num_heads: int):
    """FaceEncoder (:67-115). x: (B, T, C) -> (B, T', heads+1, hidden)."""
    from ..ops.basic import silu
    x = x.transpose(0, 2, 1)
    b = x.shape[0]
    x = _causal_conv1d(p["conv1_local"]["conv"], x)
    x = rearrange(x, "b (n c) t -> (b n) t c", n=num_heads)
    x = silu(layer_norm({}, x, 1e-6))
    x = _causal_conv1d(p["conv2"]["conv"], x.transpose(0, 2, 1), stride=2)
    x = silu(layer_norm({}, x.transpose(0, 2, 1), 1e-6))
    x = _causal_conv1d(p["conv3"]["conv"], x.transpose(0, 2, 1), stride=2)
    x = silu(layer_norm({}, x.transpose(0, 2, 1), 1e-6))
    x = x @ p["out_proj"]["weight"].T.astype(x.dtype) + p["out_proj"]["bias"].astype(x.dtype)
    x = rearrange(x, "(b n) t c -> b t n c", b=b)
    padding = jnp.broadcast_to(p["padding_tokens"].astype(x.dtype),
                               (b, x.shape[1], 1, x.shape[-1]))
    return jnp.concatenate([x, padding], axis=-2)


# ------------------------------------------------------------- face block

def _rms_affine(p, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), -1, keepdims=True) + eps)
    return (y.astype(x.dtype)) * p["weight"].astype(x.dtype)


def face_block(p, x, motion_vec, heads_num: int):
    """FaceBlock.forward (:272-303): per-frame cross attention from the
    frame's video tokens to that frame's motion tokens."""
    B, T, N, C = motion_vec.shape
    x_motion = layer_norm({}, motion_vec, 1e-6)
    x_feat = layer_norm({}, x, 1e-6)
    kv = x_feat.shape  # noqa
    kv = x_motion @ p["linear1_kv"]["weight"].T.astype(x.dtype) + \
        p["linear1_kv"]["bias"].astype(x.dtype)
    q = x_feat @ p["linear1_q"]["weight"].T.astype(x.dtype) + \
        p["linear1_q"]["bias"].astype(x.dtype)
    D = C // heads_num
    k, v = rearrange(kv, "B L N (K H D) -> K B L N H D", K=2, H=heads_num)
    q = rearrange(q, "B S (H D) -> B S H D", H=heads_num)
    q = _rms_affine(p["q_norm"], q)
    k = _rms_affine(p["k_norm"], k)
    k = rearrange(k, "B L N H D -> (B L) N H D")
    v = rearrange(v, "B L N H D -> (B L) N H D")
    q = rearrange(q, "B (L S) H D -> (B L) S H D", L=T)
    out = sdpa(q, k, v)
    out = rearrange(out, "(B L) S H D -> B (L S) (H D)", L=T)
    return out @ p["linear2"]["weight"].T.astype(x.dtype) + \
        p["linear2"]["bias"].astype(x.dtype)


# ------------------------------------------------------------- adapter

def animate_after_patch_embedding(params, x, pose_latents, face_pixel_values,
                                  size: int = 512):
    """after_patch_embedding (:582-602). x: (B, D, F, h, w) trunk after
    patch conv (5D, pre-flatten); pose_latents: (B, 16, F-1, H, W)."""
    pp = params["pose_patch_embedding"]
    w = pp["weight"]
    kt, kh, kw = w.shape[2:]
    tok = rearrange(pose_latents, "b c (f kt) (h kh) (w kw) -> b (f h w) (c kt kh kw)",
                    kt=kt, kh=kh, kw=kw)
    pose = tok @ w.reshape(w.shape[0], -1).T.astype(tok.dtype) + pp["bias"].astype(tok.dtype)
    f = pose_latents.shape[2] // kt
    h = pose_latents.shape[3] // kh
    ww = pose_latents.shape[4] // kw
    pose = rearrange(pose, "b (f h w) d -> b d f h w", f=f, h=h, w=ww)
    x = x.at[:, :, 1:].add(pose.astype(x.dtype))

    b, c, T, hh, wpx = face_pixel_values.shape
    faces = rearrange(face_pixel_values, "b c t h w -> (b t) c h w")
    motion = get_motion(params["motion_encoder"], faces, size)
    motion = rearrange(motion, "(b t) c -> b t c", t=T)
    motion_vec = face_encoder(params["face_encoder"], motion,
                              num_heads=4)
    B, L, H, C2 = motion_vec.shape
    pad_face = jnp.zeros((B, 1, H, C2), motion_vec.dtype)
    return x, jnp.concatenate([pad_face, motion_vec], axis=1)


def animate_after_transformer_block(params, block_idx: int, x, motion_vec,
                                    heads_num: int = 40):
    """after_transformer_block (:604-609): FaceBlock residual every 5 layers."""
    if block_idx % 5 != 0:
        return x
    p = params["face_adapter"]["fuser_blocks"][str(block_idx // 5)]
    return x + face_block(p, x, motion_vec, heads_num)


def convert_wan_animate(sd: Dict, dtype=jnp.float32):
    """Nest the torch state dict by names (weights kept in torch layout)."""
    import numpy as _np
    root: Dict = {}
    for key, val in sd.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if hasattr(val, "detach"):
            val = val.detach().float().cpu().numpy()
        node[parts[-1]] = jnp.asarray(_np.asarray(val), dtype)
    return root
