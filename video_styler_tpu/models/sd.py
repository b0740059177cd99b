"""Stable Diffusion 1.5 family: UNet, CLIP text encoder, VAE — JAX ports.

Functional ports of /root/reference/diffsynth/models/{sd_unet.py:6-349,
sd_text_encoder.py:5-78, sd_vae_encoder.py:8-101, sd_vae_decoder.py:7-123,
attention.py:15-89}. The UNet's push/pop residual-stack block program is kept
as static data driving a pure-function interpreter; params mirror the
reference module names (nested by the generic name converter), so a torch
state dict converts mechanically.

This is the CPU-runnable harness config of BASELINE.json (SD-1.5 512x512,
20-step EnhancedDDIM) and the base for SDXL/SD3 in later rounds.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, layer_norm
from ..ops.attention import sdpa


# ------------------------------------------------------------- primitives

def conv2d(p, x, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)[None, :, None, None]
    return y.astype(x.dtype)


def group_norm(p, x, groups: int = 32, eps: float = 1e-5):
    b, c, h, w = x.shape
    xf = x.astype(jnp.float32).reshape(b, groups, c // groups, h, w)
    mean = xf.mean(axis=(2, 3, 4), keepdims=True)
    var = xf.var(axis=(2, 3, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, c, h, w)
    return (xf * p["scale"].astype(jnp.float32)[None, :, None, None]
            + p["bias"].astype(jnp.float32)[None, :, None, None]).astype(x.dtype)


def _silu(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


def attn(p, x, context=None, num_heads: int = 8, mask=None, ip_kv=None):
    """Attention (attention.py:15-63): to_q/to_k/to_v/to_out, optional mask.

    ip_kv = (ip_k, ip_v, scale) adds the IP-Adapter decoupled-attention term
    scale * sdpa(q, ip_k, ip_v) before to_out (attention.py:55-56,
    sd_ipadapter.py / interact_with_ipadapter)."""
    context = x if context is None else context
    b, s, _ = x.shape
    sk = context.shape[1]
    q = linear(p["to_q"], x)
    k = linear(p["to_k"], context)
    v = linear(p["to_v"], context)
    d = q.shape[-1] // num_heads
    bias = None if mask is None else mask[None, None].astype(jnp.float32)
    qh = q.reshape(b, s, num_heads, d)
    out = sdpa(qh, k.reshape(b, sk, num_heads, d),
               v.reshape(b, sk, num_heads, d), bias=bias)
    if ip_kv is not None:
        ip_k, ip_v, scale = ip_kv
        ip_k = jnp.broadcast_to(ip_k, (b,) + ip_k.shape[1:]).astype(q.dtype)
        ip_v = jnp.broadcast_to(ip_v, (b,) + ip_v.shape[1:]).astype(q.dtype)
        lk = ip_k.shape[1]
        ip_out = sdpa(qh, ip_k.reshape(b, lk, num_heads, d),
                      ip_v.reshape(b, lk, num_heads, d))
        out = out + scale * ip_out
    return linear(p["to_out"], out.reshape(b, s, num_heads * d))


def timestep_embedding(timesteps, num_channels: int = 320):
    """Timesteps (sd_unet.py:6-17): cos-first, exp spacing over half dim."""
    half = num_channels // 2
    exponent = -math.log(10000) * jnp.arange(half, dtype=jnp.float32) / half
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


# ------------------------------------------------------------- UNet blocks

def basic_transformer_block(p, x, text_emb, num_heads: int, ip_kv=None):
    h = layer_norm(p["norm1"], x, 1e-5)
    x = x + attn(p["attn1"], h, num_heads=num_heads)
    h = layer_norm(p["norm2"], x, 1e-5)
    x = x + attn(p["attn2"], h, context=text_emb, num_heads=num_heads,
                 ip_kv=ip_kv)
    h = layer_norm(p["norm3"], x, 1e-5)
    gg = linear(p["act_fn"]["proj"], h)
    a, gate = jnp.split(gg, 2, axis=-1)
    h = a * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(a.dtype)
    return x + linear(p["ff"], h)


def resnet_block(p, x, time_emb):
    h = group_norm(p["norm1"], x, eps=float(p.get("_eps", 1e-5)))
    h = _silu(h)
    h = conv2d(p["conv1"], h)
    if time_emb is not None and "time_emb_proj" in p:
        emb = linear(p["time_emb_proj"], _silu(time_emb))
        h = h + emb[:, :, None, None].astype(h.dtype)
    h = group_norm(p["norm2"], h, eps=float(p.get("_eps", 1e-5)))
    h = _silu(h)
    h = conv2d(p["conv2"], h)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def attention_block(p, x, text_emb, num_heads: int, eps: float = 1e-6,
                    ipadapter_kwargs=None):
    """Spatial transformer (sd_unet.py:126-208). ipadapter_kwargs maps
    transformer-layer index -> (ip_k, ip_v, scale)."""
    b, c, hh, ww = x.shape
    residual = x
    h = group_norm(p["norm"], x, eps=eps)
    h = h.transpose(0, 2, 3, 1).reshape(b, hh * ww, c)
    h = linear(p["proj_in"], h)
    te = text_emb
    if te.shape[0] != b:
        te = jnp.broadcast_to(te, (b,) + te.shape[1:])
    for i in sorted(p["transformer_blocks"], key=int):
        ip_kv = None if ipadapter_kwargs is None else ipadapter_kwargs.get(int(i))
        h = basic_transformer_block(p["transformer_blocks"][i], h, te,
                                    num_heads, ip_kv=ip_kv)
    h = linear(p["proj_out"], h)
    h = h.reshape(b, hh, ww, c).transpose(0, 3, 1, 2)
    return h + residual


def vae_attention_block(p, x, eps: float = 1e-6):
    b, c, hh, ww = x.shape
    residual = x
    h = group_norm(p["norm"], x, eps=eps)
    h = h.transpose(0, 2, 3, 1).reshape(b, hh * ww, c)
    for i in sorted(p["transformer_blocks"], key=int):
        h = attn(p["transformer_blocks"][i], h, num_heads=1)
    h = h.reshape(b, hh, ww, c).transpose(0, 3, 1, 2)
    return h + residual


def downsample(p, x, padding=1, extra_padding=False):
    if extra_padding:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1)))
    return conv2d(p["conv"], x, stride=2, padding=padding)


def upsample(p, x):
    x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    return conv2d(p["conv"], x)


# ------------------------------------------------------------- SD UNet

# (type, heads) per block — SDUNet block list (sd_unet.py:240-322)
SD_UNET_PROGRAM: List[Tuple[str, int]] = (
    [("res", 0), ("attn", 8), ("push", 0)] * 2 + [("down", 0), ("push", 0)]
    + [("res", 0), ("attn", 8), ("push", 0)] * 2 + [("down", 0), ("push", 0)]
    + [("res", 0), ("attn", 8), ("push", 0)] * 2 + [("down", 0), ("push", 0)]
    + [("res", 0), ("push", 0)] * 2
    + [("res", 0), ("attn", 8), ("res", 0)]
    + [("pop", 0), ("res", 0)] * 3 + [("up", 0)]
    + [("pop", 0), ("res", 0), ("attn", 8)] * 3 + [("up", 0)]
    + [("pop", 0), ("res", 0), ("attn", 8)] * 3 + [("up", 0)]
    + [("pop", 0), ("res", 0), ("attn", 8)] * 3
)


def sd_unet_forward(params, sample, timestep, text_emb,
                    controlnet_res_stack=None, ipadapter_kwargs_list=None,
                    motion=None):
    """SDUNet.forward (sd_unet.py:327-345) with the lets_dance hooks
    (pipelines/dancer.py:7-114): ControlNet residuals added after block 30,
    IP-Adapter kv pairs per attention block, AnimateDiff motion modules
    after mapped blocks. sample: (B, 4, H/8, W/8)."""
    time_emb = timestep_embedding(timestep, 320).astype(sample.dtype)
    time_emb = linear(params["time_embedding"]["0"],
                      time_emb)
    time_emb = linear(params["time_embedding"]["2"], _silu(time_emb))
    h = conv2d(params["conv_in"], sample)
    res_stack = [h]
    cn = None if controlnet_res_stack is None else list(controlnet_res_stack)
    for i, (kind, heads) in enumerate(SD_UNET_PROGRAM):
        p = params["blocks"].get(str(i), {})
        if kind == "res":
            h = resnet_block(p, h, time_emb)
        elif kind == "attn":
            ip = None if ipadapter_kwargs_list is None \
                else ipadapter_kwargs_list.get(i)
            h = attention_block(p, h, text_emb, heads, ipadapter_kwargs=ip)
        elif kind == "push":
            res_stack.append(h)
        elif kind == "pop":
            h = jnp.concatenate([h, res_stack.pop()], axis=1)
        elif kind == "down":
            h = downsample(p, h)
        elif kind == "up":
            h = upsample(p, h)
        if motion is not None and i in motion[1]:
            from .motion import temporal_block
            h = temporal_block(motion[0][str(motion[1][i])], h)
        if cn is not None and i == 30:
            h = h + cn.pop().astype(h.dtype)
            res_stack = [r + a.astype(r.dtype) for r, a in zip(res_stack, cn)]
    h = group_norm(params["conv_norm_out"], h)
    h = _silu(h)
    return conv2d(params["conv_out"], h)


# ------------------------------------------------------------- text encoder

def sd_text_encoder_forward(params, input_ids, clip_skip: int = 1,
                            num_layers: int = 12):
    """SDTextEncoder.forward (sd_text_encoder.py:63-72): causal mask,
    quickGELU, clip_skip early exit."""
    x = jnp.take(params["token_embedding"]["weight"], input_ids, axis=0)
    x = x + params["position_embeds"].astype(x.dtype)
    L = x.shape[1]
    mask = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
    for i in range(num_layers):
        p = params["encoders"][str(i)]
        h = layer_norm(p["layer_norm1"], x, 1e-5)
        x = x + attn(p["attn"], h, num_heads=12, mask=mask)
        h = layer_norm(p["layer_norm2"], x, 1e-5)
        h = linear(p["fc1"], h)
        h = h * jax.nn.sigmoid(1.702 * h)
        x = x + linear(p["fc2"], h)
        if i + 1 + clip_skip == num_layers + 1:
            break
    return layer_norm(params["final_layer_norm"], x, 1e-5)


# ------------------------------------------------------------- VAE

SD_VAE_DECODER_PROGRAM = (
    [("res", 1e-6), ("vattn", 1e-6), ("res", 1e-6)]
    + ([("res", 1e-6)] * 3 + [("up", 0)]) * 3
    + [("res", 1e-6)] * 3
)

SD_VAE_ENCODER_PROGRAM = (
    ([("res", 1e-6)] * 2 + [("downx", 0)]) * 3
    + [("res", 1e-6)] * 2
    + [("res", 1e-6), ("vattn", 1e-6), ("res", 1e-6)]
)

SD_VAE_SCALING = 0.18215


def sd_vae_decoder_forward(params, sample):
    """SDVAEDecoder.forward (sd_vae_decoder.py:95-117)."""
    h = sample / SD_VAE_SCALING
    h = conv2d(params["post_quant_conv"], h, padding=0)
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
    h = group_norm(params["conv_norm_out"], h)
    h = _silu(h)
    return conv2d(params["conv_out"], h)


def sd_vae_encoder_forward(params, sample):
    """SDVAEEncoder.forward (sd_vae_encoder.py:53-79)."""
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
    h = conv2d(params["quant_conv"], h, padding=0)
    return h[:, :4] * SD_VAE_SCALING


# ------------------------------------------------------------- converter

_LINEAR_LEAVES = {"to_q", "to_k", "to_v", "to_out", "proj_in", "proj_out",
                  "time_emb_proj", "proj", "ff", "fc1", "fc2", "0", "2"}


def convert_sd_module(sd: Dict, dtype=jnp.float32):
    """Nest a reference-module state dict; transpose Linear weights to
    (in, out) under {'w','b'}, keep convs/norms in torch layout.

    Distinguishes Linear vs Conv leaves by tensor rank (2-D weight + parent
    not a norm -> Linear).
    """
    import numpy as _np
    root: Dict = {}
    for key, val in sd.items():
        if hasattr(val, "detach"):
            val = val.detach().float().cpu().numpy()
        val = _np.asarray(val)
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = parts[-1]
        parent = parts[-2] if len(parts) > 1 else ""
        is_norm = "norm" in parent or "norm" in leaf
        if is_norm and leaf == "weight":
            node["scale"] = jnp.asarray(val, dtype)
        elif leaf == "weight" and val.ndim == 2 \
                and not parent.endswith("embedding"):
            node["w"] = jnp.asarray(val.T, dtype)
        elif leaf == "bias" and "w" in node and val.ndim == 1 \
                and node["w"].ndim == 2 and not is_norm:
            node["b"] = jnp.asarray(val, dtype)
        else:
            node[leaf] = jnp.asarray(val, dtype)
    return _fix_linear_nodes(root)


def _fix_linear_nodes(node):
    """Linear params live as {'w','b'} directly on the module node; torch
    emits 'weight'/'bias' pairs — the pass above renamed the weight but a
    bias processed before its weight stays 'bias'. Normalize."""
    if isinstance(node, dict):
        if "w" in node and "bias" in node and "b" not in node:
            node["b"] = node.pop("bias")
        for v in node.values():
            _fix_linear_nodes(v)
    return node
