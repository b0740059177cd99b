"""ControlNets for SD / SDXL, TPU-native.

Re-designs of SDControlNet (/root/reference/diffsynth/models/sd_controlnet.py
:6-141) and SDXLControlNetUnion (sdxl_controlnet.py:43-220): the ControlNet
trunk is the down+mid prefix of the matching UNet block program with
PushBlocks, a strided conv conditioning stem, and per-residual 1x1 output
convs. The SDXL union variant adds task embeddings fused through a small
CLIP-style transformer block.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, layer_norm
from ..ops.attention import sdpa
from .sd import (conv2d, group_norm, _silu, attn, timestep_embedding,
                 resnet_block, attention_block, downsample, convert_sd_module)

# down+mid prefix of the SD UNet program with explicit pushes
# (sd_controlnet.py:38-76)
SD_CONTROLNET_PROGRAM: List[Tuple[str, int]] = (
    [("res", 8), ("attn", 8), ("push", 0)] * 2 + [("down", 0), ("push", 0)]
    + [("res", 8), ("attn", 8), ("push", 0)] * 2 + [("down", 0), ("push", 0)]
    + [("res", 8), ("attn", 8), ("push", 0)] * 2 + [("down", 0), ("push", 0)]
    + [("res", 0), ("push", 0)] * 2
    + [("res", 0), ("attn", 8), ("res", 0), ("push", 0)]
)

# SDXL union trunk (sdxl_controlnet.py:71-100)
SDXL_CONTROLNET_PROGRAM: List[Tuple[str, int]] = (
    [("res", 0), ("push", 0)] * 2 + [("down", 0), ("push", 0)]
    + [("res", 0), ("attn", 10), ("push", 0)] * 2 + [("down", 0), ("push", 0)]
    + [("res", 0), ("attn", 20), ("push", 0)] * 2
    + [("res", 0), ("attn", 20), ("res", 0), ("push", 0)]
)

SDXL_UNION_TASK_ID = {"openpose": 0, "depth": 1, "softedge": 2, "canny": 3,
                      "lineart": 3, "lineart_anime": 3, "tile": 6,
                      "inpaint": 7}


def conditioning_stem(p, x):
    """ControlNetConditioningLayer (sd_controlnet.py:6-23): conv/SiLU stack
    with stride-2 stages."""
    idx = sorted((int(k) for k in p), key=int)
    n = len(idx)
    h = x
    for j, i in enumerate(idx):
        stride = 2 if (0 < j < n - 1 and j % 2 == 0) else 1
        h = conv2d(p[str(i)], h, stride=stride)
        if j < n - 1:
            h = _silu(h)
    return h


def _run_trunk(params, program, h, time_emb, text_emb):
    res_stack = [h]
    for i, (kind, heads) in enumerate(program):
        p = params["blocks"].get(str(i), {})
        if kind == "res":
            h = resnet_block(p, h, time_emb)
        elif kind == "attn":
            h = attention_block(p, h, text_emb, heads)
        elif kind == "push":
            res_stack.append(h)
        elif kind == "down":
            h = downsample(p, h)
    return res_stack


def _apply_zero_convs(params, res_stack, global_pool):
    out = []
    for i, res in enumerate(res_stack):
        out.append(conv2d(params["controlnet_blocks"][str(i)], res, padding=0))
    if global_pool:
        out = [o.mean(axis=(2, 3), keepdims=True) for o in out]
    return out


def sd_controlnet_forward(params, sample, timestep, text_emb, conditioning,
                          global_pool: bool = False):
    """SDControlNet.forward (sd_controlnet.py:96-134) -> 13 residuals."""
    time_emb = timestep_embedding(timestep, 320).astype(sample.dtype)
    time_emb = linear(params["time_embedding"]["0"], time_emb)
    time_emb = linear(params["time_embedding"]["2"], _silu(time_emb))
    time_emb = jnp.broadcast_to(time_emb, (sample.shape[0],) + time_emb.shape[1:])
    h = conv2d(params["conv_in"], sample) \
        + conditioning_stem(params["controlnet_conv_in"]["blocks"],
                            conditioning.astype(sample.dtype))
    res_stack = _run_trunk(params, SD_CONTROLNET_PROGRAM, h, time_emb, text_emb)
    return _apply_zero_convs(params, res_stack, global_pool)


def _ln_torch(p, x, eps=1e-5):
    """LayerNorm whose params may sit under torch names (the 'ln_1'/'ln_2'
    modules don't contain 'norm', so the generic converter keeps 'weight')."""
    q = {"scale": p.get("scale", p.get("weight")),
         "bias": p.get("bias")}
    return layer_norm(q, x, eps)


def _residual_attention_block(p, x):
    """CLIP ResidualAttentionBlock with torch MultiheadAttention params
    (sdxl_controlnet.py:17-40). x: (B, S, D)."""
    h = _ln_torch(p["ln_1"], x)
    d = h.shape[-1]
    w = p["attn"]["in_proj_weight"]          # (3D, D) torch layout
    b = p["attn"]["in_proj_bias"]
    qkv = jnp.dot(h, w.T.astype(h.dtype),
                  preferred_element_type=jnp.float32).astype(h.dtype) \
        + b.astype(h.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    nh = 8
    # torch MultiheadAttention is seq-first: the (B, 2, D) input is read as
    # (L=B, N=2, E), i.e. attention runs over the LEADING axis
    L, N, _ = h.shape
    q = q.transpose(1, 0, 2).reshape(N, L, nh, d // nh)
    k = k.transpose(1, 0, 2).reshape(N, L, nh, d // nh)
    v = v.transpose(1, 0, 2).reshape(N, L, nh, d // nh)
    out = sdpa(q, k, v).reshape(N, L, d).transpose(1, 0, 2)
    out = linear(p["attn"]["out_proj"], out)
    x = x + out
    h = _ln_torch(p["ln_2"], x)
    h = linear(p["mlp"]["c_fc"], h)
    h = h * jax.nn.sigmoid(1.702 * h)
    return x + linear(p["mlp"]["c_proj"], h)


def sdxl_controlnet_union_forward(params, sample, timestep, text_emb,
                                  conditioning, processor_id: str,
                                  add_time_id, add_text_embeds,
                                  global_pool: bool = False):
    """SDXLControlNetUnion.forward (sdxl_controlnet.py:151-215)
    -> 10 residuals."""
    task_id = SDXL_UNION_TASK_ID[processor_id]
    t_emb = timestep_embedding(timestep, 320).astype(sample.dtype)
    t_emb = linear(params["time_embedding"]["0"], t_emb)
    t_emb = linear(params["time_embedding"]["2"], _silu(t_emb))

    time_embeds = timestep_embedding(jnp.asarray(add_time_id, jnp.float32), 256)
    time_embeds = time_embeds.reshape(add_text_embeds.shape[0], -1)
    add_embeds = jnp.concatenate(
        [add_text_embeds, time_embeds.astype(add_text_embeds.dtype)], axis=-1)
    add_embeds = add_embeds.astype(sample.dtype)
    add_embeds = linear(params["add_time_embedding"]["0"], add_embeds)
    add_embeds = linear(params["add_time_embedding"]["2"], _silu(add_embeds))

    control_type = jnp.zeros((sample.shape[0], 8), sample.dtype)
    control_type = control_type.at[:, task_id].set(1.0)
    control_embeds = timestep_embedding(control_type.reshape(-1), 256)
    control_embeds = control_embeds.reshape(sample.shape[0], -1).astype(sample.dtype)
    control_embeds = linear(params["control_type_embedding"]["0"], control_embeds)
    control_embeds = linear(params["control_type_embedding"]["2"],
                            _silu(control_embeds))
    time_emb = t_emb + add_embeds + control_embeds

    h = conv2d(params["conv_in"], sample)
    # fuse_condition_to_input (:138-149)
    cond = conditioning_stem(params["controlnet_conv_in"]["blocks"],
                             conditioning.astype(sample.dtype))
    feat_seq = cond.mean(axis=(2, 3)) + params["task_embedding"][task_id].astype(cond.dtype)
    x2 = jnp.stack([feat_seq, h.mean(axis=(2, 3))], axis=1)
    x2 = _residual_attention_block(params["controlnet_transformer"], x2)
    alpha = linear(params["spatial_ch_projs"], x2[:, 0])[:, :, None, None]
    h = h + (cond + alpha)

    res_stack = _run_trunk(params, SDXL_CONTROLNET_PROGRAM, h, time_emb,
                           text_emb)
    return _apply_zero_convs(params, res_stack, global_pool)


def convert_controlnet(sd, dtype=jnp.float32):
    return convert_sd_module(sd, dtype=dtype)
