"""SDXL family: UNet and dual text encoders, JAX ports.

Functional ports of /root/reference/diffsynth/models/sdxl_unet.py:5-141 and
sdxl_text_encoder.py:5-87, reusing the SD-1.5 block primitives: the SDXL
UNet is the same push/pop block interpreter with a different program
(10/20-head attention blocks with 2/10 transformer layers), plus the
add_time_id / add_text_embeds micro-conditioning pathway. Kolors variants
(5632-wide add embedding, text_intermediate_proj) are parameter-driven.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, layer_norm
from ..ops.attention import sdpa
from .sd import (conv2d, group_norm, _silu, attn, timestep_embedding,
                 resnet_block, attention_block, downsample, upsample,
                 convert_sd_module)

# (kind, heads) per block — SDXLUNet block list (sdxl_unet.py:23-80)
SDXL_UNET_PROGRAM: List[Tuple[str, int]] = (
    [("res", 0), ("push", 0)] * 2 + [("down", 0), ("push", 0)]
    + [("res", 0), ("attn", 10), ("push", 0)] * 2 + [("down", 0), ("push", 0)]
    + [("res", 0), ("attn", 20), ("push", 0)] * 2
    + [("res", 0), ("attn", 20), ("res", 0)]
    + [("pop", 0), ("res", 0), ("attn", 20)] * 3 + [("up", 0)]
    + [("pop", 0), ("res", 0), ("attn", 10)] * 3 + [("up", 0)]
    + [("pop", 0), ("res", 0)] * 3
)


def sdxl_unet_forward(params, sample, timestep, encoder_hidden_states,
                      add_time_id, add_text_embeds,
                      controlnet_res_stack=None, ipadapter_kwargs_list=None,
                      motion=None):
    """SDXLUNet.forward (sdxl_unet.py:88-136) with the lets_dance_xl hooks
    (pipelines/dancer.py:119-236): ControlNet residuals after block 22,
    IP-Adapter kv per attention block, AnimateDiff motion after mapped
    blocks.

    sample: (B, 4, H/8, W/8); add_time_id: (6,) original/crop/target sizes;
    add_text_embeds: (B, 1280) pooled TE2 embedding.
    """
    t_emb = timestep_embedding(timestep, 320).astype(sample.dtype)
    t_emb = linear(params["time_embedding"]["0"], t_emb)
    t_emb = linear(params["time_embedding"]["2"], _silu(t_emb))

    time_embeds = timestep_embedding(add_time_id, 256)
    time_embeds = time_embeds.reshape(add_text_embeds.shape[0], -1)
    add_embeds = jnp.concatenate([add_text_embeds, time_embeds.astype(
        add_text_embeds.dtype)], axis=-1).astype(sample.dtype)
    add_embeds = linear(params["add_time_embedding"]["0"], add_embeds)
    add_embeds = linear(params["add_time_embedding"]["2"], _silu(add_embeds))
    time_emb = t_emb + add_embeds

    h = conv2d(params["conv_in"], sample)
    text_emb = encoder_hidden_states
    if "text_intermediate_proj" in params:
        text_emb = linear(params["text_intermediate_proj"], text_emb)
    res_stack = [h]
    cn = None if controlnet_res_stack is None else list(controlnet_res_stack)
    for i, (kind, heads) in enumerate(SDXL_UNET_PROGRAM):
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
        if cn is not None and i == 22:
            h = h + cn.pop().astype(h.dtype)
            res_stack = [r + a.astype(r.dtype) for r, a in zip(res_stack, cn)]
    h = group_norm(params["conv_norm_out"], h)
    h = _silu(h)
    return conv2d(params["conv_out"], h)


def _clip_layer(p, x, mask, num_heads: int, quick_gelu: bool):
    h = layer_norm(p["layer_norm1"], x, 1e-5)
    x = x + attn(p["attn"], h, num_heads=num_heads, mask=mask)
    h = layer_norm(p["layer_norm2"], x, 1e-5)
    h = linear(p["fc1"], h)
    if quick_gelu:
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
    return x + linear(p["fc2"], h)


def sdxl_text_encoder_forward(params, input_ids, clip_skip: int = 1,
                              num_layers: int = 11):
    """SDXLTextEncoder (CLIP-L, 11 layers kept, NO final layer norm —
    sdxl_text_encoder.py:30-38 returns the clip-skip hidden state raw)."""
    x = jnp.take(params["token_embedding"]["weight"], input_ids, axis=0)
    x = x + params["position_embeds"].astype(x.dtype)
    L = x.shape[1]
    mask = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
    for i in range(num_layers):
        x = _clip_layer(params["encoders"][str(i)], x, mask, 12, True)
        if i + clip_skip == num_layers:
            break
    return x


def sdxl_text_encoder_2_forward(params, input_ids, clip_skip: int = 2,
                                num_layers: int = 32):
    """SDXLTextEncoder2 (OpenCLIP bigG): returns (pooled_projected,
    clip-skip hidden states) — sdxl_text_encoder.py:72-87."""
    x = jnp.take(params["token_embedding"]["weight"], input_ids, axis=0)
    x = x + params["position_embeds"].astype(x.dtype)
    L = x.shape[1]
    mask = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
    hidden = None
    for i in range(num_layers):
        x = _clip_layer(params["encoders"][str(i)], x, mask, 20, False)
        if i + clip_skip == num_layers:
            hidden = x
    x = layer_norm(params["final_layer_norm"], x, 1e-5)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(x.shape[0]), eot]
    pooled = linear(params["text_projection"], pooled)
    return pooled, hidden


convert_sdxl_module = convert_sd_module
