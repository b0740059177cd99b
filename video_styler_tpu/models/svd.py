"""Stable Video Diffusion (SVD) family, TPU-native.

Functional re-design of the reference SVDUNet
(/root/reference/diffsynth/models/svd_unet.py:245-424), SVDVAEDecoder
(svd_vae_decoder.py:71-205), SVDVAEEncoder (SD VAE + scaling 0.13025) and
SVDImageEncoder (svd_image_encoder.py:27-50). The spatio-temporal UNet is a
block program over the same push/pop interpreter as SD/SDXL with three new
ops: temporal resnets ((3,1,1) convs over frames-as-batch), temporal
attention (per-pixel attention across frames with sinusoidal frame
positions), and learned-sigmoid PopMix spatial/temporal blending.
"""
from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, layer_norm
from ..ops.attention import sdpa
from .sd import (conv2d, group_norm, _silu, attn, timestep_embedding,
                 resnet_block, attention_block, downsample, upsample,
                 convert_sd_module, sd_vae_encoder_forward)


# --------------------------------------------------------------------------
# UNet program: ops are (kind, arg) where arg = heads for attention ops,
# eps for resnets, channels for popmix_proj (svd_unet.py:262-315)
# --------------------------------------------------------------------------

def _spatio_temporal_pair(heads, eps):
    return [("res", eps), ("push", None), ("tres", eps), ("popmix", None),
            ("push", None),
            ("attn", heads), ("push", None), ("tattn", heads),
            ("popmix_proj", None), ("push", None)]


SVD_UNET_PROGRAM: List[Tuple[str, object]] = (
    _spatio_temporal_pair(5, 1e-6) * 2 + [("down", None), ("push", None)]
    + _spatio_temporal_pair(10, 1e-6) * 2 + [("down", None), ("push", None)]
    + _spatio_temporal_pair(20, 1e-6) * 2 + [("down", None), ("push", None)]
    + [("res", 1e-5), ("push", None), ("tres", 1e-5), ("popmix", None),
       ("push", None)] * 2
    # mid
    + [("res", 1e-5), ("push", None), ("tres", 1e-5), ("popmix", None),
       ("push", None),
       ("attn", 20), ("push", None), ("tattn", 20), ("popmix_proj", None),
       ("res", 1e-5), ("push", None), ("tres", 1e-5), ("popmix", None)]
    # up
    + [("pop", None), ("res", 1e-6), ("push", None), ("tres", 1e-5),
       ("popmix", None)] * 3 + [("up", None)]
    + ([("pop", None), ("res", 1e-6), ("push", None), ("tres", 1e-6),
        ("popmix", None), ("push", None),
        ("attn", 20), ("push", None), ("tattn", 20), ("popmix_proj", None)] * 3
       + [("up", None)])
    + ([("pop", None), ("res", 1e-6), ("push", None), ("tres", 1e-6),
        ("popmix", None), ("push", None),
        ("attn", 10), ("push", None), ("tattn", 10), ("popmix_proj", None)] * 3
       + [("up", None)])
    + ([("pop", None), ("res", 1e-6), ("push", None), ("tres", 1e-6),
        ("popmix", None), ("push", None),
        ("attn", 5), ("push", None), ("tattn", 5), ("popmix_proj", None)] * 3)
)


def temporal_resnet_block(p, x, time_emb, eps):
    """TemporalResnetBlock (svd_unet.py:6-38): (3,1,1) convs over
    frames-as-batch x: (T, C, H, W)."""
    h = x.transpose(1, 0, 2, 3)[None]                 # (1, C, T, H, W)
    h = _gn3(p["norm1"], h, eps)
    h = _conv3_t(p["conv1"], _silu(h))
    if time_emb is not None and "time_emb_proj" in p:
        emb = linear(p["time_emb_proj"], _silu(time_emb))
        h = h + emb[:, :, None, None, None].astype(h.dtype)
    h = _gn3(p["norm2"], h, eps)
    h = _conv3_t(p["conv2"], _silu(h))
    if "conv_shortcut" in p:
        sc = x.transpose(1, 0, 2, 3)[None]
        sc = jax.lax.conv_general_dilated(
            sc, p["conv_shortcut"]["weight"].astype(sc.dtype), (1, 1, 1),
            "VALID", dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.float32)
        sc = (sc + p["conv_shortcut"]["bias"].astype(jnp.float32)
              [None, :, None, None, None]).astype(x.dtype)
        x = sc[0].transpose(1, 0, 2, 3)
    return x + h[0].transpose(1, 0, 2, 3)


def _conv3_t(p, x):
    """(3,1,1) temporal conv with padding (1,0,0)."""
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (1, 1, 1),
        ((1, 1), (0, 0), (0, 0)),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)[None, :, None, None, None]
    return y.astype(x.dtype)


def _gn3(p, x, eps, groups: int = 32):
    b, c, t, h, w = x.shape
    g = min(groups, c)
    xf = x.astype(jnp.float32).reshape(b, g, c // g, t, h, w)
    mean = jnp.mean(xf, axis=(2, 3, 4, 5), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(2, 3, 4, 5), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, c, t, h, w)
    scale = p.get("scale", p.get("weight"))
    y = y * scale.astype(jnp.float32)[None, :, None, None, None]
    y = y + p["bias"].astype(jnp.float32)[None, :, None, None, None]
    return y.astype(x.dtype)


def _geglu(p, x):
    a, gate = jnp.split(linear(p["proj"], x), 2, axis=-1)
    return a * jax.nn.gelu(gate.astype(jnp.float32),
                           approximate=False).astype(a.dtype)


def positional_id_map(num_frames: int, max_id: int = 25,
                      repeat_length: int = 20, pivot: int = 0):
    """ExVideo PositionalID (svd_unet.py:122-143): frames past max_id reflect
    back and forth through the trained embedding table."""
    import numpy as np

    def one(frame_id):
        if frame_id < max_id:
            return frame_id
        pid = (frame_id - max_id) % (repeat_length * 2)
        if pid < repeat_length:
            return max_id - 2 - pid
        return max_id - 2 * repeat_length + pid

    return np.asarray([one(abs(i - pivot)) for i in range(num_frames)],
                      np.int32)


def temporal_attention_block(p, x, text_emb, num_heads, head_dim: int = 64):
    """TemporalAttentionBlock (svd_unet.py:145-221): per-pixel attention over
    the frame axis with sinusoidal frame-position embeddings. x: (T, C, H, W);
    text_emb: (1, L, C_ctx).

    With the ExVideo patch applied (add_positional_conv, svd_unet.py:155-157
    + patch config model_config.py:197-199) the sinusoidal embedding becomes
    a trained 128-frame table indexed through the reflecting PositionalID
    map, followed by a reflect-padded 3x3x3 positional conv."""
    T, C, H, W = x.shape
    if "positional_embedding" in p and "embeddings" in p["positional_embedding"]:
        # trained table indexed by arange (TrainableTemporalTimesteps.forward
        # svd_unet.py:117-119; PositionalID only builds the initial table)
        table = p["positional_embedding"]["embeddings"]
        pos = table[:T].astype(x.dtype)
    else:
        pos = timestep_embedding_flip(jnp.arange(T), C).astype(x.dtype)
    pos = linear(p["positional_embedding_proj"]["2"],
                 _silu(linear(p["positional_embedding_proj"]["0"], pos)))
    h = x + pos[:, :, None, None]
    if "positional_conv" in p:
        h5 = h.transpose(1, 0, 2, 3)[None]                      # (1,C,T,H,W)
        h5 = jnp.pad(h5, ((0, 0), (0, 0), (1, 1), (1, 1), (1, 1)),
                     mode="reflect")
        h5 = jax.lax.conv_general_dilated(
            h5, p["positional_conv"]["weight"].astype(h5.dtype), (1, 1, 1),
            "VALID", dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.float32)
        h5 = h5 + p["positional_conv"]["bias"].astype(jnp.float32)[
            None, :, None, None, None]
        h = h5[0].astype(h.dtype).transpose(1, 0, 2, 3)
    h = h.transpose(2, 3, 0, 1).reshape(H * W, T, C)

    res = h
    h = layer_norm(p["norm_in"], h, 1e-5)
    h = linear(p["ff_in"], _geglu(p["act_fn_in"], h))
    h = h + res

    nh = layer_norm(p["norm1"], h, 1e-5)
    h = h + attn(p["attn1"], nh, num_heads=num_heads)
    nh = layer_norm(p["norm2"], h, 1e-5)
    ctx = jnp.broadcast_to(text_emb, (H * W,) + text_emb.shape[1:])
    h = h + attn(p["attn2"], nh, context=ctx, num_heads=num_heads)

    res = h
    h = layer_norm(p["norm_out"], h, 1e-5)
    h = linear(p["ff_out"], _geglu(p["act_fn_out"], h))
    h = h + res
    return h.reshape(H, W, T, C).transpose(2, 3, 0, 1)


def timestep_embedding_flip(position, dim: int):
    """TemporalTimesteps with flip_sin_to_cos=True, downscale_freq_shift=0
    (svd_unet.py:40-107): [cos | sin]."""
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    args = position.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def popmix(p, x, res_stack, proj: bool):
    """PopMixBlock (svd_unet.py:224-243): sigmoid-gated spatial/temporal mix,
    optionally followed by a linear proj + second residual pop."""
    res = res_stack.pop()
    alpha = jax.nn.sigmoid(p["mix_factor"].astype(jnp.float32)).astype(x.dtype)
    x = alpha * res + (1 - alpha) * x
    if proj:
        x = x.transpose(0, 2, 3, 1)
        x = linear(p["proj"], x)
        x = x.transpose(0, 3, 1, 2)
        x = x + res_stack.pop()
    return x, res_stack


def svd_unet_forward(params, sample, timestep, encoder_hidden_states,
                     add_time_id):
    """SVDUNet.forward (svd_unet.py:380-419). sample: (T, 8, H/8, W/8)
    frames-as-batch; encoder_hidden_states: (1, 1, 1024) CLIP image features;
    add_time_id: (3,) [fps-1, motion_bucket_id, noise_aug]."""
    t_emb = timestep_embedding(jnp.asarray([timestep], jnp.float32),
                               320).astype(sample.dtype)
    t_emb = linear(params["time_embedding"]["0"], t_emb)
    t_emb = linear(params["time_embedding"]["2"], _silu(t_emb))
    add = timestep_embedding_flip(jnp.asarray(add_time_id, jnp.float32), 256)
    add = add.reshape(1, -1).astype(sample.dtype)
    add = linear(params["add_time_embedding"]["0"], add)
    add = linear(params["add_time_embedding"]["2"], _silu(add))
    time_emb = t_emb + add

    h = conv2d(params["conv_in"], sample)
    # the pipeline passes the CLIP image embedding as (1, 1024); both the
    # spatial and temporal attention consume it as a single kv token
    text_emb = encoder_hidden_states
    if text_emb.ndim == 2:
        text_emb = text_emb[:, None]
    res_stack = [h]
    for i, (kind, arg) in enumerate(SVD_UNET_PROGRAM):
        p = params["blocks"].get(str(i), {})
        if kind == "res":
            pp = dict(p)
            pp["_eps"] = arg
            h = resnet_block(pp, h, time_emb)
        elif kind == "tres":
            h = temporal_resnet_block(p, h, time_emb, arg)
        elif kind == "attn":
            h = svd_spatial_attention(p, h, text_emb, arg)
        elif kind == "tattn":
            h = temporal_attention_block(p, h, text_emb, arg)
        elif kind == "popmix":
            h, res_stack = popmix(p, h, res_stack, proj=False)
        elif kind == "popmix_proj":
            h, res_stack = popmix(p, h, res_stack, proj=True)
        elif kind == "push":
            res_stack.append(h)
        elif kind == "pop":
            h = jnp.concatenate([h, res_stack.pop()], axis=1)
        elif kind == "down":
            h = downsample(p, h)
        elif kind == "up":
            h = upsample(p, h)
    h = group_norm(params["conv_norm_out"], h, eps=1e-5)
    h = _silu(h)
    return conv2d(params["conv_out"], h)


def svd_spatial_attention(p, x, text_emb, num_heads, eps: float = 1e-6):
    """AttentionBlock with need_proj_out=False (sd_unet.py:128-210): no
    proj_out, no residual (the following PopMix proj path carries both)."""
    b, c, hh, ww = x.shape
    h = group_norm(p["norm"], x, eps=eps)
    h = h.transpose(0, 2, 3, 1).reshape(b, hh * ww, c)
    h = linear(p["proj_in"], h)
    te = jnp.broadcast_to(text_emb, (b,) + text_emb.shape[1:])
    from .sd import basic_transformer_block
    for i in sorted(p["transformer_blocks"], key=int):
        h = basic_transformer_block(p["transformer_blocks"][i], h, te,
                                    num_heads)
    return h.reshape(b, hh, ww, c).transpose(0, 3, 1, 2)


# --------------------------------------------------------------------------
# VAE (svd_vae_decoder.py:71-205; encoder = SD encoder with 0.13025 scaling)
# --------------------------------------------------------------------------

SVD_VAE_DECODER_PROGRAM = (
    [("res", 1e-6), ("tres", 1e-6), ("vattn", 1e-6), ("res", 1e-6),
     ("tres", 1e-6)]
    + ([("res", 1e-6), ("tres", 1e-6)] * 3 + [("up", None)]) * 3
    + [("res", 1e-6), ("tres", 1e-6)] * 3
)


def svd_vae_encode(params, image, scaling: float = 0.13025):
    """SVDVAEEncoder: SD encoder block program with scaling 0.13025."""
    from .sd import SD_VAE_SCALING
    return sd_vae_encoder_forward(params, image) / SD_VAE_SCALING * scaling


def svd_temporal_resnet_vae(p, x, eps):
    """VAE TemporalResnetBlock (svd_vae_decoder.py:45-68): no time emb,
    sigmoid mix with the spatial input."""
    x_spatial = x
    h = x.transpose(1, 0, 2, 3)[None]
    h = _gn3(p["norm1"], h, eps)
    h = _conv3_t(p["conv1"], _silu(h))
    h = _gn3(p["norm2"], h, eps)
    h = _conv3_t(p["conv2"], _silu(h))
    x_temporal = x + h[0].transpose(1, 0, 2, 3)
    alpha = jax.nn.sigmoid(p["mix_factor"].astype(jnp.float32)).astype(x.dtype)
    return alpha * x_temporal + (1 - alpha) * x_spatial


def svd_vae_attention(p, x, eps):
    """VAEAttentionBlock (svd_vae_decoder.py:8-42): single 512-dim head,
    no proj_in/out."""
    b, c, hh, ww = x.shape
    residual = x
    h = group_norm(p["norm"], x, eps=eps)
    h = h.transpose(0, 2, 3, 1).reshape(b, hh * ww, c)
    for i in sorted(p["transformer_blocks"], key=int):
        h = attn(p["transformer_blocks"][i], h, num_heads=1)
    return h.reshape(b, hh, ww, c).transpose(0, 3, 1, 2) + residual


def svd_vae_decode(params, latents, scaling: float = 0.18215):
    """SVDVAEDecoder.forward (svd_vae_decoder.py:124-145).
    latents: (C, T, H, W) -> video (C, T, H*8, W*8)."""
    h = latents.transpose(1, 0, 2, 3) / scaling     # (T, C, H, W)
    h = conv2d(params["conv_in"], h)
    for i, (kind, eps) in enumerate(SVD_VAE_DECODER_PROGRAM):
        p = params["blocks"].get(str(i), {})
        if kind == "res":
            pp = dict(p)
            pp["_eps"] = eps
            h = resnet_block(pp, h, None)
        elif kind == "tres":
            h = svd_temporal_resnet_vae(p, h, eps)
        elif kind == "vattn":
            h = svd_vae_attention(p, h, eps)
        elif kind == "up":
            h = upsample(p, h)
    h = group_norm(params["conv_norm_out"], h, eps=1e-5)
    h = _silu(h)
    h = conv2d(params["conv_out"], h)
    h = h.transpose(1, 0, 2, 3)[None]               # (1, C, T, H, W)
    h = _conv3_t(params["time_conv_out"], h)
    return h[0]


# --------------------------------------------------------------------------
# Image encoder (svd_image_encoder.py:5-50): HF-style CLIP ViT-H vision
# tower with projection to 1024
# --------------------------------------------------------------------------

def svd_image_encoder_forward(params, pixel_values, num_layers: int = 32,
                              num_heads: int = 16, eps: float = 1e-5):
    """pixel_values: (B, 3, 224, 224) CLIP-normalized -> (B, 1024)."""
    b = pixel_values.shape[0]
    w = params["embeddings"]["patch_embedding"]["weight"]
    ps = w.shape[-1]
    d = w.shape[0]
    patches = pixel_values.reshape(b, 3, pixel_values.shape[2] // ps, ps,
                                   pixel_values.shape[3] // ps, ps)
    patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(b, -1, 3 * ps * ps)
    x = jnp.dot(patches, w.reshape(d, -1).T.astype(patches.dtype),
                preferred_element_type=jnp.float32).astype(patches.dtype)
    cls = jnp.broadcast_to(
        params["embeddings"]["class_embedding"].astype(x.dtype), (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["embeddings"]["position_embeds"].astype(x.dtype)
    x = layer_norm(params["pre_layernorm"], x, eps)
    for i in range(num_layers):
        p = params["encoders"][str(i)]
        h = layer_norm(p["layer_norm1"], x, eps)
        x = x + attn(p["attn"], h, num_heads=num_heads)
        h = layer_norm(p["layer_norm2"], x, eps)
        h = linear(p["fc1"], h)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
        x = x + linear(p["fc2"], h)
    pooled = layer_norm(params["post_layernorm"], x[:, 0], eps)
    return linear(params["visual_projection"], pooled)


def convert_svd_module(sd, dtype=jnp.float32):
    """Nest a reference SVD module state dict (linears transposed, conv
    weights kept) — same rules as the SD converter."""
    return convert_sd_module(sd, dtype=dtype)


def sd_vae_encode_raw(params, image):
    """Unscaled VAE latent (encode_image_with_vae divides by scaling_factor,
    svd_video.py:52-57)."""
    from .sd import SD_VAE_SCALING
    return sd_vae_encoder_forward(params, image) / SD_VAE_SCALING
