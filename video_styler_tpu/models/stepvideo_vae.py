"""StepVideo VAE (version 2), TPU-native.

Functional re-design of the reference StepVideoVAE
(/root/reference/diffsynth/models/stepvideo_vae.py:563-1115): 8x temporal /
16x spatial compression with zero-padded causal convs, PER-FRAME group norms
(base_group_norm.spatial for version 2), token-causal single-head attention
in the mid blocks, pixel-(un)shuffle patchify stages with channel-averaging /
channel-duplicating shortcuts, and the 17-frame / 3-latent chunked encode
(frames stream in fixed chunks; each chunk is is_init so chunks are
independent — full parity with the reference chunking).

The reference's channel-last tensor gymnastics are a torch memory-format
optimization with identical math; here everything stays NCDHW and XLA picks
layouts.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class StepVAEConfig:
    ch: int = 32
    dec_ch: int = 128
    ch_mult: Tuple[int, ...] = (4, 8, 16, 16)
    dec_ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 64
    down_sampling_layer: Tuple[int, ...] = (1, 2)
    temporal_up_layers: Tuple[int, ...] = (2, 3)
    temporal_downsample: int = 4
    frame_len: int = 17
    latent_len: int = 3
    scale_factor: float = 1.0


STEP_VAE = StepVAEConfig()
# GroupNorm(32) forces real channel widths; shrink depth + z only
STEP_VAE_TINY = StepVAEConfig(num_res_blocks=1, z_channels=8)


# --------------------------------------------------------------------------
# Primitives
# --------------------------------------------------------------------------

def _conv3d(p, x, stride=(1, 1, 1), padding=((0, 0), (0, 0), (0, 0))):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), stride, padding,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)[None, :, None, None, None]
    return y.astype(x.dtype)


def causal_conv(p, x, stride=(1, 1, 1)):
    """CausalConv (stepvideo_vae.py:226-259): zero left time pad
    dilation*(kt-1)+max(1-stride_t, 0), symmetric spatial."""
    kt, kh, kw = p["weight"].shape[2:]
    tp = (kt - 1) + max(1 - stride[0], 0)
    return _conv3d(p, jnp.pad(x, ((0, 0), (0, 0), (tp, 0),
                                  (kh // 2, kh // 2), (kw // 2, kw // 2))),
                   stride=stride)


def group_norm_frame(p, x, groups: int = 32, eps: float = 1e-5,
                     act_silu: bool = False):
    """base_group_norm with spatial=True (version 2): per-frame statistics."""
    b, c, t, h, w = x.shape
    xf = x.astype(jnp.float32).transpose(0, 2, 1, 3, 4)    # (B, T, C, H, W)
    xg = xf.reshape(b * t, groups, c // groups, h, w)
    mean = jnp.mean(xg, axis=(2, 3, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(2, 3, 4), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(b, t, c, h, w)
    y = y * p["weight"].astype(jnp.float32)[None, None, :, None, None]
    y = y + p["bias"].astype(jnp.float32)[None, None, :, None, None]
    if act_silu:
        y = jax.nn.silu(y)
    return y.transpose(0, 2, 1, 3, 4).astype(x.dtype)


def _norm_zero_pad(p, x, pad: int = 2, groups: int = 32):
    """base_group_norm_with_zero_pad: norm+silu then 2 zero FRAMES prepended
    (the causal time padding happens after the norm)."""
    y = group_norm_frame(p, x, groups, act_silu=True)
    return jnp.pad(y, ((0, 0), (0, 0), (pad, 0), (0, 0), (0, 0)))


def resnet3d(p, x, groups: int = 32):
    """Resnet3DBlock (stepvideo_vae.py:498-541)."""
    h = _norm_zero_pad(p["norm1"], x, 2, groups)
    h = _conv3d(p["conv1"], h, padding=((0, 0), (1, 1), (1, 1)))
    if "nin_shortcut" in p:
        x = _conv3d(p["nin_shortcut"], x)
    h = _norm_zero_pad(p["norm2"], h, 2, groups)
    h = _conv3d(p["conv2"], h, padding=((0, 0), (1, 1), (1, 1)))
    return h + x


def attn_block(p, x, groups: int = 32):
    """AttnBlock (stepvideo_vae.py:466-496): single-head token-causal
    attention over the raveled (t h w) sequence."""
    b, c, t, h, w = x.shape
    y = group_norm_frame(p["norm"], x, groups)
    q = causal_conv(p["q"], y)
    k = causal_conv(p["k"], y)
    v = causal_conv(p["v"], y)

    def tok(z):
        return z.transpose(0, 2, 3, 4, 1).reshape(b, t * h * w, c)
    q, k, v = tok(q), tok(k), tok(v)
    scale = 1.0 / np.sqrt(c)
    logits = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    s = t * h * w
    causal = jnp.tril(jnp.ones((s, s), bool))
    logits = jnp.where(causal[None], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bqk,bkc->bqc", probs,
                     v.astype(jnp.float32)).astype(x.dtype)
    out = out.reshape(b, t, h, w, c).transpose(0, 4, 1, 2, 3)
    return causal_conv(p["proj_out"], out) + x


def _pixel_unshuffle_3d(x, factor: int):
    x = jnp.pad(x, ((0, 0), (0, 0), (factor - 1, 0), (0, 0), (0, 0)))
    B, C, D, H, W = x.shape
    x = x.reshape(B, C, D // factor, factor, H // factor, factor,
                  W // factor, factor)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(B, C * factor ** 3, D // factor, H // factor, W // factor)


def _pixel_shuffle_3d(x, factor: int):
    B, C, D, H, W = x.shape
    nc = C // factor ** 3
    x = x.reshape(B, nc, factor, factor, factor, D, H, W)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    x = x.reshape(B, nc, D * factor, H * factor, W * factor)
    return x[:, :, factor - 1:]


def _channel_avg_down(x, out_channels: int, factor: int):
    """PixelUnshuffleChannelAveragingDownSampleLayer3D (:353-379)."""
    x = _pixel_unshuffle_3d(x, factor) if factor > 1 else x
    if factor == 1:
        pass
    B, C, D, H, W = x.shape
    group = C // out_channels
    return x.reshape(B, out_channels, group, D, H, W).mean(axis=2)


def _channel_dup_up(x, out_channels: int, factor: int):
    """ChannelDuplicatingPixelUnshuffleUpSampleLayer3D (:262-282)."""
    B, C, D, H, W = x.shape
    repeats = out_channels * factor ** 3 // C
    x = jnp.repeat(x, repeats, axis=1)
    x = x.reshape(B, out_channels, factor, factor, factor, D, H, W)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    x = x.reshape(B, out_channels, D * factor, H * factor, W * factor)
    return x[:, :, factor - 1:]


def _conv2d_frames(p, x, stride=(1, 1), padding=((1, 1), (1, 1))):
    b, c, t, h, w = x.shape
    x2 = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    y = jax.lax.conv_general_dilated(
        x2, p["weight"].astype(x2.dtype), stride, padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    y = (y + p["bias"].astype(jnp.float32)[None, :, None, None]).astype(x.dtype)
    return y.reshape(b, t, y.shape[1], y.shape[2], y.shape[3]).transpose(0, 2, 1, 3, 4)


# --------------------------------------------------------------------------
# Encoder / decoder
# --------------------------------------------------------------------------

def encoder_forward(p, x, cfg: StepVAEConfig):
    """VideoEncoder.forward, version 2 (stepvideo_vae.py:627-674)."""
    h = causal_conv(p["conv_in"], x)
    for i in range(len(cfg.ch_mult)):
        lp = p["down"][str(i)]
        for j in range(cfg.num_res_blocks):
            h = resnet3d(lp["block"][str(j)], h)
        if i != len(cfg.ch_mult) - 1:
            if i in cfg.down_sampling_layer:
                h = causal_conv(lp["downsample"]["conv"], h, stride=(2, 2, 2))
            else:
                h = jnp.pad(h, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 1)))
                h = _conv2d_frames(lp["downsample"]["conv"], h, stride=(2, 2),
                                   padding=((0, 0), (0, 0)))
    h = resnet3d(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet3d(p["mid"]["block_2"], h)
    h = group_norm_frame(p["norm_out"], h, act_silu=True)

    shortcut = _channel_avg_down(
        h, p["conv_patchify"]["conv"]["weight"].shape[0] * 8, 2)
    hp = causal_conv(p["conv_patchify"]["conv"], h)
    hp = _pixel_unshuffle_3d(hp, 2)
    h = hp + shortcut
    z2 = 2 * cfg.z_channels
    shortcut = _channel_avg_down(h, z2, 1)
    h = causal_conv(p["conv_out"], h) + shortcut
    return h.transpose(0, 2, 1, 3, 4)            # (B, T, C, H, W)


def res3d_upsample(p, x):
    """Res3DBlockUpsample (stepvideo_vae.py:676-727): h = silu(conv chain
    + identity) + residual."""
    res = x
    h = causal_conv(p["conv1"], x)
    h = group_norm_frame(p["norm1"], h, act_silu=True)
    h = causal_conv(p["conv2"], h)
    h = group_norm_frame(p["norm2"], h, act_silu=False)
    h = jax.nn.silu((h + x).astype(jnp.float32)).astype(x.dtype)
    return h + res


def decoder_forward(p, z, cfg: StepVAEConfig):
    """VideoDecoder.forward, version 2 (stepvideo_vae.py:823-869).
    z: (B, T, C, H, W)."""
    z = z.transpose(0, 2, 1, 3, 4)
    h = causal_conv(p["conv_in"], z)
    channels = p["conv_in"]["weight"].shape[0]
    h = h + _channel_dup_up(z, channels, 1)
    block_in = cfg.dec_ch * cfg.dec_ch_mult[-1]
    hp = causal_conv(p["conv_unpatchify"]["conv"], h)
    hp = _pixel_shuffle_3d(hp, 2)
    h = hp + _channel_dup_up(h, block_in, 2)

    h = resnet3d(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet3d(p["mid"]["block_2"], h)

    n = len(cfg.dec_ch_mult)
    for i in reversed(range(n)):
        lp = p["up"][str(i)]
        for j in range(cfg.num_res_blocks + 1):
            h = resnet3d(lp["block"][str(j)], h)
        if i != 0:
            if i in cfg.temporal_up_layers:
                # Upsample3D: nearest x2 on (T, H, W) then Res3DBlockUpsample
                h = jnp.repeat(jnp.repeat(jnp.repeat(h, 2, 2), 2, 3), 2, 4)
                h = res3d_upsample(lp["upsample"]["conv3d"], h)
            else:
                h = jnp.repeat(jnp.repeat(h, 2, 3), 2, 4)
                h = _conv2d_frames(lp["upsample"]["conv"], h)

    h = _norm_zero_pad(p["norm_out"], h, 2)
    h = _conv3d(p["conv_out"], h, padding=((0, 0), (1, 1), (1, 1)))
    return h[:, :, cfg.temporal_downsample - 1:]


# --------------------------------------------------------------------------
# Top level: chunked encode/decode (StepVideoVAE, stepvideo_vae.py:908-1080)
# --------------------------------------------------------------------------

def vae_encode(params, video, cfg: StepVAEConfig = STEP_VAE):
    """video (B, T, 3, H, W) in [-1, 1] -> latent MEAN (B, T_lat, z, h, w)
    (posterior mode; the reference samples from the diagonal Gaussian)."""
    chunks = []
    T = video.shape[1]
    for t0 in range(0, T, cfg.frame_len):
        x = video[:, t0:t0 + cfg.frame_len].transpose(0, 2, 1, 3, 4)
        chunks.append(encoder_forward(params["encoder"], x, cfg))
    z = jnp.concatenate(chunks, axis=1)
    return z[:, :, :cfg.z_channels]


def vae_decode(params, latents, cfg: StepVAEConfig = STEP_VAE):
    """latents (B, T_lat, z, h, w) -> video (B, 3, T, H, W)."""
    outs = []
    T = latents.shape[1]
    for t0 in range(0, T, cfg.latent_len):
        z = latents[:, t0:t0 + cfg.latent_len]
        outs.append(decoder_forward(params["decoder"], z, cfg))
    return jnp.concatenate(outs, axis=2)


def convert_step_vae(sd, dtype=jnp.float32):
    """Nest the reference state dict; CausalConv wrappers keep their `.conv`
    level stripped like the Hunyuan converter."""
    root = {}
    for key, val in sd.items():
        parts = key.split(".")
        if len(parts) >= 2 and parts[-2] == "conv" \
                and parts[-1] in ("weight", "bias") \
                and not (len(parts) >= 3 and parts[-3] in ("downsample",
                                                           "upsample",
                                                           "conv_unpatchify")):
            parts = parts[:-2] + parts[-1:]
        node = root
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        if hasattr(val, "detach"):
            val = val.detach().float().cpu().numpy()
        node[parts[-1]] = jnp.asarray(np.asarray(val), dtype)
    return root
