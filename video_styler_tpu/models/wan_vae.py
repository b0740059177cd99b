"""Wan causal 3D video VAE (8x8 spatial, 4x temporal compression, z=16).

TPU-native re-design of the reference WanVideoVAE
(/root/reference/diffsynth/models/wan_video_vae.py:33-1247). The reference
streams 1+4k frame chunks through mutable per-conv `feat_cache` rings; here
the entire clip is processed as ONE jittable XLA graph of causal convolutions.
The two are mathematically identical:

  - CausalConv3d with chunked cache == full-sequence conv with zero left-pad
    (2 frames for kernel_t=3) — the cache feeds exactly the preceding frames.
  - Encoder `downsample3d` (Resample, wan_video_vae.py:162-173): the first
    frame bypasses the stride-2 time conv (it is cached, not convolved), and
    subsequent 4-frame chunks conv over [prev_last, chunk]. Full-sequence
    equivalent: out = concat([x[:, :, :1], conv_stride2_nopad(x)]) — windows
    start at frame 0 with stride 2.
  - Decoder `upsample3d` (wan_video_vae.py:122-156): latent frame 0 bypasses
    the 2x time conv ('Rep' marker) and frames 1.. are causally convolved
    with zero history. Full-sequence equivalent:
    out = concat([x[:, :, :1], interleave2(causal_conv(x[:, :, 1:]))]).

Param pytrees mirror the torch module tree verbatim (state dicts nest by
name), so checkpoint conversion is a pure re-nesting + dtype cast.

Spatial tiled encode/decode with linear-ramp blend masks reproduces
tiled_encode/tiled_decode (wan_video_vae.py:1103-1203) with accumulation on
host; the per-tile compute is the jitted full-sequence graph.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

CACHE_T = 2

# Latent normalization (wan_video_vae.py:1063-1073)
WAN21_LATENT_MEAN = (
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921)
WAN21_LATENT_STD = (
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160)


@dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temperal_downsample: Tuple[bool, ...] = (False, True, True)
    latent_mean: Tuple[float, ...] = WAN21_LATENT_MEAN
    latent_std: Tuple[float, ...] = WAN21_LATENT_STD

    @property
    def temperal_upsample(self):
        return tuple(reversed(self.temperal_downsample))

    @property
    def upsampling_factor(self) -> int:
        return 2 ** (len(self.dim_mult) - 1)


WAN21_VAE = WanVAEConfig()
# tiny CPU-testable config
WAN_VAE_TINY = WanVAEConfig(dim=16, z_dim=4, dim_mult=(1, 2, 4, 4),
                            num_res_blocks=1,
                            latent_mean=(0.0,) * 4, latent_std=(1.0,) * 4)


# --------------------------------------------------------------------------
# Primitive layers (params follow torch naming: {"weight", "bias", "gamma"})
#
# Layout: all internal activations are CHANNELS-LAST (B, T, H, W, C). On TPU
# the MXU-friendly conv layout puts channels on the minor axis; the NCDHW
# logical order the reference uses costs 20-35% on the 96/192-channel conv
# scales (measured on v5e, tools/dissect_vae.py: scale3 res conv 66.3 ->
# 52.8 ms, scale2 52.3 -> 39.4 ms). Public encode/decode keep the reference
# (B, C, T, H, W) contract and transpose at the boundary. Weights stay in
# torch OIDHW order (conv dimension_numbers reinterpret them; checkpoint
# conversion remains a pure re-nesting).
# --------------------------------------------------------------------------

def to_cl(x):
    """(B, C, T, H, W) -> (B, T, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def from_cl(x):
    """(B, T, H, W, C) -> (B, C, T, H, W)."""
    return jnp.transpose(x, (0, 4, 1, 2, 3))


def conv3d(p, x, stride=(1, 1, 1), padding=((0, 0), (0, 0), (0, 0))):
    """lax conv on channels-last x with torch OIDHW weights; fp32 accum."""
    w = p["weight"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NDHWC", "OIDHW", "NDHWC"),
        preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def causal_conv3d(p, x, stride=(1, 1, 1)):
    """CausalConv3d (wan_video_vae.py:33-52): zero left-pad 2*pad_t in time,
    symmetric spatial padding, derived from the kernel shape."""
    kt, kh, kw = p["weight"].shape[2:]
    pt, ph, pw = (kt - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    return conv3d(p, x, stride=stride,
                  padding=((2 * pt, 0), (ph, ph), (pw, pw)))


def conv2d_on_frames(p, x, stride=(1, 1), padding=((0, 0), (0, 0))):
    """Conv2d applied per-frame on (B, T, H, W, C) as a (1, kh, kw) conv3d."""
    w = p["weight"][:, :, None]  # (O, I, 1, kh, kw)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,) + tuple(stride),
        padding=((0, 0),) + tuple(padding),
        dimension_numbers=("NDHWC", "OIDHW", "NDHWC"),
        preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def upsample_conv_2x(p, x):
    """nearest-2x spatial upsample + 3x3 per-frame conv (the Resample
    upsample path, wan_video_vae.py:82-117).

    Negative result, measured end-to-end on v5e (480p73f streaming decode,
    steady state): a phase-decomposed form (folding the conv into four 2x2
    convs at LOW resolution — 4/9 of the FLOPs, no materialized 4x
    intermediate) wins standalone microbenches but LOSES in the full decode
    graph, 5.09 s -> 5.97 s: the 4-phase slice/stack/reshape interleave is
    an extra full-size bandwidth pass XLA cannot fuse away, while the naive
    nearest-repeat feeds the conv emitter directly. Keep the naive form."""
    x = upsample_nearest_2x(x)
    return conv2d_on_frames(p, x, padding=((1, 1), (1, 1)))


def rms_norm_spatial(p, x, eps: float = 1e-12):
    """RMS_norm (wan_video_vae.py:55-70): F.normalize along the channel dim
    times sqrt(dim) * gamma. Channels-last: the channel is the LAST axis."""
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True))
    scale = x.shape[-1] ** 0.5
    y = (xf / jnp.maximum(norm, eps)) * scale
    y = y * p["gamma"].astype(jnp.float32).reshape(-1)
    return y.astype(x.dtype)


def _silu(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


def _shard_w(x):
    """Spatially shard the VAE over the sequence-parallel mesh axis.

    The reference keeps the VAE single-GPU and tiles spatially
    (wan_video_vae.py:1103-1203); under a mesh the natural TPU form is
    GSPMD width-sharding — constrain (B, T, H, W, C) on W and XLA inserts
    conv halo exchanges over ICI. No-op without an active sharding context
    or when W doesn't divide (parallel/context.py warns once)."""
    from ..parallel.context import constrain
    return constrain(x, "dp", None, None, "sp", None)


def residual_block(p, x):
    """ResidualBlock (wan_video_vae.py:267-301)."""
    x = _shard_w(x)
    if "shortcut" in p:
        h = causal_conv3d(p["shortcut"], x)
    else:
        h = x
    y = rms_norm_spatial(p["residual"]["0"], x)
    y = _silu(y)
    y = causal_conv3d(p["residual"]["2"], y)
    y = rms_norm_spatial(p["residual"]["3"], y)
    y = _silu(y)
    y = causal_conv3d(p["residual"]["6"], y)
    return y + h


def attention_block(p, x):
    """Single-head per-frame spatial attention (wan_video_vae.py:304-342)."""
    b, t, h, w, c = x.shape
    identity = x
    y = rms_norm_spatial(p["norm"], x)
    qkv = conv2d_on_frames(p["to_qkv"], y)                       # (B,T,H,W,3C)
    q, k, v = jnp.split(qkv.reshape(b * t, h * w, 3 * c), 3, axis=-1)
    scale = 1.0 / np.sqrt(c)
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = conv2d_on_frames(p["proj"], out.reshape(b, t, h, w, c))
    return out + identity


def upsample_nearest_2x(x):
    """nearest-exact 2x spatial upsample == pixel duplication for factor 2."""
    x = jnp.repeat(x, 2, axis=2)
    return jnp.repeat(x, 2, axis=3)


def _interleave_time2(y):
    """(B, T, H, W, 2C) time-conv output -> (B, 2T, H, W, C): channel pair
    (major half, minor half) becomes (even, odd) frames."""
    b, t, h, w, c2 = y.shape
    c = c2 // 2
    y = y.reshape(b, t, h, w, 2, c)
    y = y.transpose(0, 1, 4, 2, 3, 5)
    return y.reshape(b, t * 2, h, w, c)


def resample(p, x, mode: str):
    """Resample (wan_video_vae.py:82-174) in full-sequence form."""
    if mode == "upsample3d":
        # temporal 2x: frame 0 passthrough, frames 1.. causal conv -> interleave
        head_f = x[:, :1]
        rest = x[:, 1:]
        if rest.shape[1] > 0:
            y = causal_conv3d(p["time_conv"], rest)              # (B, T-1, H, W, 2C)
            x = jnp.concatenate([head_f, _interleave_time2(y)], axis=1)
        else:
            x = head_f
        return upsample_conv_2x(p["resample"]["1"], x)
    if mode == "upsample2d":
        return upsample_conv_2x(p["resample"]["1"], x)
    if mode == "downsample2d":
        # ZeroPad2d((0,1,0,1)) then 3x3 stride-2
        return conv2d_on_frames(p["resample"]["1"], x, stride=(2, 2),
                                padding=((0, 1), (0, 1)))
    if mode == "downsample3d":
        x = conv2d_on_frames(p["resample"]["1"], x, stride=(2, 2),
                             padding=((0, 1), (0, 1)))
        # temporal 2x down: frame 0 passthrough, stride-2 kernel-3 conv from
        # frame 0 (windows (0,1,2), (2,3,4), ...)
        head_f = x[:, :1]
        if x.shape[1] > 2:
            y = conv3d(p["time_conv"], x, stride=(2, 1, 1),
                       padding=((0, 0), (0, 0), (0, 0)))
            return jnp.concatenate([head_f, y], axis=1)
        return head_f
    raise ValueError(mode)


# --------------------------------------------------------------------------
# Encoder / decoder
# --------------------------------------------------------------------------

def _encoder_plan(cfg: WanVAEConfig):
    """Module sequence of Encoder3d.downsamples (wan_video_vae.py:543-558)."""
    plan = []
    for i in range(len(cfg.dim_mult)):
        for _ in range(cfg.num_res_blocks):
            plan.append(("res", None))
        if i != len(cfg.dim_mult) - 1:
            mode = "downsample3d" if cfg.temperal_downsample[i] else "downsample2d"
            plan.append(("resample", mode))
    return plan


def _decoder_plan(cfg: WanVAEConfig):
    """Module sequence of Decoder3d.upsamples (wan_video_vae.py:766-783)."""
    plan = []
    for i in range(len(cfg.dim_mult)):
        for _ in range(cfg.num_res_blocks + 1):
            plan.append(("res", None))
        if i != len(cfg.dim_mult) - 1:
            mode = "upsample3d" if cfg.temperal_upsample[i] else "upsample2d"
            plan.append(("resample", mode))
    return plan


def encoder3d(p, x, cfg: WanVAEConfig):
    x = causal_conv3d(p["conv1"], x)
    for idx, (kind, mode) in enumerate(_encoder_plan(cfg)):
        mp = p["downsamples"][str(idx)]
        x = residual_block(mp, x) if kind == "res" else resample(mp, x, mode)
    x = residual_block(p["middle"]["0"], x)
    x = attention_block(p["middle"]["1"], x)
    x = residual_block(p["middle"]["2"], x)
    x = rms_norm_spatial(p["head"]["0"], x)
    x = _silu(x)
    return causal_conv3d(p["head"]["2"], x)


def decoder3d(p, x, cfg: WanVAEConfig):
    x = causal_conv3d(p["conv1"], x)
    x = residual_block(p["middle"]["0"], x)
    x = attention_block(p["middle"]["1"], x)
    x = residual_block(p["middle"]["2"], x)
    for idx, (kind, mode) in enumerate(_decoder_plan(cfg)):
        mp = p["upsamples"][str(idx)]
        x = residual_block(mp, x) if kind == "res" else resample(mp, x, mode)
    x = rms_norm_spatial(p["head"]["0"], x)
    x = _silu(x)
    return causal_conv3d(p["head"]["2"], x)


def vae_encode(params, video, cfg: WanVAEConfig = WAN21_VAE):
    """video (B, 3, T, H, W) in [-1, 1] -> normalized latents
    (B, z, 1+(T-1)/4, H/8, W/8). Matches VideoVAE_.encode
    (wan_video_vae.py:984-1009) including the mean/std scaling."""
    out = encoder3d(params["encoder"], to_cl(video), cfg)
    moments = causal_conv3d(params["conv1"], out)
    mu = moments[..., :cfg.z_dim]
    mean = jnp.asarray(cfg.latent_mean, mu.dtype)
    inv_std = 1.0 / jnp.asarray(cfg.latent_std, mu.dtype)
    return from_cl((mu - mean) * inv_std)


def vae_decode(params, z, cfg: WanVAEConfig = WAN21_VAE, clamp: bool = True):
    """normalized latents -> video (B, 3, T, H, W). Matches VideoVAE_.decode
    (wan_video_vae.py:1011-1034)."""
    z = to_cl(z)
    mean = jnp.asarray(cfg.latent_mean, z.dtype)
    std = jnp.asarray(cfg.latent_std, z.dtype)
    z = z * std + mean
    x = causal_conv3d(params["conv2"], z)
    video = from_cl(decoder3d(params["decoder"], x, cfg))
    if clamp:
        video = jnp.clip(video, -1.0, 1.0)
    return video


# --------------------------------------------------------------------------
# Streaming (temporal-chunked) decode — the reference's feat_cache design
# (wan_video_vae.py:1011-1034, CausalConv3d cache :33-52, CACHE_T=2) in
# functional form: conv caches are an explicit pytree threaded through a
# host loop over latent-frame chunks. Exactly equal to the full-sequence
# decode (causal ops only), but activations stay at chunk size, so 480p+
# decodes run WITHOUT spatial tiling — no tile-overlap recompute and no
# per-tile ramp blending.
# --------------------------------------------------------------------------


class _CacheIO:
    """Threads per-op temporal caches in fixed op order (the functional
    analog of the reference's mutable feat_cache + feat_idx counter)."""

    def __init__(self, caches):
        self.create = caches is None
        self.caches = caches or []
        self.out = []
        self.idx = 0

    def get(self, make_zeros):
        if self.create:
            return make_zeros()
        c = self.caches[self.idx]
        self.idx += 1
        return c

    def put(self, cache):
        self.out.append(cache)


def _causal_conv3d_io(p, x, io: _CacheIO, stride=(1, 1, 1)):
    kt, kh, kw = p["weight"].shape[2:]
    pt, ph, pw = (kt - 1) // 2, (kh - 1) // 2, (kw - 1) // 2
    if pt == 0:
        return conv3d(p, x, stride=stride,
                      padding=((0, 0), (ph, ph), (pw, pw)))
    cache = io.get(lambda: jnp.zeros(
        (x.shape[0], 2 * pt) + x.shape[2:], x.dtype))
    xin = jnp.concatenate([cache, x], axis=1)
    y = conv3d(p, xin, stride=stride, padding=((0, 0), (ph, ph), (pw, pw)))
    io.put(xin[:, -2 * pt:])
    return y


def _residual_block_io(p, x, io: _CacheIO):
    x = _shard_w(x)
    if "shortcut" in p:
        h = _causal_conv3d_io(p["shortcut"], x, io)
    else:
        h = x
    y = rms_norm_spatial(p["residual"]["0"], x)
    y = _silu(y)
    y = _causal_conv3d_io(p["residual"]["2"], y, io)
    y = rms_norm_spatial(p["residual"]["3"], y)
    y = _silu(y)
    y = _causal_conv3d_io(p["residual"]["6"], y, io)
    return y + h


def _resample_up_io(p, x, mode: str, io: _CacheIO, first: bool):
    if mode == "upsample3d":
        if first:
            head_f = x[:, :1]
            rest = x[:, 1:]
            if rest.shape[1] > 0:
                y = _causal_conv3d_io(p["time_conv"], rest, io)
                xt = jnp.concatenate([head_f, _interleave_time2(y)], axis=1)
            else:
                # no frames have entered the time_conv stream yet: its
                # cache is still the zero left-pad
                io.put(io.get(lambda: jnp.zeros(
                    (x.shape[0], 2) + x.shape[2:], x.dtype)))
                xt = head_f
        else:
            y = _causal_conv3d_io(p["time_conv"], x, io)
            xt = _interleave_time2(y)
        return upsample_conv_2x(p["resample"]["1"], xt)
    if mode == "upsample2d":
        return upsample_conv_2x(p["resample"]["1"], x)
    raise ValueError(f"streaming decode only upsamples, got {mode}")


def _decode_stream_step(params, z_chunk, caches, cfg: WanVAEConfig,
                        first: bool):
    """One latent-frame chunk (B, C, t, H, W) -> (video chunk, new caches).
    Internals are channels-last; caches live in channels-last between steps."""
    z = to_cl(z_chunk)
    mean = jnp.asarray(cfg.latent_mean, z.dtype)
    std = jnp.asarray(cfg.latent_std, z.dtype)
    z = z * std + mean
    io = _CacheIO(caches)
    x = _causal_conv3d_io(params["conv2"], z, io)
    p = params["decoder"]
    x = _causal_conv3d_io(p["conv1"], x, io)
    x = _residual_block_io(p["middle"]["0"], x, io)
    x = attention_block(p["middle"]["1"], x)
    x = _residual_block_io(p["middle"]["2"], x, io)
    for idx, (kind, mode) in enumerate(_decoder_plan(cfg)):
        mp = p["upsamples"][str(idx)]
        if kind == "res":
            x = _residual_block_io(mp, x, io)
        else:
            x = _resample_up_io(mp, x, mode, io, first)
    x = rms_norm_spatial(p["head"]["0"], x)
    x = _silu(x)
    x = _causal_conv3d_io(p["head"]["2"], x, io)
    return from_cl(x), io.out


def _resample_down_io(p, x, mode: str, io: _CacheIO, first: bool):
    if mode == "downsample2d":
        return conv2d_on_frames(p["resample"]["1"], x, stride=(2, 2),
                                padding=((0, 1), (0, 1)))
    if mode != "downsample3d":
        raise ValueError(f"streaming encode only downsamples, got {mode}")
    x = conv2d_on_frames(p["resample"]["1"], x, stride=(2, 2),
                         padding=((0, 1), (0, 1)))
    if first:
        # global frame 0 passes through and seeds the stride-2 window cache
        io.put(x[:, -1:])
        return x
    cache = io.get(lambda: None)
    xin = jnp.concatenate([cache, x], axis=1)
    y = conv3d(p["time_conv"], xin, stride=(2, 1, 1))
    io.put(xin[:, -1:])
    return y


def _encode_stream_step(params, chunk, caches, cfg: WanVAEConfig,
                        first: bool):
    """One video chunk (1 frame first, then 4-frame chunks — the reference
    1+4k schedule, wan_video_vae.py:984-1009) -> (latent chunk, caches)."""
    io = _CacheIO(caches)
    p = params["encoder"]
    x = _causal_conv3d_io(p["conv1"], to_cl(chunk), io)
    for idx, (kind, mode) in enumerate(_encoder_plan(cfg)):
        mp = p["downsamples"][str(idx)]
        if kind == "res":
            x = _residual_block_io(mp, x, io)
        else:
            x = _resample_down_io(mp, x, mode, io, first)
    x = _residual_block_io(p["middle"]["0"], x, io)
    x = attention_block(p["middle"]["1"], x)
    x = _residual_block_io(p["middle"]["2"], x, io)
    x = rms_norm_spatial(p["head"]["0"], x)
    x = _silu(x)
    x = _causal_conv3d_io(p["head"]["2"], x, io)
    moments = _causal_conv3d_io(params["conv1"], x, io)
    mu = moments[..., :cfg.z_dim]
    mean = jnp.asarray(cfg.latent_mean, mu.dtype)
    inv_std = 1.0 / jnp.asarray(cfg.latent_std, mu.dtype)
    return from_cl((mu - mean) * inv_std), io.out


_STREAM_JIT_CACHE = {}


def vae_encode_stream(params, video, cfg: WanVAEConfig = WAN21_VAE):
    """Temporal-chunked encode with the reference's 1+4k chunk schedule:
    exact vs vae_encode (causal ops; the stride-2 temporal windows stay
    aligned because every chunk after the first is 4 frames). O(chunk)
    activations — no spatial tiling needed at 480p."""
    B, C, T, H, W = video.shape
    key0 = ("enc_stream", cfg, True, 1, H, W, video.dtype.name)
    if key0 not in _STREAM_JIT_CACHE:
        _STREAM_JIT_CACHE[key0] = jax.jit(
            partial(_encode_stream_step, cfg=cfg, first=True))
    outs = []
    out, caches = _STREAM_JIT_CACHE[key0](params, video[:, :, 0:1], None)
    outs.append(out)
    t0 = 1
    while t0 < T:
        t1 = min(t0 + 4, T)
        key = ("enc_stream", cfg, False, t1 - t0, H, W, video.dtype.name)
        if key not in _STREAM_JIT_CACHE:
            _STREAM_JIT_CACHE[key] = jax.jit(
                partial(_encode_stream_step, cfg=cfg, first=False),
                donate_argnums=(2,))
        out, caches = _STREAM_JIT_CACHE[key](params, video[:, :, t0:t1],
                                             caches)
        outs.append(out)
        t0 = t1
    return jnp.concatenate(outs, axis=2)


def vae_decode_stream(params, z, cfg: WanVAEConfig = WAN21_VAE,
                      chunk_size: int = 4, clamp: bool = True):
    """Temporal-chunked decode: first chunk = 1 latent frame (the causal
    head), then `chunk_size`-frame chunks, caches carried between steps.
    Bit-equal to vae_decode up to conv reassociation; O(chunk) activation
    memory, so no spatial tiling is needed at 480p."""
    B, C, T, H, W = z.shape
    bounds = [(0, 1)]
    t0 = 1
    while t0 < T:
        t1 = min(t0 + chunk_size, T)
        bounds.append((t0, t1))
        t0 = t1

    key0 = ("dec_stream", cfg, True, 1, H, W, z.dtype.name)
    if key0 not in _STREAM_JIT_CACHE:
        _STREAM_JIT_CACHE[key0] = jax.jit(
            partial(_decode_stream_step, cfg=cfg, first=True))
    outs = []
    out, caches = _STREAM_JIT_CACHE[key0](params, z[:, :, 0:1], None)
    outs.append(out)
    for (a, b) in bounds[1:]:
        key = ("dec_stream", cfg, False, b - a, H, W, z.dtype.name)
        if key not in _STREAM_JIT_CACHE:
            _STREAM_JIT_CACHE[key] = jax.jit(
                partial(_decode_stream_step, cfg=cfg, first=False),
                donate_argnums=(2,))
        out, caches = _STREAM_JIT_CACHE[key](params, z[:, :, a:b], caches)
        outs.append(out)
    video = jnp.concatenate(outs, axis=2)
    if clamp:
        video = jnp.clip(video, -1.0, 1.0)
    return video


# --------------------------------------------------------------------------
# Tiled encode/decode (spatial tiles, ramp-blended) — wan_video_vae.py:1081-1203
# --------------------------------------------------------------------------

def _build_1d_mask(length, left_bound, right_bound, border_width):
    x = np.ones((length,), np.float32)
    if border_width > 0:
        if not left_bound:
            x[:border_width] = (np.arange(border_width) + 1) / border_width
        if not right_bound:
            x[-border_width:] = ((np.arange(border_width) + 1) / border_width)[::-1]
    return x


def _build_mask(h_size, w_size, is_bound, border_width):
    h = _build_1d_mask(h_size, is_bound[0], is_bound[1], border_width[0])
    w = _build_1d_mask(w_size, is_bound[2], is_bound[3], border_width[1])
    return np.minimum(h[:, None], w[None, :])[None, None, None]


def _tile_tasks(H, W, size_h, size_w, stride_h, stride_w):
    tasks = []
    for h in range(0, H, stride_h):
        if h - stride_h >= 0 and h - stride_h + size_h >= H:
            continue
        for w in range(0, W, stride_w):
            if w - stride_w >= 0 and w - stride_w + size_w >= W:
                continue
            tasks.append((h, min(h + size_h, H), w, min(w + size_w, W)))
    return tasks


def tiled_encode(params, video, cfg: WanVAEConfig = WAN21_VAE,
                 tile_size=(34, 34), tile_stride=(18, 16)):
    """Spatially tiled encode; tile sizes are in latent units like the
    reference API (multiplied by the 8x upsampling factor internally)."""
    up = cfg.upsampling_factor
    size_h, size_w = tile_size[0] * up, tile_size[1] * up
    stride_h, stride_w = tile_stride[0] * up, tile_stride[1] * up
    B, C, T, H, W = video.shape
    out_T = (T + 3) // 4
    values = np.zeros((B, cfg.z_dim, out_T, H // up, W // up), np.float32)
    weight = np.zeros((1, 1, 1, H // up, W // up), np.float32)
    for h, h_, w, w_ in _tile_tasks(H, W, size_h, size_w, stride_h, stride_w):
        tile = video[:, :, :, h:h_, w:w_]
        lat = np.asarray(vae_encode(params, tile, cfg), np.float32)
        mask = _build_mask(lat.shape[3], lat.shape[4],
                           (h == 0, h_ >= H, w == 0, w_ >= W),
                           ((size_h - stride_h) // up, (size_w - stride_w) // up))
        th, tw = h // up, w // up
        values[:, :, :, th:th + lat.shape[3], tw:tw + lat.shape[4]] += lat * mask
        weight[:, :, :, th:th + lat.shape[3], tw:tw + lat.shape[4]] += mask
    return jnp.asarray(values / weight)


def tiled_decode(params, z, cfg: WanVAEConfig = WAN21_VAE,
                 tile_size=(34, 34), tile_stride=(18, 16)):
    up = cfg.upsampling_factor
    size_h, size_w = tile_size
    stride_h, stride_w = tile_stride
    B, C, T, H, W = z.shape
    out_T = T * 4 - 3
    values = np.zeros((B, 3, out_T, H * up, W * up), np.float32)
    weight = np.zeros((1, 1, 1, H * up, W * up), np.float32)
    for h, h_, w, w_ in _tile_tasks(H, W, size_h, size_w, stride_h, stride_w):
        tile = z[:, :, :, h:h_, w:w_]
        vid = np.asarray(vae_decode(params, tile, cfg, clamp=False), np.float32)
        mask = _build_mask(vid.shape[3], vid.shape[4],
                           (h == 0, h_ >= H, w == 0, w_ >= W),
                           ((size_h - stride_h) * up, (size_w - stride_w) * up))
        th, tw = h * up, w * up
        values[:, :, :, th:th + vid.shape[3], tw:tw + vid.shape[4]] += vid * mask
        weight[:, :, :, th:th + vid.shape[3], tw:tw + vid.shape[4]] += mask
    return jnp.clip(jnp.asarray(values / weight), -1.0, 1.0)


# --------------------------------------------------------------------------
# Public API mirroring WanVideoVAE.encode/decode (wan_video_vae.py:1218-1247)
# --------------------------------------------------------------------------

def encode(params, video, cfg: WanVAEConfig = WAN21_VAE, tiled: bool = False,
           tile_size=(34, 34), tile_stride=(18, 16),
           streaming: Optional[bool] = None):
    """streaming=True (or tiled=True with streaming unset) runs the
    temporal-chunked encoder: exact, O(chunk) memory, and ~2x faster than
    spatial tiling (no tile-overlap recompute). Explicit streaming=False
    with tiled=True keeps the reference's spatial tiling."""
    if isinstance(cfg, WanVAE38Config):
        if streaming or (tiled and streaming is None):
            return vae38_encode_stream(params, video, cfg)
        return vae38_encode(params, video, cfg)
    if streaming or (tiled and streaming is None):
        return vae_encode_stream(params, video, cfg)
    if tiled:
        return tiled_encode(params, video, cfg, tile_size, tile_stride)
    return vae_encode(params, video, cfg)


def _auto_chunk(z, default: int = 4) -> int:
    """Scale the latent chunk size down with spatial area so peak decoder
    activations stay ~constant (4 latent frames at 480p-sized latents)."""
    area = z.shape[-2] * z.shape[-1]
    return max(1, min(default, int(round(default * 6240.0 / max(area, 1)))))


def decode(params, z, cfg: WanVAEConfig = WAN21_VAE, tiled: bool = False,
           tile_size=(34, 34), tile_stride=(18, 16),
           streaming: Optional[bool] = None, chunk_size: Optional[int] = None):
    if chunk_size is None:
        chunk_size = _auto_chunk(z)
    if isinstance(cfg, WanVAE38Config):
        if streaming or (tiled and streaming is None):
            return vae38_decode_stream(params, z, cfg, chunk_size=chunk_size)
        return vae38_decode(params, z, cfg)
    if streaming or (tiled and streaming is None):
        return vae_decode_stream(params, z, cfg, chunk_size=chunk_size)
    if tiled:
        return tiled_decode(params, z, cfg, tile_size, tile_stride)
    return vae_decode(params, z, cfg)


# --------------------------------------------------------------------------
# Wan2.2 VAE (z=48, 16x spatial via pixel patchify 2) — wan_video_vae.py:
# Encoder3d_38/Decoder3d_38 (:620-940), VideoVAE38_ (:1269-1351),
# WanVideoVAE38 (:1354-1382)
# --------------------------------------------------------------------------

WAN22_LATENT_MEAN = (
    -0.2289, -0.0052, -0.1323, -0.2339, -0.2799, 0.0174, 0.1838, 0.1557,
    -0.1382, 0.0542, 0.2813, 0.0891, 0.1570, -0.0098, 0.0375, -0.1825,
    -0.2246, -0.1207, -0.0698, 0.5109, 0.2665, -0.2108, -0.2158, 0.2502,
    -0.2055, -0.0322, 0.1109, 0.1567, -0.0729, 0.0899, -0.2799, -0.1230,
    -0.0313, -0.1649, 0.0117, 0.0723, -0.2839, -0.2083, -0.0520, 0.3748,
    0.0152, 0.1957, 0.1433, -0.2944, 0.3573, -0.0548, -0.1681, -0.0667)
WAN22_LATENT_STD = (
    0.4765, 1.0364, 0.4514, 1.1677, 0.5313, 0.4990, 0.4818, 0.5013,
    0.8158, 1.0344, 0.5894, 1.0901, 0.6885, 0.6165, 0.8454, 0.4978,
    0.5759, 0.3523, 0.7135, 0.6804, 0.5833, 1.4146, 0.8986, 0.5659,
    0.7069, 0.5338, 0.4889, 0.4917, 0.4069, 0.4999, 0.6866, 0.4093,
    0.5709, 0.6065, 0.6415, 0.4944, 0.5726, 1.2042, 0.5458, 1.6887,
    0.3971, 1.0600, 0.3943, 0.5537, 0.5444, 0.4089, 0.7468, 0.7744)


@dataclass(frozen=True)
class WanVAE38Config:
    dim: int = 160
    dec_dim: int = 256
    z_dim: int = 48
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temperal_downsample: Tuple[bool, ...] = (False, True, True)
    latent_mean: Tuple[float, ...] = WAN22_LATENT_MEAN
    latent_std: Tuple[float, ...] = WAN22_LATENT_STD

    @property
    def temperal_upsample(self):
        return tuple(reversed(self.temperal_downsample))

    @property
    def upsampling_factor(self) -> int:
        # 8x conv path * 2x pixel patchify
        return 16


WAN22_VAE = WanVAE38Config()


def pixel_patchify(x, p: int = 2):
    """(B, C, F, H, W) -> channels-last (B, F, H/p, W/p, C*p*p) with the
    reference's '(c r q)' channel order (wan_video_vae.py:199-211)."""
    from einops import rearrange
    return rearrange(x, "b c f (h q) (w r) -> b f h w (c r q)", q=p, r=p)


def pixel_unpatchify(x, p: int = 2):
    """channels-last (B, F, H, W, C*p*p) -> (B, C, F*1, H*p, W*p)."""
    from einops import rearrange
    return rearrange(x, "b f h w (c r q) -> b c f (h q) (w r)", q=p, r=p)


def avg_down3d(x, out_channels: int, factor_t: int, factor_s: int = 1):
    """AvgDown3D (wan_video_vae.py:345-395): left-pad T to a multiple of
    factor_t, space-time-to-channel, grouped mean. Channels-last x."""
    B, T, H, W, C = x.shape
    pad_t = (factor_t - T % factor_t) % factor_t
    if pad_t:
        x = jnp.pad(x, ((0, 0), (pad_t, 0), (0, 0), (0, 0), (0, 0)))
        T += pad_t
    factor = factor_t * factor_s * factor_s
    group_size = C * factor // out_channels
    x = x.reshape(B, T // factor_t, factor_t, H // factor_s, factor_s,
                  W // factor_s, factor_s, C)
    # flattened channel order must be (C, ft, fs_h, fs_w) major-to-minor
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    x = x.reshape(B, T // factor_t, H // factor_s, W // factor_s,
                  out_channels, group_size)
    return x.mean(axis=-1)


def dup_up3d(x, out_channels: int, factor_t: int, factor_s: int = 1,
             first_chunk: bool = False):
    """DupUp3D (wan_video_vae.py:398-439). Channels-last x."""
    B, T, H, W, C = x.shape
    factor = factor_t * factor_s * factor_s
    repeats = out_channels * factor // C
    x = jnp.repeat(x, repeats, axis=-1)
    # channel split order (out_c, ft, fs_h, fs_w) major-to-minor
    x = x.reshape(B, T, H, W, out_channels, factor_t, factor_s, factor_s)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    x = x.reshape(B, T * factor_t, H * factor_s, W * factor_s, out_channels)
    if first_chunk:
        x = x[:, factor_t - 1:]
    return x


def down_residual_block(p, x, temperal_downsample: bool, down_flag: bool,
                        mult: int):
    """Down_ResidualBlock (wan_video_vae.py:442-474)."""
    out_c = p["downsamples"]["0"]["residual"]["6"]["weight"].shape[0]
    shortcut = avg_down3d(x, out_c, 2 if temperal_downsample else 1,
                          2 if down_flag else 1)
    h = x
    for i in range(mult):
        h = residual_block(p["downsamples"][str(i)], h)
    if down_flag:
        mode = "downsample3d" if temperal_downsample else "downsample2d"
        h = resample(p["downsamples"][str(mult)], h, mode)
    return h + shortcut


def up_residual_block(p, x, temperal_upsample: bool, up_flag: bool, mult: int,
                      first_chunk: bool = False):
    """Up_ResidualBlock (wan_video_vae.py:477-514)."""
    h = x
    for i in range(mult):
        h = residual_block(p["upsamples"][str(i)], h)
    if up_flag:
        mode = "upsample3d" if temperal_upsample else "upsample2d"
        h = resample38_up(p["upsamples"][str(mult)], h, mode)
        out_c = h.shape[-1]
        shortcut = dup_up3d(x, out_c, 2 if temperal_upsample else 1, 2,
                            first_chunk=first_chunk)
        return h + shortcut
    return h


def resample38_up(p, x, mode: str):
    """Resample38 upsample: like Resample but the spatial conv keeps the
    channel count (wan_video_vae.py:242-252); temporal logic identical."""
    return resample(p, x, mode)


def encoder3d_38(p, x, cfg: WanVAE38Config):
    x = causal_conv3d(p["conv1"], x)
    for i in range(len(cfg.dim_mult)):
        t_down = cfg.temperal_downsample[i] if i < len(cfg.temperal_downsample) else False
        down_flag = i != len(cfg.dim_mult) - 1
        x = down_residual_block(p["downsamples"][str(i)], x, t_down, down_flag,
                                cfg.num_res_blocks)
    x = residual_block(p["middle"]["0"], x)
    x = attention_block(p["middle"]["1"], x)
    x = residual_block(p["middle"]["2"], x)
    x = rms_norm_spatial(p["head"]["0"], x)
    x = _silu(x)
    return causal_conv3d(p["head"]["2"], x)


def decoder3d_38(p, x, cfg: WanVAE38Config):
    x = causal_conv3d(p["conv1"], x)
    x = residual_block(p["middle"]["0"], x)
    x = attention_block(p["middle"]["1"], x)
    x = residual_block(p["middle"]["2"], x)
    for i in range(len(cfg.dim_mult)):
        t_up = cfg.temperal_upsample[i] if i < len(cfg.temperal_upsample) else False
        up_flag = i != len(cfg.dim_mult) - 1
        x = up_residual_block(p["upsamples"][str(i)], x, t_up, up_flag,
                              cfg.num_res_blocks + 1, first_chunk=True)
    x = rms_norm_spatial(p["head"]["0"], x)
    x = _silu(x)
    return causal_conv3d(p["head"]["2"], x)


def vae38_encode(params, video, cfg: WanVAE38Config = WAN22_VAE):
    """video (B, 3, T, H, W) -> normalized latents (B, 48, 1+(T-1)/4, H/16, W/16)."""
    x = pixel_patchify(video, 2)          # channels-last
    out = encoder3d_38(params["encoder"], x, cfg)
    moments = causal_conv3d(params["conv1"], out)
    mu = moments[..., :cfg.z_dim]
    mean = jnp.asarray(cfg.latent_mean, mu.dtype)
    inv_std = 1.0 / jnp.asarray(cfg.latent_std, mu.dtype)
    return from_cl((mu - mean) * inv_std)


def vae38_decode(params, z, cfg: WanVAE38Config = WAN22_VAE, clamp: bool = True):
    z = to_cl(z)
    mean = jnp.asarray(cfg.latent_mean, z.dtype)
    std = jnp.asarray(cfg.latent_std, z.dtype)
    z = z * std + mean
    x = causal_conv3d(params["conv2"], z)
    out = decoder3d_38(params["decoder"], x, cfg)
    video = pixel_unpatchify(out, 2)      # back to (B, C, T, H, W)
    if clamp:
        video = jnp.clip(video, -1.0, 1.0)
    return video


# --------------------------------------------------------------------------
# Streaming Wan2.2 VAE38 encode/decode — same cache-threading as the 2.1
# VAE; avg_down3d needs no cache (its zero left-pad covers exactly the
# first chunk on the 1+4k schedule) and dup_up3d's first_chunk drop applies
# only to the first chunk.
# --------------------------------------------------------------------------


def _down_residual_block_io(p, x, io: _CacheIO, t_down: bool,
                            down_flag: bool, mult: int, first: bool):
    out_c = p["downsamples"]["0"]["residual"]["6"]["weight"].shape[0]
    shortcut = avg_down3d(x, out_c, 2 if t_down else 1,
                          2 if down_flag else 1)
    h = x
    for i in range(mult):
        h = _residual_block_io(p["downsamples"][str(i)], h, io)
    if down_flag:
        mode = "downsample3d" if t_down else "downsample2d"
        h = _resample_down_io(p["downsamples"][str(mult)], h, mode, io, first)
    return h + shortcut


def _up_residual_block_io(p, x, io: _CacheIO, t_up: bool, up_flag: bool,
                          mult: int, first: bool):
    h = x
    for i in range(mult):
        h = _residual_block_io(p["upsamples"][str(i)], h, io)
    if up_flag:
        mode = "upsample3d" if t_up else "upsample2d"
        h = _resample_up_io(p["upsamples"][str(mult)], h, mode, io, first)
        out_c = h.shape[-1]
        shortcut = dup_up3d(x, out_c, 2 if t_up else 1, 2,
                            first_chunk=first)
        return h + shortcut
    return h


def _encode38_stream_step(params, chunk, caches, cfg, first: bool):
    io = _CacheIO(caches)
    x = pixel_patchify(chunk, 2)
    p = params["encoder"]
    x = _causal_conv3d_io(p["conv1"], x, io)
    for i in range(len(cfg.dim_mult)):
        t_down = cfg.temperal_downsample[i] if i < len(
            cfg.temperal_downsample) else False
        down_flag = i != len(cfg.dim_mult) - 1
        x = _down_residual_block_io(p["downsamples"][str(i)], x, io, t_down,
                                    down_flag, cfg.num_res_blocks, first)
    x = _residual_block_io(p["middle"]["0"], x, io)
    x = attention_block(p["middle"]["1"], x)
    x = _residual_block_io(p["middle"]["2"], x, io)
    x = rms_norm_spatial(p["head"]["0"], x)
    x = _silu(x)
    x = _causal_conv3d_io(p["head"]["2"], x, io)
    moments = _causal_conv3d_io(params["conv1"], x, io)
    mu = moments[..., :cfg.z_dim]
    mean = jnp.asarray(cfg.latent_mean, mu.dtype)
    inv_std = 1.0 / jnp.asarray(cfg.latent_std, mu.dtype)
    return from_cl((mu - mean) * inv_std), io.out


def _decode38_stream_step(params, z_chunk, caches, cfg, first: bool):
    z = to_cl(z_chunk)
    mean = jnp.asarray(cfg.latent_mean, z.dtype)
    std = jnp.asarray(cfg.latent_std, z.dtype)
    z = z * std + mean
    io = _CacheIO(caches)
    x = _causal_conv3d_io(params["conv2"], z, io)
    p = params["decoder"]
    x = _causal_conv3d_io(p["conv1"], x, io)
    x = _residual_block_io(p["middle"]["0"], x, io)
    x = attention_block(p["middle"]["1"], x)
    x = _residual_block_io(p["middle"]["2"], x, io)
    for i in range(len(cfg.dim_mult)):
        t_up = cfg.temperal_upsample[i] if i < len(
            cfg.temperal_upsample) else False
        up_flag = i != len(cfg.dim_mult) - 1
        x = _up_residual_block_io(p["upsamples"][str(i)], x, io, t_up,
                                  up_flag, cfg.num_res_blocks + 1, first)
    x = rms_norm_spatial(p["head"]["0"], x)
    x = _silu(x)
    x = _causal_conv3d_io(p["head"]["2"], x, io)
    return pixel_unpatchify(x, 2), io.out


def vae38_encode_stream(params, video, cfg: "WanVAE38Config" = None):
    cfg = cfg or WAN22_VAE
    B, C, T, H, W = video.shape
    key0 = ("enc38_stream", cfg, True, 1, H, W, video.dtype.name)
    if key0 not in _STREAM_JIT_CACHE:
        _STREAM_JIT_CACHE[key0] = jax.jit(
            partial(_encode38_stream_step, cfg=cfg, first=True))
    outs = []
    out, caches = _STREAM_JIT_CACHE[key0](params, video[:, :, 0:1], None)
    outs.append(out)
    t0 = 1
    while t0 < T:
        t1 = min(t0 + 4, T)
        key = ("enc38_stream", cfg, False, t1 - t0, H, W, video.dtype.name)
        if key not in _STREAM_JIT_CACHE:
            _STREAM_JIT_CACHE[key] = jax.jit(
                partial(_encode38_stream_step, cfg=cfg, first=False),
                donate_argnums=(2,))
        out, caches = _STREAM_JIT_CACHE[key](params, video[:, :, t0:t1],
                                             caches)
        outs.append(out)
        t0 = t1
    return jnp.concatenate(outs, axis=2)


def vae38_decode_stream(params, z, cfg: "WanVAE38Config" = None,
                        chunk_size: int = 4, clamp: bool = True):
    cfg = cfg or WAN22_VAE
    B, C, T, H, W = z.shape
    key0 = ("dec38_stream", cfg, True, 1, H, W, z.dtype.name)
    if key0 not in _STREAM_JIT_CACHE:
        _STREAM_JIT_CACHE[key0] = jax.jit(
            partial(_decode38_stream_step, cfg=cfg, first=True))
    outs = []
    out, caches = _STREAM_JIT_CACHE[key0](params, z[:, :, 0:1], None)
    outs.append(out)
    t0 = 1
    while t0 < T:
        t1 = min(t0 + chunk_size, T)
        key = ("dec38_stream", cfg, False, t1 - t0, H, W, z.dtype.name)
        if key not in _STREAM_JIT_CACHE:
            _STREAM_JIT_CACHE[key] = jax.jit(
                partial(_decode38_stream_step, cfg=cfg, first=False),
                donate_argnums=(2,))
        out, caches = _STREAM_JIT_CACHE[key](params, z[:, :, t0:t1], caches)
        outs.append(out)
        t0 = t1
    video = jnp.concatenate(outs, axis=2)
    if clamp:
        video = jnp.clip(video, -1.0, 1.0)
    return video


# --------------------------------------------------------------------------
# Random init (tests / smoke runs without checkpoints)
# --------------------------------------------------------------------------

def _init_conv(key, out_c, in_c, k=(3, 3, 3), dtype=jnp.float32):
    import math as _m
    fan_in = in_c * int(np.prod(k))
    std = 1.0 / _m.sqrt(fan_in)
    return {"weight": (jax.random.normal(key, (out_c, in_c) + tuple(k), jnp.float32)
                       * std).astype(dtype),
            "bias": jnp.zeros((out_c,), dtype)}


def _init_conv2d(key, out_c, in_c, k=(3, 3), dtype=jnp.float32):
    return _init_conv(key, out_c, in_c, k=k, dtype=dtype)


def _init_norm(c, images=False, dtype=jnp.float32):
    shape = (c, 1, 1) if images else (c, 1, 1, 1)
    return {"gamma": jnp.ones(shape, dtype)}


def _init_res(key, in_c, out_c, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"residual": {
        "0": _init_norm(in_c, dtype=dtype),
        "2": _init_conv(k1, out_c, in_c, dtype=dtype),
        "3": _init_norm(out_c, dtype=dtype),
        "6": _init_conv(k2, out_c, out_c, dtype=dtype),
    }}
    if in_c != out_c:
        p["shortcut"] = _init_conv(k3, out_c, in_c, k=(1, 1, 1), dtype=dtype)
    return p


def _init_attn_block(key, c, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"norm": _init_norm(c, images=True, dtype=dtype),
            "to_qkv": _init_conv2d(k1, c * 3, c, k=(1, 1), dtype=dtype),
            "proj": _init_conv2d(k2, c, c, k=(1, 1), dtype=dtype)}


def init_wan_vae(key, cfg: WanVAEConfig = WAN21_VAE, dtype=jnp.float32):
    """Random-init param pytree with the checkpoint structure."""
    keys = iter(jax.random.split(key, 256))
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    enc_down = {}
    idx = 0
    in_c = dims[0]
    for i in range(len(cfg.dim_mult)):
        out_c = dims[i + 1]
        for _ in range(cfg.num_res_blocks):
            enc_down[str(idx)] = _init_res(next(keys), in_c, out_c, dtype)
            in_c = out_c
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            p = {"resample": {"1": _init_conv2d(next(keys), out_c, out_c, dtype=dtype)}}
            if cfg.temperal_downsample[i]:
                p["time_conv"] = _init_conv(next(keys), out_c, out_c, k=(3, 1, 1), dtype=dtype)
            enc_down[str(idx)] = p
            idx += 1
    enc_out = dims[-1]
    encoder = {
        "conv1": _init_conv(next(keys), dims[0], 3, dtype=dtype),
        "downsamples": enc_down,
        "middle": {"0": _init_res(next(keys), enc_out, enc_out, dtype),
                   "1": _init_attn_block(next(keys), enc_out, dtype),
                   "2": _init_res(next(keys), enc_out, enc_out, dtype)},
        "head": {"0": _init_norm(enc_out, dtype=dtype),
                 "2": _init_conv(next(keys), cfg.z_dim * 2, enc_out, dtype=dtype)},
    }
    ddims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    dec_up = {}
    idx = 0
    for i in range(len(cfg.dim_mult)):
        in_c = ddims[i] // 2 if i in (1, 2, 3) else ddims[i]
        out_c = ddims[i + 1]
        for _ in range(cfg.num_res_blocks + 1):
            dec_up[str(idx)] = _init_res(next(keys), in_c, out_c, dtype)
            in_c = out_c
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            p = {"resample": {"1": _init_conv2d(next(keys), out_c // 2, out_c, dtype=dtype)}}
            if cfg.temperal_upsample[i]:
                p["time_conv"] = _init_conv(next(keys), out_c * 2, out_c, k=(3, 1, 1), dtype=dtype)
            dec_up[str(idx)] = p
            idx += 1
    decoder = {
        "conv1": _init_conv(next(keys), ddims[0], cfg.z_dim, dtype=dtype),
        "middle": {"0": _init_res(next(keys), ddims[0], ddims[0], dtype),
                   "1": _init_attn_block(next(keys), ddims[0], dtype),
                   "2": _init_res(next(keys), ddims[0], ddims[0], dtype)},
        "upsamples": dec_up,
        "head": {"0": _init_norm(ddims[-1], dtype=dtype),
                 "2": _init_conv(next(keys), 3, ddims[-1], dtype=dtype)},
    }
    return {
        "encoder": encoder,
        "conv1": _init_conv(next(keys), cfg.z_dim * 2, cfg.z_dim * 2, k=(1, 1, 1), dtype=dtype),
        "conv2": _init_conv(next(keys), cfg.z_dim, cfg.z_dim, k=(1, 1, 1), dtype=dtype),
        "decoder": decoder,
    }


# --------------------------------------------------------------------------
# Converter: torch state dict -> nested pytree (names preserved)
# --------------------------------------------------------------------------

def convert_wan_vae(sd: Dict, dtype=jnp.float32):
    """Nest 'model.encoder.downsamples.0.residual.2.weight' style keys into a
    pytree; the forward functions consume the same structure. Accepts state
    dicts with or without the leading 'model.' prefix."""
    import numpy as _np
    root: Dict = {}
    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] == "model":
            parts = parts[1:]
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if hasattr(val, "detach"):
            val = val.detach().to_dense().float().cpu().numpy()
        node[parts[-1]] = jnp.asarray(_np.asarray(val), dtype)
    return root


# --------------------------------------------------------------------------
# Random init (same pytree structure as convert_wan_vae output) — used by
# benchmarks and tests that need a full-size VAE without a checkpoint.
# Channel wiring mirrors Encoder3d/Decoder3d/Resample construction
# (wan_video_vae.py:82-117, 510-558, 736-783).
# --------------------------------------------------------------------------

def _init_conv(key, out_ch, in_ch, k, dtype=jnp.float32):
    """k: (kt, kh, kw) or int."""
    if isinstance(k, int):
        k = (k, k, k)
    fan_in = in_ch * int(np.prod(k))
    w = jax.random.normal(key, (out_ch, in_ch) + tuple(k)) / np.sqrt(fan_in)
    return {"weight": w.astype(dtype), "bias": jnp.zeros((out_ch,), dtype)}


def _init_conv2d(key, out_ch, in_ch, k, dtype=jnp.float32):
    fan_in = in_ch * k * k
    w = jax.random.normal(key, (out_ch, in_ch, k, k)) / np.sqrt(fan_in)
    return {"weight": w.astype(dtype), "bias": jnp.zeros((out_ch,), dtype)}


def _init_rms(dim, dtype=jnp.float32):
    return {"gamma": jnp.ones((dim, 1, 1, 1), dtype)}


def _init_res_block(key, in_ch, out_ch, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    p = {"residual": {
        "0": _init_rms(in_ch, dtype),
        "2": _init_conv(ks[0], out_ch, in_ch, 3, dtype),
        "3": _init_rms(out_ch, dtype),
        "6": _init_conv(ks[1], out_ch, out_ch, 3, dtype),
    }}
    if in_ch != out_ch:
        p["shortcut"] = _init_conv(ks[2], out_ch, in_ch, 1, dtype)
    return p


def _init_attn_block(key, ch, dtype=jnp.float32):
    ks = jax.random.split(key, 2)
    # AttentionBlock's RMS_norm uses images=True -> gamma (C, 1, 1)
    return {"norm": {"gamma": jnp.ones((ch, 1, 1), dtype)},
            "to_qkv": _init_conv2d(ks[0], 3 * ch, ch, 1, dtype),
            "proj": _init_conv2d(ks[1], ch, ch, 1, dtype)}


def _init_resample(key, ch, mode, dtype=jnp.float32):
    ks = jax.random.split(key, 2)
    if mode in ("downsample2d", "downsample3d"):
        p = {"resample": {"1": _init_conv2d(ks[0], ch, ch, 3, dtype)}}
        if mode == "downsample3d":
            p["time_conv"] = _init_conv(ks[1], ch, ch, (3, 1, 1), dtype)
    else:  # upsample2d / upsample3d
        p = {"resample": {"1": _init_conv2d(ks[0], ch // 2, ch, 3, dtype)}}
        if mode == "upsample3d":
            p["time_conv"] = _init_conv(ks[1], ch * 2, ch, (3, 1, 1), dtype)
    return p


def init_wan_vae(key, cfg: WanVAEConfig = WAN21_VAE, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 256))

    # encoder (Encoder3d, wan_video_vae.py:510-558): dims [1]+dim_mult
    e_dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    enc = {"conv1": _init_conv(next(ks), e_dims[0], 3, 3, dtype),
           "downsamples": {}, "middle": {}, "head": {}}
    idx = 0
    in_ch = e_dims[0]
    for i in range(len(cfg.dim_mult)):
        out_ch = e_dims[i + 1]
        for _ in range(cfg.num_res_blocks):
            enc["downsamples"][str(idx)] = _init_res_block(next(ks), in_ch, out_ch, dtype)
            in_ch = out_ch
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            mode = "downsample3d" if cfg.temperal_downsample[i] else "downsample2d"
            enc["downsamples"][str(idx)] = _init_resample(next(ks), out_ch, mode, dtype)
            idx += 1
    top = e_dims[-1]
    enc["middle"] = {"0": _init_res_block(next(ks), top, top, dtype),
                     "1": _init_attn_block(next(ks), top, dtype),
                     "2": _init_res_block(next(ks), top, top, dtype)}
    enc["head"] = {"0": _init_rms(top, dtype),
                   "2": _init_conv(next(ks), cfg.z_dim * 2, top, 3, dtype)}

    # decoder (Decoder3d, wan_video_vae.py:736-783):
    # dims [last]+reversed(dim_mult); i>=1 halves in_dim (post-upsample)
    d_dims = [cfg.dim * u for u in
              (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    dec = {"conv1": _init_conv(next(ks), d_dims[0], cfg.z_dim, 3, dtype),
           "middle": {"0": _init_res_block(next(ks), d_dims[0], d_dims[0], dtype),
                      "1": _init_attn_block(next(ks), d_dims[0], dtype),
                      "2": _init_res_block(next(ks), d_dims[0], d_dims[0], dtype)},
           "upsamples": {}, "head": {}}
    idx = 0
    for i in range(len(cfg.dim_mult)):
        in_ch, out_ch = d_dims[i], d_dims[i + 1]
        if i >= 1:
            in_ch //= 2
        for _ in range(cfg.num_res_blocks + 1):
            dec["upsamples"][str(idx)] = _init_res_block(next(ks), in_ch, out_ch, dtype)
            in_ch = out_ch
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            mode = "upsample3d" if cfg.temperal_upsample[i] else "upsample2d"
            dec["upsamples"][str(idx)] = _init_resample(next(ks), out_ch, mode, dtype)
            idx += 1
    dec["head"] = {"0": _init_rms(out_ch, dtype),
                   "2": _init_conv(next(ks), 3, out_ch, 3, dtype)}

    return {"encoder": enc,
            "conv1": _init_conv(next(ks), cfg.z_dim * 2, cfg.z_dim * 2, 1, dtype),
            "conv2": _init_conv(next(ks), cfg.z_dim, cfg.z_dim, 1, dtype),
            "decoder": dec}
