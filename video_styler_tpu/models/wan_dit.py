"""Wan video diffusion transformer (DiT), TPU-native.

Functional re-design of the reference WanModel
(/root/reference/diffsynth/models/wan_video_dit.py:272-418): parameters are
explicit pytrees, the 30/40-layer block stack runs under `jax.lax.scan` over
stacked per-layer weights (fast compiles, natural GSPMD sharding and remat),
and attention dispatches to a Pallas flash kernel on TPU. The VACE control
branch injects additive hints after mapped layers via segmented scans.

Numerical contracts preserved from the reference:
  - sinusoidal t-emb -> SiLU MLP -> 6-way adaLN modulation per block
  - RMSNorm(eps=1e-6) on Q/K before 3D RoPE (rope in fp32)
  - LayerNorm without affine params for norm1/norm2, affine norm3 before
    cross-attention, GELU-tanh FFN
  - modulated head + unpatchify with (pt, ph, pw, c) flatten order
  - `rope_indices` kwarg for keyframe editing (wan_video_dit.py:360,377-384)
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange

from ..ops.basic import (
    linear, layer_norm, rms_norm, gelu_tanh, silu, modulate,
    sinusoidal_embedding_1d, init_linear, init_layer_norm, init_rms_norm,
)
from ..ops.rope import assemble_freqs_grid
from ..ops.fused_norm_rope import fused_rmsnorm_rope, fused_rmsnorm
from ..ops.attention import attention
from ..parallel.context import constrain


# --------------------------------------------------------------------------
# Config
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class WanDiTConfig:
    dim: int
    in_dim: int
    ffn_dim: int
    out_dim: int
    num_heads: int
    num_layers: int
    text_dim: int = 4096
    freq_dim: int = 256
    eps: float = 1e-6
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    has_image_input: bool = False
    has_image_pos_emb: bool = False
    has_ref_conv: bool = False
    seperated_timestep: bool = False
    require_vae_embedding: bool = True
    require_clip_embedding: bool = True
    fuse_vae_embedding_in_latents: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


# Hash-registry configs from the reference converter (wan_video_dit.py:506-751)
WAN_T2V_1_3B = WanDiTConfig(dim=1536, in_dim=16, ffn_dim=8960, out_dim=16,
                            num_heads=12, num_layers=30)
WAN_T2V_14B = WanDiTConfig(dim=5120, in_dim=16, ffn_dim=13824, out_dim=16,
                           num_heads=40, num_layers=40)
WAN_I2V_14B = WanDiTConfig(dim=5120, in_dim=36, ffn_dim=13824, out_dim=16,
                           num_heads=40, num_layers=40, has_image_input=True)
WAN_TI2V_5B = WanDiTConfig(dim=3072, in_dim=48, ffn_dim=14336, out_dim=48,
                           num_heads=24, num_layers=30, seperated_timestep=True,
                           require_clip_embedding=False, require_vae_embedding=False,
                           fuse_vae_embedding_in_latents=True)
# Tiny config for CPU-runnable tests. head_dim must split into even RoPE
# bands (head_dim % 16 == 0 covers all real configs; 48 -> 16/16/16).
WAN_DIT_TINY = WanDiTConfig(dim=96, in_dim=16, ffn_dim=256, out_dim=16,
                            num_heads=2, num_layers=2, text_dim=64, freq_dim=32)


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------

def _init_attn(key, dim: int, cross_image: bool = False, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    p = {
        "q": init_linear(ks[0], dim, dim, dtype=dtype),
        "k": init_linear(ks[1], dim, dim, dtype=dtype),
        "v": init_linear(ks[2], dim, dim, dtype=dtype),
        "o": init_linear(ks[3], dim, dim, dtype=dtype),
        "norm_q": init_rms_norm(dim, dtype),
        "norm_k": init_rms_norm(dim, dtype),
    }
    if cross_image:
        p["k_img"] = init_linear(ks[4], dim, dim, dtype=dtype)
        p["v_img"] = init_linear(ks[5], dim, dim, dtype=dtype)
        p["norm_k_img"] = init_rms_norm(dim, dtype)
    return p


def init_dit_block(key, cfg: WanDiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    return {
        "self_attn": _init_attn(ks[0], cfg.dim, dtype=dtype),
        "cross_attn": _init_attn(ks[1], cfg.dim, cross_image=cfg.has_image_input, dtype=dtype),
        "norm3": init_layer_norm(cfg.dim, dtype=dtype),
        "ffn": {
            "fc1": init_linear(ks[2], cfg.dim, cfg.ffn_dim, dtype=dtype),
            "fc2": init_linear(ks[3], cfg.ffn_dim, cfg.dim, dtype=dtype),
        },
        "modulation": (jax.random.normal(ks[4], (1, 6, cfg.dim), jnp.float32)
                       / math.sqrt(cfg.dim)).astype(dtype),
    }


def init_wan_dit(key, cfg: WanDiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8 + cfg.num_layers)
    pt, ph, pw = cfg.patch_size
    params = {
        "patch_embedding": init_linear(ks[0], cfg.in_dim * pt * ph * pw, cfg.dim, dtype=dtype),
        "text_embedding": {
            "fc1": init_linear(ks[1], cfg.text_dim, cfg.dim, dtype=dtype),
            "fc2": init_linear(ks[2], cfg.dim, cfg.dim, dtype=dtype),
        },
        "time_embedding": {
            "fc1": init_linear(ks[3], cfg.freq_dim, cfg.dim, dtype=dtype),
            "fc2": init_linear(ks[4], cfg.dim, cfg.dim, dtype=dtype),
        },
        "time_projection": init_linear(ks[5], cfg.dim, cfg.dim * 6, dtype=dtype),
        "head": {
            "head": init_linear(ks[6], cfg.dim, cfg.out_dim * pt * ph * pw, dtype=dtype),
            "modulation": (jax.random.normal(ks[7], (1, 2, cfg.dim), jnp.float32)
                           / math.sqrt(cfg.dim)).astype(dtype),
        },
        "blocks": stack_blocks([
            init_dit_block(ks[8 + i], cfg, dtype) for i in range(cfg.num_layers)
        ]),
    }
    if cfg.has_image_input:
        ki = jax.random.split(ks[0], 3)
        img_emb = {
            "norm_in": init_layer_norm(1280, dtype=dtype),
            "fc1": init_linear(ki[0], 1280, 1280, dtype=dtype),
            "fc2": init_linear(ki[1], 1280, cfg.dim, dtype=dtype),
            "norm_out": init_layer_norm(cfg.dim, dtype=dtype),
        }
        if cfg.has_image_pos_emb:
            img_emb["emb_pos"] = jnp.zeros((1, 514, 1280), dtype)
        params["img_emb"] = img_emb
    if cfg.has_ref_conv:
        params["ref_conv"] = init_linear(jax.random.split(ks[1])[0], 16 * 2 * 2, cfg.dim, dtype=dtype)
    return params


def stack_blocks(block_list):
    """Stack per-layer param pytrees along a leading layer axis for lax.scan."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *block_list)


def slice_blocks(stacked, start: int, stop: int):
    return jax.tree_util.tree_map(lambda x: x[start:stop], stacked)


def num_blocks(stacked) -> int:
    return jax.tree_util.tree_leaves(stacked)[0].shape[0]


# --------------------------------------------------------------------------
# Forward pieces
# --------------------------------------------------------------------------

def _split_mod(modulation, t_mod, n: int):
    """(1, n, D) table + t_mod -> n broadcastable (B, 1, D) or (B, S, D) terms.

    Handles both the per-batch t_mod (B, n, D) and the per-token variant
    (B, S, n, D) used with seperated_timestep (wan_video_dit.py:214-224).
    """
    if t_mod.ndim == 3:
        mod = modulation.astype(t_mod.dtype) + t_mod          # (B, n, D)
        return [mod[:, i][:, None, :] for i in range(n)]      # (B, 1, D)
    mod = modulation[:, None].astype(t_mod.dtype) + t_mod     # (B, S, n, D)
    return [mod[:, :, i] for i in range(n)]                   # (B, S, D)


def self_attention(p, x, cos, sin, num_heads: int, eps: float = 1e-6,
                   seq_valid: Optional[int] = None):
    b, s, d = x.shape
    int4 = ("w_q4" in p["q"]
            and p["q"]["w_scale"].ndim == p["q"]["w_q4"].ndim)
    if int4 or ("w_q" in p["q"] and p["q"]["w_q"].dtype == jnp.int8):
        # one activation quantize + one fused (S,in)@(in,3out) MXU call;
        # int4 (w4a8) unpacks its nibbles to int8 first (block-local
        # transient, resident HBM stays packed)
        from ..ops.quant import dequant_int4_leaf, fused_qkv_int8
        pq, pk, pv = p["q"], p["k"], p["v"]
        if int4:
            pq, pk, pv = (dequant_int4_leaf(pq), dequant_int4_leaf(pk),
                          dequant_int4_leaf(pv))
        q0, k0, v = fused_qkv_int8(pq, pk, pv, x)
    else:
        q0 = linear(p["q"], x)
        k0 = linear(p["k"], x)
        v = linear(p["v"], x)
    # RMSNorm + RoPE in one fused Pallas pass on TPU (saves ~13 ms/block of
    # elementwise HBM round-trips at the 14B shape); identical composition
    # elsewhere
    q, k = fused_rmsnorm_rope(q0, k0, p["norm_q"]["scale"],
                              p["norm_k"]["scale"], cos, sin, eps)
    v = v.reshape(b, s, num_heads, d // num_heads)
    # Ulysses in GSPMD form: reshard seq-sharded tokens to head-sharded for
    # full-sequence attention (XLA emits the all_to_alls over ICI), then back.
    q = constrain(q, "dp", None, "sp", None)
    k = constrain(k, "dp", None, "sp", None)
    v = constrain(v, "dp", None, "sp", None)
    # seq_valid masks mesh-divisibility zero-padding exactly: padded rows
    # never contribute as keys, so the padded+sharded output equals the
    # unpadded single-device one (padded QUERY rows are garbage and are
    # sliced off after the head)
    out = attention(q, k, v, kv_valid=seq_valid)
    out = constrain(out, "dp", None, "sp", None)
    return linear(p["o"], out.reshape(b, s, d))


def cross_attention(p, x, y, num_heads: int, eps: float = 1e-6,
                    has_image_input: bool = False):
    """Cross attention to text context; with image input the first 257 tokens
    of y are CLIP slots attended via separate K/V (wan_video_dit.py:171-186)."""
    b, s, d = x.shape
    if has_image_input:
        img, ctx = y[:, :257], y[:, 257:]
    else:
        ctx = y
    q = fused_rmsnorm(linear(p["q"], x), p["norm_q"]["scale"], eps)
    k = rms_norm(p["norm_k"], linear(p["k"], ctx), eps)
    v = linear(p["v"], ctx)
    nh = num_heads
    out = attention(q.reshape(b, s, nh, d // nh),
                    k.reshape(b, ctx.shape[1], nh, d // nh),
                    v.reshape(b, ctx.shape[1], nh, d // nh))
    x = out.reshape(b, s, d)
    if has_image_input:
        k_img = rms_norm(p["norm_k_img"], linear(p["k_img"], img), eps)
        v_img = linear(p["v_img"], img)
        out_img = attention(q.reshape(b, s, nh, d // nh),
                            k_img.reshape(b, 257, nh, d // nh),
                            v_img.reshape(b, 257, nh, d // nh))
        x = x + out_img.reshape(b, s, d)
    return linear(p["o"], x)


def ffn(p, x):
    return linear(p["fc2"], gelu_tanh(linear(p["fc1"], x)))


def dit_block(p, x, context, t_mod, cos, sin, cfg: WanDiTConfig,
              seq_valid: Optional[int] = None):
    """One DiT block (wan_video_dit.py:196-230).

    The LayerNorm+modulate chains deliberately stay XLA ops: a fused Pallas
    LN+affine kernel measured 5.90 ms vs XLA's 5.44 ms at the 14B shape
    (29,640 x 5120) — XLA already fuses the norm with the modulate epilogue.
    The Q/K RMSNorm+RoPE chain, by contrast, is fused (see self_attention).

    seq_valid: static true token count when x carries mesh-divisibility
    padding — threaded into self-attention so padded keys are masked at
    EVERY layer (padded rows hold garbage after layer 1; without per-layer
    masking they would contaminate real tokens).
    """
    x = constrain(x, "dp", "sp", None)
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
        _split_mod(p["modulation"], t_mod, 6)
    h = modulate(layer_norm({}, x, cfg.eps), shift_msa, scale_msa)
    x = x + gate_msa * self_attention(p["self_attn"], h, cos, sin,
                                      cfg.num_heads, cfg.eps, seq_valid)
    x = x + cross_attention(p["cross_attn"], layer_norm(p["norm3"], x, cfg.eps),
                            context, cfg.num_heads, cfg.eps, cfg.has_image_input)
    h = modulate(layer_norm({}, x, cfg.eps), shift_mlp, scale_mlp)
    x = x + gate_mlp * ffn(p["ffn"], h)
    return x


def run_blocks(blocks, x, context, t_mod, cos, sin, cfg: WanDiTConfig,
               vace_hints=None, vace_layers: Optional[Tuple[int, ...]] = None,
               vace_scale: float = 1.0, remat: bool = False,
               segment_layers: Optional[Tuple[int, ...]] = None,
               segment_callback=None, seq_valid: Optional[int] = None,
               layer_gate=None):
    """Run the block stack with lax.scan over stacked weights.

    Two per-layer injection mechanisms, both via segmented scans:
    - VACE hints added after mapped layers (wan_video_new.py:1444-1450)
    - a general `segment_callback(seg_idx, x) -> x` after each layer in
      `segment_layers` (Animate face blocks, wan_video_animate_adapter
      after_transformer_block every 5th layer)

    layer_gate: optional (num_layers, B) array. Each layer's residual update
    is scaled by its gate — gate 0 makes the block an exact identity for
    that batch row. This is the skip-layer-guidance mechanism (the ComfyUI
    WanVideoSLG node in /root/reference/ditto_comfyui_workflow.json: skip
    configured blocks on the unconditional CFG branch for a step window),
    expressed as data instead of control flow so one compiled scan serves
    every (step, branch) combination.
    """
    body = dit_block
    if remat:
        body = jax.checkpoint(body, static_argnums=(6, 7))

    if layer_gate is None:
        def scan_fn(carry, layer_p):
            return body(layer_p, carry, context, t_mod, cos, sin, cfg,
                        seq_valid), None
    else:
        def scan_fn(carry, xs):
            layer_p, g = xs
            y = body(layer_p, carry, context, t_mod, cos, sin, cfg,
                     seq_valid)
            g = g.astype(carry.dtype)[:, None, None]  # (B,) -> (B, 1, 1)
            return carry + g * (y - carry), None

    def _xs(blks, start=None, stop=None):
        if start is not None:
            blks = slice_blocks(blks, start, stop)
        if layer_gate is None:
            return blks
        return (blks, layer_gate if start is None
                else layer_gate[start:stop])

    n = num_blocks(blocks)
    if segment_layers is None and (vace_hints is None or vace_layers is None):
        x, _ = jax.lax.scan(scan_fn, x, _xs(blocks))
        return x

    if segment_layers is None:
        segment_layers = vace_layers

        def segment_callback(i, x):  # noqa: default VACE hint injection
            # scale cast to x.dtype: a strong-f32 scalar would promote the
            # whole trunk to f32 from this layer on (2x HBM + compute)
            return x + vace_hints[i].astype(x.dtype) * \
                jnp.asarray(vace_scale, x.dtype)

    start = 0
    for i, layer in enumerate(segment_layers):
        x, _ = jax.lax.scan(scan_fn, x, _xs(blocks, start, layer + 1))
        x = segment_callback(i, x)
        start = layer + 1
    if start < n:
        x, _ = jax.lax.scan(scan_fn, x, _xs(blocks, start, n))
    return x


def pad_tokens_for_mesh(tokens, cos, sin):
    """Pad (B, S, D) tokens plus their (S, d/2) RoPE tables so S divides the
    active mesh's sp axis — the reference's chunk+pad before rank-slicing
    (xdit_context_parallel.py:76-80, pad_freqs :16-25), done once up front
    under GSPMD.

    Returns (tokens, cos, sin, seq_valid) where seq_valid is the original S
    (None when no padding was needed — callers skip masking/unpad entirely).
    Token pad is zeros; cos pads with 1 and sin with 0 (identity rotation)
    so the fused RMSNorm+RoPE kernel stays NaN-free on garbage rows.
    """
    s = tokens.shape[1]
    from ..parallel.context import seq_pad_amount
    pad = seq_pad_amount(s, "sp")
    if pad == 0:
        return tokens, cos, sin, None
    tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))
    cos = jnp.pad(cos, ((0, pad), (0, 0)), constant_values=1.0)
    sin = jnp.pad(sin, ((0, pad), (0, 0)))
    return tokens, cos, sin, s


def patchify(p, x, patch_size: Tuple[int, int, int]):
    """Conv3d(stride=kernel=patch) as rearrange + matmul — MXU-friendly.

    x: (B, C, F, H, W) -> tokens (B, f*h*w, dim) plus the (f, h, w) grid.
    """
    pt, ph, pw = patch_size
    b, c, F, H, W = x.shape
    f, h, w = F // pt, H // ph, W // pw
    tokens = rearrange(x, "b c (f pt) (h ph) (w pw) -> b (f h w) (c pt ph pw)",
                       pt=pt, ph=ph, pw=pw)
    return linear(p, tokens), (f, h, w)


def unpatchify(x, grid: Tuple[int, int, int], patch_size: Tuple[int, int, int],
               out_dim: int):
    """(B, f*h*w, pt*ph*pw*c) -> (B, c, F, H, W) with the reference
    (x y z c) flatten order (wan_video_dit.py:347-352)."""
    f, h, w = grid
    pt, ph, pw = patch_size
    return rearrange(x, "b (f h w) (pt ph pw c) -> b c (f pt) (h ph) (w pw)",
                     f=f, h=h, w=w, pt=pt, ph=ph, pw=pw, c=out_dim)


def time_embed(params, cfg: WanDiTConfig, timestep):
    """timestep (B,) or (S,) -> (t, t_mod)."""
    emb = sinusoidal_embedding_1d(cfg.freq_dim, timestep.astype(jnp.float32))
    fc1 = params["time_embedding"]["fc1"]
    emb = emb.astype(fc1["w"].dtype if "w" in fc1 else jnp.bfloat16)
    t = linear(params["time_embedding"]["fc2"],
               silu(linear(params["time_embedding"]["fc1"], emb)))
    t_mod = linear(params["time_projection"], silu(t))
    t_mod = t_mod.reshape(t_mod.shape[:-1] + (6, cfg.dim))
    return t, t_mod


def text_embed(params, context):
    p = params["text_embedding"]
    return linear(p["fc2"], gelu_tanh(linear(p["fc1"], context)))


def img_embed(params, clip_feature):
    """CLIP image feature MLP (wan_video_dit.py:233-250)."""
    p = params["img_emb"]
    x = clip_feature
    if "emb_pos" in p:
        x = x + p["emb_pos"].astype(x.dtype)
    x = layer_norm(p["norm_in"], x, eps=1e-5)
    x = linear(p["fc1"], x)
    x = gelu_exact_ref(x)
    x = linear(p["fc2"], x)
    return layer_norm(p["norm_out"], x, eps=1e-5)


def gelu_exact_ref(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def head(params, cfg: WanDiTConfig, x, t):
    """Modulated output head (wan_video_dit.py:253-269)."""
    p = params["head"]
    if t.ndim == 3:
        mod = p["modulation"][:, None].astype(t.dtype) + t[:, :, None]
        shift, scale = mod[:, :, 0], mod[:, :, 1]
    else:
        mod = p["modulation"].astype(t.dtype) + t[:, None, :]
        shift, scale = mod[:, 0][:, None, :], mod[:, 1][:, None, :]
    x = layer_norm({}, x, cfg.eps) * (1 + scale) + shift
    return linear(p["head"], x)


def wan_dit_forward(
    params,
    cfg: WanDiTConfig,
    x,
    timestep,
    context,
    clip_feature=None,
    y=None,
    rope_indices=None,
    vace_params=None,
    vace_cfg=None,
    vace_context=None,
    vace_scale: float = 1.0,
    remat: bool = False,
    layer_gate=None,
):
    """Full DiT forward (wan_video_dit.py:354-418), optionally with the VACE
    branch fused in (as model_fn_wan_video does at wan_video_new.py:1404-1450).

    x: (B, C, F, H, W) latents; timestep: (B,); context: (B, L, text_dim).
    layer_gate: optional (num_layers, B) skip-layer-guidance gate (see
    run_blocks).
    """
    t, t_mod = time_embed(params, cfg, timestep)
    context = text_embed(params, context)

    if cfg.has_image_input:
        x = jnp.concatenate([x, y], axis=1)
        clip_emb = img_embed(params, clip_feature)
        context = jnp.concatenate([clip_emb, context], axis=1)

    tokens, (f, h, w) = patchify(params["patch_embedding"], x, cfg.patch_size)
    cos, sin = assemble_freqs_grid(cfg.head_dim, f, h, w, rope_indices)
    tokens, cos, sin, seq_valid = pad_tokens_for_mesh(tokens, cos, sin)
    tokens = constrain(tokens, "dp", "sp", None)

    vace_hints = None
    vace_layers = None
    if vace_params is not None and vace_context is not None:
        from .wan_vace import vace_forward
        vace_hints = vace_forward(vace_params, vace_cfg, tokens, vace_context,
                                  context, t_mod, cos, sin,
                                  seq_valid=seq_valid)
        vace_layers = vace_cfg.vace_layers

    tokens = run_blocks(params["blocks"], tokens, context, t_mod, cos, sin, cfg,
                        vace_hints=vace_hints, vace_layers=vace_layers,
                        vace_scale=vace_scale, remat=remat,
                        seq_valid=seq_valid, layer_gate=layer_gate)
    tokens = head(params, cfg, tokens, t)
    if seq_valid is not None:
        tokens = tokens[:, :seq_valid]
    return unpatchify(tokens, (f, h, w), cfg.patch_size, cfg.out_dim)
