"""OmniGen: a Phi-3 LLM as the diffusion backbone, TPU-native.

Re-design of the reference OmniGenTransformer
(/root/reference/diffsynth/models/omnigen.py:326-795): image latents are
patchified and appended after [text tokens | time token]; a 32-layer Phi-3
decoder (RMSNorm, fused qkv, LongRoPE su-scaled rotary, SiLU-gated MLP)
runs with a custom attention mask (causal text, bidirectional image); the
trailing image tokens go through a DiT-style adaLN final layer.

The KV-cache/offload machinery (omnigen.py:20-193) is a CUDA VRAM trick;
on TPU the whole [text|time|image] sequence runs in one fused forward.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, silu, init_linear
from ..ops.attention import sdpa
from .wan_dit import stack_blocks


@dataclass(frozen=True)
class OmniGenConfig:
    hidden_size: int = 3072
    num_heads: int = 32
    num_layers: int = 32
    intermediate_size: int = 8192
    vocab_size: int = 32064
    rms_eps: float = 1e-5
    rope_theta: float = 10000.0
    original_max_pos: int = 4096
    max_pos: int = 131072
    patch_size: int = 2
    in_channels: int = 4
    pos_embed_max_size: int = 192
    pe_interpolation: float = 1.0
    pos_base_size: int = 64

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


OMNIGEN = OmniGenConfig()
OMNIGEN_TINY = OmniGenConfig(hidden_size=32, num_heads=4, num_layers=2,
                             intermediate_size=64, vocab_size=64,
                             original_max_pos=32, max_pos=64,
                             pos_embed_max_size=8)


# -- positions ----------------------------------------------------------------

def get_2d_sincos_pos_embed(cfg: OmniGenConfig) -> np.ndarray:
    """(max^2, hidden) sincos table (omnigen.py:255-305): [sin|cos] per axis,
    h first."""
    n = cfg.pos_embed_max_size
    grid = np.arange(n, dtype=np.float32) / (n / cfg.pos_base_size) \
        / cfg.pe_interpolation
    gw, gh = np.meshgrid(grid, grid)        # "here w goes first"
    half = cfg.hidden_size // 2

    def emb_1d(pos):
        omega = 1.0 / 10000.0 ** (np.arange(half // 2, dtype=np.float64)
                                  / (half / 2.0))
        out = pos.reshape(-1)[:, None] * omega[None]
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    return np.concatenate([emb_1d(gw), emb_1d(gh)],
                          axis=1).astype(np.float32)


def cropped_pos_embed(cfg: OmniGenConfig, table: np.ndarray, height: int,
                      width: int) -> np.ndarray:
    """Center-crop of the max-size table (omnigen.py:427-448); latent-pixel
    height/width."""
    h, w = height // cfg.patch_size, width // cfg.patch_size
    n = cfg.pos_embed_max_size
    top, left = (n - h) // 2, (n - w) // 2
    t = table.reshape(n, n, -1)[top:top + h, left:left + w]
    return t.reshape(1, h * w, -1)


def longrope_tables(cfg: OmniGenConfig, positions: np.ndarray,
                    su_factor: Optional[np.ndarray] = None):
    """Phi-3 LongRoPE ("su") cos/sin for explicit position ids (B, L)."""
    d = cfg.head_dim
    inv = 1.0 / cfg.rope_theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
    if su_factor is not None:
        inv = inv / np.asarray(su_factor, np.float64)
    scale = cfg.max_pos / cfg.original_max_pos
    mag = 1.0 if scale <= 1.0 else math.sqrt(
        1.0 + math.log(scale) / math.log(cfg.original_max_pos))
    freqs = positions.astype(np.float64)[..., None] * inv   # (B, L, d/2)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return (np.cos(emb) * mag).astype(np.float32), \
        (np.sin(emb) * mag).astype(np.float32)


def _rot_half(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


# -- Phi-3 decoder ------------------------------------------------------------

def _rms(p, x, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


def phi3_block(p, x, cos, sin, mask, cfg: OmniGenConfig):
    b, s, d = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    h = _rms(p["ln1"], x, cfg.rms_eps)
    qkv = linear(p["qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, n, hd)
    k = k.reshape(b, s, n, hd)
    v = v.reshape(b, s, n, hd)
    c = cos[:, :, None].astype(jnp.float32)
    sn = sin[:, :, None].astype(jnp.float32)
    q = (q.astype(jnp.float32) * c + _rot_half(q.astype(jnp.float32)) * sn
         ).astype(x.dtype)
    k = (k.astype(jnp.float32) * c + _rot_half(k.astype(jnp.float32)) * sn
         ).astype(x.dtype)
    a = sdpa(q, k, v, bias=mask).reshape(b, s, d)
    x = x + linear(p["o"], a)
    h = _rms(p["ln2"], x, cfg.rms_eps)
    gu = linear(p["gate_up"], h)
    gate, up = jnp.split(gu, 2, axis=-1)
    return x + linear(p["down"], silu(gate) * up)


def omnigen_forward(params, cfg: OmniGenConfig, x, timestep, input_ids,
                    input_img_latents, input_image_sizes, attention_mask,
                    position_ids=None, su_factor=None, cos=None, sin=None):
    """OmniGenTransformer.forward (omnigen.py:717-758).

    x (B, 4, H, W) noisy latents; input_ids (B, L_text) or None;
    input_img_latents: list of (1, 4, h, w) reference latents spliced into
    the text embedding at input_image_sizes[b] = [(start, end), ...];
    attention_mask (B, S, S) {0,1}; position_ids (B, S) host numpy.
    """
    dtype = x.dtype
    b = x.shape[0]
    height, width = x.shape[-2:]
    table = params["pos_embed"]
    ps = cfg.patch_size

    def patchify(lat, embedder):
        hh, ww = lat.shape[-2:]
        g_h, g_w = hh // ps, ww // ps
        p = lat.reshape(lat.shape[0], cfg.in_channels, g_h, ps, g_w, ps)
        p = p.transpose(0, 2, 4, 1, 3, 5).reshape(lat.shape[0], g_h * g_w, -1)
        tok = linear(embedder, p)
        return tok + jnp.asarray(cropped_pos_embed(cfg, table, hh, ww),
                                 dtype)

    tokens = patchify(x, params["x_embedder"])
    num_tokens = tokens.shape[1]

    def t_embed(emb_p, t):
        half = 128
        freqs = np.exp(-math.log(10000) * np.arange(half, dtype=np.float32)
                       / half)
        args = t.astype(jnp.float32)[:, None] * freqs[None]
        te = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1
                             ).astype(dtype)
        return linear(emb_p["fc2"], silu(linear(emb_p["fc1"], te)))

    time_token = t_embed(params["time_token"], timestep)[:, None]

    if input_ids is not None:
        cond = params["embed_tokens"][input_ids].astype(dtype)
        input_image_sizes = dict(input_image_sizes or {})
        if input_img_latents:
            img_idx = 0
            for b_inx in input_image_sizes:
                for start, end in input_image_sizes[b_inx]:
                    ref = patchify(input_img_latents[img_idx],
                                   params["input_x_embedder"])
                    cond = jax.lax.dynamic_update_slice(
                        cond, ref.astype(dtype), (b_inx, start, 0))
                    img_idx += 1
        h = jnp.concatenate(
            [cond, jnp.broadcast_to(time_token, (cond.shape[0], 1,
                                                 cfg.hidden_size)),
             jnp.broadcast_to(tokens, (cond.shape[0],) + tokens.shape[1:])],
            axis=1)
    else:
        h = jnp.concatenate([time_token, tokens], axis=1)

    if cos is None:
        # host-side table build; pass cos/sin explicitly under jit
        cos, sin = longrope_tables(cfg, np.asarray(position_ids), su_factor)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    mask = jnp.where(attention_mask[:, None].astype(bool), 0.0,
                     -jnp.inf).astype(jnp.float32)

    def scan_fn(carry, layer_p):
        return phi3_block(layer_p, carry, cos, sin, mask, cfg), None

    h, _ = jax.lax.scan(scan_fn, h, params["blocks"])
    h = _rms(params["final_norm"], h, cfg.rms_eps)

    img = h[:, -num_tokens:]
    temb = t_embed(params["t_embedder"], timestep)
    m = linear(params["final_adaln"], silu(temb.astype(jnp.float32)
                                           ).astype(dtype))
    shift, scale = jnp.split(m, 2, axis=1)
    from ..ops.basic import layer_norm
    img = layer_norm({}, img, 1e-6) * (1 + scale[:, None]) + shift[:, None]
    img = linear(params["final_linear"], img)

    g_h, g_w = height // ps, width // ps
    img = img.reshape(b, g_h, g_w, ps, ps, cfg.in_channels)
    img = img.transpose(0, 5, 1, 3, 2, 4).reshape(b, cfg.in_channels, height,
                                                  width)
    return img


# -- init / convert -----------------------------------------------------------

def init_omnigen(key, cfg: OmniGenConfig, dtype=jnp.float32):
    d = cfg.hidden_size
    ks = iter(jax.random.split(key, 12 + 4 * cfg.num_layers))
    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append({
            "ln1": {"scale": jnp.ones((d,), dtype)},
            "qkv": init_linear(next(ks), d, 3 * d, bias=False, dtype=dtype),
            "o": init_linear(next(ks), d, d, bias=False, dtype=dtype),
            "ln2": {"scale": jnp.ones((d,), dtype)},
            "gate_up": init_linear(next(ks), d, 2 * cfg.intermediate_size,
                                   bias=False, dtype=dtype),
            "down": init_linear(next(ks), cfg.intermediate_size, d,
                                bias=False, dtype=dtype),
        })
    patch_in = cfg.in_channels * cfg.patch_size ** 2
    return {
        "embed_tokens": (jax.random.normal(next(ks), (cfg.vocab_size, d))
                         * 0.02).astype(dtype),
        "x_embedder": init_linear(next(ks), patch_in, d, dtype=dtype),
        "input_x_embedder": init_linear(next(ks), patch_in, d, dtype=dtype),
        "time_token": {"fc1": init_linear(next(ks), 256, d, dtype=dtype),
                       "fc2": init_linear(next(ks), d, d, dtype=dtype)},
        "t_embedder": {"fc1": init_linear(next(ks), 256, d, dtype=dtype),
                       "fc2": init_linear(next(ks), d, d, dtype=dtype)},
        "pos_embed": get_2d_sincos_pos_embed(cfg),
        "blocks": stack_blocks(blocks),
        "final_norm": {"scale": jnp.ones((d,), dtype)},
        "final_adaln": init_linear(next(ks), d, 2 * d, dtype=dtype),
        "final_linear": init_linear(
            next(ks), d, cfg.patch_size ** 2 * cfg.in_channels, dtype=dtype),
    }


def _np(v):
    return np.asarray(v.detach().float().cpu().numpy()
                      if hasattr(v, "detach") else v, np.float32)


def _lin(sd, key, dtype):
    p = {"w": jnp.asarray(_np(sd[f"{key}.weight"]).T, dtype)}
    if f"{key}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{key}.bias"]), dtype)
    return p


def convert_omnigen(sd, cfg: OmniGenConfig = OMNIGEN, dtype=jnp.bfloat16):
    """OmniGen checkpoint (llm.* Phi-3 + embedders) -> pytree."""
    blocks = []
    for i in range(cfg.num_layers):
        p = f"llm.layers.{i}"
        blocks.append({
            "ln1": {"scale": jnp.asarray(
                _np(sd[f"{p}.input_layernorm.weight"]), dtype)},
            "qkv": _lin(sd, f"{p}.self_attn.qkv_proj", dtype),
            "o": _lin(sd, f"{p}.self_attn.o_proj", dtype),
            "ln2": {"scale": jnp.asarray(
                _np(sd[f"{p}.post_attention_layernorm.weight"]), dtype)},
            "gate_up": _lin(sd, f"{p}.mlp.gate_up_proj", dtype),
            "down": _lin(sd, f"{p}.mlp.down_proj", dtype),
        })
    conv = _np(sd["x_embedder.proj.weight"])
    conv_i = _np(sd["input_x_embedder.proj.weight"])
    return {
        "embed_tokens": jnp.asarray(_np(sd["llm.embed_tokens.weight"]), dtype),
        "x_embedder": {
            "w": jnp.asarray(conv.reshape(conv.shape[0], -1).T, dtype),
            "b": jnp.asarray(_np(sd["x_embedder.proj.bias"]), dtype)},
        "input_x_embedder": {
            "w": jnp.asarray(conv_i.reshape(conv_i.shape[0], -1).T, dtype),
            "b": jnp.asarray(_np(sd["input_x_embedder.proj.bias"]), dtype)},
        "time_token": {"fc1": _lin(sd, "time_token.mlp.0", dtype),
                       "fc2": _lin(sd, "time_token.mlp.2", dtype)},
        "t_embedder": {"fc1": _lin(sd, "t_embedder.mlp.0", dtype),
                       "fc2": _lin(sd, "t_embedder.mlp.2", dtype)},
        "pos_embed": (_np(sd["pos_embed"])[0] if "pos_embed" in sd
                      else get_2d_sincos_pos_embed(cfg)),
        "blocks": stack_blocks(blocks),
        "final_norm": {"scale": jnp.asarray(_np(sd["llm.norm.weight"]),
                                            dtype)},
        "final_adaln": _lin(sd, "final_layer.adaLN_modulation.1", dtype),
        "final_linear": _lin(sd, "final_layer.linear", dtype),
    }


# OmniGen ships the Phi-3-128k su factors (omnigen.py:601-700); sequences in
# image generation stay far below original_max_pos, so the short factor
# applies.
PHI3_SU_SHORT = np.asarray(
    [1.05, 1.05, 1.05, 1.1, 1.1, 1.1, 1.2500000000000002, 1.2500000000000002,
     1.4000000000000004, 1.4500000000000004, 1.5500000000000005,
     1.8500000000000008, 1.9000000000000008] + [2.000000000000001] * 19
    + [2.1000000000000005, 2.1000000000000005, 2.2, 2.3499999999999996,
       2.3499999999999996, 2.3499999999999996, 2.3499999999999996,
       2.3999999999999995, 2.3999999999999995, 2.6499999999999986,
       2.6999999999999984, 2.8999999999999977, 2.9499999999999975,
       3.049999999999997, 3.049999999999997, 3.049999999999997],
    np.float64)


def patchify_count(height: int, width: int) -> int:
    return (height // 16) * (width // 16)
