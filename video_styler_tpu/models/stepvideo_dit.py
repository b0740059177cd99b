"""StepVideo (Step-Video-T2V 30B) DiT, TPU-native.

Functional re-design of the reference StepVideoModel
(/root/reference/diffsynth/models/stepvideo_dit.py:746-927): 48 PixArt-style
blocks with a GLOBAL scale_shift_table + adaLN-single timestep modulation,
half-rotation 3-D RoPE split (64, 32, 32) over the head dim, joint
(LLM + CLIP) text conditioning with a kv attention mask, and per-frame 2-D
patchify. Blocks run under `jax.lax.scan`.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from ..ops.basic import linear, layer_norm, silu, gelu_tanh, init_linear
from ..ops.attention import attention, sdpa


@dataclass(frozen=True)
class StepVideoDiTConfig:
    num_heads: int = 48
    head_dim: int = 128
    num_layers: int = 48
    in_channels: int = 64
    out_channels: int = 64
    caption_dim: int = 6144
    clip_dim: int = 1024
    rope_split: Tuple[int, ...] = (64, 32, 32)
    eps: float = 1e-6

    @property
    def dim(self) -> int:
        return self.num_heads * self.head_dim


STEP_VIDEO = StepVideoDiTConfig()
STEP_VIDEO_TINY = StepVideoDiTConfig(num_heads=4, head_dim=32, num_layers=2,
                                     in_channels=64, out_channels=64,
                                     caption_dim=96, clip_dim=48,
                                     rope_split=(16, 8, 8))


# --------------------------------------------------------------------------
# RoPE: half-rotation (LLaMA convention), per-axis channel split
# (RoPE1D/RoPE3D, stepvideo_dit.py:366-449)
# --------------------------------------------------------------------------

def step_rope_tables(cfg: StepVideoDiTConfig, f: int, h: int, w: int):
    """-> list of (cos, sin) per axis chunk, each (S, D_i) with the
    [freqs | freqs] duplication the half-rotation expects."""
    tt, hh, ww = np.meshgrid(np.arange(f), np.arange(h), np.arange(w),
                             indexing="ij")
    mesh = np.stack([tt.ravel(), hh.ravel(), ww.ravel()], axis=-1)
    tables = []
    for i, d in enumerate(cfg.rope_split):
        inv = 1.0 / (1e4 ** (np.arange(0, d, 2, dtype=np.float32) / d))
        pos = mesh[:, i].astype(np.float32)
        freqs = np.einsum("i,j->ij", pos, inv)
        freqs = np.concatenate([freqs, freqs], axis=-1)
        tables.append((np.cos(freqs).astype(np.float32),
                       np.sin(freqs).astype(np.float32)))
    return tables


def _rotate_half(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def step_rope_apply(x, tables, rope_split):
    """x: (B, S, N, D); per-chunk half rotation."""
    outs = []
    start = 0
    for (cos, sin), d in zip(tables, rope_split):
        xi = x[..., start:start + d]
        c = cos[None, :, None, :].astype(jnp.float32)
        s = sin[None, :, None, :].astype(jnp.float32)
        xf = xi.astype(jnp.float32)
        outs.append((xf * c + _rotate_half(xf) * s).astype(x.dtype))
        start += d
    return jnp.concatenate(outs, axis=-1)


# --------------------------------------------------------------------------
# Init / conversion
# --------------------------------------------------------------------------

def init_step_block(key, cfg: StepVideoDiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    d, hd = cfg.dim, cfg.head_dim
    rms = lambda: {"weight": jnp.ones((hd,), dtype)}
    return {
        "attn1": {"wqkv": init_linear(ks[0], d, 3 * d, bias=False, dtype=dtype),
                  "wo": init_linear(ks[1], d, d, bias=False, dtype=dtype),
                  "q_norm": rms(), "k_norm": rms()},
        "attn2": {"wq": init_linear(ks[2], d, d, bias=False, dtype=dtype),
                  "wkv": init_linear(ks[3], d, 2 * d, bias=False, dtype=dtype),
                  "wo": init_linear(ks[4], d, d, bias=False, dtype=dtype),
                  "q_norm": rms(), "k_norm": rms()},
        "ff": {"net": {"0": {"proj": init_linear(ks[5], d, 4 * d, bias=False,
                                                 dtype=dtype)},
                       "2": init_linear(ks[6], 4 * d, d, bias=False,
                                        dtype=dtype)}},
        "norm1": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "norm2": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "scale_shift_table": (jax.random.normal(ks[7], (6, d), jnp.float32)
                              / d ** 0.5).astype(dtype),
    }


def init_step_video_dit(key, cfg: StepVideoDiTConfig, dtype=jnp.float32):
    from .wan_dit import stack_blocks
    ks = jax.random.split(key, cfg.num_layers + 8)
    d = cfg.dim
    return {
        "pos_embed": {"proj": init_linear(ks[0], cfg.in_channels, d, dtype=dtype)},
        "adaln_single": {
            "emb": {"timestep_embedder": {
                "linear_1": init_linear(ks[1], 256, d, dtype=dtype),
                "linear_2": init_linear(ks[2], d, d, dtype=dtype)}},
            "linear": init_linear(ks[3], d, 6 * d, dtype=dtype)},
        "caption_projection": {
            "linear_1": init_linear(ks[4], cfg.caption_dim, d, dtype=dtype),
            "linear_2": init_linear(ks[5], d, d, dtype=dtype)},
        "clip_projection": init_linear(ks[6], cfg.clip_dim, d, dtype=dtype),
        "transformer_blocks": stack_blocks([
            init_step_block(ks[8 + i], cfg, dtype)
            for i in range(cfg.num_layers)]),
        "scale_shift_table": (jax.random.normal(ks[7], (2, d), jnp.float32)
                              / d ** 0.5).astype(dtype),
        "proj_out": init_linear(jax.random.fold_in(ks[7], 1), d,
                                cfg.out_channels, dtype=dtype),
    }


def convert_step_video_dit(sd, cfg: StepVideoDiTConfig = STEP_VIDEO,
                           dtype=jnp.bfloat16):
    def _j(v):
        if hasattr(v, "detach"):
            v = v.detach().float().cpu().numpy()
        return jnp.asarray(np.asarray(v), dtype)

    def lin(prefix):
        p = {"w": _j(sd[prefix + ".weight"]).T}
        if prefix + ".bias" in sd:
            p["b"] = _j(sd[prefix + ".bias"])
        return p

    from .wan_dit import stack_blocks

    def block(i):
        b = f"transformer_blocks.{i}"
        return {
            "attn1": {"wqkv": lin(f"{b}.attn1.wqkv"),
                      "wo": lin(f"{b}.attn1.wo"),
                      "q_norm": {"weight": _j(sd[f"{b}.attn1.q_norm.weight"])},
                      "k_norm": {"weight": _j(sd[f"{b}.attn1.k_norm.weight"])}},
            "attn2": {"wq": lin(f"{b}.attn2.wq"),
                      "wkv": lin(f"{b}.attn2.wkv"),
                      "wo": lin(f"{b}.attn2.wo"),
                      "q_norm": {"weight": _j(sd[f"{b}.attn2.q_norm.weight"])},
                      "k_norm": {"weight": _j(sd[f"{b}.attn2.k_norm.weight"])}},
            "ff": {"net": {"0": {"proj": lin(f"{b}.ff.net.0.proj")},
                           "2": lin(f"{b}.ff.net.2")}},
            "norm1": {"scale": _j(sd[f"{b}.norm1.weight"]),
                      "bias": _j(sd[f"{b}.norm1.bias"])},
            "norm2": {"scale": _j(sd[f"{b}.norm2.weight"]),
                      "bias": _j(sd[f"{b}.norm2.bias"])},
            "scale_shift_table": _j(sd[f"{b}.scale_shift_table"]),
        }

    w = sd["pos_embed.proj.weight"]
    if hasattr(w, "detach"):
        w = w.detach().float().cpu().numpy()
    w = np.asarray(w)   # (D, C, 1, 1) for patch_size 1
    params = {
        "pos_embed": {"proj": {"w": jnp.asarray(w.reshape(w.shape[0], -1).T, dtype),
                               "b": _j(sd["pos_embed.proj.bias"])}},
        "adaln_single": {
            "emb": {"timestep_embedder": {
                "linear_1": lin("adaln_single.emb.timestep_embedder.linear_1"),
                "linear_2": lin("adaln_single.emb.timestep_embedder.linear_2")}},
            "linear": lin("adaln_single.linear")},
        "caption_projection": {
            "linear_1": lin("caption_projection.linear_1"),
            "linear_2": lin("caption_projection.linear_2")},
        "transformer_blocks": stack_blocks(
            [block(i) for i in range(cfg.num_layers)]),
        "scale_shift_table": _j(sd["scale_shift_table"]),
        "proj_out": lin("proj_out"),
    }
    if "clip_projection.weight" in sd:
        params["clip_projection"] = lin("clip_projection")
    return params


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _rms_head(p, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), -1, keepdims=True) + eps)
    return (y * p["weight"].astype(jnp.float32)).astype(x.dtype)


def step_block(p, x, kv, temb6, tables, kv_bias, cfg: StepVideoDiTConfig):
    """StepVideoTransformerBlock.forward (stepvideo_dit.py:678-713)."""
    nh, hd, d = cfg.num_heads, cfg.head_dim, cfg.dim
    mods = (p["scale_shift_table"][None].astype(jnp.float32)
            + temb6.reshape(-1, 6, d).astype(jnp.float32)).astype(x.dtype)
    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = [
        mods[:, i:i + 1] for i in range(6)]

    nx = layer_norm(p["norm1"], x, 1e-5) * (1 + sc_msa) + sh_msa
    qkv = linear(p["attn1"]["wqkv"], nx).reshape(x.shape[0], x.shape[1], nh,
                                                 3 * hd)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = _rms_head(p["attn1"]["q_norm"], q)
    k = _rms_head(p["attn1"]["k_norm"], k)
    q = step_rope_apply(q, tables, cfg.rope_split)
    k = step_rope_apply(k, tables, cfg.rope_split)
    out = attention(q, k, v).reshape(x.shape[0], x.shape[1], d)
    x = x + g_msa * linear(p["attn1"]["wo"], out)

    q = linear(p["attn2"]["wq"], x).reshape(x.shape[0], x.shape[1], nh, hd)
    kv2 = linear(p["attn2"]["wkv"], kv).reshape(kv.shape[0], kv.shape[1], nh,
                                                2 * hd)
    k2, v2 = jnp.split(kv2, 2, axis=-1)
    q = _rms_head(p["attn2"]["q_norm"], q)
    k2 = _rms_head(p["attn2"]["k_norm"], k2)
    out = sdpa(q, k2, v2, bias=kv_bias).reshape(x.shape[0], x.shape[1], d)
    x = x + linear(p["attn2"]["wo"], out)

    nx = layer_norm(p["norm2"], x, 1e-5) * (1 + sc_mlp) + sh_mlp
    h = gelu_tanh(linear(p["ff"]["net"]["0"]["proj"], nx))
    return x + g_mlp * linear(p["ff"]["net"]["2"], h)


def step_video_dit_forward(params, cfg: StepVideoDiTConfig, hidden_states,
                           timestep, encoder_hidden_states,
                           encoder_hidden_states_2=None,
                           encoder_attention_mask=None, remat: bool = False):
    """StepVideoModel.forward (stepvideo_dit.py:848-927).

    hidden_states: (B, F, C, H, W); timestep in [0, 1] (rescaled x1000);
    encoder_hidden_states: (B, L, 6144) LLM features;
    encoder_hidden_states_2: (B, L2, 1024) CLIP features."""
    from .flux_dit import timestep_embedding_flux
    B, F, C, H, W = hidden_states.shape
    dtype = hidden_states.dtype
    x = rearrange(hidden_states, "b f c h w -> b (f h w) c")
    x = linear(params["pos_embed"]["proj"], x)

    te = params["adaln_single"]["emb"]["timestep_embedder"]
    emb = timestep_embedding_flux(timestep * 1000.0, 256).astype(dtype)
    embedded_t = linear(te["linear_2"], silu(linear(te["linear_1"], emb)))
    temb6 = linear(params["adaln_single"]["linear"], silu(embedded_t))

    cp = params["caption_projection"]
    cap = layer_norm({}, encoder_hidden_states, cfg.eps)
    cap = linear(cp["linear_2"], gelu_tanh(linear(cp["linear_1"], cap)))
    if encoder_hidden_states_2 is not None and "clip_projection" in params:
        clip = linear(params["clip_projection"], encoder_hidden_states_2)
        cap = jnp.concatenate([clip, cap], axis=1)

    kv_bias = None
    if encoder_attention_mask is not None:
        m = encoder_attention_mask.astype(bool)
        kv_bias = jnp.where(m[:, None, None, :], 0.0,
                            jnp.finfo(jnp.float32).min)

    tables = [(jnp.asarray(c), jnp.asarray(s))
              for c, s in step_rope_tables(cfg, F, H, W)]

    def scan_fn(carry, bp):
        fn = step_block
        if remat:
            fn = jax.checkpoint(step_block, static_argnums=(6,))
        return fn(bp, carry, cap, temb6, tables, kv_bias, cfg), None

    x, _ = jax.lax.scan(scan_fn, x, params["transformer_blocks"])

    table = params["scale_shift_table"].astype(jnp.float32)
    sh, sc = jnp.split(
        (table[None] + embedded_t[:, None].astype(jnp.float32)).astype(dtype),
        2, axis=1)
    x = layer_norm({}, x, cfg.eps) * (1 + sc) + sh
    x = linear(params["proj_out"], x)
    return rearrange(x, "b (f h w) c -> b f c h w", f=F, h=H, w=W)
