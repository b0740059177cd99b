"""HunyuanVideo DiT, TPU-native.

Functional re-design of the reference HunyuanVideoDiT
(/root/reference/diffsynth/models/hunyuan_video_dit.py:589-661): a text token
refiner (2 gated self-attention blocks over masked LLaMA features), 20
double-stream blocks (separate img/txt weights, joint attention) and 40
single-stream blocks over the concatenated [img | txt] sequence, with
(16, 56, 56)-band interleaved RoPE at theta=256 over the (T, H/2, W/2) grid.

The reference's split-attention optimization is preserved exactly for
numerical parity: with a fixed padded text length, attention runs over
[img | txt[:split]] and [txt[split:]] separately
(MMDoubleStreamBlock.forward :462-474, MMSingleStreamBlock.forward :538-570),
exploiting that tokens past `split_token` are padding.

Both homogeneous stacks run under `jax.lax.scan` over stacked weights.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from ..ops.basic import linear, layer_norm, silu, gelu_tanh, init_linear, init_layer_norm
from ..ops.attention import attention
from .flux_dit import (timestep_embedding_flux, flux_rope_cos_sin,
                       rope_apply_interleaved, _mlp_embed, _rms, _heads)


@dataclass(frozen=True)
class HunyuanVideoDiTConfig:
    hidden_size: int = 3072
    num_heads: int = 24
    num_double_blocks: int = 20
    num_single_blocks: int = 40
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096
    pooled_dim: int = 768
    time_freq_dim: int = 256
    refiner_depth: int = 2
    rope_dims: Tuple[int, ...] = (16, 56, 56)
    theta: int = 256
    txt_len: int = 256
    split_token: int = 71
    guidance_embed: bool = True
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


HUNYUAN_VIDEO = HunyuanVideoDiTConfig()
HUNYUAN_VIDEO_TINY = HunyuanVideoDiTConfig(
    hidden_size=96, num_heads=4, num_double_blocks=2, num_single_blocks=2,
    text_dim=64, pooled_dim=32, rope_dims=(4, 10, 10), txt_len=8,
    split_token=3)


def hunyuan_rope(cfg: HunyuanVideoDiTConfig, t: int, h: int, w: int):
    """HunyuanVideoRope (hunyuan_video_dit.py:10-193): integer (T, H/2, W/2)
    grid, theta=256, per-axis bands; h/w are post-patchify grid dims."""
    tt, hh, ww = np.meshgrid(np.arange(t), np.arange(h), np.arange(w),
                             indexing="ij")
    ids = np.stack([tt.ravel(), hh.ravel(), ww.ravel()], axis=-1)
    return flux_rope_cos_sin(ids, cfg.rope_dims, cfg.theta)


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------

def _init_mlp(key, d_in, d_out, dtype):
    k1, k2 = jax.random.split(key)
    return {"fc1": init_linear(k1, d_in, d_out, dtype=dtype),
            "fc2": init_linear(k2, d_out, d_out, dtype=dtype)}


def init_refiner_block(key, cfg, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    d = cfg.hidden_size
    return {
        "norm1": init_layer_norm(d, dtype=dtype),
        "self_attn_qkv": init_linear(ks[0], d, 3 * d, dtype=dtype),
        "self_attn_proj": init_linear(ks[1], d, d, dtype=dtype),
        "norm2": init_layer_norm(d, dtype=dtype),
        "mlp": {"0": init_linear(ks[2], d, 4 * d, dtype=dtype),
                "2": init_linear(ks[3], 4 * d, d, dtype=dtype)},
        "adaLN_modulation": {"1": init_linear(ks[4], d, 2 * d, dtype=dtype)},
    }


def init_double_component(key, cfg, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    d, hd = cfg.hidden_size, cfg.head_dim
    return {
        "mod": {"linear": init_linear(ks[0], d, 6 * d, dtype=dtype)},
        "to_qkv": init_linear(ks[1], d, 3 * d, dtype=dtype),
        "norm_q": {"weight": jnp.ones((hd,), dtype)},
        "norm_k": {"weight": jnp.ones((hd,), dtype)},
        "to_out": init_linear(ks[2], d, d, dtype=dtype),
        "ff": {"0": init_linear(ks[3], d, 4 * d, dtype=dtype),
               "2": init_linear(ks[4], 4 * d, d, dtype=dtype)},
    }


def init_single_block(key, cfg, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    d, hd = cfg.hidden_size, cfg.head_dim
    return {
        "mod": {"linear": init_linear(ks[0], d, 3 * d, dtype=dtype)},
        "to_qkv": init_linear(ks[1], d, 3 * d, dtype=dtype),
        "norm_q": {"weight": jnp.ones((hd,), dtype)},
        "norm_k": {"weight": jnp.ones((hd,), dtype)},
        "to_out": init_linear(ks[2], d, d, dtype=dtype),
        "ff": {"0": init_linear(ks[3], d, 4 * d, dtype=dtype),
               "2": init_linear(ks[4], 4 * d, d, bias=False, dtype=dtype)},
    }


def init_hunyuan_video_dit(key, cfg: HunyuanVideoDiTConfig, dtype=jnp.float32):
    from .wan_dit import stack_blocks
    d = cfg.hidden_size
    pt, ph, pw = cfg.patch_size
    n = cfg.num_double_blocks + cfg.num_single_blocks + cfg.refiner_depth
    ks = jax.random.split(key, n + 10)
    params = {
        "img_in": {"proj": init_linear(
            ks[0], cfg.in_channels * pt * ph * pw, d, dtype=dtype)},
        "time_in": _init_mlp(ks[1], cfg.time_freq_dim, d, dtype),
        "vector_in": {"0": init_linear(ks[2], cfg.pooled_dim, d, dtype=dtype),
                      "2": init_linear(ks[3], d, d, dtype=dtype)},
        "txt_in": {
            "input_embedder": init_linear(ks[4], cfg.text_dim, d, dtype=dtype),
            "t_embedder": _init_mlp(ks[5], cfg.time_freq_dim, d, dtype),
            "c_embedder": {"0": init_linear(ks[6], cfg.text_dim, d, dtype=dtype),
                           "2": init_linear(ks[7], d, d, dtype=dtype)},
            "blocks": stack_blocks([
                init_refiner_block(ks[10 + i], cfg, dtype)
                for i in range(cfg.refiner_depth)]),
        },
        "double_blocks": stack_blocks([
            {"component_a": init_double_component(
                jax.random.fold_in(ks[10 + cfg.refiner_depth + i], 0), cfg, dtype),
             "component_b": init_double_component(
                jax.random.fold_in(ks[10 + cfg.refiner_depth + i], 1), cfg, dtype)}
            for i in range(cfg.num_double_blocks)]),
        "single_blocks": stack_blocks([
            init_single_block(
                ks[10 + cfg.refiner_depth + cfg.num_double_blocks + i], cfg, dtype)
            for i in range(cfg.num_single_blocks)]),
        "final_layer": {
            "norm_linear": init_linear(ks[8], d, 2 * d, dtype=dtype),
            "linear": init_linear(
                ks[9], d, pt * ph * pw * cfg.out_channels, dtype=dtype)},
    }
    if cfg.guidance_embed:
        kg = jax.random.split(ks[0], 2)[1]
        params["guidance_in"] = _init_mlp(kg, cfg.time_freq_dim, d, dtype)
    return params


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def token_refiner(p, cfg, x, t, mask):
    """SingleTokenRefiner (hunyuan_video_dit.py:242-272)."""
    t_emb = _mlp_embed(p["t_embedder"],
                       timestep_embedding_flux(t, cfg.time_freq_dim).astype(x.dtype))
    mask_f = mask.astype(jnp.float32)[..., None]
    pooled = jnp.sum(x.astype(jnp.float32) * mask_f, axis=1) / jnp.sum(mask_f, axis=1)
    c = t_emb + linear(p["c_embedder"]["2"],
                       silu(linear(p["c_embedder"]["0"], pooled.astype(x.dtype))))
    x = linear(p["input_embedder"], x)

    # pairwise mask (B, 1, L, L); column 0 always attendable (:265-268)
    m = mask.astype(bool)
    attn_mask = m[:, None, :, None] & m[:, None, None, :]
    attn_mask = attn_mask.at[:, :, :, 0].set(True)
    bias = jnp.where(attn_mask, 0.0, jnp.finfo(jnp.float32).min)

    def scan_fn(carry, bp):
        h = carry
        gates = linear(bp["adaLN_modulation"]["1"], silu(c))
        gate_msa, gate_mlp = jnp.split(gates[:, None, :], 2, axis=-1)
        nx = layer_norm(bp["norm1"], h, cfg.eps)
        q, k, v = jnp.split(_heads(linear(bp["self_attn_qkv"], nx),
                                   3 * cfg.num_heads), 3, axis=2)
        from ..ops.attention import sdpa
        att = sdpa(q, k, v, bias=bias).reshape(h.shape)
        h = h + linear(bp["self_attn_proj"], att) * gate_msa
        nx = layer_norm(bp["norm2"], h, cfg.eps)
        h = h + linear(bp["mlp"]["2"], silu(linear(bp["mlp"]["0"], nx))) * gate_mlp
        return h, None

    x, _ = jax.lax.scan(scan_fn, x, p["blocks"])
    return x


def _mod3(p, vec, x, eps):
    sh, sc, gate = jnp.split(linear(p["linear"], silu(vec))[:, None, :], 3, -1)
    return layer_norm({}, x, eps) * (1 + sc) + sh, gate


def _double_component_qkv(p, x, vec, cfg, cos=None, sin=None):
    """MMDoubleStreamBlockComponent.forward (:432-448)."""
    mods = jnp.split(linear(p["mod"]["linear"], silu(vec))[:, None, :], 6, -1)
    sh1, sc1, g1, sh2, sc2, g2 = mods
    nx = layer_norm({}, x, cfg.eps) * (1 + sc1) + sh1
    q, k, v = jnp.split(_heads(linear(p["to_qkv"], nx), 3 * cfg.num_heads),
                        3, axis=2)
    q = _rms(p["norm_q"], q, cfg.eps)
    k = _rms(p["norm_k"], k, cfg.eps)
    if cos is not None:
        q = rope_apply_interleaved(q, cos, sin)
        k = rope_apply_interleaved(k, cos, sin)
    return (q, k, v), (g1, sh2, sc2, g2)


def _double_component_ff(p, x, attn_out, mod, cfg):
    g1, sh2, sc2, g2 = mod
    x = x + linear(p["to_out"], attn_out) * g1
    nx = layer_norm({}, x, cfg.eps) * (1 + sc2) + sh2
    return x + linear(p["ff"]["2"], gelu_tanh(linear(p["ff"]["0"], nx))) * g2


def _split_attention(q_a, k_a, q_b, k_b, v1, v2, split, dim):
    """The reference's padded-text split: joint attention over
    [stream_a | b[:split]] (values v1) and separately over b[split:]
    (values v2). Returns (out over stream_a, out over all of b)."""
    q1 = jnp.concatenate([q_a, q_b[:, :split]], axis=1)
    k1 = jnp.concatenate([k_a, k_b[:, :split]], axis=1)
    out1 = attention(q1, k1, v1).reshape(q1.shape[0], q1.shape[1], dim)
    out2 = attention(q_b[:, split:], k_b[:, split:], v2)
    out2 = out2.reshape(out2.shape[0], out2.shape[1], dim)
    n_a = q_a.shape[1]
    return out1[:, :n_a], jnp.concatenate([out1[:, n_a:], out2], axis=1)


def double_block(p, img, txt, vec, cos, sin, cfg):
    """MMDoubleStreamBlock.forward (:462-476)."""
    (q_a, k_a, v_a), mod_a = _double_component_qkv(p["component_a"], img, vec,
                                                   cfg, cos, sin)
    (q_b, k_b, v_b), mod_b = _double_component_qkv(p["component_b"], txt, vec,
                                                   cfg)
    v1 = jnp.concatenate([v_a, v_b[:, :cfg.split_token]], axis=1)
    v2 = v_b[:, cfg.split_token:]
    out_a, out_b = _split_attention(q_a, k_a, q_b, k_b, v1, v2,
                                    cfg.split_token, cfg.hidden_size)
    img = _double_component_ff(p["component_a"], img, out_a, mod_a, cfg)
    txt = _double_component_ff(p["component_b"], txt, out_b, mod_b, cfg)
    return img, txt


def single_block(p, x, vec, cos, sin, cfg):
    """MMSingleStreamBlock.forward (:538-570)."""
    nx, gate = _mod3(p["mod"], vec, x, cfg.eps)
    q, k, v = jnp.split(_heads(linear(p["to_qkv"], nx), 3 * cfg.num_heads),
                        3, axis=2)
    q = _rms(p["norm_q"], q, cfg.eps)
    k = _rms(p["norm_k"], k, cfg.eps)
    L = cfg.txt_len
    q_a, q_b = q[:, :-L], q[:, -L:]
    k_a, k_b = k[:, :-L], k[:, -L:]
    q_a = rope_apply_interleaved(q_a, cos, sin)
    k_a = rope_apply_interleaved(k_a, cos, sin)
    v1 = v[:, :-(L - cfg.split_token)]       # img + split txt tokens
    v2 = v[:, -(L - cfg.split_token):]
    out_a, out_b = _split_attention(q_a, k_a, q_b, k_b, v1, v2,
                                    cfg.split_token, cfg.hidden_size)
    out = jnp.concatenate([out_a, out_b], axis=1)
    x = x + linear(p["to_out"], out) * gate
    x = x + linear(p["ff"]["2"], gelu_tanh(linear(p["ff"]["0"], nx))) * gate
    return x


def hunyuan_embed(params, cfg: HunyuanVideoDiTConfig, x, t, prompt_emb,
                  text_mask, pooled_prompt_emb, guidance=None):
    """Embedding stage -> (img_tokens, txt_tokens, vec, cos, sin, grid)."""
    B, C, T, H, W = x.shape
    dtype = x.dtype
    vec = _mlp_embed(params["time_in"],
                     timestep_embedding_flux(t, cfg.time_freq_dim).astype(dtype))
    vec = vec + linear(params["vector_in"]["2"],
                       silu(linear(params["vector_in"]["0"], pooled_prompt_emb)))
    if cfg.guidance_embed and guidance is not None:
        vec = vec + _mlp_embed(
            params["guidance_in"],
            timestep_embedding_flux(guidance * 1000.0, cfg.time_freq_dim).astype(dtype))

    pt, ph, pw = cfg.patch_size
    img = rearrange(x, "B C (T pt) (H ph) (W pw) -> B (T H W) (C pt ph pw)",
                    pt=pt, ph=ph, pw=pw)
    img = linear(params["img_in"]["proj"], img)
    txt = token_refiner(params["txt_in"], cfg, prompt_emb, t, text_mask)
    cos, sin = hunyuan_rope(cfg, T // pt, H // ph, W // pw)
    return img, txt, vec, jnp.asarray(cos), jnp.asarray(sin), \
        (T // pt, H // ph, W // pw)


def hunyuan_trunk(params, cfg: HunyuanVideoDiTConfig, img, txt, vec, cos, sin,
                  remat: bool = False):
    """Double + single stacks -> post-trunk img tokens."""
    def double_scan(carry, bp):
        a, b = carry
        fn = double_block
        if remat:
            fn = jax.checkpoint(double_block, static_argnums=(6,))
        a, b = fn(bp, a, b, vec, cos, sin, cfg)
        return (a, b), None

    (img, txt), _ = jax.lax.scan(double_scan, (img, txt),
                                 params["double_blocks"])
    h = jnp.concatenate([img, txt], axis=1)

    def single_scan(carry, bp):
        fn = single_block
        if remat:
            fn = jax.checkpoint(single_block, static_argnums=(5,))
        return fn(bp, carry, vec, cos, sin, cfg), None

    h, _ = jax.lax.scan(single_scan, h, params["single_blocks"])
    return h[:, :-cfg.txt_len]


def hunyuan_head(params, cfg: HunyuanVideoDiTConfig, h, vec, grid):
    fl = params["final_layer"]
    sh, sc = jnp.split(linear(fl["norm_linear"], silu(vec))[:, None, :], 2, -1)
    h = layer_norm({}, h, cfg.eps) * (1 + sc) + sh
    h = linear(fl["linear"], h)
    T, H, W = grid
    pt, ph, pw = cfg.patch_size
    return rearrange(h, "B (T H W) (C pt ph pw) -> B C (T pt) (H ph) (W pw)",
                     T=T, H=H, W=W, pt=pt, ph=ph, pw=pw)


def hunyuan_modulated_input(params, cfg: HunyuanVideoDiTConfig, img, vec):
    """double_blocks[0].component_a first-modulation probe (the TeaCache
    input, pipelines/hunyuan_video.py:261-266)."""
    p0 = jax.tree_util.tree_map(lambda a: a[0], params["double_blocks"])
    mods = jnp.split(linear(p0["component_a"]["mod"]["linear"],
                            silu(vec))[:, None, :], 6, -1)
    sh1, sc1 = mods[0], mods[1]
    return layer_norm({}, img, cfg.eps) * (1 + sc1) + sh1


def hunyuan_video_dit_forward(params, cfg: HunyuanVideoDiTConfig, x, t,
                              prompt_emb, text_mask, pooled_prompt_emb,
                              guidance=None, remat: bool = False):
    """HunyuanVideoDiT.forward (:631-661). x: (B, C, T, H, W) latents;
    prompt_emb: (B, txt_len, text_dim) LLaMA features; text_mask: (B, txt_len);
    pooled_prompt_emb: (B, 768) CLIP pooled; guidance: (B,)."""
    img, txt, vec, cos, sin, grid = hunyuan_embed(
        params, cfg, x, t, prompt_emb, text_mask, pooled_prompt_emb, guidance)
    h = hunyuan_trunk(params, cfg, img, txt, vec, cos, sin, remat=remat)
    return hunyuan_head(params, cfg, h, vec, grid)


# --------------------------------------------------------------------------
# Checkpoint conversion
# --------------------------------------------------------------------------

def _j(v, dtype):
    if hasattr(v, "detach"):
        v = v.detach().float().cpu().numpy()
    return jnp.asarray(np.asarray(v), dtype)


def _lin_t(sd, prefix, dtype, bias=True):
    p = {"w": _j(sd[prefix + ".weight"], dtype).T}
    if bias and prefix + ".bias" in sd:
        p["b"] = _j(sd[prefix + ".bias"], dtype)
    return p


def _ln(sd, prefix, dtype):
    p = {}
    if prefix + ".weight" in sd:
        p["scale"] = _j(sd[prefix + ".weight"], dtype)
    if prefix + ".bias" in sd:
        p["bias"] = _j(sd[prefix + ".bias"], dtype)
    return p


def convert_hunyuan_video_dit(sd, cfg: HunyuanVideoDiTConfig = HUNYUAN_VIDEO,
                              dtype=jnp.bfloat16):
    """DiffSynth-layout HunyuanVideoDiT state dict -> pytree. Raw civitai
    layouts ('double_blocks.N.img_mod.linear', fused single-block linear1/2)
    are renamed/split first, mirroring HunyuanVideoDiTStateDictConverter
    .from_civitai (hunyuan_video_dit.py:818-920)."""
    if any(".img_mod.linear." in k or ".linear1." in k for k in sd):
        sd = rename_civitai_hunyuan(sd, cfg)
    from .wan_dit import stack_blocks

    def comp(prefix):
        return {
            "mod": {"linear": _lin_t(sd, f"{prefix}.mod.linear", dtype)},
            "to_qkv": _lin_t(sd, f"{prefix}.to_qkv", dtype),
            "norm_q": {"weight": _j(sd[f"{prefix}.norm_q.weight"], dtype)},
            "norm_k": {"weight": _j(sd[f"{prefix}.norm_k.weight"], dtype)},
            "to_out": _lin_t(sd, f"{prefix}.to_out", dtype),
            "ff": {"0": _lin_t(sd, f"{prefix}.ff.0", dtype),
                   "2": _lin_t(sd, f"{prefix}.ff.2", dtype)},
        }

    def refiner(i):
        b = f"txt_in.blocks.{i}"
        return {
            "norm1": _ln(sd, f"{b}.norm1", dtype),
            "self_attn_qkv": _lin_t(sd, f"{b}.self_attn_qkv", dtype),
            "self_attn_proj": _lin_t(sd, f"{b}.self_attn_proj", dtype),
            "norm2": _ln(sd, f"{b}.norm2", dtype),
            "mlp": {"0": _lin_t(sd, f"{b}.mlp.0", dtype),
                    "2": _lin_t(sd, f"{b}.mlp.2", dtype)},
            "adaLN_modulation": {
                "1": _lin_t(sd, f"{b}.adaLN_modulation.1", dtype)},
        }

    params = {
        "img_in": {"proj": _conv3d_as_lin(sd, "img_in.proj", dtype)},
        "time_in": {"fc1": _lin_t(sd, "time_in.timestep_embedder.0", dtype),
                    "fc2": _lin_t(sd, "time_in.timestep_embedder.2", dtype)},
        "vector_in": {"0": _lin_t(sd, "vector_in.0", dtype),
                      "2": _lin_t(sd, "vector_in.2", dtype)},
        "txt_in": {
            "input_embedder": _lin_t(sd, "txt_in.input_embedder", dtype),
            "t_embedder": {
                "fc1": _lin_t(sd, "txt_in.t_embedder.timestep_embedder.0", dtype),
                "fc2": _lin_t(sd, "txt_in.t_embedder.timestep_embedder.2", dtype)},
            "c_embedder": {"0": _lin_t(sd, "txt_in.c_embedder.0", dtype),
                           "2": _lin_t(sd, "txt_in.c_embedder.2", dtype)},
            "blocks": stack_blocks([refiner(i)
                                    for i in range(cfg.refiner_depth)]),
        },
        "double_blocks": stack_blocks([
            {"component_a": comp(f"double_blocks.{i}.component_a"),
             "component_b": comp(f"double_blocks.{i}.component_b")}
            for i in range(cfg.num_double_blocks)]),
        "single_blocks": stack_blocks([
            {"mod": {"linear": _lin_t(sd, f"single_blocks.{i}.mod.linear", dtype)},
             "to_qkv": _lin_t(sd, f"single_blocks.{i}.to_qkv", dtype),
             "norm_q": {"weight": _j(sd[f"single_blocks.{i}.norm_q.weight"], dtype)},
             "norm_k": {"weight": _j(sd[f"single_blocks.{i}.norm_k.weight"], dtype)},
             "to_out": _lin_t(sd, f"single_blocks.{i}.to_out", dtype),
             "ff": {"0": _lin_t(sd, f"single_blocks.{i}.ff.0", dtype),
                    "2": _lin_t(sd, f"single_blocks.{i}.ff.2", dtype)}}
            for i in range(cfg.num_single_blocks)]),
        "final_layer": {
            "norm_linear": _lin_t(sd, "final_layer.adaLN_modulation.1", dtype),
            "linear": _lin_t(sd, "final_layer.linear", dtype)},
    }
    if cfg.guidance_embed and "guidance_in.timestep_embedder.0.weight" in sd:
        params["guidance_in"] = {
            "fc1": _lin_t(sd, "guidance_in.timestep_embedder.0", dtype),
            "fc2": _lin_t(sd, "guidance_in.timestep_embedder.2", dtype)}
    return params


def _conv3d_as_lin(sd, prefix, dtype):
    w = sd[prefix + ".weight"]
    if hasattr(w, "detach"):
        w = w.detach().float().cpu().numpy()
    w = np.asarray(w)                       # (D, C, pt, ph, pw)
    p = {"w": jnp.asarray(w.reshape(w.shape[0], -1).T, dtype)}
    if prefix + ".bias" in sd:
        b = sd[prefix + ".bias"]
        if hasattr(b, "detach"):
            b = b.detach().float().cpu().numpy()
        p["b"] = jnp.asarray(np.asarray(b), dtype)
    return p


def rename_civitai_hunyuan(sd, cfg: HunyuanVideoDiTConfig):
    """Raw civitai layout -> DiffSynth module layout, incl. splitting the
    fused single-block linear1/linear2 (hunyuan_video_dit.py:880-910)."""
    import torch
    if "module" in sd:
        sd = sd["module"]
    d = cfg.hidden_size
    direct = {
        "img_in.proj": "img_in.proj",
        "time_in.mlp.0": "time_in.timestep_embedder.0",
        "time_in.mlp.2": "time_in.timestep_embedder.2",
        "vector_in.in_layer": "vector_in.0",
        "vector_in.out_layer": "vector_in.2",
        "guidance_in.mlp.0": "guidance_in.timestep_embedder.0",
        "guidance_in.mlp.2": "guidance_in.timestep_embedder.2",
        "txt_in.input_embedder": "txt_in.input_embedder",
        "txt_in.t_embedder.mlp.0": "txt_in.t_embedder.timestep_embedder.0",
        "txt_in.t_embedder.mlp.2": "txt_in.t_embedder.timestep_embedder.2",
        "txt_in.c_embedder.linear_1": "txt_in.c_embedder.0",
        "txt_in.c_embedder.linear_2": "txt_in.c_embedder.2",
        "final_layer.linear": "final_layer.linear",
        "final_layer.adaLN_modulation.1": "final_layer.adaLN_modulation.1",
    }
    dbl = {
        "img_mod.linear": "component_a.mod.linear",
        "img_attn_qkv": "component_a.to_qkv",
        "img_attn_q_norm": "component_a.norm_q",
        "img_attn_k_norm": "component_a.norm_k",
        "img_attn_proj": "component_a.to_out",
        "img_mlp.fc1": "component_a.ff.0",
        "img_mlp.fc2": "component_a.ff.2",
        "txt_mod.linear": "component_b.mod.linear",
        "txt_attn_qkv": "component_b.to_qkv",
        "txt_attn_q_norm": "component_b.norm_q",
        "txt_attn_k_norm": "component_b.norm_k",
        "txt_attn_proj": "component_b.to_out",
        "txt_mlp.fc1": "component_b.ff.0",
        "txt_mlp.fc2": "component_b.ff.2",
    }
    txt = {"norm1": "norm1", "self_attn_qkv": "self_attn_qkv",
           "self_attn_proj": "self_attn_proj", "norm2": "norm2",
           "mlp.fc1": "mlp.0", "mlp.fc2": "mlp.2",
           "adaLN_modulation.1": "adaLN_modulation.1"}
    out = {}
    for name, param in sd.items():
        names = name.split(".")
        head = ".".join(names[:-1])
        leaf = names[-1]
        if head in direct:
            out[f"{direct[head]}.{leaf}"] = param
        elif names[0] == "double_blocks":
            mid = ".".join(names[2:-1])
            if mid in dbl:
                out[f"double_blocks.{names[1]}.{dbl[mid]}.{leaf}"] = param
        elif names[0] == "single_blocks":
            pre = f"single_blocks.{names[1]}"
            mid = ".".join(names[2:-1])
            if mid == "linear1":
                a, b = torch.split(param, (3 * d, 4 * d), dim=0)
                out[f"{pre}.to_qkv.{leaf}"] = a
                out[f"{pre}.ff.0.{leaf}"] = b
            elif mid == "linear2":
                if leaf == "weight":
                    a, b = torch.split(param, (d, 4 * d), dim=-1)
                    out[f"{pre}.to_out.{leaf}"] = a
                    out[f"{pre}.ff.2.{leaf}"] = b
                else:
                    out[f"{pre}.to_out.{leaf}"] = param
            elif mid == "q_norm":
                out[f"{pre}.norm_q.{leaf}"] = param
            elif mid == "k_norm":
                out[f"{pre}.norm_k.{leaf}"] = param
            elif mid == "modulation.linear":
                out[f"{pre}.mod.linear.{leaf}"] = param
        elif names[0] == "txt_in" and names[1] == "individual_token_refiner":
            mid = ".".join(names[4:-1])
            if mid in txt:
                out[f"txt_in.blocks.{names[3]}.{txt[mid]}.{leaf}"] = param
    return out
