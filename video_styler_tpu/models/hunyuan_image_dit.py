"""HunyuanDiT (image) — TPU-native.

Re-design of the reference HunyuanDiT
(/root/reference/diffsynth/models/hunyuan_dit.py:1-451): a U-shaped DiT
(21 down blocks, 19 up blocks with long-skip norm+linear fusion), per-head
q/k LayerNorm with 2-D interleaved RoPE on self attention (q-only RoPE on
cross attention), shift-only adaLN modulation, an mT5 AttentionPool +
size/style extra conditioning vector, and v-prediction output (the first
half of a 2x-channel head).

Down blocks run under one `lax.scan` collecting the skip stack; up blocks
scan over the reversed stack as per-layer scan inputs.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import (linear, layer_norm, silu, gelu_tanh,
                         sinusoidal_embedding_1d, init_linear,
                         init_layer_norm)
from ..ops.attention import sdpa
from .flux_dit import rope_apply_interleaved
from .wan_dit import stack_blocks


@dataclass(frozen=True)
class HunyuanImageDiTConfig:
    hidden_dim: int = 1408
    num_heads: int = 16
    mlp_ratio: float = 4.3637
    num_layers_down: int = 21
    num_layers_up: int = 19
    in_channels: int = 4
    out_channels: int = 8                 # head emits 2x, keeps first half
    text_dim: int = 1024
    t5_dim: int = 2048
    text_length: int = 77
    t5_length: int = 256
    pooled_dim: int = 1024                # t5_pooler output_dim
    patch_size: int = 2
    base_size: int = 32                   # 512 // 8 // patch (calc_rope)
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.hidden_dim * self.mlp_ratio)


HUNYUAN_DIT = HunyuanImageDiTConfig()
HUNYUAN_DIT_TINY = HunyuanImageDiTConfig(
    hidden_dim=64, num_heads=4, mlp_ratio=2.0, num_layers_down=4,
    num_layers_up=2, text_dim=24, t5_dim=32, text_length=6, t5_length=8,
    pooled_dim=24, base_size=4)


# -- RoPE (ImageSizeManager.calc_rope, pipelines/hunyuan_image.py:27-120) -----

def _fill_resize_and_crop(src, tgt):
    th, tw = tgt, tgt
    h, w = src
    if h / w > th / tw:
        rh, rw = th, int(round(th / h * w))
    else:
        rw, rh = tw, int(round(tw / w * h))
    top = int(round((th - rh) / 2.0))
    left = int(round((tw - rw) / 2.0))
    return (top, left), (top + rh, left + rw)


def hunyuan_image_rope(cfg: HunyuanImageDiTConfig, height: int, width: int):
    """latent-pixel height/width -> half-dim (HW, head_dim/2) cos/sin."""
    th, tw = height // cfg.patch_size, width // cfg.patch_size
    start, stop = _fill_resize_and_crop((th, tw), cfg.base_size)
    grid_h = np.linspace(start[0], stop[0], th, endpoint=False,
                         dtype=np.float32)
    grid_w = np.linspace(start[1], stop[1], tw, endpoint=False,
                         dtype=np.float32)
    dim = cfg.head_dim // 2                     # per-axis embed dim
    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    # reference meshgrid comment: "here w goes first" — grid[0] carries the
    # w positions and feeds the FIRST half of the table
    gw, gh = np.meshgrid(grid_w, grid_h)               # each (th, tw)
    emb_w = gw.reshape(-1)[:, None] * freqs[None]      # (HW, dim/2)
    emb_h = gh.reshape(-1)[:, None] * freqs[None]
    cos = np.concatenate([np.cos(emb_w), np.cos(emb_h)], axis=1)
    sin = np.concatenate([np.sin(emb_w), np.sin(emb_h)], axis=1)
    return cos.astype(np.float32), sin.astype(np.float32)


# -- blocks -------------------------------------------------------------------

def _heads(x, n):
    b, s, _ = x.shape
    return x.reshape(b, s, n, -1)


def _qk_norm(p, x, eps):
    return layer_norm(p, x, eps)


def hunyuan_image_block(p, x, cond, text, cos, sin,
                        cfg: HunyuanImageDiTConfig, skip=None):
    """HunyuanDiTBlock.forward (hunyuan_dit.py:119-138)."""
    n = cfg.num_heads
    if skip is not None:
        x = jnp.concatenate([x, skip], axis=-1)
        x = layer_norm(p["skip_norm"], x, cfg.eps)
        x = linear(p["skip_linear"], x)

    # self attention: shift-only modulation, per-head q/k LN + RoPE on both
    shift = linear(p["modulation"], silu(cond.astype(jnp.float32)).astype(cond.dtype))[:, None]
    h = layer_norm(p["norm1"], x, cfg.eps) + shift
    q = _qk_norm(p["q_norm1"], _heads(linear(p["attn1_q"], h), n), cfg.eps)
    k = _qk_norm(p["k_norm1"], _heads(linear(p["attn1_k"], h), n), cfg.eps)
    v = _heads(linear(p["attn1_v"], h), n)
    q = rope_apply_interleaved(q, cos, sin)
    k = rope_apply_interleaved(k, cos, sin)
    a = sdpa(q, k, v).reshape(x.shape)
    x = x + linear(p["attn1_o"], a)

    # cross attention: q-only RoPE (rota2, hunyuan_dit.py:40-44)
    h = layer_norm(p["norm3"], x, cfg.eps)
    q = _qk_norm(p["q_norm2"], _heads(linear(p["attn2_q"], h), n), cfg.eps)
    k = _qk_norm(p["k_norm2"], _heads(linear(p["attn2_k"], text), n), cfg.eps)
    v = _heads(linear(p["attn2_v"], text), n)
    q = rope_apply_interleaved(q, cos, sin)
    a = sdpa(q, k, v).reshape(x.shape)
    x = x + linear(p["attn2_o"], a)

    h = layer_norm(p["norm2"], x, cfg.eps)
    return x + linear(p["mlp_fc2"], gelu_tanh(linear(p["mlp_fc1"], h)))


def _attention_pool(p, x, num_heads: int = 8):
    """AttentionPool (hunyuan_dit.py:140-173): mean-token query over
    [mean | tokens] + positional embedding."""
    x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
    x = x + p["positional_embedding"].astype(x.dtype)[None]
    b, s, d = x.shape
    q = _heads(linear(p["q_proj"], x[:, :1]), num_heads)
    k = _heads(linear(p["k_proj"], x), num_heads)
    v = _heads(linear(p["v_proj"], x), num_heads)
    a = sdpa(q, k, v).reshape(b, 1, d)
    return linear(p["c_proj"], a)[:, 0]


def hunyuan_image_dit_forward(params, cfg: HunyuanImageDiTConfig,
                              hidden_states, text_emb, text_emb_t5,
                              text_emb_mask, text_emb_mask_t5, timestep,
                              size_emb, cos=None, sin=None):
    """HunyuanDiT.forward (hunyuan_dit.py:348-401).

    hidden_states (B, 4, H, W); text_emb (B, 77, 1024) CLIP-BERT states;
    text_emb_t5 (B, 256, 2048) mT5 states; masks (B, L) {0,1};
    size_emb (B, 6) [w, h, w, h, 0, 0].
    """
    dtype = hidden_states.dtype
    b = hidden_states.shape[0]
    height, width = hidden_states.shape[-2:]
    if cos is None:
        cos, sin = hunyuan_image_rope(cfg, height, width)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    # text conditioning with learned padding (prepare_text_emb, :327-334)
    t5_proj = linear(params["t5_embedder"]["2"], silu(
        linear(params["t5_embedder"]["0"], text_emb_t5).astype(jnp.float32)
        ).astype(dtype))
    text = jnp.concatenate([text_emb, t5_proj], axis=1)
    mask = jnp.concatenate([text_emb_mask, text_emb_mask_t5], axis=-1) > 0
    text = jnp.where(mask[..., None], text,
                     params["text_emb_padding"].astype(dtype)[None])

    # condition vector (prepare_extra_emb, :336-353)
    pooled = _attention_pool(params["t5_pooler"], text_emb_t5)
    t_emb = sinusoidal_embedding_1d(256, timestep.astype(jnp.float32))
    t_emb = linear(params["timestep_embedder"]["fc2"], silu(
        linear(params["timestep_embedder"]["fc1"], t_emb.astype(dtype))))
    size = sinusoidal_embedding_1d(
        256, size_emb.astype(jnp.float32).reshape(-1)).reshape(b, 6 * 256)
    style = jnp.broadcast_to(params["style_embedder"].astype(dtype),
                             (b, cfg.hidden_dim))
    extra = jnp.concatenate([pooled.astype(dtype), size.astype(dtype), style],
                            axis=1)
    cond = t_emb + linear(params["extra_embedder"]["2"], silu(
        linear(params["extra_embedder"]["0"], extra).astype(jnp.float32)
        ).astype(dtype))

    # patchify: conv2x2 stride 2 stored as linear over (C, 2, 2) patches
    ps = cfg.patch_size
    gh, gw = height // ps, width // ps
    patches = hidden_states.reshape(b, cfg.in_channels, gh, ps, gw, ps)
    patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, -1)
    x = linear(params["patch_embedder"], patches)

    def down_scan(carry, layer_p):
        out = hunyuan_image_block(layer_p, carry, cond, text, cos, sin, cfg)
        return out, out

    x, ys = jax.lax.scan(down_scan, x, params["down_blocks"])
    skips = ys[:cfg.num_layers_down - 2][::-1]     # LIFO pop order

    def up_scan(carry, xs):
        out = hunyuan_image_block(xs["p"], carry, cond, text, cos, sin, cfg,
                                  skip=xs["skip"])
        return out, None

    x, _ = jax.lax.scan(up_scan, x, {"p": params["up_blocks"],
                                     "skip": skips[:cfg.num_layers_up]})

    # final layer (HunyuanDiTFinalLayer, :68-86)
    m = linear(params["final_adaln"], silu(cond.astype(jnp.float32)
                                           ).astype(dtype))
    shift, scale = jnp.split(m, 2, axis=1)
    x = layer_norm({}, x, cfg.eps) * (1 + scale[:, None]) + shift[:, None]
    x = linear(params["final_linear"], x)

    # unpatchify "B (H W) (P Q C) -> B C (H P) (W Q)", keep first half
    x = x.reshape(b, gh, gw, ps, ps, cfg.out_channels)
    x = x.transpose(0, 5, 1, 3, 2, 4).reshape(b, cfg.out_channels, height,
                                              width)
    return x[:, :cfg.out_channels // 2]


# -- init / convert -----------------------------------------------------------

def _init_block(key, cfg: HunyuanImageDiTConfig, skip: bool, dtype):
    d, td, m = cfg.hidden_dim, cfg.text_dim, cfg.mlp_dim
    ks = iter(jax.random.split(key, 16))
    p = {
        "norm1": init_layer_norm(d, dtype=dtype),
        "attn1_q": init_linear(next(ks), d, d, dtype=dtype),
        "attn1_k": init_linear(next(ks), d, d, dtype=dtype),
        "attn1_v": init_linear(next(ks), d, d, dtype=dtype),
        "attn1_o": init_linear(next(ks), d, d, dtype=dtype),
        "q_norm1": init_layer_norm(cfg.head_dim, dtype=dtype),
        "k_norm1": init_layer_norm(cfg.head_dim, dtype=dtype),
        "norm3": init_layer_norm(d, dtype=dtype),
        "attn2_q": init_linear(next(ks), d, d, dtype=dtype),
        "attn2_k": init_linear(next(ks), td, d, dtype=dtype),
        "attn2_v": init_linear(next(ks), td, d, dtype=dtype),
        "attn2_o": init_linear(next(ks), d, d, dtype=dtype),
        "q_norm2": init_layer_norm(cfg.head_dim, dtype=dtype),
        "k_norm2": init_layer_norm(cfg.head_dim, dtype=dtype),
        "norm2": init_layer_norm(d, dtype=dtype),
        "modulation": init_linear(next(ks), d, d, dtype=dtype),
        "mlp_fc1": init_linear(next(ks), d, m, dtype=dtype),
        "mlp_fc2": init_linear(next(ks), m, d, dtype=dtype),
    }
    if skip:
        p["skip_norm"] = init_layer_norm(2 * d, dtype=dtype)
        p["skip_linear"] = init_linear(next(ks), 2 * d, d, dtype=dtype)
    return p


def init_hunyuan_image_dit(key, cfg: HunyuanImageDiTConfig,
                           dtype=jnp.float32):
    d = cfg.hidden_dim
    ks = iter(jax.random.split(key, 16 + cfg.num_layers_down
                               + cfg.num_layers_up))
    total_len = cfg.text_length + cfg.t5_length
    return {
        "text_emb_padding": (jax.random.normal(
            next(ks), (total_len, cfg.text_dim)) * 0.02).astype(dtype),
        "t5_embedder": {
            "0": init_linear(next(ks), cfg.t5_dim, cfg.t5_dim * 4, dtype=dtype),
            "2": init_linear(next(ks), cfg.t5_dim * 4, cfg.text_dim,
                             dtype=dtype)},
        "t5_pooler": {
            "positional_embedding": (jax.random.normal(
                next(ks), (cfg.t5_length + 1, cfg.t5_dim))
                / cfg.t5_dim ** 0.5).astype(dtype),
            "q_proj": init_linear(next(ks), cfg.t5_dim, cfg.t5_dim, dtype=dtype),
            "k_proj": init_linear(next(ks), cfg.t5_dim, cfg.t5_dim, dtype=dtype),
            "v_proj": init_linear(next(ks), cfg.t5_dim, cfg.t5_dim, dtype=dtype),
            "c_proj": init_linear(next(ks), cfg.t5_dim, cfg.pooled_dim,
                                  dtype=dtype)},
        "style_embedder": (jax.random.normal(next(ks), (d,))).astype(dtype),
        "patch_embedder": init_linear(
            next(ks), cfg.in_channels * cfg.patch_size ** 2, d, dtype=dtype),
        "timestep_embedder": {
            "fc1": init_linear(next(ks), 256, d, dtype=dtype),
            "fc2": init_linear(next(ks), d, d, dtype=dtype)},
        "extra_embedder": {
            "0": init_linear(next(ks), 256 * 6 + cfg.pooled_dim + d, d * 4,
                             dtype=dtype),
            "2": init_linear(next(ks), d * 4, d, dtype=dtype)},
        "down_blocks": stack_blocks(
            [_init_block(next(ks), cfg, False, dtype)
             for _ in range(cfg.num_layers_down)]),
        "up_blocks": stack_blocks(
            [_init_block(next(ks), cfg, True, dtype)
             for _ in range(cfg.num_layers_up)]),
        "final_adaln": init_linear(next(ks), d, 2 * d, dtype=dtype),
        "final_linear": init_linear(
            next(ks), d, cfg.patch_size ** 2 * cfg.out_channels, dtype=dtype),
    }


def _np(v):
    return np.asarray(v.detach().float().cpu().numpy()
                      if hasattr(v, "detach") else v, np.float32)


def _lin(sd, key, dtype):
    p = {"w": jnp.asarray(_np(sd[f"{key}.weight"]).T, dtype)}
    if f"{key}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{key}.bias"]), dtype)
    return p


def _ln(sd, key, dtype):
    return {"scale": jnp.asarray(_np(sd[f"{key}.weight"]), dtype),
            "bias": jnp.asarray(_np(sd[f"{key}.bias"]), dtype)}


def rename_civitai_hunyuan_image(sd):
    """Raw checkpoint names -> DiffSynth module names (the reference
    from_diffusers rename, hunyuan_dit.py:408-451), incl. Wqkv / kv_proj
    splits."""
    import re
    out = {}
    for name, param in sd.items():
        n = (name.replace(".default_modulation.", ".modulation.")
             .replace(".mlp.fc1.", ".mlp.0.").replace(".mlp.fc2.", ".mlp.2.")
             .replace(".attn1.q_norm.", ".rota1.q_norm.")
             .replace(".attn2.q_norm.", ".rota2.q_norm.")
             .replace(".attn1.k_norm.", ".rota1.k_norm.")
             .replace(".attn2.k_norm.", ".rota2.k_norm.")
             .replace(".q_proj.", ".to_q.").replace(".out_proj.", ".to_out.")
             .replace("text_embedding_padding", "text_emb_padding")
             .replace("mlp_t5.0.", "t5_embedder.0.")
             .replace("mlp_t5.2.", "t5_embedder.2.")
             .replace("pooler.", "t5_pooler.")
             .replace("x_embedder.", "patch_embedder.")
             .replace("t_embedder.", "timestep_embedder.")
             .replace("t5_pooler.to_q.", "t5_pooler.q_proj."))
        if ".kv_proj." in n:
            half = param.shape[0] // 2
            out[n.replace(".kv_proj.", ".to_k.")] = param[:half]
            out[n.replace(".kv_proj.", ".to_v.")] = param[half:]
        elif ".Wqkv." in n:
            third = param.shape[0] // 3
            out[n.replace(".Wqkv.", ".to_q.")] = param[:third]
            out[n.replace(".Wqkv.", ".to_k.")] = param[third:2 * third]
            out[n.replace(".Wqkv.", ".to_v.")] = param[2 * third:]
        elif "style_embedder" in n:
            out["style_embedder"] = param.squeeze() if hasattr(
                param, "squeeze") else param
        else:
            out[n] = param
    return out


def convert_hunyuan_image_dit(sd, cfg: HunyuanImageDiTConfig = HUNYUAN_DIT,
                              dtype=jnp.bfloat16):
    if any(".Wqkv." in k or "mlp_t5.0.weight" in k for k in sd):
        sd = rename_civitai_hunyuan_image(sd)

    def block(i):
        b = f"blocks.{i}"
        p = {
            "norm1": _ln(sd, f"{b}.norm1", dtype),
            "attn1_q": _lin(sd, f"{b}.attn1.to_q", dtype),
            "attn1_k": _lin(sd, f"{b}.attn1.to_k", dtype),
            "attn1_v": _lin(sd, f"{b}.attn1.to_v", dtype),
            "attn1_o": _lin(sd, f"{b}.attn1.to_out", dtype),
            "q_norm1": _ln(sd, f"{b}.rota1.q_norm", dtype),
            "k_norm1": _ln(sd, f"{b}.rota1.k_norm", dtype),
            "norm3": _ln(sd, f"{b}.norm3", dtype),
            "attn2_q": _lin(sd, f"{b}.attn2.to_q", dtype),
            "attn2_k": _lin(sd, f"{b}.attn2.to_k", dtype),
            "attn2_v": _lin(sd, f"{b}.attn2.to_v", dtype),
            "attn2_o": _lin(sd, f"{b}.attn2.to_out", dtype),
            "q_norm2": _ln(sd, f"{b}.rota2.q_norm", dtype),
            "k_norm2": _ln(sd, f"{b}.rota2.k_norm", dtype),
            "norm2": _ln(sd, f"{b}.norm2", dtype),
            "modulation": _lin(sd, f"{b}.modulation.1", dtype),
            "mlp_fc1": _lin(sd, f"{b}.mlp.0", dtype),
            "mlp_fc2": _lin(sd, f"{b}.mlp.2", dtype),
        }
        if f"{b}.skip_norm.weight" in sd:
            p["skip_norm"] = _ln(sd, f"{b}.skip_norm", dtype)
            p["skip_linear"] = _lin(sd, f"{b}.skip_linear", dtype)
        return p

    conv = _np(sd["patch_embedder.proj.weight"])
    return {
        "text_emb_padding": jnp.asarray(_np(sd["text_emb_padding"]), dtype),
        "t5_embedder": {"0": _lin(sd, "t5_embedder.0", dtype),
                        "2": _lin(sd, "t5_embedder.2", dtype)},
        "t5_pooler": {
            "positional_embedding": jnp.asarray(
                _np(sd["t5_pooler.positional_embedding"]), dtype),
            "q_proj": _lin(sd, "t5_pooler.q_proj", dtype),
            "k_proj": _lin(sd, "t5_pooler.k_proj", dtype),
            "v_proj": _lin(sd, "t5_pooler.v_proj", dtype),
            "c_proj": _lin(sd, "t5_pooler.c_proj", dtype)},
        "style_embedder": jnp.asarray(_np(sd["style_embedder"]).reshape(-1),
                                      dtype),
        "patch_embedder": {
            "w": jnp.asarray(
                _np(sd["patch_embedder.proj.weight"]).reshape(
                    conv.shape[0], -1).T, dtype),
            "b": jnp.asarray(_np(sd["patch_embedder.proj.bias"]), dtype)},
        "timestep_embedder": {
            "fc1": _lin(sd, "timestep_embedder.mlp.0", dtype),
            "fc2": _lin(sd, "timestep_embedder.mlp.2", dtype)},
        "extra_embedder": {"0": _lin(sd, "extra_embedder.0", dtype),
                           "2": _lin(sd, "extra_embedder.2", dtype)},
        "down_blocks": stack_blocks(
            [block(i) for i in range(cfg.num_layers_down)]),
        "up_blocks": stack_blocks(
            [block(cfg.num_layers_down + i)
             for i in range(cfg.num_layers_up)]),
        "final_adaln": _lin(sd, "final_layer.adaLN_modulation.1", dtype),
        "final_linear": _lin(sd, "final_layer.linear", dtype),
    }


# -- CLIP-BERT text encoder (hunyuan_dit_text_encoder.py:6-86) ----------------

def hunyuan_bert_forward(params, input_ids, attention_mask, clip_skip: int = 1,
                         num_heads: int = 16, eps: float = 1e-12):
    """Chinese-CLIP BertModel (24x1024) -> hidden_states[-clip_skip]; with
    clip_skip>1 the picked layer is re-normalized to the final layer's
    mean/std (hunyuan_dit_text_encoder.py:74-79)."""
    b, s = input_ids.shape
    x = (params["tok_emb"][input_ids] + params["pos_emb"][:s]
         + params["type_emb"][0])
    x = layer_norm(params["emb_ln"], x, eps)
    mask = ((1.0 - attention_mask.astype(jnp.float32))
            * jnp.finfo(jnp.float32).min)[:, None, None, :]
    states = [x]
    for p in params["blocks"]:
        q = _heads(linear(p["q"], x), num_heads)
        k = _heads(linear(p["k"], x), num_heads)
        v = _heads(linear(p["v"], x), num_heads)
        a = sdpa(q, k, v, bias=mask).reshape(x.shape)
        x = layer_norm(p["attn_ln"], linear(p["o"], a) + x, eps)
        h = linear(p["fc2"], jax.nn.gelu(
            linear(p["fc1"], x).astype(jnp.float32),
            approximate=False).astype(x.dtype))
        x = layer_norm(p["out_ln"], h + x, eps)
        states.append(x)
    emb = states[-clip_skip]
    if clip_skip > 1:
        last = states[-1].astype(jnp.float32)
        embf = emb.astype(jnp.float32)
        emb = ((embf - embf.mean()) / embf.std(ddof=1) * last.std(ddof=1)
               + last.mean()).astype(emb.dtype)
    return emb


def convert_hunyuan_bert(sd, num_layers: int = 24, dtype=jnp.bfloat16):
    """HF BertModel state dict -> pytree (token_type row 0 only is used)."""
    sd = {k.removeprefix("bert."): v for k, v in sd.items()}
    blocks = []
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        blocks.append({
            "q": _lin(sd, f"{p}.attention.self.query", dtype),
            "k": _lin(sd, f"{p}.attention.self.key", dtype),
            "v": _lin(sd, f"{p}.attention.self.value", dtype),
            "o": _lin(sd, f"{p}.attention.output.dense", dtype),
            "attn_ln": _ln(sd, f"{p}.attention.output.LayerNorm", dtype),
            "fc1": _lin(sd, f"{p}.intermediate.dense", dtype),
            "fc2": _lin(sd, f"{p}.output.dense", dtype),
            "out_ln": _ln(sd, f"{p}.output.LayerNorm", dtype),
        })
    return {
        "tok_emb": jnp.asarray(_np(sd["embeddings.word_embeddings.weight"]),
                               dtype),
        "pos_emb": jnp.asarray(
            _np(sd["embeddings.position_embeddings.weight"]), dtype),
        "type_emb": jnp.asarray(
            _np(sd["embeddings.token_type_embeddings.weight"]), dtype),
        "emb_ln": _ln(sd, "embeddings.LayerNorm", dtype),
        "blocks": blocks,
    }
