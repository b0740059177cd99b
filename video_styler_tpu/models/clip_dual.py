"""Dual-tower CLIP (vision + text) for the image-quality metric family.

Re-design of the towers behind the reference ImageQualityMetric extension:
  * PickScore = HF CLIPModel ViT-H/14
    (/root/reference/diffsynth/extensions/ImageQualityMetric/pickscore.py:8-55)
  * HPS v2/v2.1 = open_clip ViT-H-14
    (.../ImageQualityMetric/hps.py:20-84)
  * MPS = HF CLIP ViT-H/14 + a 4-layer multi-query cross model
    (.../ImageQualityMetric/trainer/models/clip_model.py:17-146,
     cross_modeling.py:18-292)

One param pytree serves all three; converters accept both the HF CLIPModel
state-dict layout and the open_clip layout.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, layer_norm
from ..ops.attention import sdpa


@dataclass(frozen=True)
class CLIPDualConfig:
    image_size: int = 224
    patch_size: int = 14
    vision_dim: int = 1280
    vision_layers: int = 32
    vision_heads: int = 16
    text_dim: int = 1024
    text_layers: int = 24
    text_heads: int = 16
    proj_dim: int = 1024
    vocab_size: int = 49408
    max_len: int = 77
    eos_token_id: int = 49407
    quick_gelu: bool = False
    norm_eps: float = 1e-5


# laion/CLIP-ViT-H-14 (PickScore, MPS, HPS backbones)
CLIP_VIT_H_14_DUAL = CLIPDualConfig()

CLIP_DUAL_TINY = CLIPDualConfig(
    image_size=28, patch_size=14, vision_dim=32, vision_layers=2,
    vision_heads=2, text_dim=24, text_layers=2, text_heads=2, proj_dim=16,
    vocab_size=64, max_len=8, eos_token_id=63)


def _act(x, quick: bool):
    if quick:
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def _block(p, x, heads: int, quick: bool, eps: float, mask=None):
    b, s, d = x.shape
    h = layer_norm(p["ln1"], x, eps)
    q = linear(p["q"], h).reshape(b, s, heads, d // heads)
    k = linear(p["k"], h).reshape(b, s, heads, d // heads)
    v = linear(p["v"], h).reshape(b, s, heads, d // heads)
    a = sdpa(q, k, v, bias=mask).reshape(b, s, d)
    x = x + linear(p["o"], a)
    h = layer_norm(p["ln2"], x, eps)
    return x + linear(p["fc2"], _act(linear(p["fc1"], h), quick))


def clip_vision_forward(params, cfg: CLIPDualConfig, pixel_values):
    """pixel_values (B, 3, H, W) CLIP-normalized -> (tokens (B, 1+P, vd),
    pooled (B, vd)). HF semantics: post_layernorm applies to the pooled CLS
    only; `tokens` is the raw last_hidden_state (what MPS projects)."""
    p = params["vision"]
    b = pixel_values.shape[0]
    ps = cfg.patch_size
    g = cfg.image_size // ps
    patches = pixel_values.reshape(b, 3, g, ps, g, ps)
    patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, -1)
    x = linear(p["patch"], patches)
    cls = jnp.broadcast_to(p["cls"].astype(x.dtype), (b, 1, cfg.vision_dim))
    x = jnp.concatenate([cls, x], axis=1) + p["pos"].astype(x.dtype)
    x = layer_norm(p["pre_ln"], x, cfg.norm_eps)
    for blk in p["blocks"]:
        x = _block(blk, x, cfg.vision_heads, cfg.quick_gelu, cfg.norm_eps)
    pooled = layer_norm(p["post_ln"], x[:, 0], cfg.norm_eps)
    return x, pooled


def clip_text_forward(params, cfg: CLIPDualConfig, input_ids,
                      attention_mask=None):
    """input_ids (B, L) -> (tokens (B, L, td), pooled (B, td)); pooled at the
    first EOS token after the final LayerNorm (HF CLIPTextTransformer)."""
    p = params["text"]
    b, s = input_ids.shape
    x = p["tok_emb"][input_ids] + p["pos_emb"][:s]
    causal = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)
    mask = causal[None, None]
    if attention_mask is not None:
        pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -jnp.inf)
        mask = mask + pad
    for blk in p["blocks"]:
        x = _block(blk, x, cfg.text_heads, cfg.quick_gelu, cfg.norm_eps,
                   mask=mask)
    x = layer_norm(p["final_ln"], x, cfg.norm_eps)
    eos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    return x, x[jnp.arange(b), eos]


def clip_image_features(params, cfg: CLIPDualConfig, pixel_values):
    """Projected pooled image features (B, proj) — HF get_image_features."""
    _, pooled = clip_vision_forward(params, cfg, pixel_values)
    return linear(params["visual_projection"], pooled)


def clip_text_features(params, cfg: CLIPDualConfig, input_ids,
                       attention_mask=None):
    """Projected pooled text features (B, proj) — HF get_text_features."""
    _, pooled = clip_text_forward(params, cfg, input_ids, attention_mask)
    return linear(params["text_projection"], pooled)


# -- converters ---------------------------------------------------------------

def _np(v):
    return np.asarray(v.float() if hasattr(v, "float") else v, np.float32)


def _lin_t(sd, key, dtype):
    p = {"w": jnp.asarray(_np(sd[f"{key}.weight"]).T, dtype)}
    if f"{key}.bias" in sd:
        p["b"] = jnp.asarray(_np(sd[f"{key}.bias"]), dtype)
    return p


def _ln_t(sd, key, dtype):
    return {"scale": jnp.asarray(_np(sd[f"{key}.weight"]), dtype),
            "bias": jnp.asarray(_np(sd[f"{key}.bias"]), dtype)}


def convert_hf_clip(state_dict, cfg: CLIPDualConfig = CLIP_VIT_H_14_DUAL,
                    dtype=jnp.float32):
    """HF CLIPModel state dict (text_model.* / vision_model.* /
    {visual,text}_projection / logit_scale) -> pytree."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    conv = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    vision = {
        "patch": {"w": jnp.asarray(conv.reshape(conv.shape[0], -1).T, dtype)},
        "cls": jnp.asarray(_np(sd["vision_model.embeddings.class_embedding"]
                               ).reshape(-1), dtype),
        "pos": jnp.asarray(
            _np(sd["vision_model.embeddings.position_embedding.weight"]), dtype),
        "pre_ln": _ln_t(sd, "vision_model.pre_layrnorm", dtype),
        "post_ln": _ln_t(sd, "vision_model.post_layernorm", dtype),
        "blocks": [],
    }
    for i in range(cfg.vision_layers):
        pre = f"vision_model.encoder.layers.{i}"
        vision["blocks"].append({
            "ln1": _ln_t(sd, f"{pre}.layer_norm1", dtype),
            "q": _lin_t(sd, f"{pre}.self_attn.q_proj", dtype),
            "k": _lin_t(sd, f"{pre}.self_attn.k_proj", dtype),
            "v": _lin_t(sd, f"{pre}.self_attn.v_proj", dtype),
            "o": _lin_t(sd, f"{pre}.self_attn.out_proj", dtype),
            "ln2": _ln_t(sd, f"{pre}.layer_norm2", dtype),
            "fc1": _lin_t(sd, f"{pre}.mlp.fc1", dtype),
            "fc2": _lin_t(sd, f"{pre}.mlp.fc2", dtype),
        })
    text = {
        "tok_emb": jnp.asarray(
            _np(sd["text_model.embeddings.token_embedding.weight"]), dtype),
        "pos_emb": jnp.asarray(
            _np(sd["text_model.embeddings.position_embedding.weight"]), dtype),
        "final_ln": _ln_t(sd, "text_model.final_layer_norm", dtype),
        "blocks": [],
    }
    for i in range(cfg.text_layers):
        pre = f"text_model.encoder.layers.{i}"
        text["blocks"].append({
            "ln1": _ln_t(sd, f"{pre}.layer_norm1", dtype),
            "q": _lin_t(sd, f"{pre}.self_attn.q_proj", dtype),
            "k": _lin_t(sd, f"{pre}.self_attn.k_proj", dtype),
            "v": _lin_t(sd, f"{pre}.self_attn.v_proj", dtype),
            "o": _lin_t(sd, f"{pre}.self_attn.out_proj", dtype),
            "ln2": _ln_t(sd, f"{pre}.layer_norm2", dtype),
            "fc1": _lin_t(sd, f"{pre}.mlp.fc1", dtype),
            "fc2": _lin_t(sd, f"{pre}.mlp.fc2", dtype),
        })
    return {
        "vision": vision,
        "text": text,
        "visual_projection": _lin_t(sd, "visual_projection", dtype),
        "text_projection": _lin_t(sd, "text_projection", dtype),
        "logit_scale": float(_np(sd["logit_scale"])),
    }


def convert_open_clip(state_dict, cfg: CLIPDualConfig = CLIP_VIT_H_14_DUAL,
                      dtype=jnp.float32):
    """open_clip CLIP state dict (visual.* / transformer.resblocks.*) ->
    the same pytree (HPS checkpoints, hps.py:48-55)."""
    sd = dict(state_dict)

    def blocks(prefix, n, dim):
        out = []
        for i in range(n):
            pre = f"{prefix}.resblocks.{i}"
            w = _np(sd[f"{pre}.attn.in_proj_weight"])
            b = _np(sd[f"{pre}.attn.in_proj_bias"])
            qw, kw, vw = np.split(w, 3, axis=0)
            qb, kb, vb = np.split(b, 3, axis=0)
            out.append({
                "ln1": _ln_t(sd, f"{pre}.ln_1", dtype),
                "q": {"w": jnp.asarray(qw.T, dtype), "b": jnp.asarray(qb, dtype)},
                "k": {"w": jnp.asarray(kw.T, dtype), "b": jnp.asarray(kb, dtype)},
                "v": {"w": jnp.asarray(vw.T, dtype), "b": jnp.asarray(vb, dtype)},
                "o": _lin_t(sd, f"{pre}.attn.out_proj", dtype),
                "ln2": _ln_t(sd, f"{pre}.ln_2", dtype),
                "fc1": _lin_t(sd, f"{pre}.mlp.c_fc", dtype),
                "fc2": _lin_t(sd, f"{pre}.mlp.c_proj", dtype),
            })
        return out

    conv = _np(sd["visual.conv1.weight"])
    vision = {
        "patch": {"w": jnp.asarray(conv.reshape(conv.shape[0], -1).T, dtype)},
        "cls": jnp.asarray(_np(sd["visual.class_embedding"]).reshape(-1), dtype),
        "pos": jnp.asarray(_np(sd["visual.positional_embedding"]), dtype),
        "pre_ln": _ln_t(sd, "visual.ln_pre", dtype),
        "post_ln": _ln_t(sd, "visual.ln_post", dtype),
        "blocks": blocks("visual.transformer", cfg.vision_layers,
                         cfg.vision_dim),
    }
    text = {
        "tok_emb": jnp.asarray(_np(sd["token_embedding.weight"]), dtype),
        "pos_emb": jnp.asarray(_np(sd["positional_embedding"]), dtype),
        "final_ln": _ln_t(sd, "ln_final", dtype),
        "blocks": blocks("transformer", cfg.text_layers, cfg.text_dim),
    }
    return {
        "vision": vision,
        "text": text,
        # open_clip projections are plain matrices (x @ proj)
        "visual_projection": {"w": jnp.asarray(_np(sd["visual.proj"]), dtype)},
        "text_projection": {"w": jnp.asarray(_np(sd["text_projection"]), dtype)},
        "logit_scale": float(_np(sd["logit_scale"])),
    }


def init_clip_dual(key, cfg: CLIPDualConfig = CLIP_DUAL_TINY,
                   dtype=jnp.float32):
    from ..ops.basic import init_linear, init_layer_norm

    def blocks(k, n, dim, ffn):
        out = []
        for i in range(n):
            ks = jax.random.split(jax.random.fold_in(k, i), 6)
            out.append({
                "ln1": init_layer_norm(dim, dtype=dtype),
                "q": init_linear(ks[0], dim, dim, dtype=dtype),
                "k": init_linear(ks[1], dim, dim, dtype=dtype),
                "v": init_linear(ks[2], dim, dim, dtype=dtype),
                "o": init_linear(ks[3], dim, dim, dtype=dtype),
                "ln2": init_layer_norm(dim, dtype=dtype),
                "fc1": init_linear(ks[4], dim, ffn, dtype=dtype),
                "fc2": init_linear(ks[5], ffn, dim, dtype=dtype),
            })
        return out

    kv, kt, k1, k2, k3, k4, k5 = jax.random.split(key, 7)
    g = cfg.image_size // cfg.patch_size
    return {
        "vision": {
            "patch": init_linear(k1, 3 * cfg.patch_size ** 2, cfg.vision_dim,
                                 bias=False, dtype=dtype),
            "cls": jnp.zeros((cfg.vision_dim,), dtype),
            "pos": (jax.random.normal(k2, (g * g + 1, cfg.vision_dim))
                    * 0.02).astype(dtype),
            "pre_ln": init_layer_norm(cfg.vision_dim, dtype=dtype),
            "post_ln": init_layer_norm(cfg.vision_dim, dtype=dtype),
            "blocks": blocks(kv, cfg.vision_layers, cfg.vision_dim,
                             cfg.vision_dim * 4),
        },
        "text": {
            "tok_emb": (jax.random.normal(k3, (cfg.vocab_size, cfg.text_dim))
                        * 0.02).astype(dtype),
            "pos_emb": (jax.random.normal(k4, (cfg.max_len, cfg.text_dim))
                        * 0.02).astype(dtype),
            "final_ln": init_layer_norm(cfg.text_dim, dtype=dtype),
            "blocks": blocks(kt, cfg.text_layers, cfg.text_dim,
                             cfg.text_dim * 4),
        },
        "visual_projection": init_linear(k5, cfg.vision_dim, cfg.proj_dim,
                                         bias=False, dtype=dtype),
        "text_projection": init_linear(jax.random.fold_in(k5, 1),
                                       cfg.text_dim, cfg.proj_dim,
                                       bias=False, dtype=dtype),
        "logit_scale": float(np.log(100.0)),
    }


# -- MPS cross model (cross_modeling.py:18-292) -------------------------------

def _wn_layer_norm(p, x):
    """weight-only LayerNorm (cross_modeling LayerNorm: bias is a zero
    buffer)."""
    return layer_norm({"scale": p["scale"]}, x, eps=1e-5)


def _swiglu(x):
    a, gate = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(gate) * a


def _rotary(n: int, dim: int):
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    freqs = np.arange(n, dtype=np.float32)[:, None] * inv[None]
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _rot_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _parallel_block(p, x, heads: int, dim_head: int = 64, ff_mult: int = 4):
    """ParallelTransformerBlock (multi-query self-attn + parallel SwiGLU FFN,
    rotary positions), residual added by the caller's wrapper semantics."""
    b, n, d = x.shape
    h = _wn_layer_norm(p["norm"], x)
    fused = linear(p["fused"], h)
    inner = heads * dim_head
    q = fused[..., :inner]
    k = fused[..., inner:inner + dim_head]
    v = fused[..., inner + dim_head:inner + 2 * dim_head]
    ff = fused[..., inner + 2 * dim_head:]
    q = q.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
    cos, sin = _rotary(n, dim_head)
    q = q * cos + _rot_half(q) * sin
    k = k * cos + _rot_half(k) * sin
    q = q * (dim_head ** -0.5)
    sim = jnp.einsum("bhid,bjd->bhij", q, k,
                     preferred_element_type=jnp.float32)
    sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bjd->bhid", attn, v).transpose(0, 2, 1, 3)
    out = out.reshape(b, n, inner)
    return x + linear(p["attn_out"], out) + linear(p["ff_out"], _swiglu(ff))


def _cross_attention(p, x, context, mask, heads: int, dim_head: int = 64,
                     ff_mult: int = 4):
    """Multi-query cross attention with parallel SwiGLU FFN (+ residual)."""
    b, n, d = x.shape
    h = _wn_layer_norm(p["norm"], x)
    q = linear(p["to_q"], h).reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
    q = q * (dim_head ** -0.5)
    kv = linear(p["to_kv"], context)
    k, v = jnp.split(kv, 2, axis=-1)
    sim = jnp.einsum("bhid,bjd->bhij", q, k,
                     preferred_element_type=jnp.float32)
    sim = sim + mask[:, None]
    sim = sim - sim.max(axis=-1, keepdims=True)
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhij,bjd->bhid", attn, v).transpose(0, 2, 1, 3)
    out = out.reshape(b, n, heads * dim_head)
    out = linear(p["to_out"], out)
    out = out + linear(p["ff2"], _swiglu(linear(p["ff1"], h)))
    return x + out


def cross_model_forward(params, query_tokens, context_tokens, mask,
                        heads: int = 16):
    """MPS Cross_model (cross_modeling.py:261-292): 4 interleaved
    cross-attention / parallel-transformer layers over (image, text)."""
    x = query_tokens
    for layer in params["layers"]:
        x = _cross_attention(layer["cross"], x, context_tokens, mask, heads)
        x = _parallel_block(layer["self"], x, heads)
    return x


def convert_cross_model(state_dict, num_layers: int = 4, dtype=jnp.float32):
    """torch Cross_model state dict (layers.{i}.{0,1}.fn.*) -> pytree."""
    sd = {k.removeprefix("cross_model."): v for k, v in state_dict.items()
          if "cross_model." in k or k.startswith("layers.")}
    layers = []
    for i in range(num_layers):
        c = f"layers.{i}.0.fn"
        s = f"layers.{i}.1.fn"
        layers.append({
            "cross": {
                "norm": {"scale": jnp.asarray(_np(sd[f"{c}.norm.weight"]), dtype)},
                "to_q": _lin_t(sd, f"{c}.to_q", dtype),
                "to_kv": _lin_t(sd, f"{c}.to_kv", dtype),
                "to_out": _lin_t(sd, f"{c}.to_out", dtype),
                "ff1": _lin_t(sd, f"{c}.ff.0", dtype),
                "ff2": _lin_t(sd, f"{c}.ff.2", dtype),
            },
            "self": {
                "norm": {"scale": jnp.asarray(_np(sd[f"{s}.norm.weight"]), dtype)},
                "fused": _lin_t(sd, f"{s}.fused_attn_ff_proj", dtype),
                "attn_out": _lin_t(sd, f"{s}.attn_out", dtype),
                "ff_out": _lin_t(sd, f"{s}.ff_out.1", dtype),
            },
        })
    return {"layers": layers}
