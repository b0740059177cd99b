"""CLIP ViT-H/14 vision tower for Wan I2V conditioning.

Functional port of the vision path of WanImageEncoder
(/root/reference/diffsynth/models/wan_video_image_encoder.py:222-479,852-884):
patch conv(14) -> cls token + pos embedding -> pre-LayerNorm -> 32 pre-norm
attention blocks (GELU MLP) with the `use_31_block` feature tap (stop before
the last block). The XLM-R text tower is excluded from I2V checkpoints
(converter drops 'textual.*', :895-905) so only the visual tower is built.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, layer_norm
from ..ops.attention import sdpa

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class ClipVitConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: float = 4.0
    num_heads: int = 16
    num_layers: int = 32
    norm_eps: float = 1e-5
    activation: str = "gelu"   # XLMRobertaCLIP uses exact gelu (:655)


CLIP_VIT_H_14 = ClipVitConfig()
CLIP_VIT_TINY = ClipVitConfig(image_size=28, patch_size=14, dim=64,
                              num_heads=2, num_layers=3)


def _act(x, kind: str):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)


def _attn_block(p, x, cfg: ClipVitConfig):
    b, s, d = x.shape
    h = layer_norm(p["norm1"], x, cfg.norm_eps)
    qkv = linear(p["to_qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    nh = cfg.num_heads
    out = sdpa(q.reshape(b, s, nh, d // nh), k.reshape(b, s, nh, d // nh),
               v.reshape(b, s, nh, d // nh))
    x = x + linear(p["attn_proj"], out.reshape(b, s, d))
    h = layer_norm(p["norm2"], x, cfg.norm_eps)
    h = linear(p["mlp_fc2"], _act(linear(p["mlp_fc1"], h), cfg.activation))
    return x + h


def clip_vit_forward(params, cfg: ClipVitConfig, images,
                     use_31_block: bool = True):
    """images: (B, 3, H, W) already CLIP-normalized. Returns (B, 1+P, dim)
    features (after num_layers-1 blocks when use_31_block)."""
    b = images.shape[0]
    ps = cfg.patch_size
    patches = jnp.reshape(images, (b, 3, cfg.image_size // ps, ps,
                                   cfg.image_size // ps, ps))
    patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(
        b, -1, 3 * ps * ps)
    x = linear(params["patch_embedding"], patches)
    cls = jnp.broadcast_to(params["cls_embedding"].astype(x.dtype),
                           (b, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(x.dtype)
    x = layer_norm(params["pre_norm"], x, cfg.norm_eps)
    n = cfg.num_layers - 1 if use_31_block else cfg.num_layers
    for i in range(n):
        x = _attn_block(params["blocks"][str(i)], x, cfg)
    if not use_31_block:
        x = layer_norm(params["post_norm"], x, cfg.norm_eps)
    return x


def preprocess_clip_image(image_np: np.ndarray, image_size: int = 224) -> np.ndarray:
    """(B, 3, H, W) in [-1, 1] -> bicubic resize to image_size + CLIP norm.

    Uses torch's bicubic (align_corners=False) for parity with the reference
    preprocessing (wan_video_image_encoder.py:864-877); PIL fallback.
    """
    try:
        import torch
        import torch.nn.functional as F
        t = torch.from_numpy(np.asarray(image_np, np.float32))
        t = F.interpolate(t, size=(image_size, image_size), mode="bicubic",
                          align_corners=False)
        arr = t.numpy()
    except ImportError:
        from PIL import Image
        outs = []
        for img in image_np:
            chw = ((img.transpose(1, 2, 0) + 1) * 127.5).clip(0, 255).astype(np.uint8)
            pil = Image.fromarray(chw).resize((image_size, image_size), Image.BICUBIC)
            outs.append(np.asarray(pil, np.float32).transpose(2, 0, 1) / 127.5 - 1)
        arr = np.stack(outs)
    arr = arr * 0.5 + 0.5
    mean = np.asarray(CLIP_MEAN, np.float32)[None, :, None, None]
    std = np.asarray(CLIP_STD, np.float32)[None, :, None, None]
    return (arr - mean) / std


def encode_image(params, images_np, cfg: ClipVitConfig = CLIP_VIT_H_14,
                 dtype=jnp.bfloat16):
    """Full encode_image contract: (B, 3, H, W) in [-1,1] -> (B, 257, 1280)."""
    pre = preprocess_clip_image(images_np, cfg.image_size)
    return clip_vit_forward(params, cfg, jnp.asarray(pre, dtype))


def convert_clip_vit(sd: Dict, cfg: ClipVitConfig = CLIP_VIT_H_14,
                     dtype=jnp.bfloat16):
    """civitai-layout CLIP checkpoint ('visual.*' keys) -> pytree."""
    from ..utils.convert import _lin, _ln, _j
    sd = {k[len("visual."):] if k.startswith("visual.") else k: v
          for k, v in sd.items() if not k.startswith("textual.")}
    # patch conv (dim, 3, ps, ps) -> (3*ps*ps, dim) with (c, kh, kw) order
    w = np.asarray(sd["patch_embedding.weight"], np.float32)
    patch = {"w": jnp.asarray(w.reshape(w.shape[0], -1).T, dtype)}
    if "patch_embedding.bias" in sd:
        patch["b"] = _j(sd["patch_embedding.bias"], dtype)
    blocks = {}
    for i in range(cfg.num_layers):
        pre = f"transformer.{i}"
        blocks[str(i)] = {
            "norm1": _ln(sd, f"{pre}.norm1", dtype),
            "to_qkv": _lin(sd, f"{pre}.attn.to_qkv", dtype),
            "attn_proj": _lin(sd, f"{pre}.attn.proj", dtype),
            "norm2": _ln(sd, f"{pre}.norm2", dtype),
            "mlp_fc1": _lin(sd, f"{pre}.mlp.0", dtype),
            "mlp_fc2": _lin(sd, f"{pre}.mlp.2", dtype),
        }
    return {
        "patch_embedding": patch,
        "cls_embedding": _j(sd["cls_embedding"], dtype),
        "pos_embedding": _j(sd["pos_embedding"], dtype),
        "pre_norm": _ln(sd, "pre_norm", dtype),
        "post_norm": _ln(sd, "post_norm", dtype),
        "blocks": blocks,
    }


def init_clip_vit(key, cfg: ClipVitConfig = CLIP_VIT_TINY, dtype=jnp.float32):
    from ..ops.basic import init_linear, init_layer_norm
    ks = jax.random.split(key, cfg.num_layers + 3)
    num_patches = (cfg.image_size // cfg.patch_size) ** 2
    blocks = {}
    for i in range(cfg.num_layers):
        kb = jax.random.split(ks[i], 4)
        blocks[str(i)] = {
            "norm1": init_layer_norm(cfg.dim, dtype=dtype),
            "to_qkv": init_linear(kb[0], cfg.dim, cfg.dim * 3, dtype=dtype),
            "attn_proj": init_linear(kb[1], cfg.dim, cfg.dim, dtype=dtype),
            "norm2": init_layer_norm(cfg.dim, dtype=dtype),
            "mlp_fc1": init_linear(kb[2], cfg.dim, int(cfg.dim * cfg.mlp_ratio), dtype=dtype),
            "mlp_fc2": init_linear(kb[3], int(cfg.dim * cfg.mlp_ratio), cfg.dim, dtype=dtype),
        }
    gain = 1.0 / np.sqrt(cfg.dim)
    return {
        "patch_embedding": init_linear(ks[-1], 3 * cfg.patch_size ** 2, cfg.dim,
                                       bias=False, dtype=dtype),
        "cls_embedding": (jax.random.normal(ks[-2], (1, 1, cfg.dim)) * gain).astype(dtype),
        "pos_embedding": (jax.random.normal(ks[-3], (1, num_patches + 1, cfg.dim)) * gain).astype(dtype),
        "pre_norm": init_layer_norm(cfg.dim, dtype=dtype),
        "post_norm": init_layer_norm(cfg.dim, dtype=dtype),
        "blocks": blocks,
    }


# -- XLM-RoBERTa text tower (wan_video_image_encoder.py:14-141,617-640) -------

def xlm_roberta_forward(params, ids, num_heads: int = 16, pad_id: int = 1,
                        eps: float = 1e-5, with_head: bool = True):
    """XLMRobertaWithHead: post-norm blocks, padding-aware position ids
    (pad_id + cumsum(mask)*mask), mean-pool + 2-layer GELU head.

    ids (B, L) int32 -> (B, out_dim) when with_head else (B, L, dim)."""
    b, s = ids.shape
    mask = (ids != pad_id).astype(jnp.int32)
    pos = pad_id + jnp.cumsum(mask, axis=1) * mask
    x = (params["token_embedding"][ids]
         + params["type_embedding"][jnp.zeros_like(ids)]
         + params["pos_embedding"][pos])
    x = layer_norm(params["norm"], x, eps)

    bias = jnp.where(mask[:, None, None, :] > 0, 0.0,
                     jnp.finfo(jnp.float32).min)
    n = num_heads
    for p in params["blocks"]:
        d = x.shape[-1]
        q = linear(p["q"], x).reshape(b, s, n, d // n)
        k = linear(p["k"], x).reshape(b, s, n, d // n)
        v = linear(p["v"], x).reshape(b, s, n, d // n)
        a = sdpa(q, k, v, bias=bias).reshape(b, s, d)
        x = layer_norm(p["norm1"], x + linear(p["o"], a), eps)
        h = linear(p["fc2"], _act(linear(p["fc1"], x), "gelu"))
        x = layer_norm(p["norm2"], x + h, eps)

    if not with_head or "head_fc1" not in params:
        return x
    m = mask[..., None].astype(x.dtype)
    pooled = (x * m).sum(axis=1) / m.sum(axis=1)
    return linear(params["head_fc2"], _act(linear(params["head_fc1"], pooled),
                                           "gelu"))


def convert_xlm_roberta(sd: Dict, num_layers: int = 24, dtype=jnp.bfloat16):
    """'textual.*' keys of the full open-clip-xlm-roberta checkpoint ->
    pytree (the I2V converter drops these; this completes the tower)."""
    from ..utils.convert import _lin, _ln, _j
    sd = {k[len("textual."):] if k.startswith("textual.") else k: v
          for k, v in sd.items() if not k.startswith("visual.")}
    blocks = []
    for i in range(num_layers):
        pre = f"blocks.{i}"
        blocks.append({
            "q": _lin(sd, f"{pre}.attn.q", dtype),
            "k": _lin(sd, f"{pre}.attn.k", dtype),
            "v": _lin(sd, f"{pre}.attn.v", dtype),
            "o": _lin(sd, f"{pre}.attn.o", dtype),
            "norm1": _ln(sd, f"{pre}.norm1", dtype),
            "fc1": _lin(sd, f"{pre}.ffn.0", dtype),
            "fc2": _lin(sd, f"{pre}.ffn.2", dtype),
            "norm2": _ln(sd, f"{pre}.norm2", dtype),
        })
    params = {
        "token_embedding": _j(sd["token_embedding.weight"], dtype),
        "type_embedding": _j(sd["type_embedding.weight"], dtype),
        "pos_embedding": _j(sd["pos_embedding.weight"], dtype),
        "norm": _ln(sd, "norm", dtype),
        "blocks": blocks,
    }
    if "head.0.weight" in sd:
        params["head_fc1"] = _lin(sd, "head.0", dtype)
        params["head_fc2"] = _lin(sd, "head.2", dtype)
    return params
