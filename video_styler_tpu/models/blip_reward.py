"""BLIP reward tower for ImageReward, TPU-native.

Re-design of the reference ImageReward stack
(/root/reference/diffsynth/extensions/ImageQualityMetric/imagereward.py:24-117
+ BLIP/vit.py:19-300, BLIP/med.py:40-450): a timm-style ViT-L/16 image
encoder, a BERT text encoder whose every layer cross-attends to the image
tokens (BLIP "multimodal" mode), and the 5-layer reward MLP over the [CLS]
text state, z-scored with the published mean/std.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, layer_norm, gelu_exact
from ..ops.attention import sdpa


@dataclass(frozen=True)
class BlipRewardConfig:
    # ViT (vit='large', image_size=224, blip_pretrain.py:33)
    image_size: int = 224
    patch_size: int = 16
    vit_dim: int = 1024
    vit_layers: int = 24
    vit_heads: int = 16
    vit_eps: float = 1e-6
    # BERT (med_config: bert-base + cross attention)
    text_dim: int = 768
    text_layers: int = 12
    text_heads: int = 12
    text_ffn: int = 3072
    vocab_size: int = 30524
    max_pos: int = 512
    bert_eps: float = 1e-12
    # reward head z-score (imagereward.py:63-64)
    mean: float = 0.16717362830052426
    std: float = 1.0333394966054072


IMAGE_REWARD = BlipRewardConfig()
BLIP_REWARD_TINY = BlipRewardConfig(
    image_size=32, patch_size=16, vit_dim=32, vit_layers=2, vit_heads=2,
    text_dim=24, text_layers=2, text_heads=2, text_ffn=48, vocab_size=64,
    max_pos=16)


# -- ViT (BLIP/vit.py Block: pre-LN, fused qkv, exact GELU) -------------------

def blip_vit_forward(params, cfg: BlipRewardConfig, pixel_values):
    """(B, 3, H, W) CLIP-normalized -> image tokens (B, 1+P, vit_dim)."""
    p = params["vit"]
    b = pixel_values.shape[0]
    ps = cfg.patch_size
    g = cfg.image_size // ps
    patches = pixel_values.reshape(b, 3, g, ps, g, ps)
    patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(b, g * g, -1)
    x = linear(p["patch"], patches)
    cls = jnp.broadcast_to(p["cls"].astype(x.dtype), (b, 1, cfg.vit_dim))
    x = jnp.concatenate([cls, x], axis=1) + p["pos"].astype(x.dtype)
    d, nh = cfg.vit_dim, cfg.vit_heads
    for blk in p["blocks"]:
        h = layer_norm(blk["ln1"], x, cfg.vit_eps)
        qkv = linear(blk["qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        s = x.shape[1]
        a = sdpa(q.reshape(b, s, nh, d // nh), k.reshape(b, s, nh, d // nh),
                 v.reshape(b, s, nh, d // nh)).reshape(b, s, d)
        x = x + linear(blk["proj"], a)
        h = layer_norm(blk["ln2"], x, cfg.vit_eps)
        x = x + linear(blk["fc2"], gelu_exact(linear(blk["fc1"], h)))
    return layer_norm(p["norm"], x, cfg.vit_eps)


# -- BERT with cross attention (BLIP/med.py, mode='multimodal') ---------------

def _bert_attn(p, x, kv_input, cfg: BlipRewardConfig, mask=None):
    b, s, d = x.shape
    nh, hd = cfg.text_heads, cfg.text_dim // cfg.text_heads
    q = linear(p["q"], x).reshape(b, s, nh, hd)
    k = linear(p["k"], kv_input).reshape(b, kv_input.shape[1], nh, hd)
    v = linear(p["v"], kv_input).reshape(b, kv_input.shape[1], nh, hd)
    a = sdpa(q, k, v, bias=mask).reshape(b, s, d)
    return layer_norm(p["out_ln"], linear(p["out"], a) + x, cfg.bert_eps)


def blip_bert_forward(params, cfg: BlipRewardConfig, input_ids,
                      attention_mask, encoder_hidden_states):
    """BLIP multimodal text encoder: every layer = self-attn -> cross-attn to
    image tokens -> FFN, post-LN residuals (med.py:312-383)."""
    p = params["bert"]
    b, s = input_ids.shape
    x = p["tok_emb"][input_ids] + p["pos_emb"][:s]
    x = layer_norm(p["emb_ln"], x, cfg.bert_eps)
    # HF extended mask: (1 - m) * -10000 on key positions
    mask = ((1.0 - attention_mask.astype(jnp.float32))
            * -10000.0)[:, None, None, :]
    for blk in p["blocks"]:
        x = _bert_attn(blk["self"], x, x, cfg, mask=mask)
        x = _bert_attn(blk["cross"], x, encoder_hidden_states, cfg)
        h = linear(blk["fc1"], x)
        x = layer_norm(blk["out_ln"], linear(blk["fc2"], gelu_exact(h)) + x,
                       cfg.bert_eps)
    return x


def image_reward_forward(params, cfg: BlipRewardConfig, pixel_values,
                         input_ids, attention_mask):
    """Full ImageReward score_grad path (imagereward.py:66-90): z-scored
    reward (B,)."""
    image_embeds = blip_vit_forward(params, cfg, pixel_values)
    txt = blip_bert_forward(params, cfg, input_ids, attention_mask,
                            image_embeds)
    x = txt[:, 0]
    for i, lp in enumerate(params["mlp"]):
        x = linear(lp, x)
    return (x[..., 0] - cfg.mean) / cfg.std


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


def convert_image_reward(state_dict, cfg: BlipRewardConfig = IMAGE_REWARD,
                         dtype=jnp.float32):
    """ImageReward checkpoint (blip.visual_encoder.* / blip.text_encoder.* /
    mlp.layers.*) -> pytree."""
    sd = dict(state_dict)

    v = "blip.visual_encoder"
    conv = _np(sd[f"{v}.patch_embed.proj.weight"])
    vit = {
        "patch": {"w": jnp.asarray(conv.reshape(conv.shape[0], -1).T, dtype),
                  "b": jnp.asarray(_np(sd[f"{v}.patch_embed.proj.bias"]), dtype)},
        "cls": jnp.asarray(_np(sd[f"{v}.cls_token"]).reshape(-1), dtype),
        "pos": jnp.asarray(_np(sd[f"{v}.pos_embed"])[0], dtype),
        "norm": _ln_t(sd, f"{v}.norm", dtype),
        "blocks": [],
    }
    for i in range(cfg.vit_layers):
        pre = f"{v}.blocks.{i}"
        vit["blocks"].append({
            "ln1": _ln_t(sd, f"{pre}.norm1", dtype),
            "qkv": _lin_t(sd, f"{pre}.attn.qkv", dtype),
            "proj": _lin_t(sd, f"{pre}.attn.proj", dtype),
            "ln2": _ln_t(sd, f"{pre}.norm2", dtype),
            "fc1": _lin_t(sd, f"{pre}.mlp.fc1", dtype),
            "fc2": _lin_t(sd, f"{pre}.mlp.fc2", dtype),
        })

    t = "blip.text_encoder"
    bert = {
        "tok_emb": jnp.asarray(
            _np(sd[f"{t}.embeddings.word_embeddings.weight"]), dtype),
        "pos_emb": jnp.asarray(
            _np(sd[f"{t}.embeddings.position_embeddings.weight"]), dtype),
        "emb_ln": _ln_t(sd, f"{t}.embeddings.LayerNorm", dtype),
        "blocks": [],
    }
    for i in range(cfg.text_layers):
        pre = f"{t}.encoder.layer.{i}"
        bert["blocks"].append({
            "self": {
                "q": _lin_t(sd, f"{pre}.attention.self.query", dtype),
                "k": _lin_t(sd, f"{pre}.attention.self.key", dtype),
                "v": _lin_t(sd, f"{pre}.attention.self.value", dtype),
                "out": _lin_t(sd, f"{pre}.attention.output.dense", dtype),
                "out_ln": _ln_t(sd, f"{pre}.attention.output.LayerNorm", dtype),
            },
            "cross": {
                "q": _lin_t(sd, f"{pre}.crossattention.self.query", dtype),
                "k": _lin_t(sd, f"{pre}.crossattention.self.key", dtype),
                "v": _lin_t(sd, f"{pre}.crossattention.self.value", dtype),
                "out": _lin_t(sd, f"{pre}.crossattention.output.dense", dtype),
                "out_ln": _ln_t(sd, f"{pre}.crossattention.output.LayerNorm",
                                dtype),
            },
            "fc1": _lin_t(sd, f"{pre}.intermediate.dense", dtype),
            "fc2": _lin_t(sd, f"{pre}.output.dense", dtype),
            "out_ln": _ln_t(sd, f"{pre}.output.LayerNorm", dtype),
        })

    mlp = [_lin_t(sd, f"mlp.layers.{i}", dtype) for i in ("0", "2", "4",
                                                          "6", "7")]
    return {"vit": vit, "bert": bert, "mlp": mlp}
