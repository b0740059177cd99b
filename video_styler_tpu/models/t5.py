"""umT5-xxl encoder (Wan text encoder), TPU-native.

Functional re-design of WanTextEncoder
(/root/reference/diffsynth/models/wan_video_text_encoder.py:209-254):
24 encoder layers, per-layer relative-position bias (shared_pos=False),
GELU-gated FFN, T5 layernorm (no mean subtraction), no attention scaling.

The relative-position bucket table is computed host-side (numpy) once per
sequence length and enters the graph as a constant gather — bucketing math
matches T5RelativeEmbedding._relative_position_bucket (:171-190).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, t5_layer_norm, init_linear


@dataclass(frozen=True)
class T5Config:
    vocab: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    shared_pos: bool = False


UMT5_XXL = T5Config()
# google/t5-v1_1-xxl — the SD3 text encoder 3 / FLUX text encoder 2
# (sd3_text_encoder.py:40-83): one relative-bias table shared by all layers.
T5_V11_XXL = T5Config(vocab=32128, shared_pos=True)
T5_TINY = T5Config(vocab=128, dim=64, dim_attn=64, dim_ffn=128, num_heads=4,
                   num_layers=2, num_buckets=8)
# HunyuanDiT mT5-XL text encoder (hunyuan_dit_text_encoder.py:88-122)
MT5_XL = T5Config(vocab=250112, dim=2048, dim_attn=2048, dim_ffn=5120,
                  num_heads=32, num_layers=24, shared_pos=True)
T5_V11_TINY = T5Config(vocab=128, dim=64, dim_attn=64, dim_ffn=128,
                       num_heads=4, num_layers=2, shared_pos=True)


@lru_cache(maxsize=16)
def relative_position_buckets(lq: int, lk: int, num_buckets: int,
                              bidirectional: bool = True,
                              max_dist: int = 128) -> np.ndarray:
    """(lq, lk) int32 bucket ids — numpy, cached (never jax values)."""
    rel_pos = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    if bidirectional:
        nb = num_buckets // 2
        rel_buckets = (rel_pos > 0).astype(np.int64) * nb
        rel_pos = np.abs(rel_pos)
    else:
        nb = num_buckets
        rel_buckets = np.zeros_like(rel_pos)
        rel_pos = -np.minimum(rel_pos, 0)
    max_exact = nb // 2
    large = max_exact + (
        np.log(np.maximum(rel_pos, 1) / max_exact) / math.log(max_dist / max_exact)
        * (nb - max_exact)).astype(np.int64)
    large = np.minimum(large, nb - 1)
    rel_buckets = rel_buckets + np.where(rel_pos < max_exact, rel_pos, large)
    return rel_buckets.astype(np.int32)


def t5_gelu(x):
    """The reference's hand-rolled tanh GELU (wan_video_text_encoder.py:15-19)."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi)
                                   * (xf + 0.044715 * xf ** 3)))
    return y.astype(x.dtype)


def t5_attention(p, x, pos_bias, mask, num_heads: int):
    """T5 attention: no scaling, additive bias, fp32 softmax
    (wan_video_text_encoder.py:38-89)."""
    b, s, _ = x.shape
    head_dim = p["q"]["w"].shape[1] // num_heads
    q = linear(p["q"], x).reshape(b, s, num_heads, head_dim)
    k = linear(p["k"], x).reshape(b, s, num_heads, head_dim)
    v = linear(p["v"], x).reshape(b, s, num_heads, head_dim)
    logits = jnp.einsum("binc,bjnc->bnij", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits + pos_bias
    if mask is not None:
        big_neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(mask[:, None, None, :] == 0, big_neg, logits)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnij,bjnc->binc", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return linear(p["o"], out.reshape(b, s, num_heads * head_dim))


def t5_ffn(p, x):
    """fc1(x) * gelu(gate(x)) -> fc2 (wan_video_text_encoder.py:92-110)."""
    return linear(p["fc2"], linear(p["fc1"], x) * t5_gelu(linear(p["gate"], x)))


def _pos_bias_from_table(table, length, num_buckets):
    bias = jnp.take(table, jnp.asarray(
        relative_position_buckets(length, length, num_buckets)), axis=0)
    return bias.transpose(2, 0, 1)[None].astype(jnp.float32)  # (1, H, lq, lk)


def t5_block(p, x, mask, cfg: T5Config, pos_bias=None):
    if pos_bias is None:
        pos_bias = _pos_bias_from_table(p["pos_emb"], x.shape[1], cfg.num_buckets)
    x = x + t5_attention(p["attn"], t5_layer_norm(p["norm1"], x), pos_bias,
                         mask, cfg.num_heads)
    x = x + t5_ffn(p["ffn"], t5_layer_norm(p["norm2"], x))
    return x


def t5_encode(params, cfg: T5Config, ids, mask=None):
    """ids (B, L) int32 -> embeddings (B, L, dim).

    Matches WanTextEncoder.forward (:245-254); dropout is inference-off.
    With cfg.shared_pos (T5 v1.1 / HF T5EncoderModel) the layer-0 bias table
    is reused by every layer.
    """
    x = jnp.take(params["token_embedding"], ids, axis=0)
    shared_bias = None
    if cfg.shared_pos:
        shared_bias = _pos_bias_from_table(params["blocks"]["0"]["pos_emb"],
                                           x.shape[1], cfg.num_buckets)
    for i in range(cfg.num_layers):
        x = t5_block(params["blocks"][str(i)], x, mask, cfg,
                     pos_bias=shared_bias)
    return t5_layer_norm(params["norm"], x)


def init_t5(key, cfg: T5Config, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.num_layers + 2)
    blocks = {}
    for i in range(cfg.num_layers):
        kb = jax.random.split(ks[i], 8)
        blocks[str(i)] = {
            "norm1": {"scale": jnp.ones((cfg.dim,), dtype)},
            "norm2": {"scale": jnp.ones((cfg.dim,), dtype)},
            "attn": {
                "q": init_linear(kb[0], cfg.dim, cfg.dim_attn, bias=False, dtype=dtype),
                "k": init_linear(kb[1], cfg.dim, cfg.dim_attn, bias=False, dtype=dtype),
                "v": init_linear(kb[2], cfg.dim, cfg.dim_attn, bias=False, dtype=dtype),
                "o": init_linear(kb[3], cfg.dim_attn, cfg.dim, bias=False, dtype=dtype),
            },
            "ffn": {
                "gate": init_linear(kb[4], cfg.dim, cfg.dim_ffn, bias=False, dtype=dtype),
                "fc1": init_linear(kb[5], cfg.dim, cfg.dim_ffn, bias=False, dtype=dtype),
                "fc2": init_linear(kb[6], cfg.dim_ffn, cfg.dim, bias=False, dtype=dtype),
            },
        }
        if not cfg.shared_pos or i == 0:
            blocks[str(i)]["pos_emb"] = (
                jax.random.normal(kb[7], (cfg.num_buckets, cfg.num_heads),
                                  jnp.float32)
                * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5).astype(dtype)
    return {
        "token_embedding": (jax.random.normal(ks[-2], (cfg.vocab, cfg.dim),
                                              jnp.float32)).astype(dtype),
        "blocks": blocks,
        "norm": {"scale": jnp.ones((cfg.dim,), dtype)},
    }


def convert_t5(sd, cfg: T5Config, dtype=jnp.bfloat16):
    """Reference WanTextEncoder state dict -> pytree."""
    from ..utils.convert import _lin, _j
    blocks = {}
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        blocks[str(i)] = {
            "norm1": {"scale": _j(sd[f"{pre}.norm1.weight"], dtype)},
            "norm2": {"scale": _j(sd[f"{pre}.norm2.weight"], dtype)},
            "attn": {
                "q": _lin(sd, f"{pre}.attn.q", dtype),
                "k": _lin(sd, f"{pre}.attn.k", dtype),
                "v": _lin(sd, f"{pre}.attn.v", dtype),
                "o": _lin(sd, f"{pre}.attn.o", dtype),
            },
            "ffn": {
                "gate": _lin(sd, f"{pre}.ffn.gate.0", dtype),
                "fc1": _lin(sd, f"{pre}.ffn.fc1", dtype),
                "fc2": _lin(sd, f"{pre}.ffn.fc2", dtype),
            },
            "pos_emb": _j(sd[f"{pre}.pos_embedding.embedding.weight"], dtype),
        }
    return {
        "token_embedding": _j(sd["token_embedding.weight"], dtype),
        "blocks": blocks,
        "norm": {"scale": _j(sd["norm.weight"], dtype)},
    }


def convert_hf_t5(sd, cfg: T5Config, dtype=jnp.bfloat16):
    """HF transformers T5EncoderModel state dict (the SD3/FLUX T5 checkpoints,
    sd3_text_encoder.py:40-83) -> pytree. Layer 0 carries the shared
    relative-bias table."""
    from ..utils.convert import _j

    def lin_t(prefix):
        return {"w": _j(sd[prefix + ".weight"], dtype).T}

    blocks = {}
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}"
        blocks[str(i)] = {
            "norm1": {"scale": _j(sd[f"{pre}.layer.0.layer_norm.weight"], dtype)},
            "norm2": {"scale": _j(sd[f"{pre}.layer.1.layer_norm.weight"], dtype)},
            "attn": {
                "q": lin_t(f"{pre}.layer.0.SelfAttention.q"),
                "k": lin_t(f"{pre}.layer.0.SelfAttention.k"),
                "v": lin_t(f"{pre}.layer.0.SelfAttention.v"),
                "o": lin_t(f"{pre}.layer.0.SelfAttention.o"),
            },
            "ffn": {
                "gate": lin_t(f"{pre}.layer.1.DenseReluDense.wi_0"),
                "fc1": lin_t(f"{pre}.layer.1.DenseReluDense.wi_1"),
                "fc2": lin_t(f"{pre}.layer.1.DenseReluDense.wo"),
            },
        }
        key = f"{pre}.layer.0.SelfAttention.relative_attention_bias.weight"
        if key in sd:
            blocks[str(i)]["pos_emb"] = _j(sd[key], dtype)
    return {
        "token_embedding": _j(sd["shared.weight"], dtype),
        "blocks": blocks,
        "norm": {"scale": _j(sd["encoder.final_layer_norm.weight"], dtype)},
    }
