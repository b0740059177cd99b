"""Kolors text encoder (ChatGLM3-6B), TPU-native.

Re-design of the reference ChatGLMModel
(/root/reference/diffsynth/models/kolors_text_encoder.py:991-1105): a
28-layer GLM decoder — RMSNorm, fused multi-query qkv (32 q heads, 2 kv
groups, qkv bias), partial interleaved rotary on the first half of each
head, SwiGLU MLP — encoding the prompt with a causal(+padding) mask.
Kolors conditioning (kolors_prompter.py:324-340): prompt embedding =
hidden_states[-clip_skip] (pre-final-norm), pooled = last token of the
final block output.

The reference quantization kernels (:52-225) are a CUDA path; our int8
path is ops/quant.py.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, silu, init_linear
from ..ops.attention import sdpa


@dataclass(frozen=True)
class ChatGLMConfig:
    hidden_size: int = 4096
    ffn_hidden_size: int = 13696
    num_layers: int = 28
    num_heads: int = 32
    kv_channels: int = 128
    multi_query_group_num: int = 2
    padded_vocab_size: int = 65024
    layernorm_epsilon: float = 1e-5
    seq_length: int = 32768
    add_qkv_bias: bool = True


CHATGLM3_6B = ChatGLMConfig()
CHATGLM_TINY = ChatGLMConfig(hidden_size=32, ffn_hidden_size=48,
                             num_layers=2, num_heads=4, kv_channels=8,
                             multi_query_group_num=2, padded_vocab_size=64,
                             seq_length=64)


def chatglm_rope_cache(cfg: ChatGLMConfig, seq_len: int) -> np.ndarray:
    """(seq, rot/4, 2) cos/sin cache (kolors_text_encoder.py:379-437):
    rotary dim = kv_channels/2, applied to the first half of each head."""
    n_elem = cfg.kv_channels // 2
    theta = 1.0 / (10000.0 ** (np.arange(0, n_elem, 2, dtype=np.float32)
                               / n_elem))
    idx = np.arange(seq_len, dtype=np.float32)[:, None] * theta[None]
    return np.stack([np.cos(idx), np.sin(idx)], axis=-1).astype(np.float32)


def _apply_rotary(x, cache):
    """x (B, S, N, D); cache (S, D/4, 2). Interleaved-pair rotation on the
    first D/2 dims, pass-through on the rest (apply_rotary_pos_emb)."""
    b, s, n, d = x.shape
    rot = cache.shape[-2] * 2
    xr, xp = x[..., :rot], x[..., rot:]
    xr = xr.reshape(b, s, n, rot // 2, 2).astype(jnp.float32)
    cos = cache[None, :, None, :, 0]
    sin = cache[None, :, None, :, 1]
    out = jnp.stack([xr[..., 0] * cos - xr[..., 1] * sin,
                     xr[..., 1] * cos + xr[..., 0] * sin], axis=-1)
    return jnp.concatenate([out.reshape(b, s, n, rot).astype(x.dtype), xp],
                           axis=-1)


def _rms(p, x, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


def _glm_block(p, x, cache, mask, cfg: ChatGLMConfig):
    b, s, _ = x.shape
    n, hd, g = cfg.num_heads, cfg.kv_channels, cfg.multi_query_group_num
    h = _rms(p["ln1"], x, cfg.layernorm_epsilon)
    qkv = linear(p["qkv"], h)
    q = qkv[..., :n * hd].reshape(b, s, n, hd)
    k = qkv[..., n * hd:(n + g) * hd].reshape(b, s, g, hd)
    v = qkv[..., (n + g) * hd:].reshape(b, s, g, hd)
    q = _apply_rotary(q, cache)
    k = _apply_rotary(k, cache)
    k = jnp.repeat(k, n // g, axis=2)
    v = jnp.repeat(v, n // g, axis=2)
    a = sdpa(q, k, v, bias=mask).reshape(b, s, n * hd)
    x = x + linear(p["dense"], a)
    h = _rms(p["ln2"], x, cfg.layernorm_epsilon)
    gate, up = jnp.split(linear(p["h_to_4h"], h), 2, axis=-1)
    return x + linear(p["4h_to_h"], silu(gate) * up)


def _full_attention_mask(attention_mask: np.ndarray) -> np.ndarray:
    """get_masks (kolors_text_encoder.py:935-951): causal x padding; rows of
    padded queries are fully unmasked (the reference's `-= pad - 1` quirk).
    Returns {0,1} (B, S, S) where 1 = attend."""
    b, s = attention_mask.shape
    full = np.tril(np.ones((b, s, s), np.float32))
    full = full * attention_mask[:, None, :]
    full -= attention_mask[:, :, None] - 1
    return (full >= 0.5).astype(np.float32)


def chatglm_forward(params, cfg: ChatGLMConfig, input_ids,
                    attention_mask=None, mask=None, cache=None):
    """-> list of hidden states [emb, after block 0, ..., after last block]
    (the reference all_hidden_states; final_layernorm is NOT applied to the
    recorded last state, GLMTransformer:908-915)."""
    b, s = input_ids.shape
    if cache is None:
        cache = jnp.asarray(chatglm_rope_cache(cfg, s))
    if mask is None:
        am = (np.ones((b, s)) if attention_mask is None
              else np.asarray(attention_mask, np.float32))
        mask = jnp.asarray(
            np.where(_full_attention_mask(am) > 0, 0.0, -np.inf)[:, None],
            jnp.float32)
    x = params["word_embeddings"][input_ids]
    states = [x]
    for p in params["blocks"]:
        x = _glm_block(p, x, cache, mask, cfg)
        states.append(x)
    return states


def kolors_encode(params, cfg: ChatGLMConfig, input_ids, attention_mask=None,
                  clip_skip: int = 2):
    """KolorsPrompter.encode_prompt_using_ChatGLM (kolors_prompter.py:324-340):
    -> (prompt_emb (B, L, H), pooled (B, H) last token of the final state)."""
    states = chatglm_forward(params, cfg, input_ids, attention_mask)
    return states[-clip_skip], states[-1][:, -1]


def init_chatglm(key, cfg: ChatGLMConfig, dtype=jnp.float32):
    n, hd, g = cfg.num_heads, cfg.kv_channels, cfg.multi_query_group_num
    qkv_out = (n + 2 * g) * hd
    ks = iter(jax.random.split(key, 2 + 4 * cfg.num_layers))
    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append({
            "ln1": {"scale": jnp.ones((cfg.hidden_size,), dtype)},
            "qkv": init_linear(next(ks), cfg.hidden_size, qkv_out,
                               bias=cfg.add_qkv_bias, dtype=dtype),
            "dense": init_linear(next(ks), n * hd, cfg.hidden_size,
                                 bias=False, dtype=dtype),
            "ln2": {"scale": jnp.ones((cfg.hidden_size,), dtype)},
            "h_to_4h": init_linear(next(ks), cfg.hidden_size,
                                   2 * cfg.ffn_hidden_size, bias=False,
                                   dtype=dtype),
            "4h_to_h": init_linear(next(ks), cfg.ffn_hidden_size,
                                   cfg.hidden_size, bias=False, dtype=dtype),
        })
    return {
        "word_embeddings": (jax.random.normal(
            next(ks), (cfg.padded_vocab_size, cfg.hidden_size)) * 0.02
            ).astype(dtype),
        "blocks": blocks,
        "final_ln": {"scale": jnp.ones((cfg.hidden_size,), dtype)},
    }


def convert_chatglm(sd, cfg: ChatGLMConfig = CHATGLM3_6B, dtype=jnp.bfloat16):
    """ChatGLM state dict (embedding.word_embeddings / encoder.layers.*) ->
    pytree."""
    def _np(v):
        return np.asarray(v.detach().float().cpu().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    def lin(key, bias_key=None):
        p = {"w": jnp.asarray(_np(sd[key]).T, dtype)}
        if bias_key and bias_key in sd:
            p["b"] = jnp.asarray(_np(sd[bias_key]), dtype)
        return p

    blocks = []
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        blocks.append({
            "ln1": {"scale": jnp.asarray(
                _np(sd[f"{p}.input_layernorm.weight"]), dtype)},
            "qkv": lin(f"{p}.self_attention.query_key_value.weight",
                       f"{p}.self_attention.query_key_value.bias"),
            "dense": lin(f"{p}.self_attention.dense.weight"),
            "ln2": {"scale": jnp.asarray(
                _np(sd[f"{p}.post_attention_layernorm.weight"]), dtype)},
            "h_to_4h": lin(f"{p}.mlp.dense_h_to_4h.weight"),
            "4h_to_h": lin(f"{p}.mlp.dense_4h_to_h.weight"),
        })
    return {
        "word_embeddings": jnp.asarray(
            _np(sd["embedding.word_embeddings.weight"]), dtype),
        "blocks": blocks,
        "final_ln": {"scale": jnp.asarray(
            _np(sd["encoder.final_layernorm.weight"]), dtype)},
    }
