"""Shared decoder-only LLM tower (LLaMA / Qwen2 family), TPU-native.

Replaces the two text towers the round-2 build still served through torch
`transformers` at runtime:

  * HunyuanVideo's LLaMA encoder — the reference subclasses
    transformers.LlamaModel and stops `hidden_state_skip_layer`(=2) layers
    before the end WITHOUT the final norm
    (/root/reference/diffsynth/models/hunyuan_video_text_encoder.py:6-49,
    prompters/hunyuan_video_prompter.py:136-151);
  * Qwen-Image's Qwen2.5-VL text tower — the reference vendors the 7B
    Qwen2.5-VL config and takes hidden_states[-1] (after the final norm)
    (/root/reference/diffsynth/models/qwen_image_text_encoder.py:1-255).
    For text-only prompts Qwen2.5-VL's mRoPE degenerates to standard RoPE
    (all three position streams are arange), so one decoder covers both.

Architecture (shared by both families): RMSNorm -> GQA attention with RoPE
(optional q/k/v biases: Qwen yes, LLaMA no) -> residual -> RMSNorm -> SwiGLU
MLP -> residual; scan-stacked blocks with an optional early stop.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, rms_norm, init_linear, init_rms_norm


@dataclass(frozen=True)
class DecoderLMConfig:
    vocab_size: int
    hidden: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    ffn: int
    rope_theta: float = 10000.0
    eps: float = 1e-5
    qkv_bias: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads


# llava-llama-3-8b text tower used by HunyuanVideo (reference
# hunyuan_video_text_encoder.py builds it as transformers LlamaModel)
LLAMA3_8B = DecoderLMConfig(vocab_size=128320, hidden=4096, num_layers=32,
                            num_heads=32, num_kv_heads=8, ffn=14336,
                            rope_theta=500000.0, eps=1e-5, qkv_bias=False)
# Qwen2.5-VL-7B text path (reference qwen_image_text_encoder.py config dict)
QWEN25_VL_7B_TEXT = DecoderLMConfig(vocab_size=152064, hidden=3584,
                                    num_layers=28, num_heads=28,
                                    num_kv_heads=4, ffn=18944,
                                    rope_theta=1000000.0, eps=1e-6,
                                    qkv_bias=True)
DECODER_LM_TINY = DecoderLMConfig(vocab_size=128, hidden=64, num_layers=2,
                                  num_heads=4, num_kv_heads=2, ffn=128,
                                  rope_theta=10000.0, eps=1e-5, qkv_bias=True)


def rope_tables(cfg: DecoderLMConfig, length: int):
    """HF-style rotary tables: (L, head_dim) cos/sin, fp32, half-split layout."""
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2,
                                              dtype=np.float64) / cfg.head_dim))
    t = np.arange(length, dtype=np.float64)
    freqs = np.outer(t, inv)                       # (L, D/2)
    emb = np.concatenate([freqs, freqs], axis=-1)  # (L, D)
    return (jnp.asarray(np.cos(emb), jnp.float32),
            jnp.asarray(np.sin(emb), jnp.float32))


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _apply_rope(x, cos, sin):
    """x: (B, L, H, D); cos/sin: (L, D). HF llama semantics, fp32 rotate."""
    xf = x.astype(jnp.float32)
    out = xf * cos[None, :, None, :] + _rotate_half(xf) * sin[None, :, None, :]
    return out.astype(x.dtype)


def _gqa_attention(q, k, v, bias):
    """q: (B, L, H, D); k/v: (B, L, Hkv, D); bias: (B, 1, L, L) fp32."""
    b, l, h, d = q.shape
    rep = h // k.shape[2]
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(d)
    logits = logits + bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", probs, v)


def decoder_block(p, x, cos, sin, bias, cfg: DecoderLMConfig):
    b, l, _ = x.shape
    h = rms_norm(p["input_ln"], x, cfg.eps)
    q = linear(p["q"], h).reshape(b, l, cfg.num_heads, cfg.head_dim)
    k = linear(p["k"], h).reshape(b, l, cfg.num_kv_heads, cfg.head_dim)
    v = linear(p["v"], h).reshape(b, l, cfg.num_kv_heads, cfg.head_dim)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    attn = _gqa_attention(q, k, v, bias).reshape(b, l, cfg.hidden)
    x = x + linear(p["o"], attn)
    h = rms_norm(p["post_ln"], x, cfg.eps)
    mlp = linear(p["down"], jax.nn.silu(linear(p["gate"], h)) * linear(p["up"], h))
    return x + mlp


def mrope_tables(cfg: DecoderLMConfig, position_ids, mrope_section):
    """Qwen2.5-VL multimodal RoPE: position_ids (3, L) t/h/w streams ->
    combined (L, head_dim) cos/sin with the channel split of
    apply_multimodal_rotary_pos_emb (sections doubled, stream i%3 per
    piece). Text-only sequences (all streams equal) reduce to rope_tables."""
    inv = jnp.asarray(
        1.0 / (cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2,
                                            dtype=np.float64) / cfg.head_dim)),
        jnp.float32)
    pos = jnp.asarray(position_ids, jnp.float32)            # (3, L)
    freqs = pos[..., None] * inv                            # (3, L, D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)          # (3, L, D)
    cos3, sin3 = jnp.cos(emb), jnp.sin(emb)
    secs = list(mrope_section) * 2
    bounds = np.cumsum([0] + secs)
    cos = jnp.concatenate([cos3[i % 3, :, bounds[i]:bounds[i + 1]]
                           for i in range(len(secs))], axis=-1)
    sin = jnp.concatenate([sin3[i % 3, :, bounds[i]:bounds[i + 1]]
                           for i in range(len(secs))], axis=-1)
    return cos, sin


def decoder_lm_forward(params, cfg: DecoderLMConfig, input_ids,
                       attention_mask=None, stop_skip_layers: int = 0,
                       final_norm: bool = True, inputs_embeds=None,
                       position_ids=None, mrope_section=None):
    """Hidden states of the decoder stack.

    stop_skip_layers: reference `hidden_state_skip_layer` — run only
    num_layers - stop_skip_layers - 1 + 1 layers and return WITHOUT the
    final norm (hunyuan_video_text_encoder.py:33-49 break condition:
    layer_id + skip + 1 >= num_layers runs layers [0 .. num_layers-skip-1]).
    final_norm applies the end RMSNorm (Qwen hidden_states[-1] semantics).
    inputs_embeds overrides the token embedding (vision-token injection,
    Qwen2_5_VLModel masked_scatter semantics). position_ids (3, L) with
    mrope_section enables Qwen2.5-VL multimodal RoPE."""
    b, l = input_ids.shape
    x = (inputs_embeds if inputs_embeds is not None
         else jnp.take(params["embed"], input_ids, axis=0))
    if position_ids is not None and mrope_section is not None:
        cos, sin = mrope_tables(cfg, position_ids, mrope_section)
    else:
        cos, sin = rope_tables(cfg, l)
    causal = np.triu(np.full((l, l), -np.inf, np.float32), k=1)
    bias = jnp.asarray(causal)[None, None]
    if attention_mask is not None:
        # pad-KEY masking (HF _update_causal_mask semantics); with the
        # right-padded tokenizers used here every query row still sees the
        # real prefix, so no all-masked softmax rows arise
        pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -jnp.inf)
        bias = bias + pad.astype(jnp.float32)

    n_run = cfg.num_layers - stop_skip_layers if stop_skip_layers else cfg.num_layers
    blocks = jax.tree_util.tree_map(lambda a: a[:n_run], params["blocks"])

    def scan_fn(carry, bp):
        return decoder_block(bp, carry, cos, sin, bias, cfg), None

    x, _ = jax.lax.scan(scan_fn, x, blocks)
    if final_norm and stop_skip_layers == 0:
        x = rms_norm(params["final_ln"], x, cfg.eps)
    return x


def detect_decoder_lm_config(sd, family: str = "llama") -> DecoderLMConfig:
    """Derive the architecture from state-dict shapes (the framework's
    structural-detection stance, utils/ckpt.py) — head_dim is 128 across the
    Llama-3/Qwen2.5 families; family picks theta/eps/bias conventions."""
    sd = _strip_prefix(sd)
    vocab, hidden = sd["embed_tokens.weight"].shape
    n_layers = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("layers."))
    kv_dim = sd["layers.0.self_attn.k_proj.weight"].shape[0]
    ffn = sd["layers.0.mlp.gate_proj.weight"].shape[0]
    head_dim = 128
    if family == "qwen":
        return DecoderLMConfig(vocab_size=vocab, hidden=hidden,
                               num_layers=n_layers,
                               num_heads=hidden // head_dim,
                               num_kv_heads=kv_dim // head_dim, ffn=ffn,
                               rope_theta=1000000.0, eps=1e-6, qkv_bias=True)
    return DecoderLMConfig(vocab_size=vocab, hidden=hidden,
                           num_layers=n_layers, num_heads=hidden // head_dim,
                           num_kv_heads=kv_dim // head_dim, ffn=ffn,
                           rope_theta=500000.0, eps=1e-5, qkv_bias=False)


# ---------------------------------------------------------------- converters

def _strip_prefix(sd):
    """Normalize HF key prefixes: model.language_model. / model. / none."""
    out = {}
    for k, v in sd.items():
        for pre in ("model.language_model.", "language_model.model.",
                    "language_model.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        out[k] = v
    return out


def convert_decoder_lm(sd, cfg: DecoderLMConfig, dtype=jnp.bfloat16):
    """HF Llama/Qwen2(-VL text) state dict -> stacked param pytree."""
    sd = _strip_prefix(sd)

    def _j(v, dt=dtype):
        return jnp.asarray(np.asarray(v), dt)

    def lin(name, i, bias):
        p = {"w": _j(sd[f"layers.{i}.{name}.weight"]).T}
        bk = f"layers.{i}.{name}.bias"
        if bias and bk in sd:
            p["b"] = _j(sd[bk])
        return p

    def block(i):
        return {
            "input_ln": {"scale": _j(sd[f"layers.{i}.input_layernorm.weight"])},
            "post_ln": {"scale": _j(
                sd[f"layers.{i}.post_attention_layernorm.weight"])},
            "q": lin("self_attn.q_proj", i, cfg.qkv_bias),
            "k": lin("self_attn.k_proj", i, cfg.qkv_bias),
            "v": lin("self_attn.v_proj", i, cfg.qkv_bias),
            "o": lin("self_attn.o_proj", i, False),
            "gate": lin("mlp.gate_proj", i, False),
            "up": lin("mlp.up_proj", i, False),
            "down": lin("mlp.down_proj", i, False),
        }

    from .wan_dit import stack_blocks
    return {
        "embed": _j(sd["embed_tokens.weight"]),
        "blocks": stack_blocks([block(i) for i in range(cfg.num_layers)]),
        "final_ln": {"scale": _j(sd["norm.weight"])},
    }


def init_decoder_lm(key, cfg: DecoderLMConfig, dtype=jnp.float32):
    from .wan_dit import stack_blocks
    ks = jax.random.split(key, cfg.num_layers + 2)

    def block(k):
        kk = jax.random.split(k, 7)
        return {
            "input_ln": init_rms_norm(cfg.hidden, dtype),
            "post_ln": init_rms_norm(cfg.hidden, dtype),
            "q": init_linear(kk[0], cfg.hidden, cfg.hidden, bias=cfg.qkv_bias,
                             dtype=dtype),
            "k": init_linear(kk[1], cfg.hidden,
                             cfg.num_kv_heads * cfg.head_dim,
                             bias=cfg.qkv_bias, dtype=dtype),
            "v": init_linear(kk[2], cfg.hidden,
                             cfg.num_kv_heads * cfg.head_dim,
                             bias=cfg.qkv_bias, dtype=dtype),
            "o": init_linear(kk[3], cfg.hidden, cfg.hidden, bias=False,
                             dtype=dtype),
            "gate": init_linear(kk[4], cfg.hidden, cfg.ffn, bias=False,
                                dtype=dtype),
            "up": init_linear(kk[5], cfg.hidden, cfg.ffn, bias=False,
                              dtype=dtype),
            "down": init_linear(kk[6], cfg.ffn, cfg.hidden, bias=False,
                                dtype=dtype),
        }

    return {
        "embed": (jax.random.normal(ks[0], (cfg.vocab_size, cfg.hidden),
                                    jnp.float32) * 0.02).astype(dtype),
        "blocks": stack_blocks([block(ks[2 + i])
                                for i in range(cfg.num_layers)]),
        "final_ln": init_rms_norm(cfg.hidden, dtype),
    }
