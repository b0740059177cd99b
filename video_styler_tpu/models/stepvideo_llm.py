"""STEP1 text-encoder LLM (StepVideo's 6144-d caption tower), TPU-native.

Re-design of the reference Step1Model
(/root/reference/diffsynth/models/stepvideo_text_encoder.py:55-521):
a position-embedding-free causal decoder with multi-query attention
(n_heads queries over n_groups shared KV heads), SwiGLU FFN, and RMSNorm.

Faithfulness notes (verified against the reference code):
- There is NO rotary/positional embedding anywhere — word embeddings go
  straight into the blocks (LLaMaEmbedding, :55-102).
- The attention-mask argument is ignored on the attention path; only the
  causal structure applies (flash_attn_func fallback uses is_causal=True
  and drops the padding mask, :245-253). The padding mask is returned to
  the DiT, which applies it to cross-attention.
- Blocks are stacked and run under `jax.lax.scan`; attention uses a single
  fused QKV projection per block.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, rms_norm, init_linear


@dataclass(frozen=True)
class Step1LLMConfig:
    hidden_size: int = 6144
    num_heads: int = 48
    num_groups: int = 8          # KV heads (multi-query groups)
    ffn_hidden: int = 16384
    num_layers: int = 48
    vocab_size: int = 65536
    eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


STEP1_LLM = Step1LLMConfig()
STEP1_LLM_TINY = Step1LLMConfig(hidden_size=32, num_heads=4, num_groups=2,
                                ffn_hidden=512, num_layers=2, vocab_size=64)


def _causal_attention(q, k, v):
    """(B, S, H, D) causal SDPA in fp32 accumulate."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    S = q.shape[1]
    causal = jnp.tril(jnp.ones((S, S), bool))
    logits = jnp.where(causal[None, None], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def step1_block(p, x, cfg: Step1LLMConfig):
    """TransformerBlock.forward (stepvideo_text_encoder.py:408-453)."""
    h = rms_norm(p["attention_norm"], x, cfg.eps)
    qkv = linear(p["wqkv"], h)
    d = cfg.hidden_size
    hd = cfg.head_dim
    q = qkv[..., :d].reshape(x.shape[0], x.shape[1], cfg.num_heads, hd)
    kv = qkv[..., d:].reshape(x.shape[0], x.shape[1], cfg.num_groups, 2 * hd)
    k, v = jnp.split(kv, 2, axis=-1)
    rep = cfg.num_heads // cfg.num_groups
    # repeat_interleave over the group axis (MultiQueryAttention, :391-404)
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    out = _causal_attention(q, k, v)
    out = out.reshape(x.shape[0], x.shape[1], d)
    x = x + linear(p["wo"], out)

    h = rms_norm(p["ffn_norm"], x, cfg.eps)
    h = linear(p["w1"], h)
    a, b = jnp.split(h, 2, axis=-1)
    h = jax.nn.silu(a.astype(jnp.float32)).astype(b.dtype) * b
    return x + linear(p["w2"], h)


def step1_llm_forward(params, cfg: Step1LLMConfig, input_ids):
    """Step1Model.forward (stepvideo_text_encoder.py:497-521):
    input_ids (B, S) -> hidden states (B, S, hidden). No final norm."""
    emb = params["word_embeddings"].astype(jnp.float32)
    x = jnp.take(emb, input_ids, axis=0).astype(
        params["blocks"]["wo"]["w"].dtype)

    def scan_fn(carry, bp):
        return step1_block(bp, carry, cfg), None

    x, _ = jax.lax.scan(scan_fn, x, params["blocks"])
    return x


def convert_step1_llm(sd, cfg: Step1LLMConfig = STEP1_LLM,
                      dtype=jnp.bfloat16):
    """Torch Step1Model state dict -> pytree (blocks stacked for scan)."""
    from .wan_dit import stack_blocks

    def _j(v, dt=dtype):
        return jnp.asarray(np.asarray(v.float() if hasattr(v, "float")
                                      else v), dt)

    def block(i):
        p = f"transformer.layers.{i}"
        return {
            "attention_norm": {"scale": _j(sd[f"{p}.attention_norm.weight"])},
            "ffn_norm": {"scale": _j(sd[f"{p}.ffn_norm.weight"])},
            "wqkv": {"w": _j(sd[f"{p}.attention.wqkv.weight"]).T},
            "wo": {"w": _j(sd[f"{p}.attention.wo.weight"]).T},
            "w1": {"w": _j(sd[f"{p}.feed_forward.w1.weight"]).T},
            "w2": {"w": _j(sd[f"{p}.feed_forward.w2.weight"]).T},
        }

    n = 1 + max(int(k.split(".")[2]) for k in sd
                if k.startswith("transformer.layers."))
    return {
        "word_embeddings": _j(sd["tok_embeddings.word_embeddings.weight"],
                              jnp.float32),
        "blocks": stack_blocks([block(i) for i in range(n)]),
    }


def make_stepchat_tokenize(model_file: str):
    """Wrapped_StepChatTokenizer analog
    (stepvideo_text_encoder.py:198-242): sentencepiece ids framed as
    [BOS=1] + ids[:max-2] + [EOS=2], right-padded with PAD=2. Returns a
    callable(prompt, max_length) -> (ids (1, S), mask (1, S)). Gated on the
    optional sentencepiece dependency."""
    try:
        import sentencepiece
    except ImportError as e:       # pragma: no cover - env-dependent
        raise ImportError(
            "StepChat tokenization needs the optional `sentencepiece` "
            "package; pass a custom step1_tokenize callable instead") from e
    sp = sentencepiece.SentencePieceProcessor(model_file=model_file)
    BOS, EOS, PAD = 1, 2, 2

    def tokenize(prompt: str, max_length: int):
        ids = [BOS] + list(sp.encode_as_ids(prompt))[:max_length - 2] + [EOS]
        n = len(ids)
        ids = ids + [PAD] * (max_length - n)
        mask = [1] * n + [0] * (max_length - n)
        return (np.asarray([ids], np.int64), np.asarray([mask], np.int64))

    return tokenize


def init_step1_llm(key, cfg: Step1LLMConfig = STEP1_LLM_TINY,
                   dtype=jnp.float32):
    from .wan_dit import stack_blocks
    d, hd = cfg.hidden_size, cfg.head_dim
    ks = iter(jax.random.split(key, 1 + 4 * cfg.num_layers))
    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append({
            "attention_norm": {"scale": jnp.ones((d,), dtype)},
            "ffn_norm": {"scale": jnp.ones((d,), dtype)},
            "wqkv": init_linear(next(ks), d, d + 2 * hd * cfg.num_groups,
                                bias=False, dtype=dtype),
            "wo": init_linear(next(ks), d, d, bias=False, dtype=dtype),
            "w1": init_linear(next(ks), d, 2 * cfg.ffn_hidden, bias=False,
                              dtype=dtype),
            "w2": init_linear(next(ks), cfg.ffn_hidden, d, bias=False,
                              dtype=dtype),
        })
    return {
        "word_embeddings": jax.random.normal(
            next(ks), (cfg.vocab_size, d), jnp.float32) * 0.02,
        "blocks": stack_blocks(blocks),
    }
