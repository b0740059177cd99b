"""Attention for the TPU build.

`sdpa` is the XLA-fused reference path (fp32 softmax accumulation, the same
semantics as torch F.scaled_dot_product_attention used as the reference
fallback at wan_video_dit.py:55-60). The Pallas flash-attention kernel lives
in ops/flash_attention.py and is selected automatically on TPU backends for
long sequences; both produce identical results within bf16 tolerance.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def sdpa(q, k, v, scale: Optional[float] = None, bias=None):
    """Scaled dot-product attention.

    q: (B, Sq, N, D), k/v: (B, Sk, N, D). Returns (B, Sq, N, D).
    Softmax is computed in float32.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


_QUANTIZED_ATTENTION = False


def set_quantized_attention(enabled: bool):
    """Route long-sequence attention through the SageAttention-style int8
    kernel (flash_attention.flash_attention_int8) — the TPU analog of the
    reference's sageattention backend (wan_video_dit.py:9-26). Opt-in, like
    the reference chain: full-quality bf16 stays the default."""
    global _QUANTIZED_ATTENTION
    _QUANTIZED_ATTENTION = bool(enabled)


def attention(q, k, v, scale: Optional[float] = None,
              use_flash: Optional[bool] = None,
              kv_valid: Optional[int] = None):
    """Dispatch between the Pallas flash kernel (TPU, long seq) and sdpa.

    Mirrors the reference backend chain (wan_video_dit.py:28-61) collapsed to
    TPU-native choices: int8 Sage-style kernel (opt-in) -> bf16 flash
    kernel -> XLA sdpa.

    kv_valid: static count of real keys when the sequence was zero-padded
    for mesh divisibility (parallel/context.seq_pad_amount). Keys beyond it
    are excluded exactly — implemented as a static slice of k/v, whose vjp
    zero-pads the gradient back, so fwd and bwd both stay exact. (The
    reference's pad path lets zero-pad tokens leak into the softmax,
    xdit_context_parallel.py:76-80; we don't.)
    """
    if kv_valid is not None and kv_valid < k.shape[1]:
        k = k[:, :kv_valid]
        v = v[:, :kv_valid]
    if use_flash is None:
        use_flash = (
            jax.default_backend() == "tpu"
            and q.shape[1] >= 1024
            and q.shape[-1] % 128 == 0
        )
    if use_flash:
        try:
            if _QUANTIZED_ATTENTION:
                from .flash_attention import flash_attention_int8 as _flash8
                return _flash8(q, k, v, scale=scale)
            from .flash_attention import flash_attention as _flash
            return _flash(q, k, v, scale=scale)
        except Exception as e:
            global _WARNED_FALLBACK
            if not _WARNED_FALLBACK:
                _WARNED_FALLBACK = True
                import warnings
                warnings.warn(
                    f"flash attention unavailable at shape {q.shape} "
                    f"({type(e).__name__}: {e}); falling back to XLA sdpa — "
                    "a silent ~2x attention slowdown if this is a hot path.")
    return sdpa(q, k, v, scale=scale)


_WARNED_FALLBACK = False
