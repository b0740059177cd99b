"""Core neural-net primitives as pure functions over param pytrees.

Numerical contracts mirror the reference implementation
(/root/reference/diffsynth/models/wan_video_dit.py:64-111 and
wan_video_text_encoder.py:15-35): RMSNorm and LayerNorm statistics are
computed in float32 and cast back to the activation dtype; GELU uses the
tanh approximation; the sinusoidal timestep embedding is cos-first.

Params are plain dicts:
  linear:     {"w": (in, out), "b": (out,)} (b optional)
  layer_norm: {"scale": (dim,), "bias": (dim,)} (both optional)
  rms_norm:   {"scale": (dim,)}
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True,
                dtype=jnp.float32, std: Optional[float] = None):
    kw, _ = jax.random.split(key)
    if std is None:
        std = 1.0 / math.sqrt(in_dim)
    p = {"w": (jax.random.normal(kw, (in_dim, out_dim), jnp.float32) * std).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def init_layer_norm(dim: int, elementwise_affine: bool = True, dtype=jnp.float32):
    if not elementwise_affine:
        return {}
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_rms_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


def linear(p, x):
    """y = x @ w (+ b). Accumulates in fp32 on the MXU, returns x.dtype.

    Dispatches to the quantized path when the leaf was rewritten by
    ops.quant.quantize_params ("w_q" present): int8 runs the MXU at 2x the
    bf16 rate — the TPU analog of the reference's fp8 `torch._scaled_mm`
    (vram_management/layers.py:115-151)."""
    if "w_q4" in p:
        from .quant import linear_int4, linear_int4_g
        if p["w_scale"].ndim == p["w_q4"].ndim + 1:
            return linear_int4_g(p, x)  # group scales -> w4a16
        return linear_int4(p, x)        # per-column -> w4a8
    if "w_q" in p:
        from .quant import linear_fp8, linear_int8
        if p["w_q"].dtype == jnp.int8:
            return linear_int8(p, x)
        return linear_fp8(p, x)
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(p, x, eps: float = 1e-6):
    """LayerNorm with fp32 statistics (torch semantics on low-precision input)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.astype(x.dtype)
    if "scale" in p:
        y = y * p["scale"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def rms_norm(p, x, eps: float = 1e-5):
    """x * rsqrt(mean(x^2) + eps) in fp32, cast back, then * scale.

    Matches reference RMSNorm (wan_video_dit.py:100-111): the normalization is
    done in fp32 and cast to the input dtype *before* the weight multiply.
    """
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return y.astype(x.dtype) * p["scale"].astype(x.dtype)


def t5_layer_norm(p, x, eps: float = 1e-6):
    """T5-style RMS layernorm (wan_video_text_encoder.py:22-35): fp32 mean of
    squares on the *fp32* input, weight multiply after casting to weight dtype."""
    xf = x.astype(jnp.float32)
    y = x * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps).astype(x.dtype)
    return p["scale"].astype(x.dtype) * y


def gelu_tanh(x):
    """GELU with tanh approximation (reference nn.GELU(approximate='tanh'))."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (xf + 0.044715 * xf ** 3)))
    return y.astype(x.dtype)


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def silu(x):
    return jax.nn.silu(x)


def modulate(x, shift, scale):
    """adaLN modulation: x * (1 + scale) + shift (wan_video_dit.py:64-65)."""
    return x * (1 + scale) + shift


def sinusoidal_embedding_1d(dim: int, position):
    """[cos | sin] sinusoidal embedding (wan_video_dit.py:68-72).

    position: (...,) float array. Returns (..., dim). The reference computes in
    float64; float32 is within bf16 quantization tolerance for t <= 1000.
    """
    half = dim // 2
    pos = jnp.asarray(position)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = pos.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=-1).astype(pos.dtype)
