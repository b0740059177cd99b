"""SD3 text encoders, TPU-native.

- SD3TextEncoder1 (/root/reference/diffsynth/models/sd3_text_encoder.py:7-27):
  CLIP-L (the SD-1.5 text encoder architecture) returning (pooled, hidden)
  where hidden is taken at `clip_skip` layers before the end (no final norm)
  and pooled is the final-norm embedding at the argmax (EOS) token.
- SD3TextEncoder2 is the SDXL second text encoder (OpenCLIP bigG) — reuse
  models/sdxl.py.
- SD3TextEncoder3 / FLUX text encoder 2 is T5-XXL v1.1 — see models/t5.py
  (T5_V11_XXL + convert_hf_t5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.basic import linear, layer_norm
from .sd import attn


def sd3_text_encoder_1_forward(params, input_ids, clip_skip: int = 2,
                               num_layers: int = 12, num_heads: int = 12,
                               extra_mask=None):
    """SD3TextEncoder1.forward (sd3_text_encoder.py:11-23).

    Returns (pooled (B, D), hidden (B, L, D))."""
    x = jnp.take(params["token_embedding"]["weight"], input_ids, axis=0)
    x = x + params["position_embeds"].astype(x.dtype)
    L = x.shape[1]
    mask = jnp.triu(jnp.full((L, L), -jnp.inf, jnp.float32), k=1)
    if extra_mask is not None:
        mask = jnp.where(extra_mask[0][None, :] == 0, -jnp.inf, mask)
    hidden = None
    for i in range(num_layers):
        p = params["encoders"][str(i)]
        h = layer_norm(p["layer_norm1"], x, 1e-5)
        x = x + attn(p["attn"], h, num_heads=num_heads, mask=mask)
        h = layer_norm(p["layer_norm2"], x, 1e-5)
        h = linear(p["fc1"], h)
        h = h * jax.nn.sigmoid(1.702 * h)          # quickGELU
        x = x + linear(p["fc2"], h)
        if i + clip_skip == num_layers:
            hidden = x
    embeds = layer_norm(params["final_layer_norm"], x, 1e-5)
    pooled = embeds[jnp.arange(embeds.shape[0]),
                    jnp.argmax(input_ids, axis=-1)]
    if hidden is None:
        hidden = embeds
    return pooled, hidden


def convert_sd3_text_encoder_1(sd, dtype=jnp.float32):
    from .sd import convert_sd_module
    return convert_sd_module(sd, dtype=dtype)
