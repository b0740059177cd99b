"""Qwen-Image block-wise ControlNet, TPU-native.

Re-design of QwenImageBlockWiseControlNet
(/root/reference/diffsynth/models/qwen_image_controlnet.py:7-74): one tiny
[RMS, RMS, linear, GELU, linear] block per DiT layer that maps
(image tokens, processed control tokens) -> a residual added back to the
image tokens after that layer. Instead of 60 separate Module calls, the
per-layer blocks are STACKED along a leading axis and ride the DiT's
`lax.scan` (see qwen_image_dit.qwen_image_dit_forward), so the control
residual fuses into the block loop with zero host round-trips.

Masked-inpaint variants carry an extra latent channel group
(additional_in_dim=4, converter hash a9e54e480a628f0b956a688a81c33bab).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from einops import rearrange

from ..ops.basic import linear, init_linear


def _rms(p, x, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), -1, keepdims=True) + eps)
    return y.astype(x.dtype) * p["scale"].astype(x.dtype)


def qwen_blockwise_cn_process(params, conditioning_latents):
    """process_controlnet_conditioning (qwen_image_controlnet.py:53-54):
    patchify the VAE-encoded control latents and lift to the DiT width."""
    tokens = rearrange(conditioning_latents,
                       "B C (H P) (W Q) -> B (H W) (C P Q)", P=2, Q=2)
    return linear(params["img_in"], tokens)


def qwen_blockwise_cn_block(bp, x, y, eps: float = 1e-6):
    """BlockWiseControlBlock.forward (qwen_image_controlnet.py:17-22)."""
    x = _rms(bp["x_rms"], x, eps)
    y = _rms(bp["y_rms"], y, eps)
    h = linear(bp["input_proj"], x + y)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    return linear(bp["output_proj"], h)


def convert_qwen_blockwise_controlnet(sd, dtype=jnp.bfloat16):
    """Torch state dict -> {'img_in', 'blocks' (stacked leading axis)}."""
    from .wan_dit import stack_blocks

    def _j(v):
        return jnp.asarray(np.asarray(v.float() if hasattr(v, "float")
                                      else v), dtype)

    n = 1 + max(int(k.split(".")[1]) for k in sd
                if k.startswith("controlnet_blocks."))

    def block(i):
        p = f"controlnet_blocks.{i}"
        return {
            "x_rms": {"scale": _j(sd[f"{p}.x_rms.weight"])},
            "y_rms": {"scale": _j(sd[f"{p}.y_rms.weight"])},
            "input_proj": {"w": _j(sd[f"{p}.input_proj.weight"]).T,
                           "b": _j(sd[f"{p}.input_proj.bias"])},
            "output_proj": {"w": _j(sd[f"{p}.output_proj.weight"]).T,
                            "b": _j(sd[f"{p}.output_proj.bias"])},
        }

    return {
        "img_in": {"w": _j(sd["img_in.weight"]).T,
                   "b": _j(sd["img_in.bias"])},
        "blocks": stack_blocks([block(i) for i in range(n)]),
    }


def init_qwen_blockwise_controlnet(key, num_layers: int = 2, in_dim: int = 64,
                                   additional_in_dim: int = 0, dim: int = 32,
                                   dtype=jnp.float32):
    from .wan_dit import stack_blocks
    ks = iter(jax.random.split(key, 1 + 2 * num_layers))
    blocks = []
    for _ in range(num_layers):
        blocks.append({
            "x_rms": {"scale": jnp.ones((dim,), dtype)},
            "y_rms": {"scale": jnp.ones((dim,), dtype)},
            "input_proj": init_linear(next(ks), dim, dim, dtype=dtype),
            "output_proj": init_linear(next(ks), dim, dim, dtype=dtype),
        })
    return {
        "img_in": init_linear(next(ks), in_dim + additional_in_dim, dim,
                              dtype=dtype),
        "blocks": stack_blocks(blocks),
    }
