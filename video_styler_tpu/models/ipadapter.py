"""IP-Adapters for SD / SDXL, TPU-native.

Re-designs of SDIpAdapter (/root/reference/diffsynth/models/sd_ipadapter.py
:18-52) and SDXLIpAdapter (sdxl_ipadapter.py:44-103): a CLIP image embedding
is projected to `clip_extra_context_tokens` context tokens; per attention
site a (to_k_ip, to_v_ip) pair produces decoupled kv that the UNet cross
attention adds as `scale * sdpa(q, ip_k, ip_v)`.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..ops.basic import linear, layer_norm

# UNet attention sites: block_id -> transformer-layer count mapping to the
# flat ipadapter_modules list order
SD_IPADAPTER_BLOCK_IDS = [1, 4, 9, 12, 17, 20, 40, 43, 46, 50, 53, 56, 60,
                          63, 66, 29]                # (sd_ipadapter.py:27-29)
SDXL_IPADAPTER_MAP = sum([
    [(7, i) for i in range(2)],
    [(10, i) for i in range(2)],
    [(15, i) for i in range(10)],
    [(18, i) for i in range(10)],
    [(25, i) for i in range(10)],
    [(28, i) for i in range(10)],
    [(31, i) for i in range(10)],
    [(35, i) for i in range(2)],
    [(38, i) for i in range(2)],
    [(41, i) for i in range(2)],
    [(21, i) for i in range(10)],
], [])                                               # (sdxl_ipadapter.py:52-66)


def image_proj(p, image_embeds, extra_tokens: int):
    """IpAdapterImageProjModel (sdxl_ipadapter.py:17-28)."""
    h = linear(p["proj"], image_embeds)
    h = h.reshape(-1, extra_tokens, h.shape[-1] // extra_tokens)
    return layer_norm(p["norm"], h, 1e-5)


def ipadapter_kwargs(params, image_embeds, scale: float = 1.0,
                     xl: bool = False, extra_tokens: int = 4,
                     instant_style: bool = False) -> Dict:
    """-> {block_id: {transformer_id: (ip_k, ip_v, scale)}} consumed by
    sd_unet_forward / sdxl_unet_forward (SDIpAdapter.forward,
    sd_ipadapter.py:33-47). instant_style keeps only the style blocks —
    SDXLIpAdapter.set_less_adapter (sdxl_ipadapter.py:67-82) restricts the
    map to modules 34..43 (UNet block 28's ten transformers)."""
    tokens = image_proj(params["image_proj"], image_embeds, extra_tokens)
    tokens = tokens.reshape(1, -1, tokens.shape[-1])
    out: Dict = {}
    if xl:
        mapping = {site: j for j, site in enumerate(SDXL_IPADAPTER_MAP)}
        if instant_style:
            mapping = {site: j for site, j in mapping.items()
                       if 34 <= j < 44}
        for (block_id, transformer_id), j in mapping.items():
            m = params["ipadapter_modules"][str(j)]
            out.setdefault(block_id, {})[transformer_id] = (
                linear(m["to_k_ip"], tokens), linear(m["to_v_ip"], tokens),
                scale)
    else:
        for j, block_id in enumerate(SD_IPADAPTER_BLOCK_IDS):
            m = params["ipadapter_modules"][str(j)]
            out.setdefault(block_id, {})[0] = (
                linear(m["to_k_ip"], tokens), linear(m["to_v_ip"], tokens),
                scale)
    return out


def convert_ipadapter(sd, dtype=jnp.float32):
    from .sd import convert_sd_module
    return convert_sd_module(sd, dtype=dtype)
