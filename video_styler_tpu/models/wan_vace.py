"""VACE control branch for the Wan DiT.

Functional re-design of VaceWanModel
(/root/reference/diffsynth/models/wan_video_vace.py:5-113): its own patch
embedding over the 96-channel vace context (inactive/reactive latents +
64-channel mask), a chain of DiT blocks with before_proj/after_proj, producing
additive hints injected into the trunk at mapped layers.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.basic import linear, init_linear
from .wan_dit import (
    WanDiTConfig, WAN_T2V_1_3B, WAN_T2V_14B, WAN_DIT_TINY,
    init_dit_block, dit_block, patchify, stack_blocks,
)


@dataclass(frozen=True)
class VaceConfig:
    vace_layers: Tuple[int, ...]
    vace_in_dim: int = 96
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    dim: int = 1536
    num_heads: int = 12
    ffn_dim: int = 8960
    eps: float = 1e-6
    has_image_input: bool = False

    def block_cfg(self) -> WanDiTConfig:
        return WanDiTConfig(dim=self.dim, in_dim=self.vace_in_dim,
                            ffn_dim=self.ffn_dim, out_dim=16,
                            num_heads=self.num_heads, num_layers=len(self.vace_layers),
                            eps=self.eps, patch_size=self.patch_size,
                            has_image_input=self.has_image_input)


VACE_1_3B = VaceConfig(vace_layers=tuple(range(0, 30, 2)), dim=1536,
                       num_heads=12, ffn_dim=8960)
VACE_14B = VaceConfig(vace_layers=(0, 5, 10, 15, 20, 25, 30, 35), dim=5120,
                      num_heads=40, ffn_dim=13824)
VACE_TINY = VaceConfig(vace_layers=(0, 1), dim=128, num_heads=2, ffn_dim=256,
                       vace_in_dim=96)


def init_vace(key, cfg: VaceConfig, dtype=jnp.float32):
    bcfg = cfg.block_cfg()
    n = len(cfg.vace_layers)
    ks = jax.random.split(key, n + 3)
    pt, ph, pw = cfg.patch_size
    blocks = [init_dit_block(ks[i], bcfg, dtype) for i in range(n)]
    after = [init_linear(jax.random.fold_in(ks[n], i), cfg.dim, cfg.dim, dtype=dtype)
             for i in range(n)]
    return {
        "patch_embedding": init_linear(ks[n + 1], cfg.vace_in_dim * pt * ph * pw,
                                       cfg.dim, dtype=dtype),
        "before_proj": init_linear(ks[n + 2], cfg.dim, cfg.dim, dtype=dtype),
        "blocks": stack_blocks(blocks),
        "after_proj": stack_blocks(after),
    }


def vace_forward(params, cfg: VaceConfig, x_tokens, vace_context, context,
                 t_mod, cos, sin, seq_valid=None):
    """Produce the per-mapped-layer hint list (wan_video_vace.py:53-87).

    x_tokens: trunk tokens after patchify (B, S, D) — possibly carrying
    mesh-divisibility padding, in which case seq_valid is the true length
    (masked per-layer inside dit_block, models/wan_dit.py);
    vace_context: (B, vace_in_dim, F, H, W).
    Returns hints: (num_vace_layers, B, S, D).
    """
    bcfg = cfg.block_cfg()
    c, _ = patchify(params["patch_embedding"], vace_context, cfg.patch_size)
    s_x, s_c = x_tokens.shape[1], c.shape[1]
    if s_c < s_x:
        c = jnp.pad(c, ((0, 0), (0, s_x - s_c), (0, 0)))
    c = linear(params["before_proj"], c) + x_tokens

    def scan_fn(carry, layer_p):
        block_p, after_p = layer_p
        carry = dit_block(block_p, carry, context, t_mod, cos, sin, bcfg,
                          seq_valid)
        hint = linear(after_p, carry)
        return carry, hint

    _, hints = jax.lax.scan(scan_fn, c, (params["blocks"], params["after_proj"]))
    return hints
