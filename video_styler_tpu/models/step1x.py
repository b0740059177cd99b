"""Step1x-Edit connector: Qwen2.5-VL features -> FLUX conditioning.

Re-design of the reference Qwen2Connector
(/root/reference/diffsynth/models/step1x_connector.py:633-668): a
Hunyuan-style token refiner (timestep + masked-mean context gating, gated
self-attention blocks) lifting 3584-d Qwen2.5-VL hidden states to the FLUX
context width, plus a scale-factored masked-mean global projection to the
768-d pooled slot. The Qwen2.5-VL feature extraction itself
(models/qwenvl.py) is a host-side LLM pass served through an injectable
callable, like the other LLM-conditioned pipelines here.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, init_linear, init_layer_norm
from .wan_dit import stack_blocks


@dataclass(frozen=True)
class Step1xConnectorConfig:
    in_channels: int = 3584
    hidden_size: int = 4096
    num_heads: int = 32
    depth: int = 2
    pooled_dim: int = 768
    time_freq_dim: int = 256
    eps: float = 1e-6


STEP1X_CONNECTOR = Step1xConnectorConfig()
STEP1X_CONNECTOR_TINY = Step1xConnectorConfig(in_channels=16, hidden_size=32,
                                              num_heads=2, depth=2,
                                              pooled_dim=8)


def step1x_connector_forward(params, cfg: Step1xConnectorConfig, x, t, mask):
    """x (B, L, in_channels) Qwen hidden states; t (B,) timestep/1000;
    mask (B, L) {0,1} -> (encoder_hidden_states (B, L, hidden),
    pooled (B, 768))."""
    from .hunyuan_video_dit import token_refiner

    class _Shim:
        time_freq_dim = cfg.time_freq_dim
        num_heads = cfg.num_heads
        eps = cfg.eps

    refined = token_refiner(params["refiner"], _Shim, x, t, mask)

    mask_f = mask.astype(jnp.float32)[..., None]
    pooled = jnp.sum(x.astype(jnp.float32) * mask_f, axis=1) \
        / jnp.sum(mask_f, axis=1)
    pooled = pooled * (1.0 + params["scale_factor"].astype(jnp.float32))
    global_out = linear(params["global_proj_out"], pooled.astype(x.dtype))
    return refined, global_out


def init_step1x_connector(key, cfg: Step1xConnectorConfig = STEP1X_CONNECTOR_TINY,
                          dtype=jnp.float32):
    d = cfg.hidden_size
    ks = iter(jax.random.split(key, 8 + 6 * cfg.depth))
    blocks = []
    for _ in range(cfg.depth):
        blocks.append({
            "norm1": init_layer_norm(d, dtype=dtype),
            "self_attn_qkv": init_linear(next(ks), d, 3 * d, dtype=dtype),
            "self_attn_proj": init_linear(next(ks), d, d, dtype=dtype),
            "norm2": init_layer_norm(d, dtype=dtype),
            "mlp": {"0": init_linear(next(ks), d, 4 * d, dtype=dtype),
                    "2": init_linear(next(ks), 4 * d, d, dtype=dtype)},
            "adaLN_modulation": {
                "1": init_linear(next(ks), d, 2 * d, dtype=dtype)},
        })
    return {
        "refiner": {
            "input_embedder": init_linear(next(ks), cfg.in_channels, d,
                                          dtype=dtype),
            "t_embedder": {"fc1": init_linear(next(ks), cfg.time_freq_dim, d,
                                              dtype=dtype),
                           "fc2": init_linear(next(ks), d, d, dtype=dtype)},
            "c_embedder": {"0": init_linear(next(ks), cfg.in_channels, d,
                                            dtype=dtype),
                           "2": init_linear(next(ks), d, d, dtype=dtype)},
            "blocks": stack_blocks(blocks),
        },
        "global_proj_out": init_linear(next(ks), cfg.in_channels,
                                       cfg.pooled_dim, dtype=dtype),
        "scale_factor": jnp.full((1,), -(1 - 0.09), dtype),
    }


def convert_step1x_connector(sd, cfg: Step1xConnectorConfig = STEP1X_CONNECTOR,
                             dtype=jnp.bfloat16):
    """Qwen2Connector state dict (S.* refiner + global_proj_out +
    scale_factor; optional 'connector.' prefix) -> pytree."""
    def _np(v):
        return np.asarray(v.detach().float().cpu().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    sd = {k.removeprefix("connector."): v for k, v in sd.items()}

    def lin(k):
        p = {"w": jnp.asarray(_np(sd[f"{k}.weight"]).T, dtype)}
        if f"{k}.bias" in sd:
            p["b"] = jnp.asarray(_np(sd[f"{k}.bias"]), dtype)
        return p

    def ln(k):
        return {"scale": jnp.asarray(_np(sd[f"{k}.weight"]), dtype),
                "bias": jnp.asarray(_np(sd[f"{k}.bias"]), dtype)}

    blocks = []
    for i in range(cfg.depth):
        b = f"S.individual_token_refiner.blocks.{i}"
        blocks.append({
            "norm1": ln(f"{b}.norm1"),
            "self_attn_qkv": lin(f"{b}.self_attn_qkv"),
            "self_attn_proj": lin(f"{b}.self_attn_proj"),
            "norm2": ln(f"{b}.norm2"),
            "mlp": {"0": lin(f"{b}.mlp.fc1"), "2": lin(f"{b}.mlp.fc2")},
            "adaLN_modulation": {"1": lin(f"{b}.adaLN_modulation.1")},
        })
    return {
        "refiner": {
            "input_embedder": lin("S.input_embedder"),
            "t_embedder": {"fc1": lin("S.t_embedder.mlp.0"),
                           "fc2": lin("S.t_embedder.mlp.2")},
            "c_embedder": {"0": lin("S.c_embedder.linear_1"),
                           "2": lin("S.c_embedder.linear_2")},
            "blocks": stack_blocks(blocks),
        },
        "global_proj_out": lin("global_proj_out"),
        "scale_factor": jnp.asarray(_np(sd["scale_factor"]), dtype),
    }
