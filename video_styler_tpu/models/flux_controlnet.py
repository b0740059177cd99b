"""FLUX ControlNet + IP-Adapter, TPU-native.

Re-design of the reference FluxControlNet
(/root/reference/diffsynth/models/flux_controlnet.py:8-122): a truncated
FLUX trunk (default 5 joint + 10 single blocks) over [latents +
controlnet_x_embedder(conditioning)], emitting one per-block linear
residual; residual stacks are aligned to the full DiT's 19/38 blocks by
interval repetition. Also FluxIpAdapter
(/root/reference/diffsynth/models/flux_ipadapter.py:7-94): a SigLIP image
embedding -> 128 tokens -> per-DiT-block k/v projections.

Both trunks run as `lax.scan` over stacked per-layer weights, like the main
FLUX DiT here.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, layer_norm, gelu_exact
from . import flux_dit as F
from .flux_dit import (FluxDiTConfig, _j, _lin_t, _mlp_embed, _rms,
                       flux_rope_cos_sin, joint_block, single_block,
                       patchify, prepare_image_ids, timestep_embedding_flux)
from .wan_dit import stack_blocks


@dataclass(frozen=True)
class FluxControlNetConfig:
    dit: FluxDiTConfig = F.FLUX_DEV
    num_joint_blocks: int = 5
    num_single_blocks: int = 10
    guidance_embed: bool = True
    num_mode: int = 0                      # union controlnets: task embedding
    additional_input_dim: int = 0          # inpaint: extra mask channels


FLUX_CONTROLNET = FluxControlNetConfig()
FLUX_CONTROLNET_TINY = FluxControlNetConfig(
    dit=F.FLUX_DIT_TINY, num_joint_blocks=2, num_single_blocks=2,
    guidance_embed=True)


def flux_controlnet_forward(params, cfg: FluxControlNetConfig, hidden_states,
                            controlnet_conditioning, timestep, prompt_emb,
                            pooled_prompt_emb, guidance=None, image_ids=None,
                            text_ids=None, processor_id: Optional[int] = None
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (res (num_joint, B, S_img, D), single_res (num_single, B, S_img, D))
    — un-aligned; run align_res_stack for the DiT's block counts
    (flux_controlnet.py:61-105)."""
    d = cfg.dit
    dtype = hidden_states.dtype
    height, width = hidden_states.shape[-2:]
    if image_ids is None:
        image_ids = prepare_image_ids(0, height // 2, width // 2)
    if text_ids is None:
        text_ids = np.zeros((prompt_emb.shape[1], 3), np.float64)

    temb = _mlp_embed(params["time_embedder"],
                      timestep_embedding_flux(timestep, d.time_freq_dim
                                              ).astype(dtype))
    temb = temb + _mlp_embed(params["pooled_text_embedder"], pooled_prompt_emb)
    if cfg.guidance_embed and guidance is not None:
        temb = temb + _mlp_embed(
            params["guidance_embedder"],
            timestep_embedding_flux(guidance * 1000.0,
                                    d.time_freq_dim).astype(dtype))

    ctx = linear(params["context_embedder"], prompt_emb)
    text_ids = np.asarray(text_ids, np.float64)
    if "mode_embedder" in params and processor_id is not None:
        mode = params["mode_embedder"][processor_id][None, None].astype(ctx.dtype)
        ctx = jnp.concatenate([jnp.broadcast_to(
            mode, (ctx.shape[0], 1, ctx.shape[-1])), ctx], axis=1)
        text_ids = np.concatenate([text_ids[:1], text_ids], axis=0)

    ids = np.concatenate([text_ids, np.asarray(image_ids, np.float64)], axis=0)
    cos, sin = flux_rope_cos_sin(ids, d.axes_dim, d.theta)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    x = linear(params["x_embedder"], patchify(hidden_states))
    x = x + linear(params["controlnet_x_embedder"],
                   patchify(controlnet_conditioning).astype(dtype))

    def joint_scan(carry, xs):
        a, b = carry
        a, b = joint_block(xs["p"], a, b, temb, cos, sin, d)
        return (a, b), linear(xs["cn"], a)

    (x, ctx), res = jax.lax.scan(
        joint_scan, (x, ctx),
        {"p": params["blocks"], "cn": params["controlnet_blocks"]})

    s_ctx = ctx.shape[1]
    h = jnp.concatenate([ctx, x], axis=1)

    def single_scan(carry, xs):
        out = single_block(xs["p"], carry, temb, cos, sin, d)
        return out, linear(xs["cn"], out[:, s_ctx:])

    if cfg.num_single_blocks > 0:
        _, single_res = jax.lax.scan(
            single_scan, h,
            {"p": params["single_blocks"],
             "cn": params["controlnet_single_blocks"]})
    else:
        single_res = jnp.zeros((0,) + h[:, s_ctx:].shape, h.dtype)
    return res, single_res


def align_res_stack(res, num_blocks: int):
    """align_res_stack_to_original_blocks (flux_controlnet.py:53-58): repeat
    each emitted residual over an interval of the full DiT's blocks."""
    n = res.shape[0]
    if n == 0:
        return None
    interval = (num_blocks + n - 1) // n
    idx = np.arange(num_blocks) // interval
    return res[jnp.asarray(idx)]


def init_flux_controlnet(key, cfg: FluxControlNetConfig, dtype=jnp.float32):
    from ..ops.basic import init_linear
    d = cfg.dit
    base = F.init_flux_dit(key, FluxDiTConfig(
        dim=d.dim, num_heads=d.num_heads,
        num_joint_blocks=cfg.num_joint_blocks,
        num_single_blocks=max(cfg.num_single_blocks, 1),
        context_dim=d.context_dim, pooled_dim=d.pooled_dim,
        axes_dim=d.axes_dim, theta=d.theta,
        guidance_embed=cfg.guidance_embed), dtype=dtype)
    keys = jax.random.split(key, 4)
    params = {k: base[k] for k in
              ("time_embedder", "pooled_text_embedder", "context_embedder",
               "x_embedder", "blocks")}
    if cfg.guidance_embed:
        params["guidance_embedder"] = base["guidance_embedder"]
    if cfg.num_single_blocks > 0:
        params["single_blocks"] = jax.tree_util.tree_map(
            lambda a: a[:cfg.num_single_blocks], base["single_blocks"])
        params["controlnet_single_blocks"] = stack_blocks(
            [init_linear(jax.random.fold_in(keys[1], i), d.dim, d.dim,
                         dtype=dtype) for i in range(cfg.num_single_blocks)])
    params["controlnet_blocks"] = stack_blocks(
        [init_linear(jax.random.fold_in(keys[0], i), d.dim, d.dim,
                     dtype=dtype) for i in range(cfg.num_joint_blocks)])
    params["controlnet_x_embedder"] = init_linear(
        keys[2], 64 + cfg.additional_input_dim, d.dim, dtype=dtype)
    if cfg.num_mode > 0:
        params["mode_embedder"] = (jax.random.normal(
            keys[3], (cfg.num_mode, d.dim)) * 0.02).astype(dtype)
    return params


def convert_flux_controlnet(sd, cfg: FluxControlNetConfig,
                            dtype=jnp.bfloat16):
    """DiffSynth-layout FluxControlNet state dict (the from_diffusers rename
    output, flux_controlnet.py:190-280) -> pytree."""
    def emb(prefix):
        return {"fc1": _lin_t(sd, f"{prefix}.timestep_embedder.0", dtype),
                "fc2": _lin_t(sd, f"{prefix}.timestep_embedder.2", dtype)}

    params = {
        "time_embedder": emb("time_embedder"),
        "pooled_text_embedder": {
            "fc1": _lin_t(sd, "pooled_text_embedder.0", dtype),
            "fc2": _lin_t(sd, "pooled_text_embedder.2", dtype)},
        "context_embedder": _lin_t(sd, "context_embedder", dtype),
        "x_embedder": _lin_t(sd, "x_embedder", dtype),
        "controlnet_x_embedder": _lin_t(sd, "controlnet_x_embedder", dtype),
        "blocks": stack_blocks(
            [F.convert_joint_block(sd, f"blocks.{i}", dtype)
             for i in range(cfg.num_joint_blocks)]),
        "controlnet_blocks": stack_blocks(
            [_lin_t(sd, f"controlnet_blocks.{i}", dtype)
             for i in range(cfg.num_joint_blocks)]),
    }
    if cfg.guidance_embed and "guidance_embedder.timestep_embedder.0.weight" in sd:
        params["guidance_embedder"] = emb("guidance_embedder")
    if cfg.num_single_blocks > 0:
        params["single_blocks"] = stack_blocks(
            [F.convert_single_block(sd, f"single_blocks.{i}", dtype)
             for i in range(cfg.num_single_blocks)])
        params["controlnet_single_blocks"] = stack_blocks(
            [_lin_t(sd, f"controlnet_single_blocks.{i}", dtype)
             for i in range(cfg.num_single_blocks)])
    if "controlnet_mode_embedder.weight" in sd:
        params["mode_embedder"] = _j(sd["controlnet_mode_embedder.weight"],
                                     dtype)
    return params


# -- FLUX IP-Adapter (flux_ipadapter.py:7-94) ---------------------------------

def flux_ipadapter_kv(params, cfg: FluxDiTConfig, image_emb, scale=1.0):
    """SigLIP pooled embedding (B, 1152) -> ((L, 1, T, N, D) ip_k, ip_v,
    scale) stacked over all num_joint+num_single DiT blocks."""
    x = linear(params["proj"]["2"],
               gelu_exact(linear(params["proj"]["0"], image_emb)))
    num_tokens = x.shape[-1] // params["norm"]["scale"].shape[0]
    x = x.reshape(-1, num_tokens, params["norm"]["scale"].shape[0])
    x = layer_norm(params["norm"], x, eps=1e-5)
    x = x.reshape(1, -1, x.shape[-1])    # all images -> one token stream

    n, hd = cfg.num_heads, cfg.head_dim

    def project(mod):
        k = linear(mod["to_k_ip"], x).reshape(1, -1, n, hd)
        # norm_added_k: RMSNorm without affine (flux_ipadapter.py:35-44)
        kf = k.astype(jnp.float32)
        k = (kf * jax.lax.rsqrt(jnp.mean(kf * kf, axis=-1, keepdims=True)
                                + 1e-5)).astype(x.dtype)
        v = linear(mod["to_v_ip"], x).reshape(1, -1, n, hd)
        return k, v

    def scan_fn(_, mod):
        return None, project(mod)

    _, (ip_k, ip_v) = jax.lax.scan(scan_fn, None, params["modules"])
    return ip_k, ip_v, scale


def convert_flux_ipadapter(sd, num_blocks: int = 57, dtype=jnp.bfloat16):
    """FluxIpAdapter state dict (image_proj.* + ipadapter_modules.{i}.*, or
    InstantX ip_adapter.{i}.to_{k,v}_ip layout) -> pytree."""
    if any(k.startswith("ip_adapter.") for k in sd):
        sd = {k.replace("ip_adapter.", "ipadapter_modules."): v
              for k, v in sd.items()}
    if any(k.startswith("image_proj.proj.0") for k in sd):
        proj = {"0": _lin_t(sd, "image_proj.proj.0", dtype),
                "2": _lin_t(sd, "image_proj.proj.2", dtype)}
        norm = {"scale": _j(sd["image_proj.norm.weight"], dtype),
                "bias": _j(sd["image_proj.norm.bias"], dtype)}
    else:
        proj = {"0": _lin_t(sd, "image_proj.0", dtype),
                "2": _lin_t(sd, "image_proj.2", dtype)}
        norm = {"scale": _j(sd["image_proj.norm.weight"], dtype),
                "bias": _j(sd["image_proj.norm.bias"], dtype)}
    modules = []
    for i in range(num_blocks):
        b = f"ipadapter_modules.{i}"
        modules.append({"to_k_ip": _lin_t(sd, f"{b}.to_k_ip", dtype),
                        "to_v_ip": _lin_t(sd, f"{b}.to_v_ip", dtype)})
    return {"proj": proj, "norm": norm, "modules": stack_blocks(modules)}


def init_flux_ipadapter(key, cfg: FluxDiTConfig, id_dim: int = 1152,
                        num_tokens: int = 128, num_blocks: int = 57,
                        dtype=jnp.float32):
    from ..ops.basic import init_linear, init_layer_norm
    ks = jax.random.split(key, 2 + num_blocks)
    ctx = cfg.context_dim
    return {
        "proj": {"0": init_linear(ks[0], id_dim, id_dim * 2, dtype=dtype),
                 "2": init_linear(ks[1], id_dim * 2, ctx * num_tokens,
                                  dtype=dtype)},
        "norm": init_layer_norm(ctx, dtype=dtype),
        "modules": stack_blocks([
            {"to_k_ip": init_linear(jax.random.fold_in(ks[2], 2 * i), ctx,
                                    cfg.dim, bias=False, dtype=dtype),
             "to_v_ip": init_linear(jax.random.fold_in(ks[2], 2 * i + 1), ctx,
                                    cfg.dim, bias=False, dtype=dtype)}
            for i in range(num_blocks)]),
    }
