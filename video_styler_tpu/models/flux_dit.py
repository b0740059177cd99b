"""FLUX.1 dual-stream DiT, TPU-native.

Functional re-design of the reference FluxDiT
(/root/reference/diffsynth/models/flux_dit.py:283-473): 19 joint
(double-stream) blocks where image and text tokens carry separate weights but
attend jointly, then 38 single-stream blocks over the concatenated sequence
with a fused qkv+mlp projection. Parameters are explicit pytrees; both block
stacks run under `jax.lax.scan` over stacked per-layer weights.

Numerical contracts preserved from the reference:
  - axis-wise interleaved-pair RoPE over (id0, h, w) position ids, freqs in
    float64 then cast (RoPEEmbedding.rope, flux_dit.py:23-42)
  - RMSNorm(eps=1e-6) on per-head Q/K
  - AdaLayerNorm 6-way modulation (joint) / 3-way (single) /
    AdaLayerNormContinuous final norm (sd3_dit.py:85-108, flux_dit.py:267-278)
  - sinusoidal timestep embedding with flip_sin_to_cos=True,
    downscale_freq_shift=0 (svd_unet.py:40-80); guidance scaled x1000
  - 2x2 patchify "B C (H P) (W Q) -> B (H W) (C P Q)"
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from ..ops.basic import linear, layer_norm, silu, gelu_tanh, init_linear
from ..ops.attention import attention


@dataclass(frozen=True)
class FluxDiTConfig:
    dim: int = 3072
    num_heads: int = 24
    num_joint_blocks: int = 19
    num_single_blocks: int = 38
    in_dim: int = 64                      # patchified latent: 16ch * 2 * 2
    out_dim: int = 64
    context_dim: int = 4096               # T5-XXL
    pooled_dim: int = 768                 # CLIP-L pooled
    time_freq_dim: int = 256
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: int = 10000
    guidance_embed: bool = True           # dev; schnell disables it
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


FLUX_DEV = FluxDiTConfig()
FLUX_SCHNELL = FluxDiTConfig(guidance_embed=False)
FLUX_DIT_TINY = FluxDiTConfig(dim=96, num_heads=4, num_joint_blocks=2,
                              num_single_blocks=2, context_dim=64,
                              pooled_dim=32, axes_dim=(4, 10, 10))


# --------------------------------------------------------------------------
# RoPE (interleaved-pair rotation, per-axis frequency bands)
# --------------------------------------------------------------------------

def flux_rope_cos_sin(ids: np.ndarray, axes_dim, theta: int):
    """ids (S, n_axes) -> cos/sin (S, sum(axes_dim)//2), float32 from float64
    math (RoPEEmbedding.rope, flux_dit.py:23-42)."""
    cos_parts, sin_parts = [], []
    for i, d in enumerate(axes_dim):
        scale = np.arange(0, d, 2, dtype=np.float64) / d
        omega = 1.0 / (theta ** scale)
        out = np.asarray(ids[:, i], np.float64)[:, None] * omega[None, :]
        cos_parts.append(np.cos(out))
        sin_parts.append(np.sin(out))
    cos = np.concatenate(cos_parts, axis=-1).astype(np.float32)
    sin = np.concatenate(sin_parts, axis=-1).astype(np.float32)
    return cos, sin


def rope_apply_interleaved(x, cos, sin):
    """x (B, S, N, D) with D split into interleaved (x0, x1) pairs;
    cos/sin (S, D//2). fp32 rotation, cast back."""
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    o0 = c * x0 - s * x1
    o1 = s * x0 + c * x1
    return jnp.stack([o0, o1], axis=-1).reshape(x.shape).astype(x.dtype)


def prepare_image_ids(f_id: int, h: int, w: int) -> np.ndarray:
    """Latent-grid position ids (h*w, 3) (FluxDiT.prepare_image_ids,
    flux_dit.py:310-325). h/w are the post-patchify grid dims."""
    ids = np.zeros((h, w, 3), np.float64)
    ids[..., 0] = f_id
    ids[..., 1] += np.arange(h)[:, None]
    ids[..., 2] += np.arange(w)[None, :]
    return ids.reshape(h * w, 3)


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------

def _init_rms(key, d, dtype):
    return {"weight": jnp.ones((d,), dtype)}


def init_joint_block(key, cfg: FluxDiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 10)
    d, hd = cfg.dim, cfg.head_dim
    return {
        "norm1_a": {"linear": init_linear(ks[0], d, 6 * d, dtype=dtype)},
        "norm1_b": {"linear": init_linear(ks[1], d, 6 * d, dtype=dtype)},
        "attn": {
            "a_to_qkv": init_linear(ks[2], d, 3 * d, dtype=dtype),
            "b_to_qkv": init_linear(ks[3], d, 3 * d, dtype=dtype),
            "norm_q_a": _init_rms(ks[2], hd, dtype),
            "norm_k_a": _init_rms(ks[2], hd, dtype),
            "norm_q_b": _init_rms(ks[3], hd, dtype),
            "norm_k_b": _init_rms(ks[3], hd, dtype),
            "a_to_out": init_linear(ks[4], d, d, dtype=dtype),
            "b_to_out": init_linear(ks[5], d, d, dtype=dtype),
        },
        "ff_a": {"0": init_linear(ks[6], d, 4 * d, dtype=dtype),
                 "2": init_linear(ks[7], 4 * d, d, dtype=dtype)},
        "ff_b": {"0": init_linear(ks[8], d, 4 * d, dtype=dtype),
                 "2": init_linear(ks[9], 4 * d, d, dtype=dtype)},
    }


def init_single_block(key, cfg: FluxDiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    d, hd = cfg.dim, cfg.head_dim
    return {
        "norm": {"linear": init_linear(ks[0], d, 3 * d, dtype=dtype)},
        "to_qkv_mlp": init_linear(ks[1], d, 7 * d, dtype=dtype),
        "norm_q_a": _init_rms(ks[1], hd, dtype),
        "norm_k_a": _init_rms(ks[1], hd, dtype),
        "proj_out": init_linear(ks[2], 5 * d, d, dtype=dtype),
    }


def init_flux_dit(key, cfg: FluxDiTConfig, dtype=jnp.float32):
    from .wan_dit import stack_blocks
    n = cfg.num_joint_blocks + cfg.num_single_blocks
    ks = jax.random.split(key, n + 8)
    d = cfg.dim
    params = {
        "time_embedder": {
            "fc1": init_linear(ks[0], cfg.time_freq_dim, d, dtype=dtype),
            "fc2": init_linear(ks[1], d, d, dtype=dtype),
        },
        "pooled_text_embedder": {
            "fc1": init_linear(ks[2], cfg.pooled_dim, d, dtype=dtype),
            "fc2": init_linear(ks[3], d, d, dtype=dtype),
        },
        "context_embedder": init_linear(ks[4], cfg.context_dim, d, dtype=dtype),
        "x_embedder": init_linear(ks[5], cfg.in_dim, d, dtype=dtype),
        "final_norm_out": {"linear": init_linear(ks[6], d, 2 * d, dtype=dtype)},
        "final_proj_out": init_linear(ks[7], d, cfg.out_dim, dtype=dtype),
        "blocks": stack_blocks([
            init_joint_block(ks[8 + i], cfg, dtype)
            for i in range(cfg.num_joint_blocks)]),
        "single_blocks": stack_blocks([
            init_single_block(ks[8 + cfg.num_joint_blocks + i], cfg, dtype)
            for i in range(cfg.num_single_blocks)]),
    }
    if cfg.guidance_embed:
        kg = jax.random.split(ks[0], 2)
        params["guidance_embedder"] = {
            "fc1": init_linear(kg[0], cfg.time_freq_dim, d, dtype=dtype),
            "fc2": init_linear(kg[1], d, d, dtype=dtype),
        }
    return params


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def timestep_embedding_flux(timestep, dim: int):
    """get_timestep_embedding with flip_sin_to_cos=True,
    downscale_freq_shift=0 (svd_unet.py:40-80): [cos | sin] order."""
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    freqs = jnp.exp(exponent)
    args = timestep.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _mlp_embed(p, x):
    return linear(p["fc2"], silu(linear(p["fc1"], x)))


def _rms(p, x, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (y.astype(x.dtype) * p["weight"].astype(x.dtype))


def _ada_mod(p, temb, n):
    m = linear(p["linear"], silu(temb))
    return jnp.split(m[:, None, :], n, axis=-1)


def _heads(x, n):
    b, s, d = x.shape
    return x.reshape(b, s, n, d // n)


def _interact_ipadapter(out, q, ip_k, ip_v, scale):
    """interact_with_ipadapter (flux_dit.py:7-12): out += scale*sdpa(q, ip)."""
    b, s = out.shape[:2]
    ip = attention(q, ip_k.astype(q.dtype), ip_v.astype(q.dtype))
    return out + scale * ip.reshape(b, s, -1).astype(out.dtype)


def joint_block(p, x_a, x_b, temb, cos, sin, cfg: FluxDiTConfig,
                ip_k=None, ip_v=None, ip_scale=1.0, attn_bias=None):
    """FluxJointTransformerBlock.forward (flux_dit.py:131-149). The RoPE
    table covers the concatenated [text | image] sequence. ip_k/ip_v
    (B, T_ip, N, D) add IP-Adapter attention on the image stream, queried
    with the pre-RoPE normed q_a (flux_dit.py:96-99)."""
    sh_a, sc_a, g_a, shm_a, scm_a, gm_a = _ada_mod(p["norm1_a"], temb, 6)
    sh_b, sc_b, g_b, shm_b, scm_b, gm_b = _ada_mod(p["norm1_b"], temb, 6)
    na = layer_norm({}, x_a, cfg.eps) * (1 + sc_a) + sh_a
    nb = layer_norm({}, x_b, cfg.eps) * (1 + sc_b) + sh_b

    ap = p["attn"]
    qkv_a = _heads(linear(ap["a_to_qkv"], na), 3 * cfg.num_heads)
    q_a, k_a, v_a = jnp.split(qkv_a, 3, axis=2)
    qkv_b = _heads(linear(ap["b_to_qkv"], nb), 3 * cfg.num_heads)
    q_b, k_b, v_b = jnp.split(qkv_b, 3, axis=2)
    q_a, k_a = _rms(ap["norm_q_a"], q_a, cfg.eps), _rms(ap["norm_k_a"], k_a, cfg.eps)
    q_b, k_b = _rms(ap["norm_q_b"], q_b, cfg.eps), _rms(ap["norm_k_b"], k_b, cfg.eps)

    q = jnp.concatenate([q_b, q_a], axis=1)
    k = jnp.concatenate([k_b, k_a], axis=1)
    v = jnp.concatenate([v_b, v_a], axis=1)
    q = rope_apply_interleaved(q, cos, sin)
    k = rope_apply_interleaved(k, cos, sin)
    if attn_bias is not None:
        from ..ops.attention import sdpa as _sdpa
        out = _sdpa(q, k, v, bias=attn_bias)
    else:
        out = attention(q, k, v)
    out = out.reshape(out.shape[0], out.shape[1], cfg.dim)
    s_b = x_b.shape[1]
    out_b, out_a = out[:, :s_b], out[:, s_b:]
    if ip_k is not None:
        out_a = _interact_ipadapter(out_a, q_a, ip_k, ip_v, ip_scale)

    x_a = x_a + g_a * linear(ap["a_to_out"], out_a)
    na = layer_norm({}, x_a, cfg.eps) * (1 + scm_a) + shm_a
    x_a = x_a + gm_a * linear(p["ff_a"]["2"], gelu_tanh(linear(p["ff_a"]["0"], na)))

    x_b = x_b + g_b * linear(ap["b_to_out"], out_b)
    nb = layer_norm({}, x_b, cfg.eps) * (1 + scm_b) + shm_b
    x_b = x_b + gm_b * linear(p["ff_b"]["2"], gelu_tanh(linear(p["ff_b"]["0"], nb)))
    return x_a, x_b


def single_block(p, x, temb, cos, sin, cfg: FluxDiTConfig,
                 ip_k=None, ip_v=None, ip_scale=1.0, attn_bias=None):
    """FluxSingleTransformerBlock.forward (flux_dit.py:208-253). The
    IP-Adapter query here is the post-RoPE q over the full [text | image]
    sequence (flux_dit.py:229-243)."""
    sh, sc, gate = _ada_mod(p["norm"], temb, 3)
    nx = layer_norm({}, x, cfg.eps) * (1 + sc) + sh
    proj = linear(p["to_qkv_mlp"], nx)
    qkv, mlp = proj[..., :3 * cfg.dim], proj[..., 3 * cfg.dim:]
    q, k, v = jnp.split(_heads(qkv, 3 * cfg.num_heads), 3, axis=2)
    q = _rms(p["norm_q_a"], q, cfg.eps)
    k = _rms(p["norm_k_a"], k, cfg.eps)
    q = rope_apply_interleaved(q, cos, sin)
    k = rope_apply_interleaved(k, cos, sin)
    if attn_bias is not None:
        from ..ops.attention import sdpa as _sdpa
        out = _sdpa(q, k, v, bias=attn_bias)
    else:
        out = attention(q, k, v)
    out = out.reshape(x.shape[0], x.shape[1], cfg.dim)
    if ip_k is not None:
        out = _interact_ipadapter(out, q, ip_k, ip_v, ip_scale)
    h = jnp.concatenate([out, gelu_tanh(mlp)], axis=-1)
    return x + gate * linear(p["proj_out"], h)


def patchify(x):
    return rearrange(x, "B C (H P) (W Q) -> B (H W) (C P Q)", P=2, Q=2)


def unpatchify(x, height, width):
    return rearrange(x, "B (H W) (C P Q) -> B C (H P) (W Q)", P=2, Q=2,
                     H=height // 2, W=width // 2)


def flux_dit_forward(params, cfg: FluxDiTConfig, hidden_states, timestep,
                     prompt_emb, pooled_prompt_emb, guidance=None,
                     image_ids=None, text_ids=None, kontext_latents=None,
                     kontext_ids=None, remat: bool = False,
                     controlnet_res=None, controlnet_single_res=None,
                     ip_kv=None, ip_scale=1.0, attn_bias=None):
    """FluxDiT.forward (flux_dit.py:404-473).

    hidden_states: (B, 16, H, W) latents; prompt_emb: (B, L, context_dim);
    pooled_prompt_emb: (B, pooled_dim); guidance: (B,) embedded-guidance
    scale (dev models); image_ids/text_ids: optional (S, 3) position ids.
    kontext_latents: optional already-patchified reference tokens appended
    after the image tokens with their own position ids (f_id=1), dropped
    from the output (FluxImageUnit_Kontext + model_fn_flux_image,
    flux_image_new.py:639-668, 1221-1224).
    """
    x, ctx, temb, cos, sin, n_img = flux_embed(
        params, cfg, hidden_states, timestep, prompt_emb, pooled_prompt_emb,
        guidance, image_ids, text_ids, kontext_latents, kontext_ids)
    h = flux_trunk(params, cfg, x, ctx, temb, cos, sin, remat=remat,
                   controlnet_res=controlnet_res,
                   controlnet_single_res=controlnet_single_res,
                   ip_kv=ip_kv, ip_scale=ip_scale, attn_bias=attn_bias)
    height, width = hidden_states.shape[-2:]
    return flux_head(params, cfg, h[:, :n_img], temb, height, width)


def flux_embed(params, cfg: FluxDiTConfig, hidden_states, timestep,
               prompt_emb, pooled_prompt_emb, guidance=None, image_ids=None,
               text_ids=None, kontext_latents=None, kontext_ids=None):
    """Embedding stage -> (x_tokens, ctx_tokens, temb, cos, sin, n_img);
    x_tokens includes kontext tokens when given."""
    dtype = hidden_states.dtype
    height, width = hidden_states.shape[-2:]
    if image_ids is None:
        image_ids = prepare_image_ids(0, height // 2, width // 2)
    if text_ids is None:
        text_ids = np.zeros((prompt_emb.shape[1], 3), np.float64)

    temb = _mlp_embed(params["time_embedder"],
                      timestep_embedding_flux(timestep, cfg.time_freq_dim).astype(dtype))
    temb = temb + _mlp_embed(params["pooled_text_embedder"], pooled_prompt_emb)
    if cfg.guidance_embed and guidance is not None:
        temb = temb + _mlp_embed(
            params["guidance_embedder"],
            timestep_embedding_flux(guidance * 1000.0, cfg.time_freq_dim).astype(dtype))

    tokens = patchify(hidden_states)
    n_img = tokens.shape[1]
    if kontext_latents is not None:
        tokens = jnp.concatenate([tokens, kontext_latents.astype(tokens.dtype)],
                                 axis=1)
        image_ids = np.concatenate([np.asarray(image_ids, np.float64),
                                    np.asarray(kontext_ids, np.float64)], axis=0)
    x = linear(params["x_embedder"], tokens)
    ctx = linear(params["context_embedder"], prompt_emb)

    ids = np.concatenate([np.asarray(text_ids, np.float64),
                          np.asarray(image_ids, np.float64)], axis=0)
    cos, sin = flux_rope_cos_sin(ids, cfg.axes_dim, cfg.theta)
    return x, ctx, temb, jnp.asarray(cos), jnp.asarray(sin), n_img


def flux_trunk(params, cfg: FluxDiTConfig, x, ctx, temb, cos, sin,
               remat: bool = False, controlnet_res=None,
               controlnet_single_res=None, ip_kv=None, ip_scale=1.0,
               attn_bias=None):
    """Joint + single block stacks -> image(+kontext) tokens post-trunk.

    controlnet_res: (num_joint, B, n_img, D) per-block residuals added to
    the image stream (model_fn insertion, flux_image_new.py:1264-1269);
    controlnet_single_res: (num_single, B, n_img, D) added past the text
    tokens. ip_kv: (ip_k, ip_v) each (num_joint+num_single, B, T, N, D)
    stacked per-block IP-Adapter keys/values."""
    n_img_pad = x.shape[1]          # includes kontext tokens if appended
    if controlnet_res is not None and controlnet_res.shape[2] < n_img_pad:
        pad = n_img_pad - controlnet_res.shape[2]
        controlnet_res = jnp.pad(controlnet_res,
                                 ((0, 0), (0, 0), (0, pad), (0, 0)))
    nj = cfg.num_joint_blocks
    ip_k = ip_v = None
    if ip_kv is not None:
        ip_k, ip_v = ip_kv

    def joint_body(a, b, layer_p, res, ipk, ipv):
        a, b = joint_block(layer_p, a, b, temb, cos, sin, cfg,
                           ip_k=ipk, ip_v=ipv, ip_scale=ip_scale,
                           attn_bias=attn_bias)
        if res is not None:
            a = a + res.astype(a.dtype)
        return a, b

    def joint_scan(carry, xs):
        a, b = carry
        fn = jax.checkpoint(joint_body) if remat else joint_body
        a, b = fn(a, b, xs["p"], xs.get("res"), xs.get("ipk"), xs.get("ipv"))
        return (a, b), None

    xs = {"p": params["blocks"]}
    if controlnet_res is not None:
        xs["res"] = controlnet_res
    if ip_k is not None:
        xs["ipk"], xs["ipv"] = ip_k[:nj], ip_v[:nj]
    (x, ctx), _ = jax.lax.scan(joint_scan, (x, ctx), xs)

    h = jnp.concatenate([ctx, x], axis=1)
    s_ctx = ctx.shape[1]

    def single_body(carry, layer_p, res, ipk, ipv):
        out = single_block(layer_p, carry, temb, cos, sin, cfg,
                           ip_k=ipk, ip_v=ipv, ip_scale=ip_scale,
                           attn_bias=attn_bias)
        if res is not None:
            out = jax.lax.dynamic_update_slice_in_dim(
                out, (out[:, s_ctx:s_ctx + res.shape[1]]
                      + res.astype(out.dtype)), s_ctx, axis=1)
        return out

    def single_scan(carry, xs):
        fn = jax.checkpoint(single_body) if remat else single_body
        return fn(carry, xs["p"], xs.get("res"), xs.get("ipk"),
                  xs.get("ipv")), None

    xs = {"p": params["single_blocks"]}
    if controlnet_single_res is not None:
        xs["res"] = controlnet_single_res
    if ip_k is not None:
        xs["ipk"], xs["ipv"] = ip_k[nj:], ip_v[nj:]
    h, _ = jax.lax.scan(single_scan, h, xs)
    return h[:, s_ctx:]


def flux_head(params, cfg: FluxDiTConfig, h, temb, height, width):
    m = linear(params["final_norm_out"]["linear"], silu(temb))
    scale, shift = jnp.split(m[:, None, :], 2, axis=-1)
    h = layer_norm({}, h, cfg.eps) * (1 + scale) + shift
    h = linear(params["final_proj_out"], h)
    return unpatchify(h, height, width)


def flux_modulated_input(params, cfg: FluxDiTConfig, x, temb):
    """block-0 norm1_a modulation of the embedded tokens — the TeaCache probe
    (flux_image_new.py:1075-1078)."""
    p0 = jax.tree_util.tree_map(lambda a: a[0], params["blocks"])
    sh, sc, *_ = _ada_mod(p0["norm1_a"], temb, 6)
    return layer_norm({}, x, cfg.eps) * (1 + sc) + sh


# --------------------------------------------------------------------------
# Checkpoint conversion
# --------------------------------------------------------------------------

def _j(v, dtype):
    if hasattr(v, "detach"):
        v = v.detach().float().cpu().numpy()
    return jnp.asarray(np.asarray(v), dtype)


def _lin_t(sd, prefix, dtype):
    p = {"w": _j(sd[prefix + ".weight"], dtype).T}
    if prefix + ".bias" in sd:
        p["b"] = _j(sd[prefix + ".bias"], dtype)
    return p


def convert_flux_dit(sd, cfg: FluxDiTConfig, dtype=jnp.bfloat16):
    """DiffSynth-layout FluxDiT state dict -> param pytree. Raw BFL-layout
    (civitai) checkpoints are renamed first (FluxDiTStateDictConverter
    .from_civitai, flux_dit.py:663-748)."""
    if any(k.startswith("double_blocks.") or k == "img_in.weight" for k in sd):
        sd = rename_civitai_flux(sd)
    from .wan_dit import stack_blocks

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
        "final_norm_out": {"linear": _lin_t(sd, "final_norm_out.linear", dtype)},
        "final_proj_out": _lin_t(sd, "final_proj_out", dtype),
    }
    if cfg.guidance_embed and "guidance_embedder.timestep_embedder.0.weight" in sd:
        params["guidance_embedder"] = emb("guidance_embedder")

    params["blocks"] = stack_blocks(
        [convert_joint_block(sd, f"blocks.{i}", dtype)
         for i in range(cfg.num_joint_blocks)])
    params["single_blocks"] = stack_blocks(
        [convert_single_block(sd, f"single_blocks.{i}", dtype)
         for i in range(cfg.num_single_blocks)])
    return params


def convert_joint_block(sd, b: str, dtype):
    return {
        "norm1_a": {"linear": _lin_t(sd, f"{b}.norm1_a.linear", dtype)},
        "norm1_b": {"linear": _lin_t(sd, f"{b}.norm1_b.linear", dtype)},
        "attn": {
            "a_to_qkv": _lin_t(sd, f"{b}.attn.a_to_qkv", dtype),
            "b_to_qkv": _lin_t(sd, f"{b}.attn.b_to_qkv", dtype),
            "norm_q_a": {"weight": _j(sd[f"{b}.attn.norm_q_a.weight"], dtype)},
            "norm_k_a": {"weight": _j(sd[f"{b}.attn.norm_k_a.weight"], dtype)},
            "norm_q_b": {"weight": _j(sd[f"{b}.attn.norm_q_b.weight"], dtype)},
            "norm_k_b": {"weight": _j(sd[f"{b}.attn.norm_k_b.weight"], dtype)},
            "a_to_out": _lin_t(sd, f"{b}.attn.a_to_out", dtype),
            "b_to_out": _lin_t(sd, f"{b}.attn.b_to_out", dtype),
        },
        "ff_a": {"0": _lin_t(sd, f"{b}.ff_a.0", dtype),
                 "2": _lin_t(sd, f"{b}.ff_a.2", dtype)},
        "ff_b": {"0": _lin_t(sd, f"{b}.ff_b.0", dtype),
                 "2": _lin_t(sd, f"{b}.ff_b.2", dtype)},
    }


def convert_single_block(sd, b: str, dtype):
    return {
        "norm": {"linear": _lin_t(sd, f"{b}.norm.linear", dtype)},
        "to_qkv_mlp": _lin_t(sd, f"{b}.to_qkv_mlp", dtype),
        "norm_q_a": {"weight": _j(sd[f"{b}.norm_q_a.weight"], dtype)},
        "norm_k_a": {"weight": _j(sd[f"{b}.norm_k_a.weight"], dtype)},
        "proj_out": _lin_t(sd, f"{b}.proj_out", dtype),
    }


def rename_civitai_flux(sd):
    """Raw BFL (civitai) key layout -> DiffSynth module layout. Mapping
    mirrors FluxDiTStateDictConverter.from_civitai (flux_dit.py:663-748),
    generated compactly instead of a literal table."""
    top = {
        "time_in": "time_embedder.timestep_embedder",
        "vector_in": "pooled_text_embedder",
        "guidance_in": "guidance_embedder.timestep_embedder",
    }
    out = {}
    for name, v in sd.items():
        if name.startswith("model.diffusion_model."):
            name = name[len("model.diffusion_model."):]
        parts = name.split(".")
        if parts[0] in top:
            io = {"in_layer": "0", "out_layer": "2"}[parts[1]]
            base = top[parts[0]]
            if parts[0] == "vector_in":
                out[f"{base}.{io}.{parts[2]}"] = v
            else:
                out[f"{base}.{io}.{parts[2]}"] = v
        elif parts[0] == "txt_in":
            out[f"context_embedder.{parts[1]}"] = v
        elif parts[0] == "img_in":
            out[f"x_embedder.{parts[1]}"] = v
        elif parts[0] == "final_layer":
            if parts[1] == "linear":
                out[f"final_proj_out.{parts[2]}"] = v
            elif parts[1] == "adaLN_modulation":
                # reference swaps (shift, scale) -> (scale, shift)
                import torch  # checkpoints arrive as torch tensors
                half = v.shape[0] // 2
                vv = torch.concat([v[half:], v[:half]], dim=0) if hasattr(v, "shape") else v
                out[f"final_norm_out.linear.{parts[3]}"] = vv
        elif parts[0] == "double_blocks":
            i, rest = parts[1], ".".join(parts[2:])
            stream = "a" if rest.startswith("img") else "b"
            leaf = parts[-1]
            if "attn.qkv" in rest:
                out[f"blocks.{i}.attn.{stream}_to_qkv.{leaf}"] = v
            elif "attn.proj" in rest:
                out[f"blocks.{i}.attn.{stream}_to_out.{leaf}"] = v
            elif "attn.norm" in rest:
                which = "q" if "query" in rest else "k"
                out[f"blocks.{i}.attn.norm_{which}_{stream}.weight"] = v
            elif "_mlp" in rest:
                out[f"blocks.{i}.ff_{stream}.{parts[3]}.{leaf}"] = v
            elif "_mod" in rest:
                out[f"blocks.{i}.norm1_{stream}.linear.{leaf}"] = v
        elif parts[0] == "single_blocks":
            i, rest = parts[1], ".".join(parts[2:])
            leaf = parts[-1]
            if rest.startswith("linear1"):
                out[f"single_blocks.{i}.to_qkv_mlp.{leaf}"] = v
            elif rest.startswith("linear2"):
                out[f"single_blocks.{i}.proj_out.{leaf}"] = v
            elif rest.startswith("modulation"):
                out[f"single_blocks.{i}.norm.linear.{leaf}"] = v
            elif rest.startswith("norm."):
                which = "q" if "query" in rest else "k"
                out[f"single_blocks.{i}.norm_{which}_a.weight"] = v
    return out


def build_entity_attention_bias(entity_masks: np.ndarray, prompt_len: int,
                                n_img: int) -> np.ndarray:
    """EliGen attention bias (FluxDiT.construct_mask, flux_dit.py:290-322).

    entity_masks: (B, N, 1, H_lat, W_lat) {0,1} host numpy (latent-pixel
    resolution). The layout is [entity_1 text | ... | entity_N text |
    global text | image]: each entity's text attends only its own image
    region (bidirectionally), entity texts don't cross-attend, the global
    text and image-image attention stay dense. Returns (B, 1, S, S) float32
    additive bias (0 / -inf)."""
    b, n_ent = entity_masks.shape[:2]
    n = n_ent + 1                       # + global
    total = n * prompt_len + n_img
    bias = np.zeros((b, total, total), np.float32)
    img0 = n * prompt_len

    # patchify each mask to one bool per image token (2x2 patch any-hit)
    m = entity_masks[:, :, 0]
    hh, ww = m.shape[-2:]
    patched = m.reshape(b, n_ent, hh // 2, 2, ww // 2, 2).max(axis=(3, 5))
    patched = patched.reshape(b, n_ent, -1) > 0          # (B, N, n_img)

    neg = np.float32(-np.inf)
    for i in range(n_ent):
        t0, t1 = i * prompt_len, (i + 1) * prompt_len
        blocked = ~patched[:, i]                          # (B, n_img)
        bias[:, t0:t1, img0:img0 + n_img] = np.where(
            blocked[:, None, :], neg, 0.0)
        bias[:, img0:img0 + n_img, t0:t1] = np.where(
            blocked[:, :, None], neg, 0.0)
    for i in range(n_ent + 1):
        for j in range(n_ent):
            if i != j:
                bias[:, i * prompt_len:(i + 1) * prompt_len,
                     j * prompt_len:(j + 1) * prompt_len] = neg
    # global text row/col stays open to image and itself; entity texts must
    # not see the global text either (i != j above covers j<N; global col
    # handled here)
    for i in range(n_ent):
        bias[:, i * prompt_len:(i + 1) * prompt_len,
             n_ent * prompt_len:img0] = neg
    return bias[:, None]
