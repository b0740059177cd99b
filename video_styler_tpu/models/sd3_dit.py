"""SD3 / SD3.5 MM-DiT, TPU-native.

Functional re-design of the reference SD3DiT
(/root/reference/diffsynth/models/sd3_dit.py:342-400): joint (dual-stream)
transformer blocks over image+text tokens with a learned cropped positional
embedding, optional per-head RMS-normed QK (SD3.5), optional "dual" blocks
(extra image-only self attention, SD3.5-large), and a final block whose text
stream is modulation-only. Homogeneous block runs use `jax.lax.scan` over
stacked per-layer weights; the final block is applied separately.

Numerical contracts preserved:
  - AdaLayerNorm 6-way (9-way dual, 2-way single) modulation
    (sd3_dit.py:85-108)
  - flip_sin_to_cos timestep embedding (svd_unet.py:40-80)
  - cropped pos-embed from a (1, M, M, D) table (sd3_dit.py:36-48)
  - unpatchify order "B (H W) (P Q C)" (sd3_dit.py:396)
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from ..ops.basic import linear, layer_norm, silu, gelu_tanh, init_linear
from ..ops.attention import attention
from .flux_dit import timestep_embedding_flux, _mlp_embed, _rms, _ada_mod, _heads


@dataclass(frozen=True)
class SD3DiTConfig:
    dim: int = 1536
    num_layers: int = 24               # includes the final block
    num_dual_blocks: int = 0
    use_rms_norm: bool = False
    pos_embed_max_size: int = 192
    in_channels: int = 16
    context_dim: int = 4096
    pooled_dim: int = 2048
    time_freq_dim: int = 256
    eps: float = 1e-6

    @property
    def num_heads(self) -> int:
        return self.dim // 64


SD3_MEDIUM = SD3DiTConfig()
SD35_LARGE = SD3DiTConfig(dim=2432, num_layers=38, use_rms_norm=True)
SD3_DIT_TINY = SD3DiTConfig(dim=128, num_layers=3, num_dual_blocks=1,
                            use_rms_norm=True, pos_embed_max_size=16,
                            context_dim=64, pooled_dim=32)


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------

def _init_joint_attn(key, cfg, only_out_a=False, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    d = cfg.dim
    p = {"a_to_qkv": init_linear(ks[0], d, 3 * d, dtype=dtype),
         "b_to_qkv": init_linear(ks[1], d, 3 * d, dtype=dtype),
         "a_to_out": init_linear(ks[2], d, d, dtype=dtype)}
    if not only_out_a:
        p["b_to_out"] = init_linear(ks[3], d, d, dtype=dtype)
    if cfg.use_rms_norm:
        hd = 64
        for n in ("norm_q_a", "norm_k_a", "norm_q_b", "norm_k_b"):
            p[n] = {"weight": jnp.ones((hd,), dtype)}
    return p


def _init_single_attn(key, cfg, dtype=jnp.float32):
    ks = jax.random.split(key, 2)
    d = cfg.dim
    p = {"a_to_qkv": init_linear(ks[0], d, 3 * d, dtype=dtype),
         "a_to_out": init_linear(ks[1], d, d, dtype=dtype)}
    if cfg.use_rms_norm:
        for n in ("norm_q_a", "norm_k_a"):
            p[n] = {"weight": jnp.ones((64,), dtype)}
    return p


def _init_ff(key, d, dtype):
    k1, k2 = jax.random.split(key)
    return {"0": init_linear(k1, d, 4 * d, dtype=dtype),
            "2": init_linear(k2, 4 * d, d, dtype=dtype)}


def init_joint_block(key, cfg: SD3DiTConfig, dual=False, final=False,
                     dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    d = cfg.dim
    p = {
        "norm1_a": {"linear": init_linear(ks[0], d, (9 if dual else 6) * d,
                                          dtype=dtype)},
        "norm1_b": {"linear": init_linear(ks[1], d, (2 if final else 6) * d,
                                          dtype=dtype)},
        "attn": _init_joint_attn(ks[2], cfg, only_out_a=final, dtype=dtype),
        "ff_a": _init_ff(ks[3], d, dtype),
    }
    if not final:
        p["ff_b"] = _init_ff(ks[4], d, dtype)
    if dual:
        p["attn2"] = _init_single_attn(ks[5], cfg, dtype=dtype)
    return p


def init_sd3_dit(key, cfg: SD3DiTConfig, dtype=jnp.float32):
    from .wan_dit import stack_blocks
    ks = jax.random.split(key, cfg.num_layers + 8)
    d = cfg.dim
    n_reg = cfg.num_layers - 1 - cfg.num_dual_blocks
    params = {
        "pos_embedder": {
            "proj": init_linear(ks[0], cfg.in_channels * 4, d, dtype=dtype),
            "pos_embed": jnp.zeros(
                (1, cfg.pos_embed_max_size, cfg.pos_embed_max_size, d), dtype),
        },
        "time_embedder": {
            "fc1": init_linear(ks[1], cfg.time_freq_dim, d, dtype=dtype),
            "fc2": init_linear(ks[2], d, d, dtype=dtype)},
        "pooled_text_embedder": {
            "fc1": init_linear(ks[3], cfg.pooled_dim, d, dtype=dtype),
            "fc2": init_linear(ks[4], d, d, dtype=dtype)},
        "context_embedder": init_linear(ks[5], cfg.context_dim, d, dtype=dtype),
        "blocks": stack_blocks([
            init_joint_block(ks[8 + cfg.num_dual_blocks + i], cfg, dtype=dtype)
            for i in range(n_reg)]),
        "final_block": init_joint_block(ks[8 + cfg.num_layers - 1], cfg,
                                        final=True, dtype=dtype),
        "norm_out": {"linear": init_linear(ks[6], d, 2 * d, dtype=dtype)},
        "proj_out": init_linear(ks[7], d, 64, dtype=dtype),
    }
    if cfg.num_dual_blocks:
        params["dual_blocks"] = stack_blocks([
            init_joint_block(ks[8 + i], cfg, dual=True, dtype=dtype)
            for i in range(cfg.num_dual_blocks)])
    return params


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _maybe_rms(p, name, x, eps):
    if name in p:
        return _rms(p[name], x, eps)
    return x


def joint_attention(p, a, b, cfg: SD3DiTConfig, only_out_a=False):
    """JointAttention.forward (sd3_dit.py:110-160): image tokens first."""
    n = cfg.num_heads
    qkv_a = _heads(linear(p["a_to_qkv"], a), 3 * n)
    q_a, k_a, v_a = jnp.split(qkv_a, 3, axis=2)
    qkv_b = _heads(linear(p["b_to_qkv"], b), 3 * n)
    q_b, k_b, v_b = jnp.split(qkv_b, 3, axis=2)
    q_a = _maybe_rms(p, "norm_q_a", q_a, cfg.eps)
    k_a = _maybe_rms(p, "norm_k_a", k_a, cfg.eps)
    q_b = _maybe_rms(p, "norm_q_b", q_b, cfg.eps)
    k_b = _maybe_rms(p, "norm_k_b", k_b, cfg.eps)
    q = jnp.concatenate([q_a, q_b], axis=1)
    k = jnp.concatenate([k_a, k_b], axis=1)
    v = jnp.concatenate([v_a, v_b], axis=1)
    out = attention(q, k, v).reshape(q.shape[0], q.shape[1], cfg.dim)
    out_a, out_b = out[:, :a.shape[1]], out[:, a.shape[1]:]
    out_a = linear(p["a_to_out"], out_a)
    if only_out_a:
        return out_a
    return out_a, linear(p["b_to_out"], out_b)


def single_attention(p, a, cfg: SD3DiTConfig):
    n = cfg.num_heads
    qkv = _heads(linear(p["a_to_qkv"], a), 3 * n)
    q, k, v = jnp.split(qkv, 3, axis=2)
    q = _maybe_rms(p, "norm_q_a", q, cfg.eps)
    k = _maybe_rms(p, "norm_k_a", k, cfg.eps)
    out = attention(q, k, v).reshape(a.shape[0], a.shape[1], cfg.dim)
    return linear(p["a_to_out"], out)


def joint_block(p, a, b, temb, cfg: SD3DiTConfig, dual=False):
    """JointTransformerBlock / DualTransformerBlock.forward
    (sd3_dit.py:255-305, 163-200)."""
    if dual:
        sh_a, sc_a, g_a, shm_a, scm_a, gm_a, sh_a2, sc_a2, g_a2 = _ada_mod(
            p["norm1_a"], temb, 9)
        na_base = layer_norm({}, a, cfg.eps)
        na = na_base * (1 + sc_a) + sh_a
        na2 = na_base * (1 + sc_a2) + sh_a2
    else:
        sh_a, sc_a, g_a, shm_a, scm_a, gm_a = _ada_mod(p["norm1_a"], temb, 6)
        na = layer_norm({}, a, cfg.eps) * (1 + sc_a) + sh_a
    sh_b, sc_b, g_b, shm_b, scm_b, gm_b = _ada_mod(p["norm1_b"], temb, 6)
    nb = layer_norm({}, b, cfg.eps) * (1 + sc_b) + sh_b

    out_a, out_b = joint_attention(p["attn"], na, nb, cfg)
    a = a + g_a * out_a
    if dual:
        a = a + g_a2 * single_attention(p["attn2"], na2, cfg)
    na = layer_norm({}, a, cfg.eps) * (1 + scm_a) + shm_a
    a = a + gm_a * linear(p["ff_a"]["2"], gelu_tanh(linear(p["ff_a"]["0"], na)))

    b = b + g_b * out_b
    nb = layer_norm({}, b, cfg.eps) * (1 + scm_b) + shm_b
    b = b + gm_b * linear(p["ff_b"]["2"], gelu_tanh(linear(p["ff_b"]["0"], nb)))
    return a, b


def final_block(p, a, b, temb, cfg: SD3DiTConfig):
    """JointTransformerFinalBlock.forward (sd3_dit.py:309-338)."""
    sh_a, sc_a, g_a, shm_a, scm_a, gm_a = _ada_mod(p["norm1_a"], temb, 6)
    na = layer_norm({}, a, cfg.eps) * (1 + sc_a) + sh_a
    sc_b, sh_b = _ada_mod(p["norm1_b"], temb, 2)   # single: (scale, shift)
    nb = layer_norm({}, b, cfg.eps) * (1 + sc_b) + sh_b
    out_a = joint_attention(p["attn"], na, nb, cfg, only_out_a=True)
    a = a + g_a * out_a
    na = layer_norm({}, a, cfg.eps) * (1 + scm_a) + shm_a
    a = a + gm_a * linear(p["ff_a"]["2"], gelu_tanh(linear(p["ff_a"]["0"], na)))
    return a


def cropped_pos_embed(table, height, width, patch: int = 2):
    """PatchEmbed.cropped_pos_embed (sd3_dit.py:36-41)."""
    h, w = height // patch, width // patch
    M = table.shape[1]
    top = (M - h) // 2
    left = (M - w) // 2
    return table[:, top:top + h, left:left + w].reshape(1, h * w, -1)


def sd3_dit_forward(params, cfg: SD3DiTConfig, hidden_states, timestep,
                    prompt_emb, pooled_prompt_emb, remat: bool = False):
    """SD3DiT.forward (sd3_dit.py:369-397)."""
    dtype = hidden_states.dtype
    temb = _mlp_embed(params["time_embedder"],
                      timestep_embedding_flux(timestep, cfg.time_freq_dim).astype(dtype))
    temb = temb + _mlp_embed(params["pooled_text_embedder"], pooled_prompt_emb)
    ctx = linear(params["context_embedder"], prompt_emb)

    height, width = hidden_states.shape[-2:]
    tokens = rearrange(hidden_states, "B C (H P) (W Q) -> B (H W) (C P Q)",
                       P=2, Q=2)
    x = linear(params["pos_embedder"]["proj"], tokens)
    x = x + cropped_pos_embed(params["pos_embedder"]["pos_embed"],
                              height, width).astype(x.dtype)

    if cfg.num_dual_blocks:
        def dual_scan(carry, layer_p):
            a, b = carry
            fn = joint_block
            if remat:
                fn = jax.checkpoint(joint_block, static_argnums=(4, 5))
            a, b = fn(layer_p, a, b, temb, cfg, True)
            return (a, b), None
        (x, ctx), _ = jax.lax.scan(dual_scan, (x, ctx), params["dual_blocks"])

    def scan(carry, layer_p):
        a, b = carry
        fn = joint_block
        if remat:
            fn = jax.checkpoint(joint_block, static_argnums=(4, 5))
        a, b = fn(layer_p, a, b, temb, cfg, False)
        return (a, b), None

    (x, ctx), _ = jax.lax.scan(scan, (x, ctx), params["blocks"])
    x = final_block(params["final_block"], x, ctx, temb, cfg)

    sc, sh = _ada_mod(params["norm_out"], temb, 2)
    x = layer_norm({}, x, cfg.eps) * (1 + sc) + sh
    x = linear(params["proj_out"], x)
    return rearrange(x, "B (H W) (P Q C) -> B C (H P) (W Q)", P=2, Q=2,
                     H=height // 2, W=width // 2)


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


def infer_sd3_config(sd) -> SD3DiTConfig:
    """SD3DiTStateDictConverter.infer_architecture (sd3_dit.py:406-422)."""
    dim = sd["blocks.0.ff_a.0.weight"].shape[1]
    num_layers = 0
    while f"blocks.{num_layers}.ff_a.0.bias" in sd:
        num_layers += 1
    use_rms_norm = "blocks.0.attn.norm_q_a.weight" in sd
    num_dual = 0
    while f"blocks.{num_dual}.attn2.a_to_out.bias" in sd:
        num_dual += 1
    return SD3DiTConfig(dim=dim, num_layers=num_layers,
                        num_dual_blocks=num_dual, use_rms_norm=use_rms_norm,
                        pos_embed_max_size=sd["pos_embedder.pos_embed"].shape[1])


def convert_sd3_dit(sd, cfg: SD3DiTConfig = None, dtype=jnp.bfloat16):
    """DiffSynth-layout SD3DiT state dict -> pytree. Raw civitai (mmdit
    joint_blocks.*) checkpoints are renamed first."""
    if any(k.startswith("model.diffusion_model.joint_blocks.") for k in sd):
        sd = rename_civitai_sd3(sd)
    if cfg is None:
        cfg = infer_sd3_config(sd)
    from .wan_dit import stack_blocks

    def attn_p(prefix, only_out_a=False):
        p = {"a_to_qkv": _lin_t(sd, f"{prefix}.a_to_qkv", dtype),
             "b_to_qkv": _lin_t(sd, f"{prefix}.b_to_qkv", dtype),
             "a_to_out": _lin_t(sd, f"{prefix}.a_to_out", dtype)}
        if not only_out_a:
            p["b_to_out"] = _lin_t(sd, f"{prefix}.b_to_out", dtype)
        for n in ("norm_q_a", "norm_k_a", "norm_q_b", "norm_k_b"):
            if f"{prefix}.{n}.weight" in sd:
                p[n] = {"weight": _j(sd[f"{prefix}.{n}.weight"], dtype)}
        return p

    def block_p(i, dual=False, final=False):
        b = f"blocks.{i}"
        p = {"norm1_a": {"linear": _lin_t(sd, f"{b}.norm1_a.linear", dtype)},
             "norm1_b": {"linear": _lin_t(sd, f"{b}.norm1_b.linear", dtype)},
             "attn": attn_p(f"{b}.attn", only_out_a=final),
             "ff_a": {"0": _lin_t(sd, f"{b}.ff_a.0", dtype),
                      "2": _lin_t(sd, f"{b}.ff_a.2", dtype)}}
        if not final:
            p["ff_b"] = {"0": _lin_t(sd, f"{b}.ff_b.0", dtype),
                         "2": _lin_t(sd, f"{b}.ff_b.2", dtype)}
        if dual:
            a2 = {"a_to_qkv": _lin_t(sd, f"{b}.attn2.a_to_qkv", dtype),
                  "a_to_out": _lin_t(sd, f"{b}.attn2.a_to_out", dtype)}
            for n in ("norm_q_a", "norm_k_a"):
                if f"{b}.attn2.{n}.weight" in sd:
                    a2[n] = {"weight": _j(sd[f"{b}.attn2.{n}.weight"], dtype)}
            p["attn2"] = a2
        return p

    n_dual = cfg.num_dual_blocks
    params = {
        "pos_embedder": {
            "proj": _conv2x2_as_lin(sd, "pos_embedder.proj", dtype),
            "pos_embed": _j(sd["pos_embedder.pos_embed"], dtype)},
        "time_embedder": {
            "fc1": _lin_t(sd, "time_embedder.timestep_embedder.0", dtype),
            "fc2": _lin_t(sd, "time_embedder.timestep_embedder.2", dtype)},
        "pooled_text_embedder": {
            "fc1": _lin_t(sd, "pooled_text_embedder.0", dtype),
            "fc2": _lin_t(sd, "pooled_text_embedder.2", dtype)},
        "context_embedder": _lin_t(sd, "context_embedder", dtype),
        "blocks": stack_blocks([
            block_p(i) for i in range(n_dual, cfg.num_layers - 1)]),
        "final_block": block_p(cfg.num_layers - 1, final=True),
        "norm_out": {"linear": _lin_t(sd, "norm_out.linear", dtype)},
        "proj_out": _lin_t(sd, "proj_out", dtype),
    }
    if n_dual:
        params["dual_blocks"] = stack_blocks(
            [block_p(i, dual=True) for i in range(n_dual)])
    return params


def _conv2x2_as_lin(sd, prefix, dtype):
    """2x2-stride-2 Conv2d -> linear over (C P Q)-flattened patches."""
    w = sd[prefix + ".weight"]
    if hasattr(w, "detach"):
        w = w.detach().float().cpu().numpy()
    w = np.asarray(w)                       # (D, C, 2, 2)
    w = w.reshape(w.shape[0], -1).T         # (C*2*2, D) in (C, P, Q) order
    p = {"w": jnp.asarray(w, dtype)}
    if prefix + ".bias" in sd:
        b = sd[prefix + ".bias"]
        if hasattr(b, "detach"):
            b = b.detach().float().cpu().numpy()
        p["b"] = jnp.asarray(np.asarray(b), dtype)
    return p


def rename_civitai_sd3(sd):
    """Raw mmdit layout -> DiffSynth module layout
    (SD3DiTStateDictConverter.from_civitai, sd3_dit.py:488-567), generated
    compactly. Fused qkv stays fused; the final block's norm1_b and norm_out
    swap (shift, scale) -> (scale, shift)."""
    import torch
    P = "model.diffusion_model."
    top = {
        f"{P}context_embedder": "context_embedder",
        f"{P}final_layer.linear": "proj_out",
        f"{P}x_embedder.proj": "pos_embedder.proj",
        f"{P}t_embedder.mlp.0": "time_embedder.timestep_embedder.0",
        f"{P}t_embedder.mlp.2": "time_embedder.timestep_embedder.2",
        f"{P}y_embedder.mlp.0": "pooled_text_embedder.0",
        f"{P}y_embedder.mlp.2": "pooled_text_embedder.2",
        f"{P}final_layer.adaLN_modulation.1": "norm_out.linear",
    }
    leaf = {
        "context_block.adaLN_modulation.1": "norm1_b.linear",
        "context_block.attn.proj": "attn.b_to_out",
        "context_block.attn.qkv": "attn.b_to_qkv",
        "context_block.attn.ln_q": "attn.norm_q_b",
        "context_block.attn.ln_k": "attn.norm_k_b",
        "context_block.mlp.fc1": "ff_b.0",
        "context_block.mlp.fc2": "ff_b.2",
        "x_block.adaLN_modulation.1": "norm1_a.linear",
        "x_block.attn.proj": "attn.a_to_out",
        "x_block.attn.qkv": "attn.a_to_qkv",
        "x_block.attn.ln_q": "attn.norm_q_a",
        "x_block.attn.ln_k": "attn.norm_k_a",
        "x_block.mlp.fc1": "ff_a.0",
        "x_block.mlp.fc2": "ff_a.2",
        "x_block.attn2.qkv": "attn2.a_to_qkv",
        "x_block.attn2.proj": "attn2.a_to_out",
        "x_block.attn2.ln_q": "attn2.norm_q_a",
        "x_block.attn2.ln_k": "attn2.norm_k_a",
    }
    out = {}
    for name, v in sd.items():
        if name == f"{P}pos_embed":
            m = int(v.shape[1] ** 0.5 + 0.4)
            out["pos_embedder.pos_embed"] = v.reshape(1, m, m, v.shape[-1])
            continue
        if "." in name:
            prefix, suffix = name.rsplit(".", 1)
            if prefix in top and suffix in ("weight", "bias"):
                out[f"{top[prefix]}.{suffix}"] = v
                continue
        if name.startswith(f"{P}joint_blocks."):
            rest = name[len(f"{P}joint_blocks."):]
            i, sub = rest.split(".", 1)
            mid, suffix = sub.rsplit(".", 1)
            if mid in leaf:
                out[f"blocks.{i}.{leaf[mid]}.{suffix}"] = v
    # swap (shift, scale) -> (scale, shift) on single-modulation heads
    n = 0
    while f"blocks.{n}.ff_a.0.bias" in out:
        n += 1
    for key in (f"blocks.{n - 1}.norm1_b.linear.weight",
                f"blocks.{n - 1}.norm1_b.linear.bias",
                "norm_out.linear.weight", "norm_out.linear.bias"):
        p = out[key]
        half = p.shape[0] // 2
        out[key] = torch.concat([p[half:], p[:half]], dim=0) \
            if hasattr(p, "shape") and hasattr(torch, "concat") else p
    return out
