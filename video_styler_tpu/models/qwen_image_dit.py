"""Qwen-Image DiT, TPU-native.

Functional re-design of the reference QwenImageDiT
(/root/reference/diffsynth/models/qwen_image_dit.py:405-540): 60 double-
stream blocks (FLUX-style separate img/txt weights, joint attention over
[txt | img]) with signed "scale_rope" position ids — height/width positions
are centered, negative indices use mirrored frequencies — and (2x2)
patchified 16-channel latents. Blocks run under `jax.lax.scan`.

The checkpoint layout IS the module layout (from_civitai is identity,
qwen_image_dit.py:546), so conversion is a direct nest+transpose.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from ..ops.basic import linear, layer_norm, silu, init_linear
from ..ops.attention import attention, sdpa
from .flux_dit import rope_apply_interleaved, _rms, _heads


@dataclass(frozen=True)
class QwenImageDiTConfig:
    dim: int = 3072
    num_heads: int = 24
    num_layers: int = 60
    in_dim: int = 64                # 16ch * 2 * 2
    text_dim: int = 3584            # Qwen2.5-VL hidden
    time_freq_dim: int = 256
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: int = 10000
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


QWEN_IMAGE = QwenImageDiTConfig()
QWEN_IMAGE_TINY = QwenImageDiTConfig(dim=96, num_heads=4, num_layers=2,
                                     text_dim=64, axes_dim=(4, 10, 10))


# --------------------------------------------------------------------------
# RoPE (QwenEmbedRope, qwen_image_dit.py:61-176)
# --------------------------------------------------------------------------

def _rope_1d(index: np.ndarray, dim: int, theta: float):
    freqs = np.outer(index.astype(np.float64),
                     1.0 / theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    return np.cos(freqs), np.sin(freqs)


def qwen_rope(cfg: QwenImageDiTConfig, img_shapes: List[Tuple[int, int, int]],
              txt_seq_len: int, frame_offsets: Optional[List[int]] = None):
    """-> (img_cos, img_sin, txt_cos, txt_sin), each (S, head_dim//2).

    scale_rope centers height/width: the first ceil(h/2) rows take mirrored
    negative indices (-1, -2, ...), the rest 0..h//2-1; text positions start
    at max(h//2, w//2) (QwenEmbedRope.forward, :125-168). Each extra image
    (edit/context latents) advances the frame axis by its list index."""
    a0, a1, a2 = cfg.axes_dim
    img_cos, img_sin = [], []
    max_vid = 0
    for idx, (f, h, w) in enumerate(img_shapes):
        fo = idx if frame_offsets is None else frame_offsets[idx]
        f_idx = np.arange(fo, fo + f)
        h_idx = np.concatenate([np.arange(-(h - h // 2), 0), np.arange(h // 2)])
        w_idx = np.concatenate([np.arange(-(w - w // 2), 0), np.arange(w // 2)])
        cf, sf = _rope_1d(f_idx, a0, cfg.theta)        # (f, a0/2)
        ch, sh = _rope_1d(h_idx, a1, cfg.theta)        # (h, a1/2)
        cw, sw = _rope_1d(w_idx, a2, cfg.theta)        # (w, a2/2)
        cos = np.concatenate([
            np.broadcast_to(cf[:, None, None], (f, h, w, a0 // 2)),
            np.broadcast_to(ch[None, :, None], (f, h, w, a1 // 2)),
            np.broadcast_to(cw[None, None, :], (f, h, w, a2 // 2)),
        ], axis=-1).reshape(f * h * w, -1)
        sin = np.concatenate([
            np.broadcast_to(sf[:, None, None], (f, h, w, a0 // 2)),
            np.broadcast_to(sh[None, :, None], (f, h, w, a1 // 2)),
            np.broadcast_to(sw[None, None, :], (f, h, w, a2 // 2)),
        ], axis=-1).reshape(f * h * w, -1)
        img_cos.append(cos)
        img_sin.append(sin)
        max_vid = max(max_vid, h // 2, w // 2)
    t_idx = np.arange(max_vid, max_vid + txt_seq_len)
    ct = np.concatenate([_rope_1d(t_idx, d, cfg.theta)[0]
                         for d in cfg.axes_dim], axis=-1)
    st = np.concatenate([_rope_1d(t_idx, d, cfg.theta)[1]
                         for d in cfg.axes_dim], axis=-1)
    return (np.concatenate(img_cos).astype(np.float32),
            np.concatenate(img_sin).astype(np.float32),
            ct.astype(np.float32), st.astype(np.float32))


# --------------------------------------------------------------------------
# Init / conversion
# --------------------------------------------------------------------------

def init_qwen_block(key, cfg: QwenImageDiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 14)
    d, hd = cfg.dim, cfg.head_dim
    rms = lambda: {"weight": jnp.ones((hd,), dtype)}
    return {
        "img_mod": {"1": init_linear(ks[0], d, 6 * d, dtype=dtype)},
        "txt_mod": {"1": init_linear(ks[1], d, 6 * d, dtype=dtype)},
        "attn": {
            "to_q": init_linear(ks[2], d, d, dtype=dtype),
            "to_k": init_linear(ks[3], d, d, dtype=dtype),
            "to_v": init_linear(ks[4], d, d, dtype=dtype),
            "norm_q": rms(), "norm_k": rms(),
            "add_q_proj": init_linear(ks[5], d, d, dtype=dtype),
            "add_k_proj": init_linear(ks[6], d, d, dtype=dtype),
            "add_v_proj": init_linear(ks[7], d, d, dtype=dtype),
            "norm_added_q": rms(), "norm_added_k": rms(),
            "to_out": {"0": init_linear(ks[8], d, d, dtype=dtype)},
            "to_add_out": init_linear(ks[9], d, d, dtype=dtype),
        },
        "img_mlp": {"net": {"0": {"proj": init_linear(ks[10], d, 4 * d, dtype=dtype)},
                            "2": init_linear(ks[11], 4 * d, d, dtype=dtype)}},
        "txt_mlp": {"net": {"0": {"proj": init_linear(ks[12], d, 4 * d, dtype=dtype)},
                            "2": init_linear(ks[13], 4 * d, d, dtype=dtype)}},
    }


def init_qwen_image_dit(key, cfg: QwenImageDiTConfig, dtype=jnp.float32):
    from .wan_dit import stack_blocks
    ks = jax.random.split(key, cfg.num_layers + 6)
    d = cfg.dim
    return {
        "time_text_embed": {
            "timestep_embedder": {
                "linear_1": init_linear(ks[0], cfg.time_freq_dim, d, dtype=dtype),
                "linear_2": init_linear(ks[1], d, d, dtype=dtype)}},
        "txt_norm": {"weight": jnp.ones((cfg.text_dim,), dtype)},
        "img_in": init_linear(ks[2], cfg.in_dim, d, dtype=dtype),
        "txt_in": init_linear(ks[3], cfg.text_dim, d, dtype=dtype),
        "transformer_blocks": stack_blocks([
            init_qwen_block(ks[6 + i], cfg, dtype)
            for i in range(cfg.num_layers)]),
        "norm_out": {"linear": init_linear(ks[4], d, 2 * d, dtype=dtype)},
        "proj_out": init_linear(ks[5], d, cfg.in_dim, dtype=dtype),
    }


def convert_qwen_image_dit(sd, cfg: QwenImageDiTConfig = QWEN_IMAGE,
                           dtype=jnp.bfloat16):
    def _j(v):
        if hasattr(v, "detach"):
            v = v.detach().float().cpu().numpy()
        return jnp.asarray(np.asarray(v), dtype)

    def lin(prefix):
        p = {"w": _j(sd[prefix + ".weight"]).T}
        if prefix + ".bias" in sd:
            p["b"] = _j(sd[prefix + ".bias"])
        return p

    from .wan_dit import stack_blocks

    def block(i):
        b = f"transformer_blocks.{i}"
        return {
            "img_mod": {"1": lin(f"{b}.img_mod.1")},
            "txt_mod": {"1": lin(f"{b}.txt_mod.1")},
            "attn": {
                "to_q": lin(f"{b}.attn.to_q"),
                "to_k": lin(f"{b}.attn.to_k"),
                "to_v": lin(f"{b}.attn.to_v"),
                "norm_q": {"weight": _j(sd[f"{b}.attn.norm_q.weight"])},
                "norm_k": {"weight": _j(sd[f"{b}.attn.norm_k.weight"])},
                "add_q_proj": lin(f"{b}.attn.add_q_proj"),
                "add_k_proj": lin(f"{b}.attn.add_k_proj"),
                "add_v_proj": lin(f"{b}.attn.add_v_proj"),
                "norm_added_q": {"weight": _j(sd[f"{b}.attn.norm_added_q.weight"])},
                "norm_added_k": {"weight": _j(sd[f"{b}.attn.norm_added_k.weight"])},
                "to_out": {"0": lin(f"{b}.attn.to_out.0")},
                "to_add_out": lin(f"{b}.attn.to_add_out"),
            },
            "img_mlp": {"net": {"0": {"proj": lin(f"{b}.img_mlp.net.0.proj")},
                                "2": lin(f"{b}.img_mlp.net.2")}},
            "txt_mlp": {"net": {"0": {"proj": lin(f"{b}.txt_mlp.net.0.proj")},
                                "2": lin(f"{b}.txt_mlp.net.2")}},
        }

    return {
        "time_text_embed": {"timestep_embedder": {
            "linear_1": lin("time_text_embed.timestep_embedder.linear_1"),
            "linear_2": lin("time_text_embed.timestep_embedder.linear_2")}},
        "txt_norm": {"weight": _j(sd["txt_norm.weight"])},
        "img_in": lin("img_in"),
        "txt_in": lin("txt_in"),
        "transformer_blocks": stack_blocks(
            [block(i) for i in range(cfg.num_layers)]),
        "norm_out": {"linear": lin("norm_out.linear")},
        "proj_out": lin("proj_out"),
    }


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _approx_gelu(p, x):
    h = linear(p["proj"], x)
    return h * jax.nn.sigmoid(1.702 * h)


def _mod3(mods, x, eps):
    sh, sc, gate = jnp.split(mods[:, None, :], 3, axis=-1)
    return layer_norm({}, x, eps) * (1 + sc) + sh, gate


def qwen_block(p, img, txt, temb, img_cs, txt_cs, cfg: QwenImageDiTConfig,
               attn_bias=None):
    """QwenImageTransformerBlock.forward (qwen_image_dit.py:352-403)."""
    img_cos, img_sin = img_cs
    txt_cos, txt_sin = txt_cs
    img_mods = linear(p["img_mod"]["1"], silu(temb))
    txt_mods = linear(p["txt_mod"]["1"], silu(temb))
    img_mod_attn, img_mod_mlp = jnp.split(img_mods, 2, axis=-1)
    txt_mod_attn, txt_mod_mlp = jnp.split(txt_mods, 2, axis=-1)

    n_img, g_img = _mod3(img_mod_attn, img, cfg.eps)
    n_txt, g_txt = _mod3(txt_mod_attn, txt, cfg.eps)

    ap = p["attn"]
    nh = cfg.num_heads
    q_i = _rms(ap["norm_q"], _heads(linear(ap["to_q"], n_img), nh), cfg.eps)
    k_i = _rms(ap["norm_k"], _heads(linear(ap["to_k"], n_img), nh), cfg.eps)
    v_i = _heads(linear(ap["to_v"], n_img), nh)
    q_t = _rms(ap["norm_added_q"], _heads(linear(ap["add_q_proj"], n_txt), nh),
               cfg.eps)
    k_t = _rms(ap["norm_added_k"], _heads(linear(ap["add_k_proj"], n_txt), nh),
               cfg.eps)
    v_t = _heads(linear(ap["add_v_proj"], n_txt), nh)

    q_i = rope_apply_interleaved(q_i, img_cos, img_sin)
    k_i = rope_apply_interleaved(k_i, img_cos, img_sin)
    q_t = rope_apply_interleaved(q_t, txt_cos, txt_sin)
    k_t = rope_apply_interleaved(k_t, txt_cos, txt_sin)

    q = jnp.concatenate([q_t, q_i], axis=1)
    k = jnp.concatenate([k_t, k_i], axis=1)
    v = jnp.concatenate([v_t, v_i], axis=1)
    if attn_bias is not None:
        out = sdpa(q, k, v, bias=attn_bias)
    else:
        out = attention(q, k, v)
    out = out.reshape(out.shape[0], out.shape[1], cfg.dim)
    s_txt = txt.shape[1]
    out_t, out_i = out[:, :s_txt], out[:, s_txt:]

    img = img + g_img * linear(ap["to_out"]["0"], out_i)
    txt = txt + g_txt * linear(ap["to_add_out"], out_t)

    n_img2, g_img2 = _mod3(img_mod_mlp, img, cfg.eps)
    n_txt2, g_txt2 = _mod3(txt_mod_mlp, txt, cfg.eps)
    img = img + g_img2 * linear(p["img_mlp"]["net"]["2"],
                                _approx_gelu(p["img_mlp"]["net"]["0"], n_img2))
    txt = txt + g_txt2 * linear(p["txt_mlp"]["net"]["2"],
                                _approx_gelu(p["txt_mlp"]["net"]["0"], n_txt2))
    return img, txt


def qwen_image_dit_forward(params, cfg: QwenImageDiTConfig, latents, timestep,
                           prompt_emb, txt_seq_len: Optional[int] = None,
                           extra_latents: Optional[list] = None,
                           attn_bias=None, frame_offsets=None,
                           blockwise_cn=None, remat: bool = False):
    """QwenImageDiT.forward + model_fn_qwen_image
    (qwen_image_dit.py:502-534, pipelines/qwen_image.py:780-861).

    latents: (B, 16, H, W); timestep: (B,) already divided by 1000 in the
    pipeline; prompt_emb: (B, L, text_dim). extra_latents: list of extra
    (B, 16, h, w) images (edit/context) appended as additional RoPE frames
    and dropped from the output. blockwise_cn: optional
    (stacked_cn_blocks, cond_tokens (B, n_img, dim), scale) — the per-layer
    block-wise ControlNet residual rides the same scan
    (pipelines/qwen_image.py:844-852).
    """
    from .flux_dit import timestep_embedding_flux
    dtype = latents.dtype
    H, W = latents.shape[-2:]
    img = rearrange(latents, "B C (H P) (W Q) -> B (H W) (C P Q)", P=2, Q=2)
    n_img = img.shape[1]
    img_shapes = [(latents.shape[0], H // 2, W // 2)]
    if extra_latents:
        for e in extra_latents:
            img_shapes.append((e.shape[0], e.shape[2] // 2, e.shape[3] // 2))
            img = jnp.concatenate(
                [img, rearrange(e, "B C (H P) (W Q) -> B (H W) (C P Q)",
                                P=2, Q=2)], axis=1)
    img = linear(params["img_in"], img)

    tn = params["txt_norm"]["weight"].astype(jnp.float32)
    pf = prompt_emb.astype(jnp.float32)
    pf = pf * jax.lax.rsqrt(jnp.mean(jnp.square(pf), -1, keepdims=True) + cfg.eps)
    txt = linear(params["txt_in"], (pf * tn).astype(dtype))

    # diffusers-compatible timestep embedding with scale=1000
    te = params["time_text_embed"]["timestep_embedder"]
    emb = timestep_embedding_flux(timestep * 1000.0, cfg.time_freq_dim)
    temb = linear(te["linear_2"], silu(linear(te["linear_1"],
                                              emb.astype(dtype))))

    if txt_seq_len is None:
        txt_seq_len = prompt_emb.shape[1]
    ic, isin, tc, tsin = qwen_rope(cfg, img_shapes, txt_seq_len,
                                   frame_offsets=frame_offsets)
    img_cs = (jnp.asarray(ic), jnp.asarray(isin))
    txt_cs = (jnp.asarray(tc), jnp.asarray(tsin))

    def scan_fn(carry, bp):
        a, b = carry
        fn = qwen_block
        if remat:
            fn = jax.checkpoint(qwen_block, static_argnums=(5,))
        a, b = fn(bp, a, b, temb, img_cs, txt_cs, cfg, attn_bias)
        return (a, b), None

    if blockwise_cn is None:
        (img, txt), _ = jax.lax.scan(scan_fn, (img, txt),
                                     params["transformer_blocks"])
    else:
        from .qwen_image_controlnet import qwen_blockwise_cn_block
        conds = [c for _, c, _ in blockwise_cn]
        scales = [s for _, _, s in blockwise_cn]

        def scan_fn_cn(carry, xs):
            bp, cps = xs
            (a, b), _ = scan_fn(carry, bp)
            sl = jax.lax.dynamic_slice_in_dim(a, 0, n_img, axis=1)
            acc = sl
            for cp, cond, scale in zip(cps, conds, scales):
                res = qwen_blockwise_cn_block(cp, sl, cond.astype(sl.dtype),
                                              cfg.eps)
                acc = acc + res * jnp.asarray(scale, res.dtype)
            a = jax.lax.dynamic_update_slice_in_dim(a, acc, 0, axis=1)
            return (a, b), None

        (img, txt), _ = jax.lax.scan(
            scan_fn_cn, (img, txt),
            (params["transformer_blocks"], [b for b, _, _ in blockwise_cn]))

    sc, sh = jnp.split(linear(params["norm_out"]["linear"],
                              silu(temb))[:, None, :], 2, axis=-1)
    img = layer_norm({}, img, cfg.eps) * (1 + sc) + sh
    img = linear(params["proj_out"], img)[:, :n_img]
    return rearrange(img, "B (H W) (C P Q) -> B C (H P) (W Q)",
                     H=H // 2, W=W // 2, P=2, Q=2)
