"""CogVideoX family, TPU-native.

Functional re-design of CogDiT (/root/reference/diffsynth/models/cog_dit.py
:108-340) and CogVAEEncoder/Decoder (cog_vae.py:189-362):

- DiT: 42 joint blocks over [text | video] with a SHARED affine LayerNorm
  modulated per-stream (CogAdaLayerNorm), per-head affine-LN'd Q/K, and 3-D
  RoPE whose spatial grid is fractionally resampled to the training aspect
  (get_resize_crop_region_for_grid). Blocks run under `jax.lax.scan`.
- VAE: the reference streams chunks through CachedConv3d whose cache is
  initialized by duplicating the first frame twice. The convolutions are
  exactly chunk-invariant (a fresh cache == replicate-padding time by 2),
  but the GroupNorm/SpatialNorm statistics are NOT — the reference
  normalizes per chunk, so encode/decode here default to the same carried-
  cache chunk schedules (8 video frames / 2 latent frames) and per-chunk
  norms; `streaming=False` gives the single-pass full-sequence variant.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange

from ..ops.basic import linear, layer_norm, silu, gelu_tanh, init_linear, init_layer_norm
from ..ops.attention import attention
from .flux_dit import rope_apply_interleaved
from .wan_vae import _CacheIO


@dataclass(frozen=True)
class CogDiTConfig:
    dim: int = 3072
    cond_dim: int = 512
    num_heads: int = 48
    num_layers: int = 42
    in_channels: int = 16
    text_dim: int = 4096
    time_freq_dim: int = 3072
    theta: int = 10000
    base_height: int = 480
    base_width: int = 720
    eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


COG_VIDEO_X = CogDiTConfig()
COG_DIT_TINY = CogDiTConfig(dim=96, cond_dim=32, num_heads=2, num_layers=2,
                            text_dim=64, time_freq_dim=64)


def cog_rope(cfg: CogDiTConfig, t: int, h: int, w: int):
    """prepare_rotary_positional_embeddings (cog_dit.py:120-258): fractional
    spatial grid resampled into the training-resolution crop region.
    Returns cos/sin (S, head_dim//2) with interleaved-pair convention."""
    bw = cfg.base_width // 16
    bh = cfg.base_height // 16
    r = h / w
    if r > bh / bw:
        rh, rw = bh, int(round(bh / h * w))
    else:
        rw, rh = bw, int(round(bw / w * h))
    top = int(round((bh - rh) / 2.0))
    left = int(round((bw - rw) / 2.0))
    grid_h = np.linspace(top, top + rh, h, endpoint=False, dtype=np.float32)
    grid_w = np.linspace(left, left + rw, w, endpoint=False, dtype=np.float32)
    grid_t = np.linspace(0, t, t, endpoint=False, dtype=np.float32)

    d = cfg.head_dim
    dim_t, dim_h, dim_w = d // 4, d // 8 * 3, d // 8 * 3

    def freqs(grid, dim):
        f = 1.0 / cfg.theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim)
        return np.einsum("n,f->nf", grid, f)

    ft = freqs(grid_t, dim_t)                      # (t, dim_t/2)
    fh = freqs(grid_h, dim_h)
    fw = freqs(grid_w, dim_w)
    full = np.concatenate([
        np.broadcast_to(ft[:, None, None], (t, h, w, ft.shape[-1])),
        np.broadcast_to(fh[None, :, None], (t, h, w, fh.shape[-1])),
        np.broadcast_to(fw[None, None, :], (t, h, w, fw.shape[-1])),
    ], axis=-1).reshape(t * h * w, -1)
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


# --------------------------------------------------------------------------
# Init / conversion
# --------------------------------------------------------------------------

def init_cog_block(key, cfg: CogDiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    d, hd = cfg.dim, cfg.head_dim
    return {
        "norm1": {"linear": init_linear(ks[0], cfg.cond_dim, 6 * d, dtype=dtype),
                  "norm": init_layer_norm(d, dtype=dtype)},
        "attn1": {"to_q": init_linear(ks[1], d, d, dtype=dtype),
                  "to_k": init_linear(ks[2], d, d, dtype=dtype),
                  "to_v": init_linear(ks[3], d, d, dtype=dtype),
                  "to_out": init_linear(ks[4], d, d, dtype=dtype)},
        "norm_q": init_layer_norm(hd, dtype=dtype),
        "norm_k": init_layer_norm(hd, dtype=dtype),
        "norm2": {"linear": init_linear(ks[5], cfg.cond_dim, 6 * d, dtype=dtype),
                  "norm": init_layer_norm(d, dtype=dtype)},
        "ff": {"0": init_linear(ks[6], d, 4 * d, dtype=dtype),
               "2": init_linear(ks[7], 4 * d, d, dtype=dtype)},
    }


def init_cog_dit(key, cfg: CogDiTConfig, dtype=jnp.float32):
    from .wan_dit import stack_blocks
    ks = jax.random.split(key, cfg.num_layers + 6)
    d = cfg.dim
    return {
        "patchify": {"proj": init_linear(ks[0], cfg.in_channels * 4, d,
                                         dtype=dtype)},
        "time_embedder": {
            "fc1": init_linear(ks[1], cfg.time_freq_dim, cfg.cond_dim, dtype=dtype),
            "fc2": init_linear(ks[2], cfg.cond_dim, cfg.cond_dim, dtype=dtype)},
        "context_embedder": init_linear(ks[3], cfg.text_dim, d, dtype=dtype),
        "blocks": stack_blocks([init_cog_block(ks[6 + i], cfg, dtype)
                                for i in range(cfg.num_layers)]),
        "norm_final": init_layer_norm(d, dtype=dtype),
        "norm_out": {"linear": init_linear(ks[4], cfg.cond_dim, 2 * d, dtype=dtype),
                     "norm": init_layer_norm(d, dtype=dtype)},
        "proj_out": init_linear(ks[5], d, cfg.in_channels * 4, dtype=dtype),
    }


def convert_cog_dit(sd, cfg: CogDiTConfig = COG_VIDEO_X, dtype=jnp.bfloat16):
    def _j(v):
        if hasattr(v, "detach"):
            v = v.detach().float().cpu().numpy()
        return jnp.asarray(np.asarray(v), dtype)

    def lin(prefix):
        p = {"w": _j(sd[prefix + ".weight"]).T}
        if prefix + ".bias" in sd:
            p["b"] = _j(sd[prefix + ".bias"])
        return p

    def ln(prefix):
        return {"scale": _j(sd[prefix + ".weight"]),
                "bias": _j(sd[prefix + ".bias"])}

    from .wan_dit import stack_blocks

    def block(i):
        b = f"blocks.{i}"
        return {
            "norm1": {"linear": lin(f"{b}.norm1.linear"),
                      "norm": ln(f"{b}.norm1.norm")},
            "attn1": {"to_q": lin(f"{b}.attn1.to_q"),
                      "to_k": lin(f"{b}.attn1.to_k"),
                      "to_v": lin(f"{b}.attn1.to_v"),
                      "to_out": lin(f"{b}.attn1.to_out")},
            "norm_q": ln(f"{b}.norm_q"),
            "norm_k": ln(f"{b}.norm_k"),
            "norm2": {"linear": lin(f"{b}.norm2.linear"),
                      "norm": ln(f"{b}.norm2.norm")},
            "ff": {"0": lin(f"{b}.ff.0"), "2": lin(f"{b}.ff.2")},
        }

    w = sd["patchify.proj.weight"]
    if hasattr(w, "detach"):
        w = w.detach().float().cpu().numpy()
    w = np.asarray(w)                        # (D, C, 1, 2, 2)
    patch = {"w": jnp.asarray(w.reshape(w.shape[0], -1).T, dtype),
             "b": _j(sd["patchify.proj.bias"])}
    return {
        "patchify": {"proj": patch},
        "time_embedder": {
            "fc1": lin("time_embedder.timestep_embedder.0"),
            "fc2": lin("time_embedder.timestep_embedder.2")},
        "context_embedder": lin("context_embedder"),
        "blocks": stack_blocks([block(i) for i in range(cfg.num_layers)]),
        "norm_final": ln("norm_final"),
        "norm_out": {"linear": lin("norm_out.linear"),
                     "norm": ln("norm_out.norm")},
        "proj_out": lin("proj_out"),
    }


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _ada(p, x_a, x_b, temb, eps):
    """CogAdaLayerNorm (cog_dit.py:23-42): one shared affine LN, per-stream
    modulation."""
    m = linear(p["linear"], silu(temb))[:, None, :]
    sh_a, sc_a, g_a, sh_b, sc_b, g_b = jnp.split(m, 6, axis=-1)
    na = layer_norm(p["norm"], x_a, eps) * (1 + sc_a) + sh_a
    nb = layer_norm(p["norm"], x_b, eps) * (1 + sc_b) + sh_b
    return na, nb, g_a, g_b


def _ln_head(p, x, eps):
    xf = layer_norm({}, x, eps)
    return xf * p["scale"].astype(xf.dtype) + p["bias"].astype(xf.dtype)


def cog_block(p, vid, txt, temb, cos, sin, cfg: CogDiTConfig):
    """CogDiTBlock.forward (cog_dit.py:80-105)."""
    nv, nt, g_a, g_b = _ada(p["norm1"], vid, txt, temb, cfg.eps)
    x = jnp.concatenate([nt, nv], axis=1)
    nh, hd = cfg.num_heads, cfg.head_dim
    b, s, _ = x.shape
    q = linear(p["attn1"]["to_q"], x).reshape(b, s, nh, hd)
    k = linear(p["attn1"]["to_k"], x).reshape(b, s, nh, hd)
    v = linear(p["attn1"]["to_v"], x).reshape(b, s, nh, hd)
    q = _ln_head(p["norm_q"], q, 1e-6)
    k = _ln_head(p["norm_k"], k, 1e-6)
    s_txt = txt.shape[1]
    q = q.at[:, s_txt:].set(rope_apply_interleaved(q[:, s_txt:], cos, sin))
    k = k.at[:, s_txt:].set(rope_apply_interleaved(k[:, s_txt:], cos, sin))
    out = attention(q, k, v).reshape(b, s, cfg.dim)
    out = linear(p["attn1"]["to_out"], out)
    vid = vid + g_a * out[:, s_txt:]
    txt = txt + g_b * out[:, :s_txt]

    nv, nt, g_a, g_b = _ada(p["norm2"], vid, txt, temb, cfg.eps)
    vid = vid + g_a * linear(p["ff"]["2"], gelu_tanh(linear(p["ff"]["0"], nv)))
    txt = txt + g_b * linear(p["ff"]["2"], gelu_tanh(linear(p["ff"]["0"], nt)))
    return vid, txt


def cog_dit_forward(params, cfg: CogDiTConfig, latents, timestep, prompt_emb,
                    remat: bool = False):
    """CogDiT.forward (cog_dit.py:286-320). latents: (B, 16, T, H, W)."""
    from .flux_dit import timestep_embedding_flux
    T, H, W = latents.shape[-3:]
    vid = rearrange(latents, "B C T (H P) (W Q) -> B (T H W) (C P Q)",
                    P=2, Q=2)
    vid = linear(params["patchify"]["proj"], vid)
    temb = timestep_embedding_flux(timestep, cfg.time_freq_dim).astype(vid.dtype)
    temb = linear(params["time_embedder"]["fc2"],
                  silu(linear(params["time_embedder"]["fc1"], temb)))
    txt = linear(params["context_embedder"], prompt_emb)

    cos, sin = cog_rope(cfg, T, H // 2, W // 2)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    def scan_fn(carry, bp):
        a, b = carry
        fn = cog_block
        if remat:
            fn = jax.checkpoint(cog_block, static_argnums=(6,))
        a, b = fn(bp, a, b, temb, cos, sin, cfg)
        return (a, b), None

    (vid, txt), _ = jax.lax.scan(scan_fn, (vid, txt), params["blocks"])

    vid = _ln_head(params["norm_final"], vid, cfg.eps)
    m = linear(params["norm_out"]["linear"], silu(temb))[:, None, :]
    sh, sc = jnp.split(m, 2, axis=-1)
    vid = layer_norm(params["norm_out"]["norm"], vid, cfg.eps) * (1 + sc) + sh
    vid = linear(params["proj_out"], vid)
    return rearrange(vid, "B (T H W) (C P Q) -> B C T (H P) (W Q)",
                     T=T, H=H // 2, W=W // 2, P=2, Q=2)


# --------------------------------------------------------------------------
# VAE (cog_vae.py) — full-sequence form of the CachedConv3d streaming
# --------------------------------------------------------------------------

def _cached_conv3d(p, x, io=None):
    """CachedConv3d (cog_vae.py:169-186).

    io=None runs the full-sequence form: a fresh cache duplicates the first
    frame twice == replicate-pad time by 2. With a _CacheIO the 2-frame tail
    of each chunk's padded input is carried to the next chunk — the exact
    streaming semantics of the reference (cache = input[:, :, -2:] where
    input is the concatenated cache+chunk, cog_vae.py:179-186)."""
    if io is None:
        xin = jnp.concatenate([x[:, :, :1], x[:, :, :1], x], axis=2)
    else:
        cache = io.get(
            lambda: jnp.concatenate([x[:, :, :1], x[:, :, :1]], axis=2))
        xin = jnp.concatenate([cache, x], axis=2)
        io.put(xin[:, :, -2:])
    y = jax.lax.conv_general_dilated(
        xin, p["weight"].astype(xin.dtype), (1, 1, 1),
        ((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)[None, :, None, None, None]
    return y.astype(xin.dtype)


def _gn(p, x, groups, eps=1e-6):
    b, c, t, h, w = x.shape
    xf = x.astype(jnp.float32).reshape(b, groups, c // groups, t, h, w)
    mean = jnp.mean(xf, axis=(2, 3, 4, 5), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(2, 3, 4, 5), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, c, t, h, w)
    y = y * p["weight"].astype(jnp.float32)[None, :, None, None, None]
    y = y + p["bias"].astype(jnp.float32)[None, :, None, None, None]
    return y.astype(x.dtype)


def _nearest_resize_3d(z, size):
    """torch F.interpolate nearest over (T, H, W)."""
    b, c = z.shape[:2]
    T, H, W = size
    ti = (jnp.arange(T) * z.shape[2] // T)
    hi = (jnp.arange(H) * z.shape[3] // H)
    wi = (jnp.arange(W) * z.shape[4] // W)
    return z[:, :, ti][:, :, :, hi][:, :, :, :, wi]


def _spatial_norm(p, f, zq, groups=32):
    """CogVideoXSpatialNorm3D (cog_vae.py:103-125)."""
    if f.shape[2] > 1 and f.shape[2] % 2 == 1:
        zf = _nearest_resize_3d(zq[:, :, :1], (1,) + f.shape[3:])
        zr = _nearest_resize_3d(zq[:, :, 1:], (f.shape[2] - 1,) + f.shape[3:])
        zq = jnp.concatenate([zf, zr], axis=2)
    else:
        zq = _nearest_resize_3d(zq, f.shape[2:])
    nf = _gn(p["norm_layer"], f, groups)
    y = _conv1x1_3d(p["conv_y"], zq)
    b = _conv1x1_3d(p["conv_b"], zq)
    return nf * y + b


def _conv1x1_3d(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (1, 1, 1), "VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)[None, :, None, None, None]).astype(x.dtype)


def _resnet3d(p, x, zq, groups=32, io=None):
    """Resnet3DBlock (cog_vae.py:128-166)."""
    res = x
    if "norm_layer" in p["norm1"]:
        h = _spatial_norm(p["norm1"], x, zq, groups)
    else:
        h = _gn(p["norm1"], x, groups)
    h = _cached_conv3d(p["conv1"], jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype), io)
    if "norm_layer" in p["norm2"]:
        h = _spatial_norm(p["norm2"], h, zq, groups)
    else:
        h = _gn(p["norm2"], h, groups)
    h = _cached_conv3d(p["conv2"], jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype), io)
    if "conv_shortcut" in p:
        w = p["conv_shortcut"]["weight"]
        if w.ndim == 5 and w.shape[2] == 3:
            res = _cached_conv3d(p["conv_shortcut"], res, io)
        else:
            res = _conv1x1_3d(p["conv_shortcut"], res)
    return h + res


def _downsample3d(p, x, compress_time):
    """Downsample3D (cog_vae.py:7-53)."""
    if compress_time:
        b, c, t, h, w = x.shape
        if t % 2 == 1:
            first, rest = x[:, :, :1], x[:, :, 1:]
            if rest.shape[2] > 0:
                rest = rest.reshape(b, c, rest.shape[2] // 2, 2, h, w).mean(axis=3)
            x = jnp.concatenate([first, rest], axis=2)
        else:
            x = x.reshape(b, c, t // 2, 2, h, w).mean(axis=3)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 1)))
    b, c, t, h, w = x.shape
    x2 = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    y = jax.lax.conv_general_dilated(
        x2, p["conv"]["weight"].astype(x2.dtype), (2, 2), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    y = (y + p["conv"]["bias"].astype(jnp.float32)[None, :, None, None]).astype(x.dtype)
    return y.reshape(b, t, y.shape[1], y.shape[2], y.shape[3]).transpose(0, 2, 1, 3, 4)


def _upsample3d(p, x, compress_time):
    """Upsample3D (cog_vae.py:57-100)."""
    if compress_time:
        if x.shape[2] > 1 and x.shape[2] % 2 == 1:
            first, rest = x[:, :, 0], x[:, :, 1:]
            first = jnp.repeat(jnp.repeat(first, 2, -2), 2, -1)[:, :, None]
            rest = jnp.repeat(rest, 2, axis=2)
            rest = jnp.repeat(jnp.repeat(rest, 2, -2), 2, -1)
            x = jnp.concatenate([first, rest], axis=2)
        elif x.shape[2] > 1:
            x = jnp.repeat(x, 2, axis=2)
            x = jnp.repeat(jnp.repeat(x, 2, -2), 2, -1)
        else:
            x = jnp.repeat(jnp.repeat(x, 2, -2), 2, -1)
    else:
        x = jnp.repeat(jnp.repeat(x, 2, -2), 2, -1)
    b, c, t, h, w = x.shape
    x2 = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    y = jax.lax.conv_general_dilated(
        x2, p["conv"]["weight"].astype(x2.dtype), (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    y = (y + p["conv"]["bias"].astype(jnp.float32)[None, :, None, None]).astype(x.dtype)
    return y.reshape(b, t, y.shape[1], y.shape[2], y.shape[3]).transpose(0, 2, 1, 3, 4)


COG_ENCODER_PLAN = (["res"] * 3 + [("down", True)] + ["res"] * 3
                    + [("down", True)] + ["res"] * 3 + [("down", False)]
                    + ["res"] * 5)
COG_DECODER_PLAN = (["res"] * 6 + [("up", True)] + ["res"] * 4
                    + [("up", True)] + ["res"] * 4 + [("up", False)]
                    + ["res"] * 4)


def _encode_core(params, video, io=None):
    """CogVAEEncoder.forward (cog_vae.py:306-330) over one chunk (or the
    full sequence when io is None)."""
    h = _cached_conv3d(params["conv_in"], video, io)
    for i, op in enumerate(COG_ENCODER_PLAN):
        p = params["blocks"][str(i)]
        if op == "res":
            h = _resnet3d(p, h, video, io=io)
        else:
            h = _downsample3d(p, h, op[1])
    h = _gn(params["norm_out"], h, 32)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    return _cached_conv3d(params["conv_out"], h, io)[:, :16]


def _decode_core(params, z, io=None):
    """CogVAEDecoder.forward (cog_vae.py:223-235) over one chunk."""
    h = _cached_conv3d(params["conv_in"], z, io)
    for i, op in enumerate(COG_DECODER_PLAN):
        p = params["blocks"][str(i)]
        if op == "res":
            h = _resnet3d(p, h, z, io=io)
        else:
            h = _upsample3d(p, h, op[1])
    h = _spatial_norm(params["norm_out"], h, z)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    return _cached_conv3d(params["conv_out"], h, io)


def _encode_chunks(T: int):
    """encode_small_video's 8-frame schedule (cog_vae.py:339-354): odd T
    puts the extra frame in chunk 0. The reference silently DROPS trailing
    frames when T % 8 is not in {0, 1}; we instead emit one final PARTIAL
    chunk (always an even frame count, so the temporal mean-pools divide) —
    identical to the reference on every frame it covers, per-chunk norm
    semantics throughout."""
    odd = T % 2
    chunks = [(0, min(9, T)) if odd and i == 0
              else (8 * i + odd, 8 * i + 8 + odd)
              for i in range(max(T // 8, 1 if odd else 0))]
    if not chunks:
        return [(0, T)]
    last = chunks[-1][1]
    if last < T:
        chunks.append((last, T))
    return chunks


def _decode_chunks(T: int):
    """decode_small_video's 2-latent-frame schedule (cog_vae.py:254-270)."""
    odd = T % 2
    return [(0, 3) if odd and i == 0 else (2 * i + odd, 2 * i + 2 + odd)
            for i in range(T // 2)]


def cog_vae_encode(params, video, scaling: float = 0.7,
                   streaming: Optional[bool] = None):
    """CogVAE encode. video (B, 3, T, H, W).

    Default (and streaming=True): chunk-stream 8 frames at a time with
    carried conv caches — numerically the reference's encode_small_video
    (GroupNorm statistics are per-chunk there, NOT a full-sequence
    approximation). Where T % 8 is not in {0, 1} the reference silently
    drops the tail; we emit one final partial chunk instead — identical
    to the reference on every frame it covers, consistent per-chunk norm
    semantics for the rest, and symmetric with the streaming decode.
    streaming=False runs the full sequence in one pass (identical when
    the schedule is a single chunk, i.e. T <= 8 even or T <= 9 odd)."""
    T = video.shape[2]
    if streaming is None:
        streaming = True
    chunks = _encode_chunks(T)
    if not streaming or len(chunks) == 1:
        return _encode_core(params, video) * scaling
    caches = None
    outs = []
    for tl, tr in chunks:
        io = _CacheIO(caches)
        outs.append(_encode_core(params, video[:, :, tl:tr], io))
        caches = io.out
    return jnp.concatenate(outs, axis=2) * scaling


def cog_vae_decode(params, latents, scaling: float = 0.7,
                   streaming: Optional[bool] = None):
    """CogVAE decode. latents (B, 16, T, H, W).

    Default streams 2 latent frames at a time with carried conv caches —
    bit-faithful to the reference's decode_small_video, whose GroupNorm /
    SpatialNorm statistics are per-chunk (a full-sequence decode diverges
    on real data: measured corr 0.87 on a time-ramped input).
    streaming=False runs the full sequence in one pass — identical only
    when the schedule is a single chunk (T <= 2 latents)."""
    z = latents / scaling
    T = z.shape[2]
    if streaming is None:
        streaming = T > 2
    if not streaming or T <= 2:
        return _decode_core(params, z)
    caches = None
    outs = []
    for tl, tr in _decode_chunks(T):
        io = _CacheIO(caches)
        outs.append(_decode_core(params, z[:, :, tl:tr], io))
        caches = io.out
    return jnp.concatenate(outs, axis=2)


def convert_cog_vae(sd, dtype=jnp.float32):
    """Nest the reference module state dict (conv weights kept torch-layout)."""
    root = {}
    for key, val in sd.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if hasattr(val, "detach"):
            val = val.detach().float().cpu().numpy()
        node[parts[-1]] = jnp.asarray(np.asarray(val), dtype)
    return root
