"""Qwen2.5-VL vision tower (windowed ViT + patch merger), TPU-native.

Completes the native Qwen2.5-VL encoder: round 3's `llm_decoder.py` covers
the text path; this module adds the vision side the reference uses for
Qwen-Image-Edit prompt conditioning
(/root/reference/diffsynth/pipelines/qwen_image.py:552-575 — pixel_values +
image_grid_thw through the VL model) and the Step1x VL embedder
(/root/reference/diffsynth/models/qwenvl.py:1-168). The reference serves the
torch tower via `transformers` (qwen_image_text_encoder.py:115-143 vendors
the vision config: depth 32, hidden 1280, 16 heads, SwiGLU 3420, patch 14,
temporal-patch 2, spatial-merge 2, window 112, full attention at blocks
7/15/23/31, out-hidden 3584).

TPU-first design notes:
  * The strided Conv3d patch embed is a single (N, C*tp*p*p) @ (.., hidden)
    matmul — stride == kernel makes the conv an exact linear on flattened
    patches, which is the MXU-friendly form.
  * Window attention runs as ONE dense (N, N) attention with an additive
    segment bias instead of torch's per-window loop: edit images are capped
    at ~0.25 Mpx (N <= ~1300 patch tokens), so a fused dense attention with
    a block-diagonal bias beats 100+ tiny un-tileable matmuls. Window /
    full-attention layers share one lax.scan over the stacked blocks with a
    per-layer flag selecting the bias.
  * All data-dependent planning (smart resize, window permutation, segment
    ids, rotary tables, mRoPE indices) happens host-side in numpy; the
    jitted graph sees static shapes only.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, rms_norm, gelu_exact, init_linear, init_rms_norm

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

IMAGE_TOKEN_ID = 151655
VIDEO_TOKEN_ID = 151656
VISION_START_TOKEN_ID = 151652


@dataclass(frozen=True)
class QwenVLVisionConfig:
    depth: int = 32
    hidden: int = 1280
    num_heads: int = 16
    intermediate: int = 3420
    out_hidden: int = 3584
    in_channels: int = 3
    patch: int = 14
    temporal_patch: int = 2
    merge: int = 2
    window: int = 112
    fullatt: Tuple[int, ...] = (7, 15, 23, 31)
    tokens_per_second: int = 2
    eps: float = 1e-6  # vision norms are fixed at 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch * self.patch ** 2

    @property
    def merge_unit(self) -> int:
        return self.merge ** 2


QWEN25_VL_7B_VISION = QwenVLVisionConfig()
QWEN_VL_VISION_TINY = QwenVLVisionConfig(
    depth=4, hidden=64, num_heads=4, intermediate=96, out_hidden=48,
    patch=4, temporal_patch=2, merge=2, window=16, fullatt=(1, 3))


# --------------------------------------------------------------- preprocess

def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 256 * 28 * 28,
                 max_pixels: int = 1280 * 28 * 28) -> Tuple[int, int]:
    """The HF Qwen2VL smart_resize contract: both dims divisible by
    `factor`, pixel count in [min, max], aspect preserved."""
    import math
    if max(height, width) / min(height, width) > 200:
        raise ValueError("aspect ratio must be < 200")
    h = round(height / factor) * factor
    w = round(width / factor) * factor
    if h * w > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h = max(factor, math.floor(height / beta / factor) * factor)
        w = max(factor, math.floor(width / beta / factor) * factor)
    elif h * w < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h = math.ceil(height * beta / factor) * factor
        w = math.ceil(width * beta / factor) * factor
    return h, w


def preprocess_image(image, cfg: QwenVLVisionConfig = QWEN25_VL_7B_VISION,
                     min_pixels: int = 256 * 28 * 28,
                     max_pixels: int = 1280 * 28 * 28):
    """PIL image -> (flatten_patches (N, C*tp*p*p) f32, grid_thw (1, h, w)).

    Mirrors Qwen2VLImageProcessor._preprocess: bicubic smart-resize,
    1/255 rescale, CLIP mean/std normalize, temporal duplication to
    temporal_patch frames, then the merge-order patch flattening."""
    from PIL import Image
    img = image.convert("RGB")
    h_bar, w_bar = smart_resize(img.height, img.width,
                                factor=cfg.patch * cfg.merge,
                                min_pixels=min_pixels, max_pixels=max_pixels)
    img = img.resize((w_bar, h_bar), Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - CLIP_MEAN) / CLIP_STD                      # (H, W, C)
    arr = arr.transpose(2, 0, 1)                            # (C, H, W)
    # duplicate the single frame to temporal_patch frames
    patches = np.repeat(arr[None], cfg.temporal_patch, axis=0)  # (tp, C, H, W)
    grid_t = 1
    grid_h, grid_w = h_bar // cfg.patch, w_bar // cfg.patch
    m, p = cfg.merge, cfg.patch
    patches = patches.reshape(grid_t, cfg.temporal_patch, cfg.in_channels,
                              grid_h // m, m, p, grid_w // m, m, p)
    patches = patches.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = patches.reshape(grid_t * grid_h * grid_w, cfg.patch_dim)
    return np.ascontiguousarray(flat, np.float32), (grid_t, grid_h, grid_w)


# --------------------------------------------------------------- planning

def _rot_pos_ids(grid_thw: Sequence[Tuple[int, int, int]], merge: int):
    """(h, w) rotary position ids per patch token, in the processor's
    merge-order token layout (transformers rot_pos_emb)."""
    out = []
    for t, h, w in grid_thw:
        hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hp = hp.reshape(h // merge, merge, w // merge, merge)
        hp = hp.transpose(0, 2, 1, 3).reshape(-1)
        wp = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wp = wp.reshape(h // merge, merge, w // merge, merge)
        wp = wp.transpose(0, 2, 1, 3).reshape(-1)
        ids = np.stack([hp, wp], axis=-1)                   # (h*w, 2)
        out.append(np.tile(ids, (t, 1)))
    return np.concatenate(out, axis=0)                      # (N, 2)


def _window_plan(grid_thw, cfg: QwenVLVisionConfig):
    """-> (window_index (N_m,), window_seg (N_m,), full_seg (N_m,)).

    window_index: permutation of merged-token groups (HF get_window_index).
    window_seg / full_seg: per merged-token segment id AFTER permutation —
    tokens attend only within equal segment ids (the dense-bias equivalent
    of HF's cu_seqlens splitting)."""
    wm = cfg.window // cfg.merge // cfg.patch               # merged win size
    index_chunks, seg_chunks, full_chunks = [], [], []
    base = 0
    win_base = 0
    for img_i, (t, h, w) in enumerate(grid_thw):
        lh, lw = h // cfg.merge, w // cfg.merge
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = wm - lh % wm if lh % wm else 0
        pad_w = wm - lw % wm if lw % wm else 0
        nh, nw = (lh + pad_h) // wm, (lw + pad_w) // wm
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        padded[:, :lh, :lw] = idx
        padded = padded.reshape(t, nh, wm, nw, wm).transpose(0, 1, 3, 2, 4)
        padded = padded.reshape(t * nh * nw, wm * wm)
        win_ids = np.broadcast_to(
            np.arange(padded.shape[0])[:, None] + win_base, padded.shape)
        keep = padded.reshape(-1) != -100
        index_chunks.append(padded.reshape(-1)[keep] + base)
        seg_chunks.append(win_ids.reshape(-1)[keep])
        full_chunks.append(np.full(keep.sum(), img_i, np.int64))
        base += t * lh * lw
        win_base += padded.shape[0]
    return (np.concatenate(index_chunks), np.concatenate(seg_chunks),
            np.concatenate(full_chunks))


def vision_plan(grid_thw, cfg: QwenVLVisionConfig):
    """Host-side plan for a patch batch: permutations, segment biases,
    rotary tables. Returns a dict of numpy arrays keyed for
    vision_forward."""
    grid_thw = [tuple(int(v) for v in g) for g in grid_thw]
    pos = _rot_pos_ids(grid_thw, cfg.merge)                 # (N, 2)
    n = pos.shape[0]
    window_index, window_seg, full_seg = _window_plan(grid_thw, cfg)

    half = cfg.head_dim // 2
    inv = 1.0 / (10000.0 ** (np.arange(0, half, 2, np.float64) / half))
    freqs = pos[..., None].astype(np.float64) * inv         # (N, 2, half/2)
    rot = freqs.reshape(n, -1)                              # (N, half)
    # permute rotary to window order (token-level: merged groups of m*m)
    mu = cfg.merge_unit
    rot = rot.reshape(n // mu, mu, -1)[window_index].reshape(n, -1)
    emb = np.concatenate([rot, rot], axis=-1)               # (N, head_dim)
    # token-level segment ids (merged-group ids repeated m*m times)
    return {
        "window_index": window_index.astype(np.int32),
        "reverse_index": np.argsort(window_index).astype(np.int32),
        "cos": np.cos(emb).astype(np.float32),
        "sin": np.sin(emb).astype(np.float32),
        "window_seg": np.repeat(window_seg, mu).astype(np.int32),
        "full_seg": np.repeat(full_seg, mu).astype(np.int32),
    }


# --------------------------------------------------------------- forward

def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _attention(q, k, v, bias, head_dim):
    """q/k/v: (N, H, D); bias: (N, N) additive f32."""
    logits = jnp.einsum("qnd,knd->nqk", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(head_dim)
    logits = logits + bias[None]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("nqk,knd->qnd", probs, v)


def _vision_block(p, x, cos, sin, bias, cfg: QwenVLVisionConfig):
    n = x.shape[0]
    h = rms_norm(p["norm1"], x, cfg.eps)
    qkv = linear(p["qkv"], h).reshape(n, 3, cfg.num_heads, cfg.head_dim)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]

    def rope(t):
        tf = t.astype(jnp.float32)
        return (tf * cos[:, None, :]
                + _rotate_half(tf) * sin[:, None, :]).astype(t.dtype)

    attn = _attention(rope(q), rope(k), v, bias, cfg.head_dim)
    x = x + linear(p["proj"], attn.reshape(n, cfg.hidden))
    h = rms_norm(p["norm2"], x, cfg.eps)
    mlp = linear(p["down"],
                 jax.nn.silu(linear(p["gate"], h)) * linear(p["up"], h))
    return x + mlp


def vision_forward(params, cfg: QwenVLVisionConfig, patches, plan):
    """patches: (N, patch_dim); plan: vision_plan output (numpy or jnp).

    -> (N / merge_unit, out_hidden) image embeddings in input token order."""
    n = patches.shape[0]
    mu = cfg.merge_unit
    x = linear(params["patch_embed"], patches.astype(params["patch_embed"]["w"].dtype))
    x = x.reshape(n // mu, mu, cfg.hidden)[jnp.asarray(plan["window_index"])]
    x = x.reshape(n, cfg.hidden)
    cos = jnp.asarray(plan["cos"])
    sin = jnp.asarray(plan["sin"])
    wseg = jnp.asarray(plan["window_seg"])
    fseg = jnp.asarray(plan["full_seg"])
    neg = jnp.asarray(np.float32(np.finfo(np.float32).min))
    bias_win = jnp.where(wseg[:, None] == wseg[None, :], 0.0, neg)
    bias_full = jnp.where(fseg[:, None] == fseg[None, :], 0.0, neg)
    is_full = jnp.asarray(
        np.array([i in cfg.fullatt for i in range(cfg.depth)], bool))

    def scan_fn(carry, layer):
        p, full_flag = layer
        bias = jnp.where(full_flag, bias_full, bias_win)
        return _vision_block(p, carry, cos, sin, bias, cfg), None

    x, _ = jax.lax.scan(scan_fn, x, (params["blocks"], is_full))
    # merger: ln_q -> concat merge_unit tokens -> MLP(gelu)
    h = rms_norm(params["ln_q"], x, cfg.eps).reshape(n // mu, mu * cfg.hidden)
    out = linear(params["mlp2"], gelu_exact(linear(params["mlp0"], h)))
    return out[jnp.asarray(plan["reverse_index"])]


def encode_images(params, cfg: QwenVLVisionConfig, images,
                  min_pixels: int = 256 * 28 * 28,
                  max_pixels: int = 1280 * 28 * 28):
    """PIL images -> (embeds (sum_i n_i, out_hidden), grid_thw list)."""
    pats, grids = [], []
    for im in images:
        p, g = preprocess_image(im, cfg, min_pixels, max_pixels)
        pats.append(p)
        grids.append(g)
    patches = np.concatenate(pats, axis=0)
    plan = vision_plan(grids, cfg)
    return vision_forward(params, cfg, jnp.asarray(patches), plan), grids


# --------------------------------------------------------------- mRoPE

def get_rope_index(input_ids: np.ndarray, image_grid_thw, merge: int = 2,
                   tokens_per_second: int = 2,
                   image_token_id: int = IMAGE_TOKEN_ID,
                   video_token_id: int = VIDEO_TOKEN_ID,
                   second_per_grid_ts=None) -> np.ndarray:
    """Qwen2.5-VL 3-stream position ids for one unpadded sequence.

    Mirrors Qwen2_5_VLModel.get_rope_index (text: all three streams advance
    together; vision spans: t/h/w grid indices offset past the preceding
    text maximum). input_ids: (L,) numpy. -> (3, L) int32."""
    toks = input_ids.tolist()
    grids = [tuple(int(v) for v in g) for g in (image_grid_thw or [])]
    pieces = []
    st, img_i = 0, 0
    while img_i < len(grids) and image_token_id in toks[st:]:
        ed = toks.index(image_token_id, st)
        t, h, w = grids[img_i]
        lh, lw = h // merge, w // merge
        st_idx = pieces[-1].max() + 1 if pieces else 0
        text_len = ed - st
        pieces.append(np.broadcast_to(np.arange(text_len), (3, text_len))
                      + st_idx)
        spg = 0.0 if second_per_grid_ts is None else float(
            second_per_grid_ts[img_i])
        t_idx = (np.arange(t)[:, None] * spg * tokens_per_second).astype(
            np.int64)
        t_idx = np.broadcast_to(t_idx, (t, lh * lw)).reshape(-1)
        h_idx = np.broadcast_to(np.arange(lh)[None, :, None],
                                (t, lh, lw)).reshape(-1)
        w_idx = np.broadcast_to(np.arange(lw)[None, None, :],
                                (t, lh, lw)).reshape(-1)
        pieces.append(np.stack([t_idx, h_idx, w_idx]) + text_len + st_idx)
        st = ed + t * lh * lw
        img_i += 1
    if st < len(toks):
        st_idx = pieces[-1].max() + 1 if pieces else 0
        ln = len(toks) - st
        pieces.append(np.broadcast_to(np.arange(ln), (3, ln)) + st_idx)
    return np.concatenate(pieces, axis=1).astype(np.int32)


# --------------------------------------------------------------- converters

def detect_vision_config(sd) -> QwenVLVisionConfig:
    """Architecture from `visual.`-prefixed state-dict shapes."""
    sd = {k[len("visual."):]: v for k, v in sd.items()
          if k.startswith("visual.")} or sd
    pw = sd["patch_embed.proj.weight"]                  # (hid, C, tp, p, p)
    hidden = pw.shape[0]
    depth = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    inter = sd["blocks.0.mlp.gate_proj.weight"].shape[0]
    out_hidden = sd["merger.mlp.2.weight"].shape[0]
    base = QWEN25_VL_7B_VISION
    return QwenVLVisionConfig(
        depth=depth, hidden=hidden, num_heads=max(1, hidden // 80),
        intermediate=inter, out_hidden=out_hidden, in_channels=pw.shape[1],
        patch=pw.shape[3], temporal_patch=pw.shape[2], merge=base.merge,
        window=base.window,
        fullatt=tuple(i for i in base.fullatt if i < depth))


def convert_qwen_vl_vision(sd, cfg: QwenVLVisionConfig, dtype=jnp.bfloat16):
    """HF `visual.*` state dict -> param pytree (qkv kept fused)."""
    sd = {k[len("visual."):]: v for k, v in sd.items()
          if k.startswith("visual.")} or dict(sd)

    def _j(v, dt=dtype):
        return jnp.asarray(np.asarray(v), dt)

    def lin(name, bias=True):
        p = {"w": _j(sd[f"{name}.weight"]).T}
        if bias and f"{name}.bias" in sd:
            p["b"] = _j(sd[f"{name}.bias"])
        return p

    def block(i):
        b = f"blocks.{i}"
        return {
            "norm1": {"scale": _j(sd[f"{b}.norm1.weight"])},
            "norm2": {"scale": _j(sd[f"{b}.norm2.weight"])},
            "qkv": lin(f"{b}.attn.qkv"),
            "proj": lin(f"{b}.attn.proj"),
            "gate": lin(f"{b}.mlp.gate_proj"),
            "up": lin(f"{b}.mlp.up_proj"),
            "down": lin(f"{b}.mlp.down_proj"),
        }

    from .wan_dit import stack_blocks
    return {
        "patch_embed": {"w": _j(sd["patch_embed.proj.weight"]).reshape(
            cfg.hidden, cfg.patch_dim).T},
        "blocks": stack_blocks([block(i) for i in range(cfg.depth)]),
        "ln_q": {"scale": _j(sd["merger.ln_q.weight"])},
        "mlp0": lin("merger.mlp.0"),
        "mlp2": lin("merger.mlp.2"),
    }


def init_qwen_vl_vision(key, cfg: QwenVLVisionConfig, dtype=jnp.float32):
    from .wan_dit import stack_blocks
    ks = jax.random.split(key, cfg.depth + 3)

    def block(k):
        kk = jax.random.split(k, 5)
        return {
            "norm1": init_rms_norm(cfg.hidden, dtype),
            "norm2": init_rms_norm(cfg.hidden, dtype),
            "qkv": init_linear(kk[0], cfg.hidden, 3 * cfg.hidden, dtype=dtype),
            "proj": init_linear(kk[1], cfg.hidden, cfg.hidden, dtype=dtype),
            "gate": init_linear(kk[2], cfg.hidden, cfg.intermediate,
                                dtype=dtype),
            "up": init_linear(kk[3], cfg.hidden, cfg.intermediate,
                              dtype=dtype),
            "down": init_linear(kk[4], cfg.intermediate, cfg.hidden,
                                dtype=dtype),
        }

    mu = cfg.merge_unit
    return {
        "patch_embed": init_linear(ks[0], cfg.patch_dim, cfg.hidden,
                                   bias=False, dtype=dtype),
        "blocks": stack_blocks([block(ks[3 + i]) for i in range(cfg.depth)]),
        "ln_q": init_rms_norm(cfg.hidden, dtype),
        "mlp0": init_linear(ks[1], mu * cfg.hidden, mu * cfg.hidden,
                            dtype=dtype),
        "mlp2": init_linear(ks[2], mu * cfg.hidden, cfg.out_hidden,
                            dtype=dtype),
    }
