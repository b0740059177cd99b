"""RIFE IFNet optical-flow frame interpolation, JAX port.

Port of /root/reference/diffsynth/extensions/RIFE/__init__.py:8-242: three
coarse-to-fine IFBlocks predict bidirectional flow + blend mask; frames are
backward-warped (bilinear grid sample, border padding, align_corners=True)
and blended. Params convert from the torch checkpoint ('module.'-stripped)
into a nested pytree keyed by module names. fp32 throughout (IFNet does not
support fp16 — same constraint as the reference).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- primitives

def conv2d(p, x, stride=1, padding=1):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (stride, stride),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)[None, :, None, None]
    return y.astype(x.dtype)


def conv_transpose2d(p, x, stride=2, padding=1):
    """torch ConvTranspose2d == fractionally-strided conv: lhs_dilation=s,
    per-side padding k-1-p, kernel transposed to OIHW and spatially flipped."""
    w = p["weight"]                           # torch layout (in, out, kh, kw)
    k = w.shape[2]
    w_rot = jnp.flip(w.transpose(1, 0, 2, 3), axis=(2, 3)).astype(x.dtype)
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x, w_rot, window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)[None, :, None, None]
    return y.astype(x.dtype)


def prelu(p, x):
    a = p["weight"].astype(x.dtype)[None, :, None, None]
    return jnp.where(x >= 0, x, a * x)


def resize_bilinear(x, out_hw):
    """torch F.interpolate(mode='bilinear', align_corners=False,
    antialias=False). jax.image.resize antialiases on downscale, so sample
    with half-pixel centers and edge clamp explicitly."""
    h_in, w_in = x.shape[2:]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x

    def axis_weights(n_in, n_out):
        src = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (n_in / n_out) - 0.5
        i0 = jnp.clip(jnp.floor(src), 0, n_in - 1)
        frac = jnp.clip(src - i0, 0.0, 1.0)
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        return i0.astype(jnp.int32), i1.astype(jnp.int32), frac

    y0, y1, fy = axis_weights(h_in, h_out)
    x0, x1, fx = axis_weights(w_in, w_out)
    top = x[:, :, y0, :]
    bot = x[:, :, y1, :]
    rows = top + (bot - top) * fy[None, None, :, None]
    left = rows[:, :, :, x0]
    right = rows[:, :, :, x1]
    return left + (right - left) * fx[None, None, None, :]


def warp(img, flow):
    """Backward warp with bilinear sampling, border padding,
    align_corners=True (RIFE/__init__.py:8-24 semantics).

    img: (B, C, H, W); flow: (B, 2, H, W) pixel offsets (x, y).
    """
    b, c, h, w = img.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    gx = jnp.clip(xs + flow[:, 0], 0, w - 1)
    gy = jnp.clip(ys + flow[:, 1], 0, h - 1)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = gx - x0
    wy = gy - y0

    def gather(yy, xx):
        bi = jnp.arange(b)[:, None, None]
        return img[bi, :, yy.astype(jnp.int32), xx.astype(jnp.int32)]  # (B,H,W,C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    wx = wx[..., None]
    wy = wy[..., None]
    out = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)
    return out.transpose(0, 3, 1, 2)


# ---------------------------------------------------------------- IFNet

def _conv_prelu(p, x, stride=1):
    return prelu(p["1"], conv2d(p["0"], x, stride=stride, padding=1))


def _ifblock(p, x, flow, scale):
    h, w = x.shape[2:]
    sh, sw = int(h / scale), int(w / scale)
    x = resize_bilinear(x, (sh, sw))
    flow = resize_bilinear(flow, (sh, sw)) * (1.0 / scale)
    feat = _conv_prelu(p["conv0"]["0"], jnp.concatenate([x, flow], axis=1), stride=2)
    feat = _conv_prelu(p["conv0"]["1"], feat, stride=2)
    for blk in ("convblock0", "convblock1", "convblock2", "convblock3"):
        f = _conv_prelu(p[blk]["0"], feat)
        f = _conv_prelu(p[blk]["1"], f)
        feat = f + feat
    fl = conv_transpose2d(p["conv1"]["0"], feat)
    fl = prelu(p["conv1"]["1"], fl)
    fl = conv_transpose2d(p["conv1"]["2"], fl)
    mk = conv_transpose2d(p["conv2"]["0"], feat)
    mk = prelu(p["conv2"]["1"], mk)
    mk = conv_transpose2d(p["conv2"]["2"], mk)
    fl = resize_bilinear(fl, (h, w)) * scale
    mk = resize_bilinear(mk, (h, w))
    return fl, mk


def ifnet_forward(params, x, scale_list=(4, 2, 1)):
    """x: (B, 6, H, W) = [img0 | img1] in [0,1]. Returns (flow_list, mask,
    merged) like IFNet.forward (RIFE/__init__.py:71-100)."""
    channel = x.shape[1] // 2
    img0, img1 = x[:, :channel], x[:, channel:]
    warped_img0, warped_img1 = img0, img1
    flow = jnp.zeros((x.shape[0], 4) + x.shape[2:], x.dtype)
    mask = jnp.zeros((x.shape[0], 1) + x.shape[2:], x.dtype)
    flow_list, mask_list, merged = [], [], []
    for i, name in enumerate(("block0", "block1", "block2")):
        p = params[name]
        f0, m0 = _ifblock(p, jnp.concatenate(
            [warped_img0[:, :3], warped_img1[:, :3], mask], axis=1),
            flow, scale_list[i])
        f1, m1 = _ifblock(p, jnp.concatenate(
            [warped_img1[:, :3], warped_img0[:, :3], -mask], axis=1),
            jnp.concatenate([flow[:, 2:4], flow[:, :2]], axis=1), scale_list[i])
        flow = flow + (f0 + jnp.concatenate([f1[:, 2:4], f1[:, :2]], axis=1)) / 2
        mask = mask + (m0 + (-m1)) / 2
        mask_list.append(mask)
        flow_list.append(flow)
        warped_img0 = warp(img0, flow[:, :2])
        warped_img1 = warp(img1, flow[:, 2:4])
        merged.append((warped_img0, warped_img1))
    out = []
    for i in range(3):
        m = jax.nn.sigmoid(mask_list[i])
        out.append(merged[i][0] * m + merged[i][1] * (1 - m))
    return flow_list, jax.nn.sigmoid(mask_list[2]), out


def convert_ifnet(sd: Dict, dtype=jnp.float32):
    """torch IFNet state dict -> nested pytree ('module.' prefix stripped)."""
    root: Dict = {}
    for key, val in sd.items():
        if key.startswith("module."):
            key = key[len("module."):]
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if hasattr(val, "detach"):
            val = val.detach().float().cpu().numpy()
        node[parts[-1]] = jnp.asarray(np.asarray(val), dtype)
    return root


# ---------------------------------------------------------------- API

class RIFEInterpolater:
    """2x frame interpolation (RIFE/__init__.py:119-196)."""

    def __init__(self, params):
        self.params = params
        self._fwd = jax.jit(lambda p, x, s: ifnet_forward(p, x, s),
                            static_argnums=(2,))

    def _process(self, images) -> np.ndarray:
        arrs = []
        for im in images:
            w, h = im.size
            if w % 32 or h % 32:
                im = im.resize(((w + 31) // 32 * 32, (h + 31) // 32 * 32))
            a = np.asarray(im, np.float32)[:, :, ::-1] / 255.0   # BGR like ref
            arrs.append(a.transpose(2, 0, 1))
        return np.stack(arrs)

    def _decode(self, arr, size):
        from PIL import Image
        arr = np.clip(np.asarray(arr), 0, 1)
        out = []
        for a in arr:
            img = Image.fromarray(
                (a[::-1].transpose(1, 2, 0) * 255).clip(0, 255).astype(np.uint8))
            if img.size != size:
                img = img.resize(size)
            out.append(img)
        return out

    def interpolate(self, images: List, scale: float = 1.0, batch_size: int = 4,
                    num_iter: int = 1):
        proc = self._process(images)
        scales = (4 / scale, 2 / scale, 1 / scale)
        for _ in range(num_iter):
            pairs = np.concatenate([proc[:-1], proc[1:]], axis=1)
            outs = []
            for i in range(0, pairs.shape[0], batch_size):
                _, _, merged = self._fwd(self.params,
                                         jnp.asarray(pairs[i:i + batch_size]),
                                         scales)
                outs.append(np.asarray(merged[2]))
            mid = np.concatenate(outs).clip(0, 1)
            woven = []
            for a, b in zip(proc, mid):
                woven += [a, b]
            woven.append(proc[-1])
            proc = np.stack(woven)
        return self._decode(proc, images[0].size)


class RIFESmoother(RIFEInterpolater):
    """Temporal smoothing via interpolate-then-blend (RIFE/__init__.py:199-242)."""

    def __call__(self, rendered_frames, scale: float = 1.0, batch_size: int = 4,
                 num_iter: int = 1, **kwargs):
        proc = self._process(rendered_frames)
        scales = (4 / scale, 2 / scale, 1 / scale)

        def run(pairs):
            outs = []
            for i in range(0, pairs.shape[0], batch_size):
                _, _, merged = self._fwd(self.params,
                                         jnp.asarray(pairs[i:i + batch_size]),
                                         scales)
                outs.append(np.asarray(merged[2]))
            return np.concatenate(outs)

        for _ in range(num_iter):
            mid = run(np.concatenate([proc[:-2], proc[2:]], axis=1))
            blended = run(np.concatenate([proc[1:-1], mid], axis=1))
            proc[1:-1] = blended
        return self._decode(proc, rendered_frames[0].size)
