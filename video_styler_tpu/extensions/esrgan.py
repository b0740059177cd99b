"""ESRGAN (RRDBNet) 4x super-resolution, JAX port.

Port of /root/reference/diffsynth/extensions/ESRGAN/__init__.py: residual-in-
residual dense blocks (RDB x3 per RRDB, 23 RRDBs), nearest 2x upsamples,
leaky-relu(0.2). Checkpoint converts by module-name nesting.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp


def conv2d(p, x, padding=1):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (1, 1),
        ((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)[None, :, None, None]
    return y.astype(x.dtype)


def lrelu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def _rdb(p, x):
    """ResidualDenseBlock: 5 convs with dense concat, 0.2-scaled residual."""
    x1 = lrelu(conv2d(p["conv1"], x))
    x2 = lrelu(conv2d(p["conv2"], jnp.concatenate([x, x1], 1)))
    x3 = lrelu(conv2d(p["conv3"], jnp.concatenate([x, x1, x2], 1)))
    x4 = lrelu(conv2d(p["conv4"], jnp.concatenate([x, x1, x2, x3], 1)))
    x5 = conv2d(p["conv5"], jnp.concatenate([x, x1, x2, x3, x4], 1))
    return x5 * 0.2 + x


def _rrdb(p, x):
    out = _rdb(p["rdb1"], x)
    out = _rdb(p["rdb2"], out)
    out = _rdb(p["rdb3"], out)
    return out * 0.2 + x


def _upsample_nearest(x):
    x = jnp.repeat(x, 2, axis=2)
    return jnp.repeat(x, 2, axis=3)


def rrdbnet_forward(params, x, num_blocks: int = 23):
    """x: (B, 3, H, W) in [0, 1] -> (B, 3, 4H, 4W)."""
    feat = conv2d(params["conv_first"], x)
    body = feat
    for i in range(num_blocks):
        body = _rrdb(params["body"][str(i)], body)
    body = conv2d(params["conv_body"], body)
    feat = feat + body
    feat = lrelu(conv2d(params["conv_up1"], _upsample_nearest(feat)))
    feat = lrelu(conv2d(params["conv_up2"], _upsample_nearest(feat)))
    out = conv2d(params["conv_last"], lrelu(conv2d(params["conv_hr"], feat)))
    return out


def convert_rrdbnet(sd: Dict, dtype=jnp.float32):
    root: Dict = {}
    for key, val in sd.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if hasattr(val, "detach"):
            val = val.detach().float().cpu().numpy()
        node[parts[-1]] = jnp.asarray(np.asarray(val), dtype)
    return root


class ESRGANUpscaler:
    def __init__(self, params, num_blocks: int = 23):
        self.params = params
        self.num_blocks = num_blocks
        self._fwd = jax.jit(lambda p, x: rrdbnet_forward(p, x, num_blocks))

    def upscale(self, images: List, batch_size: int = 4):
        from PIL import Image
        arrs = np.stack([np.asarray(im, np.float32).transpose(2, 0, 1) / 255.0
                         for im in images])
        outs = []
        for i in range(0, arrs.shape[0], batch_size):
            out = self._fwd(self.params, jnp.asarray(arrs[i:i + batch_size]))
            outs.append(np.asarray(out))
        out = np.concatenate(outs).clip(0, 1)
        return [Image.fromarray((a.transpose(1, 2, 0) * 255).astype(np.uint8))
                for a in out]

    def __call__(self, rendered_frames, **kwargs):
        return self.upscale(rendered_frames)
