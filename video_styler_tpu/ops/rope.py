"""3D rotary position embedding for the Wan video DiT.

The reference (wan_video_dit.py:75-97) precomputes complex rotation tables in
float64 and applies them via complex multiplication on adjacent (even, odd)
element pairs of each head. We precompute cos/sin tables with numpy float64
for table accuracy and apply the rotation with real arithmetic in float32.

Head dim d is split into three frequency bands: f (temporal) gets
d - 2*(d//3), h and w get d//3 each (e.g. d=128 -> 44/42/42).
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp


def _freqs_1d(dim: int, end: int = 1024, theta: float = 10000.0) -> np.ndarray:
    """Angles (end, dim//2) in float64, matching precompute_freqs_cis."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float64) / dim))
    return np.outer(np.arange(end, dtype=np.float64), freqs)


@lru_cache(maxsize=8)
def precompute_freqs_3d(head_dim: int, end: int = 1024, theta: float = 10000.0):
    """Returns ((cos_f, sin_f), (cos_h, sin_h), (cos_w, sin_w)) as float32
    *numpy* arrays of shapes (end, band_dim//2).

    Kept as numpy on purpose: the cache must never hold jax values — a table
    first materialized inside a jit trace would leak tracers into later
    traces. Conversion to device constants happens per-trace at the call site.
    """
    f_dim = head_dim - 2 * (head_dim // 3)
    hw_dim = head_dim // 3
    if f_dim % 2 or hw_dim % 2:
        raise ValueError(
            f"head_dim={head_dim} splits into odd RoPE bands ({f_dim}/{hw_dim}/"
            f"{hw_dim}); pick head_dim with even f/h/w bands (e.g. 48, 96, 128)")
    out = []
    for d in (f_dim, hw_dim, hw_dim):
        ang = _freqs_1d(d, end, theta)
        out.append((np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)))
    return tuple(out)


def assemble_freqs_grid(
    head_dim: int,
    f: int,
    h: int,
    w: int,
    rope_indices: Optional[np.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the (S, head_dim//2) cos/sin tables for an (f, h, w) token grid,
    in f-major order — matching the freqs assembly at wan_video_dit.py:377-391.

    rope_indices: optional (f,) temporal indices replacing range(f) — used by
    the keyframe editor so edited keyframes share the temporal rotation of the
    frames they correspond to (wan_video_editor.py:77-105).
    """
    (cf, sf), (ch, sh), (cw, sw) = [
        (jnp.asarray(c), jnp.asarray(s)) for c, s in precompute_freqs_3d(head_dim)
    ]
    if rope_indices is None:
        cf_, sf_ = cf[:f], sf[:f]
    else:
        idx = jnp.asarray(rope_indices)
        f = idx.shape[0]
        cf_, sf_ = cf[idx], sf[idx]

    def grid(a_f, a_h, a_w):
        out = jnp.concatenate([
            jnp.broadcast_to(a_f[:, None, None, :], (f, h, w, a_f.shape[-1])),
            jnp.broadcast_to(a_h[None, :, None, :], (f, h, w, a_h.shape[-1])),
            jnp.broadcast_to(a_w[None, None, :, :], (f, h, w, a_w.shape[-1])),
        ], axis=-1)
        return out.reshape(f * h * w, -1)

    return grid(cf_, ch[:h], cw[:w]), grid(sf_, sh[:h], sw[:w])


def rope_apply(x, cos, sin):
    """Rotate adjacent (even, odd) pairs of the head dim.

    x: (B, S, N, D); cos/sin: (S, D//2). Computed in float32, returned in
    x.dtype — the complex-multiply semantics of rope_apply
    (wan_video_dit.py:92-97).

    Formulation note (v5e, 29,640 tok x 40 heads, q+k jitted together):
    this (…, D/2, 2)-reshape complex form measures 9.8 ms; a lane-roll +
    select variant (rot[2i] = -x[2i+1] via jnp.roll, no stride-2 slicing)
    measures 14.3 ms — XLA lowers roll as slice+concat relayouts, so the
    reshape form is the faster one and stays.
    """
    b, s, n, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, n, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    sn = sin[None, :, None, :]
    y0 = x0 * c - x1 * sn
    y1 = x0 * sn + x1 * c
    y = jnp.stack([y0, y1], axis=-1).reshape(b, s, n, d)
    return y.astype(x.dtype)
