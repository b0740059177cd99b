"""Wan conditioning controllers: motion (speed) and camera (Plücker).

Ports of /root/reference/diffsynth/models/wan_video_motion_controller.py:1-44
and wan_video_camera_controller.py:1-206.

- Motion controller: motion_bucket_id -> additive 6-way t_mod embedding.
- Camera controller: direction -> camera trajectory -> Plücker ray embedding
  (host numpy), then a SimpleAdapter (pixel-unshuffle + conv + residual
  blocks) producing per-patch features added after the DiT patch embedding.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.basic import linear, silu, sinusoidal_embedding_1d, init_linear


# ---------------------------------------------------------------- motion

def init_motion_controller(key, freq_dim: int = 256, dim: int = 1536,
                           dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    p = {
        "fc1": init_linear(ks[0], freq_dim, dim, dtype=dtype),
        "fc2": init_linear(ks[1], dim, dim, dtype=dtype),
        "fc3": init_linear(ks[2], dim, dim * 6, dtype=dtype),
    }
    # reference zero-inits the last layer (init(), :24-27)
    p["fc3"]["w"] = jnp.zeros_like(p["fc3"]["w"])
    p["fc3"]["b"] = jnp.zeros_like(p["fc3"]["b"])
    return p


def motion_controller_forward(params, motion_bucket_id, freq_dim: int = 256):
    """motion_bucket_id (B,) -> (B, dim*6) additive t_mod term."""
    emb = sinusoidal_embedding_1d(freq_dim, motion_bucket_id * 10)
    emb = emb.astype(params["fc1"]["w"].dtype)
    x = silu(linear(params["fc1"], emb))
    x = silu(linear(params["fc2"], x))
    return linear(params["fc3"], x)


def convert_motion_controller(sd, dtype=jnp.bfloat16):
    from ..utils.convert import _lin
    return {
        "fc1": _lin(sd, "linear.0", dtype),
        "fc2": _lin(sd, "linear.2", dtype),
        "fc3": _lin(sd, "linear.4", dtype),
    }


# ---------------------------------------------------------------- camera

def generate_camera_coordinates(direction: str, length: int,
                                speed: float = 1 / 54,
                                origin: Sequence[float] = (
                                    0, 0.532139961, 0.946026558, 0.5, 0.5, 0,
                                    0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0)):
    """wan_video_camera_controller.py:186-206."""
    coordinates = [list(origin)]
    while len(coordinates) < length:
        coor = coordinates[-1].copy()
        if "Left" in direction:
            coor[9] += speed
        if "Right" in direction:
            coor[9] -= speed
        if "Up" in direction:
            coor[13] += speed
        if "Down" in direction:
            coor[13] -= speed
        if "In" in direction:
            coor[18] -= speed
        if "Out" in direction:
            coor[18] += speed
        coordinates.append(coor)
    return coordinates


def _relative_poses(entries) -> np.ndarray:
    w2cs, c2ws = [], []
    for e in entries:
        m = np.eye(4)
        m[:3, :] = np.asarray(e[7:]).reshape(3, 4)
        w2cs.append(m)
        c2ws.append(np.linalg.inv(m))
    target = np.eye(4)
    abs2rel = target @ w2cs[0]
    poses = [target] + [abs2rel @ c for c in c2ws[1:]]
    return np.asarray(poses, np.float32)


def process_pose_file(cam_entries, width: int = 672, height: int = 384,
                      original_pose_width: int = 1280,
                      original_pose_height: int = 720) -> np.ndarray:
    """Plücker ray embedding (V, H, W, 6) — ray_condition port (:115-148)."""
    fx = np.asarray([e[1] for e in cam_entries], np.float64)
    fy = np.asarray([e[2] for e in cam_entries], np.float64)
    cx = np.asarray([e[3] for e in cam_entries], np.float64)
    cy = np.asarray([e[4] for e in cam_entries], np.float64)
    sample_ratio = width / height
    pose_ratio = original_pose_width / original_pose_height
    if pose_ratio > sample_ratio:
        fx = (height * pose_ratio) * fx / width
    else:
        fy = (width / pose_ratio) * fy / height
    K = np.stack([fx * width, fy * height, cx * width, cy * height],
                 axis=-1).astype(np.float32)   # (V, 4)
    c2ws = _relative_poses(cam_entries)        # (V, 4, 4)

    V = K.shape[0]
    j, i = np.meshgrid(np.arange(height, dtype=np.float64),
                       np.arange(width, dtype=np.float64), indexing="ij")
    i = i.reshape(1, height * width) + 0.5
    j = j.reshape(1, height * width) + 0.5
    fxv, fyv, cxv, cyv = (K[:, k:k + 1].astype(np.float64) for k in range(4))
    zs = np.ones_like(i) * np.ones((V, 1))
    xs = (i - cxv) / fxv * zs
    ys = (j - cyv) / fyv * zs
    directions = np.stack([xs, ys, zs], axis=-1)            # (V, HW, 3)
    directions = directions / np.linalg.norm(directions, axis=-1, keepdims=True)
    rays_d = directions @ np.swapaxes(c2ws[:, :3, :3], -1, -2).astype(np.float64)
    rays_o = np.broadcast_to(c2ws[:, None, :3, 3], rays_d.shape)
    rays_dxo = np.cross(rays_o, rays_d)
    plucker = np.concatenate([rays_dxo, rays_d], axis=-1)   # (V, HW, 6)
    return plucker.reshape(V, height, width, 6).astype(np.float32)


def init_simple_adapter(key, in_dim: int = 24, out_dim: int = 1536,
                        kernel_size=(2, 2), stride=(2, 2),
                        num_residual_blocks: int = 1, dtype=jnp.float32):
    ks = jax.random.split(key, 1 + 2 * num_residual_blocks)
    import math
    kh, kw = kernel_size
    fan_in = in_dim * 64 * kh * kw
    conv = {"weight": (jax.random.normal(ks[0], (out_dim, in_dim * 64, kh, kw))
                       / math.sqrt(fan_in)).astype(dtype),
            "bias": jnp.zeros((out_dim,), dtype)}
    blocks = {}
    for i in range(num_residual_blocks):
        blocks[str(i)] = {
            "conv1": {"weight": (jax.random.normal(ks[1 + 2 * i],
                                                   (out_dim, out_dim, 3, 3))
                                 / math.sqrt(out_dim * 9)).astype(dtype),
                      "bias": jnp.zeros((out_dim,), dtype)},
            "conv2": {"weight": (jax.random.normal(ks[2 + 2 * i],
                                                   (out_dim, out_dim, 3, 3))
                                 / math.sqrt(out_dim * 9)).astype(dtype),
                      "bias": jnp.zeros((out_dim,), dtype)},
        }
    return {"conv": conv, "residual_blocks": blocks}


def _conv2d(p, x, stride=(1, 1), padding=(0, 0)):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), stride,
        ((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)[None, :, None, None]).astype(x.dtype)


def simple_adapter_forward(params, x, kernel_size=(2, 2), stride=(2, 2)):
    """x: (B, C, F, H, W) Plücker video -> (B, out, F, H', W') patch features
    (SimpleAdapter.forward, :24-45)."""
    b, c, f, h, w = x.shape
    x = x.transpose(0, 2, 1, 3, 4).reshape(b * f, c, h, w)
    # PixelUnshuffle(8): (C, H, W) -> (C*64, H/8, W/8)
    x = x.reshape(b * f, c, h // 8, 8, w // 8, 8)
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b * f, c * 64, h // 8, w // 8)
    x = _conv2d(params["conv"], x, stride=stride)
    for i in sorted(params["residual_blocks"], key=int):
        p = params["residual_blocks"][i]
        res = x
        y = jnp.maximum(_conv2d(p["conv1"], x, padding=(1, 1)), 0)
        x = _conv2d(p["conv2"], y, padding=(1, 1)) + res
    _, oc, oh, ow = x.shape
    return x.reshape(b, f, oc, oh, ow).transpose(0, 2, 1, 3, 4)


def convert_simple_adapter(sd, dtype=jnp.bfloat16):
    import numpy as _np
    out = {"conv": {}, "residual_blocks": {}}
    for k, v in sd.items():
        v = jnp.asarray(_np.asarray(v.detach().float().numpy()
                                    if hasattr(v, "detach") else v), dtype)
        if k.startswith("conv."):
            out["conv"][k.split(".")[-1]] = v
        elif k.startswith("residual_blocks."):
            _, idx, name, leaf = k.split(".")
            out["residual_blocks"].setdefault(idx, {}).setdefault(name, {})[leaf] = v
    return out


def process_camera_coordinates(direction: str, length: int, height: int,
                               width: int, speed: float = 1 / 54,
                               origin=None) -> np.ndarray:
    """direction string -> Plücker embedding (length, H, W, 6)
    (SimpleAdapter.process_camera_coordinates, wan_video_camera_controller.py:46-58)."""
    if origin is None:
        origin = (0, 0.532139961, 0.946026558, 0.5, 0.5, 0,
                  0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0)
    coordinates = generate_camera_coordinates(direction, length, speed, origin)
    return process_pose_file(coordinates, width, height)


def pack_camera_latents(plucker: np.ndarray, num_frames: int) -> np.ndarray:
    """Plücker (V, H, W, 6) -> (1, 24, (F+3)//4, H, W) temporally-packed
    control_camera_latents_input (WanVideoUnit_FunCameraControl,
    wan_video_new.py:812-823): first frame repeated 4x, then groups of 4
    frames stacked onto channels."""
    video = plucker[:num_frames].transpose(3, 0, 1, 2)[None]     # (1, 6, F, H, W)
    video = np.concatenate([np.repeat(video[:, :, 0:1], 4, axis=2),
                            video[:, :, 1:]], axis=2)            # (1, 6, F+3, H, W)
    b, c, f, h, w = video.shape
    lat = video.transpose(0, 2, 1, 3, 4)                         # (1, F+3, 6, H, W)
    lat = lat.reshape(b, f // 4, 4, c, h, w).transpose(0, 1, 3, 2, 4, 5)
    lat = lat.reshape(b, f // 4, c * 4, h, w).transpose(0, 2, 1, 3, 4)
    return np.ascontiguousarray(lat)                             # (1, 24, F//4, H, W)
