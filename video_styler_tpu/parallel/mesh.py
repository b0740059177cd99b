"""Device mesh construction.

One ICI/DCN mesh replaces the reference's NCCL process groups
(xfuser initialize_model_parallel at wan_video_new.py:313-324, torch
init_process_group in the enhancer). Axes:

  dp   — data parallel (batch / per-video)
  fsdp — parameter sharding (ZeRO-3 / FSDP equivalent)
  sp   — sequence parallel (Ulysses: heads <-> sequence resharding)

The reference's "USP degree = world size, ring = 1" maps to sp = n_devices.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def local_device_count() -> int:
    return len(jax.devices())


def make_mesh(dp: int = 1, fsdp: int = 1, sp: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = dp * fsdp * sp
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{fsdp}x{sp} needs {n} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(dp, fsdp, sp)
    return Mesh(dev, axis_names=("dp", "fsdp", "sp"))
