"""FastBlend PatchMatch kernels: native C++ (ctypes) and XLA backends.

Same semantics as the reference CUDA kernels
(/root/reference/diffsynth/extensions/FastBlend/cupy_kernels.py:3-119):
  remap          — patch-vote average of source_style through the NNF
  patch_error    — SSD between target patches and NNF-matched source patches
  pairwise_patch_error — SSD between two NNF-remapped sources

Backends:
  cpp — native/libfastblend.so via ctypes (auto-compiled with g++ if absent)
  jax — vectorized XLA gathers (runs on TPU; shift-based patch accumulation)

All arrays are padded NHWC float32 / nnf int32 (B, H, W, 2).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "..", "..", "native")


def _load_library() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_NATIVE_DIR, "libfastblend.so")
    src = os.path.join(_NATIVE_DIR, "fastblend_kernels.cpp")
    if not os.path.exists(so) and os.path.exists(src):
        try:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                           check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    i, f, p = ctypes.c_int, np.ctypeslib.ndpointer(np.float32), \
        np.ctypeslib.ndpointer(np.int32)
    lib.remap.argtypes = [i, i, i, i, i, i, f, p, f]
    lib.patch_error.argtypes = [i, i, i, i, i, i, f, p, f, f]
    lib.pairwise_patch_error.argtypes = [i, i, i, i, i, i, f, p, f, p, f]
    _LIB = lib
    return lib


class CppKernels:
    """Native backend. Raises ImportError if the library can't be built."""

    def __init__(self):
        self.lib = _load_library()
        if self.lib is None:
            raise ImportError("libfastblend.so unavailable")

    def remap(self, height, width, channel, patch_size, pad_size,
              source_style, nnf):
        b = source_style.shape[0]
        out = np.zeros_like(source_style)
        src = np.ascontiguousarray(source_style, np.float32)
        nnf = np.ascontiguousarray(nnf, np.int32)
        self.lib.remap(b, height, width, channel, patch_size, pad_size,
                       src, nnf, out)
        return out

    def patch_error(self, height, width, channel, patch_size, pad_size,
                    source, nnf, target):
        b = source.shape[0]
        err = np.zeros((b, height, width), np.float32)
        self.lib.patch_error(b, height, width, channel, patch_size, pad_size,
                             np.ascontiguousarray(source, np.float32),
                             np.ascontiguousarray(nnf, np.int32),
                             np.ascontiguousarray(target, np.float32), err)
        return err

    def pairwise_patch_error(self, height, width, channel, patch_size,
                             pad_size, source_a, nnf_a, source_b, nnf_b):
        b = source_a.shape[0]
        err = np.zeros((b, height, width), np.float32)
        self.lib.pairwise_patch_error(
            b, height, width, channel, patch_size, pad_size,
            np.ascontiguousarray(source_a, np.float32),
            np.ascontiguousarray(nnf_a, np.int32),
            np.ascontiguousarray(source_b, np.float32),
            np.ascontiguousarray(nnf_b, np.int32), err)
        return err


class JaxKernels:
    """XLA backend: patch loops unrolled into shifted gathers (TPU-friendly)."""

    def _gather(self, img_pad, xs, ys, pad):
        """img_pad (B, Hp, Wp, C); xs/ys (B, H, W) unpadded coords."""
        import jax.numpy as jnp
        b = img_pad.shape[0]
        bi = jnp.arange(b)[:, None, None]
        return img_pad[bi, xs + pad, ys + pad]

    def remap(self, height, width, channel, patch_size, pad_size,
              source_style, nnf):
        import jax.numpy as jnp
        r = (patch_size - 1) // 2
        src = jnp.asarray(source_style)
        nnf = jnp.asarray(nnf)
        b = src.shape[0]
        X = jnp.arange(height)[None, :, None]
        Y = jnp.arange(width)[None, None, :]
        acc = jnp.zeros((b, height, width, channel), jnp.float32)
        cnt = jnp.zeros((b, height, width, 1), jnp.float32)
        nx = jnp.full((b, height + 2 * r, width + 2 * r), -1, jnp.int32)
        ny = jnp.full_like(nx, -1)
        nx = nx.at[:, r:r + height, r:r + width].set(nnf[..., 0])
        ny = ny.at[:, r:r + height, r:r + width].set(nnf[..., 1])
        for px in range(-r, r + 1):
            for py in range(-r, r + 1):
                # neighbor (x+px, y+py)'s nnf, shifted back by (px, py)
                x_nb = nx[:, r + px:r + px + height, r + py:r + py + width] - px
                y_nb = ny[:, r + px:r + px + height, r + py:r + py + width] - py
                valid = ((x_nb >= 0) & (y_nb >= 0) & (x_nb < height)
                         & (y_nb < width)
                         & (X + px >= 0) & (X + px < height)
                         & (Y + py >= 0) & (Y + py < width))
                vals = self._gather(src, jnp.clip(x_nb, 0, height - 1),
                                    jnp.clip(y_nb, 0, width - 1), pad_size)
                acc = acc + jnp.where(valid[..., None], vals, 0.0)
                cnt = cnt + valid[..., None].astype(jnp.float32)
        out_core = acc / jnp.maximum(cnt, 1.0)
        out = jnp.zeros((b, height + 2 * pad_size, width + 2 * pad_size,
                         channel), jnp.float32)
        out = out.at[:, pad_size:pad_size + height,
                     pad_size:pad_size + width].set(out_core)
        return np.asarray(out)

    def patch_error(self, height, width, channel, patch_size, pad_size,
                    source, nnf, target):
        import jax.numpy as jnp
        r = (patch_size - 1) // 2
        src = jnp.asarray(source)
        tgt = jnp.asarray(target)
        nnf = jnp.asarray(nnf)
        xs, ys = nnf[..., 0], nnf[..., 1]
        err = jnp.zeros((src.shape[0], height, width), jnp.float32)
        for px in range(-r, r + 1):
            for py in range(-r, r + 1):
                t = tgt[:, pad_size + px:pad_size + px + height,
                        pad_size + py:pad_size + py + width]
                s = self._gather(src, xs + px, ys + py, pad_size)
                err = err + jnp.sum(jnp.square(t - s), axis=-1)
        return np.asarray(err)

    def pairwise_patch_error(self, height, width, channel, patch_size,
                             pad_size, source_a, nnf_a, source_b, nnf_b):
        import jax.numpy as jnp
        r = (patch_size - 1) // 2
        sa, sb = jnp.asarray(source_a), jnp.asarray(source_b)
        na, nb = jnp.asarray(nnf_a), jnp.asarray(nnf_b)
        err = jnp.zeros((sa.shape[0], height, width), jnp.float32)
        for px in range(-r, r + 1):
            for py in range(-r, r + 1):
                a = self._gather(sa, na[..., 0] + px, na[..., 1] + py, pad_size)
                b_ = self._gather(sb, nb[..., 0] + px, nb[..., 1] + py, pad_size)
                err = err + jnp.sum(jnp.square(a - b_), axis=-1)
        return np.asarray(err)


def get_kernels(backend: str = "auto"):
    if backend in ("auto", "cpp"):
        try:
            return CppKernels()
        except ImportError:
            if backend == "cpp":
                raise
    return JaxKernels()
