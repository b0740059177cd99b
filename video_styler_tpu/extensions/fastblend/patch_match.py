"""PatchMatch NNF estimation (FastBlend core), backend-pluggable.

Port of /root/reference/diffsynth/extensions/FastBlend/patch_match.py:8-299
with the CuPy device arrays replaced by numpy + a kernel backend (native C++
via ctypes, or XLA). Orchestration (propagation, random search, tracking,
pyramid coarse-to-fine) is identical.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .kernels import get_kernels


class PatchMatcher:
    def __init__(self, height, width, channel, minimum_patch_size,
                 num_iter=5, guide_weight=10.0, random_search_steps=3,
                 random_search_range=4, use_mean_target_style=False,
                 use_pairwise_patch_error=False, tracking_window_size=0,
                 backend="auto", rng: Optional[np.random.Generator] = None,
                 **kwargs):
        self.height = height
        self.width = width
        self.channel = channel
        self.minimum_patch_size = minimum_patch_size
        self.num_iter = num_iter
        self.guide_weight = guide_weight
        self.random_search_steps = random_search_steps
        self.random_search_range = random_search_range
        self.use_mean_target_style = use_mean_target_style
        self.use_pairwise_patch_error = use_pairwise_patch_error
        self.tracking_window_size = tracking_window_size
        self.patch_size_list = [minimum_patch_size + i * 2
                                for i in range(num_iter)][::-1]
        self.pad_size = self.patch_size_list[0] // 2
        self.patch_size = self.patch_size_list[0]
        self.kernels = get_kernels(backend)
        self.rng = rng or np.random.default_rng(0)

    def pad_image(self, image):
        p = self.pad_size
        return np.pad(image, ((0, 0), (p, p), (p, p), (0, 0)))

    def unpad_image(self, image):
        p = self.pad_size
        return image[:, p:-p, p:-p, :]

    def apply_nnf_to_image(self, nnf, source):
        return self.kernels.remap(self.height, self.width, self.channel,
                                  self.patch_size, self.pad_size,
                                  np.asarray(source, np.float32),
                                  np.asarray(nnf, np.int32))

    def get_patch_error(self, source, nnf, target):
        return self.kernels.patch_error(self.height, self.width, self.channel,
                                        self.patch_size, self.pad_size,
                                        np.asarray(source, np.float32),
                                        np.asarray(nnf, np.int32),
                                        np.asarray(target, np.float32))

    def get_pairwise_patch_error(self, source, nnf):
        err = self.kernels.pairwise_patch_error(
            self.height, self.width, self.channel, self.patch_size,
            self.pad_size,
            np.ascontiguousarray(source[0::2], np.float32),
            np.ascontiguousarray(nnf[0::2], np.int32),
            np.ascontiguousarray(source[1::2], np.float32),
            np.ascontiguousarray(nnf[1::2], np.int32))
        return err.repeat(2, axis=0)

    def get_error(self, source_guide, target_guide, source_style,
                  target_style, nnf):
        error_guide = self.get_patch_error(source_guide, nnf, target_guide)
        if self.use_mean_target_style:
            target_style = self.apply_nnf_to_image(nnf, source_style)
            target_style = target_style.mean(axis=0, keepdims=True)
            target_style = target_style.repeat(source_guide.shape[0], axis=0)
        if self.use_pairwise_patch_error:
            error_style = self.get_pairwise_patch_error(source_style, nnf)
        else:
            error_style = self.get_patch_error(source_style, nnf, target_style)
        return error_guide * self.guide_weight + error_style

    def clamp_bound(self, nnf):
        nnf[..., 0] = np.clip(nnf[..., 0], 0, self.height - 1)
        nnf[..., 1] = np.clip(nnf[..., 1], 0, self.width - 1)
        return nnf

    def random_step(self, nnf, r):
        step = self.rng.integers(-r, r + 1, size=nnf.shape, dtype=np.int64).astype(np.int32)
        return self.clamp_bound(nnf + step)

    def neighboor_step(self, nnf, d):
        if d == 0:
            upd = np.concatenate([nnf[:, :1, :], nnf[:, :-1, :]], axis=1).copy()
            upd[..., 0] += 1
        elif d == 1:
            upd = np.concatenate([nnf[:, :, :1], nnf[:, :, :-1]], axis=2).copy()
            upd[..., 1] += 1
        elif d == 2:
            upd = np.concatenate([nnf[:, 1:, :], nnf[:, -1:, :]], axis=1).copy()
            upd[..., 0] -= 1
        else:
            upd = np.concatenate([nnf[:, :, 1:], nnf[:, :, -1:]], axis=2).copy()
            upd[..., 1] -= 1
        return self.clamp_bound(upd)

    def shift_nnf(self, nnf, d):
        if d > 0:
            d = min(nnf.shape[0], d)
            return np.concatenate([nnf[d:]] + [nnf[-1:]] * d, axis=0)
        d = max(-nnf.shape[0], d)
        return np.concatenate([nnf[:1]] * (-d) + [nnf[:d]], axis=0)

    def track_step(self, nnf, d):
        if self.use_pairwise_patch_error:
            upd = np.zeros_like(nnf)
            upd[0::2] = self.shift_nnf(nnf[0::2], d)
            upd[1::2] = self.shift_nnf(nnf[1::2], d)
            return upd
        return self.shift_nnf(nnf, d)

    def update(self, source_guide, target_guide, source_style, target_style,
               nnf, err, upd_nnf):
        upd_err = self.get_error(source_guide, target_guide, source_style,
                                 target_style, upd_nnf)
        upd_idx = upd_err < err
        nnf[upd_idx] = upd_nnf[upd_idx]
        err[upd_idx] = upd_err[upd_idx]
        return nnf, err

    def iteration(self, source_guide, target_guide, source_style,
                  target_style, nnf, err):
        for d in self.rng.permutation(4):
            nnf, err = self.update(source_guide, target_guide, source_style,
                                   target_style, nnf, err,
                                   self.neighboor_step(nnf, d))
        for _ in range(self.random_search_steps):
            nnf, err = self.update(source_guide, target_guide, source_style,
                                   target_style, nnf, err,
                                   self.random_step(nnf, self.random_search_range))
        for d in range(1, self.tracking_window_size + 1):
            nnf, err = self.update(source_guide, target_guide, source_style,
                                   target_style, nnf, err, self.track_step(nnf, d))
            nnf, err = self.update(source_guide, target_guide, source_style,
                                   target_style, nnf, err, self.track_step(nnf, -d))
        return nnf, err

    def estimate_nnf(self, source_guide, target_guide, source_style, nnf):
        source_guide = self.pad_image(source_guide)
        target_guide = self.pad_image(target_guide)
        source_style = self.pad_image(source_style)
        for it in range(self.num_iter):
            self.patch_size = self.patch_size_list[it]
            target_style = self.apply_nnf_to_image(nnf, source_style)
            err = self.get_error(source_guide, target_guide, source_style,
                                 target_style, nnf)
            nnf, err = self.iteration(source_guide, target_guide, source_style,
                                      target_style, nnf, err)
        target_style = self.unpad_image(self.apply_nnf_to_image(nnf, source_style))
        return nnf, target_style


class PyramidPatchMatcher:
    def __init__(self, image_height, image_width, channel, minimum_patch_size,
                 num_iter=5, guide_weight=10.0, use_mean_target_style=False,
                 use_pairwise_patch_error=False, tracking_window_size=0,
                 initialize="identity", backend="auto", **kwargs):
        maximum_patch_size = minimum_patch_size + (num_iter - 1) * 2
        self.pyramid_level = max(1, int(np.log2(
            min(image_height, image_width) / maximum_patch_size)))
        self.pyramid_heights = []
        self.pyramid_widths = []
        self.patch_matchers = []
        self.initialize = initialize
        for level in range(self.pyramid_level):
            height = image_height // (2 ** (self.pyramid_level - 1 - level))
            width = image_width // (2 ** (self.pyramid_level - 1 - level))
            self.pyramid_heights.append(height)
            self.pyramid_widths.append(width)
            self.patch_matchers.append(PatchMatcher(
                height, width, channel, minimum_patch_size=minimum_patch_size,
                num_iter=num_iter, guide_weight=guide_weight,
                use_mean_target_style=use_mean_target_style,
                use_pairwise_patch_error=use_pairwise_patch_error,
                tracking_window_size=tracking_window_size, backend=backend))

    def resample_image(self, images, level):
        import cv2
        height, width = self.pyramid_heights[level], self.pyramid_widths[level]
        out = np.stack([
            cv2.resize(img, (width, height), interpolation=cv2.INTER_AREA)
            for img in np.asarray(images, np.float32)])
        if out.ndim == 3:
            out = out[..., None]
        return out

    def initialize_nnf(self, batch_size):
        height, width = self.pyramid_heights[0], self.pyramid_widths[0]
        if self.initialize == "random":
            rng = np.random.default_rng(0)
            return np.stack([
                rng.integers(0, height, (batch_size, height, width)),
                rng.integers(0, width, (batch_size, height, width)),
            ], axis=3).astype(np.int32)
        nnf = np.stack(np.meshgrid(np.arange(height), np.arange(width),
                                   indexing="ij"), axis=2)
        return np.stack([nnf] * batch_size).astype(np.int32)

    def update_nnf(self, nnf, level):
        nnf = nnf.repeat(2, axis=1).repeat(2, axis=2) * 2
        nnf[:, 1::2, :, 0] += 1
        nnf[:, :, 1::2, 1] += 1
        height, width = self.pyramid_heights[level], self.pyramid_widths[level]
        if height != nnf.shape[1] or width != nnf.shape[2]:
            import cv2
            nnf = np.stack([
                cv2.resize(n.astype(np.float32), (width, height),
                           interpolation=cv2.INTER_LINEAR)
                for n in nnf]).astype(np.int32)
            nnf = self.patch_matchers[level].clamp_bound(nnf)
        return nnf

    def estimate_nnf(self, source_guide, target_guide, source_style):
        nnf = None
        for level in range(self.pyramid_level):
            nnf = (self.initialize_nnf(np.asarray(source_guide).shape[0])
                   if level == 0 else self.update_nnf(nnf, level))
            sg = self.resample_image(source_guide, level)
            tg = self.resample_image(target_guide, level)
            ss = self.resample_image(source_style, level)
            nnf, target_style = self.patch_matchers[level].estimate_nnf(
                sg, tg, ss, nnf)
        return nnf, target_style
