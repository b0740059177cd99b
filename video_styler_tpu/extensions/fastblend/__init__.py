"""FastBlend: PatchMatch-based video deflickering / style blending.

Port of /root/reference/diffsynth/extensions/FastBlend (api.py + runners):
balanced/accurate sliding-window blending and keyframe interpolation, driven
by the backend-pluggable PatchMatch core (native C++ or XLA kernels).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from .patch_match import PatchMatcher, PyramidPatchMatcher
from .kernels import get_kernels

DEFAULT_EBSYNTH_CONFIG = dict(minimum_patch_size=5, num_iter=5,
                              guide_weight=10.0)


class BalancedModeRunner:
    """Average NNF-remapped neighbors in a +-window (runners/balanced.py)."""

    def run(self, frames_guide, frames_style, batch_size, window_size,
            ebsynth_config, desc="Balanced Mode"):
        engine = PyramidPatchMatcher(
            image_height=frames_style[0].shape[0],
            image_width=frames_style[0].shape[1],
            channel=3, **ebsynth_config)
        n = len(frames_style)
        tasks = [(s, t) for t in range(n)
                 for s in range(t - window_size, t + window_size + 1)
                 if 0 <= s < n and s != t]
        frames = [(None, 1) for _ in range(n)]
        outputs = [None] * n
        for batch_id in range(0, len(tasks), batch_size):
            batch = tasks[batch_id:batch_id + batch_size]
            sg = np.stack([frames_guide[s] for s, t in batch])
            tg = np.stack([frames_guide[t] for s, t in batch])
            ss = np.stack([frames_style[s] for s, t in batch])
            _, target_style = engine.estimate_nnf(sg, tg, ss)
            for (s, t), result in zip(batch, target_style):
                frame, weight = frames[t]
                if frame is None:
                    frame = np.asarray(frames_style[t], np.float32)
                frames[t] = (frame * (weight / (weight + 1))
                             + result / (weight + 1), weight + 1)
                full = min(n, t + window_size + 1) - max(0, t - window_size)
                if weight + 1 == full:
                    outputs[t] = frames[t][0].clip(0, 255).astype(np.uint8)
        for t in range(n):
            if outputs[t] is None:
                f = frames[t][0]
                outputs[t] = (np.asarray(frames_style[t]) if f is None
                              else f.clip(0, 255)).astype(np.uint8)
        return outputs


class AccurateModeRunner:
    """use_mean_target_style blending over the window (runners/accurate.py)."""

    def run(self, frames_guide, frames_style, batch_size, window_size,
            ebsynth_config, desc="Accurate Mode"):
        engine = PyramidPatchMatcher(
            image_height=frames_style[0].shape[0],
            image_width=frames_style[0].shape[1],
            channel=3, use_mean_target_style=True, **ebsynth_config)
        n = len(frames_style)
        outputs = []
        for target in range(n):
            l = max(target - window_size, 0)
            r = min(target + window_size + 1, n)
            sources = list(range(l, r))
            remapped = []
            for batch_id in range(0, len(sources), batch_size):
                batch = sources[batch_id:batch_id + batch_size]
                sg = np.stack([frames_guide[s] for s in batch])
                tg = np.stack([frames_guide[target]] * len(batch))
                ss = np.stack([frames_style[s] for s in batch])
                _, ts = engine.estimate_nnf(sg, tg, ss)
                remapped.append(ts)
            frame = np.concatenate(remapped).mean(axis=0)
            outputs.append(frame.clip(0, 255).astype(np.uint8))
        return outputs


class InterpolationModeRunner:
    """Propagate styled keyframes to in-between frames
    (runners/interpolation.py): each frame blends the left and right
    keyframes remapped through NNFs, weighted by distance."""

    def run(self, frames_guide, frames_style, index_style, batch_size,
            ebsynth_config):
        engine = PyramidPatchMatcher(
            image_height=frames_style[0].shape[0],
            image_width=frames_style[0].shape[1],
            channel=3, **ebsynth_config)
        n = len(frames_guide)
        outputs = [None] * n
        for i, idx in enumerate(index_style):
            outputs[idx] = np.asarray(frames_style[i], np.uint8)
        for t in range(n):
            if outputs[t] is not None:
                continue
            left = max([i for i in index_style if i <= t], default=None)
            right = min([i for i in index_style if i >= t], default=None)
            parts, weights = [], []
            for kf in (left, right):
                if kf is None:
                    continue
                style = frames_style[index_style.index(kf)]
                sg = np.stack([frames_guide[kf]])
                tg = np.stack([frames_guide[t]])
                ss = np.stack([np.asarray(style, np.float32)])
                _, ts = engine.estimate_nnf(sg, tg, ss)
                parts.append(ts[0])
                weights.append(1.0 / (abs(t - kf) + 1e-3))
            w = np.asarray(weights) / sum(weights)
            frame = sum(p * wi for p, wi in zip(parts, w))
            outputs[t] = frame.clip(0, 255).astype(np.uint8)
        return outputs


class FastBlendSmoother:
    """Processor-chain entry (api.py usage): smooth rendered frames."""

    def __init__(self, batch_size: int = 8, window_size: int = 15,
                 mode: str = "balanced", ebsynth_config: Optional[dict] = None):
        self.batch_size = batch_size
        self.window_size = window_size
        self.mode = mode
        self.ebsynth_config = ebsynth_config or dict(DEFAULT_EBSYNTH_CONFIG)

    def __call__(self, rendered_frames: List, original_frames: List = None,
                 **kwargs):
        from PIL import Image
        guide = [np.asarray(f, np.float32) for f in
                 (original_frames or rendered_frames)]
        style = [np.asarray(f, np.float32) for f in rendered_frames]
        runner = {"balanced": BalancedModeRunner,
                  "accurate": AccurateModeRunner}[self.mode]()
        out = runner.run(guide, style, batch_size=self.batch_size,
                         window_size=self.window_size,
                         ebsynth_config=self.ebsynth_config)
        return [Image.fromarray(f) for f in out]
