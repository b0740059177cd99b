"""ControlNet unit management + annotators.

Re-design of /root/reference/diffsynth/controlnets/controlnet_unit.py:1-66
and processors.py:1-90: ControlNetUnit bundles (annotator, model params,
scale); MultiControlNetManager sums scaled residual stacks. Annotators run
on host: canny via cv2; depth/softedge/... require controlnet_aux (absent in
this environment) and raise unless skip_processor/none/tile/inpaint.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import jax.numpy as jnp


@dataclass
class ControlNetConfigUnit:
    processor_id: str
    model_path: str
    scale: float = 1.0
    skip_processor: bool = False


class Annotator:
    """processors.py:8-90. canny is implemented natively (cv2); the
    neural annotators need controlnet_aux weights and are gated."""

    def __init__(self, processor_id: str, detect_resolution=None,
                 skip_processor: bool = False):
        self.processor_id = processor_id
        self.detect_resolution = detect_resolution
        self.skip = skip_processor or processor_id in ("tile", "none",
                                                       "inpaint")
        if not self.skip and processor_id != "canny":
            try:
                import controlnet_aux  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    f"annotator '{processor_id}' needs controlnet_aux, which "
                    "is not available here; pass skip_processor=True and "
                    "provide pre-processed control images") from e

    def __call__(self, image):
        if self.skip:
            return image
        if self.processor_id == "canny":
            import cv2
            from PIL import Image
            w, h = image.size
            dr = self.detect_resolution or min(w, h)
            small = image.resize((dr, dr))
            edges = cv2.Canny(np.asarray(small), 100, 200)
            edges = np.repeat(edges[:, :, None], 3, axis=2)
            return Image.fromarray(edges).resize((w, h))
        raise ValueError(self.processor_id)


class ControlNetUnit:
    def __init__(self, processor: Annotator, params, scale: float = 1.0,
                 xl: bool = False, global_pool: bool = False):
        self.processor = processor
        self.params = params
        self.scale = scale
        self.xl = xl
        self.global_pool = global_pool


class MultiControlNetManager:
    """controlnet_unit.py:21-66: per-unit forward, scaled sum of residual
    stacks."""

    def __init__(self, controlnet_units: List[ControlNetUnit] = ()):
        self.units = list(controlnet_units)

    def process_image(self, image, width, height):
        """-> (n_units, 3, H, W) float conditioning in [0, 1]."""
        conds = []
        for unit in self.units:
            img = unit.processor(image).resize((width, height))
            conds.append(np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0)
        return np.stack(conds)

    def __call__(self, sample, timestep, text_emb, conditionings, **kwargs):
        from .models.controlnet import (sd_controlnet_forward,
                                        sdxl_controlnet_union_forward)
        res_stack = None
        for unit, cond in zip(self.units, conditionings):
            cond = jnp.asarray(cond)[None]
            if unit.xl:
                stack = sdxl_controlnet_union_forward(
                    unit.params, sample, timestep, text_emb, cond,
                    unit.processor.processor_id,
                    kwargs["add_time_id"], kwargs["add_text_embeds"],
                    global_pool=unit.global_pool)
            else:
                stack = sd_controlnet_forward(unit.params, sample, timestep,
                                              text_emb, cond,
                                              global_pool=unit.global_pool)
            stack = [r * unit.scale for r in stack]
            if res_stack is None:
                res_stack = stack
            else:
                res_stack = [a + b for a, b in zip(res_stack, stack)]
        return res_stack
