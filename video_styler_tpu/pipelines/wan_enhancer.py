"""Wan2.2 dual-expert temporal denoising enhancer (SDEdit-style).

Port of the enhance path in /root/reference/denoising_enhancing/wan/
text2video.py:103-126 (dual experts), :171-203 (expert switch per timestep),
:320-401 (enhance: encode -> add_noise at timesteps[-forward_step] ->
denoise only the last skip_backward_step steps with UniPC -> decode).

TPU-native: both experts' params live in HBM (or sharded over the mesh);
"offload the inactive expert" becomes unnecessary. The Ulysses SP + FSDP of
the reference map to the dp/fsdp/sp mesh axes.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import wan_dit as M
from ..models.wan_dit import WanDiTConfig
from ..models import wan_vae as V
from ..models.t5 import T5Config, UMT5_XXL
from ..schedulers.flow_unipc import FlowUniPCMultistepScheduler
from .wan_video import WanVideoPipeline, _preprocess_images, generate_noise


class WanEnhancerPipeline(WanVideoPipeline):
    """dit_params = low-noise expert, dit2_params = high-noise expert."""

    def enhance(
        self,
        video,  # list of PIL frames
        prompt: str = "",
        negative_prompt: str = "",
        forward_step: int = 4,
        skip_backward_step: int = 4,
        sampling_steps: int = 50,
        shift: float = 5.0,
        guide_scale: Tuple[float, float] = (3.0, 4.0),
        boundary: float = 0.875,
        seed: Optional[int] = None,
        tiled: bool = False,
        tile_size: Tuple[int, int] = (30, 52),
        tile_stride: Tuple[int, int] = (15, 26),
        return_latents: bool = False,
    ):
        """guide_scale = (low_noise_scale, high_noise_scale) as in
        wan_t2v_A14B.py sample_guide_scale; boundary in train-timestep units
        fraction (0.875 -> timestep 875)."""
        kw = dict(tiled=tiled, tile_size=tile_size, tile_stride=tile_stride)
        scheduler = FlowUniPCMultistepScheduler(
            num_train_timesteps=1000, shift=1, use_dynamic_shifting=False)
        scheduler.set_timesteps(sampling_steps, shift=shift)
        boundary_t = boundary * 1000

        video_np = _preprocess_images(video)
        latents = self.encode_video(video_np, **kw).astype(jnp.float32)

        noise = jnp.asarray(
            generate_noise(latents.shape, seed=seed), jnp.float32)
        t_fwd = int(scheduler.timesteps[-forward_step])
        latents = jnp.asarray(scheduler.add_noise(latents, noise, t_fwd))

        ctx_posi = self.encode_prompt(prompt)
        ctx_nega = self.encode_prompt(negative_prompt)

        timesteps = scheduler.timesteps[-skip_backward_step:]
        for t in timesteps:
            t_item = int(t)
            if t_item >= boundary_t and self.dit2_params is not None:
                which, params = "dit2", self.dit2_params  # high-noise expert
                scale = guide_scale[1]
            else:
                which, params = "dit", self.dit_params    # low-noise expert
                scale = guide_scale[0]
            timestep = jnp.asarray([float(t_item)], jnp.float32)
            lat = latents.astype(self.dtype)
            v_cond = self._branch_forward(which, params, None, lat, timestep,
                                          ctx_posi, None, 1.0, None)
            v_uncond = self._branch_forward(which, params, None, lat, timestep,
                                            ctx_nega, None, 1.0, None)
            v = v_uncond + scale * (v_cond - v_uncond)
            # UniPC's update math is array-polymorphic; feeding jnp arrays
            # keeps the multistep state and the 47 MB latent ON DEVICE —
            # the host round-trip per step cost 5 s/pass on the tunnel
            # harness (docs/PERF_NOTES_r5.md per-pass decomposition)
            latents = scheduler.step(v.astype(jnp.float32), t_item, latents)

        latents = latents.astype(self.dtype)
        if return_latents:
            return latents
        out = self.decode_video(latents, **kw)
        return self.vae_output_to_video(out)
