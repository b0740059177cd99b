"""SDXLVideoPipeline (AnimateDiff-XL / Kolors video), TPU-native.

Re-design of the reference SDXLVideoPipeline + lets_dance_xl
(/root/reference/diffsynth/pipelines/sdxl_video.py:15-226 and
pipelines/dancer.py:119-236): SDXL denoising over frames-as-batch latents
with AnimateDiff-XL TemporalBlocks injected after mapped UNet blocks,
triangle-weighted sliding-window blending for long videos, IP-Adapter
(full / instant-style), Kolors ChatGLM conditioning, and the mid-loop
pixel-space smoother hooks shared with SDVideoPipeline.

Without motion modules the reference repeats ONE noise sample across all
frames and falls back to the scaled_linear DDIM schedule
(sdxl_video.py:136-139); with motion modules each frame gets independent
noise and the AnimateDiff linear schedule.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..models import sd as SD
from ..models import sdxl as XL
from ..models.motion import SDXL_MOTION_CALL_BLOCK_ID
from ..schedulers import EnhancedDDIMScheduler
from .sdxl_image import SDXLImagePipeline
from .wan_video import generate_noise, _preprocess_images


def dance_long_video_xl(unet_params, motion, sample, timestep, ctx,
                        add_time_id, add_text, ipadapter_kwargs_list=None,
                        animatediff_batch_size: int = 16,
                        animatediff_stride: int = 8):
    """lets_dance_with_long_video windowing applied to the XL UNet
    (sd_video.py:14-66 + dancer.py:119-236): overlapping frame windows
    blended with triangle weights."""
    T = sample.shape[0]
    out = np.zeros(np.asarray(sample).shape, np.float32)
    num = np.zeros((T, 1, 1, 1), np.float32)
    for b0 in range(0, T, animatediff_stride):
        b1 = min(b0 + animatediff_batch_size, T)
        batch = XL.sdxl_unet_forward(
            unet_params, sample[b0:b1], timestep, ctx, add_time_id, add_text,
            ipadapter_kwargs_list=ipadapter_kwargs_list, motion=motion)
        batch = np.asarray(batch, np.float32)
        for i in range(b0, b1):
            bias = max(1 - abs(i - (b0 + b1 - 1) / 2)
                       / ((b1 - b0 - 1 + 1e-2) / 2), 1e-2)
            out[i] = (out[i] * (num[i] / (num[i] + bias))
                      + batch[i - b0] * (bias / (num[i] + bias)))
            num[i] += bias
        if b1 == T:
            break
    return jnp.asarray(out)


class SDXLVideoPipeline(SDXLImagePipeline):
    """Public API mirrors the reference __call__ (sdxl_video.py:101-226)."""

    def __init__(self, dtype=jnp.float32, use_original_animatediff: bool = True):
        super().__init__(dtype=dtype)
        self.scheduler = EnhancedDDIMScheduler(
            beta_schedule="linear" if use_original_animatediff
            else "scaled_linear")
        self.motion_params = None       # stacked dict {str(i): TemporalBlock}
        self.ipadapter_params = None

    def fetch_motion_modules(self, motion_params):
        self.motion_params = motion_params

    def _maybe_downgrade_scheduler(self):
        """No motion modules -> plain SDXL schedule; Kolors without motion ->
        its own schedule (sdxl_video.py:55-66)."""
        if self.motion_params is None:
            if self.kolors_params is not None:
                self.scheduler = EnhancedDDIMScheduler(
                    beta_end=0.014, num_train_timesteps=1100)
            else:
                self.scheduler = EnhancedDDIMScheduler(
                    beta_schedule="scaled_linear")

    def encode_video(self, frames, width, height):
        arr = _preprocess_images([f.resize((width, height)) for f in frames])
        return SD.sd_vae_encoder_forward(
            self.vae_encoder_params,
            jnp.asarray(arr[0].transpose(1, 0, 2, 3), self.dtype))

    def decode_video(self, latents):
        frames_out = SD.sd_vae_decoder_forward(self.vae_decoder_params,
                                               latents)
        arr = np.asarray(frames_out, np.float32).transpose(0, 2, 3, 1)
        arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
        from PIL import Image
        return [Image.fromarray(f) for f in arr]

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 7.5,
        clip_skip: int = 1,
        num_frames: int = 16,
        input_frames: Optional[List] = None,
        ipadapter_image_embeds=None,
        ipadapter_scale: float = 1.0,
        ipadapter_use_instant_style: bool = False,
        denoising_strength: float = 1.0,
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 20,
        animatediff_batch_size: int = 16,
        animatediff_stride: int = 8,
        smoother=None,
        smoother_progress_ids: Optional[List[int]] = None,
        seed: Optional[int] = None,
        progress_bar_cmd=None,
        return_latents: bool = False,
    ):
        smoother_progress_ids = smoother_progress_ids or []
        self._maybe_downgrade_scheduler()
        self.scheduler.set_timesteps(num_inference_steps,
                                     denoising_strength=denoising_strength)

        if self.motion_params is None:
            noise = jnp.broadcast_to(
                jnp.asarray(generate_noise((1, 4, height // 8, width // 8),
                                           seed=seed), self.dtype),
                (num_frames, 4, height // 8, width // 8))
        else:
            noise = jnp.asarray(generate_noise(
                (num_frames, 4, height // 8, width // 8), seed=seed),
                self.dtype)
        if input_frames is not None and denoising_strength < 1.0:
            lat = self.encode_video(input_frames, width, height)
            latents = jnp.asarray(self.scheduler.add_noise(
                np.asarray(lat, np.float32), np.asarray(noise, np.float32),
                self.scheduler.timesteps[0]), self.dtype)
        else:
            latents = noise

        ctx_posi, pooled_posi = self.encode_prompt(prompt, clip_skip)
        if cfg_scale != 1.0:
            ctx_nega, pooled_nega = self.encode_prompt(negative_prompt,
                                                       clip_skip)
        add_time_id = jnp.asarray([height, width, 0, 0, height, width],
                                  jnp.float32)

        ip_posi = ip_nega = None
        if (self.ipadapter_params is not None
                and ipadapter_image_embeds is not None):
            from ..models.ipadapter import ipadapter_kwargs
            ip_posi = ipadapter_kwargs(
                self.ipadapter_params, ipadapter_image_embeds,
                scale=ipadapter_scale, xl=True,
                instant_style=ipadapter_use_instant_style)
            ip_nega = ipadapter_kwargs(
                self.ipadapter_params,
                jnp.zeros_like(ipadapter_image_embeds), xl=True,
                instant_style=ipadapter_use_instant_style)

        motion = None
        if self.motion_params is not None:
            motion = (self.motion_params, SDXL_MOTION_CALL_BLOCK_ID)

        steps = range(len(self.scheduler.timesteps))
        if progress_bar_cmd is not None:
            steps = progress_bar_cmd(steps)
        for i in steps:
            t = self.scheduler.timesteps[i]
            tj = jnp.asarray([t], jnp.float32)
            eps_posi = dance_long_video_xl(
                self.unet_params, motion, latents, tj, ctx_posi, add_time_id,
                pooled_posi, ipadapter_kwargs_list=ip_posi,
                animatediff_batch_size=animatediff_batch_size,
                animatediff_stride=animatediff_stride)
            if cfg_scale != 1.0:
                eps_nega = dance_long_video_xl(
                    self.unet_params, motion, latents, tj, ctx_nega,
                    add_time_id, pooled_nega, ipadapter_kwargs_list=ip_nega,
                    animatediff_batch_size=animatediff_batch_size,
                    animatediff_stride=animatediff_stride)
                eps = eps_nega + cfg_scale * (eps_posi - eps_nega)
            else:
                eps = eps_posi
            # mid-loop smoothing (sdxl_video.py:206-211)
            if smoother is not None and i in smoother_progress_ids:
                rendered = self.scheduler.step(
                    np.asarray(eps, np.float32), t,
                    np.asarray(latents, np.float32), to_final=True)
                frames = self.decode_video(jnp.asarray(rendered, self.dtype))
                frames = smoother(frames, original_frames=input_frames)
                target = self.encode_video(frames, width, height)
                eps = jnp.asarray(self.scheduler.return_to_timestep(
                    t, np.asarray(latents, np.float32),
                    np.asarray(target, np.float32)), self.dtype)
            latents = jnp.asarray(self.scheduler.step(
                np.asarray(eps, np.float32), t,
                np.asarray(latents, np.float32)), self.dtype)

        if return_latents:
            return latents
        frames = self.decode_video(latents)
        if smoother is not None and (num_inference_steps in smoother_progress_ids
                                     or -1 in smoother_progress_ids):
            frames = smoother(frames, original_frames=input_frames)
        return frames
