"""SDVideoPipeline (AnimateDiff / Diffutoon dancer), TPU-native.

Re-design of the reference SDVideoPipeline + lets_dance_with_long_video
(/root/reference/diffsynth/pipelines/sd_video.py:14-66, 68-260 and
pipelines/dancer.py:7-114): SD-1.5 denoising over frames-as-batch latents
with AnimateDiff motion modules injected after mapped UNet blocks, optional
per-frame ControlNet conditioning, and triangle-weighted sliding-window
blending for long videos.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import sd as SD
from ..models.motion import SD_MOTION_CALL_BLOCK_ID
from ..schedulers import EnhancedDDIMScheduler
from .wan_video import generate_noise, _preprocess_images


def dance_long_video(unet_params, motion, sample, timestep, text_emb,
                     cn_fn=None, animatediff_batch_size: int = 16,
                     animatediff_stride: int = 8):
    """lets_dance_with_long_video (sd_video.py:14-66): overlapping window
    passes blended with triangle weights."""
    T = sample.shape[0]
    out = np.zeros(np.asarray(sample).shape, np.float32)
    num = np.zeros((T, 1, 1, 1), np.float32)
    for b0 in range(0, T, animatediff_stride):
        b1 = min(b0 + animatediff_batch_size, T)
        cn = None if cn_fn is None else cn_fn(b0, b1)
        batch = SD.sd_unet_forward(unet_params, sample[b0:b1], timestep,
                                   text_emb,
                                   controlnet_res_stack=cn, motion=motion)
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


class SDVideoPipeline:
    """Public API mirrors the reference __call__ (sd_video.py:140-252)."""

    def __init__(self, dtype=jnp.float32, use_original_animatediff: bool = True):
        self.dtype = dtype
        self.scheduler = EnhancedDDIMScheduler(
            beta_schedule="linear" if use_original_animatediff
            else "scaled_linear")
        self.unet_params = None
        self.text_encoder_params = None
        self.vae_encoder_params = None
        self.vae_decoder_params = None
        self.motion_params = None       # stacked dict {str(i): TemporalBlock}
        self.controlnet_manager = None
        self.tokenizer = None

    def encode_prompt(self, prompt: str, clip_skip: int = 1):
        out = self.tokenizer([prompt], padding="max_length", max_length=77,
                             truncation=True, return_tensors="np")
        return SD.sd_text_encoder_forward(
            self.text_encoder_params,
            jnp.asarray(out["input_ids"], jnp.int32), clip_skip)

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 7.5,
        clip_skip: int = 1,
        num_frames: int = 16,
        input_frames: Optional[List] = None,
        controlnet_frames: Optional[List] = None,
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
        self.scheduler.set_timesteps(num_inference_steps,
                                     denoising_strength=denoising_strength)
        noise = jnp.asarray(generate_noise(
            (num_frames, 4, height // 8, width // 8), seed=seed), self.dtype)
        if input_frames is not None and denoising_strength < 1.0:
            frames = _preprocess_images(
                [f.resize((width, height)) for f in input_frames])
            lat = SD.sd_vae_encoder_forward(
                self.vae_encoder_params,
                jnp.asarray(frames[0].transpose(1, 0, 2, 3), self.dtype))
            latents = jnp.asarray(self.scheduler.add_noise(
                np.asarray(lat, np.float32), np.asarray(noise, np.float32),
                self.scheduler.timesteps[0]), self.dtype)
        else:
            latents = noise

        ctx_posi = self.encode_prompt(prompt, clip_skip)
        ctx_nega = (self.encode_prompt(negative_prompt, clip_skip)
                    if cfg_scale != 1.0 else None)

        conditionings = None
        if self.controlnet_manager is not None and controlnet_frames is not None:
            conditionings = [
                self.controlnet_manager.process_image(f, width, height)
                for f in controlnet_frames]          # per-frame (n_units,3,H,W)

        motion = None
        if self.motion_params is not None:
            motion = (self.motion_params, SD_MOTION_CALL_BLOCK_ID)

        steps = range(len(self.scheduler.timesteps))
        if progress_bar_cmd is not None:
            steps = progress_bar_cmd(steps)
        for i in steps:
            t = self.scheduler.timesteps[i]
            tj = jnp.asarray([t], jnp.float32)

            def cn_fn_for(ctx):
                if conditionings is None:
                    return None

                def cn_fn(b0, b1):
                    stacks = []
                    for f in range(b0, b1):
                        stacks.append(self.controlnet_manager(
                            latents[f:f + 1], tj, ctx, conditionings[f]))
                    return [jnp.concatenate([s[j] for s in stacks], axis=0)
                            for j in range(len(stacks[0]))]
                return cn_fn

            eps_posi = dance_long_video(
                self.unet_params, motion, latents, tj, ctx_posi,
                cn_fn=cn_fn_for(ctx_posi),
                animatediff_batch_size=animatediff_batch_size,
                animatediff_stride=animatediff_stride)
            if cfg_scale != 1.0:
                eps_nega = dance_long_video(
                    self.unet_params, motion, latents, tj, ctx_nega,
                    cn_fn=cn_fn_for(ctx_nega),
                    animatediff_batch_size=animatediff_batch_size,
                    animatediff_stride=animatediff_stride)
                eps = eps_nega + cfg_scale * (eps_posi - eps_nega)
            else:
                eps = eps_posi
            # mid-loop smoothing (sd_video.py:249-256): render to x0, smooth
            # in pixel space, re-encode, convert back to an eps target
            if smoother is not None and i in smoother_progress_ids:
                rendered = self.scheduler.step(
                    np.asarray(eps, np.float32), t,
                    np.asarray(latents, np.float32), to_final=True)
                frames = self._decode_frames(jnp.asarray(rendered, self.dtype))
                frames = smoother(frames, original_frames=input_frames)
                target = SD.sd_vae_encoder_forward(
                    self.vae_encoder_params,
                    jnp.asarray(_preprocess_images(frames)[0].transpose(
                        1, 0, 2, 3), self.dtype))
                eps = jnp.asarray(self.scheduler.return_to_timestep(
                    t, np.asarray(latents, np.float32),
                    np.asarray(target, np.float32)), self.dtype)
            latents = jnp.asarray(self.scheduler.step(
                np.asarray(eps, np.float32), t,
                np.asarray(latents, np.float32)), self.dtype)

        if return_latents:
            return latents
        frames = self._decode_frames(latents)
        if smoother is not None and (num_inference_steps in smoother_progress_ids
                                     or -1 in smoother_progress_ids):
            frames = smoother(frames, original_frames=input_frames)
        return frames

    def _decode_frames(self, latents):
        frames_out = SD.sd_vae_decoder_forward(self.vae_decoder_params, latents)
        arr = np.asarray(frames_out, np.float32).transpose(0, 2, 3, 1)
        arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
        from PIL import Image
        return [Image.fromarray(f) for f in arr]
