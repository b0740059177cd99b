"""SVDVideoPipeline: image -> video, TPU-native.

Re-design of the reference SVDVideoPipeline
(/root/reference/diffsynth/pipelines/svd_video.py:12-189): EDM-style
continuous ODE sampling over frames-as-batch latents, CLIP-image + noised
VAE-image conditioning concatenated on channels, per-frame linspace CFG,
optional v2v (denoising_strength<1) and mask-frame re-noising, post
normalization/contrast enhancement.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import svd as S
from ..schedulers import ContinuousODEScheduler
from .wan_video import generate_noise, _preprocess_images


class SVDVideoPipeline:
    """Public API mirrors the reference __call__ (svd_video.py:111-189)."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.scheduler = ContinuousODEScheduler()
        self.unet_params = None
        self.vae_encoder_params = None
        self.vae_decoder_params = None
        self.image_encoder_params = None
        self._jit_cache = {}

    @classmethod
    def from_pretrained(cls, unet_path=None, vae_encoder_path=None,
                        vae_decoder_path=None, image_encoder_path=None,
                        dtype=jnp.float32):
        from ..utils import ckpt as C
        pipe = cls(dtype=dtype)
        if unet_path:
            pipe.unet_params = S.convert_svd_module(
                C.load_state_dict(unet_path), dtype=dtype)
        if vae_encoder_path:
            pipe.vae_encoder_params = S.convert_svd_module(
                C.load_state_dict(vae_encoder_path), dtype=dtype)
        if vae_decoder_path:
            pipe.vae_decoder_params = S.convert_svd_module(
                C.load_state_dict(vae_decoder_path), dtype=dtype)
        if image_encoder_path:
            pipe.image_encoder_params = S.convert_svd_module(
                C.load_state_dict(image_encoder_path), dtype=dtype)
        return pipe

    # ---------------- encoders ----------------

    def encode_image_with_clip(self, image, height, width):
        """CLIP-normalized 224x224 resize + ViT-H projection
        (svd_video.py:41-49)."""
        from ..models.clip_vit import preprocess_clip_image
        img = _preprocess_images([image.resize((width, height))])[:, :, 0]
        pre = preprocess_clip_image(img, 224)
        return S.svd_image_encoder_forward(
            self.image_encoder_params, jnp.asarray(pre, self.dtype))

    def encode_image_with_vae(self, image, noise_aug_strength, height, width,
                              seed=None):
        img = _preprocess_images([image.resize((width, height))])[:, :, 0]
        noise = generate_noise(img.shape, seed=seed)
        img = jnp.asarray(img + noise_aug_strength * noise, jnp.float32)
        z = S.sd_vae_encode_raw(self.vae_encoder_params, img)
        return z.astype(self.dtype)

    def encode_video_with_vae(self, frames, height, width):
        imgs = _preprocess_images([f.resize((width, height)) for f in frames])
        imgs = jnp.asarray(imgs[0].transpose(1, 0, 2, 3), jnp.float32)  # (T,3,H,W)
        z = S.svd_vae_encode(self.vae_encoder_params, imgs)
        return z.astype(self.dtype)

    def _fwd(self):
        if "fwd" not in self._jit_cache:
            self._jit_cache["fwd"] = jax.jit(
                lambda p, x, t, emb, ids: S.svd_unet_forward(p, x, t, emb, ids),
                static_argnums=())
        return self._jit_cache["fwd"]

    # ---------------- main call ----------------

    def __call__(
        self,
        input_image=None,
        input_video=None,
        mask_frames: List = (),
        mask_frame_ids: List[int] = (),
        min_cfg_scale: float = 1.0,
        max_cfg_scale: float = 3.0,
        denoising_strength: float = 1.0,
        num_frames: int = 25,
        height: int = 576,
        width: int = 1024,
        fps: int = 7,
        motion_bucket_id: int = 127,
        noise_aug_strength: float = 0.02,
        num_inference_steps: int = 20,
        post_normalize: bool = True,
        contrast_enhance_scale: float = 1.2,
        seed: Optional[int] = None,
        progress_bar_cmd=None,
        return_latents: bool = False,
    ):
        div = 64
        height = (height + div - 1) // div * div
        width = (width + div - 1) // div * div
        self.scheduler.set_timesteps(num_inference_steps,
                                     denoising_strength=denoising_strength)

        noise = jnp.asarray(generate_noise(
            (num_frames, 4, height // 8, width // 8), seed=seed), self.dtype)
        if denoising_strength == 1.0:
            latents = noise
        else:
            latents = jnp.asarray(self.scheduler.add_noise(
                np.asarray(self.encode_video_with_vae(input_video, height, width),
                           np.float32),
                np.asarray(noise, np.float32),
                self.scheduler.timesteps[0]), self.dtype)

        mask_latents = None
        if len(mask_frames) > 0:
            mask_latents = self.encode_video_with_vae(mask_frames, height, width)

        clip_posi = self.encode_image_with_clip(input_image, height, width)
        clip_posi = clip_posi[:, None] if clip_posi.ndim == 2 else clip_posi
        clip_nega = jnp.zeros_like(clip_posi)
        vae_cond = self.encode_image_with_vae(input_image, noise_aug_strength,
                                              height, width, seed=seed)
        vae_posi = jnp.tile(vae_cond, (num_frames, 1, 1, 1))
        vae_nega = jnp.zeros_like(vae_posi)

        cfg_scales = jnp.linspace(min_cfg_scale, max_cfg_scale,
                                  num_frames).reshape(num_frames, 1, 1, 1)
        add_time_id = np.asarray([fps - 1, motion_bucket_id,
                                  noise_aug_strength], np.float32)

        fwd = self._fwd()
        steps = range(len(self.scheduler.timesteps))
        if progress_bar_cmd is not None:
            steps = progress_bar_cmd(steps)
        for i in steps:
            t_host = float(self.scheduler.timesteps[i])
            if mask_latents is not None:
                lat_np = np.array(latents, np.float32)  # writable copy
                for fid, mid in enumerate(mask_frame_ids):
                    lat_np[mid] = self.scheduler.add_noise(
                        np.asarray(mask_latents[fid], np.float32),
                        np.asarray(noise[mid], np.float32), t_host)
                latents = jnp.asarray(lat_np, self.dtype)
            v_posi = fwd(self.unet_params,
                         jnp.concatenate([latents, vae_posi], axis=1),
                         t_host, clip_posi, add_time_id)
            v_nega = fwd(self.unet_params,
                         jnp.concatenate([latents, vae_nega], axis=1),
                         t_host, clip_nega, add_time_id)
            v = v_nega + cfg_scales.astype(jnp.float32) * (
                v_posi.astype(jnp.float32) - v_nega.astype(jnp.float32))
            latents = jnp.asarray(self.scheduler.step(
                np.asarray(v, np.float32), t_host,
                np.asarray(latents, np.float32)), self.dtype)

        # post-processing (svd_video.py:103-108)
        lat = np.asarray(latents, np.float32)
        if post_normalize:
            mean, std = lat.mean(), lat.std()
            lat = ((lat - lat.mean(axis=(1, 2, 3), keepdims=True))
                   / lat.std(axis=(1, 2, 3), keepdims=True) * std + mean)
        lat = lat * contrast_enhance_scale
        latents = jnp.asarray(lat, self.dtype)
        if return_latents:
            return latents

        video = S.svd_vae_decode(self.vae_decoder_params,
                                 jnp.asarray(latents, jnp.float32)
                                 .transpose(1, 0, 2, 3))
        arr = np.asarray(video, np.float32).transpose(1, 2, 3, 0)
        arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
        from PIL import Image
        return [Image.fromarray(f) for f in arr]
