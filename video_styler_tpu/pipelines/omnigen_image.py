"""OmnigenImagePipeline: multimodal instruction -> image, TPU-native.

Re-design of the reference OmnigenImagePipeline
(/root/reference/diffsynth/pipelines/omnigen_image.py:122-289): inverse-time
flow matching (sigma 0->1 as t goes 1->0 over a single train timestep),
three-branch separate CFG (cond / uncond / image-cond) with
    pred = uncond + img_cfg*(img_cond - uncond) + cfg*(cond - img_cond),
SDXL VAE latents. The reference's KV cache is a CUDA VRAM trick; each branch
here is one fused jitted forward.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import omnigen as O
from ..models.omnigen import OmniGenConfig, OMNIGEN
from ..prompters.omnigen_prompter import OmniGenPrompter, crop_arr_size
from ..schedulers import FlowMatchScheduler
from .wan_video import generate_noise


class OmnigenImagePipeline:
    """Public API mirrors the reference __call__ (omnigen_image.py:198-289)."""

    def __init__(self, dtype=jnp.bfloat16):
        self.dtype = dtype
        self.scheduler = FlowMatchScheduler(
            num_train_timesteps=1, shift=1, inverse_timesteps=True,
            sigma_min=0, sigma_max=1)
        self.transformer_params = None
        self.cfg: OmniGenConfig = OMNIGEN
        self.su_factor = O.PHI3_SU_SHORT
        self.vae_encoder_params = None
        self.vae_decoder_params = None
        self.prompter = OmniGenPrompter()
        self._jit_cache = {}

    @classmethod
    def from_pretrained(cls, transformer_path=None, vae_path=None,
                        tokenizer_path=None, dtype=jnp.bfloat16):
        from ..utils import ckpt as K
        pipe = cls(dtype=dtype)
        if transformer_path:
            pipe.transformer_params = O.convert_omnigen(
                K.load_state_dict(transformer_path), pipe.cfg, dtype=dtype)
        if vae_path:
            from ..models.sdxl import convert_sdxl_module
            pipe.vae_encoder_params = convert_sdxl_module(
                K.load_state_dict(vae_path), jnp.float32)
            pipe.vae_decoder_params = pipe.vae_encoder_params
        if tokenizer_path:
            pipe.prompter.fetch_tokenizer(tokenizer_path)
        return pipe

    def encode_image(self, image_np):
        from ..models import sd as SD
        return SD.sd_vae_encoder_forward(
            self.vae_encoder_params,
            jnp.asarray(image_np, jnp.float32)).astype(self.dtype)

    def decode_image(self, latents):
        from ..models import sd as SD
        return SD.sd_vae_decoder_forward(self.vae_decoder_params,
                                         jnp.asarray(latents, jnp.float32))

    def _fwd(self, key):
        if key not in self._jit_cache:
            cfg = self.cfg

            def f(params, x, t, ids, ref_latents, image_sizes, mask, cos,
                  sin):
                return O.omnigen_forward(params, cfg, x, t, ids, ref_latents,
                                         image_sizes, mask, cos=cos, sin=sin)
            self._jit_cache[key] = jax.jit(f, static_argnums=(5,))
        return self._jit_cache[key]

    def __call__(
        self,
        prompt: str,
        reference_images: Optional[List] = None,
        cfg_scale: float = 2.0,
        image_cfg_scale: float = 2.0,
        input_image=None,
        denoising_strength: float = 1.0,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 20,
        seed: Optional[int] = None,
        progress_bar_cmd=None,
        return_latents: bool = False,
    ):
        from .wan_video import _preprocess_images
        div = 16
        height = (height + div - 1) // div * div
        width = (width + div - 1) // div * div
        self.scheduler.set_timesteps(num_inference_steps,
                                     denoising_strength=denoising_strength)

        noise = jnp.asarray(generate_noise((1, 4, height // 8, width // 8),
                                           seed=seed), self.dtype)
        if input_image is not None:
            img = _preprocess_images(
                [input_image.resize((width, height))])[:, :, 0]
            z = self.encode_image(img)
            latents = jnp.asarray(self.scheduler.add_noise(
                np.asarray(z, np.float32), np.asarray(noise, np.float32),
                self.scheduler.timesteps[0]), self.dtype)
        else:
            latents = noise

        # reference images: crop_arr sizing, VAE encode, token splicing
        reference_images = reference_images or []
        ref_latents, ref_sizes_hw = [], []
        for im in reference_images:
            w, h = crop_arr_size(im.width, im.height, 1024)
            arr = _preprocess_images([im.resize((w, h))])[:, :, 0]
            ref_latents.append(self.encode_image(arr))
            ref_sizes_hw.append((h, w))

        branches = self.prompter(prompt, ref_sizes_hw, height, width,
                                 use_img_cfg=bool(reference_images))
        use_img_cfg = len(branches) == 3
        for br in branches:
            br["cos"], br["sin"] = O.longrope_tables(
                self.cfg, br["position_ids"], self.su_factor)

        steps = range(len(self.scheduler.timesteps))
        if progress_bar_cmd is not None:
            steps = progress_bar_cmd(steps)
        for i in steps:
            t_host = float(self.scheduler.timesteps[i])
            t = jnp.asarray([t_host], jnp.float32)
            preds = []
            for bi, br in enumerate(branches):
                sizes = tuple((b, tuple(map(tuple, s)))
                              for b, s in br["image_sizes"].items())
                fwd = self._fwd((bi, br["input_ids"].shape, sizes))
                refs = ref_latents if (bi != 1 and ref_latents) else []
                preds.append(fwd(
                    self.transformer_params, latents, t,
                    jnp.asarray(br["input_ids"]), refs,
                    sizes, jnp.asarray(br["attention_mask"]),
                    jnp.asarray(br["cos"]), jnp.asarray(br["sin"])))
            if use_img_cfg:
                cond, uncond, img_cond = preds
                pred = (uncond + image_cfg_scale * (img_cond - uncond)
                        + cfg_scale * (cond - img_cond))
            else:
                cond, uncond = preds
                pred = uncond + cfg_scale * (cond - uncond)
            latents = jnp.asarray(self.scheduler.step(
                np.asarray(pred, np.float32), t_host,
                np.asarray(latents, np.float32)), self.dtype)

        if return_latents:
            return latents
        image = self.decode_image(latents)
        from .flux_image import FluxImagePipeline
        return FluxImagePipeline.vae_output_to_image(image)
