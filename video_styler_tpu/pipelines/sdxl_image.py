"""SDXLImagePipeline: SDXL text-to-image / image-to-image.

Port surface of /root/reference/diffsynth/pipelines/sdxl_image.py: dual text
encoders (CLIP-L hidden states + bigG hidden states concat, bigG pooled as
add_text_embeds), add_time_id micro-conditioning, EnhancedDDIM sampling.
Shares the SD-1.5 VAE modules (SDXL's VAE differs only in weights/scaling;
pass scaling_factor=0.13025 state dicts when loading real SDXL VAEs).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import sd as SD
from ..models import sdxl as XL
from ..schedulers import EnhancedDDIMScheduler
from .wan_video import generate_noise


class SDXLImagePipeline:

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.scheduler = EnhancedDDIMScheduler()
        self.unet_params = None
        self.te1_params = None
        self.te2_params = None
        self.vae_encoder_params = None
        self.vae_decoder_params = None
        self.tokenizer = None
        self.te1_layers = 11
        self.te2_layers = 32
        # Kolors variant: ChatGLM replaces both CLIP encoders
        # (reference sdxl_image.py:64-67 + kolors_prompter.py:324-345)
        self.kolors_params = None
        self.kolors_cfg = None
        self.kolors_tokenizer = None
        self._jit = {}

    def fetch_kolors_text_encoder(self, params, cfg=None, tokenizer=None):
        from ..models.kolors_text_encoder import CHATGLM3_6B
        self.kolors_params = params
        self.kolors_cfg = cfg or CHATGLM3_6B
        self.kolors_tokenizer = tokenizer

    @classmethod
    def from_state_dicts(cls, unet_sd=None, te1_sd=None, te2_sd=None,
                         vae_encoder_sd=None, vae_decoder_sd=None,
                         tokenizer_path: Optional[str] = None,
                         dtype=jnp.float32):
        pipe = cls(dtype=dtype)
        conv = XL.convert_sdxl_module
        if unet_sd is not None:
            pipe.unet_params = conv(unet_sd, dtype)
        if te1_sd is not None:
            pipe.te1_params = conv(te1_sd, dtype)
        if te2_sd is not None:
            pipe.te2_params = conv(te2_sd, dtype)
        if vae_encoder_sd is not None:
            pipe.vae_encoder_params = conv(vae_encoder_sd, dtype)
        if vae_decoder_sd is not None:
            pipe.vae_decoder_params = conv(vae_decoder_sd, dtype)
        if tokenizer_path:
            from transformers import CLIPTokenizer
            pipe.tokenizer = CLIPTokenizer.from_pretrained(tokenizer_path)
        return pipe

    def _ids(self, prompt: str):
        if self.tokenizer is not None:
            enc = self.tokenizer([prompt], padding="max_length", truncation=True,
                                 max_length=77, return_tensors="np")
            return enc["input_ids"].astype(np.int32)
        n = min(len(prompt.split()) + 2, 77)
        ids = np.zeros((1, 77), np.int32)
        ids[0, :n] = (np.arange(n) + 1) % 100
        return ids

    def encode_prompt(self, prompt: str, clip_skip: int = 1,
                      clip_skip_2: int = 2):
        """-> (context (B, 77, 768+1280... concat to 2048), pooled (B, 1280));
        Kolors: (context (B, 256, 4096), pooled (B, 4096))."""
        if self.kolors_params is not None:
            from ..models.kolors_text_encoder import kolors_encode
            if self.kolors_tokenizer is not None:
                enc = self.kolors_tokenizer([prompt], padding="max_length",
                                            truncation=True, max_length=256,
                                            return_tensors="np")
                ids = enc["input_ids"].astype(np.int32)
                mask = enc["attention_mask"]
            else:
                ids, mask = self._ids(prompt), None
            emb, pooled = kolors_encode(self.kolors_params, self.kolors_cfg,
                                        jnp.asarray(ids), mask,
                                        clip_skip=clip_skip_2)
            return emb.astype(self.dtype), pooled.astype(self.dtype)
        ids = jnp.asarray(self._ids(prompt))
        h1 = XL.sdxl_text_encoder_forward(self.te1_params, ids,
                                          clip_skip=clip_skip,
                                          num_layers=self.te1_layers)
        pooled, h2 = XL.sdxl_text_encoder_2_forward(self.te2_params, ids,
                                                    clip_skip=clip_skip_2,
                                                    num_layers=self.te2_layers)
        ctx = jnp.concatenate([h1, h2], axis=-1)
        return ctx.astype(self.dtype), pooled.astype(self.dtype)

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 7.5,
        clip_skip: int = 1,
        local_prompts=None,
        masks=None,
        mask_scales=None,
        prompt_extender=None,
        input_image=None,
        denoising_strength: float = 1.0,
        controlnet_image=None,
        controlnet_units=None,
        ipadapter_image_embeds=None,
        ipadapter_params=None,
        ipadapter_scale: float = 1.0,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 20,
        seed: Optional[int] = None,
        return_latents: bool = False,
    ):
        self.scheduler.set_timesteps(num_inference_steps,
                                     denoising_strength=denoising_strength)
        noise = jnp.asarray(
            generate_noise((1, 4, height // 8, width // 8), seed=seed), self.dtype)
        if input_image is not None:
            img = np.asarray(input_image.resize((width, height)), np.float32)
            img = (img / 127.5 - 1.0).transpose(2, 0, 1)[None]
            lat = SD.sd_vae_encoder_forward(self.vae_encoder_params,
                                            jnp.asarray(img, self.dtype))
            latents = jnp.asarray(self.scheduler.add_noise(
                np.asarray(lat, np.float32), np.asarray(noise, np.float32),
                self.scheduler.timesteps[0]), self.dtype)
        else:
            latents = noise

        # Omost-style prompt extension + regional prompts
        # (reference sdxl_image.py:115-116,160,200 + base.py:51-88)
        local_prompts = list(local_prompts or [])
        masks = list(masks or [])
        mask_scales = list(mask_scales or [])
        if prompt_extender is not None:
            extended = prompt_extender({"prompt": prompt})
            prompt = extended.get("prompt", prompt)
            local_prompts += extended.get("prompts", [])
            masks += extended.get("masks", [])
            mask_scales += [100.0] * len(extended.get("masks", []))

        ctx_posi, pooled_posi = self.encode_prompt(prompt, clip_skip)
        if cfg_scale != 1.0:
            ctx_nega, pooled_nega = self.encode_prompt(negative_prompt, clip_skip)
        ctx_locals = [self.encode_prompt(p, clip_skip) for p in local_prompts]
        add_time_id = jnp.asarray([height, width, 0, 0, height, width],
                                  jnp.float32)

        # ControlNet + IP-Adapter wiring (lets_dance_xl hooks)
        conditionings = None
        cn_manager = None
        if controlnet_units and controlnet_image is not None:
            from ..controlnets import MultiControlNetManager
            cn_manager = MultiControlNetManager(controlnet_units)
            conditionings = cn_manager.process_image(controlnet_image,
                                                     width, height)
        ip_posi = ip_nega = None
        if ipadapter_params is not None and ipadapter_image_embeds is not None:
            from ..models.ipadapter import ipadapter_kwargs
            ip_posi = ipadapter_kwargs(ipadapter_params,
                                       ipadapter_image_embeds,
                                       scale=ipadapter_scale, xl=True)
            ip_nega = ipadapter_kwargs(ipadapter_params,
                                       jnp.zeros_like(ipadapter_image_embeds),
                                       scale=ipadapter_scale, xl=True)

        unet = XL.sdxl_unet_forward

        for i in range(len(self.scheduler.timesteps)):
            t = self.scheduler.timesteps[i]
            tj = jnp.asarray([t], jnp.float32)
            cn_stack = None
            if conditionings is not None:
                cn_stack = cn_manager(latents, tj, ctx_posi, conditionings,
                                      add_time_id=add_time_id,
                                      add_text_embeds=pooled_posi)
            eps_posi = unet(self.unet_params, latents, tj, ctx_posi,
                            add_time_id, pooled_posi,
                            controlnet_res_stack=cn_stack,
                            ipadapter_kwargs_list=ip_posi)
            if ctx_locals:
                from .sd_image import merge_local_predictions
                eps_locals = [unet(self.unet_params, latents, tj, c,
                                   add_time_id, pl,
                                   controlnet_res_stack=cn_stack,
                                   ipadapter_kwargs_list=ip_posi)
                              for c, pl in ctx_locals]
                eps_posi = jnp.asarray(merge_local_predictions(
                    eps_posi, eps_locals, masks, mask_scales,
                    height // 8, width // 8), self.dtype)
            if cfg_scale != 1.0:
                eps_nega = unet(self.unet_params, latents, tj, ctx_nega,
                                add_time_id, pooled_nega,
                                controlnet_res_stack=cn_stack,
                                ipadapter_kwargs_list=ip_nega)
                eps = eps_nega + cfg_scale * (eps_posi - eps_nega)
            else:
                eps = eps_posi
            latents = jnp.asarray(self.scheduler.step(
                np.asarray(eps, np.float32), t, np.asarray(latents, np.float32)),
                self.dtype)

        if return_latents:
            return latents
        image = SD.sd_vae_decoder_forward(self.vae_decoder_params, latents)
        arr = np.asarray(image[0], np.float32).transpose(1, 2, 0)
        arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
        from PIL import Image
        return Image.fromarray(arr)
