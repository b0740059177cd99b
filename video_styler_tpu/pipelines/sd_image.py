"""SDImagePipeline: SD-1.5 text-to-image / image-to-image.

Port surface of /root/reference/diffsynth/pipelines/sd_image.py:14-140:
EnhancedDDIM sampling, CLIP text encoding with clip_skip, 4-channel 512x512
latents, img2img via add_noise, CFG. ControlNet/IP-Adapter units are later
rounds. The CLIP tokenizer loads from a user-supplied path (transformers),
with a whitespace fallback for smoke runs.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import sd as SD
from ..schedulers import EnhancedDDIMScheduler
from .wan_video import generate_noise


def _gaussian_blur_mask(mask: np.ndarray, ksize: int = 33,
                        sigma: float = 10.0) -> np.ndarray:
    """Separable gaussian with reflect padding (torchvision GaussianBlur
    semantics used by BasePipeline.merge_latents, base.py:51-63)."""
    r = ksize // 2
    xs = np.arange(-r, r + 1, dtype=np.float32)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k /= k.sum()
    p = np.pad(mask, ((r, r), (0, 0)), mode="reflect")
    m = np.stack([np.convolve(p[:, j], k, mode="valid")
                  for j in range(p.shape[1])], axis=1)
    p = np.pad(m, ((0, 0), (r, r)), mode="reflect")
    return np.stack([np.convolve(p[i], k, mode="valid")
                     for i in range(p.shape[0])], axis=0)


def merge_local_predictions(value, locals_, masks, scales,
                            height: int, width: int):
    """BasePipeline.merge_latents (base.py:51-63): blurred binary masks
    weight the per-region predictions into the global one. Host numpy —
    tiny latents, runs between jitted UNet calls."""
    value = np.asarray(value, np.float32)
    weight = np.ones_like(value)
    for latent, mask, scale in zip(locals_, masks, scales):
        m = np.asarray(mask.resize((width, height)).convert("L"),
                       np.float32)
        m = (m / 255.0 > 0.5).astype(np.float32)
        m = _gaussian_blur_mask(m)[None, None]
        m = np.broadcast_to(m, value.shape).copy()
        value = value + np.asarray(latent, np.float32) * m * scale
        weight = weight + m * scale
    return value / weight


class SDImagePipeline:

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype
        self.scheduler = EnhancedDDIMScheduler()
        self.text_encoder_params = None
        self.unet_params = None
        self.vae_encoder_params = None
        self.vae_decoder_params = None
        self.tokenizer = None
        self.num_text_layers = 12
        self._jit = {}
        self.image_encoder_params = None

    @classmethod
    def from_state_dicts(cls, unet_sd=None, text_encoder_sd=None,
                         vae_encoder_sd=None, vae_decoder_sd=None,
                         tokenizer_path: Optional[str] = None,
                         dtype=jnp.float32):
        pipe = cls(dtype=dtype)
        if unet_sd is not None:
            pipe.unet_params = SD.convert_sd_module(unet_sd, dtype)
        if text_encoder_sd is not None:
            pipe.text_encoder_params = SD.convert_sd_module(text_encoder_sd, dtype)
        if vae_encoder_sd is not None:
            pipe.vae_encoder_params = SD.convert_sd_module(vae_encoder_sd, dtype)
        if vae_decoder_sd is not None:
            pipe.vae_decoder_params = SD.convert_sd_module(vae_decoder_sd, dtype)
        if tokenizer_path:
            from transformers import CLIPTokenizer
            pipe.tokenizer = CLIPTokenizer.from_pretrained(tokenizer_path)
        return pipe

    @classmethod
    def from_civitai_file(cls, path: str, tokenizer_path: Optional[str] = None,
                          dtype=jnp.float32):
        """Load a civitai single-file SD-1.5 checkpoint (the reference
        ModelManager path) via the algorithmic LDM-name converters."""
        from ..utils.ckpt import load_state_dict
        from ..utils.sd_civitai import convert_sd_civitai
        parts = convert_sd_civitai(load_state_dict(path))
        return cls.from_state_dicts(
            unet_sd=parts["unet"], text_encoder_sd=parts["text_encoder"],
            vae_encoder_sd=parts["vae_encoder"],
            vae_decoder_sd=parts["vae_decoder"],
            tokenizer_path=tokenizer_path, dtype=dtype)

    def load_textual_inversions(self, paths=None, state_dicts=None):
        """SDPrompter.load_textual_inversions analog
        (prompters/sd_prompter.py:48-61 + models/utils.py:91-98): every
        768-wide 2-D tensor in the file becomes extra token-embedding rows;
        the file's basename becomes a prompt keyword expanding to those
        tokens."""
        import os as _os
        from ..utils.ckpt import load_state_dict

        def search(node, out):
            if isinstance(node, dict):
                for v in node.values():
                    search(v, out)
            else:
                arr = np.asarray(node.detach().float().cpu()
                                 if hasattr(node, "detach") else node)
                if arr.ndim == 2 and arr.shape[1] == 768:
                    out.append(arr.astype(np.float32))

        self._ti_keywords = getattr(self, "_ti_keywords", {})
        items = []
        if paths:
            items += [(_os.path.splitext(_os.path.basename(p))[0],
                       load_state_dict(p)) for p in paths]
        if state_dicts:
            items += list(state_dicts.items())
        new_rows = []
        for keyword, sd in items:
            found = []
            search(sd, found)
            for arr in found[:1]:          # one embedding bundle per file
                tokens = [f"{keyword}_{i}" for i in range(arr.shape[0])]
                if self.tokenizer is not None:
                    self.tokenizer.add_tokens(tokens)
                self._ti_keywords[keyword] = " " + " ".join(tokens) + " "
                new_rows.append(arr)
        if new_rows:
            emb = self.text_encoder_params["token_embedding"]["weight"]
            self.text_encoder_params["token_embedding"]["weight"] = \
                jnp.concatenate(
                    [emb] + [jnp.asarray(r, emb.dtype) for r in new_rows],
                    axis=0)

    def _apply_ti_keywords(self, prompt: str) -> str:
        for kw, rep in getattr(self, "_ti_keywords", {}).items():
            if kw in prompt:
                prompt = prompt.replace(kw, rep)
        return prompt

    def encode_prompt(self, prompt: str, clip_skip: int = 1):
        prompt = self._apply_ti_keywords(prompt)
        if self.tokenizer is not None:
            # tokenize_long_prompt (base_prompter.py:6-33): pad to a multiple
            # of 77, encode per 77-token chunk, concatenate on sequence
            try:
                raw = self.tokenizer(prompt, return_tensors="np",
                                     truncation=False)["input_ids"]
                n = max(1, -(-raw.shape[1] // 77))
            except Exception:      # length-capped / stub tokenizers
                n = 1
            enc = self.tokenizer([prompt], padding="max_length",
                                 truncation=True, max_length=n * 77,
                                 return_tensors="np")
            ids = np.asarray(enc["input_ids"], np.int32).reshape(n, 77)
        else:
            n = min(len(prompt.split()) + 2, 77)
            ids = np.zeros((1, 77), np.int32)
            ids[0, :n] = (np.arange(n) + 1) % 49408
        out = SD.sd_text_encoder_forward(
            self.text_encoder_params, jnp.asarray(ids), clip_skip=clip_skip,
            num_layers=self.num_text_layers)
        return out.reshape(1, -1, out.shape[-1])

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
        ipadapter_images=None,
        ipadapter_params=None,
        ipadapter_scale: float = 1.0,
        ipadapter_image_embeds=None,
        height: int = 512,
        width: int = 512,
        num_inference_steps: int = 20,
        seed: Optional[int] = None,
        return_latents: bool = False,
        progress_bar_cmd=None,
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

        # Omost-style prompt extension (BasePipeline.extend_prompt,
        # base.py:79-88): an injected extender may add regional prompts,
        # masks, and 100x mask scales
        local_prompts = list(local_prompts or [])
        masks = list(masks or [])
        mask_scales = list(mask_scales or [])
        if prompt_extender is not None:
            extended = prompt_extender({"prompt": prompt})
            prompt = extended.get("prompt", prompt)
            local_prompts += extended.get("prompts", [])
            masks += extended.get("masks", [])
            mask_scales += [100.0] * len(extended.get("masks", []))

        ctx_posi = self.encode_prompt(prompt, clip_skip)
        ctx_nega = (self.encode_prompt(negative_prompt, clip_skip)
                    if cfg_scale != 1.0 else None)
        ctx_locals = [self.encode_prompt(p, clip_skip) for p in local_prompts]

        # ControlNet conditioning (ControlNet units, sd_image.py:120-137 in
        # the reference): annotate the control image per unit
        conditionings = None
        if controlnet_units and controlnet_image is not None:
            from ..controlnets import MultiControlNetManager
            self._cn_manager = MultiControlNetManager(controlnet_units)
            conditionings = self._cn_manager.process_image(
                controlnet_image, width, height)

        # IP-Adapter (sd_image.py:139-147): precomputed image embeds or a
        # CLIP-H image-encoder pass over ipadapter_images
        ip_posi = ip_nega = None
        if ipadapter_params is not None and (
                ipadapter_images is not None or ipadapter_image_embeds is not None):
            from ..models.ipadapter import ipadapter_kwargs
            if ipadapter_image_embeds is None:
                from ..models.svd import svd_image_encoder_forward
                from ..models.clip_vit import preprocess_clip_image
                from .wan_video import _preprocess_images
                imgs = ipadapter_images if isinstance(ipadapter_images, list) \
                    else [ipadapter_images]
                arr = _preprocess_images([im.resize((224, 224)) for im in imgs])
                pre = preprocess_clip_image(arr[:, :, 0], 224)
                ipadapter_image_embeds = svd_image_encoder_forward(
                    self.image_encoder_params, jnp.asarray(pre, self.dtype))
            ip_posi = ipadapter_kwargs(ipadapter_params,
                                       ipadapter_image_embeds,
                                       scale=ipadapter_scale, xl=False)
            ip_nega = ipadapter_kwargs(ipadapter_params,
                                       jnp.zeros_like(ipadapter_image_embeds),
                                       scale=ipadapter_scale, xl=False)

        if "unet" not in self._jit:
            self._jit["unet"] = jax.jit(SD.sd_unet_forward)
        unet = SD.sd_unet_forward  # hooks carry python structures; jit inside

        steps = range(len(self.scheduler.timesteps))
        if progress_bar_cmd is not None:
            steps = progress_bar_cmd(steps)
        for i in steps:
            t = self.scheduler.timesteps[i]
            tj = jnp.asarray([t], jnp.float32)
            cn_stack = None
            if conditionings is not None:
                cn_stack = self._cn_manager(latents, tj, ctx_posi, conditionings)
            eps_posi = unet(self.unet_params, latents, tj, ctx_posi,
                            controlnet_res_stack=cn_stack,
                            ipadapter_kwargs_list=ip_posi)
            if ctx_locals:
                # local-prompt masked blending (sd_image.py:160-175 +
                # base.py:51-76 in the reference)
                eps_locals = [unet(self.unet_params, latents, tj, c,
                                   controlnet_res_stack=cn_stack,
                                   ipadapter_kwargs_list=ip_posi)
                              for c in ctx_locals]
                eps_posi = jnp.asarray(merge_local_predictions(
                    eps_posi, eps_locals, masks, mask_scales,
                    height // 8, width // 8), self.dtype)
            if cfg_scale != 1.0:
                eps_nega = unet(self.unet_params, latents, tj, ctx_nega,
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
