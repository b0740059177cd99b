"""HunyuanDiTImagePipeline: bilingual text -> image, TPU-native.

Re-design of the reference HunyuanDiTImagePipeline
(/root/reference/diffsynth/pipelines/hunyuan_image.py:125-320): EnhancedDDIM
with v-prediction (beta 0.00085..0.03), CLIP-BERT (Chinese, 77 tokens) + mT5
(256 tokens) dual text conditioning with learned-padding fusion inside the
DiT, SDXL VAE latents, image-meta-size conditioning.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import hunyuan_image_dit as H
from ..models.hunyuan_image_dit import HunyuanImageDiTConfig, HUNYUAN_DIT
from ..schedulers import EnhancedDDIMScheduler
from .wan_video import generate_noise


class HunyuanImagePipeline:
    """Public API mirrors the reference __call__ (hunyuan_image.py:206-290)."""

    def __init__(self, dtype=jnp.bfloat16):
        self.dtype = dtype
        self.scheduler = EnhancedDDIMScheduler(
            prediction_type="v_prediction", beta_start=0.00085, beta_end=0.03)
        self.dit_params = None
        self.dit_cfg: HunyuanImageDiTConfig = HUNYUAN_DIT
        self.vae_encoder_params = None
        self.vae_decoder_params = None
        self.bert_params = None
        self.t5_params = None
        self.t5_cfg = None
        self.tokenizer = None       # BertTokenizer
        self.tokenizer_t5 = None    # mT5 tokenizer
        self._jit_cache = {}

    @classmethod
    def from_pretrained(cls, dit_path=None, vae_path=None, bert_path=None,
                        t5_paths=None, tokenizer_path=None,
                        tokenizer_t5_path=None, dtype=jnp.bfloat16):
        from ..utils import ckpt as K
        pipe = cls(dtype=dtype)
        if dit_path:
            pipe.dit_params = H.convert_hunyuan_image_dit(
                K.load_state_dict(dit_path), pipe.dit_cfg, dtype=dtype)
        if vae_path:
            from ..models.sdxl import convert_sdxl_module
            sd = K.load_state_dict(vae_path)
            pipe.vae_encoder_params = convert_sdxl_module(sd, jnp.float32)
            pipe.vae_decoder_params = pipe.vae_encoder_params
        if bert_path:
            pipe.bert_params = H.convert_hunyuan_bert(
                K.load_state_dict(bert_path), dtype=dtype)
        if t5_paths:
            from ..models.t5 import MT5_XL, convert_hf_t5
            pipe.t5_cfg = MT5_XL
            pipe.t5_params = convert_hf_t5(
                K.load_state_dict_files(t5_paths if isinstance(t5_paths, list)
                                        else [t5_paths]), MT5_XL, dtype=dtype)
        if tokenizer_path:
            from transformers import BertTokenizer
            pipe.tokenizer = BertTokenizer.from_pretrained(tokenizer_path)
        if tokenizer_t5_path:
            from transformers import AutoTokenizer
            pipe.tokenizer_t5 = AutoTokenizer.from_pretrained(
                tokenizer_t5_path)
        return pipe

    def encode_prompt(self, prompt: str, clip_skip: int = 1,
                      clip_skip_2: int = 1):
        """-> dict with text_emb/text_emb_t5/masks (HunyuanDiTPrompter)."""
        cfg = self.dit_cfg
        tok = self.tokenizer(
            [prompt], padding="max_length", truncation=True,
            max_length=cfg.text_length, return_tensors="np")
        text_emb = H.hunyuan_bert_forward(
            self.bert_params, jnp.asarray(tok["input_ids"]),
            jnp.asarray(tok["attention_mask"]), clip_skip=clip_skip)
        tok5 = self.tokenizer_t5(
            [prompt], padding="max_length", truncation=True,
            max_length=cfg.t5_length, return_tensors="np")
        from ..models.t5 import t5_encode
        t5_emb = t5_encode(self.t5_params, self.t5_cfg,
                           jnp.asarray(tok5["input_ids"], jnp.int32))
        return {
            "text_emb": text_emb.astype(self.dtype),
            "text_emb_t5": t5_emb.astype(self.dtype),
            "text_emb_mask": jnp.asarray(tok["attention_mask"], jnp.int32),
            "text_emb_mask_t5": jnp.asarray(tok5["attention_mask"],
                                            jnp.int32),
        }

    def _fwd(self):
        if "fwd" not in self._jit_cache:
            cfg = self.dit_cfg

            def f(params, x, te, te5, m, m5, t, size, cos, sin):
                return H.hunyuan_image_dit_forward(params, cfg, x, te, te5,
                                                   m, m5, t, size, cos, sin)
            self._jit_cache["fwd"] = jax.jit(f)
        return self._jit_cache["fwd"]

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 7.5,
        clip_skip: int = 1,
        clip_skip_2: int = 1,
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
            from ..models import sd as SD
            img = _preprocess_images(
                [input_image.resize((width, height))])[:, :, 0]
            z = SD.sd_vae_encoder_forward(self.vae_encoder_params,
                                          jnp.asarray(img, jnp.float32))
            latents = jnp.asarray(self.scheduler.add_noise(
                np.asarray(z, np.float32), np.asarray(noise, np.float32),
                self.scheduler.timesteps[0]), self.dtype)
        else:
            latents = noise

        posi = self.encode_prompt(prompt, clip_skip, clip_skip_2)
        nega = (self.encode_prompt(negative_prompt, clip_skip, clip_skip_2)
                if cfg_scale != 1.0 else None)

        size = jnp.asarray([[width, height, width, height, 0, 0]],
                           jnp.float32)
        cos, sin = H.hunyuan_image_rope(self.dit_cfg, height // 8, width // 8)
        cos, sin = jnp.asarray(cos), jnp.asarray(sin)
        fwd = self._fwd()

        steps = range(len(self.scheduler.timesteps))
        if progress_bar_cmd is not None:
            steps = progress_bar_cmd(steps)
        for i in steps:
            t = self.scheduler.timesteps[i]
            tj = jnp.asarray([t], jnp.float32)
            pred = fwd(self.dit_params, latents, posi["text_emb"],
                       posi["text_emb_t5"], posi["text_emb_mask"],
                       posi["text_emb_mask_t5"], tj, size, cos, sin)
            if nega is not None:
                pred_n = fwd(self.dit_params, latents, nega["text_emb"],
                             nega["text_emb_t5"], nega["text_emb_mask"],
                             nega["text_emb_mask_t5"], tj, size, cos, sin)
                pred = pred_n + cfg_scale * (pred - pred_n)
            latents = jnp.asarray(self.scheduler.step(
                np.asarray(pred, np.float32), t,
                np.asarray(latents, np.float32)), self.dtype)

        if return_latents:
            return latents
        from ..models import sd as SD
        image = SD.sd_vae_decoder_forward(self.vae_decoder_params,
                                          jnp.asarray(latents, jnp.float32))
        from .flux_image import FluxImagePipeline
        return FluxImagePipeline.vae_output_to_image(image)
