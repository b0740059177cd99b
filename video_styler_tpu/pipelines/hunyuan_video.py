"""HunyuanVideoPipeline: text/video/image -> video, TPU-native.

Re-design of the reference HunyuanVideoPipeline
(/root/reference/diffsynth/pipelines/hunyuan_video.py:15-245): flow-matching
denoise (shift=7) with embedded guidance, v2v via add_noise, i2v via
first-frame latent pinning (+ i2v_stability noise mix), TeaCache step
skipping, and 3-D tiled VAE decode.

Text conditioning: CLIP-L pooled (our sd3_text_encoder) + LLaMA sequence
features. The LLaMA tower is served through `transformers` (LlamaModel) when
`llm_params` are attached via `fetch_llm`, mirroring the reference's vendored
HunyuanVideoLLMEncoder; tests inject embeddings directly.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import hunyuan_video_dit as D
from ..models.hunyuan_video_dit import HunyuanVideoDiTConfig, HUNYUAN_VIDEO
from ..models import hunyuan_video_vae as V
from ..schedulers import FlowMatchScheduler
from .wan_video import generate_noise, _preprocess_images


class HunyuanTeaCache:
    """TeaCache (pipelines/hunyuan_video.py:252-294): poly(4) rescale of the
    block-0 component_a modulated input's relative L1."""

    COEFFS = [7.33226126e+02, -4.01131952e+02, 6.75869174e+01,
              -3.14987800e+00, 9.61237896e-02]

    def __init__(self, num_inference_steps: int, rel_l1_thresh: float):
        self.num_inference_steps = num_inference_steps
        self.rel_l1_thresh = rel_l1_thresh
        self.step = 0
        self.accumulated = 0.0
        self.previous_modulated = None
        self.previous_residual = None

    def check(self, modulated) -> bool:
        modulated = np.asarray(modulated, np.float32)
        if self.step == 0 or self.step == self.num_inference_steps - 1:
            should_calc = True
            self.accumulated = 0.0
        else:
            rel = float(np.abs(modulated - self.previous_modulated).mean()
                        / np.abs(self.previous_modulated).mean())
            self.accumulated += float(np.polyval(self.COEFFS, rel))
            should_calc = self.accumulated >= self.rel_l1_thresh
            if should_calc:
                self.accumulated = 0.0
        self.previous_modulated = modulated
        self.step = (self.step + 1) % self.num_inference_steps
        return not should_calc

    def store(self, residual):
        self.previous_residual = residual


class HunyuanVideoPipeline:
    """Public API mirrors the reference __call__ (hunyuan_video.py:133-245)."""

    def __init__(self, dtype=jnp.bfloat16):
        self.dtype = dtype
        self.scheduler = FlowMatchScheduler(shift=7.0, sigma_min=0.0,
                                            extra_one_step=True)
        self.dit_params = None
        self.dit_cfg: HunyuanVideoDiTConfig = HUNYUAN_VIDEO
        self.vae_encoder_params = None
        self.vae_decoder_params = None
        self.vae_cfg = V.HUNYUAN_VAE
        self.clip_params = None         # SD3TextEncoder1 (pooled)
        self.llm = None                 # callable(prompt) -> (emb, mask)
        self.clip_tokenizer = None
        self._jit_cache = {}

    @classmethod
    def from_pretrained(cls, dit_path=None, vae_encoder_path=None,
                        vae_decoder_path=None, clip_path=None,
                        clip_tokenizer_path=None, dtype=jnp.bfloat16):
        from ..utils import ckpt as C
        pipe = cls(dtype=dtype)
        if dit_path:
            pipe.dit_params = D.convert_hunyuan_video_dit(
                C.load_state_dict(dit_path), pipe.dit_cfg, dtype=dtype)
        if vae_encoder_path:
            pipe.vae_encoder_params = V.convert_hunyuan_vae(
                C.load_state_dict(vae_encoder_path))
        if vae_decoder_path:
            pipe.vae_decoder_params = V.convert_hunyuan_vae(
                C.load_state_dict(vae_decoder_path))
        if clip_path:
            from ..models.sd3_text_encoder import convert_sd3_text_encoder_1
            pipe.clip_params = convert_sd3_text_encoder_1(
                C.load_state_dict(clip_path), dtype=dtype)
        if clip_tokenizer_path:
            from transformers import CLIPTokenizer
            pipe.clip_tokenizer = CLIPTokenizer.from_pretrained(
                clip_tokenizer_path)
        return pipe

    def fetch_llm(self, model_path: str, tokenizer_path: str,
                  template: Optional[str] = None, backend: str = "native"):
        """LLaMA text tower (the reference's HunyuanVideoLLMEncoder,
        hunyuan_video_text_encoder.py:6-49; prompt template with
        crop_start=95 from hunyuan_video_prompter.py:47).

        backend="native" (default) runs the TPU-native decoder
        (models/llm_decoder.py) with the reference's exact
        hidden_state_skip_layer=2 semantics — layers [0..n-3], no final
        norm. backend="transformers" keeps the host-torch fallback."""
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(tokenizer_path)
        if template is None:
            template = (
                "<|start_header_id|>system<|end_header_id|>\n\nDescribe the "
                "video by detailing the following aspects: 1. The main "
                "content and theme of the video. 2. The color, shape, size, "
                "texture, quantity, text, and spatial relationships of the "
                "objects. 3. Actions, events, behaviors temporal "
                "relationships, physical movement changes of the objects. 4. "
                "background environment, light, style and atmosphere. 5. "
                "camera angles, movements, and transitions used in the "
                "video.<|eot_id|><|start_header_id|>user<|end_header_id|>"
                "\n\n{}<|eot_id|>")
        crop_start = 95

        if backend == "native":
            import jax
            from ..models.llm_decoder import (
                convert_decoder_lm, decoder_lm_forward,
                detect_decoder_lm_config)
            from ..utils import ckpt as C
            sd = C.load_state_dict_files(
                model_path if isinstance(model_path, list) else [model_path])
            cfg = detect_decoder_lm_config(sd, family="llama")
            params = convert_decoder_lm(sd, cfg, dtype=self.dtype)
            fwd = jax.jit(lambda p, i, m: decoder_lm_forward(
                p, cfg, i, m, stop_skip_layers=2, final_norm=False))

            def encode(prompt: str, max_length: int = 256):
                text = template.format(prompt)
                ids = tok(text, return_tensors="np", padding="max_length",
                          max_length=max_length + crop_start, truncation=True)
                hidden = fwd(params, jnp.asarray(ids["input_ids"]),
                             jnp.asarray(ids["attention_mask"]))
                emb = hidden[:, crop_start:].astype(self.dtype)
                mask = ids["attention_mask"][:, crop_start:]
                return emb, jnp.asarray(mask, jnp.int32)

            self.llm = encode
            return

        import torch
        from transformers import LlamaModel
        model = LlamaModel.from_pretrained(model_path,
                                           torch_dtype=torch.float16).eval()

        def encode(prompt: str, max_length: int = 256):
            text = template.format(prompt)
            ids = tok(text, return_tensors="pt", padding="max_length",
                      max_length=max_length + crop_start, truncation=True)
            with torch.no_grad():
                out = model(input_ids=ids["input_ids"],
                            attention_mask=ids["attention_mask"])
            emb = out.last_hidden_state[:, crop_start:].float().numpy()
            mask = ids["attention_mask"][:, crop_start:].numpy()
            return (jnp.asarray(emb, self.dtype), jnp.asarray(mask, jnp.int32))

        self.llm = encode

    def encode_prompt(self, prompt: str):
        """-> (prompt_emb, text_mask, pooled)."""
        emb, mask = self.llm(prompt)
        from ..models.sd3_text_encoder import sd3_text_encoder_1_forward
        out = self.clip_tokenizer([prompt], padding="max_length",
                                  max_length=77, truncation=True,
                                  return_tensors="np")
        pooled, _ = sd3_text_encoder_1_forward(
            self.clip_params, jnp.asarray(out["input_ids"], jnp.int32))
        return emb, mask, pooled.astype(self.dtype)

    def encode_video(self, video_np, tile_size=(17, 30, 30),
                     tile_stride=(12, 20, 20)):
        ts = ((tile_size[0] - 1) * 4 + 1, tile_size[1] * 8, tile_size[2] * 8)
        st = (tile_stride[0] * 4, tile_stride[1] * 8, tile_stride[2] * 8)
        z = V.tiled_encode(self.vae_encoder_params,
                           jnp.asarray(video_np, jnp.float32), self.vae_cfg,
                           tile_size=ts, tile_stride=st)
        return z.astype(self.dtype)

    def decode_video(self, latents, tile_size=(17, 30, 30),
                     tile_stride=(12, 20, 20)):
        return V.tiled_decode(self.vae_decoder_params,
                              jnp.asarray(latents, jnp.float32), self.vae_cfg,
                              tile_size=(tile_size[0], tile_size[1] * 8 // 8,
                                         tile_size[2]),
                              tile_stride=tile_stride)

    def _model_fns(self):
        if "fns" in self._jit_cache:
            return self._jit_cache["fns"]
        cfg = self.dit_cfg

        def full(params, lat, t, emb, mask, pooled, guidance):
            img, txt, vec, cos, sin, grid = D.hunyuan_embed(
                params, cfg, lat, t, emb, mask, pooled, guidance)
            modulated = D.hunyuan_modulated_input(params, cfg, img, vec)
            h = D.hunyuan_trunk(params, cfg, img, txt, vec, cos, sin)
            residual = h - img
            return D.hunyuan_head(params, cfg, h, vec, grid), residual, modulated

        def skip(params, lat, t, emb, mask, pooled, guidance, residual):
            img, txt, vec, cos, sin, grid = D.hunyuan_embed(
                params, cfg, lat, t, emb, mask, pooled, guidance)
            return D.hunyuan_head(params, cfg, img + residual, vec, grid)

        def modulated_only(params, lat, t, emb, mask, pooled, guidance):
            img, _, vec, _, _, _ = D.hunyuan_embed(
                params, cfg, lat, t, emb, mask, pooled, guidance)
            return D.hunyuan_modulated_input(params, cfg, img, vec)

        fns = (jax.jit(full), jax.jit(skip), jax.jit(modulated_only))
        self._jit_cache["fns"] = fns
        return fns

    def _branch(self, lat, t, cond, guidance, tea_cache):
        emb, mask, pooled = cond
        full, skip, modulated_only = self._model_fns()
        args = (self.dit_params, lat, t, emb, mask, pooled, guidance)
        if tea_cache is not None:
            mod = modulated_only(*args)
            if tea_cache.check(mod) and tea_cache.previous_residual is not None:
                return skip(*args, tea_cache.previous_residual)
        v, residual, _ = full(*args)
        if tea_cache is not None:
            tea_cache.store(residual)
        return v

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        input_video=None,
        input_images=None,
        i2v_stability: bool = True,
        denoising_strength: float = 1.0,
        seed: Optional[int] = None,
        height: int = 720,
        width: int = 1280,
        num_frames: int = 129,
        embedded_guidance: float = 6.0,
        cfg_scale: float = 1.0,
        num_inference_steps: int = 30,
        tea_cache_l1_thresh: Optional[float] = None,
        tile_size=(17, 30, 30),
        tile_stride=(12, 20, 20),
        progress_bar_cmd=None,
        return_latents: bool = False,
    ):
        self.scheduler.set_timesteps(num_inference_steps,
                                     denoising_strength=denoising_strength)
        kw = dict(tile_size=tile_size, tile_stride=tile_stride)
        t_lat = (num_frames - 1) // 4 + 1
        noise = jnp.asarray(generate_noise(
            (1, 16, t_lat, height // 8, width // 8), seed=seed), self.dtype)

        image_latents = None
        if input_images is not None:
            img_np = _preprocess_images(
                [input_images[0].resize((width, height))])
            image_latents = V.vae_encode(
                self.vae_encoder_params, jnp.asarray(img_np, jnp.float32),
                self.vae_cfg).astype(self.dtype)

        if input_video is not None:
            vid = _preprocess_images(input_video)
            latents = jnp.asarray(self.scheduler.add_noise(
                np.asarray(self.encode_video(vid, **kw), np.float32),
                np.asarray(noise, np.float32),
                self.scheduler.timesteps[0]), self.dtype)
        elif image_latents is not None and i2v_stability:
            # i2v stability mix (hunyuan_video.py:179-183)
            t_mix = 0.999
            latents = (noise * t_mix
                       + jnp.tile(image_latents, (1, 1, t_lat, 1, 1))
                       * (1 - t_mix)).astype(self.dtype)
        else:
            latents = noise

        posi = self.encode_prompt(prompt)
        nega = self.encode_prompt(negative_prompt) if cfg_scale != 1.0 else None
        guidance = jnp.asarray([embedded_guidance], jnp.float32)

        tea_cache = None
        if tea_cache_l1_thresh is not None:
            tea_cache = HunyuanTeaCache(num_inference_steps,
                                        tea_cache_l1_thresh)

        steps = range(len(self.scheduler.timesteps))
        if progress_bar_cmd is not None:
            steps = progress_bar_cmd(steps)
        for i in steps:
            t = jnp.asarray([float(self.scheduler.timesteps[i])], jnp.float32)
            if image_latents is not None:
                latents = jnp.concatenate(
                    [image_latents, latents[:, :, 1:]], axis=2)
            v = self._branch(latents, t, posi, guidance, tea_cache)
            if cfg_scale != 1.0:
                v_nega = self._branch(latents, t, nega, guidance, None)
                v = v_nega + cfg_scale * (v - v_nega)
            sigma, sigma_next = self.scheduler.sigma_pair(i)
            if image_latents is not None:
                tail = (latents[:, :, 1:].astype(jnp.float32)
                        + v[:, :, 1:].astype(jnp.float32)
                        * (sigma_next - sigma)).astype(self.dtype)
                latents = jnp.concatenate([image_latents, tail], axis=2)
            else:
                latents = (latents.astype(jnp.float32)
                           + v.astype(jnp.float32)
                           * (sigma_next - sigma)).astype(self.dtype)

        if return_latents:
            return latents
        video = self.decode_video(latents, tile_size=tile_size,
                                  tile_stride=tile_stride)
        from .wan_video import WanVideoPipeline
        return WanVideoPipeline.vae_output_to_video(np.clip(
            np.asarray(video, np.float32), -1, 1))
