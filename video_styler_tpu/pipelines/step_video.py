"""StepVideoPipeline: text -> video, TPU-native.

Re-design of the reference StepVideoPipeline
(/root/reference/diffsynth/pipelines/step_video.py:20-210): flow matching
with shift=13 and reversed sigmas over (T_lat, 64, H/16, W/16) latents,
joint Step-LLM (6144-d) + bilingual CLIP (1024-d) text conditioning.

Text conditioning is native: the STEP1 caption LLM is a TPU port
(models/stepvideo_llm.py, reference stepvideo_text_encoder.py:55-521) and
the bilingual CLIP reuses the Hunyuan Chinese CLIP-BERT tower
(models/hunyuan_image_dit.hunyuan_bert_forward). An injectable
`text_encoder` callable remains supported for externally-served towers;
tokenization uses the checkpoint's sentencepiece / BERT tokenizers when
available.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import stepvideo_dit as D
from ..models.stepvideo_dit import StepVideoDiTConfig, STEP_VIDEO
from ..models import stepvideo_vae as V
from ..schedulers import FlowMatchScheduler
from .wan_video import generate_noise


class StepVideoPipeline:
    """Public API mirrors the reference __call__ (step_video.py:151-208)."""

    def __init__(self, dtype=jnp.bfloat16):
        self.dtype = dtype
        self.scheduler = FlowMatchScheduler(
            sigma_min=0.0, extra_one_step=True, shift=13.0,
            reverse_sigmas=True, num_train_timesteps=1)
        self.dit_params = None
        self.dit_cfg: StepVideoDiTConfig = STEP_VIDEO
        self.vae_params = None
        self.vae_cfg = V.STEP_VAE
        self.text_encoder = None   # callable(prompt) -> (llm_emb, clip_emb, mask)
        self._jit_cache = {}

    @classmethod
    def from_pretrained(cls, dit_paths=None, vae_path=None, dtype=jnp.bfloat16):
        from ..utils import ckpt as K
        pipe = cls(dtype=dtype)
        if dit_paths:
            sd = K.load_state_dict_files(
                dit_paths if isinstance(dit_paths, list) else [dit_paths])
            pipe.dit_params = D.convert_step_video_dit(sd, pipe.dit_cfg,
                                                       dtype=dtype)
        if vae_path:
            pipe.vae_params = V.convert_step_vae(K.load_state_dict(vae_path))
        return pipe

    def fetch_text_encoders(self, clip_params=None, clip_tokenizer=None,
                            step1_params=None, step1_cfg=None,
                            step1_tokenize=None, llm_max_length: int = 320,
                            clip_num_heads: int = 16):
        """Build the native text_encoder callable
        (StepVideoPrompter.encode_prompt, prompters/stepvideo_prompter.py:44-57):
        bilingual CLIP-BERT over 77 tokens + STEP1 LLM over 320 tokens; the
        LLM padding mask is left-padded with ones for the CLIP tokens.

        clip_tokenizer: HF BertTokenizer; step1_tokenize:
        callable(prompt, max_length) -> (ids (1, S), mask (1, S)) — the
        StepChat sentencepiece tokenizer served host-side.
        """
        from ..models import stepvideo_llm as L
        from ..models.hunyuan_image_dit import hunyuan_bert_forward
        step1_cfg = step1_cfg or L.STEP1_LLM

        def encode(prompt: str):
            enc = clip_tokenizer([prompt], padding="max_length",
                                 max_length=77, truncation=True,
                                 return_attention_mask=True,
                                 return_tensors="np")
            clip_emb = hunyuan_bert_forward(
                clip_params, jnp.asarray(enc["input_ids"], jnp.int32),
                jnp.asarray(enc["attention_mask"]),
                num_heads=clip_num_heads)
            ids, mask = step1_tokenize(prompt, llm_max_length)
            llm_emb = L.step1_llm_forward(step1_params, step1_cfg,
                                          jnp.asarray(ids, jnp.int32))
            mask = np.pad(np.asarray(mask), ((0, 0), (clip_emb.shape[1], 0)),
                          constant_values=1)
            return (llm_emb.astype(self.dtype), clip_emb.astype(self.dtype),
                    jnp.asarray(mask))

        self.text_encoder = encode
        return self

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 9.0,
        height: int = 544,
        width: int = 992,
        num_frames: int = 204,
        num_inference_steps: int = 30,
        seed: Optional[int] = None,
        progress_bar_cmd=None,
        return_latents: bool = False,
    ):
        self.scheduler.set_timesteps(num_inference_steps)
        t_lat = max(num_frames // 17 * 3, 1)
        latents = jnp.asarray(generate_noise(
            (1, t_lat, 64, height // 16, width // 16), seed=seed), self.dtype)

        posi = self.text_encoder(prompt)
        nega = self.text_encoder(negative_prompt) if cfg_scale != 1.0 else None

        if "fwd" not in self._jit_cache:
            cfg = self.dit_cfg
            self._jit_cache["fwd"] = jax.jit(
                lambda p, x, t, cap, clip, mask: D.step_video_dit_forward(
                    p, cfg, x, t, cap, clip, mask))
        fwd = self._jit_cache["fwd"]

        steps = range(len(self.scheduler.timesteps))
        if progress_bar_cmd is not None:
            steps = progress_bar_cmd(steps)
        for i in steps:
            t_host = float(self.scheduler.timesteps[i])
            t = jnp.asarray([t_host], jnp.float32)
            v = fwd(self.dit_params, latents, t, *posi)
            if nega is not None:
                v_nega = fwd(self.dit_params, latents, t, *nega)
                v = v_nega + cfg_scale * (v - v_nega)
            sigma, sigma_next = self.scheduler.sigma_pair(i)
            latents = (latents.astype(jnp.float32)
                       + v.astype(jnp.float32) * (sigma_next - sigma)).astype(self.dtype)

        if return_latents:
            return latents
        video = V.vae_decode(self.vae_params, jnp.asarray(latents, jnp.float32),
                             self.vae_cfg)
        from .wan_video import WanVideoPipeline
        return WanVideoPipeline.vae_output_to_video(
            np.clip(np.asarray(video, np.float32), -1, 1))
