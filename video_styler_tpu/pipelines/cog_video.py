"""CogVideoPipeline: text/video -> video, TPU-native.

Re-design of the reference CogVideoPipeline
(/root/reference/diffsynth/pipelines/cog_video.py:12-140): EnhancedDDIM with
zero-terminal-SNR rescale and v-prediction, T5 text conditioning, v2v via
add_noise, 3-D tiled VAE encode/decode delegated to the chunk-equivalent
full-sequence VAE.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import cog_video as C
from ..models.cog_video import CogDiTConfig, COG_VIDEO_X
from ..schedulers import EnhancedDDIMScheduler
from .wan_video import generate_noise, _preprocess_images


class CogVideoPipeline:
    """Public API mirrors the reference __call__ (cog_video.py:62-140)."""

    def __init__(self, dtype=jnp.bfloat16):
        self.dtype = dtype
        self.scheduler = EnhancedDDIMScheduler(
            rescale_zero_terminal_snr=True, prediction_type="v_prediction")
        self.dit_params = None
        self.dit_cfg: CogDiTConfig = COG_VIDEO_X
        self.vae_encoder_params = None
        self.vae_decoder_params = None
        self.text_encoder = None        # callable(prompt) -> (1, L, 4096)
        self._jit_cache = {}

    @classmethod
    def from_pretrained(cls, dit_paths=None, vae_encoder_path=None,
                        vae_decoder_path=None, dtype=jnp.bfloat16):
        from ..utils import ckpt as K
        pipe = cls(dtype=dtype)
        if dit_paths:
            sd = K.load_state_dict_files(
                dit_paths if isinstance(dit_paths, list) else [dit_paths])
            pipe.dit_params = C.convert_cog_dit(sd, pipe.dit_cfg, dtype=dtype)
        if vae_encoder_path:
            pipe.vae_encoder_params = C.convert_cog_vae(
                K.load_state_dict(vae_encoder_path))
        if vae_decoder_path:
            pipe.vae_decoder_params = C.convert_cog_vae(
                K.load_state_dict(vae_decoder_path))
        return pipe

    def fetch_text_encoder(self, t5_params, t5_cfg, tokenizer_path: str):
        """T5 text conditioning (CogPrompter): our native T5 encoder."""
        from transformers import T5TokenizerFast
        from ..models.t5 import t5_encode
        tok = T5TokenizerFast.from_pretrained(tokenizer_path)

        def encode(prompt: str, length: int = 226):
            ids = tok([prompt], padding="max_length", max_length=length,
                      truncation=True, return_tensors="np")
            return t5_encode(t5_params, t5_cfg,
                             jnp.asarray(ids["input_ids"], jnp.int32)
                             ).astype(self.dtype)

        self.text_encoder = encode

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        input_video=None,
        cfg_scale: float = 7.0,
        denoising_strength: float = 1.0,
        num_frames: int = 49,
        height: int = 480,
        width: int = 720,
        num_inference_steps: int = 20,
        seed: Optional[int] = None,
        progress_bar_cmd=None,
        return_latents: bool = False,
    ):
        div = 16
        height = (height + div - 1) // div * div
        width = (width + div - 1) // div * div
        self.scheduler.set_timesteps(num_inference_steps,
                                     denoising_strength=denoising_strength)

        t_lat = num_frames // 4 + 1
        noise = jnp.asarray(generate_noise(
            (1, 16, t_lat, height // 8, width // 8), seed=seed), self.dtype)
        if denoising_strength == 1.0 or input_video is None:
            latents = noise
        else:
            vid = _preprocess_images(
                [f.resize((width, height)) for f in input_video])
            z = C.cog_vae_encode(self.vae_encoder_params,
                                 jnp.asarray(vid, jnp.float32))
            latents = jnp.asarray(self.scheduler.add_noise(
                np.asarray(z, np.float32), np.asarray(noise, np.float32),
                self.scheduler.timesteps[0]), self.dtype)

        ctx_posi = self.text_encoder(prompt)
        ctx_nega = (self.text_encoder(negative_prompt)
                    if cfg_scale != 1.0 else None)

        if "fwd" not in self._jit_cache:
            cfg = self.dit_cfg
            self._jit_cache["fwd"] = jax.jit(
                lambda p, x, t, c: C.cog_dit_forward(p, cfg, x, t, c))
        fwd = self._jit_cache["fwd"]

        steps = range(len(self.scheduler.timesteps))
        if progress_bar_cmd is not None:
            steps = progress_bar_cmd(steps)
        for i in steps:
            t = self.scheduler.timesteps[i]
            tj = jnp.asarray([t], jnp.float32)
            v_posi = fwd(self.dit_params, latents, tj, ctx_posi)
            if ctx_nega is not None:
                v_nega = fwd(self.dit_params, latents, tj, ctx_nega)
                v = v_nega + cfg_scale * (v_posi - v_nega)
            else:
                v = v_posi
            latents = jnp.asarray(self.scheduler.step(
                np.asarray(v, np.float32), t, np.asarray(latents, np.float32)),
                self.dtype)

        if return_latents:
            return latents
        video = C.cog_vae_decode(self.vae_decoder_params,
                                 jnp.asarray(latents, jnp.float32))
        from .wan_video import WanVideoPipeline
        return WanVideoPipeline.vae_output_to_video(
            np.clip(np.asarray(video, np.float32), -1, 1))
