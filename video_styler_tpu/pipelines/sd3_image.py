"""SD3ImagePipeline: text/image -> image, TPU-native.

Re-design of the reference SD3ImagePipeline
(/root/reference/diffsynth/pipelines/sd3_image.py:10-147): flow-matching
denoise over 16-channel latents with triple-text-encoder conditioning and
classic CFG; img2img via add_noise; local-prompt masked blending like the
SD pipeline.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import sd3_dit as D
from ..models.sd3_dit import SD3DiTConfig, SD3_MEDIUM
from ..models import sd3_vae as V
from ..schedulers import FlowMatchScheduler
from ..prompters.sd3_prompter import SD3Prompter
from .wan_video import generate_noise, _preprocess_images


class SD3ImagePipeline:
    """Public API mirrors the reference __call__ (sd3_image.py:75-147)."""

    def __init__(self, dtype=jnp.bfloat16):
        self.dtype = dtype
        self.scheduler = FlowMatchScheduler(shift=3.0)
        self.prompter = SD3Prompter()
        self.dit_params = None
        self.dit_cfg: SD3DiTConfig = SD3_MEDIUM
        self.vae_encoder_params = None
        self.vae_decoder_params = None
        self.vae_cfg = V.SD3_VAE
        self._jit_cache = {}

    @classmethod
    def from_pretrained(cls, dit_path=None, vae_path=None, dtype=jnp.bfloat16):
        from ..utils import ckpt as C
        pipe = cls(dtype=dtype)
        if dit_path:
            sd = C.load_state_dict(dit_path)
            from ..models.sd3_dit import convert_sd3_dit, rename_civitai_sd3, infer_sd3_config
            if any(k.startswith("model.diffusion_model.joint_blocks.") for k in sd):
                sd = rename_civitai_sd3(sd)
            pipe.dit_cfg = infer_sd3_config(sd)
            pipe.dit_params = convert_sd3_dit(sd, pipe.dit_cfg, dtype=dtype)
        if vae_path:
            sd = C.load_state_dict(vae_path)
            pipe.vae_encoder_params = V.convert_sd3_vae(
                {k: v for k, v in sd.items() if not k.startswith("decoder")})
            pipe.vae_decoder_params = V.convert_sd3_vae(
                {k: v for k, v in sd.items() if not k.startswith("encoder")})
        return pipe

    def encode_prompt(self, prompt: str, t5_sequence_length: int = 77):
        return self.prompter.encode_prompt(prompt, t5_sequence_length,
                                           dtype=self.dtype)

    def encode_image(self, image_np):
        z = V.sd3_vae_encoder_forward(
            self.vae_encoder_params, jnp.asarray(image_np, jnp.float32),
            self.vae_cfg)
        return z.astype(self.dtype)

    def decode_image(self, latents):
        return V.sd3_vae_decoder_forward(
            self.vae_decoder_params, jnp.asarray(latents, jnp.float32),
            self.vae_cfg)

    def _fwd(self):
        if "fwd" not in self._jit_cache:
            cfg = self.dit_cfg
            self._jit_cache["fwd"] = jax.jit(
                lambda p, x, t, ctx, pooled: D.sd3_dit_forward(
                    p, cfg, x, t, ctx, pooled))
        return self._jit_cache["fwd"]

    def __call__(
        self,
        prompt: str,
        local_prompts: List[str] = (),
        masks: List = (),
        mask_scales: List[float] = (),
        negative_prompt: str = "",
        cfg_scale: float = 7.5,
        input_image=None,
        denoising_strength: float = 1.0,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 20,
        t5_sequence_length: int = 77,
        seed: Optional[int] = None,
        progress_bar_cmd=None,
        return_latents: bool = False,
    ):
        div = 16
        height = (height + div - 1) // div * div
        width = (width + div - 1) // div * div
        self.scheduler.set_timesteps(num_inference_steps,
                                     denoising_strength=denoising_strength)

        noise = jnp.asarray(generate_noise(
            (1, 16, height // 8, width // 8), seed=seed), self.dtype)
        if input_image is not None:
            img = _preprocess_images([input_image.resize((width, height))])[:, :, 0]
            latents = jnp.asarray(self.scheduler.add_noise(
                np.asarray(self.encode_image(img), np.float32),
                np.asarray(noise, np.float32),
                self.scheduler.timesteps[0]), self.dtype)
        else:
            latents = noise

        posi = self.encode_prompt(prompt, t5_sequence_length)
        nega = self.encode_prompt(negative_prompt, t5_sequence_length)
        locals_emb = [self.encode_prompt(p, t5_sequence_length)
                      for p in local_prompts]
        mask_arrays = [
            jnp.asarray((_preprocess_images([m.resize((width // 8, height // 8))])
                         [:, :1, 0] + 1) / 2, jnp.float32)
            for m in masks]

        fwd = self._fwd()
        steps = range(len(self.scheduler.timesteps))
        if progress_bar_cmd is not None:
            steps = progress_bar_cmd(steps)
        for i in steps:
            timestep = jnp.asarray([float(self.scheduler.timesteps[i])],
                                   jnp.float32)
            v_posi = fwd(self.dit_params, latents, timestep, posi[0], posi[1])
            # local-prompt masked blending (BasePipeline
            # .control_noise_via_local_prompts, utils/__init__.py:97-113)
            if locals_emb:
                weight = jnp.ones_like(v_posi[:, :1])
                blended = v_posi
                for (emb, pooled), m, s in zip(locals_emb, mask_arrays,
                                               mask_scales):
                    v_loc = fwd(self.dit_params, latents, timestep, emb, pooled)
                    m = m[:, :, None] if m.ndim == 3 else m
                    m = m.reshape(1, 1, height // 8, width // 8) * s
                    blended = blended + v_loc * m
                    weight = weight + m
                v_posi = blended / weight
            v_nega = fwd(self.dit_params, latents, timestep, nega[0], nega[1])
            v = v_nega + cfg_scale * (v_posi - v_nega)
            sigma, sigma_next = self.scheduler.sigma_pair(i)
            latents = (latents.astype(jnp.float32)
                       + v.astype(jnp.float32) * (sigma_next - sigma)).astype(self.dtype)

        if return_latents:
            return latents
        from .flux_image import FluxImagePipeline
        return FluxImagePipeline.vae_output_to_image(self.decode_image(latents))
