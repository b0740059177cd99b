"""FluxImagePipeline: text/image/Kontext -> image, TPU-native.

Re-design of the reference FluxImagePipeline
(/root/reference/diffsynth/pipelines/flux_image_new.py:80-556): the core
units (ShapeChecker, NoiseInitializer, PromptEmbedder, InputImageEmbedder,
ImageIDs, EmbeddedGuidanceEmbedder, Kontext, TeaCache) become pure
preprocessing steps; the denoise loop drives one jitted DiT forward per CFG
branch with embedded-guidance distilled sampling (guidance goes through the
DiT's guidance embedder; cfg_scale=1 single-pass is the distilled default).
"""
from __future__ import annotations

from typing import List, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..models import flux_dit as F
from ..models.flux_dit import FluxDiTConfig, FLUX_DEV
from ..models import sd3_vae as V
from ..models.t5 import T5Config, T5_V11_XXL
from ..schedulers import FlowMatchScheduler
from ..prompters.flux_prompter import FluxPrompter
from .wan_video import generate_noise


class FluxTeaCache:
    """FLUX TeaCache (flux_image_new.py:1065-1110): fixed poly(4) rescale of
    the relative-L1 of the block-0 modulated input."""

    COEFFS = [4.98651651e+02, -2.83781631e+02, 5.58554382e+01,
              -3.82021401e+00, 2.64230861e-01]

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
            if self.accumulated < self.rel_l1_thresh:
                should_calc = False
            else:
                should_calc = True
                self.accumulated = 0.0
        self.previous_modulated = modulated
        self.step = (self.step + 1) % self.num_inference_steps
        return not should_calc

    def store(self, residual):
        self.previous_residual = residual


class FluxImagePipeline:
    """Public API mirrors the reference __call__ (flux_image_new.py:434-556)."""

    def __init__(self, dtype=jnp.bfloat16):
        self.dtype = dtype
        self.scheduler = FlowMatchScheduler(shift=3.0)
        self.prompter = FluxPrompter()
        self.dit_params = None
        self.dit_cfg: FluxDiTConfig = FLUX_DEV
        self.vae_encoder_params = None
        self.vae_decoder_params = None
        self.vae_cfg = V.FLUX_VAE
        self.clip_params = None
        self.t5_params = None
        self.t5_cfg: T5Config = T5_V11_XXL
        self.controlnet_params = None
        self.controlnet_cfg = None
        # NexusGen AR conditioning (FluxImageUnit_NexusGen,
        # flux_image_new.py:796-858)
        self.nexus_gen = None                   # callable(prompt, ref_image)
        self.nexus_gen_generation_adapter = None
        self.nexus_gen_editing_adapter = None   # (params, MergerConfig)
        # Step1x edit (FluxImageUnit_Step1x, flux_image_new.py:860-880):
        # qwenvl = callable(captions, ref_images) -> (embs, masks) host numpy
        self.qwenvl = None
        self.step1x_connector_params = None
        self.step1x_connector_cfg = None
        self.ipadapter_params = None
        # callable(list[PIL 384x384]) -> (B, 1152) SigLIP pooled embedding
        self.ipadapter_image_encoder = None
        # InfiniteYou (FluxImageUnit_InfiniteYou, flux_image_new.py:909-921):
        # Perceiver projector + optional host face embedder
        # callable(PIL) -> (n, 512) ArcFace embedding
        self.infiniteyou_projector_params = None
        self.infiniteyou_face_embedder = None
        # Value controllers (FluxImageUnit_ValueControl, :925-952): list of
        # SingleValueEncoder pytrees, one per controlled value
        self.value_controller_params = None
        # FLUX LoRA encoder (FluxImageUnit_LoRAEncode, :1006-1062)
        self.lora_encoder_params = None
        self._jit_cache = {}

    # ---------------- loading ----------------

    @classmethod
    def from_pretrained(cls, dit_path=None, vae_path=None, clip_path=None,
                        t5_paths=None, tokenizer_1_path=None,
                        tokenizer_2_path=None, dtype=jnp.bfloat16):
        from ..utils import ckpt as C
        pipe = cls(dtype=dtype)
        if dit_path:
            sd = C.load_state_dict(dit_path)
            cfg = FLUX_DEV
            if not any("guidance" in k for k in sd):
                from ..models.flux_dit import FLUX_SCHNELL
                cfg = FLUX_SCHNELL
            pipe.dit_cfg = cfg
            pipe.dit_params = F.convert_flux_dit(sd, cfg, dtype=dtype)
        if vae_path:
            sd = C.load_state_dict(vae_path)
            pipe.vae_encoder_params = V.convert_sd3_vae(
                {k: v for k, v in sd.items() if not k.startswith("decoder")})
            pipe.vae_decoder_params = V.convert_sd3_vae(
                {k: v for k, v in sd.items() if not k.startswith("encoder")})
        if clip_path:
            from ..models.sd3_text_encoder import convert_sd3_text_encoder_1
            pipe.clip_params = convert_sd3_text_encoder_1(
                C.load_state_dict(clip_path), dtype=dtype)
        if t5_paths:
            from ..models.t5 import convert_hf_t5
            pipe.t5_params = convert_hf_t5(
                C.load_state_dict_files(t5_paths if isinstance(t5_paths, list)
                                        else [t5_paths]),
                pipe.t5_cfg, dtype=dtype)
        pipe.prompter.fetch_tokenizers(tokenizer_1_path, tokenizer_2_path)
        pipe.prompter.fetch_models(pipe.clip_params, pipe.t5_params, pipe.t5_cfg)
        return pipe

    def fetch_qwenvl(self, model_paths, tokenizer_path):
        """Native Step1x VL embedder (replaces the reference's torch
        Qwen25VL_7b_Embedder, qwenvl.py:1-168): Qwen2.5-VL text+vision
        towers in JAX behind the (captions, ref_images) -> (embs, masks)
        surface the denoise loop consumes."""
        from transformers import AutoTokenizer
        from ..models.qwen_vl_embedder import QwenVL, QwenVLStep1xEmbedder
        from ..utils import ckpt as C
        sd = C.load_state_dict_files(
            model_paths if isinstance(model_paths, list) else [model_paths])
        self.qwenvl = QwenVLStep1xEmbedder(QwenVL(
            sd, AutoTokenizer.from_pretrained(tokenizer_path),
            dtype=self.dtype))

    def load_controlnet(self, path=None, state_dict=None, cfg=None):
        """Attach a FLUX ControlNet (FluxImageUnit_ControlNet analog)."""
        from ..models import flux_controlnet as FC
        from ..utils import ckpt as C
        sd = state_dict if state_dict is not None else C.load_state_dict(path)
        if cfg is None:
            cfg = FC.FluxControlNetConfig(
                dit=self.dit_cfg,
                num_joint_blocks=max([int(k.split(".")[1]) + 1 for k in sd
                                      if k.startswith("controlnet_blocks.")],
                                     default=0),
                num_single_blocks=max(
                    [int(k.split(".")[1]) + 1 for k in sd
                     if k.startswith("controlnet_single_blocks.")], default=0),
                guidance_embed="guidance_embedder.timestep_embedder.0.weight"
                               in sd)
        self.controlnet_cfg = cfg
        self.controlnet_params = FC.convert_flux_controlnet(sd, cfg,
                                                            dtype=self.dtype)
        self._jit_cache.clear()

    def load_ipadapter(self, path=None, state_dict=None, image_encoder=None):
        """Attach a FLUX IP-Adapter (+ optional SigLIP pooled-embedding fn)."""
        from ..models import flux_controlnet as FC
        from ..utils import ckpt as C
        sd = state_dict if state_dict is not None else C.load_state_dict(path)
        n = self.dit_cfg.num_joint_blocks + self.dit_cfg.num_single_blocks
        self.ipadapter_params = FC.convert_flux_ipadapter(sd, num_blocks=n,
                                                          dtype=self.dtype)
        if image_encoder is not None:
            self.ipadapter_image_encoder = image_encoder
        self._jit_cache.clear()

    def load_infiniteyou(self, path=None, state_dict=None):
        """Attach the InfiniteYou image projector. Accepts the published
        bundle ({'image_proj': {...}} — from_diffusers,
        flux_infiniteyou.py:123-129) or a flat projector state dict."""
        from ..models import flux_adapters as FA
        from ..utils import ckpt as C
        sd = state_dict if state_dict is not None else C.load_state_dict(path)
        if "image_proj" in sd and not hasattr(sd["image_proj"], "shape"):
            sd = sd["image_proj"]
        self.infiniteyou_projector_params = FA.convert_infiniteyou_projector(
            sd, dtype=self.dtype)

    def load_value_controllers(self, paths=None, state_dicts=None):
        """Attach SingleValueEncoders (one per controlled scalar)."""
        from ..models import flux_adapters as FA
        from ..utils import ckpt as C
        sds = state_dicts if state_dicts is not None else [
            C.load_state_dict(p) for p in paths]
        self.value_controller_params = [
            FA.convert_value_encoder(sd, dtype=self.dtype) for sd in sds]

    def load_lora_encoder(self, path=None, state_dict=None):
        """Attach the FLUX LoRA encoder (conditioning on a LoRA itself)."""
        from ..models import flux_adapters as FA
        from ..utils import ckpt as C
        sd = state_dict if state_dict is not None else C.load_state_dict(path)
        self.lora_encoder_params = FA.convert_flux_lora_encoder(
            sd, dtype=self.dtype)

    def load_lora(self, path=None, state_dict=None, alpha: float = 1.0):
        """Merge a FLUX LoRA into the DiT weights (any public key layout;
        lora/flux_lora.py handles the format conversion)."""
        from ..flux_lora import convert_flux_lora
        from ..lora import merge_lora
        from ..utils import ckpt as C
        sd = state_dict if state_dict is not None else C.load_state_dict(path)
        sd = convert_flux_lora(sd)
        self.dit_params = merge_lora(self.dit_params, sd, alpha=alpha)
        self._jit_cache.clear()

    # ---------------- helpers ----------------

    def check_resize(self, height, width):
        div = 16
        return ((height + div - 1) // div * div,
                (width + div - 1) // div * div)

    def encode_prompt(self, prompt, t5_sequence_length=512):
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

    def _model_fns(self, kontext_ids=None, text_ids=None):
        """kontext_ids/text_ids (host numpy) are closed over — they feed the
        host-side RoPE table build, so they must not be traced."""
        key = ("flux", None if kontext_ids is None else kontext_ids.tobytes(),
               None if text_ids is None else np.asarray(text_ids).tobytes())
        if key in self._jit_cache:
            return self._jit_cache[key]
        cfg = self.dit_cfg
        ki = None if kontext_ids is None else np.asarray(kontext_ids)
        ti = None if text_ids is None else np.asarray(text_ids)

        def full(params, latents, timestep, prompt_emb, pooled, guidance,
                 kontext_latents=None, controlnet_res=None,
                 controlnet_single_res=None, ip_kv=None, ip_scale=1.0,
                 attn_bias=None):
            x, ctx, temb, cos, sin, n_img = F.flux_embed(
                params, cfg, latents, timestep, prompt_emb, pooled, guidance,
                text_ids=ti, kontext_latents=kontext_latents,
                kontext_ids=ki)
            modulated = F.flux_modulated_input(params, cfg, x, temb)
            h = F.flux_trunk(params, cfg, x, ctx, temb, cos, sin,
                             controlnet_res=controlnet_res,
                             controlnet_single_res=controlnet_single_res,
                             ip_kv=ip_kv, ip_scale=ip_scale,
                             attn_bias=attn_bias)
            residual = h - x
            height, width = latents.shape[-2:]
            v = F.flux_head(params, cfg, h[:, :n_img], temb, height, width)
            return v, residual, modulated

        def skip(params, latents, timestep, prompt_emb, pooled, guidance,
                 residual, kontext_latents=None):
            x, ctx, temb, cos, sin, n_img = F.flux_embed(
                params, cfg, latents, timestep, prompt_emb, pooled, guidance,
                text_ids=ti, kontext_latents=kontext_latents,
                kontext_ids=ki)
            h = x + residual
            height, width = latents.shape[-2:]
            return F.flux_head(params, cfg, h[:, :n_img], temb, height, width)

        def modulated_only(params, latents, timestep, prompt_emb, pooled,
                           guidance, kontext_latents=None):
            x, _, temb, _, _, _ = F.flux_embed(
                params, cfg, latents, timestep, prompt_emb, pooled, guidance,
                text_ids=ti, kontext_latents=kontext_latents,
                kontext_ids=ki)
            return F.flux_modulated_input(params, cfg, x, temb)

        fns = (jax.jit(full), jax.jit(skip), jax.jit(modulated_only))
        self._jit_cache[key] = fns
        return fns

    @staticmethod
    def _nexus_gen_editing_text_ids(lat_h, lat_w, embed_grid, ref_grid):
        """get_editing_text_ids (flux_image_new.py:817-838): per-embedding
        position grids scaled to the latent resolution; reference grid gets
        f_id=1."""
        def ids(grid, f_id):
            h, w = int(grid[1]), int(grid[2])
            out = np.zeros((h // 2, w // 2, 3), np.float64)
            out[..., 0] = f_id
            out[..., 1] = np.arange(h // 2)[:, None] * (lat_h / h)
            out[..., 2] = np.arange(w // 2)[None, :] * (lat_w / w)
            return out.reshape(-1, 3)

        return np.concatenate([ids(embed_grid, 0), ids(ref_grid, 1)], axis=0)

    def _controlnet_res(self, latents, cn_cond, timestep, prompt_emb, pooled,
                        guidance, processor_id, scale):
        """Run the ControlNet trunk; residual stacks aligned to the DiT's
        block counts and scaled (FluxImageUnit_ControlNet analog)."""
        from ..models import flux_controlnet as FC
        cfg = self.controlnet_cfg
        key = ("cn", processor_id)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda p, x, c, t, pe, pl, g: FC.flux_controlnet_forward(
                    p, cfg, x, c, t, pe, pl, g, processor_id=processor_id))
        res, single = self._jit_cache[key](
            self.controlnet_params, latents, cn_cond, timestep, prompt_emb,
            pooled, guidance)
        res = FC.align_res_stack(res, self.dit_cfg.num_joint_blocks)
        single = FC.align_res_stack(single, self.dit_cfg.num_single_blocks)
        return (None if res is None else res * scale,
                None if single is None else single * scale)

    def _branch(self, latents, timestep, prompt_emb, pooled, guidance,
                kontext, tea_cache, cn=None, ip_kv=None, ip_scale=1.0,
                text_ids=None, attn_bias=None):
        kl, ki = (kontext if kontext is not None else (None, None))
        full, skip, modulated_only = self._model_fns(ki, text_ids)
        args = (self.dit_params, latents, timestep, prompt_emb, pooled,
                guidance)
        if tea_cache is not None:
            mod = modulated_only(*args, kl)
            if tea_cache.check(mod) and tea_cache.previous_residual is not None:
                return skip(*args, tea_cache.previous_residual, kl)
        cn_res, cn_single = cn if cn is not None else (None, None)
        v, residual, _ = full(*args, kl, cn_res, cn_single, ip_kv, ip_scale,
                              attn_bias)
        if tea_cache is not None:
            tea_cache.store(residual)
        return v

    # ---------------- main call ----------------

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 1.0,
        embedded_guidance: float = 3.5,
        t5_sequence_length: int = 512,
        input_image=None,
        denoising_strength: float = 1.0,
        height: int = 1024,
        width: int = 1024,
        seed: Optional[int] = None,
        sigma_shift: Optional[float] = None,
        num_inference_steps: int = 30,
        kontext_images=None,
        eligen_entity_prompts=None,
        eligen_entity_masks=None,
        nexus_gen_reference_image=None,
        step1x_reference_image=None,
        flex_condition=None,
        flex_uncondition=None,
        flex_control_stop_timestep: float = 0.0,
        controlnet_image=None,
        controlnet_scale: float = 1.0,
        controlnet_processor_id: Optional[int] = None,
        ipadapter_images=None,
        ipadapter_scale: float = 1.0,
        infinityou_id_image=None,
        infinityou_id_emb=None,
        infinityou_guidance: float = 1.0,
        value_controller_inputs=None,
        lora_encoder_inputs=None,
        lora_encoder_scale: float = 1.0,
        tea_cache_l1_thresh: Optional[float] = None,
        progress_bar_cmd=None,
        return_latents: bool = False,
    ):
        from .wan_video import _preprocess_images
        height, width = self.check_resize(height, width)
        self.scheduler.set_timesteps(num_inference_steps,
                                     denoising_strength=denoising_strength,
                                     shift=sigma_shift)

        noise = jnp.asarray(generate_noise(
            (1, 16, height // 8, width // 8), seed=seed), self.dtype)
        if input_image is not None:
            img = _preprocess_images([input_image.resize((width, height))])[:, :, 0]
            input_latents = self.encode_image(img)
            latents = jnp.asarray(self.scheduler.add_noise(
                np.asarray(input_latents, np.float32),
                np.asarray(noise, np.float32),
                self.scheduler.timesteps[0]), self.dtype)
        else:
            latents = noise

        prompt_emb, pooled, _ = self.encode_prompt(prompt, t5_sequence_length)
        nega = None
        if cfg_scale != 1.0:
            nega = self.encode_prompt(negative_prompt, t5_sequence_length)

        # Value control (FluxImageUnit_ValueControl, flux_image_new.py:925-952):
        # scalar preferences become learned token blocks appended to BOTH cfg
        # branches' text embeddings (zero position ids — the flux_embed
        # default for appended tokens).
        if (value_controller_inputs is not None
                and self.value_controller_params is not None):
            from ..models import flux_adapters as FA
            if not isinstance(value_controller_inputs, list):
                value_controller_inputs = [value_controller_inputs]
            value_emb = FA.multi_value_encoder_forward(
                self.value_controller_params, value_controller_inputs)[None]
            value_emb = value_emb.astype(self.dtype)
            prompt_emb = jnp.concatenate([prompt_emb, value_emb], axis=1)
            if nega is not None:
                nega = (jnp.concatenate([nega[0], value_emb], axis=1),
                        nega[1], nega[2])

        # LoRA encoding (FluxImageUnit_LoRAEncode, :1006-1062): the LoRA
        # checkpoint itself becomes conditioning tokens on the positive
        # branch only.
        if (lora_encoder_inputs is not None
                and self.lora_encoder_params is not None):
            from ..models import flux_adapters as FA
            from ..flux_lora import convert_flux_lora
            from ..utils import ckpt as C
            if not isinstance(lora_encoder_inputs, list):
                lora_encoder_inputs = [lora_encoder_inputs]
            lora_embs = []
            for item in lora_encoder_inputs:
                lora = item if isinstance(item, dict) \
                    else C.load_state_dict(item)
                lora = convert_flux_lora(lora)
                lora_embs.append(FA.flux_lora_encoder_forward(
                    self.lora_encoder_params, lora))
            lora_emb = jnp.concatenate(lora_embs, axis=1) * lora_encoder_scale
            prompt_emb = jnp.concatenate(
                [prompt_emb, lora_emb.astype(self.dtype)], axis=1)

        # InfiniteYou (FluxImageUnit_InfiniteYou :909-921 + model_fn
        # :1190-1192): projected ArcFace identity replaces the ControlNet
        # branch's prompt tokens and guidance.
        iy = None
        if self.infiniteyou_projector_params is not None and (
                infinityou_id_image is not None
                or infinityou_id_emb is not None):
            from ..models import flux_adapters as FA
            if infinityou_id_emb is None:
                if self.infiniteyou_face_embedder is None:
                    raise ValueError(
                        "infinityou_id_image needs a face embedder "
                        "(insightface/arcface); pass infinityou_id_emb "
                        "instead for a precomputed identity")
                infinityou_id_emb = self.infiniteyou_face_embedder(
                    infinityou_id_image)
            id_emb = FA.infiniteyou_projector_forward(
                self.infiniteyou_projector_params,
                jnp.asarray(np.asarray(infinityou_id_emb),
                            self.dtype).reshape(1, -1, 512))
            iy = (id_emb, jnp.asarray([infinityou_guidance], jnp.float32))

        # EliGen entity control (FluxImageUnit_EntityControl,
        # flux_image_new.py:734-793): per-entity prompts attend only their
        # mask region; layout [entities... | global | image]
        attn_bias = None
        if eligen_entity_prompts and eligen_entity_masks:
            from PIL import Image as _Image
            embs = [self.encode_prompt(p, t5_sequence_length)[0]
                    for p in eligen_entity_prompts]
            prompt_emb = jnp.concatenate(embs + [prompt_emb], axis=1)
            masks = []
            for m in eligen_entity_masks:
                arr = np.asarray(m.convert("L").resize(
                    (width // 8, height // 8), _Image.NEAREST),
                    np.float32) > 127
                masks.append(arr.astype(np.float32))
            masks_np = np.stack(masks)[None, :, None]     # (1, N, 1, h, w)
            n_img = (height // 16) * (width // 16)
            attn_bias = jnp.asarray(F.build_entity_attention_bias(
                masks_np, embs[0].shape[1], n_img))

        # NexusGen AR conditioning replaces prompt_emb (+ custom text ids)
        text_ids = None
        if self.nexus_gen is not None:
            from ..models import nexus_gen as NG
            if nexus_gen_reference_image is None:
                embed, _, _ = self.nexus_gen(prompt)
                prompt_emb = NG.nexus_gen_adapter_forward(
                    self.nexus_gen_generation_adapter,
                    jnp.asarray(embed, self.dtype)[None])
                text_ids = np.zeros((prompt_emb.shape[1], 3), np.float64)
            else:
                embed, ref_embed, grids = self.nexus_gen(
                    prompt, nexus_gen_reference_image)
                m_params, m_cfg = self.nexus_gen_editing_adapter
                prompt_emb = NG.nexus_gen_merger_forward(
                    m_params, m_cfg, jnp.asarray(embed, self.dtype)[None],
                    grids[1:2], jnp.asarray(ref_embed, self.dtype)[None],
                    grids[0:1])
                text_ids = self._nexus_gen_editing_text_ids(
                    height // 8, width // 8, grids[1], grids[0])

        guidance = jnp.asarray([embedded_guidance], jnp.float32)

        # Kontext reference images (FluxImageUnit_Kontext, :639-668)
        kontext = None
        if kontext_images is not None:
            if not isinstance(kontext_images, list):
                kontext_images = [kontext_images]
            k_lats, k_ids = [], []
            for im in kontext_images:
                w0 = im.width // 16 * 16
                h0 = im.height // 16 * 16
                arr = _preprocess_images([im.resize((w0, h0))])[:, :, 0]
                z = self.encode_image(arr)
                k_ids.append(F.prepare_image_ids(1, z.shape[2] // 2,
                                                 z.shape[3] // 2))
                k_lats.append(F.patchify(z))
            kontext = (jnp.concatenate(k_lats, axis=1),
                       np.concatenate(k_ids, axis=0))

        # ControlNet conditioning (FluxImageUnit_ControlNet: VAE-encoded
        # control image, flux_image_new.py:670-705)
        cn_cond = None
        if controlnet_image is not None and self.controlnet_params is not None:
            arr = _preprocess_images(
                [controlnet_image.resize((width, height))])[:, :, 0]
            cn_cond = self.encode_image(arr)

        # IP-Adapter kv (FluxImageUnit_IPAdapter, :707-731): posi uses the
        # image encoding, nega a zeros encoding
        ip_posi = ip_nega = None
        if ipadapter_images is not None and self.ipadapter_params is not None:
            from ..models import flux_controlnet as FC
            if not isinstance(ipadapter_images, list):
                ipadapter_images = [ipadapter_images]
            emb = jnp.asarray(self.ipadapter_image_encoder(
                [im.convert("RGB").resize((384, 384)) for im
                 in ipadapter_images]), self.dtype)
            k, v_, _ = FC.flux_ipadapter_kv(self.ipadapter_params,
                                            self.dit_cfg, emb)
            ip_posi = (k, v_)
            if cfg_scale != 1.0:
                k0, v0, _ = FC.flux_ipadapter_kv(self.ipadapter_params,
                                                 self.dit_cfg,
                                                 jnp.zeros_like(emb))
                ip_nega = (k0, v0)

        # Step1x edit (model_fn, flux_image_new.py:1205-1208 + :1227-1233):
        # Qwen2.5-VL features -> per-step connector conditioning; the
        # reference image rides the kontext token path with f_id=0 ids
        step1x = None
        if step1x_reference_image is not None and self.qwenvl is not None:
            embs, masks = self.qwenvl([prompt], [step1x_reference_image])
            arr = _preprocess_images(
                [step1x_reference_image.resize((width, height))])[:, :, 0]
            ref_z = self.encode_image(arr)
            k_ids = F.prepare_image_ids(0, ref_z.shape[2] // 2,
                                        ref_z.shape[3] // 2)
            kontext = (F.patchify(ref_z), np.asarray(k_ids)) if kontext is None \
                else (jnp.concatenate([kontext[0], F.patchify(ref_z)], axis=1),
                      np.concatenate([kontext[1], np.asarray(k_ids)], axis=0))
            step1x = (jnp.asarray(embs[0:1], self.dtype),
                      jnp.asarray(masks[0:1]))

        tea_cache = None
        if tea_cache_l1_thresh is not None:
            tea_cache = FluxTeaCache(num_inference_steps, tea_cache_l1_thresh)

        steps = range(len(self.scheduler.timesteps))
        if progress_bar_cmd is not None:
            steps = progress_bar_cmd(steps)
        for i in steps:
            t_host = float(self.scheduler.timesteps[i])
            timestep = jnp.asarray([t_host], jnp.float32)
            if step1x is not None:
                from ..models import step1x as S1
                prompt_emb, pooled = S1.step1x_connector_forward(
                    self.step1x_connector_params,
                    self.step1x_connector_cfg or S1.STEP1X_CONNECTOR,
                    step1x[0], timestep / 1000.0, step1x[1])
                text_ids = np.zeros((prompt_emb.shape[1], 3), np.float64)
            lat_in = latents
            if flex_condition is not None:
                flex = (flex_condition if t_host >= flex_control_stop_timestep
                        else flex_uncondition)
                lat_in = jnp.concatenate(
                    [latents, jnp.asarray(flex, self.dtype)], axis=1)
            cn = None
            if cn_cond is not None:
                cn_pe = prompt_emb if iy is None else iy[0]
                cn_g = guidance if iy is None else iy[1]
                cn = self._controlnet_res(lat_in, cn_cond, timestep,
                                          cn_pe, pooled, cn_g,
                                          controlnet_processor_id,
                                          controlnet_scale)
            v = self._branch(lat_in, timestep, prompt_emb, pooled, guidance,
                             kontext, tea_cache, cn=cn, ip_kv=ip_posi,
                             ip_scale=ipadapter_scale, text_ids=text_ids,
                             attn_bias=attn_bias)
            if cfg_scale != 1.0:
                cn_n = None
                if cn_cond is not None:
                    cn_pe_n = nega[0] if iy is None else iy[0]
                    cn_g_n = guidance if iy is None else iy[1]
                    cn_n = self._controlnet_res(lat_in, cn_cond, timestep,
                                                cn_pe_n, nega[1], cn_g_n,
                                                controlnet_processor_id,
                                                controlnet_scale)
                v_nega = self._branch(lat_in, timestep, nega[0], nega[1],
                                      guidance, kontext, None, cn=cn_n,
                                      ip_kv=ip_nega, ip_scale=1.0)
                v = v_nega + cfg_scale * (v - v_nega)
            sigma, sigma_next = self.scheduler.sigma_pair(i)
            latents = (latents.astype(jnp.float32)
                       + v.astype(jnp.float32) * (sigma_next - sigma)).astype(self.dtype)

        if return_latents:
            return latents
        image = self.decode_image(latents)
        return self.vae_output_to_image(image)

    @staticmethod
    def vae_output_to_image(image):
        from PIL import Image
        arr = np.asarray(image[0], np.float32).transpose(1, 2, 0)
        arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
        return Image.fromarray(arr)
