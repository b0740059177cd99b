"""QwenImagePipeline: text/image/entities -> image, TPU-native.

Re-design of the reference QwenImagePipeline
(/root/reference/diffsynth/pipelines/qwen_image.py:48-861): flow matching
with dynamic exponential shift, Qwen2.5-VL text conditioning (served via
transformers with the reference's chat template and drop_idx), t2i, img2img,
inpaint blending, Qwen-Image-Edit extra latents (edit/context images as
additional RoPE frames), and EliGen entity control (per-entity prompts with
spatial attention masks, process_entity_masks :434-500).
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from einops import rearrange

from ..models import qwen_image_dit as D
from ..models.qwen_image_dit import QwenImageDiTConfig, QWEN_IMAGE, qwen_rope
from ..models import qwen_image_vae as V
from ..models.wan_vae import WAN21_VAE
from ..schedulers import FlowMatchScheduler
from .wan_video import generate_noise, _preprocess_images

T2I_TEMPLATE = ("<|im_start|>system\nDescribe the image by detailing the "
                "color, shape, size, texture, quantity, text, spatial "
                "relationships of the objects and background:<|im_end|>\n"
                "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n")
T2I_DROP_IDX = 34
# Qwen-Image-Edit templates (reference qwen_image.py:553,563-566)
EDIT_TEMPLATE = (
    "<|im_start|>system\nDescribe the key features of the input image "
    "(color, shape, size, texture, objects, background), then explain how "
    "the user's text instruction should alter or modify the image. Generate "
    "a new image that meets the user's requirements while maintaining "
    "consistency with the original input where appropriate.<|im_end|>\n"
    "<|im_start|>user\n<|vision_start|><|image_pad|><|vision_end|>{}"
    "<|im_end|>\n<|im_start|>assistant\n")
EDIT_TEMPLATE_MULTI = (
    "<|im_start|>system\nDescribe the key features of the input image "
    "(color, shape, size, texture, objects, background), then explain how "
    "the user's text instruction should alter or modify the image. Generate "
    "a new image that meets the user's requirements while maintaining "
    "consistency with the original input where appropriate.<|im_end|>\n"
    "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n")
EDIT_IMG_BLOCK = "Picture {}: <|vision_start|><|image_pad|><|vision_end|>"
EDIT_DROP_IDX = 64


from dataclasses import dataclass


@dataclass
class ControlNetInput:
    """Mirror of the reference ControlNetInput (flux_image_new.py:36-43)."""
    controlnet_id: int = 0
    scale: float = 1.0
    start: float = 1.0
    end: float = 0.0
    image: object = None
    inpaint_mask: object = None
    processor_id: Optional[str] = None


class QwenImagePipeline:
    """Public API mirrors the reference __call__ (qwen_image.py:355-450)."""

    def __init__(self, dtype=jnp.bfloat16):
        self.dtype = dtype
        self.scheduler = FlowMatchScheduler(
            sigma_min=0.0, sigma_max=1.0, extra_one_step=True,
            exponential_shift=True, exponential_shift_mu=0.8,
            shift_terminal=0.02)
        self.dit_params = None
        self.dit_cfg: QwenImageDiTConfig = QWEN_IMAGE
        self.vae_params = None
        self.vae_cfg = WAN21_VAE
        self.text_encoder = None        # callable(texts) -> (emb, mask)
        self._vl = None                 # native QwenVL (text+vision towers)
        # block-wise ControlNets (QwenImageBlockwiseMultiControlNet,
        # qwen_image.py:23-45): list of converted pytrees, indexed by
        # ControlNetInput.controlnet_id
        self.blockwise_controlnets = None
        self._jit_cache = {}

    def load_blockwise_controlnet(self, path=None, state_dict=None):
        """Append a block-wise ControlNet (qwen_image_controlnet.py:30-61)."""
        from ..models import qwen_image_controlnet as QC
        from ..utils import ckpt as C
        sd = state_dict if state_dict is not None else C.load_state_dict(path)
        params = QC.convert_qwen_blockwise_controlnet(sd, dtype=self.dtype)
        self.blockwise_controlnets = (self.blockwise_controlnets or []) + [params]
        self._jit_cache.clear()

    @classmethod
    def from_pretrained(cls, dit_paths=None, vae_path=None, dtype=jnp.bfloat16):
        from ..utils import ckpt as C
        pipe = cls(dtype=dtype)
        if dit_paths:
            sd = C.load_state_dict_files(
                dit_paths if isinstance(dit_paths, list) else [dit_paths])
            pipe.dit_params = D.convert_qwen_image_dit(sd, pipe.dit_cfg,
                                                       dtype=dtype)
        if vae_path:
            pipe.vae_params = V.convert_qwen_image_vae(
                C.load_state_dict(vae_path))
        return pipe

    def fetch_text_encoder(self, model_path: str, tokenizer_path: str,
                           backend: str = "native"):
        """Qwen2.5-VL text tower (the reference's QwenImageTextEncoder,
        qwen_image_text_encoder.py:1-255; template + drop_idx from
        QwenImageUnit_PromptEmbedder, qwen_image.py:530-41).

        backend="native" (default) runs the TPU-native towers — text via
        models/llm_decoder.py (text-only prompts make Qwen2.5-VL's mRoPE
        equal to standard RoPE), vision via models/qwen_vl_vision.py when
        the checkpoint carries `visual.` weights (Qwen-Image-Edit prompt
        conditioning, reference qwen_image.py:552-575), and
        hidden_states[-1] includes the final norm.
        backend="transformers" keeps the host-torch fallback."""
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(tokenizer_path)
        if backend == "native":
            import numpy as _np
            from ..models.qwen_vl_embedder import QwenVL
            from ..utils import ckpt as C
            sd = C.load_state_dict_files(
                model_path if isinstance(model_path, list) else [model_path])
            self._vl = QwenVL(sd, tok, dtype=self.dtype)

            def encode(prompt: str):
                txt = T2I_TEMPLATE.format(prompt)
                ids = tok([txt], max_length=4096 + T2I_DROP_IDX, padding=True,
                          truncation=True, return_tensors="np")["input_ids"][0]
                hidden = self._vl.encode_ids(ids)
                emb = jnp.asarray(hidden[:, T2I_DROP_IDX:], self.dtype)
                mask = jnp.ones((1, emb.shape[1]), jnp.int32)
                return emb, mask

            self.text_encoder = encode
            return

        import torch
        from transformers import AutoModelForCausalLM
        model = AutoModelForCausalLM.from_pretrained(
            model_path, torch_dtype=torch.float16).eval()

        def encode(prompt: str):
            txt = T2I_TEMPLATE.format(prompt)
            ids = tok([txt], max_length=4096 + T2I_DROP_IDX, padding=True,
                      truncation=True, return_tensors="pt")
            with torch.no_grad():
                hidden = model(input_ids=ids["input_ids"],
                               attention_mask=ids["attention_mask"],
                               output_hidden_states=True).hidden_states[-1]
            emb = hidden[:, T2I_DROP_IDX:].float().numpy()
            mask = ids["attention_mask"][:, T2I_DROP_IDX:].numpy()
            return (jnp.asarray(emb, self.dtype), jnp.asarray(mask, jnp.int32))

        self.text_encoder = encode

    def encode_prompt(self, prompt: str):
        return self.text_encoder(prompt)

    @staticmethod
    def _resize_vl(image, target_area=384 * 384):
        """Multi-image VL resize (reference qwen_image.py:533-537)."""
        import math
        ratio = image.size[0] / image.size[1]
        width = math.sqrt(target_area * ratio)
        height = width / ratio
        return image.resize((round(width / 32) * 32, round(height / 32) * 32))

    def encode_prompt_edit(self, prompt: str, edit_images, _cache=None):
        """Qwen-Image-Edit prompt conditioning: the edit image(s) run through
        the native VL vision tower and condition the prompt embedding
        (reference encode_prompt_edit/_multi, qwen_image.py:552-575;
        drop_idx 64). Returns (emb, mask, vision_cache) — pass the cache to
        the negative-prompt call to reuse the vision forward."""
        vl = self._vl
        if len(edit_images) == 1:
            txt = EDIT_TEMPLATE.format(prompt)
            imgs = list(edit_images)
        else:
            base = "".join(EDIT_IMG_BLOCK.format(i + 1)
                           for i in range(len(edit_images)))
            txt = EDIT_TEMPLATE_MULTI.format(base + prompt)
            imgs = [self._resize_vl(im) for im in edit_images]
        img_emb, grids = _cache if _cache is not None else vl.embed_images(imgs)
        text = vl._expand_image_pads(txt, grids)
        ids = vl.tokenizer(text, return_tensors="np")["input_ids"][0]
        hidden = vl.encode_ids(ids, img_emb, grids)
        emb = jnp.asarray(hidden[:, EDIT_DROP_IDX:], self.dtype)
        return emb, jnp.ones((1, emb.shape[1]), jnp.int32), (img_emb, grids)

    def encode_image(self, image_np):
        z = V.qwen_vae_encode(self.vae_params,
                              jnp.asarray(image_np, jnp.float32), self.vae_cfg)
        return z.astype(self.dtype)

    def decode_image(self, latents):
        return V.qwen_vae_decode(self.vae_params,
                                 jnp.asarray(latents, jnp.float32),
                                 self.vae_cfg)

    # ------------------------------------------------------------ EliGen

    def _entity_attention_bias(self, n_img_tokens, seq_lens, entity_masks,
                               height, width):
        """process_entity_masks attention mask (qwen_image_dit.py:448-500):
        each entity prompt attends only to (and is attended by) its own
        spatial region; entity prompts don't attend to each other."""
        total = sum(seq_lens) + n_img_tokens
        allow = np.ones((total, total), bool)
        cum = np.cumsum([0] + list(seq_lens))
        img0 = cum[-1]
        for i, m in enumerate(entity_masks):
            patched = rearrange(np.asarray(m, np.float32),
                                "C (H P) (W Q) -> (H W) (C P Q)",
                                H=height // 16, W=width // 16, P=2, Q=2)
            img_mask = patched.sum(axis=-1) > 0                # (hw,)
            rep = n_img_tokens // img_mask.shape[0]
            img_mask = np.tile(img_mask, rep)
            allow[cum[i]:cum[i + 1], img0:] = img_mask[None, :]
            allow[img0:, cum[i]:cum[i + 1]] = img_mask[:, None]
        n = len(entity_masks)
        for i in range(n):
            for j in range(n):
                if i != j:
                    allow[cum[i]:cum[i + 1], cum[j]:cum[j + 1]] = False
        bias = np.where(allow, 0.0, float(np.finfo(np.float32).min))
        return jnp.asarray(bias, jnp.float32)[None, None]

    def _prepare_eligen(self, entity_prompts, entity_masks, prompt_emb,
                        height, width, n_img_tokens):
        """-> (joint_prompt_emb, attn_bias, txt_seq_len, frame ids kwargs)."""
        embs, lens = [], []
        for p in entity_prompts:
            e, m = self.encode_prompt(p)
            embs.append(e)
            lens.append(int(np.asarray(m).sum()))
        embs.append(prompt_emb)
        lens.append(prompt_emb.shape[1])
        # pad entity embs to their mask length then concat on sequence
        joint = jnp.concatenate(
            [e[:, :l] for e, l in zip(embs, lens)], axis=1)
        masks = []
        for img in entity_masks:
            m = np.asarray(img.convert("L").resize(
                (width // 8, height // 8)), np.float32) / 255.0
            masks.append(np.repeat((m > 0.5)[None], 1, axis=0))
        bias = self._entity_attention_bias(n_img_tokens, lens, masks,
                                           height, width)
        return joint, bias, lens

    # ------------------------------------------------------------ main

    def _fwd(self, key, **static):
        if key not in self._jit_cache:
            cfg = self.dit_cfg
            self._jit_cache[key] = jax.jit(
                lambda p, lat, t, emb, extra, bias, bcn=None:
                D.qwen_image_dit_forward(
                    p, cfg, lat, t, emb,
                    txt_seq_len=static.get("txt_seq_len"),
                    extra_latents=extra, attn_bias=bias, blockwise_cn=bcn))
        return self._jit_cache[key]

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        cfg_scale: float = 4.0,
        input_image=None,
        denoising_strength: float = 1.0,
        inpaint_mask=None,
        height: int = 1328,
        width: int = 1328,
        seed: Optional[int] = None,
        num_inference_steps: int = 30,
        exponential_shift_mu: Optional[float] = None,
        eligen_entity_prompts: Optional[List[str]] = None,
        eligen_entity_masks: Optional[List] = None,
        edit_image=None,
        context_image=None,
        blockwise_controlnet_inputs: Optional[List[ControlNetInput]] = None,
        progress_bar_cmd=None,
        return_latents: bool = False,
    ):
        div = 16
        height = (height + div - 1) // div * div
        width = (width + div - 1) // div * div
        self.scheduler.set_timesteps(
            num_inference_steps, denoising_strength=denoising_strength,
            dynamic_shift_len=(height // 16) * (width // 16),
            exponential_shift_mu=exponential_shift_mu)

        noise = jnp.asarray(generate_noise(
            (1, 16, height // 8, width // 8), seed=seed), self.dtype)
        input_latents = None
        if input_image is not None:
            img = _preprocess_images([input_image.resize((width, height))])[:, :, 0]
            input_latents = self.encode_image(img)
            latents = jnp.asarray(self.scheduler.add_noise(
                np.asarray(input_latents, np.float32),
                np.asarray(noise, np.float32),
                self.scheduler.timesteps[0]), self.dtype)
        else:
            latents = noise

        mask_lat = None
        if inpaint_mask is not None and input_latents is not None:
            m = np.asarray(inpaint_mask.convert("L").resize(
                (width // 8, height // 8)), np.float32) / 255.0
            mask_lat = jnp.asarray(m[None, None], jnp.float32)

        # Qwen-Image-Edit: the edit image conditions the prompt embedding
        # through the VL vision tower (reference QwenImageUnit_PromptEmbedder
        # routes edit_image into encode_prompt_edit for both CFG branches)
        if (edit_image is not None and self._vl is not None
                and self._vl.vision_params is not None):
            imgs = edit_image if isinstance(edit_image, list) else [edit_image]
            posi_emb, posi_mask, vl_cache = self.encode_prompt_edit(
                prompt, imgs)
            nega = (self.encode_prompt_edit(negative_prompt, imgs,
                                            _cache=vl_cache)[:2]
                    if cfg_scale != 1.0 else None)
        else:
            posi_emb, posi_mask = self.encode_prompt(prompt)
            nega = (self.encode_prompt(negative_prompt)
                    if cfg_scale != 1.0 else None)

        # edit / context images -> extra latents (extra RoPE frames)
        extra = []
        if edit_image is not None:
            imgs = edit_image if isinstance(edit_image, list) else [edit_image]
            for im in imgs:
                w0 = im.width // 16 * 16
                h0 = im.height // 16 * 16
                extra.append(self.encode_image(
                    _preprocess_images([im.resize((w0, h0))])[:, :, 0]))
        if context_image is not None:
            extra.append(self.encode_image(_preprocess_images(
                [context_image.resize((width, height))])[:, :, 0]))
        extra = extra or None

        # Block-wise ControlNet conditioning
        # (QwenImageUnit_BlockwiseControlNet, qwen_image.py:674-713):
        # VAE-encode each control image (inpaint variant zeroes the masked
        # pixels, then appends the downsampled inverse mask as an extra
        # latent channel), patchify + img_in once up front.
        bcn_static = None
        if blockwise_controlnet_inputs:
            from ..models import qwen_image_controlnet as QC
            from PIL import Image as _Image
            bcn_static = []
            for ci in blockwise_controlnet_inputs:
                img = ci.image.resize((width, height))
                if ci.inpaint_mask is not None:
                    m = np.asarray(ci.inpaint_mask.convert("L").resize(
                        (width, height)), np.float32) / 255.0
                    arr = np.array(img)
                    arr[m > 0.5] = 0
                    img = _Image.fromarray(arr)
                cond_lat = self.encode_image(
                    _preprocess_images([img])[:, :, 0])
                if ci.inpaint_mask is not None:
                    m8 = np.asarray(ci.inpaint_mask.convert("L").resize(
                        (width // 8, height // 8)), np.float32) / 255.0
                    cond_lat = jnp.concatenate(
                        [cond_lat, jnp.asarray(1.0 - m8, cond_lat.dtype)[
                            None, None]], axis=1)
                cn_params = self.blockwise_controlnets[ci.controlnet_id]
                cond = QC.qwen_blockwise_cn_process(cn_params, cond_lat)
                bcn_static.append((cn_params["blocks"], cond, ci))

        # EliGen
        bias = None
        txt_len_posi = posi_emb.shape[1]
        if eligen_entity_prompts and eligen_entity_masks:
            n_img_tokens = (height // 16) * (width // 16)
            posi_emb, bias, _ = self._prepare_eligen(
                eligen_entity_prompts, eligen_entity_masks, posi_emb,
                height, width, n_img_tokens)
            txt_len_posi = posi_emb.shape[1]

        fwd_posi = self._fwd(("posi", txt_len_posi, bias is not None,
                              None if extra is None else len(extra)),
                             txt_seq_len=txt_len_posi)
        fwd_nega = None
        if nega is not None:
            fwd_nega = self._fwd(("nega", nega[0].shape[1],
                                  None if extra is None else len(extra)),
                                 txt_seq_len=nega[0].shape[1])

        steps = range(len(self.scheduler.timesteps))
        if progress_bar_cmd is not None:
            steps = progress_bar_cmd(steps)
        n_steps = len(self.scheduler.timesteps)
        for i in steps:
            t_host = float(self.scheduler.timesteps[i])
            t = jnp.asarray([t_host / 1000.0], jnp.float32)
            bcn = None
            if bcn_static is not None:
                # start/end progress gating (blockwise_forward,
                # qwen_image.py:37-45): inactive inputs get scale 0 so the
                # jitted graph is step-invariant
                progress = (n_steps - 1 - i) / max(n_steps - 1, 1)
                bcn = [(blocks, cond,
                        jnp.asarray(ci.scale if (ci.start + 1e-4 >= progress
                                                 >= ci.end - 1e-4) else 0.0,
                                    jnp.float32))
                       for blocks, cond, ci in bcn_static]
            v = fwd_posi(self.dit_params, latents, t, posi_emb, extra, bias,
                         bcn)
            if fwd_nega is not None:
                v_nega = fwd_nega(self.dit_params, latents, t, nega[0],
                                  extra, None, bcn)
                v = v_nega + cfg_scale * (v - v_nega)
            sigma, sigma_next = self.scheduler.sigma_pair(i)
            latents = (latents.astype(jnp.float32)
                       + v.astype(jnp.float32) * (sigma_next - sigma)).astype(self.dtype)
            if mask_lat is not None:
                # inpaint: pin the unmasked region to the (re-noised) input
                if i + 1 < len(self.scheduler.timesteps):
                    ref = jnp.asarray(self.scheduler.add_noise(
                        np.asarray(input_latents, np.float32),
                        np.asarray(noise, np.float32),
                        self.scheduler.timesteps[i + 1]), self.dtype)
                else:
                    ref = input_latents
                latents = (mask_lat * latents.astype(jnp.float32)
                           + (1 - mask_lat) * ref.astype(jnp.float32)
                           ).astype(self.dtype)

        if return_latents:
            return latents
        from .flux_image import FluxImagePipeline
        return FluxImagePipeline.vae_output_to_image(
            self.decode_image(latents))
