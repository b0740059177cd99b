"""WanVideoPipeline: text/video/VACE -> video, TPU-native.

Re-design of the reference WanVideoPipeline
(/root/reference/diffsynth/pipelines/wan_video_new.py:32-1571). The 20
PipelineUnits become pure preprocessing functions filling a conditioning
dict; the denoise loop is a Python loop over 50 steps driving jitted model
functions (static shapes -> one compile, no retraces), with:

  - CFG via two forwards inside one jitted step (or cfg_merge batching)
  - TeaCache step skipping (trunk-token residual reuse, :1154-1203)
  - dual-DiT expert switching at `switch_DiT_boundary` (:519-523)
  - VACE hint injection (vace_context build at :861-920)
  - tiled VAE encode/decode

vram_management is gone: params live in HBM (sharded over the mesh when a
ShardingContext is active).
"""
from __future__ import annotations

import dataclasses
import math
import time
from functools import partial
from typing import List, Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..models import wan_dit as M
from ..models.wan_dit import WanDiTConfig
from ..models.wan_vace import VaceConfig, vace_forward
from ..models import wan_vae as V
from ..models.t5 import T5Config, UMT5_XXL, t5_encode
from ..ops.rope import assemble_freqs_grid
from ..schedulers import FlowMatchScheduler
from ..utils import ckpt as C
from ..utils.convert import convert_wan_dit, convert_vace
from ..lora import merge_lora
from ..prompters.wan_prompter import WanPrompter


# Declarative weight source shared by every pipeline: local paths or
# model_id + origin_file_pattern through a pluggable transport
# (utils/model_config.py, the reference utils/__init__.py:158-218 shape).
from ..utils.model_config import ModelConfig  # noqa: F401 (re-export)


def _preprocess_images(images, dtype=np.float32) -> np.ndarray:
    """PIL list -> (1, 3, T, H, W) in [-1, 1] (utils/__init__.py:61-75)."""
    arr = np.stack([np.asarray(im, dtype=np.float32) for im in images])
    arr = arr * (2.0 / 255.0) - 1.0
    return arr.transpose(3, 0, 1, 2)[None].astype(dtype)


def generate_noise(shape, seed=None, dtype=np.float32) -> np.ndarray:
    """Seeded Gaussian noise, bit-exact with the reference
    (utils/__init__.py:117-122: torch CPU fp32 randn)."""
    try:
        import torch
        gen = None if seed is None else torch.Generator("cpu").manual_seed(seed)
        return torch.randn(shape, generator=gen, dtype=torch.float32).numpy()
    except ImportError:
        key = jax.random.PRNGKey(0 if seed is None else seed)
        return np.asarray(jax.random.normal(key, shape, jnp.float32))


class TeaCache:
    """Per-branch step skipper (wan_video_new.py:1154-1203)."""

    COEFFS = {
        "Wan2.1-T2V-1.3B": [-5.21862437e+04, 9.23041404e+03, -5.28275948e+02, 1.36987616e+01, -4.99875664e-02],
        "Wan2.1-T2V-14B": [-3.03318725e+05, 4.90537029e+04, -2.65530556e+03, 5.87365115e+01, -3.15583525e-01],
        "Wan2.1-I2V-14B-480P": [2.57151496e+05, -3.54229917e+04, 1.40286849e+03, -1.35890334e+01, 1.32517977e-01],
        "Wan2.1-I2V-14B-720P": [8.10705460e+03, 2.13393892e+03, -3.72934672e+02, 1.66203073e+01, -4.17769401e-02],
    }

    def __init__(self, num_inference_steps: int, rel_l1_thresh: float, model_id: str):
        if model_id not in self.COEFFS:
            raise ValueError(f"{model_id} is not a supported TeaCache model id "
                             f"(choose from {', '.join(self.COEFFS)})")
        self.num_inference_steps = num_inference_steps
        self.step = 0
        self.accumulated = 0.0
        self.rel_l1_thresh = rel_l1_thresh
        self.coefficients = self.COEFFS[model_id]
        self.previous_t_mod = None
        self.previous_residual = None

    def check(self, t_mod) -> bool:
        """True -> skip the trunk this step and reuse the cached residual."""
        t_mod = np.asarray(t_mod, np.float32)
        if self.step == 0 or self.step == self.num_inference_steps - 1:
            should_calc = True
            self.accumulated = 0.0
        else:
            rel = float(np.abs(t_mod - self.previous_t_mod).mean()
                        / np.abs(self.previous_t_mod).mean())
            self.accumulated += float(np.polyval(self.coefficients, rel))
            if self.accumulated < self.rel_l1_thresh:
                should_calc = False
            else:
                should_calc = True
                self.accumulated = 0.0
        self.previous_t_mod = t_mod
        self.step = (self.step + 1) % self.num_inference_steps
        return not should_calc

    def store(self, residual):
        self.previous_residual = residual


class WanVideoPipeline:
    """Public API mirrors the reference __call__ (wan_video_new.py:416-482)."""

    def __init__(self, dtype=jnp.bfloat16):
        self.dtype = dtype
        self.scheduler = FlowMatchScheduler(
            shift=5.0, sigma_min=0.0, extra_one_step=True)
        self.prompter = WanPrompter()
        self.dit_params = None
        self.dit_cfg: Optional[WanDiTConfig] = None
        self.dit2_params = None
        self.dit2_cfg: Optional[WanDiTConfig] = None
        self.vace_params = None
        self.vace_cfg: Optional[VaceConfig] = None
        self.vace2_params = None
        self.vae_params = None
        self.vae_cfg = V.WAN21_VAE
        self.text_encoder_params = None
        self.t5_cfg: T5Config = UMT5_XXL
        self.image_encoder_params = None
        self.image_encoder_cfg = None
        self.animate_params = None
        self.motion_controller_params = None
        self.s2v_params = None
        self.s2v_cfg = None
        self.sharding_ctx = None
        self._jit_cache = {}

    # ---------------- loading ----------------

    @classmethod
    def from_pretrained(cls, model_configs: List[ModelConfig],
                        tokenizer_path: Optional[str] = None,
                        dtype=jnp.bfloat16, sharding_ctx=None):
        pipe = cls(dtype=dtype)
        pipe.sharding_ctx = sharding_ctx
        for mc in model_configs:
            sd = C.load_state_dict_files(mc.paths())
            kind = mc.model_kind or C.detect_model_kind(sd)
            pipe._attach(kind, sd)
        if tokenizer_path is not None:
            pipe.prompter.fetch_tokenizer(tokenizer_path)
        else:
            # first-run tokenizer discovery from checkpoint sidecars
            all_paths = [p for mc in model_configs for p in mc.paths()]
            pipe.prompter.fetch_tokenizer_near(all_paths)
        if pipe.text_encoder_params is not None:
            pipe.prompter.fetch_models(pipe.text_encoder_params)
        return pipe

    def _attach(self, kind: str, sd):
        if kind in ("dit", "dit2", "dit+vace"):
            dit_sd = {k: v for k, v in sd.items() if not k.startswith("vace")}
            cfg = C.detect_wan_dit_config(dit_sd)
            params = convert_wan_dit(dit_sd, cfg, dtype=self.dtype)
            if kind == "dit2":
                self.dit2_params, self.dit2_cfg = params, cfg
            else:
                self.dit_params, self.dit_cfg = params, cfg
            if kind == "dit+vace":
                self._attach("vace", {k: v for k, v in sd.items()
                                      if k.startswith("vace")})
        elif kind == "vace":
            vcfg = C.detect_vace_config(sd)
            self.vace_cfg = vcfg
            self.vace_params = convert_vace(sd, vcfg, dtype=self.dtype)
        elif kind == "vae":
            self.vae_params = V.convert_wan_vae(sd, dtype=jnp.float32)
        elif kind == "t5":
            from ..models.t5 import convert_t5
            self.text_encoder_params = convert_t5(sd, self.t5_cfg, dtype=self.dtype)
        elif kind == "animate":
            from ..models.wan_animate import convert_wan_animate
            self.animate_params = convert_wan_animate(sd, dtype=self.dtype)
        elif kind == "motion_controller":
            from ..models.wan_controllers import convert_motion_controller
            self.motion_controller_params = convert_motion_controller(
                sd, dtype=self.dtype)
        elif kind == "s2v":
            from ..models.wan_s2v import WanS2VConfig, convert_wan_s2v
            self.s2v_cfg = WanS2VConfig()
            self.s2v_params = convert_wan_s2v(sd, self.s2v_cfg, dtype=self.dtype)
        elif kind == "clip":
            from ..models.clip_vit import convert_clip_vit, CLIP_VIT_H_14
            self.image_encoder_cfg = CLIP_VIT_H_14
            self.image_encoder_params = convert_clip_vit(sd, dtype=self.dtype)
        else:
            raise ValueError(f"unknown model kind {kind}")

    def quantize(self, mode: str = "int8", targets: tuple = ("dit", "dit2",
                                                             "vace"),
                 quantize_attention: bool = False):
        """Quantize DiT linear weights — the TPU analog of the reference
        fp8 path (vram_management/layers.py:115-151; the 4-min ComfyUI
        baseline runs the 14B fp8-quantized). Must run after LoRA merging.
        The output head and modulation tables stay high-precision.

        Modes: "int8" (w8a8, MXU 2x rate), "fp8" (e4m3 storage), "int4"
        (w4a8, 0.5 byte/param — the whole 14B+VACE stack fits one 16 GB
        v5e resident), "int4_g128" (w4a16 group scales, near-bf16 quality).

        quantize_attention additionally routes long-sequence attention
        through the SageAttention-style int8 Pallas kernel (the reference
        chain's sageattention backend, wan_video_dit.py:9-26)."""
        from ..ops.quant import quantize_params
        keep = ("head", "modulation", "time_embedding")

        def pred(path, leaf):
            return not any(k in path for k in keep)

        for t in targets:
            attr = f"{t}_params"
            params = getattr(self, attr, None)
            if params is not None:
                setattr(self, attr, quantize_params(params, mode=mode,
                                                    predicate=pred))
        if quantize_attention:
            from ..ops.attention import set_quantized_attention
            set_quantized_attention(True)
        self._jit_cache.clear()

    def enable_block_streaming(self, mode: str = "int8",
                               hbm_budget_gb: float = 13.5,
                               target: str = "dit", **kw):
        """Run a DiT bigger than HBM — the vram_management capability
        (reference layers.py:95-188 streams every layer CPU->GPU so the
        fp8 14B VACE edit fits 11 GB; README.md:78). Here: as many blocks
        as fit `hbm_budget_gb` stay resident (int8 by default), the rest
        live in host RAM and are multi-stream-prefetched per block,
        overlapped with compute (models/wan_streaming.py).

        Must run after LoRA merging. Animate/FunCamera/FunReference
        conditioning is not routed through the streamer."""
        from ..models.wan_streaming import WanBlockStreamer
        params = getattr(self, f"{target}_params")
        if params is None:
            raise ValueError(f"no params loaded for target {target!r}")
        cfg = self.dit_cfg if target == "dit" else self.dit2_cfg
        vace = self.vace_params if target == "dit" else self.vace2_params
        streamer = WanBlockStreamer(params, cfg, vace, self.vace_cfg,
                                    mode=mode, hbm_budget_gb=hbm_budget_gb,
                                    **kw)
        if not hasattr(self, "_streamers"):
            self._streamers = {}
        self._streamers[target] = streamer
        # free the fully-resident device copies (the streamer owns its own)
        setattr(self, f"{target}_params", None)
        if target == "dit":
            self.vace_params = None
        else:
            self.vace2_params = None
        self._jit_cache.clear()
        return streamer.plan_summary()

    def load_lora(self, target: str = "dit", path: Optional[str] = None,
                  state_dict=None, alpha: float = 1.0,
                  hotload: bool = False):
        """Merge a LoRA into `dit`/`dit2`/`vace` weights
        (wan_video_new.py:80-106 -> lora/__init__.py:28-46).

        hotload=True keeps the pristine base weights and the LoRA stack
        around (the reference's vram_management hotload lists,
        vram_management/layers.py:152-170): `set_lora_scale` rescales and
        `unload_loras` restores without re-reading checkpoints."""
        sd = state_dict if state_dict is not None else C.load_state_dict(path)
        attr = f"{target}_params"
        if hotload:
            if not hasattr(self, "_lora_stacks"):
                self._lora_stacks = {}
            if target not in self._lora_stacks:
                self._lora_stacks[target] = {"base": getattr(self, attr),
                                             "loras": []}
            self._lora_stacks[target]["loras"].append([sd, alpha])
            self._reapply_loras(target)
            return
        setattr(self, attr, merge_lora(getattr(self, attr), sd, alpha=alpha))
        self._jit_cache.clear()

    def _reapply_loras(self, target: str):
        stack = self._lora_stacks[target]
        params = stack["base"]
        for sd, alpha in stack["loras"]:
            if alpha != 0.0:
                params = merge_lora(params, sd, alpha=alpha)
        setattr(self, f"{target}_params", params)
        self._jit_cache.clear()

    def set_lora_scale(self, target: str = "dit", alpha: float = 1.0,
                       index: int = -1):
        """Rescale a hotloaded LoRA at runtime (no checkpoint IO)."""
        self._lora_stacks[target]["loras"][index][1] = alpha
        self._reapply_loras(target)

    def unload_loras(self, target: str = "dit"):
        """Restore the pristine base weights for `target`."""
        stack = getattr(self, "_lora_stacks", {}).pop(target, None)
        if stack is not None:
            setattr(self, f"{target}_params", stack["base"])
            self._jit_cache.clear()

    # ---------------- conditioning units ----------------

    def check_resize(self, height, width, num_frames):
        """ShapeChecker (utils/__init__.py:43-57): /16 spatial, 4k+1 frames."""
        div = self.vae_cfg.upsampling_factor * 2
        if height % div != 0:
            height = (height + div - 1) // div * div
        if width % div != 0:
            width = (width + div - 1) // div * div
        if num_frames % 4 != 1:
            num_frames = (num_frames + 3) // 4 * 4 + 1
        return height, width, num_frames

    def encode_prompt(self, prompt: str) -> jnp.ndarray:
        return self.prompter.encode_prompt(prompt, dtype=self.dtype)

    def encode_video(self, video_np, tiled=True, tile_size=(30, 52),
                     tile_stride=(15, 26)):
        lat = V.encode(self.vae_params, jnp.asarray(video_np, jnp.float32),
                       self.vae_cfg, tiled=tiled, tile_size=tile_size,
                       tile_stride=tile_stride)
        return lat.astype(self.dtype)

    def decode_video(self, latents, tiled=True, tile_size=(30, 52),
                     tile_stride=(15, 26)):
        return V.decode(self.vae_params, jnp.asarray(latents, jnp.float32),
                        self.vae_cfg, tiled=tiled, tile_size=tile_size,
                        tile_stride=tile_stride)

    def build_vace_context(self, vace_video, vace_video_mask,
                           vace_reference_image, height, width, num_frames,
                           tiled, tile_size, tile_stride):
        """WanVideoUnit_VACE (wan_video_new.py:861-920): inactive/reactive
        encodes + 64-ch downsampled mask -> 96-ch context."""
        if vace_video is None and vace_video_mask is None and vace_reference_image is None:
            return None
        if vace_video is None:
            video = np.zeros((1, 3, num_frames, height, width), np.float32)
        else:
            video = _preprocess_images(vace_video)
        if vace_video_mask is None:
            mask = np.ones_like(video)
        else:
            mask = (_preprocess_images(vace_video_mask) + 1.0) / 2.0

        inactive = video * (1 - mask)
        reactive = video * mask
        kw = dict(tiled=tiled, tile_size=tile_size, tile_stride=tile_stride)
        # one batch-2 VAE pass instead of two batch-1 passes: per-tile fixed
        # overheads amortize and the convs see 2x batch on the MXU
        # (identical math — batch entries are independent in every conv/norm)
        both = self.encode_video(np.concatenate([inactive, reactive], axis=0),
                                 **kw)
        vace_video_latents = jnp.concatenate([both[0:1], both[1:2]], axis=1)

        # mask -> (1, 64, T_lat, H/8, W/8): 8x8 shuffle + nearest temporal
        m = mask[0, 0]                                       # (T, H, W)
        T, H, W = m.shape
        m = m.reshape(T, H // 8, 8, W // 8, 8).transpose(0, 2, 4, 1, 3)
        m = m.reshape(1, T, 64, H // 8, W // 8).transpose(0, 2, 1, 3, 4)
        t_lat = (T + 3) // 4
        # nearest-exact temporal downsample (F.interpolate mode="nearest-exact"
        # at wan_video_new.py:894): sample at bin centers (i + 0.5) * T / t_lat
        idx = np.minimum(np.floor((np.arange(t_lat) + 0.5) * (T / t_lat)).astype(int), T - 1)
        mask_lat = jnp.asarray(m[:, :, idx], self.dtype)

        if vace_reference_image is not None:
            ref = _preprocess_images(
                vace_reference_image if isinstance(vace_reference_image, list)
                else [vace_reference_image])
            ref_lat = self.encode_video(ref, **kw)
            ref_lat = jnp.concatenate([ref_lat, jnp.zeros_like(ref_lat)], axis=1)
            vace_video_latents = jnp.concatenate([ref_lat, vace_video_latents], axis=2)
            mask_lat = jnp.concatenate(
                [jnp.zeros_like(mask_lat[:, :, :ref_lat.shape[2]]), mask_lat], axis=2)
        return jnp.concatenate([vace_video_latents, mask_lat], axis=1)

    def build_image_conditioning(self, input_image, end_image, num_frames,
                                 height, width, tiled, tile_size, tile_stride):
        """I2V units (WanVideoUnit_ImageEmbedderCLIP/VAE,
        wan_video_new.py:674-728): CLIP features of the first (and optionally
        last) frame + y = [4-ch temporal mask | VAE latent of the padded
        clip]."""
        if input_image is None or self.dit_cfg is None or not self.dit_cfg.has_image_input:
            return None, None
        img = input_image.resize((width, height))
        img_np = _preprocess_images([img])[:, :, 0]          # (1, 3, H, W)
        clip_feature = None
        if self.image_encoder_params is not None and self.dit_cfg.require_clip_embedding:
            from ..models.clip_vit import encode_image
            clip_feature = encode_image(self.image_encoder_params, img_np,
                                        self.image_encoder_cfg, dtype=self.dtype)
            if end_image is not None and self.dit_cfg.has_image_pos_emb:
                end_np = _preprocess_images([end_image.resize((width, height))])[:, :, 0]
                clip_end = encode_image(self.image_encoder_params, end_np,
                                        self.image_encoder_cfg, dtype=self.dtype)
                clip_feature = jnp.concatenate([clip_feature, clip_end], axis=1)
        y = None
        if self.dit_cfg.require_vae_embedding:
            up = self.vae_cfg.upsampling_factor
            msk = np.ones((1, num_frames, height // up, width // up), np.float32)
            msk[:, 1:] = 0
            vae_input = np.zeros((1, 3, num_frames, height, width), np.float32)
            vae_input[:, :, 0] = img_np[0]
            if end_image is not None:
                end_np = _preprocess_images([end_image.resize((width, height))])[:, :, 0]
                vae_input[:, :, -1] = end_np[0]
                msk[:, -1:] = 1
            msk = np.concatenate([np.repeat(msk[:, 0:1], 4, axis=1), msk[:, 1:]], axis=1)
            msk = msk.reshape(1, msk.shape[1] // 4, 4, height // up, width // up)
            msk = msk.transpose(0, 2, 1, 3, 4)[0]            # (4, T_lat, h, w)
            lat = self.encode_video(vae_input, tiled=tiled, tile_size=tile_size,
                                    tile_stride=tile_stride)
            y = jnp.concatenate([jnp.asarray(msk, self.dtype)[None], lat], axis=1)
        return clip_feature, y

    def build_fun_control(self, control_video, num_frames, height, width,
                          clip_feature, y, tiled=True, tile_size=(30, 52),
                          tile_stride=(15, 26)):
        """WanVideoUnit_FunControl (wan_video_new.py:752-774): control-video
        latents prepended onto the y channels; zero clip/y when absent."""
        kw = dict(tiled=tiled, tile_size=tile_size, tile_stride=tile_stride)
        z = self.vae_cfg.z_dim
        up = self.vae_cfg.upsampling_factor
        control_latents = self.encode_video(_preprocess_images(control_video), **kw)
        y_dim = self.dit_cfg.in_dim - control_latents.shape[1] - z
        t_lat = (num_frames - 1) // 4 + 1
        if clip_feature is None or y is None:
            clip_feature = jnp.zeros((1, 257, 1280), self.dtype)
            y = jnp.zeros((1, y_dim, t_lat, height // up, width // up), self.dtype)
        else:
            y = y[:, -y_dim:]
        return clip_feature, jnp.concatenate([control_latents, y], axis=1)

    def build_fun_reference(self, reference_image, height, width):
        """WanVideoUnit_FunReference (wan_video_new.py:777-795): one-frame VAE
        latent (for ref_conv) + CLIP feature when an image encoder exists."""
        ref_img = reference_image.resize((width, height))
        reference_latents = self.encode_video(
            _preprocess_images([ref_img]), tiled=False)
        clip_feature = None
        if (self.image_encoder_params is not None
                and self.dit_cfg.require_clip_embedding):
            from ..models.clip_vit import encode_image
            clip_feature = encode_image(
                self.image_encoder_params, _preprocess_images([ref_img])[:, :, 0],
                self.image_encoder_cfg, dtype=self.dtype)
        return reference_latents, clip_feature

    def build_fun_camera_control(self, direction, speed, origin, input_image,
                                 num_frames, height, width, latents_shape,
                                 tiled=True, tile_size=(30, 52),
                                 tile_stride=(15, 26)):
        """WanVideoUnit_FunCameraControl (wan_video_new.py:799-845): packed
        Plücker embedding for the DiT control adapter + first-frame y."""
        from ..models.wan_controllers import (
            process_camera_coordinates, pack_camera_latents)
        kw = dict(tiled=tiled, tile_size=tile_size, tile_stride=tile_stride)
        z = self.vae_cfg.z_dim
        up = self.vae_cfg.upsampling_factor
        plucker = process_camera_coordinates(direction, num_frames, height,
                                             width, speed, origin)
        control_camera = jnp.asarray(
            pack_camera_latents(plucker, num_frames), self.dtype)
        if input_image is None:
            raise ValueError("camera control requires input_image")
        cam_img = input_image.resize((width, height))
        input_lat = self.encode_video(_preprocess_images([cam_img]), tiled=False)
        y_cam = jnp.zeros(latents_shape, self.dtype)
        y_cam = y_cam.at[:, :, :1].set(input_lat.astype(self.dtype))
        if y_cam.shape[1] != self.dit_cfg.in_dim - z:
            # InP-style y: [4-ch temporal mask | padded-clip latent] (:836-845)
            vae_input = np.zeros((1, 3, num_frames, height, width), np.float32)
            vae_input[:, :, 0] = _preprocess_images([cam_img])[:, :, 0]
            lat = self.encode_video(vae_input, **kw)
            msk = np.ones((1, num_frames, height // up, width // up), np.float32)
            msk[:, 1:] = 0
            msk = np.concatenate([np.repeat(msk[:, 0:1], 4, axis=1), msk[:, 1:]], axis=1)
            msk = msk.reshape(1, msk.shape[1] // 4, 4, height // up, width // up)
            msk = msk.transpose(0, 2, 1, 3, 4)[0]
            y_cam = jnp.concatenate(
                [jnp.asarray(msk, self.dtype)[None], lat], axis=1)
        return control_camera, y_cam

    # ---------------- jitted model functions ----------------

    def _model_fns(self, which: str, use_vace: bool, rope_indices=None,
                   use_image: bool = False, use_animate: bool = False,
                   use_motion: bool = False, use_camera: bool = False,
                   use_ref: bool = False):
        """Build (full, skip, t_mod) jitted fns for a DiT expert.

        full: -> (velocity, trunk_residual); skip: replay cached residual
        (TeaCache update path, wan_video_new.py:1418-1419,1455-1456).
        use_motion/use_camera/use_ref wire the SpeedControl / FunCameraControl
        / FunReference conditioning of model_fn_wan_video
        (wan_video_new.py:1355-1357,1373-1375,1385-1390,1464-1467).
        """
        key = (which, use_vace, use_image, use_animate, use_motion, use_camera,
               use_ref,
               None if rope_indices is None else tuple(np.asarray(rope_indices).tolist()))
        if key in self._jit_cache:
            return self._jit_cache[key]
        cfg = self.dit_cfg if which == "dit" else self.dit2_cfg
        vcfg = self.vace_cfg
        ri = None if rope_indices is None else np.asarray(rope_indices)

        def _assemble_tokens(params, latents, control_camera, reference_latents):
            """patchify + camera-adapter add + reference-token prepend.

            Shared by full and skip so the TeaCache residual lines up."""
            tokens, (f, h, w) = M.patchify(params["patch_embedding"], latents,
                                           cfg.patch_size)
            if use_camera:
                from ..models.wan_controllers import simple_adapter_forward
                cam = simple_adapter_forward(params["control_adapter"],
                                             control_camera.astype(tokens.dtype))
                cam = cam.transpose(0, 2, 3, 4, 1).reshape(
                    cam.shape[0], -1, cam.shape[1])
                tokens = tokens + cam
            n_ref = 0
            if use_ref:
                # ref_conv on the single reference frame, tokens prepended as
                # an extra leading RoPE frame (wan_video_new.py:1385-1390)
                ref_tokens, _ = M.patchify(params["ref_conv"], reference_latents,
                                           (1,) + tuple(cfg.patch_size[1:]))
                tokens = jnp.concatenate([ref_tokens, tokens], axis=1)
                n_ref = ref_tokens.shape[1]
            return tokens, (f, h, w), n_ref

        def full(params, vace_params, latents, timestep, context,
                 vace_context, vace_scale, clip_feature=None, y=None,
                 animate_params=None, pose_latents=None, face_values=None,
                 motion_params=None, motion_bucket_id=None,
                 control_camera=None, reference_latents=None,
                 layer_gate=None):
            t, t_mod = M.time_embed(params, cfg, timestep)
            if use_motion:
                from ..models.wan_controllers import motion_controller_forward
                mc = motion_controller_forward(motion_params, motion_bucket_id)
                t_mod = t_mod + mc.reshape(mc.shape[0], 6, cfg.dim).astype(t_mod.dtype)
            ctx = M.text_embed(params, context)
            if use_image:
                if y is not None and cfg.require_vae_embedding:
                    latents = jnp.concatenate([latents, y.astype(latents.dtype)], axis=1)
                if clip_feature is not None and cfg.require_clip_embedding:
                    clip_emb = M.img_embed(params, clip_feature)
                    ctx = jnp.concatenate([clip_emb, ctx], axis=1)
            tokens, (f, h, w), n_ref = _assemble_tokens(
                params, latents, control_camera, reference_latents)
            from ..parallel.context import constrain
            cos, sin = assemble_freqs_grid(cfg.head_dim, f + (1 if use_ref else 0),
                                           h, w, ri)
            # pad -> shard -> unpad (the reference's chunk+pad before rank
            # slicing, xdit_context_parallel.py:76-80): ragged shapes like
            # the flagship 29,640-token edit now shard on sp instead of
            # silently serializing; padded keys are masked exactly per layer
            tokens, cos, sin, seq_valid = M.pad_tokens_for_mesh(
                tokens, cos, sin)
            tokens = constrain(tokens, "dp", "sp", None)
            hints = None
            if use_vace:
                hints = vace_forward(vace_params, vcfg, tokens, vace_context,
                                     ctx, t_mod, cos, sin,
                                     seq_valid=seq_valid)
            seg_layers = None
            seg_cb = None
            if use_animate:
                # Animate (wan_video_animate_adapter.py:582-609): pose tokens
                # added to frames 1.., face blocks fused every 5th layer.
                # The grid reshapes need the unpadded length; mesh padding
                # (if any) is stripped and re-applied around each hook.
                from ..models import wan_animate as A
                s_real = f * h * w

                def _unpad(x):
                    return x[:, :s_real] if seq_valid is not None else x

                def _repad(x):
                    if seq_valid is None:
                        return x
                    return jnp.pad(x, ((0, 0),
                                       (0, tokens.shape[1] - s_real),
                                       (0, 0)))

                tokens5 = _unpad(tokens).reshape(
                    tokens.shape[0], f, h, w, cfg.dim)
                tokens5 = tokens5.transpose(0, 4, 1, 2, 3)
                tokens5, motion_vec = A.animate_after_patch_embedding(
                    animate_params, tokens5, pose_latents, face_values)
                tokens = _repad(tokens5.transpose(0, 2, 3, 4, 1).reshape(
                    tokens.shape[0], s_real, cfg.dim))
                seg_layers = tuple(range(0, cfg.num_layers, 5))

                def seg_cb(i, x):
                    return _repad(A.animate_after_transformer_block(
                        animate_params, i * 5, _unpad(x), motion_vec,
                        heads_num=cfg.num_heads))
            tokens_pre = tokens
            tokens = M.run_blocks(params["blocks"], tokens, ctx, t_mod, cos,
                                  sin, cfg, vace_hints=hints,
                                  vace_layers=None if hints is None else vcfg.vace_layers,
                                  vace_scale=vace_scale,
                                  segment_layers=seg_layers,
                                  segment_callback=seg_cb,
                                  seq_valid=seq_valid,
                                  layer_gate=layer_gate)
            residual = tokens - tokens_pre
            out = M.head(params, cfg, tokens, t)
            if seq_valid is not None:
                out = out[:, :seq_valid]
            if n_ref:
                out = out[:, n_ref:]   # drop reference tokens (:1464-1467)
            v = M.unpatchify(out, (f, h, w), cfg.patch_size, cfg.out_dim)
            return v, t_mod, residual

        def skip(params, latents, timestep, context, residual, y=None,
                 control_camera=None, reference_latents=None):
            t, t_mod = M.time_embed(params, cfg, timestep)
            if use_image and y is not None and cfg.require_vae_embedding:
                latents = jnp.concatenate([latents, y.astype(latents.dtype)], axis=1)
            tokens, (f, h, w), n_ref = _assemble_tokens(
                params, latents, control_camera, reference_latents)
            # the cached residual carries the full path's mesh padding;
            # match it so `tokens + residual` lines up, then unpad after
            # the head exactly like full()
            seq_valid = None
            if residual.shape[1] > tokens.shape[1]:
                seq_valid = tokens.shape[1]
                tokens = jnp.pad(
                    tokens, ((0, 0),
                             (0, residual.shape[1] - tokens.shape[1]),
                             (0, 0)))
            tokens = tokens + residual
            out = M.head(params, cfg, tokens, t)
            if seq_valid is not None:
                out = out[:, :seq_valid]
            if n_ref:
                out = out[:, n_ref:]
            return M.unpatchify(out, (f, h, w), cfg.patch_size, cfg.out_dim)

        def t_mod_only(params, timestep):
            _, t_mod = M.time_embed(params, cfg, timestep)
            return t_mod

        fns = (jax.jit(full), jax.jit(skip), jax.jit(t_mod_only))
        self._jit_cache[key] = fns
        return fns

    def _branch_forward(self, which, params, vace_params, latents, timestep,
                        context, vace_context, vace_scale, tea_cache,
                        rope_indices=None, clip_feature=None, y=None,
                        animate_inputs=None, motion_bucket_id=None,
                        control_camera=None, reference_latents=None,
                        layer_gate=None):
        use_vace = vace_context is not None
        use_image = clip_feature is not None or y is not None
        use_animate = animate_inputs is not None
        use_motion = motion_bucket_id is not None
        use_camera = control_camera is not None
        use_ref = reference_latents is not None
        if use_animate and (use_ref or use_camera):
            raise ValueError("animate conditioning cannot combine with "
                             "FunReference/FunCameraControl")
        streamer = getattr(self, "_streamers", {}).get(which)
        if streamer is not None:
            if use_animate or use_motion or use_camera or use_ref:
                raise ValueError("block streaming supports the T2V/VACE/I2V/"
                                 "editor paths; per-layer adapter "
                                 "conditioning needs the resident path")
            if layer_gate is not None:
                raise ValueError("skip-layer guidance (slg_blocks) needs the "
                                 "resident path; disable block streaming")
            if tea_cache is not None:
                t_mod = streamer.t_mod_only(timestep)
                if tea_cache.check(t_mod) and \
                        tea_cache.previous_residual is not None:
                    return streamer.skip_forward(
                        latents, timestep, context,
                        tea_cache.previous_residual, y)
            v, _, residual = streamer.forward(
                latents, timestep, context, vace_context,
                jnp.asarray(vace_scale, jnp.float32), clip_feature, y,
                rope_indices=rope_indices,
                want_residual=tea_cache is not None)
            if tea_cache is not None:
                tea_cache.store(residual)
            return v
        full, skip, t_mod_only = self._model_fns(which, use_vace, rope_indices,
                                                 use_image, use_animate,
                                                 use_motion, use_camera, use_ref)
        vs = jnp.asarray(vace_scale, jnp.float32)
        if tea_cache is not None:
            t_mod = t_mod_only(params, timestep)
            if tea_cache.check(t_mod) and tea_cache.previous_residual is not None:
                return skip(params, latents, timestep, context,
                            tea_cache.previous_residual, y,
                            control_camera, reference_latents)
        pose_latents = face_values = None
        if use_animate:
            pose_latents, face_values = animate_inputs
        v, _, residual = full(params, vace_params, latents, timestep,
                              context, vace_context, vs, clip_feature, y,
                              self.animate_params if use_animate else None,
                              pose_latents, face_values,
                              self.motion_controller_params if use_motion else None,
                              motion_bucket_id, control_camera,
                              reference_latents, layer_gate)
        if tea_cache is not None:
            tea_cache.store(residual)
        return v

    def _forward_all_branches(self, which, params, vace_params, latents,
                              timestep, ctx_posi, ctx_nega, vace_context,
                              vace_scale, cfg_scale, tc_posi, tc_nega,
                              cfg_merge=False, rope_indices=None,
                              clip_feature=None, y=None, animate_inputs=None,
                              motion_bucket_id=None, control_camera=None,
                              reference_latents=None, slg_gate=None):
        """One denoise velocity: CFG via merged batch or two passes.

        slg_gate: optional (num_layers,) keep-gate for skip-layer guidance —
        applied to the UNCONDITIONAL branch only (the ComfyUI WanVideoSLG
        semantics: the skipped blocks degrade the uncond prediction, which
        the CFG difference then amplifies away from). Per-batch-row gating
        keeps cfg_merge's single batched forward intact: the merged gate is
        ones for the posi rows and slg_gate for the nega rows.
        """
        fun = dict(motion_bucket_id=motion_bucket_id,
                   control_camera=control_camera,
                   reference_latents=reference_latents)
        if cfg_scale == 1.0 or ctx_nega is None:
            return self._branch_forward(which, params, vace_params, latents,
                                        timestep, ctx_posi, vace_context,
                                        vace_scale, tc_posi,
                                        rope_indices=rope_indices,
                                        clip_feature=clip_feature, y=y,
                                        animate_inputs=animate_inputs, **fun)
        if cfg_merge:
            # CfgMerger (wan_video_new.py:951-969): one batched forward.
            # The reference clears inputs_posi/nega in merged mode, dropping
            # the per-branch TeaCaches — so no tea_cache here. Shared animate
            # conditioning is duplicated onto the merged batch (the reference
            # keeps pose_latents in inputs_shared and relies on broadcasting).
            ctx = jnp.concatenate([ctx_posi, ctx_nega], axis=0)
            lat2 = jnp.concatenate([latents, latents], axis=0)
            vc2 = None if vace_context is None else jnp.concatenate(
                [vace_context, vace_context], axis=0)
            cf2 = None if clip_feature is None else jnp.concatenate(
                [clip_feature, clip_feature], axis=0)
            y2 = None if y is None else jnp.concatenate([y, y], axis=0)
            ai2 = None if animate_inputs is None else tuple(
                jnp.concatenate([a, a], axis=0) for a in animate_inputs)
            fun2 = dict(fun)
            if reference_latents is not None:
                fun2["reference_latents"] = jnp.concatenate(
                    [reference_latents, reference_latents], axis=0)
            gate2 = None
            if slg_gate is not None:
                b = latents.shape[0]
                g = jnp.asarray(slg_gate, jnp.float32)[:, None]
                gate2 = jnp.concatenate(
                    [jnp.ones((g.shape[0], b), jnp.float32),
                     jnp.tile(g, (1, b))], axis=1)
            v2 = self._branch_forward(which, params, vace_params, lat2,
                                      timestep, ctx, vc2, vace_scale, None,
                                      rope_indices=rope_indices,
                                      clip_feature=cf2, y=y2,
                                      animate_inputs=ai2, layer_gate=gate2,
                                      **fun2)
            v_posi, v_nega = v2[:1], v2[1:]
        else:
            v_posi = self._branch_forward(which, params, vace_params, latents,
                                          timestep, ctx_posi, vace_context,
                                          vace_scale, tc_posi,
                                          rope_indices=rope_indices,
                                          clip_feature=clip_feature, y=y,
                                          animate_inputs=animate_inputs, **fun)
            gate1 = None
            if slg_gate is not None:
                gate1 = jnp.tile(
                    jnp.asarray(slg_gate, jnp.float32)[:, None],
                    (1, latents.shape[0]))
            v_nega = self._branch_forward(which, params, vace_params, latents,
                                          timestep, ctx_nega, vace_context,
                                          vace_scale, tc_nega,
                                          rope_indices=rope_indices,
                                          clip_feature=clip_feature, y=y,
                                          animate_inputs=animate_inputs,
                                          layer_gate=gate1, **fun)
        return v_nega + cfg_scale * (v_posi - v_nega)

    @staticmethod
    def _temporal_ramp(length, left_bound, right_bound, border):
        """TemporalTiler 1-D ramp with 0.5 shift (wan_video_new.py:1211-1221)."""
        x = np.ones((length,), np.float32)
        if border > 0:
            if not left_bound:
                x[:border] = (np.arange(border) + 0.5) / border
            if not right_bound:
                x[-border:] = ((np.arange(border) + 0.5) / border)[::-1]
        return x

    def _sliding_window_velocity(self, window_size, window_stride, fwd_fn,
                                 latents, y=None, vace_context=None):
        """Temporal sliding window with ramp blending
        (TemporalTiler_BCTHW.run, wan_video_new.py:1229-1256).

        The reference tiles ``tensor_names=["latents", "y"]`` and forwards the
        remaining model kwargs unchanged (wan_video_new.py:1291-1315). We also
        slice ``vace_context`` per window (its temporal latent axis lines up
        with the trunk latents), so long-video VACE editing stays conditioned
        — forwarding it whole would mismatch the trunk token count.
        """
        T = latents.shape[2]
        value = np.zeros(latents.shape, np.float32)
        weight = np.zeros((1, 1, T, 1, 1), np.float32)
        for t0 in range(0, T, window_stride):
            if t0 - window_stride >= 0 and t0 - window_stride + window_size >= T:
                continue
            t1 = min(t0 + window_size, T)
            y_w = None if y is None else y[:, :, t0:t1]
            vc_w = None if vace_context is None else vace_context[:, :, t0:t1]
            v = np.asarray(fwd_fn(latents[:, :, t0:t1], y_w, vc_w), np.float32)
            mask = self._temporal_ramp(
                t1 - t0, t0 == 0, t1 == T,
                window_size - window_stride)[None, None, :, None, None]
            value[:, :, t0:t1] += v * mask
            weight[:, :, t0:t1] += mask
        return jnp.asarray(value / weight)

    def s2v(self, prompt: str, ref_image, audio_input,
            negative_prompt: str = "", num_frames: int = 80,
            height: int = 448, width: int = 832, cfg_scale: float = 4.5,
            num_inference_steps: int = 40, sigma_shift: float = 5.0,
            motion_latents=None, pose_video=None, seed=None,
            tiled: bool = False, tile_size=(30, 52), tile_stride=(15, 26),
            return_latents: bool = False):
        """Speech-to-video generation (model_fn_wans2v path,
        wan_video_new.py:1471+): reference-image latent fused at frame 0,
        audio features injected per block.

        audio_input: (1, num_audio_layers, audio_dim, num_frames) wav2vec
        layer features (extract with transformers.Wav2Vec2Model) — the
        `audio_embeds` contract of the reference unit.
        """
        from ..models.wan_s2v import wan_s2v_forward
        if self.s2v_params is None:
            raise RuntimeError("no S2V model attached")
        kw = dict(tiled=tiled, tile_size=tile_size, tile_stride=tile_stride)
        self.scheduler.set_timesteps(num_inference_steps, shift=sigma_shift)
        ref_np = _preprocess_images([ref_image.resize((width, height))])
        ref_lat = self.encode_video(ref_np, **kw)
        z = self.vae_cfg.z_dim
        up = self.vae_cfg.upsampling_factor
        t_lat = (num_frames - 1) // 4 + 1
        noise = jnp.asarray(generate_noise(
            (1, z, t_lat, height // up, width // up), seed=seed), self.dtype)
        latents = jnp.concatenate([ref_lat, noise], axis=2)

        pose_cond = None
        if pose_video is not None:
            pose_cond = self.encode_video(_preprocess_images(pose_video), **kw)

        ctx_posi = self.encode_prompt(prompt)
        ctx_nega = self.encode_prompt(negative_prompt) if cfg_scale != 1.0 else None

        cfg = self.s2v_cfg
        fwd = jax.jit(lambda params, lat, t, ctx, audio: wan_s2v_forward(
            params, cfg, lat, t, ctx, audio, motion_latents=motion_latents,
            pose_cond=pose_cond))
        audio = jnp.asarray(audio_input, self.dtype)
        for i in range(len(self.scheduler.timesteps)):
            t_host = float(self.scheduler.timesteps[i])
            timestep = jnp.asarray([t_host], jnp.float32)
            v_posi = fwd(self.s2v_params, latents, timestep, ctx_posi, audio)
            if cfg_scale != 1.0:
                v_nega = fwd(self.s2v_params, latents, timestep, ctx_nega, audio)
                v = v_nega + cfg_scale * (v_posi - v_nega)
            else:
                v = v_posi
            sigma, sigma_next = self.scheduler.sigma_pair(i)
            latents = (latents.astype(jnp.float32)
                       + v.astype(jnp.float32) * (sigma_next - sigma)).astype(self.dtype)
            latents = latents.at[:, :, :1].set(ref_lat.astype(self.dtype))
        latents = latents[:, :, 1:]
        if return_latents:
            return latents
        return self.vae_output_to_video(self.decode_video(latents, **kw))

    # ---------------- main call ----------------

    def __call__(
        self,
        prompt: str,
        negative_prompt: str = "",
        input_image=None,
        end_image=None,
        input_video=None,
        denoising_strength: float = 1.0,
        vace_video=None,
        vace_video_mask=None,
        vace_reference_image=None,
        vace_scale: float = 1.0,
        animate_pose_video=None,
        animate_face_video=None,
        control_video=None,
        reference_image=None,
        camera_control_direction: Optional[str] = None,
        camera_control_speed: float = 1 / 54,
        camera_control_origin=None,
        motion_bucket_id: Optional[float] = None,
        seed: Optional[int] = None,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        cfg_scale: float = 5.0,
        cfg_merge: bool = False,
        switch_DiT_boundary: float = 0.875,
        num_inference_steps: int = 50,
        sigma_shift: float = 5.0,
        tiled: bool = True,
        tile_size: Tuple[int, int] = (30, 52),
        tile_stride: Tuple[int, int] = (15, 26),
        sliding_window_size: Optional[int] = None,
        sliding_window_stride: Optional[int] = None,
        tea_cache_l1_thresh: Optional[float] = None,
        tea_cache_model_id: str = "",
        slg_blocks: Optional[Tuple[int, ...]] = None,
        slg_start: float = 0.0,
        slg_end: float = 1.0,
        progress_bar_cmd=None,
        return_latents: bool = False,
    ):
        height, width, num_frames = self.check_resize(height, width, num_frames)
        self.scheduler.set_timesteps(num_inference_steps,
                                     denoising_strength=denoising_strength,
                                     shift=sigma_shift)
        kw = dict(tiled=tiled, tile_size=tile_size, tile_stride=tile_stride)

        # Noise (NoiseInitializer, wan_video_new.py:574-587)
        length = (num_frames - 1) // 4 + 1
        ref_count = 0
        if vace_reference_image is not None:
            ref_count = len(vace_reference_image) if isinstance(vace_reference_image, list) else 1
            length += ref_count
        z = self.vae_cfg.z_dim
        up = self.vae_cfg.upsampling_factor
        noise = generate_noise((1, z, length, height // up, width // up), seed=seed)
        if ref_count:
            noise = np.concatenate([noise[:, :, -ref_count:], noise[:, :, :-ref_count]], axis=2)
        noise = jnp.asarray(noise, self.dtype)

        # Input video (InputVideoEmbedder, :591-614)
        if input_video is not None:
            input_latents = self.encode_video(_preprocess_images(input_video), **kw)
            if vace_reference_image is not None:
                ref = _preprocess_images(
                    vace_reference_image if isinstance(vace_reference_image, list)
                    else [vace_reference_image])
                ref_lat = self.encode_video(ref, tiled=False)
                input_latents = jnp.concatenate([ref_lat, input_latents], axis=2)
            latents = jnp.asarray(self.scheduler.add_noise(
                np.asarray(input_latents, np.float32), np.asarray(noise, np.float32),
                self.scheduler.timesteps[0]), self.dtype)
        else:
            latents = noise

        # Prompts
        ctx_posi = self.encode_prompt(prompt)
        ctx_nega = self.encode_prompt(negative_prompt) if cfg_scale != 1.0 else None

        # VACE
        vace_context = self.build_vace_context(
            vace_video, vace_video_mask, vace_reference_image,
            height, width, num_frames, **kw)

        # I2V (ImageEmbedderCLIP/VAE units)
        clip_feature, y = self.build_image_conditioning(
            input_image, end_image, num_frames, height, width, **kw)

        # FunControl / FunReference / FunCameraControl / SpeedControl units
        if control_video is not None:
            clip_feature, y = self.build_fun_control(
                control_video, num_frames, height, width, clip_feature, y, **kw)
        reference_latents = None
        if reference_image is not None:
            reference_latents, clip_ref = self.build_fun_reference(
                reference_image, height, width)
            if clip_ref is not None:
                clip_feature = clip_ref
        control_camera = None
        if camera_control_direction is not None:
            control_camera, y = self.build_fun_camera_control(
                camera_control_direction, camera_control_speed,
                camera_control_origin, input_image, num_frames, height, width,
                latents.shape, **kw)
        if motion_bucket_id is not None:
            if self.motion_controller_params is None:
                raise RuntimeError("motion_bucket_id given but no motion "
                                   "controller attached")
            motion_bucket_id = jnp.asarray([motion_bucket_id], jnp.float32)

        # TI2V-5B fused path (ImageEmbedderFused, wan_video_new.py:731-748):
        # first-frame latent written into the noise and pinned each step
        first_frame_latents = None
        if (input_image is not None and self.dit_cfg is not None
                and self.dit_cfg.fuse_vae_embedding_in_latents):
            img_np = _preprocess_images([input_image.resize((width, height))])
            z0 = self.encode_video(img_np, **kw)
            first_frame_latents = z0.astype(self.dtype)
            latents = latents.at[:, :, 0:1].set(first_frame_latents)

        # Animate (pose latents via VAE, face pixel values at 512x512)
        animate_inputs = None
        if (animate_pose_video is not None and animate_face_video is not None
                and self.animate_params is not None):
            pose_lat = self.encode_video(_preprocess_images(animate_pose_video), **kw)
            fsz = getattr(self, "animate_face_size", 512)
            faces = [im.resize((fsz, fsz)) for im in animate_face_video]
            face_values = jnp.asarray(_preprocess_images(faces), self.dtype)
            animate_inputs = (pose_lat, face_values)

        # TeaCache per branch
        tc_posi = tc_nega = None
        if tea_cache_l1_thresh is not None:
            tc_posi = TeaCache(num_inference_steps, tea_cache_l1_thresh, tea_cache_model_id)
            tc_nega = TeaCache(num_inference_steps, tea_cache_l1_thresh, tea_cache_model_id)

        # Denoise loop (wan_video_new.py:515-542)
        from ..utils.profiling import make_step_timer, annotate
        timer = make_step_timer("wan_denoise_step")
        which = "dit"
        params, vace_params = self.dit_params, self.vace_params
        steps = range(len(self.scheduler.timesteps))
        if progress_bar_cmd is not None:
            steps = progress_bar_cmd(steps)
        n_steps = len(self.scheduler.timesteps)
        for i in steps:
            _t0 = time.perf_counter() if timer is not None else 0.0
            t_host = float(self.scheduler.timesteps[i])
            if (which == "dit" and self.dit2_params is not None
                    and t_host < switch_DiT_boundary * self.scheduler.num_train_timesteps):
                which = "dit2"
                params, vace_params = self.dit2_params, self.vace2_params or self.vace_params
            timestep = jnp.asarray([t_host], jnp.float32)
            # Skip-layer guidance (the ComfyUI WanVideoSLG node in the
            # shipped Ditto workflow): inside [slg_start, slg_end) step
            # progress, the listed blocks are skipped on the UNCOND branch.
            slg_gate = None
            if slg_blocks and slg_start <= i / n_steps < slg_end:
                n_layers = (self.dit_cfg if which == "dit"
                            else self.dit2_cfg).num_layers
                g = np.ones((n_layers,), np.float32)
                # indices past the stack (tiny smoke configs) are ignored
                g[[b for b in slg_blocks if b < n_layers]] = 0.0
                slg_gate = g
            if sliding_window_size is not None and sliding_window_stride is not None:
                # the reference's sliding kwargs forward reference_latents and
                # motion_bucket_id but not camera control (:1291-1305)
                def fwd(lat_slice, y_slice, vc_slice):
                    return self._forward_all_branches(
                        which, params, vace_params, lat_slice, timestep,
                        ctx_posi, ctx_nega, vc_slice, vace_scale, cfg_scale,
                        None, None, cfg_merge=cfg_merge,
                        clip_feature=clip_feature, y=y_slice,
                        motion_bucket_id=motion_bucket_id,
                        reference_latents=reference_latents,
                        slg_gate=slg_gate)
                v = self._sliding_window_velocity(
                    sliding_window_size, sliding_window_stride, fwd, latents,
                    y=y, vace_context=vace_context)
            else:
                v = self._forward_all_branches(
                    which, params, vace_params, latents, timestep, ctx_posi,
                    ctx_nega, vace_context, vace_scale, cfg_scale, tc_posi,
                    tc_nega, cfg_merge=cfg_merge, clip_feature=clip_feature,
                    y=y, animate_inputs=animate_inputs,
                    motion_bucket_id=motion_bucket_id,
                    control_camera=control_camera,
                    reference_latents=reference_latents,
                    slg_gate=slg_gate)
            if hasattr(self.scheduler, "sigma_pair"):
                sigma, sigma_next = self.scheduler.sigma_pair(i)
                latents = (latents.astype(jnp.float32)
                           + v.astype(jnp.float32) * (sigma_next - sigma)).astype(self.dtype)
            else:
                # multistep solvers (FlowUniPC / FlowDPM — the baseline
                # ComfyUI recipe samples with unipc) keep per-step state in
                # the scheduler like the reference's diffusers-style loop
                # (denoising_enhancing/wan/text2video.py:375-401) — but the
                # update math is array-polymorphic, so the state and the
                # latent stay ON DEVICE (fp32) instead of round-tripping
                # to host numpy every step
                latents = self.scheduler.step(
                    v.astype(jnp.float32), t_host,
                    latents.astype(jnp.float32)).astype(self.dtype)
            if first_frame_latents is not None:
                latents = latents.at[:, :, 0:1].set(first_frame_latents)
            if timer is not None:
                # force materialization so the step time is real (through
                # the axon tunnel block_until_ready alone does not sync)
                float(jnp.sum(latents[..., :1, :1, :1].astype(jnp.float32)))
                timer.times.append(time.perf_counter() - _t0)

        if timer is not None:
            timer.report()
        if ref_count:
            latents = latents[:, :, ref_count:]
        if return_latents:
            return latents
        video = self.decode_video(latents, **kw)
        return self.vae_output_to_video(video)

    @staticmethod
    def vae_output_to_video(video) -> List["object"]:
        """(1, 3, T, H, W) in [-1,1] -> list of PIL images."""
        from PIL import Image
        arr = np.asarray(video[0], np.float32).transpose(1, 2, 3, 0)
        arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
        return [Image.fromarray(f) for f in arr]
