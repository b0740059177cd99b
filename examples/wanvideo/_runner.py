"""Shared driver behind the generated per-model example scripts.

Mirrors the call shape of the reference's per-model files
(/root/reference/examples/wanvideo/model_inference/*.py: from_pretrained with
ModelConfig entries, then `pipe(prompt, ..., seed=1, tiled=True)`), with two
execution modes:

  real  : resolve the recipe's ModelScope ids via utils/model_config
          (download transport included) or explicit --dit_path/--vae_path/...
  smoke : tiny random-init models (CPU- or single-chip-runnable) with
          synthesized control/reference/pose inputs — the CI path; every
          generated script is swept by tests/test_examples_smoke.py.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from recipes import RECIPES, WanRecipe  # noqa: E402


class _FakeTokenizer:
    def __call__(self, texts, padding=None, truncation=None, max_length=None,
                 return_tensors=None):
        import numpy as np
        ids = np.zeros((1, max_length), np.int64)
        n = min(len(texts[0].split()) + 1, max_length)
        ids[0, :n] = np.arange(1, n + 1)
        mask = np.zeros((1, max_length), np.int64)
        mask[0, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def _frames(n, h=32, w=32, seed=0):
    import numpy as np
    from PIL import Image
    rng = np.random.default_rng(seed)
    return [Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))
            for _ in range(n)]


def build_smoke_pipe(recipe: WanRecipe):
    """Tiny random-init pipeline shaped like the recipe's family.

    Channel math mirrors the real models against the tiny z=4 VAE:
      t2v/vace : in_dim = z                  (Wan2.1 T2V, wan_video_dit.py:506)
      i2v      : in_dim = 2z + 4             (y = 4-ch mask + z latents)
      fun-ctl  : handled by i2v config — control latents replace y slots
      ti2v     : fused VAE latents in x (seperated_timestep, :624)
    """
    import jax
    import jax.numpy as jnp
    from video_styler_tpu.models.wan_dit import WanDiTConfig, init_wan_dit
    from video_styler_tpu.models.wan_vace import VaceConfig, init_vace
    from video_styler_tpu.models.wan_vae import WAN_VAE_TINY, init_wan_vae
    from video_styler_tpu.models.t5 import T5_TINY, init_t5
    from video_styler_tpu.pipelines import WanVideoPipeline

    z = WAN_VAE_TINY.z_dim
    base = dict(dim=96, ffn_dim=192, num_heads=2, num_layers=2,
                text_dim=T5_TINY.dim, freq_dim=32)
    camera = "camera_control_direction" in recipe.extra_inputs
    control = "control_video" in recipe.extra_inputs
    needs_clip_tower = False
    if recipe.arch in ("t2v", "vace", "s2v"):
        # s2v's audio tower is convert-only (no random init, see
        # test_s2v_parity.py); its smoke exercises the shared trunk
        cfg = WanDiTConfig(in_dim=z, out_dim=z, **base)
    elif camera:
        # camera models: y = first-frame latent only (no mask), no clip
        # cross-attn slots (wan_video_new.py:799-845; test_fun_control.py
        # retrofits the same way)
        cfg = WanDiTConfig(in_dim=2 * z, out_dim=z,
                           require_clip_embedding=False, **base)
    elif control:
        # fun-control: control latents prepended onto y (z + z + (4+z))
        cfg = WanDiTConfig(in_dim=3 * z + 4, out_dim=z,
                           has_image_input=True, **base)
    elif recipe.arch in ("i2v", "animate"):
        cfg = WanDiTConfig(in_dim=2 * z + 4, out_dim=z,
                           has_image_input=True,
                           has_image_pos_emb="end_image" in recipe.extra_inputs,
                           **base)
        needs_clip_tower = True
    elif recipe.arch == "ti2v":
        # fused path: the first-frame latent is written INTO the noise and
        # pinned (ImageEmbedderFused, wan_video_new.py:731-748) — latent
        # channel count stays z (test_pipeline.test_ti2v_fused_first_frame)
        cfg = WanDiTConfig(in_dim=z, out_dim=z,
                           require_clip_embedding=False,
                           require_vae_embedding=False,
                           fuse_vae_embedding_in_latents=True, **base)
    else:
        raise ValueError(f"unknown arch {recipe.arch}")

    pipe = WanVideoPipeline(dtype=jnp.float32)
    pipe.dit_cfg = cfg
    pipe.dit_params = init_wan_dit(jax.random.PRNGKey(0), cfg)
    if needs_clip_tower:
        # 257-token (16x16+cls) tiny ViT so the cross-attn y[:, :257] split
        # lines up (wan_video_dit.py:171-186)
        from video_styler_tpu.models.clip_vit import ClipVitConfig, init_clip_vit
        enc_cfg = ClipVitConfig(image_size=112, patch_size=7, dim=1280,
                                num_heads=4, num_layers=2)
        pipe.image_encoder_cfg = enc_cfg
        pipe.image_encoder_params = init_clip_vit(jax.random.PRNGKey(6),
                                                  enc_cfg)
    if recipe.dual_expert:
        pipe.dit2_cfg = cfg
        pipe.dit2_params = init_wan_dit(jax.random.PRNGKey(5), cfg)
    if recipe.arch == "vace":
        vcfg = VaceConfig(vace_layers=(0, 1), vace_in_dim=2 * z + 64,
                          dim=cfg.dim, num_heads=cfg.num_heads,
                          ffn_dim=cfg.ffn_dim)
        pipe.vace_cfg = vcfg
        pipe.vace_params = init_vace(jax.random.PRNGKey(1), vcfg)
    if "camera_control_direction" in recipe.extra_inputs:
        from video_styler_tpu.models.wan_controllers import init_simple_adapter
        pipe.dit_params["control_adapter"] = init_simple_adapter(
            jax.random.PRNGKey(7), in_dim=24, out_dim=cfg.dim)
        if recipe.dual_expert:  # both experts carry the adapter
            pipe.dit2_params["control_adapter"] = init_simple_adapter(
                jax.random.PRNGKey(17), in_dim=24, out_dim=cfg.dim)
    if "reference_image" in recipe.extra_inputs:
        from video_styler_tpu.ops.basic import init_linear
        pipe.dit_params["ref_conv"] = init_linear(
            jax.random.PRNGKey(9), z * 2 * 2, cfg.dim)
    if "motion_bucket_id" in recipe.extra_inputs:
        from video_styler_tpu.models.wan_controllers import \
            init_motion_controller
        pipe.motion_controller_params = init_motion_controller(
            jax.random.PRNGKey(8), dim=cfg.dim)
    pipe.vae_cfg = WAN_VAE_TINY
    pipe.vae_params = init_wan_vae(jax.random.PRNGKey(2), WAN_VAE_TINY)
    pipe.t5_cfg = T5_TINY
    pipe.text_encoder_params = init_t5(jax.random.PRNGKey(3), T5_TINY)
    pipe.prompter.cfg = T5_TINY
    pipe.prompter.text_len = 16
    pipe.prompter.tokenizer = _FakeTokenizer()
    pipe.prompter.fetch_models(pipe.text_encoder_params)
    return pipe


def build_real_pipe(recipe: WanRecipe, args):
    """Resolve the recipe's weight sources and build the pipeline the way
    the reference's from_pretrained examples do (model_inference/*.py)."""
    import jax.numpy as jnp
    from video_styler_tpu.pipelines import WanVideoPipeline
    from video_styler_tpu.utils.model_config import ModelConfig

    configs = [ModelConfig(model_id=recipe.model_id, origin_file_pattern=p)
               for p in recipe.files]
    if recipe.dual_expert:
        hi, lo = recipe.high_low_files
        configs += [ModelConfig(model_id=recipe.model_id,
                                origin_file_pattern=hi),
                    ModelConfig(model_id=recipe.model_id,
                                origin_file_pattern=lo)]
    for mid, pat in recipe.extra_models:
        configs.append(ModelConfig(model_id=mid, origin_file_pattern=pat))
    # explicit local paths override the remote ids
    for flag, kind in (("dit_path", "dit"), ("vae_path", "vae"),
                       ("t5_path", "t5"), ("clip_path", "clip")):
        p = getattr(args, flag, None)
        if p:
            configs = [c for c in configs if c.model_kind != kind]
            configs.append(ModelConfig(path=p, model_kind=kind))
    return WanVideoPipeline.from_pretrained(
        model_configs=configs, dtype=jnp.bfloat16,
        tokenizer_path=getattr(args, "tokenizer_path", None))


def smoke_call_kwargs(recipe: WanRecipe, h=32, w=32, n=5):
    kw = {}
    ei = recipe.extra_inputs
    if "vace_video" in ei:
        kw["vace_video"] = _frames(n, h, w)
    if "vace_reference_image" in ei:
        kw["vace_reference_image"] = _frames(1, h, w, seed=1)[0]
    if "input_image" in ei:
        kw["input_image"] = _frames(1, h, w, seed=2)[0]
    if "end_image" in ei:
        kw["end_image"] = _frames(1, h, w, seed=3)[0]
    if "control_video" in ei:
        kw["control_video"] = _frames(n, h, w, seed=4)
    if "reference_image" in ei:
        kw["reference_image"] = _frames(1, h, w, seed=5)[0]
    if "camera_control_direction" in ei:
        kw["camera_control_direction"] = "Left"
        kw["input_image"] = kw.get("input_image",
                                   _frames(1, h, w, seed=6)[0])
    if "motion_bucket_id" in ei:
        kw["motion_bucket_id"] = 50.0
    if "animate_pose_video" in ei:
        kw["animate_pose_video"] = _frames(n, h, w, seed=7)
    # animate_face_video / s2v audio need their adapter towers; the smoke
    # sweep exercises the trunk path without them (adapters have their own
    # parity tests: test_animate_parity.py, test_s2v_parity.py)
    return kw


def run(recipe_name: str, argv=None):
    ap = argparse.ArgumentParser(description=f"Wan recipe {recipe_name}")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny random-init models, no checkpoints")
    ap.add_argument("--prompt", default="a cat boxing on a stage")
    ap.add_argument("--negative_prompt", default="")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--num_frames", type=int, default=None)
    ap.add_argument("--num_inference_steps", type=int, default=None)
    ap.add_argument("--cfg_scale", type=float, default=5.0)
    ap.add_argument("--output", default=None)
    ap.add_argument("--lora_path", default=None,
                    help="trained LoRA to merge (validate_lora flow)")
    ap.add_argument("--lora_alpha", type=float, default=1.0)
    ap.add_argument("--dit_path"), ap.add_argument("--vae_path")
    ap.add_argument("--t5_path"), ap.add_argument("--clip_path")
    ap.add_argument("--tokenizer_path")
    ap.add_argument("--return_latents", action="store_true")
    args = ap.parse_args(argv)

    recipe = RECIPES[recipe_name]
    if args.smoke:
        pipe = build_smoke_pipe(recipe)
        h, w, n, steps = 32, 32, 5, 2
        kw = smoke_call_kwargs(recipe, h, w, n)
        cfg_scale = 1.0
    else:
        pipe = build_real_pipe(recipe, args)
        h = args.height or recipe.height
        w = args.width or recipe.width
        n = args.num_frames or recipe.num_frames
        steps = args.num_inference_steps or 50
        cfg_scale = args.cfg_scale
        kw = {}
    if args.lora_path:
        target = "vace" if recipe.lora_base == "vace" else "dit"
        pipe.load_lora(target, args.lora_path, alpha=args.lora_alpha)

    out = pipe(args.prompt, negative_prompt=args.negative_prompt,
               height=h, width=w, num_frames=n, seed=args.seed,
               num_inference_steps=steps, cfg_scale=cfg_scale,
               tiled=not args.smoke,
               return_latents=args.smoke or args.return_latents, **kw)
    if args.smoke or args.return_latents:
        import jax.numpy as jnp
        ok = bool(jnp.isfinite(out.astype(jnp.float32)).all())
        print(f"[{recipe_name}] smoke latents {tuple(out.shape)} finite={ok}")
        if not ok:
            raise SystemExit(1)
        return out
    from video_styler_tpu.data.video import save_video
    dest = args.output or f"video_{recipe_name}.mp4"
    save_video(out, dest, fps=15, quality=5)
    print(f"[{recipe_name}] saved {dest}")
    return dest
