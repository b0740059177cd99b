"""Ditto instruction-based video editing — the flagship entry point.

API-compatible with the reference /root/reference/inference/infer_ditto.py
(invoked by infer.sh with input_video/prompt/lora_path/num_frames/seed):
loads Wan2.1-VACE-14B + the Ditto LoRA, edits a 73-frame 832x480 video via
the VACE branch, saves an mp4.

TPU-native differences: weights load once into HBM (sharded over the mesh
with --mesh), no per-layer CPU offload; the denoise loop runs jitted with
Pallas flash attention.

Smoke mode (--smoke) runs the identical pipeline code on tiny random-init
models for environment verification without checkpoints.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_pipeline(args):
    import jax.numpy as jnp
    from video_styler_tpu.pipelines import WanVideoPipeline
    from video_styler_tpu.pipelines.wan_video import ModelConfig

    sharding_ctx = None
    if args.mesh:
        import jax
        from video_styler_tpu.parallel import make_mesh, ShardingContext
        dp, fsdp, sp = (int(x) for x in args.mesh.split(","))
        sharding_ctx = ShardingContext(make_mesh(dp=dp, fsdp=fsdp, sp=sp))

    model_configs = []
    if args.dit_path:
        model_configs.append(ModelConfig(path=args.dit_path.split("|")))
    if args.vae_path:
        model_configs.append(ModelConfig(path=args.vae_path))
    if args.t5_path:
        model_configs.append(ModelConfig(path=args.t5_path))
    pipe = WanVideoPipeline.from_pretrained(
        model_configs, tokenizer_path=args.tokenizer_path,
        dtype=jnp.bfloat16, sharding_ctx=sharding_ctx)
    if args.lora_path:
        pipe.load_lora(target="vace" if pipe.vace_params is not None else "dit",
                       path=args.lora_path, alpha=args.lora_alpha)
    return pipe


def build_smoke_pipeline():
    import jax
    import jax.numpy as jnp
    from video_styler_tpu.pipelines import WanVideoPipeline
    from video_styler_tpu.models.wan_dit import WanDiTConfig, init_wan_dit
    from video_styler_tpu.models.wan_vace import VaceConfig, init_vace
    from video_styler_tpu.models.t5 import T5_TINY, init_t5
    from video_styler_tpu.models.wan_vae import WAN_VAE_TINY, init_wan_vae

    pipe = WanVideoPipeline(dtype=jnp.bfloat16)
    pipe.vae_cfg = WAN_VAE_TINY
    pipe.vae_params = init_wan_vae(jax.random.PRNGKey(3), WAN_VAE_TINY)
    # tiny VAE has z_dim=4 -> DiT in/out 4, VACE context 2*4+64=72 channels
    dit_cfg = WanDiTConfig(dim=96, in_dim=4, ffn_dim=192, out_dim=4,
                           num_heads=2, num_layers=2, text_dim=64, freq_dim=32)
    pipe.dit_cfg = dit_cfg
    pipe.dit_params = init_wan_dit(jax.random.PRNGKey(0), dit_cfg, jnp.bfloat16)
    vace_cfg = VaceConfig(vace_layers=(0, 1), vace_in_dim=72, dim=96,
                          num_heads=2, ffn_dim=192)
    pipe.vace_cfg = vace_cfg
    pipe.vace_params = init_vace(jax.random.PRNGKey(1), vace_cfg, jnp.bfloat16)
    pipe.t5_cfg = T5_TINY
    pipe.text_encoder_params = init_t5(jax.random.PRNGKey(2), T5_TINY)
    pipe.prompter.cfg = T5_TINY
    pipe.prompter.text_len = 16

    class _Tok:
        def __call__(self, texts, **kw):
            import numpy as np
            n = min(len(texts[0].split()) + 1, 16)
            ids = np.zeros((1, 16), np.int64)
            ids[0, :n] = np.arange(1, n + 1)
            mask = np.zeros((1, 16), np.int64)
            mask[0, :n] = 1
            return {"input_ids": ids, "attention_mask": mask}

    pipe.prompter.tokenizer = _Tok()
    pipe.prompter.fetch_models(pipe.text_encoder_params)
    return pipe


def main():
    p = argparse.ArgumentParser(description="Ditto video editing (TPU)")
    p.add_argument("--input_video", type=str, default=None)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--output_path", type=str, default="output.mp4")
    p.add_argument("--num_frames", type=int, default=73)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--cfg_scale", type=float, default=5.0)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--sigma_shift", type=float, default=5.0)
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--dit_path", type=str, default=None,
                   help="DiT(+VACE) safetensors, '|'-separated shards")
    p.add_argument("--vae_path", type=str, default=None)
    p.add_argument("--t5_path", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--lora_path", type=str, default=None)
    p.add_argument("--lora_alpha", type=float, default=1.0)
    p.add_argument("--tea_cache_l1_thresh", type=float, default=None)
    p.add_argument("--tea_cache_model_id", type=str, default="Wan2.1-T2V-14B")
    p.add_argument("--mesh", type=str, default=None,
                   help="dp,fsdp,sp mesh sizes (e.g. 1,1,4)")
    p.add_argument("--no_tiled", action="store_true")
    p.add_argument("--quantize", type=str, default=None,
                   choices=["int8", "fp8"],
                   help="quantize DiT linears (the fp8-baseline analog; "
                        "int8 runs the v5e MXU at 2x bf16 rate)")
    p.add_argument("--streaming", type=str, default=None,
                   choices=["int4", "int8", "bf16", "f32"],
                   help="host-resident block streaming: run a DiT bigger "
                        "than HBM (the vram_management analog; int4/int8 "
                        "keep more blocks resident, bf16 casts an f32 "
                        "checkpoint, f32 streams untouched). Combine with "
                        "--streaming_budget_gb to size residency.")
    p.add_argument("--streaming_budget_gb", type=float, default=13.5)
    p.add_argument("--cfg_merge", action="store_true",
                   help="batch posi+nega in one DiT pass (CfgMerger)")
    p.add_argument("--smoke", action="store_true",
                   help="tiny random models, no checkpoints (env check)")
    args = p.parse_args()

    if args.smoke:
        pipe = build_smoke_pipeline()
        args.height, args.width = 32, 32
        args.num_frames = min(args.num_frames, 9)
        args.num_inference_steps = min(args.num_inference_steps, 4)
    else:
        if not args.dit_path:
            p.error("--dit_path is required (or use --smoke)")
        pipe = build_pipeline(args)

    if args.quantize:
        pipe.quantize(mode=args.quantize)
    if args.streaming:
        plan = pipe.enable_block_streaming(
            mode=args.streaming, hbm_budget_gb=args.streaming_budget_gb)
        print(f"block streaming: {plan}")

    # input video -> VACE conditioning (the Ditto edit contract)
    vace_video = None
    if args.input_video:
        from video_styler_tpu.data import VideoData
        vd = VideoData(args.input_video, height=args.height, width=args.width)
        n = min(len(vd), args.num_frames)
        vace_video = [vd[i] for i in range(n)]
        args.num_frames = n
    elif args.smoke:
        import numpy as np
        from PIL import Image
        rng = np.random.default_rng(0)
        vace_video = [Image.fromarray(
            rng.integers(0, 255, (args.height, args.width, 3), np.uint8))
            for _ in range(args.num_frames)]

    frames = pipe(
        prompt=args.prompt,
        negative_prompt=args.negative_prompt,
        vace_video=vace_video,
        num_frames=args.num_frames,
        height=args.height,
        width=args.width,
        seed=args.seed,
        cfg_scale=args.cfg_scale,
        num_inference_steps=args.num_inference_steps,
        sigma_shift=args.sigma_shift,
        cfg_merge=args.cfg_merge,
        tiled=not args.no_tiled and not args.smoke,
        tea_cache_l1_thresh=args.tea_cache_l1_thresh,
        tea_cache_model_id=args.tea_cache_model_id,
    )
    from video_styler_tpu.data import save_video
    save_video(frames, args.output_path, fps=args.fps)
    print(f"saved {len(frames)} frames to {args.output_path}")


if __name__ == "__main__":
    main()
