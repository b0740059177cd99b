"""Batch temporal enhancer CLI.

Mirrors /root/reference/denoising_enhancing/video_enhancing_batch.py:282-520:
reads a video-list txt (or a single video), runs the Wan2.2 dual-expert
SDEdit enhancement per video, saves outputs + a per-video timing log.

torchrun/NCCL/Ulysses flags become --mesh dp,fsdp,sp on the TPU mesh.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Wan2.2 temporal enhancer (TPU)")
    p.add_argument("--video_list", type=str, default=None,
                   help="txt file: one input video path per line")
    p.add_argument("--input_video", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="enhanced")
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--forward_step", type=int, default=4)
    p.add_argument("--skip_backward_step", type=int, default=4)
    p.add_argument("--sampling_steps", type=int, default=50)
    p.add_argument("--sample_shift", type=float, default=5.0)
    p.add_argument("--boundary", type=float, default=0.875)
    p.add_argument("--guide_scale_low", type=float, default=3.0)
    p.add_argument("--guide_scale_high", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--low_noise_dit_path", type=str, default=None)
    p.add_argument("--high_noise_dit_path", type=str, default=None)
    p.add_argument("--vae_path", type=str, default=None)
    p.add_argument("--t5_path", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--mesh", type=str, default=None)
    p.add_argument("--tiled", action="store_true")
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--smoke", action="store_true")
    return p.parse_args()


def build_pipeline(args):
    import jax.numpy as jnp
    from video_styler_tpu.pipelines.wan_enhancer import WanEnhancerPipeline
    from video_styler_tpu.pipelines.wan_video import ModelConfig

    mcs = []
    if args.low_noise_dit_path:
        mcs.append(ModelConfig(path=args.low_noise_dit_path.split("|"),
                               model_kind="dit"))
    if args.high_noise_dit_path:
        mcs.append(ModelConfig(path=args.high_noise_dit_path.split("|"),
                               model_kind="dit2"))
    if args.vae_path:
        mcs.append(ModelConfig(path=args.vae_path))
    if args.t5_path:
        mcs.append(ModelConfig(path=args.t5_path))
    return WanEnhancerPipeline.from_pretrained(
        mcs, tokenizer_path=args.tokenizer_path, dtype=jnp.bfloat16)


def build_smoke_pipeline():
    import jax
    import jax.numpy as jnp
    from video_styler_tpu.pipelines.wan_enhancer import WanEnhancerPipeline
    from video_styler_tpu.models.wan_dit import WanDiTConfig, init_wan_dit
    from video_styler_tpu.models.t5 import T5_TINY, init_t5
    from video_styler_tpu.models.wan_vae import WAN_VAE_TINY, init_wan_vae
    from infer_ditto import build_smoke_pipeline as _base

    pipe = WanEnhancerPipeline(dtype=jnp.bfloat16)
    dit_cfg = WanDiTConfig(dim=96, in_dim=4, ffn_dim=192, out_dim=4,
                           num_heads=2, num_layers=2, text_dim=64, freq_dim=32)
    pipe.dit_cfg = dit_cfg
    pipe.dit2_cfg = dit_cfg
    pipe.dit_params = init_wan_dit(jax.random.PRNGKey(0), dit_cfg, jnp.bfloat16)
    pipe.dit2_params = init_wan_dit(jax.random.PRNGKey(1), dit_cfg, jnp.bfloat16)
    pipe.vae_cfg = WAN_VAE_TINY
    pipe.vae_params = init_wan_vae(jax.random.PRNGKey(3), WAN_VAE_TINY)
    pipe.t5_cfg = T5_TINY
    pipe.text_encoder_params = init_t5(jax.random.PRNGKey(2), T5_TINY)
    pipe.prompter.cfg = T5_TINY
    pipe.prompter.text_len = 16
    base = _base()
    pipe.prompter.tokenizer = base.prompter.tokenizer
    pipe.prompter.fetch_models(pipe.text_encoder_params)
    return pipe


def main():
    args = parse_args()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    if args.smoke:
        pipe = build_smoke_pipeline()
        args.height, args.width, args.num_frames = 32, 32, 5
    else:
        pipe = build_pipeline(args)

    videos = []
    if args.video_list:
        with open(args.video_list) as f:
            videos = [ln.strip() for ln in f if ln.strip()]
    elif args.input_video:
        videos = [args.input_video]
    elif args.smoke:
        videos = ["<synthetic>"]

    os.makedirs(args.output_dir, exist_ok=True)
    timing_log = os.path.join(args.output_dir, "enhancing_time.txt")
    from video_styler_tpu.data import save_video

    for vid_path in videos:
        t0 = time.time()
        if vid_path == "<synthetic>":
            import numpy as np
            from PIL import Image
            rng = np.random.default_rng(0)
            frames = [Image.fromarray(
                rng.integers(0, 255, (args.height, args.width, 3), np.uint8))
                for _ in range(args.num_frames)]
            out_name = "synthetic.mp4"
        else:
            from video_styler_tpu.data import VideoData
            vd = VideoData(vid_path, height=args.height, width=args.width)
            n = min(len(vd), args.num_frames)
            frames = [vd[i] for i in range(n)]
            out_name = os.path.basename(vid_path)
        enhanced = pipe.enhance(
            frames, prompt=args.prompt, negative_prompt=args.negative_prompt,
            forward_step=args.forward_step,
            skip_backward_step=args.skip_backward_step,
            sampling_steps=args.sampling_steps, shift=args.sample_shift,
            guide_scale=(args.guide_scale_low, args.guide_scale_high),
            boundary=args.boundary, seed=args.seed, tiled=args.tiled)
        out_path = os.path.join(args.output_dir, out_name)
        save_video(enhanced, out_path, fps=args.fps)
        dt = time.time() - t0
        with open(timing_log, "a") as f:
            f.write(f"{out_name}\t{dt:.2f}s\n")
        print(f"enhanced {vid_path} -> {out_path} in {dt:.1f}s")


if __name__ == "__main__":
    main()
