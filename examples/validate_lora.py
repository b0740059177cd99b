"""Validate a trained LoRA checkpoint by rendering a short clip.

Mirrors the reference examples/wanvideo/model_training/validate_lora/
Wan2.1-VACE-14B.py: load base models + the freshly trained LoRA (e.g.
epoch-4.safetensors), run a 17-frame VACE edit, save the video for visual
inspection.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lora_checkpoint", type=str, required=True)
    p.add_argument("--prompt", type=str,
                   default="from sunset to daylight, consistent style")
    p.add_argument("--input_video", type=str, default=None)
    p.add_argument("--dit_path", type=str, required=True)
    p.add_argument("--vae_path", type=str, required=True)
    p.add_argument("--t5_path", type=str, required=True)
    p.add_argument("--tokenizer_path", type=str, required=True)
    p.add_argument("--lora_target", type=str, default="vace",
                   choices=["vace", "dit"])
    p.add_argument("--num_frames", type=int, default=17)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_path", type=str, default="validate.mp4")
    args = p.parse_args()

    import jax.numpy as jnp
    from video_styler_tpu.pipelines import WanVideoPipeline
    from video_styler_tpu.pipelines.wan_video import ModelConfig
    from video_styler_tpu.data import VideoData, save_video

    pipe = WanVideoPipeline.from_pretrained(
        [ModelConfig(path=args.dit_path.split("|")),
         ModelConfig(path=args.vae_path), ModelConfig(path=args.t5_path)],
        tokenizer_path=args.tokenizer_path, dtype=jnp.bfloat16)
    pipe.load_lora(target=args.lora_target, path=args.lora_checkpoint)

    vace_video = None
    if args.input_video:
        vd = VideoData(args.input_video, height=args.height, width=args.width)
        vace_video = [vd[i] for i in range(min(len(vd), args.num_frames))]

    frames = pipe(prompt=args.prompt, vace_video=vace_video,
                  num_frames=args.num_frames, height=args.height,
                  width=args.width, seed=args.seed, tiled=True)
    save_video(frames, args.output_path, fps=15)
    print(f"validation clip saved to {args.output_path}")


if __name__ == "__main__":
    main()
