"""Step 2: keyframe-guided flow-matching video editing.

Mirrors /root/reference/inference/step2_video_editing.py: load step-1 styled
keyframes + indices, run WanVideoEditorPipeline (coupled noise, shared RoPE,
velocity correction), save the edited video.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", type=str, required=True)
    p.add_argument("--keyframe_info", type=str, required=True,
                   help="keyframe_info.json from step 1")
    p.add_argument("--prompt", type=str, default=None,
                   help="override the consistent edit prompt")
    p.add_argument("--negative_prompt", type=str, default="")
    p.add_argument("--output_path", type=str, default="edited.mp4")
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--cfg_scale", type=float, default=5.0)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--alpha", type=float, default=10.0)
    p.add_argument("--beta", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--dit_path", type=str, default=None)
    p.add_argument("--vae_path", type=str, default=None)
    p.add_argument("--t5_path", type=str, default=None)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--tea_cache_l1_thresh", type=float, default=None,
                   help="enable TeaCache on the joint [main|edit] forward")
    p.add_argument("--tea_cache_model_id", type=str, default="Wan2.1-T2V-14B")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    from PIL import Image
    from video_styler_tpu.data import VideoData, save_video

    with open(args.keyframe_info) as f:
        info = json.load(f)

    vd = VideoData(args.video, height=args.height, width=args.width)
    n = min(len(vd), args.num_frames)
    source_frames = [vd[i] for i in range(n)]
    styled = [Image.open(p).convert("RGB").resize((args.width, args.height))
              for p in info["generated_frames"]]
    indices = [min(int(t * info["source_fps"]), n - 1)
               for t in info["keyframe_timestamp"]]
    # dedupe while keeping order
    seen, kf_idx, kf_imgs = set(), [], []
    for i, img in zip(indices, styled):
        if i not in seen:
            seen.add(i)
            kf_idx.append(i)
            kf_imgs.append(img)

    if args.smoke:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from infer_ditto import build_smoke_pipeline
        from video_styler_tpu.pipelines import WanVideoEditorPipeline
        base = build_smoke_pipeline()
        pipe = WanVideoEditorPipeline(dtype=base.dtype)
        pipe.__dict__.update(base.__dict__)
        args.height = args.width = 32
        source_frames = [f.resize((32, 32)) for f in source_frames[:5]]
        kf_imgs = [i.resize((32, 32)) for i in kf_imgs[:2]]
        kf_idx = kf_idx[:2]
        args.num_inference_steps = 3
    else:
        import jax.numpy as jnp
        from video_styler_tpu.pipelines import WanVideoEditorPipeline
        from video_styler_tpu.pipelines.wan_video import ModelConfig
        mcs = [ModelConfig(path=x.split("|")) for x in
               (args.dit_path, args.vae_path, args.t5_path) if x]
        pipe = WanVideoEditorPipeline.from_pretrained(
            mcs, tokenizer_path=args.tokenizer_path, dtype=jnp.bfloat16)

    prompt = args.prompt or info.get("consistent_edit_prompt", "")
    frames = pipe(
        prompt=prompt,
        negative_prompt=args.negative_prompt,
        source_video=source_frames,
        edited_keyframes=kf_imgs,
        keyframe_indices=kf_idx,
        seed=args.seed,
        height=args.height,
        width=args.width,
        num_frames=len(source_frames),
        cfg_scale=args.cfg_scale,
        num_inference_steps=args.num_inference_steps,
        alpha=args.alpha,
        beta=args.beta,
        tiled=not args.smoke,
        verbose=True,
        tea_cache_l1_thresh=args.tea_cache_l1_thresh,
        tea_cache_model_id=args.tea_cache_model_id,
    )
    save_video(frames, args.output_path, fps=args.fps)
    print(f"step2 done: saved {len(frames)} frames to {args.output_path}")


if __name__ == "__main__":
    main()
