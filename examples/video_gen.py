"""Video-family inference recipes (reference examples/video_synthesis).

    python examples/video_gen.py --family wan_t2v --prompt "a red fox" \
        --dit_path wan_t2v_1.3b.safetensors --vae_path wan_vae.safetensors \
        --t5_path umt5_xxl.safetensors --tokenizer_path ./umt5-tok \
        --output out.mp4

Families: wan_t2v, hunyuan_video, cog_video, step_video, svd, sd_animatediff.
The Ditto VACE edit / editor / enhancer have richer dedicated CLIs in
`inference/`.
"""
import argparse

import jax.numpy as jnp


def run_wan_t2v(a):
    from video_styler_tpu.pipelines import WanVideoPipeline, ModelConfig
    pipe = WanVideoPipeline.from_pretrained(
        model_configs=[ModelConfig(path=a.dit_path),
                       ModelConfig(path=a.vae_path),
                       ModelConfig(path=a.t5_path)],
        tokenizer_path=a.tokenizer_path)
    return pipe(prompt=a.prompt, negative_prompt=a.negative_prompt,
                num_frames=a.num_frames, height=a.height, width=a.width,
                cfg_scale=a.cfg_scale, num_inference_steps=a.steps,
                seed=a.seed, tiled=True)


def run_hunyuan_video(a):
    from video_styler_tpu.pipelines import HunyuanVideoPipeline
    pipe = HunyuanVideoPipeline.from_pretrained(dit_path=a.dit_path)
    if a.llm_path:
        pipe.fetch_llm(a.llm_path, a.tokenizer_path or a.llm_path)
    return pipe(prompt=a.prompt, num_frames=a.num_frames, height=a.height,
                width=a.width, num_inference_steps=a.steps, seed=a.seed)


def run_cog_video(a):
    from video_styler_tpu.pipelines import CogVideoPipeline
    pipe = CogVideoPipeline.from_pretrained(dit_paths=a.dit_path)
    return pipe(prompt=a.prompt, negative_prompt=a.negative_prompt,
                cfg_scale=a.cfg_scale, num_inference_steps=a.steps,
                num_frames=a.num_frames, height=a.height, width=a.width,
                seed=a.seed)


def run_step_video(a):
    from video_styler_tpu.pipelines import StepVideoPipeline
    pipe = StepVideoPipeline.from_pretrained(dit_paths=a.dit_path,
                                             vae_path=a.vae_path)
    return pipe(prompt=a.prompt, negative_prompt=a.negative_prompt,
                cfg_scale=a.cfg_scale, num_inference_steps=a.steps,
                num_frames=a.num_frames, height=a.height, width=a.width,
                seed=a.seed)


def run_svd(a):
    from PIL import Image
    from video_styler_tpu.pipelines import SVDVideoPipeline
    pipe = SVDVideoPipeline.from_pretrained(unet_path=a.dit_path)
    image = Image.open(a.input_image).convert("RGB")
    return pipe(input_image=image, num_frames=a.num_frames, height=a.height,
                width=a.width, num_inference_steps=a.steps, seed=a.seed)


def run_sd_animatediff(a):
    from video_styler_tpu.pipelines import SDVideoPipeline
    from video_styler_tpu.utils.ckpt import load_model, load_state_dict
    from video_styler_tpu.utils.sd_civitai import convert_sd_civitai
    from video_styler_tpu.models.sd import convert_sd_module
    pipe = SDVideoPipeline()
    parts = convert_sd_civitai(load_state_dict(a.dit_path))
    pipe.unet_params = convert_sd_module(parts["unet"])
    pipe.text_encoder_params = convert_sd_module(parts["text_encoder"])
    pipe.vae_encoder_params = convert_sd_module(parts["vae_encoder"])
    pipe.vae_decoder_params = convert_sd_module(parts["vae_decoder"])
    if a.tokenizer_path:
        from transformers import CLIPTokenizer
        pipe.tokenizer = CLIPTokenizer.from_pretrained(a.tokenizer_path)
    _, motion = load_model(a.motion_path)
    pipe.motion_params = motion["motion_modules"]
    return pipe(prompt=a.prompt, negative_prompt=a.negative_prompt,
                num_frames=a.num_frames, height=a.height, width=a.width,
                cfg_scale=a.cfg_scale, num_inference_steps=a.steps,
                seed=a.seed)


RUNNERS = {"wan_t2v": run_wan_t2v, "hunyuan_video": run_hunyuan_video,
           "cog_video": run_cog_video, "step_video": run_step_video,
           "svd": run_svd, "sd_animatediff": run_sd_animatediff}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", required=True, choices=sorted(RUNNERS))
    p.add_argument("--prompt", default="")
    p.add_argument("--negative_prompt", default="")
    p.add_argument("--dit_path", required=True)
    p.add_argument("--vae_path")
    p.add_argument("--t5_path")
    p.add_argument("--llm_path")
    p.add_argument("--motion_path")
    p.add_argument("--input_image")
    p.add_argument("--tokenizer_path")
    p.add_argument("--cfg_scale", type=float, default=5.0)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", default="out.mp4")
    p.add_argument("--fps", type=int, default=15)
    a = p.parse_args()
    frames = RUNNERS[a.family](a)
    from video_styler_tpu.data.video import save_video
    save_video(frames, a.output, fps=a.fps)
    print(f"saved {a.output}")


if __name__ == "__main__":
    main()
