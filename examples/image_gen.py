"""Image-family inference recipes (reference examples/image_synthesis).

Each function is a minimal, runnable recipe for one pipeline family given
real checkpoint files. Select with:

    python examples/image_gen.py --family flux --prompt "a cat" \
        --dit_path flux1-dev.safetensors --vae_path ae.safetensors \
        --clip_path clip_l.safetensors --t5_path t5xxl.safetensors \
        --output out.png

Families: sd, sdxl, sd3, flux, qwen, hunyuan_image, omnigen.
"""
import argparse

import jax.numpy as jnp


def run_sd(a):
    from video_styler_tpu.pipelines import SDImagePipeline
    pipe = SDImagePipeline.from_civitai_file(a.dit_path,
                                             tokenizer_path=a.tokenizer_path)
    return pipe(a.prompt, negative_prompt=a.negative_prompt,
                cfg_scale=a.cfg_scale, num_inference_steps=a.steps,
                height=a.height, width=a.width, seed=a.seed)


def run_sdxl(a):
    from video_styler_tpu.pipelines import SDXLImagePipeline
    from video_styler_tpu.utils.ckpt import load_state_dict
    sd = load_state_dict(a.dit_path)
    pipe = SDXLImagePipeline.from_state_dicts(
        unet_sd={k.removeprefix("model.diffusion_model."): v
                 for k, v in sd.items()
                 if k.startswith("model.diffusion_model.")},
        tokenizer_path=a.tokenizer_path)
    return pipe(a.prompt, negative_prompt=a.negative_prompt,
                cfg_scale=a.cfg_scale, num_inference_steps=a.steps,
                height=a.height, width=a.width, seed=a.seed)


def run_sd3(a):
    from video_styler_tpu.pipelines import SD3ImagePipeline
    pipe = SD3ImagePipeline.from_pretrained(dit_path=a.dit_path,
                                            vae_path=a.vae_path)
    return pipe(a.prompt, negative_prompt=a.negative_prompt,
                cfg_scale=a.cfg_scale, num_inference_steps=a.steps,
                height=a.height, width=a.width, seed=a.seed)


def run_flux(a):
    from video_styler_tpu.pipelines import FluxImagePipeline
    pipe = FluxImagePipeline.from_pretrained(
        dit_path=a.dit_path, vae_path=a.vae_path, clip_path=a.clip_path,
        t5_paths=a.t5_path, tokenizer_1_path=a.tokenizer_path)
    if a.lora_path:
        pipe.load_lora(a.lora_path, alpha=1.0)
    return pipe(a.prompt, embedded_guidance=3.5,
                num_inference_steps=a.steps, height=a.height, width=a.width,
                seed=a.seed)


def run_qwen(a):
    from video_styler_tpu.pipelines import QwenImagePipeline
    pipe = QwenImagePipeline.from_pretrained(dit_paths=a.dit_path,
                                             vae_path=a.vae_path)
    # text encoder: Qwen2.5-VL served through transformers (the reference
    # does the same, models/qwen_image_text_encoder.py)
    return pipe(a.prompt, negative_prompt=a.negative_prompt,
                cfg_scale=a.cfg_scale, num_inference_steps=a.steps,
                height=a.height, width=a.width, seed=a.seed)


def run_hunyuan_image(a):
    from video_styler_tpu.pipelines import HunyuanImagePipeline
    pipe = HunyuanImagePipeline.from_pretrained(dit_path=a.dit_path,
                                                vae_path=a.vae_path)
    return pipe(a.prompt, negative_prompt=a.negative_prompt,
                cfg_scale=a.cfg_scale, num_inference_steps=a.steps,
                height=a.height, width=a.width, seed=a.seed)


def run_omnigen(a):
    from video_styler_tpu.pipelines import OmnigenImagePipeline
    pipe = OmnigenImagePipeline.from_pretrained(
        transformer_path=a.dit_path, vae_path=a.vae_path)
    return pipe(a.prompt, num_inference_steps=a.steps, height=a.height,
                width=a.width, seed=a.seed)


RUNNERS = {"sd": run_sd, "sdxl": run_sdxl, "sd3": run_sd3, "flux": run_flux,
           "qwen": run_qwen, "hunyuan_image": run_hunyuan_image,
           "omnigen": run_omnigen}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family", required=True, choices=sorted(RUNNERS))
    p.add_argument("--prompt", required=True)
    p.add_argument("--negative_prompt", default="")
    p.add_argument("--dit_path", required=True)
    p.add_argument("--vae_path")
    p.add_argument("--clip_path")
    p.add_argument("--t5_path")
    p.add_argument("--lora_path")
    p.add_argument("--tokenizer_path")
    p.add_argument("--cfg_scale", type=float, default=7.5)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", default="out.png")
    a = p.parse_args()
    image = RUNNERS[a.family](a)
    image.save(a.output)
    print(f"saved {a.output}")


if __name__ == "__main__":
    main()
