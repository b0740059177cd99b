"""Registry of per-family example recipes beyond Wan (VERDICT r4 item 8).

Mirrors the reference's non-Wan example families
(/root/reference/examples/: image_synthesis, flux, qwen_image,
HunyuanVideo, CogVideoX, stepvideo, video_synthesis, Diffutoon, train/*) as
one generated tree: for each family `examples/families/<name>/generate.py`
(inference; `--smoke` runs tiny random-init models, real runs take
checkpoint paths) and, for trainable families, `.../train_lora.py` (LoRA
recipe; `--smoke` runs a tiny end-to-end training loop and saves a LoRA
safetensors file).

Edit this file, then run `python tools/gen_examples.py`; committed files are
swept by tests/test_examples_smoke.py.
"""

# family -> dict(kind, train, ref, real) — `ref` cites the reference example
# this mirrors; `real` is the real-checkpoint entry point users run.
FAMILIES = {
    "sd": dict(
        kind="image", train=True,
        ref="examples/image_synthesis/sd_text_to_image.py",
        real="examples/image_gen.py --family sd"),
    "sdxl": dict(
        kind="image", train=True,
        ref="examples/image_synthesis/kolors_with_sdxl_models.py",
        real="examples/image_gen.py --family sdxl"),
    "sd3": dict(
        kind="image", train=True,
        ref="examples/image_synthesis/sd3_text_to_image.py",
        real="examples/image_gen.py --family sd3"),
    "flux": dict(
        kind="image", train=True,
        ref="examples/flux/model_inference/FLUX.1-dev.py",
        real="examples/image_gen.py --family flux"),
    "qwen_image": dict(
        kind="image", train=True,
        ref="examples/qwen_image/model_inference/Qwen-Image.py",
        real="examples/image_gen.py --family qwen"),
    "hunyuan_image": dict(
        kind="image", train=False,
        ref="examples/image_synthesis/hunyuan_dit_text_to_image.py",
        real="examples/image_gen.py --family hunyuan_image"),
    "omnigen": dict(
        kind="image", train=False,
        ref="examples/image_synthesis/omnigen_text_to_image.py",
        real="examples/image_gen.py --family omnigen"),
    "step1x": dict(
        kind="image", train=False,
        ref="examples/step1x/step1x.py",
        real="examples/image_gen.py --family flux (+ step1x connector via "
             "FluxImagePipeline.step1x_connector_params)"),
    "hunyuan_video": dict(
        kind="video", train=False,
        ref="examples/HunyuanVideo/hunyuanvideo_80G.py",
        real="examples/video_gen.py --family hunyuan_video"),
    "cog_video": dict(
        kind="video", train=False,
        ref="examples/CogVideoX/cogvideo_text_to_video.py",
        real="examples/video_gen.py --family cog_video"),
    "step_video": dict(
        kind="video", train=False,
        ref="examples/stepvideo/stepvideo_text_to_video.py",
        real="examples/video_gen.py --family step_video"),
    "svd": dict(
        kind="video", train=False,
        ref="examples/video_synthesis/svd_text_to_video.py",
        real="examples/video_gen.py --family svd"),
}
