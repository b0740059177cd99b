"""Omost regional prompting (Canvas DSL parse + masks, reference
prompters/omost.py:9-322) and local-prompt masked blending in
SDImagePipeline (reference pipelines/sd_image.py:160-175 + base.py:51-88)."""
import numpy as np
import jax.numpy as jnp
import pytest

from video_styler_tpu.prompters.omost import Canvas, OmostPrompter

BOT_RESPONSE = '''Sure! Here is the canvas:
```python
canvas = Canvas()
canvas.set_global_description(
    description="A sunny meadow with a dog",
    detailed_descriptions=["green grass", "blue sky"],
    tags="meadow, dog, sunny",
    HTML_web_color_name="skyblue",
)
canvas.add_local_description(
    location="on the left",
    offset="no offset",
    area="a small square area",
    distance_to_viewer=2.0,
    description="A golden retriever",
    detailed_descriptions=["fluffy fur"],
    tags="dog",
    atmosphere="joyful",
    style="photo",
    quality_meta="sharp",
    HTML_web_color_name="gold",
)
canvas.add_local_description(
    location="on the top",
    offset="slightly to the right",
    area="a large horizontal area",
    distance_to_viewer=10.0,
    description="The sun",
    detailed_descriptions=["bright"],
    tags="sun",
    atmosphere="warm",
    style="photo",
    quality_meta="sharp",
    HTML_web_color_name="yellow",
)
```
Hope you like it.'''


def test_canvas_parse_and_process():
    canvas = Canvas.from_bot_response(BOT_RESPONSE)
    out = canvas.process()
    assert out["initial_latent"].shape == (90, 90, 3)
    bag = out["bag_of_conditions"]
    assert len(bag) == 3                     # global + 2 locals
    assert bag[0]["location"] == "full"
    assert bag[0]["mask"].min() == 1.0
    # far components painted first -> the sun (d=10) precedes the dog (d=2)
    assert bag[1]["location"] == "on the top"
    assert bag[2]["location"] == "on the left"
    # dog rect: center (15,45), small square 50x50 -> rows 20..70, cols 0..40
    m = bag[2]["mask"]
    assert m[45, 10] == 1.0 and m[45, 80] == 0.0
    assert "A golden retriever." in " ".join(bag[2]["prefixes"])
    # fuzzy color names are corrected
    c2 = Canvas()
    c2.set_global_description("x", ["y"], "t", "sky blue")
    assert c2.color is not None


def test_omost_prompter_stub_llm():
    prompter = OmostPrompter(llm=lambda messages: BOT_RESPONSE)
    out = prompter({"prompt": "a dog in a meadow"})
    assert len(out["prompts"]) == 2
    assert len(out["masks"]) == 2
    assert out["masks"][0].size == (90, 90)
    assert out["prompt"].startswith("A sunny meadow")


def test_sd_local_prompt_blending(monkeypatch):
    import video_styler_tpu.pipelines.sd_image as sdi
    from video_styler_tpu.pipelines.sd_image import SDImagePipeline
    from PIL import Image

    def fake_unet(params, sample, t, ctx, controlnet_res_stack=None,
                  ipadapter_kwargs_list=None, motion=None):
        # the prediction is the mean of the context -> local prompts with
        # different embeddings give different eps
        return jnp.ones_like(sample) * jnp.mean(ctx)

    monkeypatch.setattr(sdi.SD, "sd_unet_forward", fake_unet)
    pipe = SDImagePipeline(dtype=jnp.float32)
    pipe.unet_params = {}
    embs = {"global": jnp.zeros((1, 77, 8), jnp.float32),
            "local": jnp.ones((1, 77, 8), jnp.float32)}
    pipe.encode_prompt = lambda p, clip_skip=1: embs[p]

    mask = np.zeros((512, 512), np.uint8)
    mask[:, :256] = 255
    mask_img = Image.fromarray(np.stack([mask] * 3, axis=-1))

    lat = pipe("global", cfg_scale=1.0, num_inference_steps=1, seed=0,
               height=512, width=512, local_prompts=["local"],
               masks=[mask_img], mask_scales=[10.0], return_latents=True)
    lat_plain = pipe("global", cfg_scale=1.0, num_inference_steps=1, seed=0,
                     height=512, width=512, return_latents=True)
    lat, lat_plain = np.asarray(lat), np.asarray(lat_plain)
    # latent is 64x64; masked side moved toward the local prediction, the
    # far unmasked edge (blur radius 16 << 62) stays at the global value
    assert abs(lat[0, 0, 32, 1] - lat_plain[0, 0, 32, 1]) > 1e-4
    np.testing.assert_allclose(lat[0, 0, 32, 62], lat_plain[0, 0, 32, 62],
                               atol=2e-4)
    # masked side moved strictly more than the unmasked side
    d_masked = abs(lat[0, 0, 32, 1] - lat_plain[0, 0, 32, 1])
    d_unmasked = abs(lat[0, 0, 32, 62] - lat_plain[0, 0, 32, 62])
    assert d_masked > 10 * d_unmasked


def test_sdxl_local_prompt_blending(monkeypatch):
    import video_styler_tpu.pipelines.sdxl_image as xli
    from video_styler_tpu.pipelines.sdxl_image import SDXLImagePipeline
    from PIL import Image

    def fake_unet(params, sample, t, ctx, add_time_id, add_text,
                  controlnet_res_stack=None, ipadapter_kwargs_list=None,
                  motion=None):
        return jnp.ones_like(sample) * jnp.mean(ctx)

    monkeypatch.setattr(xli.XL, "sdxl_unet_forward", fake_unet)
    pipe = SDXLImagePipeline(dtype=jnp.float32)
    pipe.unet_params = {}
    embs = {"global": (jnp.zeros((1, 7, 8), jnp.float32),
                       jnp.zeros((1, 4), jnp.float32)),
            "local": (jnp.ones((1, 7, 8), jnp.float32),
                      jnp.ones((1, 4), jnp.float32))}
    pipe.encode_prompt = lambda p, clip_skip=1: embs[p]
    mask = np.zeros((512, 512), np.uint8)
    mask[:, :256] = 255
    mask_img = Image.fromarray(np.stack([mask] * 3, axis=-1))
    lat = pipe("global", cfg_scale=1.0, num_inference_steps=1, seed=0,
               height=512, width=512, local_prompts=["local"],
               masks=[mask_img], mask_scales=[10.0], return_latents=True)
    lat_plain = pipe("global", cfg_scale=1.0, num_inference_steps=1, seed=0,
                     height=512, width=512, return_latents=True)
    lat, lat_plain = np.asarray(lat), np.asarray(lat_plain)
    assert abs(lat[0, 0, 32, 1] - lat_plain[0, 0, 32, 1]) > 1e-4
    np.testing.assert_allclose(lat[0, 0, 32, 62], lat_plain[0, 0, 32, 62],
                               atol=2e-4)


def test_omost_extender_through_pipeline(monkeypatch):
    import video_styler_tpu.pipelines.sd_image as sdi
    from video_styler_tpu.pipelines.sd_image import SDImagePipeline

    seen = []

    def fake_unet(params, sample, t, ctx, controlnet_res_stack=None,
                  ipadapter_kwargs_list=None, motion=None):
        seen.append(None)
        return sample * 0.1

    monkeypatch.setattr(sdi.SD, "sd_unet_forward", fake_unet)
    pipe = SDImagePipeline(dtype=jnp.float32)
    pipe.unet_params = {}
    pipe.encode_prompt = lambda p, clip_skip=1: jnp.zeros((1, 77, 8),
                                                          jnp.float32)
    prompter = OmostPrompter(llm=lambda messages: BOT_RESPONSE)
    pipe("a dog in a meadow", cfg_scale=1.0, num_inference_steps=1, seed=0,
         height=64, width=64, prompt_extender=prompter, return_latents=True)
    # 1 global + 2 regional UNet calls per step
    assert len(seen) == 3


def test_prompt_refiners():
    """BeautifulPrompt/QwenPrompt/Translator analogs
    (reference prompters/prompt_refiners.py:6-130)."""
    from video_styler_tpu.prompters import (BeautifulPrompt, QwenPrompt,
                                            Translator, PromptRefinerChain)
    bp = BeautifulPrompt(generate=lambda t: " masterpiece, oil painting ")
    assert bp("a cat") == "a cat, masterpiece, oil painting"
    assert bp("low quality", positive=False) == "low quality"
    assert "### Input" in BeautifulPrompt(lambda t: t, v2=True).template
    qp = QwenPrompt(chat=lambda msgs: "A cat in the sun.")
    assert qp("一只猫") == "A cat in the sun."
    assert qp("neg", positive=False) == "neg"
    tr = Translator(translate=str.upper)
    # translator applies to negative prompts too (prompt_refiners.py:126-130)
    assert tr("hello", positive=False) == "HELLO"
    chain = PromptRefinerChain([tr, bp])
    assert chain("a dog") == "A DOG, masterpiece, oil painting"
