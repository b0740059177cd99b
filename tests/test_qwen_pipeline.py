"""QwenImagePipeline end-to-end with tiny models (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from video_styler_tpu.models.qwen_image_dit import (
    QWEN_IMAGE_TINY, init_qwen_image_dit)
from video_styler_tpu.pipelines.qwen_image import QwenImagePipeline

CFG = QWEN_IMAGE_TINY


def _tiny_pipe():
    pipe = QwenImagePipeline(dtype=jnp.float32)
    pipe.dit_cfg = CFG
    pipe.dit_params = init_qwen_image_dit(jax.random.PRNGKey(0), CFG)
    pipe.encode_image = lambda arr: jnp.asarray(
        np.repeat(arr[:, :1], 16, 1)[:, :, ::8, ::8], jnp.float32)
    pipe.decode_image = lambda z: jnp.zeros((1, 3, z.shape[2] * 8, z.shape[3] * 8))
    rng = jax.random.PRNGKey(1)

    def enc(p):
        k = jax.random.fold_in(rng, abs(hash(p)) % 1000)
        return (jax.random.normal(k, (1, 8, CFG.text_dim)),
                jnp.ones((1, 8), jnp.int32))
    pipe.text_encoder = enc
    return pipe


def test_qwen_t2i_img2img_cfg():
    pipe = _tiny_pipe()
    lat = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
               cfg_scale=1.0, return_latents=True)
    assert lat.shape == (1, 16, 4, 4)
    assert bool(jnp.isfinite(lat).all())
    img = Image.fromarray(np.zeros((32, 32, 3), np.uint8))
    lat2 = pipe("a cat", negative_prompt="bad", cfg_scale=2.0,
                input_image=img, denoising_strength=0.7, height=32, width=32,
                seed=0, num_inference_steps=2, return_latents=True)
    assert bool(jnp.isfinite(lat2).all())
    assert float(jnp.abs(lat - lat2).mean()) > 1e-6


def test_qwen_inpaint_pins_unmasked():
    pipe = _tiny_pipe()
    img = Image.fromarray(np.zeros((32, 32, 3), np.uint8))
    mask = np.zeros((32, 32, 3), np.uint8)
    mask[:16] = 255  # top half generated, bottom half pinned
    lat = pipe("a cat", input_image=img,
               inpaint_mask=Image.fromarray(mask), height=32, width=32,
               seed=0, num_inference_steps=2, cfg_scale=1.0,
               return_latents=True)
    from video_styler_tpu.pipelines.wan_video import _preprocess_images
    want = pipe.encode_image(_preprocess_images([img])[:, :, 0])
    # the mask is resized with PIL's default (bicubic) filter like the
    # reference, so the boundary latent row is fractional; check the row
    # safely inside the unmasked region
    np.testing.assert_allclose(np.asarray(lat[:, :, 3:], np.float32),
                               np.asarray(want[:, :, 3:], np.float32),
                               rtol=1e-4, atol=1e-5)


def test_qwen_edit_image_conditions_output():
    pipe = _tiny_pipe()
    ref = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8))
    a = pipe("a cat", edit_image=ref, height=32, width=32, seed=0,
             num_inference_steps=2, cfg_scale=1.0, return_latents=True)
    b = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
             cfg_scale=1.0, return_latents=True)
    assert a.shape == b.shape
    assert float(jnp.abs(a - b).mean()) > 1e-6


def test_qwen_eligen_entity_control():
    pipe = _tiny_pipe()
    m1 = np.zeros((32, 32, 3), np.uint8)
    m1[:, :16] = 255
    m2 = np.zeros((32, 32, 3), np.uint8)
    m2[:, 16:] = 255
    a = pipe("a cat and a dog",
             eligen_entity_prompts=["a cat", "a dog"],
             eligen_entity_masks=[Image.fromarray(m1), Image.fromarray(m2)],
             height=32, width=32, seed=0, num_inference_steps=2,
             cfg_scale=1.0, return_latents=True)
    b = pipe("a cat and a dog", height=32, width=32, seed=0,
             num_inference_steps=2, cfg_scale=1.0, return_latents=True)
    assert bool(jnp.isfinite(a).all())
    assert float(jnp.abs(a - b).mean()) > 1e-6
