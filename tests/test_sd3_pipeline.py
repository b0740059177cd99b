"""SD3ImagePipeline end-to-end with tiny models (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from video_styler_tpu.models.sd3_dit import SD3_DIT_TINY, init_sd3_dit
from video_styler_tpu.pipelines.sd3_image import SD3ImagePipeline


def _tiny_pipe():
    pipe = SD3ImagePipeline(dtype=jnp.float32)
    pipe.dit_cfg = SD3_DIT_TINY
    pipe.dit_params = init_sd3_dit(jax.random.PRNGKey(0), SD3_DIT_TINY)
    pipe.encode_image = lambda arr: jnp.asarray(
        np.repeat(arr[:, :1], 16, 1)[:, :, ::8, ::8], jnp.float32)
    pipe.decode_image = lambda z: jnp.zeros((1, 3, z.shape[2] * 8, z.shape[3] * 8))
    rng = jax.random.PRNGKey(1)
    embs = {
        "a cat": jax.random.normal(jax.random.fold_in(rng, 0),
                                   (1, 8, SD3_DIT_TINY.context_dim)),
        "": jax.random.normal(jax.random.fold_in(rng, 1),
                              (1, 8, SD3_DIT_TINY.context_dim)),
        "local": jax.random.normal(jax.random.fold_in(rng, 2),
                                   (1, 8, SD3_DIT_TINY.context_dim)),
    }
    pooled = jax.random.normal(jax.random.fold_in(rng, 3),
                               (1, SD3_DIT_TINY.pooled_dim))
    pipe.encode_prompt = lambda p, n=77: (embs.get(p, embs["a cat"]), pooled)
    return pipe


def test_sd3_t2i_and_img2img():
    pipe = _tiny_pipe()
    lat = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
               cfg_scale=3.0, return_latents=True)
    assert lat.shape == (1, 16, 4, 4)
    assert bool(jnp.isfinite(lat).all())
    img = Image.fromarray(np.zeros((32, 32, 3), np.uint8))
    lat2 = pipe("a cat", input_image=img, denoising_strength=0.7, height=32,
                width=32, seed=0, num_inference_steps=2, cfg_scale=3.0,
                return_latents=True)
    assert float(jnp.abs(lat - lat2).mean()) > 1e-6


def test_sd3_local_prompts_blend():
    pipe = _tiny_pipe()
    mask = Image.fromarray(np.full((32, 32, 3), 255, np.uint8))
    lat = pipe("a cat", local_prompts=["local"], masks=[mask],
               mask_scales=[2.0], height=32, width=32, seed=0,
               num_inference_steps=2, cfg_scale=3.0, return_latents=True)
    base = pipe("a cat", height=32, width=32, seed=0, num_inference_steps=2,
                cfg_scale=3.0, return_latents=True)
    assert bool(jnp.isfinite(lat).all())
    assert float(jnp.abs(lat - base).mean()) > 1e-6
