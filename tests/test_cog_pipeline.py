"""CogVideoPipeline end-to-end with tiny models (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

import video_styler_tpu.models.cog_video as C
from video_styler_tpu.pipelines.cog_video import CogVideoPipeline

CFG = C.COG_DIT_TINY


def _tiny_pipe():
    pipe = CogVideoPipeline(dtype=jnp.float32)
    pipe.dit_cfg = CFG
    pipe.dit_params = C.init_cog_dit(jax.random.PRNGKey(0), CFG)
    rng = jax.random.PRNGKey(1)
    embs = {p: jax.random.normal(jax.random.fold_in(rng, i),
                                 (1, 8, CFG.text_dim))
            for i, p in enumerate(["a cat", "", "bad"])}
    pipe.text_encoder = lambda p, length=226: embs.get(p, embs["a cat"])
    return pipe


def test_cog_t2v():
    pipe = _tiny_pipe()
    # tiny proj_out is 64-wide like the reference (16ch x 2 x 2)
    lat = pipe("a cat", num_frames=4, height=32, width=32, seed=0,
               num_inference_steps=2, cfg_scale=1.5, negative_prompt="bad",
               return_latents=True)
    assert lat.shape == (1, 16, 2, 4, 4)
    assert bool(jnp.isfinite(lat).all())


def test_cog_v2v():
    pipe = _tiny_pipe()
    pipe.vae_encoder_params = None
    pipe.encode = None
    C_orig = C.cog_vae_encode
    C.cog_vae_encode = lambda p, v: jnp.zeros(
        (1, 16, v.shape[2] // 4 + 1, v.shape[3] // 8, v.shape[4] // 8))
    try:
        frames = [Image.fromarray(np.zeros((32, 32, 3), np.uint8))] * 4
        lat = pipe("a cat", input_video=frames, denoising_strength=0.6,
                   num_frames=4, height=32, width=32, seed=0,
                   num_inference_steps=2, cfg_scale=1.0, return_latents=True)
    finally:
        C.cog_vae_encode = C_orig
    assert bool(jnp.isfinite(lat).all())
