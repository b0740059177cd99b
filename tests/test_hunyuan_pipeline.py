"""HunyuanVideoPipeline end-to-end with tiny models (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from video_styler_tpu.models.hunyuan_video_dit import (
    HUNYUAN_VIDEO_TINY, init_hunyuan_video_dit)
import video_styler_tpu.models.hunyuan_video_vae as HV
from video_styler_tpu.pipelines.hunyuan_video import HunyuanVideoPipeline

CFG = HUNYUAN_VIDEO_TINY


def _tiny_pipe():
    pipe = HunyuanVideoPipeline(dtype=jnp.float32)
    pipe.dit_cfg = CFG
    pipe.dit_params = init_hunyuan_video_dit(jax.random.PRNGKey(0), CFG)
    rng = jax.random.PRNGKey(1)
    embs = {}
    for i, p in enumerate(["a cat", "", "bad"]):
        embs[p] = jax.random.normal(jax.random.fold_in(rng, i),
                                    (1, CFG.txt_len, CFG.text_dim))
    mask = jnp.ones((1, CFG.txt_len), jnp.int32)
    pooled = jax.random.normal(jax.random.fold_in(rng, 9), (1, CFG.pooled_dim))
    pipe.encode_prompt = lambda p: (embs.get(p, embs["a cat"]), mask, pooled)
    # stub VAE (VAE parity covered in test_hunyuan_vae_parity.py)
    pipe.encode_video = lambda arr, **k: jnp.asarray(
        np.repeat(arr[:, :1], 16, 1)[:, :, ::4, ::8, ::8][:, :, :((arr.shape[2]-1)//4+1)],
        jnp.float32)
    return pipe


def _frames(n, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return [Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))
            for _ in range(n)]


def test_hunyuan_t2v():
    pipe = _tiny_pipe()
    lat = pipe("a cat", height=32, width=32, num_frames=5, seed=0,
               num_inference_steps=2, return_latents=True)
    assert lat.shape == (1, 16, 2, 4, 4)
    assert bool(jnp.isfinite(lat).all())


def test_hunyuan_v2v_and_cfg():
    pipe = _tiny_pipe()
    lat = pipe("a cat", negative_prompt="bad", cfg_scale=2.0,
               input_video=_frames(5), denoising_strength=0.8, height=32,
               width=32, num_frames=5, seed=0, num_inference_steps=2,
               return_latents=True)
    assert bool(jnp.isfinite(lat).all())


def test_hunyuan_i2v_pins_first_frame():
    pipe = _tiny_pipe()
    import video_styler_tpu.models.hunyuan_video_vae as V
    first = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 16, 1, 4, 4)), jnp.float32)
    V_orig = V.vae_encode
    V.vae_encode = lambda *a, **k: first
    try:
        lat = pipe("a cat", input_images=_frames(1), height=32, width=32,
                   num_frames=5, seed=0, num_inference_steps=2,
                   return_latents=True)
    finally:
        V.vae_encode = V_orig
    np.testing.assert_allclose(np.asarray(lat[:, :, :1]), np.asarray(first),
                               rtol=1e-5, atol=1e-6)


def test_hunyuan_teacache():
    pipe = _tiny_pipe()
    lat = pipe("a cat", height=32, width=32, num_frames=5, seed=0,
               num_inference_steps=4, tea_cache_l1_thresh=1e9,
               return_latents=True)
    assert bool(jnp.isfinite(lat).all())
