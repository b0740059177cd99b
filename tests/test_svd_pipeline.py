"""SVDVideoPipeline end-to-end with the tiny reference-shaped oracle pieces
stubbed where needed (CPU). UNet parity is covered in test_svd_parity.py."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from video_styler_tpu.pipelines.svd_video import SVDVideoPipeline


def _tiny_pipe(num_frames=3):
    pipe = SVDVideoPipeline(dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    # stub unet: a jittable function of the right signature
    w = jax.random.normal(rng, (4, 8, 1, 1)) * 0.1

    def fake_unet(params, x, t, emb, ids):
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + 0.01 * emb.mean() + 0.001 * jnp.asarray(ids).sum()

    import video_styler_tpu.models.svd as S
    pipe._orig = (S.svd_unet_forward,)
    pipe._fwd = lambda: fake_unet
    pipe.encode_image_with_clip = lambda img, h, w_: jnp.ones((1, 1, 1024))
    pipe.encode_image_with_vae = lambda img, s, h, w_, seed=None: jnp.zeros(
        (1, 4, h // 8, w_ // 8))
    pipe.encode_video_with_vae = lambda frames, h, w_: jnp.zeros(
        (len(frames), 4, h // 8, w_ // 8))
    return pipe


def test_svd_i2v_runs():
    pipe = _tiny_pipe()
    img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    lat = pipe(input_image=img, num_frames=3, height=64, width=64, seed=0,
               num_inference_steps=2, return_latents=True)
    assert lat.shape == (3, 4, 8, 8)
    assert bool(jnp.isfinite(lat).all())


def test_svd_cfg_ramp_and_mask_frames():
    pipe = _tiny_pipe()
    img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    mask = [Image.fromarray(np.full((64, 64, 3), 128, np.uint8))]
    lat = pipe(input_image=img, mask_frames=mask, mask_frame_ids=[1],
               min_cfg_scale=1.0, max_cfg_scale=3.0, num_frames=3, height=64,
               width=64, seed=0, num_inference_steps=2, return_latents=True)
    assert bool(jnp.isfinite(lat).all())


def test_svd_v2v():
    pipe = _tiny_pipe()
    img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    frames = [img] * 3
    lat = pipe(input_image=img, input_video=frames, denoising_strength=0.5,
               num_frames=3, height=64, width=64, seed=0,
               num_inference_steps=2, return_latents=True)
    assert bool(jnp.isfinite(lat).all())
