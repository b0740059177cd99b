"""StepVideoPipeline end-to-end with tiny models (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import video_styler_tpu.models.stepvideo_dit as D
from video_styler_tpu.pipelines.step_video import StepVideoPipeline

CFG = D.STEP_VIDEO_TINY


def test_step_t2v():
    pipe = StepVideoPipeline(dtype=jnp.float32)
    pipe.dit_cfg = CFG
    pipe.dit_params = D.init_step_video_dit(jax.random.PRNGKey(0), CFG)
    rng = jax.random.PRNGKey(1)

    def enc(p):
        k = jax.random.fold_in(rng, abs(hash(p)) % 997)
        return (jax.random.normal(k, (1, 7, CFG.caption_dim)),
                jax.random.normal(jax.random.fold_in(k, 1), (1, 3, CFG.clip_dim)),
                jnp.ones((1, 10), jnp.int32))
    pipe.text_encoder = enc
    lat = pipe("a cat", negative_prompt="bad", cfg_scale=2.0,
               num_frames=17, height=32, width=32, seed=0,
               num_inference_steps=2, return_latents=True)
    assert lat.shape == (1, 3, 64, 2, 2)
    assert bool(jnp.isfinite(lat).all())
