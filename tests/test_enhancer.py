"""Dual-expert SDEdit enhancer: end-to-end tiny run + expert routing."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from video_styler_tpu.models.wan_dit import WanDiTConfig, init_wan_dit
from video_styler_tpu.models.t5 import T5_TINY, init_t5
from video_styler_tpu.models.wan_vae import WAN_VAE_TINY, init_wan_vae
from video_styler_tpu.pipelines.wan_enhancer import WanEnhancerPipeline
from video_styler_tpu.schedulers.flow_unipc import FlowUniPCMultistepScheduler


class _Tok:
    def __call__(self, texts, **kw):
        n = min(len(texts[0].split()) + 1, 16)
        ids = np.zeros((1, 16), np.int64)
        ids[0, :n] = np.arange(1, n + 1)
        mask = np.zeros((1, 16), np.int64)
        mask[0, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def _pipe():
    pipe = WanEnhancerPipeline(dtype=jnp.float32)
    cfg = WanDiTConfig(dim=96, in_dim=4, ffn_dim=192, out_dim=4, num_heads=2,
                       num_layers=2, text_dim=64, freq_dim=32)
    pipe.dit_cfg = pipe.dit2_cfg = cfg
    pipe.dit_params = init_wan_dit(jax.random.PRNGKey(0), cfg)
    pipe.dit2_params = init_wan_dit(jax.random.PRNGKey(1), cfg)
    pipe.vae_cfg = WAN_VAE_TINY
    pipe.vae_params = init_wan_vae(jax.random.PRNGKey(2), WAN_VAE_TINY)
    pipe.t5_cfg = T5_TINY
    pipe.text_encoder_params = init_t5(jax.random.PRNGKey(3), T5_TINY)
    pipe.prompter.cfg = T5_TINY
    pipe.prompter.text_len = 16
    pipe.prompter.tokenizer = _Tok()
    pipe.prompter.fetch_models(pipe.text_encoder_params)
    return pipe


def _frames(n=5, hw=32):
    rng = np.random.default_rng(0)
    return [Image.fromarray(rng.integers(0, 255, (hw, hw, 3), np.uint8))
            for _ in range(n)]


def test_enhance_end_to_end():
    pipe = _pipe()
    lat = pipe.enhance(_frames(), prompt="clean", forward_step=3,
                       skip_backward_step=3, sampling_steps=10,
                       return_latents=True)
    assert lat.shape == (1, 4, 2, 4, 4)
    assert bool(jnp.isfinite(lat.astype(jnp.float32)).all())


def test_low_forward_step_preserves_content():
    """SDEdit invariant: tiny noise injection (late timestep) keeps the
    latents close to the clean encode relative to a full-noise run."""
    pipe = _pipe()
    frames = _frames()
    from video_styler_tpu.pipelines.wan_video import _preprocess_images
    clean = np.asarray(pipe.encode_video(_preprocess_images(frames), tiled=False),
                       np.float32)
    out_light = np.asarray(pipe.enhance(frames, forward_step=2,
                                        skip_backward_step=2,
                                        sampling_steps=20, seed=0,
                                        return_latents=True), np.float32)
    out_heavy = np.asarray(pipe.enhance(frames, forward_step=18,
                                        skip_backward_step=18,
                                        sampling_steps=20, seed=0,
                                        return_latents=True), np.float32)
    err_light = np.abs(out_light - clean).mean()
    err_heavy = np.abs(out_heavy - clean).mean()
    assert err_light < err_heavy


def test_boundary_expert_routing():
    """timesteps >= boundary must route to dit2 (high-noise expert)."""
    sched = FlowUniPCMultistepScheduler(num_train_timesteps=1000, shift=1)
    sched.set_timesteps(50, shift=5.0)
    ts = sched.timesteps[-50:]
    boundary_t = 0.875 * 1000
    high = [int(t) for t in ts if int(t) >= boundary_t]
    low = [int(t) for t in ts if int(t) < boundary_t]
    assert high and low
    assert min(high) >= boundary_t > max(low)
