"""SDXLVideoPipeline (AnimateDiff-XL) — real UNet + motion modules on tiny
shapes, plus scheduler-fallback and instant-style IP-Adapter map logic
(reference pipelines/sdxl_video.py:15-226, models/sdxl_ipadapter.py:51-82)."""
import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")


class _FakeTok:
    def __call__(self, texts, padding=None, max_length=None, truncation=None,
                 return_tensors=None):
        ids = np.zeros((1, max_length), np.int64)
        n = min(len(texts[0].split()) + 1, max_length)
        ids[0, :n] = (np.arange(1, n + 1) * 7) % 64
        return {"input_ids": ids}


def test_sdxl_video_animatediff(monkeypatch):
    """Orchestration: overlapping-window blend, motion-module plumbing,
    per-frame vs repeated noise, scheduler fallback. UNet math itself is
    covered by test_sdxl_parity; motion TemporalBlocks by
    test_controlled_pipelines (shared module)."""
    import video_styler_tpu.pipelines.sdxl_video as xlv
    from video_styler_tpu.pipelines.sdxl_video import SDXLVideoPipeline

    seen = {"motion": [], "batches": []}

    def fake_unet(params, sample, timestep, ctx, add_time_id, add_text,
                  controlnet_res_stack=None, ipadapter_kwargs_list=None,
                  motion=None):
        seen["motion"].append(motion is not None)
        seen["batches"].append(int(sample.shape[0]))
        out = sample * 0.1
        if motion is not None:     # motion couples frames within the window
            out = out + 0.01 * jnp.roll(sample, 1, axis=0)
        return out

    monkeypatch.setattr(xlv.XL, "sdxl_unet_forward", fake_unet)
    monkeypatch.setattr(
        xlv.SD, "sd_vae_decoder_forward",
        lambda params, z: jnp.zeros((z.shape[0], 3, z.shape[2] * 8,
                                     z.shape[3] * 8), jnp.float32))

    pipe = SDXLVideoPipeline(dtype=jnp.float32)
    pipe.unet_params = pipe.vae_decoder_params = {}
    pipe.tokenizer = _FakeTok()
    pipe.encode_prompt = lambda p, clip_skip=1: (
        jnp.zeros((1, 7, 2048), jnp.float32),
        jnp.zeros((1, 1280), jnp.float32))
    pipe.fetch_motion_modules({"0": {}})
    lat = pipe("a cat", num_frames=5, height=64, width=64, seed=0,
               num_inference_steps=2, cfg_scale=1.0,
               animatediff_batch_size=3, animatediff_stride=2,
               return_latents=True)
    assert lat.shape == (5, 4, 8, 8)
    assert bool(jnp.isfinite(lat).all())
    # windows 0:3, 2:5 per step -> batch sizes [3, 3] twice
    assert seen["batches"] == [3, 3, 3, 3]
    assert all(seen["motion"])
    # per-frame noise => frames differ
    assert float(jnp.abs(lat[0] - lat[1]).mean()) > 1e-6

    pipe.motion_params = None
    lat_nm = pipe("a cat", num_frames=3, height=64, width=64, seed=0,
                  num_inference_steps=1, cfg_scale=1.0,
                  return_latents=True)
    # no-motion fallback: one repeated noise + scaled_linear schedule
    # (sdxl_video.py:136-139) -> all frames identical
    np.testing.assert_allclose(np.asarray(lat_nm[0]), np.asarray(lat_nm[1]),
                               rtol=0, atol=0)
    from video_styler_tpu.schedulers import EnhancedDDIMScheduler
    np.testing.assert_allclose(
        pipe.scheduler.alphas_cumprod,
        EnhancedDDIMScheduler(beta_schedule="scaled_linear").alphas_cumprod)


def test_sdxl_instant_style_map():
    """set_less_adapter keeps only modules 34..43 -> UNet block 28's ten
    transformers (sdxl_ipadapter.py:67-82)."""
    import torch
    from video_styler_tpu.models.ipadapter import (ipadapter_kwargs,
                                                   convert_ipadapter)
    torch.manual_seed(2)
    ip = load_ref("models.sdxl_ipadapter").SDXLIpAdapter().eval()
    ip_p = convert_ipadapter(ip.state_dict())
    emb = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 1280)), jnp.float32)
    full = ipadapter_kwargs(ip_p, emb, xl=True)
    less = ipadapter_kwargs(ip_p, emb, xl=True, instant_style=True)
    assert set(less.keys()) == {28}
    assert sorted(less[28].keys()) == list(range(10))
    # the kept entries agree with the full map
    for tid in range(10):
        np.testing.assert_array_equal(np.asarray(full[28][tid][0]),
                                      np.asarray(less[28][tid][0]))
