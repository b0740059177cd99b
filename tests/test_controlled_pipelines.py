"""Controlled-generation pipeline tests: SD ControlNet + IP-Adapter in
SDImagePipeline, SDVideoPipeline with AnimateDiff motion + long-video blend."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")


def _sd_parts():
    import torch
    from video_styler_tpu.models.sd import convert_sd_module
    torch.manual_seed(0)
    unet = load_ref("models.sd_unet").SDUNet().eval()
    te = load_ref("models.sd_text_encoder").SDTextEncoder(vocab_size=64).eval()
    return (convert_sd_module(unet.state_dict()),
            convert_sd_module(te.state_dict()))


class _FakeTok:
    def __call__(self, texts, padding=None, max_length=None, truncation=None,
                 return_tensors=None):
        ids = np.zeros((1, max_length), np.int64)
        n = min(len(texts[0].split()) + 1, max_length)
        ids[0, :n] = (np.arange(1, n + 1) * 7) % 64
        return {"input_ids": ids}


def test_sd_image_controlnet_conditioning():
    import torch
    from video_styler_tpu.pipelines.sd_image import SDImagePipeline
    from video_styler_tpu.controlnets import (Annotator, ControlNetUnit)
    from video_styler_tpu.models.controlnet import convert_controlnet
    unet_p, te_p = _sd_parts()
    torch.manual_seed(1)
    cn = load_ref("models.sd_controlnet").SDControlNet().eval()
    cn_p = convert_controlnet(cn.state_dict())

    pipe = SDImagePipeline(dtype=jnp.float32)
    pipe.unet_params = unet_p
    pipe.text_encoder_params = te_p
    pipe.tokenizer = _FakeTok()
    units = [ControlNetUnit(Annotator("canny"), cn_p, scale=0.8)]
    ctrl = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8))
    lat_ctrl = pipe("a cat", controlnet_image=ctrl, controlnet_units=units,
                    height=64, width=64, seed=3, num_inference_steps=2,
                    cfg_scale=1.0, return_latents=True)
    lat_plain = pipe("a cat", height=64, width=64, seed=3,
                     num_inference_steps=2, cfg_scale=1.0,
                     return_latents=True)
    assert bool(jnp.isfinite(lat_ctrl).all())
    assert float(jnp.abs(lat_ctrl - lat_plain).mean()) > 1e-6


def test_sd_image_ipadapter_conditioning():
    import torch
    from video_styler_tpu.pipelines.sd_image import SDImagePipeline
    from video_styler_tpu.models.ipadapter import convert_ipadapter
    unet_p, te_p = _sd_parts()
    torch.manual_seed(2)
    ip = load_ref("models.sd_ipadapter").SDIpAdapter().eval()
    ip_p = convert_ipadapter(ip.state_dict())

    pipe = SDImagePipeline(dtype=jnp.float32)
    pipe.unet_params = unet_p
    pipe.text_encoder_params = te_p
    pipe.tokenizer = _FakeTok()
    emb = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 1024)), jnp.float32)
    lat_ip = pipe("a cat", ipadapter_params=ip_p, ipadapter_image_embeds=emb,
                  ipadapter_scale=1.0, height=64, width=64, seed=3,
                  num_inference_steps=2, cfg_scale=1.0, return_latents=True)
    lat_plain = pipe("a cat", height=64, width=64, seed=3,
                     num_inference_steps=2, cfg_scale=1.0,
                     return_latents=True)
    assert bool(jnp.isfinite(lat_ip).all())
    assert float(jnp.abs(lat_ip - lat_plain).mean()) > 1e-6


def test_sd_video_animatediff():
    import torch
    from video_styler_tpu.pipelines.sd_video import SDVideoPipeline
    from video_styler_tpu.models.motion import convert_motion_model
    unet_p, te_p = _sd_parts()
    torch.manual_seed(3)
    mm = load_ref("models.sd_motion").SDMotionModel().eval()
    with torch.no_grad():
        for blk in mm.motion_modules:
            for tb in blk.transformer_blocks:
                tb.pe1.normal_(std=0.02)
                tb.pe2.normal_(std=0.02)
    mm_p = convert_motion_model(mm.state_dict())["motion_modules"]

    pipe = SDVideoPipeline(dtype=jnp.float32)
    pipe.unet_params = unet_p
    pipe.text_encoder_params = te_p
    pipe.tokenizer = _FakeTok()
    pipe.motion_params = mm_p
    lat = pipe("a cat", num_frames=4, height=64, width=64, seed=0,
               num_inference_steps=2, cfg_scale=1.0,
               animatediff_batch_size=3, animatediff_stride=2,
               return_latents=True)
    assert lat.shape == (4, 4, 8, 8)
    assert bool(jnp.isfinite(lat).all())
    pipe.motion_params = None
    lat_nomotion = pipe("a cat", num_frames=4, height=64, width=64, seed=0,
                        num_inference_steps=2, cfg_scale=1.0,
                        animatediff_batch_size=3, animatediff_stride=2,
                        return_latents=True)
    assert float(jnp.abs(lat - lat_nomotion).mean()) > 1e-6
