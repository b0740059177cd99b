"""Golden parity: SDXL UNet + dual text encoders vs reference modules."""
import numpy as np
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.sdxl import (
    sdxl_unet_forward, sdxl_text_encoder_forward, sdxl_text_encoder_2_forward,
    convert_sdxl_module,
)
from ref_loader import ref_available, load_ref

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")


@needs_ref
def test_sdxl_unet_parity():
    import torch
    ref = load_ref("models.sdxl_unet")
    torch.manual_seed(0)
    model = ref.SDXLUNet().eval()
    params = convert_sdxl_module(model.state_dict())
    torch.manual_seed(1)
    x = torch.randn(1, 4, 16, 16)
    t = torch.tensor([500])
    ctx = torch.randn(1, 7, 2048)
    add_time_id = torch.tensor([1024, 1024, 0, 0, 1024, 1024])
    add_text = torch.randn(1, 1280)
    with torch.no_grad():
        want = model(x, t, ctx, add_time_id, add_text).numpy()
    got = np.asarray(sdxl_unet_forward(
        params, jnp.asarray(x.numpy()), jnp.asarray(t.numpy()),
        jnp.asarray(ctx.numpy()), jnp.asarray(add_time_id.numpy()),
        jnp.asarray(add_text.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@needs_ref
def test_sdxl_text_encoders_parity():
    import torch
    ref = load_ref("models.sdxl_text_encoder")
    torch.manual_seed(0)
    te1 = ref.SDXLTextEncoder(embed_dim=96, vocab_size=100,
                              max_position_embeddings=16,
                              num_encoder_layers=3,
                              encoder_intermediate_size=192).eval()
    te2 = ref.SDXLTextEncoder2(embed_dim=1280, vocab_size=100,
                               max_position_embeddings=16,
                               num_encoder_layers=3,
                               encoder_intermediate_size=256).eval()
    p1 = convert_sdxl_module(te1.state_dict())
    p2 = convert_sdxl_module(te2.state_dict())
    torch.manual_seed(1)
    ids = torch.randint(0, 100, (1, 16))
    with torch.no_grad():
        want1 = te1(ids).numpy()
        pooled_ref, hidden_ref = te2(ids)
    got1 = np.asarray(sdxl_text_encoder_forward(p1, jnp.asarray(ids.numpy()),
                                                num_layers=3))
    np.testing.assert_allclose(got1, want1, rtol=1e-3, atol=1e-4)
    pooled, hidden = sdxl_text_encoder_2_forward(p2, jnp.asarray(ids.numpy()),
                                                 num_layers=3)
    np.testing.assert_allclose(np.asarray(hidden), hidden_ref.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), pooled_ref.numpy(),
                               rtol=1e-3, atol=1e-4)


@needs_ref
def test_sdxl_pipeline_end_to_end():
    import torch
    from video_styler_tpu.pipelines.sdxl_image import SDXLImagePipeline
    ref_unet = load_ref("models.sdxl_unet")
    ref_te = load_ref("models.sdxl_text_encoder")
    torch.manual_seed(0)
    te1 = ref_te.SDXLTextEncoder(embed_dim=768, vocab_size=100,
                                 max_position_embeddings=77,
                                 num_encoder_layers=2,
                                 encoder_intermediate_size=256)
    te2 = ref_te.SDXLTextEncoder2(embed_dim=1280, vocab_size=100,
                                  max_position_embeddings=77,
                                  num_encoder_layers=3,
                                  encoder_intermediate_size=256)
    pipe = SDXLImagePipeline.from_state_dicts(
        unet_sd=ref_unet.SDXLUNet().state_dict(),
        te1_sd=te1.state_dict(), te2_sd=te2.state_dict())
    pipe.te1_layers, pipe.te2_layers = 2, 3
    lat = pipe("a castle", num_inference_steps=1, cfg_scale=1.0, seed=0,
               height=64, width=64, return_latents=True)
    assert lat.shape == (1, 4, 8, 8)
    assert bool(jnp.isfinite(lat.astype(jnp.float32)).all())
