"""Golden parity: SD-1.5 UNet / text encoder / VAE vs reference modules."""
import numpy as np
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.sd import (
    sd_unet_forward, sd_text_encoder_forward, sd_vae_encoder_forward,
    sd_vae_decoder_forward, convert_sd_module,
)
from ref_loader import ref_available, load_ref

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")


@needs_ref
def test_sd_text_encoder_parity():
    import torch
    ref = load_ref("models.sd_text_encoder")
    torch.manual_seed(0)
    model = ref.SDTextEncoder(embed_dim=96, vocab_size=100,
                              max_position_embeddings=16,
                              num_encoder_layers=2,
                              encoder_intermediate_size=192).eval()
    # reference hardcodes 12 heads in CLIPEncoderLayer via Attention defaults;
    # embed_dim=96 with num_heads=12 -> head_dim 8? No: Attention gets
    # num_heads=12, head_dim=64 fixed -> dim_inner 768 regardless of embed_dim
    params = convert_sd_module(model.state_dict())
    torch.manual_seed(1)
    ids = torch.randint(0, 100, (1, 16))
    with torch.no_grad():
        want = model(ids).numpy()
    got = np.asarray(sd_text_encoder_forward(params, jnp.asarray(ids.numpy()),
                                             num_layers=2))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@needs_ref
def test_sd_unet_parity():
    import torch
    ref = load_ref("models.sd_unet")
    torch.manual_seed(0)
    model = ref.SDUNet().eval()
    params = convert_sd_module(model.state_dict())
    torch.manual_seed(1)
    x = torch.randn(1, 4, 32, 32)
    t = torch.tensor([500])
    ctx = torch.randn(1, 7, 768)
    with torch.no_grad():
        want = model(x, t, ctx).numpy()
    got = np.asarray(sd_unet_forward(params, jnp.asarray(x.numpy()),
                                     jnp.asarray(t.numpy()),
                                     jnp.asarray(ctx.numpy())))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@needs_ref
def test_sd_vae_parity():
    import torch
    ref_enc = load_ref("models.sd_vae_encoder")
    ref_dec = load_ref("models.sd_vae_decoder")
    torch.manual_seed(0)
    enc = ref_enc.SDVAEEncoder().eval()
    dec = ref_dec.SDVAEDecoder().eval()
    enc_params = convert_sd_module(enc.state_dict())
    dec_params = convert_sd_module(dec.state_dict())
    torch.manual_seed(1)
    img = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        lat_ref = enc(img)
        img_ref = dec(lat_ref)
    lat = sd_vae_encoder_forward(enc_params, jnp.asarray(img.numpy()))
    np.testing.assert_allclose(np.asarray(lat), lat_ref.numpy(),
                               rtol=1e-3, atol=1e-3)
    out = sd_vae_decoder_forward(dec_params, lat)
    np.testing.assert_allclose(np.asarray(out), img_ref.numpy(),
                               rtol=1e-3, atol=2e-3)


@needs_ref
def test_sd_image_pipeline_end_to_end():
    """txt2img + img2img through SDImagePipeline with reference-module
    weights (random init), small resolution."""
    import torch
    from PIL import Image
    from video_styler_tpu.pipelines.sd_image import SDImagePipeline
    ref_unet = load_ref("models.sd_unet")
    ref_te = load_ref("models.sd_text_encoder")
    ref_enc = load_ref("models.sd_vae_encoder")
    ref_dec = load_ref("models.sd_vae_decoder")
    torch.manual_seed(0)
    pipe = SDImagePipeline.from_state_dicts(
        unet_sd=ref_unet.SDUNet().state_dict(),
        text_encoder_sd=ref_te.SDTextEncoder().state_dict(),
        vae_encoder_sd=ref_enc.SDVAEEncoder().state_dict(),
        vae_decoder_sd=ref_dec.SDVAEDecoder().state_dict())
    img = pipe("a cat", num_inference_steps=2, cfg_scale=1.0, seed=0,
               height=128, width=128)
    assert img.size == (128, 128)
    # img2img path
    lat = pipe("a dog", input_image=img, denoising_strength=0.5,
               num_inference_steps=2, cfg_scale=1.0, seed=1, height=128,
               width=128, return_latents=True)
    assert lat.shape == (1, 4, 16, 16)
    assert bool(jnp.isfinite(lat.astype(jnp.float32)).all())
