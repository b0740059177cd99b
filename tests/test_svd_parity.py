"""Golden parity: SVD UNet / VAE decoder / image encoder vs the reference
modules (/root/reference/diffsynth/models/svd_unet.py,
svd_vae_decoder.py, svd_image_encoder.py).

The SVD UNet constructor is not size-parameterized, so the oracle runs the
full 1.5B module on CPU with a tiny latent (3 frames, 32x32)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import video_styler_tpu.models.svd as S
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")


@pytest.mark.slow
def test_svd_unet_forward_parity():
    import torch
    ref = load_ref("models.svd_unet")
    torch.manual_seed(0)
    model = ref.SVDUNet().eval()
    params = S.convert_svd_module(model.state_dict())

    rng = np.random.default_rng(0)
    sample = rng.standard_normal((3, 8, 32, 32)).astype(np.float32)
    image_emb = rng.standard_normal((1, 1024)).astype(np.float32)
    add_time_id = np.asarray([6, 127, 0.02], np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(sample), 500.0,
                     torch.from_numpy(image_emb),
                     torch.from_numpy(add_time_id)).numpy()
    got = np.asarray(S.svd_unet_forward(params, jnp.asarray(sample), 500.0,
                                        jnp.asarray(image_emb),
                                        add_time_id), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_svd_vae_decoder_parity():
    import torch
    ref = load_ref("models.svd_vae_decoder")
    torch.manual_seed(0)
    model = ref.SVDVAEDecoder().eval()
    params = S.convert_svd_module(model.state_dict())
    z = np.random.default_rng(1).standard_normal((4, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(z)).numpy()
    got = np.asarray(S.svd_vae_decode(params, jnp.asarray(z)), np.float32)
    assert got.shape == (3, 3, 64, 64)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_svd_image_encoder_parity():
    import torch
    ref = load_ref("models.svd_image_encoder")
    torch.manual_seed(0)
    # tiny ViT via the parameterized constructor
    model = ref.SVDImageEncoder(embed_dim=64, num_encoder_layers=2,
                                encoder_intermediate_size=128,
                                projection_dim=32, num_heads=4,
                                head_dim=16).eval()
    # rebuild embeddings at the tiny dim (fixed 1280 default inside)
    emb_mod = load_ref("models.svd_image_encoder")
    model.embeddings = emb_mod.CLIPVisionEmbeddings(embed_dim=64,
                                                    image_size=28,
                                                    patch_size=14)
    with torch.no_grad():
        model.embeddings.class_embedding.normal_()
        model.embeddings.position_embeds.normal_()
    params = S.convert_svd_module(model.state_dict())
    x = np.random.default_rng(2).standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy()
    got = np.asarray(S.svd_image_encoder_forward(
        params, jnp.asarray(x), num_layers=2, num_heads=4), np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_svd_vae_encoder_scaling():
    """SVDVAEEncoder = SD VAE encoder rescaled to 0.13025
    (svd_vae_encoder.py:4-11)."""
    import torch
    ref = load_ref("models.sd_vae_encoder")
    torch.manual_seed(0)
    model = ref.SDVAEEncoder().eval()
    params = S.convert_svd_module(model.state_dict())
    x = np.random.default_rng(3).standard_normal((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).numpy() / 0.18215 * 0.13025
    got = np.asarray(S.svd_vae_encode(params, jnp.asarray(x)), np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
