"""Golden parity: Wan2.2 VAE (z=48 family) vs reference VideoVAE38_."""
import numpy as np
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.wan_vae import (
    WanVAE38Config, vae38_encode, vae38_decode, convert_wan_vae,
)
from ref_loader import ref_available, load_ref

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")

TINY = dict(dim=16, z_dim=8, dec_dim=16, dim_mult=[1, 2, 4, 4],
            num_res_blocks=1, attn_scales=[],
            temperal_downsample=[False, True, True], dropout=0.0)


def _build():
    import torch
    ref = load_ref("models.wan_video_vae")
    torch.manual_seed(0)
    model = ref.VideoVAE38_(**TINY).eval()
    cfg = WanVAE38Config(dim=16, dec_dim=16, z_dim=8, dim_mult=(1, 2, 4, 4),
                         num_res_blocks=1,
                         temperal_downsample=(False, True, True),
                         latent_mean=(0.0,) * 8, latent_std=(1.0,) * 8)
    params = convert_wan_vae(model.state_dict(), dtype=jnp.float32)
    return model, cfg, params


@needs_ref
@pytest.mark.parametrize("t", [1, 5])
def test_vae38_encode_parity(t):
    import torch
    model, cfg, params = _build()
    torch.manual_seed(1)
    x = torch.randn(1, 3, t, 32, 32)
    scale = [torch.zeros(8), torch.ones(8)]
    with torch.no_grad():
        want = model.encode(x, scale).numpy()
    got = np.asarray(vae38_encode(params, jnp.asarray(x.numpy()), cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@needs_ref
@pytest.mark.parametrize("t", [1, 2])
def test_vae38_decode_parity(t):
    import torch
    model, cfg, params = _build()
    torch.manual_seed(2)
    z = torch.randn(1, 8, t, 2, 2)
    scale = [torch.zeros(8), torch.ones(8)]
    with torch.no_grad():
        want = model.decode(z, scale).numpy()
    got = np.asarray(vae38_decode(params, jnp.asarray(z.numpy()), cfg,
                                  clamp=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
