"""Golden parity: HunyuanVideo causal VAE vs the reference modules
(/root/reference/diffsynth/models/hunyuan_video_vae_encoder.py,
hunyuan_video_vae_decoder.py), incl. 3-D tiling equivalence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import video_styler_tpu.models.hunyuan_video_vae as HV
from ref_loader import ref_available, load_ref

pytestmark = pytest.mark.skipif(not ref_available(),
                                reason="reference not mounted")

TINY = HV.HUNYUAN_VAE_TINY


def _tiny_ref():
    import torch
    enc_mod = load_ref("models.hunyuan_video_vae_encoder")
    dec_mod = load_ref("models.hunyuan_video_vae_decoder")
    torch.manual_seed(0)
    enc = enc_mod.HunyuanVideoVAEEncoder(
        out_channels=TINY.z_dim, block_out_channels=list(TINY.block_out_channels),
        layers_per_block=TINY.layers_per_block, num_groups=TINY.num_groups).eval()
    dec = dec_mod.HunyuanVideoVAEDecoder(
        in_channels=TINY.z_dim, block_out_channels=list(TINY.block_out_channels),
        layers_per_block=TINY.layers_per_block, num_groups=TINY.num_groups).eval()
    return enc, dec


def test_hunyuan_vae_encode_decode_parity():
    import torch
    enc, dec = _tiny_ref()
    p_enc = HV.convert_hunyuan_vae(enc.state_dict())
    p_dec = HV.convert_hunyuan_vae(dec.state_dict())

    x = np.random.default_rng(0).standard_normal((1, 3, 5, 32, 32)).astype(np.float32)
    with torch.no_grad():
        # the reference slice is hard-coded to the full-size z=16
        # (hunyuan_video_vae_encoder.py:202); at tiny z it returns 2*z chans
        want_z = enc(torch.from_numpy(x)).numpy()[:, :TINY.z_dim]
    got_z = np.asarray(HV.vae_encode(p_enc, jnp.asarray(x), TINY))
    assert got_z.shape == (1, TINY.z_dim, 2, 4, 4)
    np.testing.assert_allclose(got_z, want_z, rtol=2e-3, atol=2e-4)

    with torch.no_grad():
        want_y = dec(torch.from_numpy(want_z)).numpy()
    got_y = np.asarray(HV.vae_decode(p_dec, jnp.asarray(got_z), TINY))
    assert got_y.shape == (1, 3, 5, 32, 32)
    np.testing.assert_allclose(got_y, want_y, rtol=2e-3, atol=2e-3)


def test_hunyuan_vae_tiled_decode_matches_reference_tiler():
    import torch
    _, dec = _tiny_ref()
    p_dec = HV.convert_hunyuan_vae(dec.state_dict())
    z = np.random.default_rng(1).standard_normal(
        (1, TINY.z_dim, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = dec.tile_forward(torch.from_numpy(z), tile_size=(2, 6, 6),
                                tile_stride=(1, 4, 4)).numpy()
    got = np.asarray(HV.tiled_decode(p_dec, jnp.asarray(z), TINY,
                                     tile_size=(2, 6, 6), tile_stride=(1, 4, 4)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_hunyuan_vae_tiled_encode_blends():
    enc, _ = _tiny_ref()
    p_enc = HV.convert_hunyuan_vae(enc.state_dict())
    x = np.random.default_rng(2).standard_normal((1, 3, 5, 48, 48)).astype(np.float32)
    full = np.asarray(HV.vae_encode(p_enc, jnp.asarray(x), TINY))
    # one tile covering everything == untiled encode exactly
    one = np.asarray(HV.tiled_encode(p_enc, jnp.asarray(x), TINY,
                                     tile_size=(5, 48, 48),
                                     tile_stride=(5, 48, 48)))
    np.testing.assert_allclose(one, full, rtol=1e-5, atol=1e-6)
    # multi-tile blending stays finite with the right shape
    tiled = np.asarray(HV.tiled_encode(p_enc, jnp.asarray(x), TINY,
                                       tile_size=(5, 32, 32),
                                       tile_stride=(4, 16, 16)))
    assert tiled.shape == full.shape
    assert np.isfinite(tiled).all()
