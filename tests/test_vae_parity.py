"""Golden parity: causal video VAE vs the reference chunked implementation.

The reference streams 1+4k frame chunks through mutable conv caches
(wan_video_vae.py:984-1034); our build runs the full sequence through causal
convolutions in one XLA graph. These tests prove the two are numerically
identical (fp32) on a small config, including the temporal down/upsample
first-frame special cases.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.wan_vae import (
    WanVAEConfig, vae_encode, vae_decode, tiled_encode, tiled_decode,
    convert_wan_vae,
)
from ref_loader import ref_available, load_ref

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")

TINY = dict(dim=16, z_dim=4, dim_mult=[1, 2, 4, 4], num_res_blocks=1,
            attn_scales=[], temperal_downsample=[False, True, True], dropout=0.0)


def _build_ref_vae():
    import torch
    ref = load_ref("models.wan_video_vae")
    torch.manual_seed(0)
    model = ref.VideoVAE_(**TINY).eval()
    return model


def _tiny_cfg():
    return WanVAEConfig(dim=16, z_dim=4, dim_mult=(1, 2, 4, 4), num_res_blocks=1,
                        temperal_downsample=(False, True, True),
                        latent_mean=(0.0,) * 4, latent_std=(1.0,) * 4)


@needs_ref
@pytest.mark.parametrize("t", [1, 5, 9])
def test_vae_encode_parity(t):
    import torch
    model = _build_ref_vae()
    cfg = _tiny_cfg()
    params = convert_wan_vae(model.state_dict(), dtype=jnp.float32)

    torch.manual_seed(1)
    x = torch.randn(1, 3, t, 32, 32)
    scale = [torch.zeros(4), torch.ones(4)]
    with torch.no_grad():
        want = model.encode(x, scale).numpy()
    got = np.asarray(vae_encode(params, jnp.asarray(x.numpy()), cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@needs_ref
@pytest.mark.parametrize("t", [1, 2, 3])
def test_vae_decode_parity(t):
    import torch
    model = _build_ref_vae()
    cfg = _tiny_cfg()
    params = convert_wan_vae(model.state_dict(), dtype=jnp.float32)

    torch.manual_seed(2)
    z = torch.randn(1, 4, t, 4, 4)
    scale = [torch.zeros(4), torch.ones(4)]
    with torch.no_grad():
        want = model.decode(z, scale).numpy()
    got = np.asarray(vae_decode(params, jnp.asarray(z.numpy()), cfg, clamp=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@needs_ref
def test_vae_roundtrip_shapes():
    model = _build_ref_vae()
    cfg = _tiny_cfg()
    params = convert_wan_vae(model.state_dict(), dtype=jnp.float32)
    import torch
    torch.manual_seed(3)
    x = jnp.asarray(torch.randn(1, 3, 9, 32, 32).numpy())
    z = vae_encode(params, x, cfg)
    assert z.shape == (1, 4, 3, 4, 4)
    y = vae_decode(params, z, cfg)
    assert y.shape == (1, 3, 9, 32, 32)
    assert bool(jnp.isfinite(y).all())


@needs_ref
def test_tiled_encode_single_tile_equals_untiled():
    model = _build_ref_vae()
    cfg = _tiny_cfg()
    params = convert_wan_vae(model.state_dict(), dtype=jnp.float32)
    import torch
    torch.manual_seed(4)
    x = jnp.asarray(torch.randn(1, 3, 5, 32, 32).numpy())
    full = np.asarray(vae_encode(params, x, cfg))
    one_tile = np.asarray(tiled_encode(params, np.asarray(x), cfg,
                                       tile_size=(8, 8), tile_stride=(8, 8)))
    np.testing.assert_allclose(one_tile, full, rtol=1e-4, atol=1e-5)


@needs_ref
def test_tiled_decode_multi_tile_blends():
    model = _build_ref_vae()
    cfg = _tiny_cfg()
    params = convert_wan_vae(model.state_dict(), dtype=jnp.float32)
    import torch
    torch.manual_seed(5)
    z = np.asarray(torch.randn(1, 4, 2, 8, 8).numpy())
    vid = np.asarray(tiled_decode(params, z, cfg, tile_size=(6, 6), tile_stride=(3, 3)))
    assert vid.shape == (1, 3, 5, 64, 64)
    assert np.isfinite(vid).all()
    # interior must be a proper convex blend: compare to untiled on the
    # interior where tiles fully overlap context (loose tolerance)
    full = np.asarray(vae_decode(params, jnp.asarray(z), cfg))
    assert np.abs(vid[..., 24:40, 24:40] - full[..., 24:40, 24:40]).mean() < 0.5


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_init_wan_vae_structure_matches_checkpoint():
    """init_wan_vae (random init for benches/tests) produces exactly the
    pytree structure of a converted reference checkpoint."""
    import jax.tree_util as jtu
    import video_styler_tpu.models.wan_vae as V
    p = V.init_wan_vae(jax.random.PRNGKey(0), V.WAN_VAE_TINY)
    import torch
    ref = load_ref("models.wan_video_vae")
    torch.manual_seed(0)
    model = ref.VideoVAE_(dim=16, z_dim=4, dim_mult=[1, 2, 4, 4],
                          num_res_blocks=1, attn_scales=[],
                          temperal_downsample=[False, True, True]).eval()
    want = V.convert_wan_vae(model.state_dict())
    ka = {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(p)}
    kb = {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(want)}
    assert ka == kb
