"""Streaming (temporal-chunked, cache-carried) VAE encode/decode — the
reference feat_cache design (wan_video_vae.py:984-1034) in functional form —
must match the full-sequence graphs exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import video_styler_tpu.models.wan_vae as V


@pytest.fixture(scope="module")
def setup():
    cfg = V.WAN_VAE_TINY
    params = V.init_wan_vae(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_decode_stream_matches_full(setup):
    cfg, params = setup
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim, 7, 6, 8),
                          jnp.float32)
    want = np.asarray(V.vae_decode(params, z, cfg, clamp=False))
    for cs in (1, 2, 3, 5):
        got = np.asarray(V.vae_decode_stream(params, z, cfg, chunk_size=cs,
                                             clamp=False))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_encode_stream_matches_full(setup):
    cfg, params = setup
    for T in (1, 5, 13):
        vid = jax.random.normal(jax.random.PRNGKey(2), (1, 3, T, 32, 48),
                                jnp.float32)
        want = np.asarray(V.vae_encode(params, vid, cfg))
        got = np.asarray(V.vae_encode_stream(params, vid, cfg))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_public_api_routes_streaming(setup):
    cfg, params = setup
    vid = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 5, 32, 48),
                            jnp.float32)
    # tiled=True now routes through streaming (exact), unless explicitly
    # disabled
    a = np.asarray(V.encode(params, vid, cfg, tiled=True))
    b = np.asarray(V.vae_encode(params, vid, cfg))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    z = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.z_dim, 3, 4, 6),
                          jnp.float32)
    c = np.asarray(V.decode(params, z, cfg, tiled=True))
    d = np.asarray(V.vae_decode(params, z, cfg))
    np.testing.assert_allclose(c, d, rtol=1e-4, atol=1e-5)
    # explicit spatial tiling still available
    e = np.asarray(V.encode(params, vid, cfg, tiled=True, streaming=False,
                            tile_size=(2, 2), tile_stride=(1, 1)))
    assert e.shape == b.shape


def test_vae38_streaming_matches_full():
    """Wan2.2 VAE38 streaming == full sequence (needs reference weights for
    a structurally-complete param tree)."""
    from ref_loader import ref_available, load_ref
    if not ref_available():
        pytest.skip("reference not mounted")
    import torch
    from video_styler_tpu.models.wan_vae import (WanVAE38Config,
                                                 convert_wan_vae)
    ref = load_ref("models.wan_video_vae")
    torch.manual_seed(0)
    model = ref.VideoVAE38_(dim=16, z_dim=8, dec_dim=16,
                            dim_mult=[1, 2, 4, 4], num_res_blocks=1,
                            attn_scales=[],
                            temperal_downsample=[False, True, True],
                            dropout=0.0).eval()
    cfg = WanVAE38Config(dim=16, dec_dim=16, z_dim=8, dim_mult=(1, 2, 4, 4),
                         num_res_blocks=1,
                         temperal_downsample=(False, True, True),
                         latent_mean=(0.0,) * 8, latent_std=(1.0,) * 8)
    params = convert_wan_vae(model.state_dict(), dtype=jnp.float32)

    vid = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 9, 32, 32),
                            jnp.float32)
    want_z = np.asarray(V.vae38_encode(params, vid, cfg))
    got_z = np.asarray(V.vae38_encode_stream(params, vid, cfg))
    np.testing.assert_allclose(got_z, want_z, rtol=1e-4, atol=1e-5)

    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 3, 4, 4),
                          jnp.float32)
    want_v = np.asarray(V.vae38_decode(params, z, cfg, clamp=False))
    for cs in (1, 2):
        got_v = np.asarray(V.vae38_decode_stream(params, z, cfg,
                                                 chunk_size=cs, clamp=False))
        np.testing.assert_allclose(got_v, want_v, rtol=1e-4, atol=1e-5)


def test_sharded_vae_matches_unsharded():
    """GSPMD width-sharded VAE (the mesh replacement for the reference's
    spatial tiling) must match the single-device result."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import _tiny_vae_params
    import jax.numpy as jnp
    import numpy as np
    import video_styler_tpu.models.wan_vae as V
    from video_styler_tpu.parallel import (
        make_mesh, ShardingContext, use_sharding)

    params = _tiny_vae_params()
    cfg = V.WAN_VAE_TINY
    video = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 9, 32, 64),
                              jnp.float32)
    lat = V.encode(params, video, cfg, tiled=False)
    out = V.decode(params, lat, cfg, tiled=False)

    mesh = make_mesh(dp=1, fsdp=1, sp=2)
    with use_sharding(ShardingContext(mesh)):
        lat_s = V.encode(params, video, cfg, tiled=False)
        out_s = V.decode(params, lat_s, cfg, tiled=False)
    np.testing.assert_allclose(np.asarray(lat_s), np.asarray(lat),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out),
                               rtol=1e-4, atol=1e-5)

    # streaming (cache-carried) path under the mesh too
    with use_sharding(ShardingContext(mesh)):
        lat_st = V.encode(params, video, cfg, tiled=True)
        out_st = V.decode(params, lat_st.astype(jnp.float32), cfg, tiled=True)
    np.testing.assert_allclose(np.asarray(lat_st), np.asarray(lat),
                               rtol=1e-3, atol=1e-3)
    assert out_st.shape == out.shape
