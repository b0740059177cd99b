"""CLIP ViT parity vs reference VisionTransformer + I2V pipeline path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from video_styler_tpu.models.clip_vit import (
    ClipVitConfig, clip_vit_forward, convert_clip_vit, init_clip_vit,
    preprocess_clip_image,
)
from ref_loader import ref_available, load_ref

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")


@needs_ref
def test_tiny_vit_parity():
    import torch
    ref = load_ref("models.wan_video_image_encoder")
    torch.manual_seed(0)
    model = ref.VisionTransformer(
        image_size=28, patch_size=14, dim=64, mlp_ratio=4, out_dim=64,
        num_heads=2, num_layers=3, pool_type="token", pre_norm=True,
        post_norm=False, activation="gelu", norm_eps=1e-5).eval()

    cfg = ClipVitConfig(image_size=28, patch_size=14, dim=64, num_heads=2,
                        num_layers=3)
    sd = {f"visual.{k}": v for k, v in model.state_dict().items()}
    params = convert_clip_vit(sd, cfg, dtype=jnp.float32)

    torch.manual_seed(1)
    x = torch.randn(2, 3, 28, 28)
    with torch.no_grad():
        want = model(x, use_31_block=True).numpy()
    got = np.asarray(clip_vit_forward(params, cfg, jnp.asarray(x.numpy()),
                                      use_31_block=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@needs_ref
def test_clip_preprocess_matches_reference():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 3, 32, 48)).astype(np.float32).clip(-1, 1)
    # reference: bicubic resize then Normalize(mean, std) on [0,1]
    t = F.interpolate(torch.from_numpy(img), size=(28, 28), mode="bicubic",
                      align_corners=False)
    t = t.mul(0.5).add(0.5)
    from video_styler_tpu.models.clip_vit import CLIP_MEAN, CLIP_STD
    want = ((t - torch.tensor(CLIP_MEAN).view(1, 3, 1, 1))
            / torch.tensor(CLIP_STD).view(1, 3, 1, 1)).numpy()
    got = preprocess_clip_image(img, image_size=28)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@needs_ref
def test_i2v_pipeline_end_to_end():
    """I2V with image-input DiT: clip slots + y concat drive the forward."""
    from test_pipeline import _tiny_pipe, _FakeTokenizer
    from video_styler_tpu.models.wan_dit import WanDiTConfig, init_wan_dit
    from video_styler_tpu.models.clip_vit import CLIP_VIT_TINY

    pipe = _tiny_pipe(with_vace=False)
    # switch DiT to image-input variant: in_dim = z(4) + mask(4) + y_lat(4)
    cfg = WanDiTConfig(dim=96, in_dim=12, ffn_dim=192, out_dim=4, num_heads=2,
                       num_layers=2, text_dim=64, freq_dim=32,
                       has_image_input=True)
    pipe.dit_cfg = cfg
    pipe.dit_params = init_wan_dit(jax.random.PRNGKey(5), cfg)
    # tiny image encoder producing 1280-dim CLIP features; the DiT cross-attn
    # slices y[:, :257] so the encoder must emit 257 tokens (16x16 grid + cls)
    enc_cfg = ClipVitConfig(image_size=112, patch_size=7, dim=1280,
                            num_heads=4, num_layers=2)
    pipe.image_encoder_cfg = enc_cfg
    pipe.image_encoder_params = init_clip_vit(jax.random.PRNGKey(6), enc_cfg)

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8))
    lat = pipe("animate this", input_image=img, num_frames=5, height=32,
               width=32, seed=1, num_inference_steps=2, cfg_scale=1.0,
               tiled=False, return_latents=True)
    assert lat.shape == (1, 4, 2, 4, 4)
    assert bool(jnp.isfinite(lat.astype(jnp.float32)).all())
