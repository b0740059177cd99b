"""Golden parity: Wan-Animate adapter pieces vs reference torch module."""
import numpy as np
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.wan_animate import (
    upfirdn2d, get_motion, face_encoder, face_block, convert_wan_animate,
    animate_after_transformer_block, encoder_app,
)
from ref_loader import ref_available, load_ref

needs_ref = pytest.mark.skipif(not ref_available(), reason="reference not mounted")


@needs_ref
def test_upfirdn2d_parity():
    import torch
    ref = load_ref("models.wan_video_animate_adapter")
    torch.manual_seed(0)
    x = torch.randn(2, 3, 16, 16)
    kernel = ref.make_kernel([1, 3, 3, 1])
    want = ref.upfirdn2d(x, kernel, pad=(2, 1)).numpy()
    got = np.asarray(upfirdn2d(jnp.asarray(x.numpy()),
                               jnp.asarray(kernel.numpy()), pad=(2, 1)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    want_d = ref.upfirdn2d(x, kernel, down=2, pad=(2, 1)).numpy()
    got_d = np.asarray(upfirdn2d(jnp.asarray(x.numpy()),
                                 jnp.asarray(kernel.numpy()), down=2, pad=(2, 1)))
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-5)


@needs_ref
def test_motion_encoder_parity():
    import torch
    ref = load_ref("models.wan_video_animate_adapter")
    torch.manual_seed(0)
    gen = ref.Generator(size=64, style_dim=512, motion_dim=20).eval()
    params = convert_wan_animate(gen.state_dict())
    torch.manual_seed(1)
    img = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = gen.get_motion(img).numpy()
    got = np.asarray(get_motion(params, jnp.asarray(img.numpy()), size=64))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@needs_ref
def test_face_encoder_and_block_parity():
    import torch
    ref = load_ref("models.wan_video_animate_adapter")
    torch.manual_seed(0)
    fe = ref.FaceEncoder(in_dim=512, hidden_dim=5120 // 8, num_heads=4).eval()
    params = {"face_encoder": convert_wan_animate(fe.state_dict())}
    torch.manual_seed(1)
    x = torch.randn(1, 9, 512)
    with torch.no_grad():
        want = fe(x).numpy()
    got = np.asarray(face_encoder(params["face_encoder"],
                                  jnp.asarray(x.numpy()), num_heads=4))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    torch.manual_seed(2)
    fb = ref.FaceBlock(hidden_size=128, heads_num=4).eval()
    fparams = convert_wan_animate(fb.state_dict())
    T, tokens_per_frame = 3, 5
    xx = torch.randn(1, T * tokens_per_frame, 128)
    mv = torch.randn(1, T, 2, 128)
    with torch.no_grad():
        want = fb(xx, mv).numpy()
    got = np.asarray(face_block(fparams, jnp.asarray(xx.numpy()),
                                jnp.asarray(mv.numpy()), heads_num=4))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@needs_ref
def test_animate_pipeline_end_to_end():
    """Tiny pipeline run with pose+face conditioning through the generic
    WanVideoPipeline animate path."""
    import torch
    import jax
    from PIL import Image
    from test_pipeline import _tiny_pipe
    ref = load_ref("models.wan_video_animate_adapter")

    pipe = _tiny_pipe(with_vace=False)
    torch.manual_seed(0)
    gen = ref.Generator(size=64, style_dim=512, motion_dim=20).eval()
    fe = ref.FaceEncoder(in_dim=512, hidden_dim=96, num_heads=4).eval()
    fb = ref.FaceBlock(hidden_size=96, heads_num=2).eval()
    pose_w = torch.randn(96, 4, 1, 2, 2) * 0.02
    pipe.animate_params = {
        "pose_patch_embedding": {"weight": jnp.asarray(pose_w.numpy()),
                                 "bias": jnp.zeros(96)},
        "motion_encoder": convert_wan_animate(gen.state_dict()),
        "face_encoder": convert_wan_animate(fe.state_dict()),
        "face_adapter": {"fuser_blocks": {"0": convert_wan_animate(fb.state_dict())}},
    }
    # monkeypatch: tiny face encoder expects size-64 motion images
    import video_styler_tpu.models.wan_animate as A
    orig = A.animate_after_patch_embedding
    def patched(params, x, pose_latents, face_values):
        return orig(params, x, pose_latents, face_values, size=64)
    A.animate_after_patch_embedding = patched
    try:
        rng = np.random.default_rng(0)
        frames = lambda n, hw: [Image.fromarray(
            rng.integers(0, 255, (hw, hw, 3), np.uint8)) for _ in range(n)]
        # num_frames=9 -> latent T=3; pose video 5 frames -> latent T-1=2
        lat = pipe("dance", num_frames=9, height=32, width=32, seed=3,
                   num_inference_steps=2, cfg_scale=1.0, tiled=False,
                   animate_pose_video=frames(5, 32),
                   animate_face_video=frames(3, 64),
                   return_latents=True)
        assert lat.shape == (1, 4, 3, 4, 4)
        assert bool(jnp.isfinite(lat.astype(jnp.float32)).all())
    finally:
        A.animate_after_patch_embedding = orig
