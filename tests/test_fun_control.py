"""Fun-control surface tests: FunControl / FunReference / FunCameraControl /
SpeedControl wired through WanVideoPipeline.__call__, matching the reference
units at /root/reference/diffsynth/pipelines/wan_video_new.py:752-858.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from video_styler_tpu.models.wan_dit import WanDiTConfig, init_wan_dit
from video_styler_tpu.models.wan_controllers import (
    init_motion_controller, init_simple_adapter,
    process_camera_coordinates, pack_camera_latents,
)
from test_pipeline import _tiny_pipe, _frames, TINY_DIT
from ref_loader import ref_available


def _retrofit_dit(pipe, **cfg_overrides):
    pipe.dit_cfg = dataclasses.replace(TINY_DIT, **cfg_overrides)
    pipe.dit_params = init_wan_dit(jax.random.PRNGKey(0), pipe.dit_cfg)
    pipe._jit_cache.clear()
    return pipe


def test_pack_camera_latents_parity():
    """Temporal 4x packing matches the reference tensor ops
    (WanVideoUnit_FunCameraControl, wan_video_new.py:812-823)."""
    torch = pytest.importorskip("torch")
    num_frames, H, W = 9, 16, 24
    plucker = np.random.default_rng(0).standard_normal(
        (num_frames, H, W, 6)).astype(np.float32)

    got = pack_camera_latents(plucker, num_frames)

    emb = torch.from_numpy(plucker)
    video = emb[:num_frames].permute([3, 0, 1, 2]).unsqueeze(0)
    lat = torch.concat(
        [torch.repeat_interleave(video[:, :, 0:1], repeats=4, dim=2),
         video[:, :, 1:]], dim=2).transpose(1, 2)
    b, f, c, h, w = lat.shape
    lat = lat.contiguous().view(b, f // 4, 4, c, h, w).transpose(2, 3)
    lat = lat.contiguous().view(b, f // 4, c * 4, h, w).transpose(1, 2)
    np.testing.assert_allclose(got, lat.numpy(), rtol=0, atol=0)


def test_camera_coordinates_move_origin():
    left = process_camera_coordinates("Left", 5, 16, 16)
    right = process_camera_coordinates("Right", 5, 16, 16)
    assert left.shape == (5, 16, 16, 6)
    assert not np.allclose(left[1:], right[1:])


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_fun_control_changes_output():
    """control_video conditions generation: y = [control latents | tail]
    (wan_video_new.py:752-774)."""
    pipe = _tiny_pipe(with_vace=False)
    # Fun-Control models carry clip slots (zero clip_feature when absent)
    _retrofit_dit(pipe, in_dim=12, has_image_input=True)
    common = dict(num_frames=5, height=32, width=32, seed=3,
                  num_inference_steps=2, cfg_scale=1.0, tiled=False,
                  return_latents=True)
    lat_a = pipe("a cat", control_video=_frames(5, seed=1), **common)
    lat_b = pipe("a cat", control_video=_frames(5, seed=2), **common)
    assert lat_a.shape == (1, 4, 2, 4, 4)
    assert bool(jnp.isfinite(lat_a.astype(jnp.float32)).all())
    assert float(jnp.abs(lat_a - lat_b).mean()) > 1e-5


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_fun_control_y_assembly():
    """y channel layout: first z channels are the control-video latents,
    the tail is zeros when no I2V conditioning is present."""
    pipe = _tiny_pipe(with_vace=False)
    _retrofit_dit(pipe, in_dim=12, has_image_input=True,
                  require_clip_embedding=False)
    frames = _frames(5, seed=1)
    clip, y = pipe.build_fun_control(frames, 5, 32, 32, None, None, tiled=False)
    assert clip.shape == (1, 257, 1280)
    assert y.shape == (1, 8, 2, 4, 4)
    from video_styler_tpu.pipelines.wan_video import _preprocess_images
    control_lat = pipe.encode_video(_preprocess_images(frames), tiled=False)
    np.testing.assert_allclose(np.asarray(y[:, :4], np.float32),
                               np.asarray(control_lat, np.float32),
                               rtol=1e-5, atol=1e-6)
    assert float(jnp.abs(y[:, 4:]).max()) == 0.0


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_fun_reference_changes_output():
    """reference_image tokens prepended via ref_conv as an extra RoPE frame
    (wan_video_new.py:777-795, 1385-1390, 1464-1467)."""
    pipe = _tiny_pipe(with_vace=False)
    _retrofit_dit(pipe, has_ref_conv=True)
    # tiny z=4 latent -> ref_conv in-features 4*2*2
    from video_styler_tpu.ops.basic import init_linear
    pipe.dit_params["ref_conv"] = init_linear(jax.random.PRNGKey(9), 16, 96)
    common = dict(num_frames=5, height=32, width=32, seed=3,
                  num_inference_steps=2, cfg_scale=1.0, tiled=False,
                  return_latents=True)
    lat_ref = pipe("a cat", reference_image=_frames(1, seed=5)[0], **common)
    lat_plain = pipe("a cat", **common)
    assert lat_ref.shape == lat_plain.shape == (1, 4, 2, 4, 4)
    assert bool(jnp.isfinite(lat_ref.astype(jnp.float32)).all())
    assert float(jnp.abs(lat_ref - lat_plain).mean()) > 1e-5


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_fun_camera_control():
    """camera_control_direction drives the SimpleAdapter hint and the
    first-frame y (wan_video_new.py:799-845)."""
    pipe = _tiny_pipe(with_vace=False)
    _retrofit_dit(pipe, in_dim=8, require_clip_embedding=False)
    pipe.dit_params["control_adapter"] = init_simple_adapter(
        jax.random.PRNGKey(4), in_dim=24, out_dim=96)
    img = _frames(1)[0]
    common = dict(num_frames=5, height=32, width=32, seed=3,
                  num_inference_steps=2, cfg_scale=1.0, tiled=False,
                  input_image=img, return_latents=True)
    lat_l = pipe("a cat", camera_control_direction="Left", **common)
    lat_r = pipe("a cat", camera_control_direction="Right", **common)
    assert lat_l.shape == (1, 4, 2, 4, 4)
    assert bool(jnp.isfinite(lat_l.astype(jnp.float32)).all())
    assert float(jnp.abs(lat_l - lat_r).mean()) > 1e-6


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_camera_y_first_frame_is_input_latent():
    pipe = _tiny_pipe(with_vace=False)
    _retrofit_dit(pipe, in_dim=8, require_clip_embedding=False)
    img = _frames(1)[0]
    cam, y = pipe.build_fun_camera_control(
        "Up", 1 / 54, None, img, 5, 32, 32, (1, 4, 2, 4, 4), tiled=False)
    assert cam.shape == (1, 24, 2, 32, 32)
    assert y.shape == (1, 4, 2, 4, 4)
    from video_styler_tpu.pipelines.wan_video import _preprocess_images
    want = pipe.encode_video(
        _preprocess_images([img.resize((32, 32))]), tiled=False)
    np.testing.assert_allclose(np.asarray(y[:, :, :1], np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-3, atol=1e-5)
    assert float(jnp.abs(y[:, :, 1:]).max()) == 0.0


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_speed_control_changes_output():
    """motion_bucket_id adds a learned 6-way t_mod term
    (WanVideoUnit_SpeedControl + wan_video_new.py:1355-1357)."""
    pipe = _tiny_pipe(with_vace=False)
    mc = init_motion_controller(jax.random.PRNGKey(7), dim=96)
    # reference zero-inits the last layer; perturb so the test can see it
    mc["fc3"]["w"] = jax.random.normal(jax.random.PRNGKey(8),
                                       mc["fc3"]["w"].shape) * 0.05
    pipe.motion_controller_params = mc
    common = dict(num_frames=5, height=32, width=32, seed=3,
                  num_inference_steps=2, cfg_scale=1.0, tiled=False,
                  return_latents=True)
    lat_fast = pipe("a cat", motion_bucket_id=90.0, **common)
    lat_slow = pipe("a cat", motion_bucket_id=5.0, **common)
    lat_none = pipe("a cat", **common)
    assert float(jnp.abs(lat_fast - lat_slow).mean()) > 1e-6
    assert float(jnp.abs(lat_fast - lat_none).mean()) > 1e-6


def test_motion_bucket_requires_controller():
    pipe_cls = pytest.importorskip(
        "video_styler_tpu.pipelines.wan_video").WanVideoPipeline
    pipe = pipe_cls(dtype=jnp.float32)
    pipe.dit_cfg = TINY_DIT
    with pytest.raises(RuntimeError):
        pipe("x", motion_bucket_id=5.0, num_frames=5, height=32, width=32)
