"""End-to-end pipeline tests with tiny models (CPU-runnable).

Builds a pipeline from tiny random-init params (no checkpoints) and runs the
T2V, V2V, VACE and editor paths; plus noise parity vs the reference
generate_noise and TeaCache behavior.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from video_styler_tpu.models.wan_dit import WanDiTConfig, init_wan_dit
from video_styler_tpu.models.wan_vace import VaceConfig, init_vace
from video_styler_tpu.models.wan_vae import WAN_VAE_TINY
from video_styler_tpu.models.t5 import T5_TINY, init_t5
from video_styler_tpu.pipelines import WanVideoPipeline, WanVideoEditorPipeline
from video_styler_tpu.pipelines.wan_video import generate_noise, TeaCache
from ref_loader import ref_available, load_ref

TINY_DIT = WanDiTConfig(dim=96, in_dim=4, ffn_dim=192, out_dim=4,
                        num_heads=2, num_layers=2, text_dim=64, freq_dim=32)
TINY_VACE = VaceConfig(vace_layers=(0, 1), vace_in_dim=4 * 2 + 64, dim=96,
                       num_heads=2, ffn_dim=192)


class _FakeTokenizer:
    def __call__(self, texts, padding=None, truncation=None, max_length=None,
                 return_tensors=None):
        ids = np.zeros((1, max_length), np.int64)
        n = min(len(texts[0].split()) + 1, max_length)
        ids[0, :n] = np.arange(1, n + 1)
        mask = np.zeros((1, max_length), np.int64)
        mask[0, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def _tiny_pipe(cls=WanVideoPipeline, with_vace=True):
    import video_styler_tpu.models.wan_vae as V
    pipe = cls(dtype=jnp.float32)
    pipe.dit_cfg = TINY_DIT
    pipe.dit_params = init_wan_dit(jax.random.PRNGKey(0), TINY_DIT)
    if with_vace:
        pipe.vace_cfg = TINY_VACE
        pipe.vace_params = init_vace(jax.random.PRNGKey(1), TINY_VACE)
    pipe.vae_cfg = WAN_VAE_TINY
    pipe.vae_params = _tiny_vae_params()
    pipe.t5_cfg = T5_TINY
    pipe.text_encoder_params = init_t5(jax.random.PRNGKey(2), T5_TINY)
    pipe.prompter.cfg = T5_TINY
    pipe.prompter.text_len = 16
    pipe.prompter.tokenizer = _FakeTokenizer()
    pipe.prompter.fetch_models(pipe.text_encoder_params)
    return pipe


def _tiny_vae_params():
    """Random-init VAE params via the reference torch module (structure
    authority) if available, else skip-level simple init."""
    if not ref_available():
        pytest.skip("tiny VAE init needs reference torch module")
    import torch
    ref = load_ref("models.wan_video_vae")
    torch.manual_seed(0)
    model = ref.VideoVAE_(dim=16, z_dim=4, dim_mult=[1, 2, 4, 4],
                          num_res_blocks=1, attn_scales=[],
                          temperal_downsample=[False, True, True]).eval()
    from video_styler_tpu.models.wan_vae import convert_wan_vae
    return convert_wan_vae(model.state_dict(), dtype=jnp.float32)


def _frames(n, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return [Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8))
            for _ in range(n)]


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_t2v_end_to_end():
    pipe = _tiny_pipe(with_vace=False)
    frames = pipe("a cat", num_frames=5, height=32, width=32, seed=7,
                  num_inference_steps=4, cfg_scale=2.0, tiled=False)
    assert len(frames) == 5
    assert frames[0].size == (32, 32)


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_v2v_and_vace_end_to_end():
    pipe = _tiny_pipe()
    out = pipe("stylize", input_video=_frames(5), vace_video=_frames(5),
               num_frames=5, height=32, width=32, seed=3,
               num_inference_steps=3, cfg_scale=1.0, tiled=False,
               denoising_strength=0.8, return_latents=True)
    assert out.shape == (1, 4, 2, 4, 4)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_editor_end_to_end():
    pipe = _tiny_pipe(cls=WanVideoEditorPipeline, with_vace=False)
    frames = pipe("edit", source_video=_frames(5),
                  edited_keyframes=_frames(2, seed=1),
                  keyframe_indices=[0, 4], seed=5, height=32, width=32,
                  num_frames=5, num_inference_steps=3, cfg_scale=1.0,
                  tiled=False, verbose=False)
    assert len(frames) == 5


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_editor_teacache():
    """TeaCache rides the editor's joint [main|edit] forward: a
    never-skip threshold reproduces the no-TeaCache latents exactly,
    and a giant threshold actually skips trunk forwards."""
    pipe = _tiny_pipe(cls=WanVideoEditorPipeline, with_vace=False)
    kw = dict(source_video=_frames(5), edited_keyframes=_frames(2, seed=1),
              keyframe_indices=[0, 4], seed=5, height=32, width=32,
              num_frames=5, num_inference_steps=4, cfg_scale=2.0,
              tiled=False, verbose=False, return_latents=True)
    base = pipe("edit", **kw)
    never = pipe("edit", tea_cache_l1_thresh=-1e9,
                 tea_cache_model_id="Wan2.1-T2V-1.3B", **kw)
    np.testing.assert_allclose(np.asarray(never), np.asarray(base),
                               rtol=1e-5, atol=1e-5)

    skips = {"n": 0}
    orig_check = TeaCache.check

    def counting_check(self, t_mod):
        hit = orig_check(self, t_mod)
        skips["n"] += int(hit)
        return hit

    import unittest.mock as mock
    with mock.patch.object(TeaCache, "check", counting_check):
        skipped = pipe("edit", tea_cache_l1_thresh=1e9,
                       tea_cache_model_id="Wan2.1-T2V-1.3B", **kw)
    assert skips["n"] > 0
    assert skipped.shape == base.shape
    assert bool(np.isfinite(np.asarray(skipped, np.float32)).all())


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_noise_parity_with_reference():
    import torch
    want = torch.randn((1, 4, 3, 8, 8),
                       generator=torch.Generator("cpu").manual_seed(42),
                       dtype=torch.float32).numpy()
    got = generate_noise((1, 4, 3, 8, 8), seed=42)
    np.testing.assert_array_equal(got, want)


def test_teacache_skips_and_refreshes():
    tc = TeaCache(10, rel_l1_thresh=1e9, model_id="Wan2.1-T2V-1.3B")
    rng = np.random.default_rng(0)
    t_mods = [rng.standard_normal((1, 6, 8)).astype(np.float32) for _ in range(10)]
    skips = [tc.check(t) for t in t_mods]
    assert skips[0] is False            # first step always computes
    assert any(skips[1:-1])             # giant threshold -> skips in middle
    assert skips[-1] is False           # last step always computes


def test_teacache_rejects_unknown_model():
    with pytest.raises(ValueError):
        TeaCache(10, 0.05, "nope")


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_cfg_merge_matches_two_pass():
    pipe = _tiny_pipe(with_vace=False)
    lat_merged = pipe("a cat", negative_prompt="bad", num_frames=5, height=32,
                      width=32, seed=7, num_inference_steps=2, cfg_scale=3.0,
                      cfg_merge=True, tiled=False, return_latents=True)
    lat_two = pipe("a cat", negative_prompt="bad", num_frames=5, height=32,
                   width=32, seed=7, num_inference_steps=2, cfg_scale=3.0,
                   cfg_merge=False, tiled=False, return_latents=True)
    np.testing.assert_allclose(np.asarray(lat_merged, np.float32),
                               np.asarray(lat_two, np.float32),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_sliding_window_denoise():
    pipe = _tiny_pipe(with_vace=False)
    lat = pipe("a cat", num_frames=17, height=32, width=32, seed=1,
               num_inference_steps=2, cfg_scale=1.0, tiled=False,
               sliding_window_size=3, sliding_window_stride=2,
               return_latents=True)
    assert lat.shape == (1, 4, 5, 4, 4)
    assert bool(jnp.isfinite(lat.astype(jnp.float32)).all())


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_sliding_window_keeps_vace_conditioning():
    """Long-video VACE editing with sliding windows must stay conditioned:
    the per-window forward slices vace_context (and y), so the result differs
    from the unconditioned T2V denoise (regression for the round-1 bug where
    sliding-window passed vace_context=None)."""
    pipe = _tiny_pipe()
    common = dict(num_frames=17, height=32, width=32, seed=1,
                  num_inference_steps=2, cfg_scale=1.0, tiled=False,
                  sliding_window_size=3, sliding_window_stride=2,
                  return_latents=True)
    lat_vace = pipe("stylize", vace_video=_frames(17), **common)
    lat_plain = pipe("stylize", **common)
    assert lat_vace.shape == lat_plain.shape
    assert bool(jnp.isfinite(lat_vace.astype(jnp.float32)).all())
    diff = float(jnp.abs(lat_vace - lat_plain).mean())
    assert diff > 1e-4, f"sliding-window VACE output identical to T2V (diff={diff})"


@pytest.mark.skipif(not ref_available(), reason="reference not mounted")
def test_ti2v_fused_first_frame_pinned():
    """fuse_vae_embedding_in_latents: the first-frame latent survives the
    denoise loop untouched (ImageEmbedderFused semantics)."""
    import dataclasses
    pipe = _tiny_pipe(with_vace=False)
    pipe.dit_cfg = dataclasses.replace(TINY_DIT,
                                       fuse_vae_embedding_in_latents=True)
    img = _frames(1)[0]
    lat = pipe("animate", input_image=img, num_frames=5, height=32, width=32,
               seed=1, num_inference_steps=2, cfg_scale=1.0, tiled=False,
               return_latents=True)
    from video_styler_tpu.pipelines.wan_video import _preprocess_images
    z0 = np.asarray(pipe.encode_video(
        _preprocess_images([img.resize((32, 32))]), tiled=False), np.float32)
    np.testing.assert_allclose(np.asarray(lat[:, :, 0:1], np.float32), z0,
                               rtol=1e-3, atol=1e-4)
