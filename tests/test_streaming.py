"""Streaming executor (vram_management analog): parity with the resident path.

The reference proves its streaming layer by running the same model with and
without enable_vram_management; here the WanBlockStreamer must reproduce
wan_dit_forward bit-for-bit (f32 passthrough mode — identical values AND
identical rounding points) and match the quantized resident path (int8
mode) for every residency split, including the interleaved VACE hint walk.

mode="bf16" casts an f32 checkpoint to bf16 host-side (streaming f32 would
double the advertised bytes); the cast output can only be compared at bf16
tolerance because jit-vs-eager programs round at different points."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.wan_dit import (
    WAN_DIT_TINY, init_wan_dit, wan_dit_forward)
from video_styler_tpu.models.wan_vace import VACE_TINY, init_vace
from video_styler_tpu.models.wan_streaming import WanBlockStreamer
from video_styler_tpu.ops.quant import quantize_params


def _tiny_inputs(key, cfg):
    ks = jax.random.split(key, 3)
    lat = jax.random.normal(ks[0], (1, cfg.in_dim, 2, 8, 8), jnp.float32)
    ts = jnp.asarray([500.0], jnp.float32)
    ctx = jax.random.normal(ks[1], (1, 16, cfg.text_dim), jnp.float32)
    return lat, ts, ctx


@pytest.mark.parametrize("resident", [0, 1, 2])
def test_streaming_matches_resident_forward(resident):
    cfg = WAN_DIT_TINY
    params = init_wan_dit(jax.random.PRNGKey(0), cfg)
    lat, ts, ctx = _tiny_inputs(jax.random.PRNGKey(1), cfg)
    ref = wan_dit_forward(params, cfg, lat, ts, ctx)

    streamer = WanBlockStreamer(params, cfg, mode="f32",
                                resident_blocks=resident, prefetch_depth=2)
    out, t_mod, residual = streamer.forward(lat, ts, ctx, want_residual=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert residual is not None and residual.shape[1] == out.shape[2] * \
        (out.shape[3] // 2) * (out.shape[4] // 2)


@pytest.mark.parametrize("resident", [0, 1])
def test_streaming_vace_interleaved_matches(resident):
    # VACE_TINY uses dim 128 != WAN_DIT_TINY dim 96; build a matching config
    from video_styler_tpu.models.wan_vace import VaceConfig
    cfg = WAN_DIT_TINY
    vcfg = VaceConfig(vace_layers=(0, 1), dim=cfg.dim, num_heads=cfg.num_heads,
                      ffn_dim=cfg.ffn_dim, vace_in_dim=96)
    params = init_wan_dit(jax.random.PRNGKey(0), cfg)
    vace_params = init_vace(jax.random.PRNGKey(7), vcfg)
    lat, ts, ctx = _tiny_inputs(jax.random.PRNGKey(1), cfg)
    vace_context = jax.random.normal(jax.random.PRNGKey(2),
                                     (1, 96, 2, 8, 8), jnp.float32)

    ref = wan_dit_forward(params, cfg, lat, ts, ctx,
                          vace_params=vace_params, vace_cfg=vcfg,
                          vace_context=vace_context, vace_scale=0.8)

    streamer = WanBlockStreamer(params, cfg, vace_params, vcfg, mode="f32",
                                resident_blocks=resident, prefetch_depth=2)
    out, _, _ = streamer.forward(lat, ts, ctx, vace_context=vace_context,
                                 vace_scale=0.8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_streaming_int8_matches_quantized_resident():
    cfg = WAN_DIT_TINY
    params = init_wan_dit(jax.random.PRNGKey(0), cfg)
    lat, ts, ctx = _tiny_inputs(jax.random.PRNGKey(1), cfg)

    # int8 thresholds: quantize everything eligible regardless of size so the
    # tiny test model actually exercises the quantized kernels
    qp = dict(params)
    qp["blocks"] = quantize_params(params["blocks"], mode="int8",
                                   min_size=0, min_dim=0)
    ref = wan_dit_forward(qp, cfg, lat, ts, ctx)

    # force the host quantizer to the same (zero) thresholds
    from video_styler_tpu.parallel.streaming import host_quantize_int8
    import video_styler_tpu.models.wan_streaming as WS
    orig = host_quantize_int8

    def hq(tree, min_size=0, min_dim=0):
        return orig(tree, min_size=0, min_dim=0)

    WS.host_quantize_int8 = hq
    try:
        streamer = WanBlockStreamer(params, cfg, mode="int8",
                                    resident_blocks=1, prefetch_depth=2)
    finally:
        WS.host_quantize_int8 = orig
    out, _, _ = streamer.forward(lat, ts, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_host_quantizer_matches_device_quantizer():
    from video_styler_tpu.parallel.streaming import host_quantize_int8
    w = np.random.RandomState(0).randn(3, 128, 256).astype(np.float32)
    host = host_quantize_int8({"lin": {"w": w}}, min_size=0, min_dim=0)
    dev = quantize_params({"lin": {"w": jnp.asarray(w)}}, mode="int8",
                          min_size=0, min_dim=0)
    np.testing.assert_array_equal(host["lin"]["w_q"],
                                  np.asarray(dev["lin"]["w_q"]))
    np.testing.assert_allclose(host["lin"]["w_scale"],
                               np.asarray(dev["lin"]["w_scale"]), rtol=1e-6)


def test_pipeline_streaming_matches_resident():
    """Pipeline-level parity: enable_block_streaming must reproduce the
    resident bf16 pipeline output exactly (VACE + CFG + TeaCache path)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import _tiny_pipe, _frames
    from ref_loader import ref_available
    import pytest as _pytest
    if not ref_available():
        _pytest.skip("reference not mounted")

    kw = dict(vace_video=_frames(5), num_frames=5, height=32, width=32,
              seed=3, num_inference_steps=3, cfg_scale=2.0, tiled=False,
              tea_cache_l1_thresh=0.5, tea_cache_model_id="Wan2.1-T2V-1.3B",
              return_latents=True)
    pipe = _tiny_pipe()
    ref = np.asarray(pipe("stylize", **kw))

    pipe2 = _tiny_pipe()
    summary = pipe2.enable_block_streaming(mode="f32", resident_blocks=1,
                                           prefetch_depth=2)
    assert summary["resident_blocks"] == 1
    assert pipe2.dit_params is None  # device copy released
    out = np.asarray(pipe2("stylize", **kw))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_editor_streaming_matches_resident():
    """The Ditto editor (keyframe-guided, rope_indices) through the
    streamer must reproduce the resident path bit-for-bit."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import _tiny_pipe, _frames
    from video_styler_tpu.pipelines import WanVideoEditorPipeline
    from ref_loader import ref_available
    import pytest as _pytest
    if not ref_available():
        _pytest.skip("reference not mounted")

    kw = dict(source_video=_frames(5), edited_keyframes=_frames(2, seed=1),
              keyframe_indices=[0, 4], seed=5, height=32, width=32,
              num_frames=5, num_inference_steps=2, cfg_scale=1.0,
              tiled=False, verbose=False, return_latents=True)
    pipe = _tiny_pipe(cls=WanVideoEditorPipeline, with_vace=False)
    ref = np.asarray(pipe("edit", **kw))
    pipe2 = _tiny_pipe(cls=WanVideoEditorPipeline, with_vace=False)
    pipe2.enable_block_streaming(mode="f32", resident_blocks=0,
                                 prefetch_depth=2)
    out = np.asarray(pipe2("edit", **kw))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_bf16_mode_casts_f32_checkpoint():
    """mode="bf16" must not silently stream an f32 checkpoint at 2x the
    advertised bytes: floating leaves are cast host-side, int leaves kept."""
    import ml_dtypes
    cfg = WAN_DIT_TINY
    params = init_wan_dit(jax.random.PRNGKey(0), cfg)  # f32
    streamer = WanBlockStreamer(params, cfg, mode="bf16",
                                resident_blocks=0, prefetch_depth=1)
    from video_styler_tpu.parallel.streaming import PackedBlock
    blk = streamer.streamed_host[0]
    if isinstance(blk, PackedBlock):
        dtypes = [np.dtype(dt) for dt, _, _ in blk.spec]
    else:
        dtypes = [leaf.dtype
                  for leaf in jax.tree_util.tree_leaves(blk)]
    float_dtypes = [dt for dt in dtypes
                    if dt == ml_dtypes.bfloat16
                    or np.issubdtype(dt, np.floating)]
    assert float_dtypes
    assert all(dt == ml_dtypes.bfloat16 for dt in float_dtypes)
    # and the cast path's forward stays within bf16 tolerance of the f32
    # reference (values match; only rounding points differ)
    lat, ts, ctx = _tiny_inputs(jax.random.PRNGKey(1), cfg)
    ref = wan_dit_forward(params, cfg, lat, ts, ctx)
    out, _, _ = streamer.forward(lat, ts, ctx)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)
    # REGRESSION: bf16 latents against an f32 checkpoint. Before small/
    # vace_small were cast to compute dtype this promoted the block-scan
    # carry to f32 mid-walk (scan carry dtype error on the real chip).
    out_b, _, _ = streamer.forward(lat.astype(jnp.bfloat16), ts,
                                   ctx.astype(jnp.bfloat16))
    assert out_b.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out_b, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.1, atol=0.1)


def test_packed_block_roundtrip_and_alias_dedup():
    """pack_host_block -> one device_put -> on-device unpack is bit-exact
    for the store's dtype mix (int8 payload, f32 scales, bf16 bias), and
    the pack cache deduplicates broadcast-aliased block slices."""
    import ml_dtypes
    from video_styler_tpu.parallel.streaming import (
        MultiStreamLoader, PackedBlock, pack_host_block, tree_bytes)
    rng = np.random.default_rng(0)
    tree = {
        "lin": {"w_q": rng.integers(-127, 128, (1, 96, 160), dtype=np.int8),
                "w_scale": rng.random((1, 1, 160), dtype=np.float32),
                "b": (rng.random((1, 160), dtype=np.float32) - 0.5
                      ).astype(ml_dtypes.bfloat16)},
        "norm": {"scale": rng.random((1, 96), dtype=np.float32)},
    }
    packed = pack_host_block(tree)
    assert isinstance(packed, PackedBlock)
    assert tree_bytes(packed) == tree_bytes(tree)
    assert len(packed.bufs) == 3  # one flat buffer per dtype, not per leaf
    out = MultiStreamLoader().put(packed).get()
    ref_leaves, ref_def = jax.tree_util.tree_flatten(tree)
    out_leaves, out_def = jax.tree_util.tree_flatten(out)
    assert ref_def == out_def
    for r, o in zip(ref_leaves, out_leaves):
        assert str(r.dtype) == str(np.asarray(o).dtype)
        np.testing.assert_array_equal(np.asarray(r, np.float32),
                                      np.asarray(o, np.float32))

    # broadcast-aliased slices (bench alias store) pack ONCE
    one = rng.random((4, 8), dtype=np.float32)
    stacked = np.broadcast_to(one, (6, 4, 8))
    cache = {}
    p0 = pack_host_block({"w": stacked[0:1]}, cache=cache)
    p1 = pack_host_block({"w": stacked[3:4]}, cache=cache)
    assert p0 is p1
    # distinct data must NOT dedup
    other = np.array(stacked[0:1])
    p2 = pack_host_block({"w": other}, cache=cache)
    assert p2 is not p0


def test_serial_walk_matches_overlap():
    """overlap=False (gated serial walk for DMA-starving links) must be a
    pure scheduling change: outputs identical to the overlapped walk."""
    from video_styler_tpu.models.wan_vace import VaceConfig
    from video_styler_tpu.models.wan_vace import init_vace as _init_vace
    cfg = WAN_DIT_TINY
    vcfg = VaceConfig(vace_layers=(0, 1), dim=cfg.dim,
                      num_heads=cfg.num_heads, ffn_dim=cfg.ffn_dim,
                      vace_in_dim=96)
    params = init_wan_dit(jax.random.PRNGKey(0), cfg)
    vace_params = _init_vace(jax.random.PRNGKey(7), vcfg)
    lat, ts, ctx = _tiny_inputs(jax.random.PRNGKey(1), cfg)
    vctx = jax.random.normal(jax.random.PRNGKey(2), (1, 96, 2, 8, 8),
                             jnp.float32)
    outs = []
    for overlap in (True, False):
        st = WanBlockStreamer(params, cfg, vace_params, vcfg, mode="f32",
                              resident_blocks=0, prefetch_depth=2,
                              overlap=overlap)
        out, _, _ = st.forward(lat, ts, ctx, vace_context=vctx,
                               vace_scale=0.7)
        outs.append(np.asarray(out))
    np.testing.assert_array_equal(outs[0], outs[1])
