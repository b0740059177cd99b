"""Streaming LoRA training: gradients must equal the resident-model autodiff.

The reference's equivalent capability is per-block gradient checkpointing
with CPU activation offload (vram_management/gradient_checkpointing.py) under
peft LoRA. Here the StreamingTrainer re-streams frozen trunk blocks in the
backward and recomputes per block; the result must match jax.grad through
the fully-resident wan_dit_forward with apply_lora."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.models.wan_dit import (
    WAN_DIT_TINY, init_wan_dit, wan_dit_forward)
from video_styler_tpu.models.wan_vace import VaceConfig, init_vace
from video_styler_tpu.models.wan_streaming import WanBlockStreamer
from video_styler_tpu.trainers.lora_train import init_lora, apply_lora
from video_styler_tpu.trainers.streaming_train import StreamingTrainer


def _setup(with_vace: bool):
    cfg = WAN_DIT_TINY
    params = init_wan_dit(jax.random.PRNGKey(0), cfg)
    vcfg = vace_params = None
    if with_vace:
        vcfg = VaceConfig(vace_layers=(0, 1), dim=cfg.dim,
                          num_heads=cfg.num_heads, ffn_dim=cfg.ffn_dim)
        vace_params = init_vace(jax.random.PRNGKey(1), vcfg)
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    lat = jax.random.normal(ks[0], (1, cfg.in_dim, 2, 8, 8), jnp.float32)
    ts = jnp.asarray([321.0], jnp.float32)
    ctx = jax.random.normal(ks[1], (1, 16, cfg.text_dim), jnp.float32)
    target = jax.random.normal(ks[2], lat.shape, jnp.float32)
    vctx = jax.random.normal(ks[3], (1, 96, 2, 8, 8), jnp.float32) \
        if with_vace else None
    return cfg, params, vcfg, vace_params, lat, ts, ctx, target, vctx


def _ref_loss(params, cfg, lora, lat, ts, ctx, target,
              vace_params=None, vcfg=None, vctx=None, vace_lora=None):
    p = dict(params)
    p["blocks"] = apply_lora(params["blocks"],
                             {k.split(".", 1)[1]: v for k, v in lora.items()},
                             scale=1.0) if lora else params["blocks"]
    vp = vace_params
    if vace_lora:
        vp = dict(vace_params)
        vp["blocks"] = apply_lora(
            vace_params["blocks"],
            {k.split(".", 1)[1]: v for k, v in vace_lora.items()}, scale=1.0)
    v = wan_dit_forward(p, cfg, lat, ts, ctx, vace_params=vp, vace_cfg=vcfg,
                        vace_context=vctx, vace_scale=0.7 if vctx is not None
                        else 1.0)
    return jnp.mean(jnp.square(v.astype(jnp.float32)
                               - target.astype(jnp.float32)))


@pytest.mark.parametrize("sub_remat", [True, False])
@pytest.mark.parametrize("ckpt", ["host", "device"])
@pytest.mark.parametrize("resident", [0, 1])
def test_trunk_lora_grads_match(resident, ckpt, sub_remat):
    cfg, params, _, _, lat, ts, ctx, target, _ = _setup(False)
    lora = init_lora(jax.random.PRNGKey(7), params,
                     rank=4, targets=("blocks.self_attn.q", "blocks.ffn.fc1"))
    # non-zero B so grads flow through both factors
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(8),
                                               x.shape), lora)

    want_loss, want_g = jax.value_and_grad(
        lambda l: _ref_loss(params, cfg, l, lat, ts, ctx, target))(lora)

    streamer = WanBlockStreamer(params, cfg, mode="f32",
                                resident_blocks=resident, prefetch_depth=2)
    # segment=1 puts a boundary at every item (degenerate sqrt-ckpt);
    # the tiny 2-block schedule also exercises the partial last segment
    trainer = StreamingTrainer(streamer, activation_ckpt=ckpt, segment=1,
                               sub_remat=sub_remat)
    loss, g_trunk, _ = trainer.loss_and_grads(lat, ts, ctx, target,
                                              trunk_lora=lora)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    for path in lora:
        np.testing.assert_allclose(np.asarray(g_trunk[path]["A"]),
                                   np.asarray(want_g[path]["A"]),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_trunk[path]["B"]),
                                   np.asarray(want_g[path]["B"]),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("ckpt,segment", [("host", None), ("device", 3),
                                          ("device", 2)])
def test_vace_lora_grads_match(ckpt, segment):
    """The Ditto recipe shape: LoRA on the VACE branch, trunk frozen.

    device mode with segment=3 splits the 4-item interleaved schedule
    [trunk0, vace0, trunk1, vace1] mid-chain, covering the recompute of a
    vace hint inside a segment AND the interleaved VACE backward across a
    segment boundary; segment=2 puts the boundary exactly at an injection
    point."""
    cfg, params, vcfg, vace_params, lat, ts, ctx, target, vctx = _setup(True)
    vace_lora = init_lora(jax.random.PRNGKey(9), vace_params,
                          rank=4, targets=("blocks.self_attn.q",
                                           "blocks.cross_attn.v",
                                           "blocks.ffn.fc2"))
    vace_lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(10),
                                               x.shape), vace_lora)

    want_loss, want_g = jax.value_and_grad(
        lambda l: _ref_loss(params, cfg, None, lat, ts, ctx, target,
                            vace_params=vace_params, vcfg=vcfg, vctx=vctx,
                            vace_lora=l))(vace_lora)

    streamer = WanBlockStreamer(params, cfg, vace_params, vcfg, mode="f32",
                                resident_blocks=1, prefetch_depth=2)
    trainer = StreamingTrainer(streamer, activation_ckpt=ckpt,
                               segment=segment)
    loss, _, g_vace = trainer.loss_and_grads(lat, ts, ctx, target,
                                             vace_context=vctx,
                                             vace_scale=0.7,
                                             vace_lora=vace_lora)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    for path in vace_lora:
        np.testing.assert_allclose(np.asarray(g_vace[path]["A"]),
                                   np.asarray(want_g[path]["A"]),
                                   rtol=3e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_vace[path]["B"]),
                                   np.asarray(want_g[path]["B"]),
                                   rtol=3e-4, atol=1e-6)


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quantized_base_lora_grads_match_dequant_reference(mode):
    """QLoRA contract: LoRA grads over a quantized frozen base must equal
    autodiff through the DEQUANTIZED resident model (same math, packed
    storage) — no straight-through estimator anywhere."""
    from video_styler_tpu.ops.quant import quantize_params, dequantize_params
    cfg, params, vcfg, vace_params, lat, ts, ctx, target, vctx = _setup(True)
    vace_lora = init_lora(jax.random.PRNGKey(9), vace_params,
                          rank=4, targets=("blocks.self_attn.q",
                                           "blocks.ffn.fc2"))
    vace_lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(10),
                                               x.shape), vace_lora)

    # quantize the blocks the way the streamer would, then build the
    # full-precision reference from the SAME packed values
    qblocks = quantize_params(params["blocks"], mode=mode,
                              min_size=0, min_dim=0)
    ref_params = dict(params)
    ref_params["blocks"] = dequantize_params(qblocks, jnp.float32)
    ref_vace = dict(vace_params)
    # the streamer packs blocks AND after_proj (its streamed unit is
    # {"block", "after"}); mirror that in the dequant reference
    for k in ("blocks", "after_proj"):
        ref_vace[k] = dequantize_params(
            quantize_params(vace_params[k], mode=mode, min_size=0,
                            min_dim=0), jnp.float32)

    want_loss, want_g = jax.value_and_grad(
        lambda l: _ref_loss(ref_params, cfg, None, lat, ts, ctx, target,
                            vace_params=ref_vace, vcfg=vcfg, vctx=vctx,
                            vace_lora=l))(vace_lora)

    streamer = WanBlockStreamer(params, cfg, vace_params, vcfg, mode=mode,
                                resident_blocks=cfg.num_layers,
                                prefetch_depth=2, quant_min_size=0,
                                quant_min_dim=0)
    trainer = StreamingTrainer(streamer)
    loss, _, g_vace = trainer.loss_and_grads(lat, ts, ctx, target,
                                             vace_context=vctx,
                                             vace_scale=0.7,
                                             vace_lora=vace_lora)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-4)
    # ~0.5% grad spread comes from per-block recompute vs whole-graph
    # autodiff op ordering (the f32 tests already need 3e-4 for the same
    # trainer); an STE-style mismatch would be O(100%), so this still
    # pins the exact-gradient contract. Direction parity checked too.
    for path in vace_lora:
        for f in ("A", "B"):
            a = np.asarray(g_vace[path][f], np.float64).ravel()
            b = np.asarray(want_g[path][f], np.float64).ravel()
            cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)
            assert cos > 0.9999, (path, f, cos)
            np.testing.assert_allclose(
                np.asarray(g_vace[path][f]), np.asarray(want_g[path][f]),
                rtol=5e-3, atol=2e-5)


@pytest.mark.parametrize("ckpt", ["host", "device"])
def test_serial_walk_grads_match(ckpt):
    """overlap=False gated walks through fwd + both reverse modes: the
    gradients must equal resident autodiff exactly like the overlapped
    trainer (scheduling-only change)."""
    cfg, params, vcfg, vace_params, lat, ts, ctx, target, vctx = _setup(True)
    vace_lora = init_lora(jax.random.PRNGKey(9), vace_params,
                          rank=4, targets=("blocks.self_attn.q",
                                           "blocks.ffn.fc2"))
    vace_lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(10),
                                               x.shape), vace_lora)
    want_loss, want_g = jax.value_and_grad(
        lambda l: _ref_loss(params, cfg, None, lat, ts, ctx, target,
                            vace_params=vace_params, vcfg=vcfg, vctx=vctx,
                            vace_lora=l))(vace_lora)
    streamer = WanBlockStreamer(params, cfg, vace_params, vcfg, mode="f32",
                                resident_blocks=0, prefetch_depth=2,
                                overlap=False)
    trainer = StreamingTrainer(streamer, activation_ckpt=ckpt, segment=3)
    loss, _, g_vace = trainer.loss_and_grads(lat, ts, ctx, target,
                                             vace_context=vctx,
                                             vace_scale=0.7,
                                             vace_lora=vace_lora)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    for path in vace_lora:
        np.testing.assert_allclose(np.asarray(g_vace[path]["A"]),
                                   np.asarray(want_g[path]["A"]),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g_vace[path]["B"]),
                                   np.asarray(want_g[path]["B"]),
                                   rtol=2e-4, atol=1e-6)
