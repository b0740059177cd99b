"""Quantized linear path: accuracy, pytree rewrite, scan-stacked weights,
full-DiT closeness (reference fp8 analog, vram_management/layers.py:115-151)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_styler_tpu.ops.basic import linear
from video_styler_tpu.ops.quant import (linear_fp8, linear_int8,
                                        quantize_params, quantized_fraction,
                                        quantize_weight_int8)


def _rel_err(a, b):
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


def test_int8_linear_accuracy():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 192)).astype(np.float32) * 0.05
    b = rng.standard_normal(192).astype(np.float32) * 0.1
    x = rng.standard_normal((4, 256)).astype(np.float32)
    exact = x @ w + b
    q, s = quantize_weight_int8(jnp.asarray(w))
    got = np.asarray(linear_int8({"w_q": q, "w_scale": s,
                                  "b": jnp.asarray(b)}, jnp.asarray(x)))
    assert _rel_err(got, exact) < 0.02


def test_fp8_linear_accuracy():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((256, 192)).astype(np.float32) * 0.05
    x = rng.standard_normal((4, 256)).astype(np.float32)
    exact = x @ w
    from video_styler_tpu.ops.quant import quantize_weight_fp8
    q, s = quantize_weight_fp8(jnp.asarray(w))
    got = np.asarray(linear_fp8({"w_q": q, "w_scale": s}, jnp.asarray(x)))
    assert _rel_err(got, exact) < 0.07


def test_quantize_params_rewrite_and_dispatch():
    rng = np.random.default_rng(2)
    tree = {
        "big": {"w": jnp.asarray(rng.standard_normal((256, 256)), jnp.float32),
                "b": jnp.zeros(256)},
        "small": {"w": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)},
        "conv": {"w": jnp.asarray(rng.standard_normal((256, 256, 3)),
                                  jnp.float32)},
        "norm": {"scale": jnp.ones(256)},
    }
    q = quantize_params(tree, min_size=0)
    assert "w_q" in q["big"] and "w" not in q["big"]
    assert "w" in q["small"] and "w" in q["conv"]       # guarded out
    x = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)
    exact = np.asarray(linear(tree["big"], x))
    got = np.asarray(linear(q["big"], x))
    assert _rel_err(got, exact) < 0.02
    assert 0 < quantized_fraction(q) < 1


def test_scan_stacked_quantization():
    """(L, in, out) stacked weights quantize per layer and slice correctly
    under lax.scan."""
    rng = np.random.default_rng(3)
    L = 3
    tree = {"w": jnp.asarray(rng.standard_normal((L, 256, 256)) * 0.05,
                             jnp.float32),
            "b": jnp.asarray(rng.standard_normal((L, 256)), jnp.float32)}
    q = quantize_params({"blk": tree}, min_size=0)["blk"]
    assert q["w_q"].shape == (L, 256, 256)
    assert q["w_scale"].shape == (L, 1, 256)
    x0 = jnp.asarray(rng.standard_normal((2, 256)), jnp.float32)

    def step(x, p):
        return linear(p, x), None

    got, _ = jax.lax.scan(step, x0, q)
    exact, _ = jax.lax.scan(step, x0, tree)
    assert _rel_err(np.asarray(got), np.asarray(exact)) < 0.05


def test_wan_dit_quantized_forward_close():
    from video_styler_tpu.models.wan_dit import (WanDiTConfig, init_wan_dit,
                                                 wan_dit_forward)
    from dataclasses import replace
    from video_styler_tpu.models import WAN_DIT_TINY
    cfg = replace(WAN_DIT_TINY, dim=192, ffn_dim=256, num_heads=2)
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qparams = quantize_params(params, min_size=0)
    assert quantized_fraction(qparams) > 0.5

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 16, 3, 8, 8)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 12, cfg.text_dim)), jnp.float32)
    exact = np.asarray(wan_dit_forward(params, cfg, x, t, ctx), np.float32)
    got = np.asarray(wan_dit_forward(qparams, cfg, x, t, ctx), np.float32)
    # int8 round-trip noise accumulates over layers; require close correlation
    denom = np.abs(exact).max()
    assert np.abs(got - exact).max() / denom < 0.15
    corr = np.corrcoef(got.ravel(), exact.ravel())[0, 1]
    assert corr > 0.995


def test_quantize_attention_flag(monkeypatch):
    """pipe.quantize(quantize_attention=True) routes long-sequence
    attention through the int8 kernel (and the flag is resettable)."""
    import importlib
    A = importlib.import_module("video_styler_tpu.ops.attention")
    set_quantized_attention = A.set_quantized_attention

    calls = []
    monkeypatch.setattr(
        "video_styler_tpu.ops.flash_attention.flash_attention_int8",
        lambda q, k, v, scale=None: calls.append("int8") or q)
    monkeypatch.setattr(
        "video_styler_tpu.ops.flash_attention.flash_attention",
        lambda q, k, v, scale=None: calls.append("bf16") or q)
    import jax.numpy as jnp
    q = jnp.zeros((1, 2048, 2, 128), jnp.bfloat16)
    try:
        set_quantized_attention(True)
        A.attention(q, q, q, use_flash=True)
        assert calls[-1] == "int8"
        set_quantized_attention(False)
        A.attention(q, q, q, use_flash=True)
        assert calls[-1] == "bf16"
    finally:
        set_quantized_attention(False)


def test_fused_qkv_int8_matches_separate():
    """fused_qkv_int8 must be bit-identical to three linear_int8 calls."""
    import jax, jax.numpy as jnp, numpy as np
    from video_styler_tpu.ops.quant import (
        quantize_params, linear_int8, fused_qkv_int8)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    mk = lambda k: {"w": jax.random.normal(k, (128, 128), jnp.float32) * 0.05,
                    "b": jax.random.normal(jax.random.fold_in(k, 1), (128,),
                                           jnp.float32) * 0.01}
    pq, pk, pv = (quantize_params({"l": mk(k)}, min_size=0, min_dim=0)["l"]
                  for k in ks[:3])
    x = jax.random.normal(ks[3], (2, 17, 128), jnp.float32)
    want = [np.asarray(linear_int8(p, x)) for p in (pq, pk, pv)]
    got = fused_qkv_int8(pq, pk, pv, x)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, np.asarray(g))


def test_self_attention_int8_routes_fused():
    import jax, jax.numpy as jnp, numpy as np
    from video_styler_tpu.models.wan_dit import (
        WAN_DIT_TINY, init_dit_block, dit_block)
    from video_styler_tpu.ops.quant import quantize_params
    cfg = WAN_DIT_TINY
    blk = init_dit_block(jax.random.PRNGKey(0), cfg)
    qblk = quantize_params(blk, min_size=0, min_dim=0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 12, cfg.dim), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.dim), jnp.float32)
    t_mod = jax.random.normal(jax.random.PRNGKey(3), (1, 6, cfg.dim), jnp.float32)
    from video_styler_tpu.ops.rope import assemble_freqs_grid
    cos, sin = assemble_freqs_grid(cfg.head_dim, 1, 3, 4)
    out = dit_block(qblk, x, ctx, t_mod, cos, sin, cfg)
    assert bool(jnp.isfinite(out).all())


# ---------------------------------------------------------------- int4 --

def test_int4_pack_unpack_roundtrip():
    from video_styler_tpu.ops.quant import pack_int4, unpack_int4
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.integers(-8, 8, (2, 64, 32), dtype=np.int8))
    assert bool((unpack_int4(pack_int4(q)) == q).all())


def test_int4_linear_accuracy_and_dispatch():
    from video_styler_tpu.ops.quant import linear_int4
    rng = np.random.default_rng(6)
    w = rng.standard_normal((256, 192)).astype(np.float32) * 0.05
    b = rng.standard_normal(192).astype(np.float32) * 0.1
    x = rng.standard_normal((4, 256)).astype(np.float32)
    exact = x @ w + b
    p = quantize_params({"l": {"w": jnp.asarray(w), "b": jnp.asarray(b)}},
                        mode="int4", min_size=1)["l"]
    assert "w_q4" in p and p["w_q4"].shape == (128, 192)
    got = np.asarray(linear_int4(p, jnp.asarray(x)))
    assert _rel_err(got, exact) < 0.15  # 4-bit per-column grid
    # ops.basic.linear dispatches on the w_q4 leaf
    via_linear = np.asarray(linear(p, jnp.asarray(x)))
    np.testing.assert_array_equal(got, via_linear)


def test_int4_group_scales_beat_per_column():
    from video_styler_tpu.ops.quant import unpack_int4
    rng = np.random.default_rng(7)
    # heavy-tailed rows make per-column absmax coarse; groups recover it
    w = (rng.standard_normal((256, 192)) *
         (1 + 10 * (rng.random((256, 1)) > 0.95))).astype(np.float32) * 0.05
    x = rng.standard_normal((4, 256)).astype(np.float32)
    exact = x @ w
    pc = quantize_params({"l": {"w": jnp.asarray(w)}}, mode="int4",
                         min_size=1)["l"]
    pg = quantize_params({"l": {"w": jnp.asarray(w)}}, mode="int4_g128",
                         min_size=1)["l"]
    assert pg["w_scale"].shape == (2, 1, 192)
    # weight-space reconstruction: the finer scale partition must be
    # strictly more accurate
    wc = np.asarray(unpack_int4(pc["w_q4"]), np.float32) * np.asarray(pc["w_scale"])
    qg = np.asarray(unpack_int4(pg["w_q4"]), np.float32).reshape(2, 128, 192)
    wg = (qg * np.asarray(pg["w_scale"])).reshape(256, 192)
    assert np.abs(wg - w).mean() < np.abs(wc - w).mean()
    # and the w4a16 forward is usable end-to-end
    err_g = _rel_err(np.asarray(linear(pg, jnp.asarray(x))), exact)
    assert err_g < 0.4


def test_int4_scan_stacked_and_fused_qkv():
    from video_styler_tpu.models.wan_dit import WanDiTConfig, init_dit_block
    from video_styler_tpu.models.wan_dit import dit_block
    cfg = WanDiTConfig(dim=128, in_dim=16, ffn_dim=256, out_dim=16,
                       num_heads=2, num_layers=2, text_dim=64)
    params = init_dit_block(jax.random.PRNGKey(0), cfg, jnp.float32)
    params = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), params)
    qp = quantize_params(params, mode="int4", min_size=1, min_dim=64)
    assert qp["self_attn"]["q"]["w_q4"].shape == (2, 64, 128)
    B, S = 1, 32
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, 128), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 8, 128), jnp.float32)
    t_mod = jax.random.normal(jax.random.PRNGKey(3), (B, 6, 128), jnp.float32)
    half = cfg.head_dim // 2
    cos = jnp.ones((S, half)); sin = jnp.zeros((S, half))
    ref = x
    for i in range(2):
        ref = dit_block(jax.tree_util.tree_map(lambda v: v[i], params),
                        ref, ctx, t_mod, cos, sin, cfg)
    got = x
    for i in range(2):
        got = dit_block(jax.tree_util.tree_map(lambda v: v[i], qp),
                        got, ctx, t_mod, cos, sin, cfg)
    # per-column 4-bit on random N(0, 1/sqrt(in)) weights carries ~11% rms
    # weight error; two residual blocks compound it — this checks the
    # dispatch/shape plumbing, not the quantization grid
    assert _rel_err(np.asarray(got), np.asarray(ref)) < 0.45


def test_streamer_int4_all_resident_matches_bf16():
    from video_styler_tpu.models.wan_dit import (WanDiTConfig, init_wan_dit,
                                                 wan_dit_forward)
    from video_styler_tpu.models.wan_streaming import WanBlockStreamer
    cfg = WanDiTConfig(dim=192, in_dim=16, ffn_dim=256, out_dim=16,
                       num_heads=2, num_layers=4, text_dim=64)
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 3, 8, 8),
                            jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 64), jnp.float32)
    ts = jnp.asarray([500.0], jnp.float32)
    ref = wan_dit_forward(params, cfg, lat, ts, ctx)
    s = WanBlockStreamer(params, cfg, mode="int4", resident_blocks=None,
                         hbm_budget_gb=64.0)
    assert s.plan_summary()["resident_blocks"] == 4
    assert s.plan_summary()["streamed_gb_per_pass"] == 0.0
    got, _, _ = s.forward(lat, ts, ctx)
    assert _rel_err(np.asarray(got), np.asarray(ref)) < 0.25
