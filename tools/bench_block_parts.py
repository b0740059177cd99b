"""Dissect the 14B-dim DiT block cost on one chip (MFU work, round 3).

The round-2 verdict: block 285 ms bf16 at 29,640 tokens ~ 58-64% MFU while
the flash kernel alone demonstrates 75%. This tool measures each component
in isolation so the gap is attributable:

  matmul variants (bf16 out vs f32-accum out, bias, runtime-concat qkv),
  ffn pair, flash attention at the block's exact shapes, LN/modulate
  elementwise, and the assembled block — printed as a table with achieved
  TF/s against the v5e's 197 TF/s bf16 peak.

Run when the chip is free: python tools/bench_block_parts.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

S, D, FFN, H = 29640, 5120, 13824, 40
PEAK = 197e12


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, n=20):
    # overhead-calibrated (the tunnel adds ~30-45 ms per measured batch;
    # see tools/bench_utils.py — n=5 timings over-report by ~6-9 ms/call)
    from bench_utils import timeit as _t
    return _t(fn, n=n)


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (1, S, D), jnp.bfloat16)
    w = jax.random.normal(k, (D, D), jnp.bfloat16) * 0.02
    w3 = jax.random.normal(k, (D, 3 * D), jnp.bfloat16) * 0.02
    wf1 = jax.random.normal(k, (D, FFN), jnp.bfloat16) * 0.02
    wf2 = jax.random.normal(k, (FFN, D), jnp.bfloat16) * 0.02
    b = jnp.zeros((D,), jnp.bfloat16)

    flops_dd = 2 * S * D * D
    flops_ffn = 2 * 2 * S * D * FFN
    flops_attn = 4 * S * S * D

    rows = []

    def rec(name, ms, flops):
        rows.append((name, ms, flops / (ms / 1e3) / 1e12))
        print(f"[{time.strftime('%H:%M:%S')}] {name}: {ms:.2f} ms "
              f"{rows[-1][2]:.1f} TF/s", flush=True)

    f = jax.jit(lambda x, w: jnp.dot(x, w))
    rec("dot bf16->bf16", timeit(lambda: f(x, w)), flops_dd)

    f = jax.jit(lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16))
    rec("dot f32-accum + cast", timeit(lambda: f(x, w)), flops_dd)

    f = jax.jit(lambda x, w, b: (jnp.dot(x, w, preferred_element_type=jnp.float32)
                                 + b.astype(jnp.float32)).astype(jnp.bfloat16))
    rec("dot f32-accum + bias", timeit(lambda: f(x, w, b)), flops_dd)

    f = jax.jit(lambda x, w3: jnp.dot(x, w3, preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16))
    rec("fused qkv (D,3D) dot", timeit(lambda: f(x, w3)), 3 * flops_dd)

    wb = jax.random.normal(jax.random.PRNGKey(7), (D, D), jnp.bfloat16) * 0.02
    wc = jax.random.normal(jax.random.PRNGKey(8), (D, D), jnp.bfloat16) * 0.02

    def three(x, w, wb, wc):
        # distinct weights: identical operands would be CSE'd to one dot
        return (jnp.dot(x, w, preferred_element_type=jnp.float32),
                jnp.dot(x, wb, preferred_element_type=jnp.float32),
                jnp.dot(x, wc, preferred_element_type=jnp.float32))
    f = jax.jit(three)
    rec("3 separate qkv dots", timeit(lambda: f(x, w, wb, wc)[0]),
        3 * flops_dd)

    def ffn(x, wf1, wf2):
        from video_styler_tpu.ops.basic import gelu_tanh
        h = jnp.dot(x, wf1, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jnp.dot(gelu_tanh(h), wf2,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    f = jax.jit(ffn)
    rec("ffn fc1+gelu+fc2", timeit(lambda: f(x, wf1, wf2)), flops_ffn)

    f = jax.jit(lambda x, wf1: jnp.dot(x, wf1,
                                       preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16))
    rec("fc1 dot (D,FFN)", timeit(lambda: f(x, wf1)), flops_ffn // 2)
    h2 = jax.random.normal(k, (1, S, FFN), jnp.bfloat16)
    f = jax.jit(lambda h, wf2: jnp.dot(h, wf2,
                                       preferred_element_type=jnp.float32)
                .astype(jnp.bfloat16))
    rec("fc2 dot (FFN,D)", timeit(lambda: f(h2, wf2)), flops_ffn // 2)

    from video_styler_tpu.ops.attention import attention
    q = jax.random.normal(k, (1, S, H, D // H), jnp.bfloat16)
    f = jax.jit(lambda q: attention(q, q, q))
    rec("flash attention (4d layout)", timeit(lambda: f(q)), flops_attn)

    # old path for comparison: transpose to (B*N, S, D) around the 3-D kernel
    from video_styler_tpu.ops import flash_attention as FA

    def old_path(q4):
        b, s, n, d = q4.shape
        q3 = q4.transpose(0, 2, 1, 3).reshape(b * n, s, d)
        scale = 1.0 / (d ** 0.5)
        q3s = (q3.astype(jnp.float32) * (scale * FA.LOG2_E)).astype(q3.dtype)
        out = FA._flash_fwd_3d(q3s, q3, q3, 1.0)  # scale pre-folded
        return out.reshape(b, n, s, d).transpose(0, 2, 1, 3)
    f = jax.jit(old_path)
    rec("flash attention (3d+transpose)", timeit(lambda: f(q)), flops_attn)

    # RoPE application cost (fp32 interleaved rotate, both q and k)
    from video_styler_tpu.ops.rope import assemble_freqs_grid, rope_apply
    cos_r, sin_r = assemble_freqs_grid(D // H, 19, 30, 52)
    f = jax.jit(lambda q: (rope_apply(q, cos_r, sin_r),
                           rope_apply(q, cos_r, sin_r)))
    rec("rope q+k (elementwise)", timeit(lambda: f(q)[0]), 0)

    # rms_norm -> reshape -> rope fused chain (what the block actually runs)
    from video_styler_tpu.ops.basic import rms_norm
    scale_p = {"scale": jnp.ones((D,), jnp.bfloat16)}
    f = jax.jit(lambda x: rope_apply(
        rms_norm(scale_p, x).reshape(1, S, H, D // H), cos_r, sin_r))
    rec("rms+reshape+rope chain", timeit(lambda: f(x)), 0)

    # bf16 runtime-concat fused qkv: one (D, 3D) dot from three (D, D) leaves
    def concat_qkv(x, w):
        w3c = jnp.concatenate([w, w, w], axis=-1)
        return jnp.dot(x, w3c, preferred_element_type=jnp.float32) \
            .astype(jnp.bfloat16)
    f = jax.jit(concat_qkv)
    rec("concat+fused qkv dot", timeit(lambda: f(x, w)), 3 * flops_dd)

    from video_styler_tpu.ops.basic import layer_norm, modulate
    mod = jax.random.normal(k, (1, 1, D), jnp.bfloat16)
    f = jax.jit(lambda x, m: modulate(layer_norm({}, x), m, m))
    rec("LN+modulate (elementwise)", timeit(lambda: f(x, mod)), 0)

    from video_styler_tpu.models.wan_dit import (
        WanDiTConfig, init_dit_block, dit_block)
    from video_styler_tpu.ops.rope import assemble_freqs_grid
    cfg = WanDiTConfig(dim=D, in_dim=16, ffn_dim=FFN, out_dim=16,
                       num_heads=H, num_layers=1)
    blk = init_dit_block(jax.random.PRNGKey(1), cfg, dtype=jnp.bfloat16)
    ctx = jax.random.normal(k, (1, 512, D), jnp.bfloat16)
    t_mod = jax.random.normal(k, (1, 6, D), jnp.bfloat16)
    cos, sin = assemble_freqs_grid(cfg.head_dim, 19, 30, 52)
    f = jax.jit(lambda blk, x: dit_block(blk, x, ctx, t_mod, cos, sin, cfg))
    blk_flops = flops_attn + 4 * flops_dd + flops_ffn + 2 * flops_dd \
        + 2 * 2 * S * 512 * D
    rec("full dit_block", timeit(lambda: f(blk, x)), blk_flops)

    print(f"{'component':30s} {'ms':>9s} {'TF/s':>7s} {'%peak':>6s}")
    for name, ms, tfs in rows:
        print(f"{name:30s} {ms:9.2f} {tfs:7.1f} {100*tfs*1e12/PEAK:5.1f}%")


if __name__ == "__main__":
    main()
