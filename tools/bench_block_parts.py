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


def timeit(fn, n=5):
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


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

    def three(x, w):
        return (jnp.dot(x, w, preferred_element_type=jnp.float32),
                jnp.dot(x, w, preferred_element_type=jnp.float32),
                jnp.dot(x, w, preferred_element_type=jnp.float32))
    f = jax.jit(three)
    rec("3 separate qkv dots", timeit(lambda: f(x, w)[0]), 3 * flops_dd)

    def ffn(x):
        from video_styler_tpu.ops.basic import gelu_tanh
        h = jnp.dot(x, wf1, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jnp.dot(gelu_tanh(h), wf2,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    f = jax.jit(ffn)
    rec("ffn fc1+gelu+fc2", timeit(lambda: f(x)), flops_ffn)

    from video_styler_tpu.ops.attention import attention
    q = jax.random.normal(k, (1, S, H, D // H), jnp.bfloat16)
    f = jax.jit(lambda q: attention(q, q, q))
    rec("flash attention", timeit(lambda: f(q)), flops_attn)

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
