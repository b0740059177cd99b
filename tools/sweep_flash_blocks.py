"""Sweep flash-attention block sizes at the exact 14B Ditto self-attn shape.

(B=1, S=29640, N=40, D=128) bf16 — the shape that dominates the DiT block
(148 ms / 62% peak as of the round-3 layout-native kernel). Prints ms and
TF/s per (block_q, block_k) for both the bf16 and int8 4-D kernels.

Run when the chip is free: python tools/sweep_flash_blocks.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, S, N, D = 1, 29640, 40, 128


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
    for k_, v_ in (("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"),
                   ("jax_persistent_cache_min_entry_size_bytes", -1),
                   ("jax_persistent_cache_min_compile_time_secs", 1.0)):
        try:
            jax.config.update(k_, v_)
        except Exception:
            pass

    from video_styler_tpu.ops import flash_attention as FA

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, S, N, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, N, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, N, D), jnp.bfloat16)
    scale = 1.0 / (D ** 0.5)
    flops = 4 * B * N * S * S * D

    print(f"shape B={B} S={S} N={N} D={D}, {flops/1e12:.2f} TFLOP/call",
          flush=True)
    import itertools
    grid = [(512, 1024), (512, 2048), (1024, 1024), (1024, 2048),
            (2048, 1024)]
    for bq, bk in grid:
        try:
            f = jax.jit(lambda q, k, v, bq=bq, bk=bk: FA._flash_fwd_4d(
                q, k, v, scale, block_q=bq, block_k=bk))
            ms = timeit(lambda: f(q, k, v))
            print(f"bf16 bq={bq:5d} bk={bk:5d}: {ms:8.2f} ms "
                  f"{flops/(ms/1e3)/1e12:6.1f} TF/s", flush=True)
        except Exception as e:  # vmem overflow etc.
            print(f"bf16 bq={bq:5d} bk={bk:5d}: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    for bq, bk in [(512, 256), (512, 512), (1024, 256), (1024, 512),
                   (1024, 1024), (2048, 512)]:
        try:
            f = jax.jit(lambda q, k, v, bq=bq, bk=bk: FA._flash_fwd_4d(
                q, k, v, scale, block_q=bq, block_k=bk, dual=True))
            ms = timeit(lambda: f(q, k, v))
            print(f"dual bq={bq:5d} bk={bk:5d}x2: {ms:8.2f} ms "
                  f"{flops/(ms/1e3)/1e12:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"dual bq={bq:5d} bk={bk:5d}x2: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    for bq, bk in grid:
        try:
            f = jax.jit(lambda q, k, v, bq=bq, bk=bk: FA._flash_fwd_4d_int8(
                q, k, v, scale, block_q=bq, block_k=bk))
            ms = timeit(lambda: f(q, k, v))
            print(f"int8 bq={bq:5d} bk={bk:5d}: {ms:8.2f} ms "
                  f"{flops/(ms/1e3)/1e12:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"int8 bq={bq:5d} bk={bk:5d}: FAIL "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
