"""On-chip A/B of the int8 flash attention kernel: capped softmax vs
online max, against the bf16 capped kernel, at the exact 14B self-attention
shape (1, 29640, 40, 128). Includes the XLA-side quantize pass in every
number (that is what the DiT block pays).

Usage: python tools/bench_int8_capped.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from bench_utils import timeit


def main():
    from video_styler_tpu.ops import flash_attention as F

    b, s, n, d = 1, 29640, 40, 128
    scale = 1.0 / d ** 0.5
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, n, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, n, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, n, d), jnp.bfloat16)
    flops = 4 * b * n * s * s * d

    variants = [
        ("bf16 capped", jax.jit(lambda q, k, v: F._flash_fwd_4d(
            q, k, v, scale, capped=True))),
        ("bf16 online", jax.jit(lambda q, k, v: F._flash_fwd_4d(
            q, k, v, scale, capped=False))),
        ("int8 capped", jax.jit(lambda q, k, v: F._flash_fwd_4d_int8(
            q, k, v, scale, capped=True))),
        ("int8 online", jax.jit(lambda q, k, v: F._flash_fwd_4d_int8(
            q, k, v, scale, capped=False))),
    ]
    ref = None
    for name, f in variants:
        ms = timeit(lambda f=f: f(q, k, v), n=12)
        out = f(q, k, v)
        if ref is None:
            ref = out
            diff = 0.0
        else:
            diff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                         - ref.astype(jnp.float32))))
        print(f"{name}: {ms:8.1f} ms  {flops/ms/1e9:6.1f} TF/s  "
              f"maxdiff vs bf16-capped {diff:.2e}", flush=True)

    # block-size sweep for the winning int8 capped kernel
    for bq, bk in [(1024, 1024), (1024, 2048), (2048, 1024), (512, 2048),
                   (1024, 512)]:
        try:
            f = jax.jit(lambda q, k, v, bq=bq, bk=bk: F._flash_fwd_4d_int8(
                q, k, v, scale, block_q=bq, block_k=bk, capped=True))
            ms = timeit(lambda: f(q, k, v), n=12)
            print(f"int8 capped bq={bq} bk={bk}: {ms:8.1f} ms "
                  f"{flops/ms/1e9:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"int8 capped bq={bq} bk={bk}: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
