"""Flash-attention kernel micro-benchmark (real TPU).

Sweeps block sizes and RoPE placement for the Wan self-attention workload
(32,760 tokens, 12 heads, d=128, bf16) and the cross-attention workload
(S_kv=512). Prints TF/s per variant.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, *args, n=8):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    from video_styler_tpu.ops import flash_attention as F

    bh, sq, d = 12, 32760, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (bh, sq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (bh, sq, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (bh, sq, d), jnp.bfloat16)
    flops = 4 * bh * sq * sq * d

    for bq, bk in [(1024, 1024), (2048, 512), (1024, 2048), (512, 2048),
                   (2048, 1024), (1536, 1024), (1024, 512)]:
        try:
            f = jax.jit(lambda q, k, v: F._flash_fwd_3d(
                q, k, v, 1.0 / d ** 0.5, block_q=bq, block_k=bk))
            t = bench(f, q, k, v)
            print(f"self-attn bq={bq} bk={bk}: {t*1e3:8.2f} ms "
                  f"{flops/t/1e12:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"self-attn bq={bq} bk={bk}: FAIL {type(e).__name__} {e}",
                  flush=True)

    # cross-attention: S_kv = 512
    kc = jax.random.normal(jax.random.PRNGKey(3), (bh, 512, d), jnp.bfloat16)
    vc = jax.random.normal(jax.random.PRNGKey(4), (bh, 512, d), jnp.bfloat16)
    flops_c = 4 * bh * sq * 512 * d
    for bq in [1024, 2048, 4096]:
        try:
            f = jax.jit(lambda q, k, v: F._flash_fwd_3d(
                q, k, v, 1.0 / d ** 0.5, block_q=bq, block_k=512))
            t = bench(f, q, kc, vc)
            print(f"cross-attn bq={bq}: {t*1e3:8.2f} ms "
                  f"{flops_c/t/1e12:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"cross-attn bq={bq}: FAIL {type(e).__name__}", flush=True)

    # XLA sdpa baseline for cross-attn (short KV often wins without Pallas)
    from video_styler_tpu.ops.attention import sdpa

    def sdpa3(q, k, v):
        return sdpa(q.transpose(0, 2, 1)[..., None].transpose(0, 1, 3, 2),
                    k.transpose(0, 2, 1)[..., None].transpose(0, 1, 3, 2),
                    v.transpose(0, 2, 1)[..., None].transpose(0, 1, 3, 2))
    f = jax.jit(lambda q, k, v: sdpa(
        q.reshape(1, -1, bh, d).reshape(1, sq, bh, d) if False else
        q.transpose(1, 0, 2).reshape(1, sq, bh, d),
        k.transpose(1, 0, 2).reshape(1, 512, bh, d),
        v.transpose(1, 0, 2).reshape(1, 512, bh, d)))
    t = bench(f, q, kc, vc)
    print(f"cross-attn XLA sdpa: {t*1e3:8.2f} ms {flops_c/t/1e12:6.1f} TF/s",
          flush=True)


if __name__ == "__main__":
    main()
