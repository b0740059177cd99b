"""Diagnose the streamed-14B pass slowness: where do 27 s/block go?

Measures, at real 14B-block dimensions (dim 5120, ffn 13824, int8):
  1. raw repeated device_put of one block tree (the PrefetchQueue path),
     fresh process, after the malloc env fix;
  2. a short streamed walk (N blocks) with per-block wait/dispatch/sync
     timing, exactly the WanBlockStreamer._run_block cycle.

Usage: python tools/probe_stream_block.py [--blocks 6] [--tokens 29640]
"""
import argparse
import os
import sys
import time

if os.environ.get("MALLOC_MMAP_THRESHOLD_") != "1073741824":
    os.environ["MALLOC_MMAP_THRESHOLD_"] = "1073741824"
    os.environ["MALLOC_TRIM_THRESHOLD_"] = "2147483647"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[probe {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--tokens", type=int, default=29640)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--streams", type=int, default=8)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video_styler_tpu.models.wan_dit import (WAN_T2V_14B, init_dit_block,
                                                 dit_block)
    from video_styler_tpu.parallel.streaming import (
        MultiStreamLoader, PrefetchQueue, host_quantize_int8, tree_bytes)

    cfg = WAN_T2V_14B
    dev = jax.devices()[0]
    log(f"device {dev}")

    # one real host block, int8-quantized, leading axis 1 (streamed shape)
    tpl = jax.eval_shape(
        lambda k: init_dit_block(k, cfg, jnp.bfloat16), jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def fill(s):
        import ml_dtypes
        return (rng.random(s.shape, dtype=np.float32) * 0.02 - 0.01).astype(
            ml_dtypes.bfloat16)

    block = jax.tree_util.tree_map(fill, tpl)
    block = jax.tree_util.tree_map(lambda x: x[None], block)  # stack axis 1
    qblock = host_quantize_int8(block)
    gb = tree_bytes(qblock) / 1e9
    nleaves = len(jax.tree_util.tree_leaves(qblock))
    log(f"int8 block {gb:.3f} GB, {nleaves} leaves")

    loader = MultiStreamLoader(dev, num_streams=args.streams)

    # ---- 1. raw transfer loop --------------------------------------------
    p = loader.put(qblock); t = p.get()
    jax.block_until_ready(jax.tree_util.tree_leaves(t))
    p.delete()
    for trial in range(4):
        t0 = time.perf_counter()
        p = loader.put(qblock)
        t = p.get()
        jax.block_until_ready(jax.tree_util.tree_leaves(t))
        # force real materialization through the tunnel
        s = float(jnp.sum(jax.tree_util.tree_leaves(t)[0][..., :8].astype(jnp.float32)))
        dt = time.perf_counter() - t0
        log(f"raw put trial {trial}: {dt:.2f}s = {gb/dt:.3f} GB/s")
        p.delete()

    # ---- 2. streamed walk with phase timing ------------------------------
    B, S, D = args.batch, args.tokens, cfg.dim
    x = jax.device_put(np.zeros((B, S, D), np.float32).astype(jnp.bfloat16), dev)
    ctx = jax.device_put(np.zeros((B, 512, D), np.float32).astype(jnp.bfloat16), dev)
    t_mod = jax.device_put(np.zeros((B, 6, D), np.float32).astype(jnp.bfloat16), dev)
    half = cfg.head_dim // 2
    cos = jax.device_put(np.zeros((S, half), np.float32), dev)
    sin = jax.device_put(np.zeros((S, half), np.float32), dev)

    @jax.jit
    def run_block(bp, x, ctx, t_mod, cos, sin):
        def scan_fn(carry, lp):
            return dit_block(lp, carry, ctx, t_mod, cos, sin, cfg), None
        y, _ = jax.lax.scan(scan_fn, x, bp)
        return y

    items = [qblock] * args.blocks
    # compile once
    p = loader.put(qblock); bp = p.get()
    t0 = time.perf_counter()
    y = run_block(bp, x, ctx, t_mod, cos, sin)
    _ = float(jnp.sum(y[..., :8].astype(jnp.float32)))
    log(f"block compile+run {time.perf_counter()-t0:.1f}s")
    p.delete()

    queue = PrefetchQueue(items, loader, depth=3)
    t_pass0 = time.perf_counter()
    for i in range(args.blocks):
        t0 = time.perf_counter()
        pending, bp = queue.pop()
        t_wait = time.perf_counter() - t0
        t0 = time.perf_counter()
        x = run_block(bp, x, ctx, t_mod, cos, sin)
        t_disp = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(jnp.sum(x[..., :8].astype(jnp.float32)))
        t_sync = time.perf_counter() - t0
        pending.delete()
        log(f"block {i}: wait {t_wait:.2f}s dispatch {t_disp:.2f}s "
            f"sync {t_sync:.2f}s")
    total = time.perf_counter() - t_pass0
    log(f"streamed walk: {total:.1f}s for {args.blocks} blocks "
        f"= {total/args.blocks:.2f}s/block")

    # ---- 3. same walk WITHOUT per-block sync (single tail sync) ----------
    queue = PrefetchQueue(items, loader, depth=3)
    t_pass0 = time.perf_counter()
    pendings = []
    for i in range(args.blocks):
        pending, bp = queue.pop()
        x = run_block(bp, x, ctx, t_mod, cos, sin)
        pendings.append(pending)
    _ = float(jnp.sum(x[..., :8].astype(jnp.float32)))
    total = time.perf_counter() - t_pass0
    for p in pendings:
        p.delete()
    log(f"streamed walk (tail sync only): {total:.1f}s "
        f"= {total/args.blocks:.2f}s/block")


if __name__ == "__main__":
    main()
