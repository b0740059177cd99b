"""Per-device_put latency vs size through the axon tunnel.

Separates RPC/dispatch latency from wire bandwidth so the streaming design
can choose between coalescing (fewer puts) and more streams.
"""
import os
import sys
import time

if os.environ.get("MALLOC_MMAP_THRESHOLD_") != "1073741824":
    os.environ["MALLOC_MMAP_THRESHOLD_"] = "1073741824"
    os.environ["MALLOC_TRIM_THRESHOLD_"] = "2147483647"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[lat {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from concurrent.futures import ThreadPoolExecutor

    dev = jax.devices()[0]
    log(f"device {dev}")

    def timed_put(arr, repeat=3):
        ts = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            x = jax.device_put(arr, dev)
            jax.block_until_ready(x)
            ts.append(time.perf_counter() - t0)
            x.delete()
        return min(ts)

    rng = np.random.default_rng(0)
    for mb in (0.001, 1, 8, 32, 96, 352):
        n = int(mb * 1e6)
        arr = rng.integers(-127, 127, n, dtype=np.int8)
        arr.sum()  # fault pages
        dt = timed_put(arr)
        log(f"int8 {mb:8.3f} MB: {dt*1e3:8.1f} ms  {n/dt/1e9:.3f} GB/s")

    # bf16 for comparison
    import ml_dtypes
    for mb in (32, 352):
        n = int(mb * 1e6 // 2)
        arr = rng.random(n, dtype=np.float32).astype(ml_dtypes.bfloat16)
        arr.view(np.uint16).sum()
        dt = timed_put(arr)
        log(f"bf16 {mb:8.3f} MB: {dt*1e3:8.1f} ms  {mb*1e6/dt/1e9:.3f} GB/s")

    # parallel streams on one 352 MB buffer split k ways
    n = int(352e6)
    arr = rng.integers(-127, 127, n, dtype=np.int8)
    arr.sum()
    for k in (1, 2, 4, 8, 16):
        parts = np.array_split(arr, k)
        pool = ThreadPoolExecutor(max_workers=k)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            futs = [pool.submit(jax.device_put, p, dev) for p in parts]
            xs = [f.result() for f in futs]
            jax.block_until_ready(xs)
            ts.append(time.perf_counter() - t0)
            for x in xs:
                x.delete()
        dt = min(ts)
        log(f"352 MB split {k:2d} ways: {dt*1e3:8.1f} ms  {n/dt/1e9:.3f} GB/s")


if __name__ == "__main__":
    main()
