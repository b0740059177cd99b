"""Shared timing helpers for on-chip microbenchmarks.

The axon tunnel adds a large FIXED cost to every measured batch (~40-50 ms
on this machine: the final sync round-trip plus dispatch priming after a
sync), regardless of the batch's iteration count. Calibrated 2026-08-18:

    tiny op, n=5:  8.76 ms/call        n=50: 0.93 ms/call
    200k x 384 x 384 matmul, n=5: 8.39 ms/call   n=50: 1.72 ms/call

i.e. per-batch overhead ~44 ms. Consequence: `(t_batch / n)` with n=3-5
over-reports anything under ~100 ms by 9-15 ms per call. The round-3 MFU
notes before this calibration carry that inflation (deltas between two
same-n measurements cancel it; absolute numbers do not).

Use `timeit` below everywhere: it measures the per-batch overhead once per
process with a tiny op and subtracts it, and defaults to n=20.
"""
import time

_OVERHEAD_MS = None


def sync(x):
    """Force materialization; block_until_ready does not synchronize
    through the axon tunnel."""
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def _batch_overhead_ms():
    """Fixed wall cost of one measured batch (dispatch prime + final sync),
    measured with a near-zero-work op."""
    global _OVERHEAD_MS
    if _OVERHEAD_MS is None:
        import jax
        import jax.numpy as jnp
        f = jax.jit(lambda x: x + 1)
        t = jnp.ones((8, 128), jnp.bfloat16)
        sync(f(t))  # compile
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f(f(t)))
            samples.append((time.perf_counter() - t0) * 1e3)
        _OVERHEAD_MS = sorted(samples)[1]
    return _OVERHEAD_MS


def timeit(fn, n=20, subtract_overhead=True):
    """ms per call of fn() on the device, overhead-corrected.

    fn must return a device array (its sync forces the batch to finish).
    """
    out = fn()
    sync(out)  # compile / warm-up
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    total_ms = (time.perf_counter() - t0) * 1e3
    if subtract_overhead:
        total_ms -= _batch_overhead_ms()
    return max(total_ms, 0.0) / n
