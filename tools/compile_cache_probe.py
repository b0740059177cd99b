"""Persistent-compile-cache amortization probe (VERDICT r4 item 6).

Runs the SAME jitted DiT graph in two FRESH subprocesses sharing one
fresh cache directory: process 1 compiles cold and populates the cache,
process 2 must hit it. Prints one JSON line:
  {"cold_compile_s": ..., "warm_compile_s": ..., "warm_over_cold": ...}

This turns the bench's compile-amortization claim ("the persistent compile
cache amortizes first-video compile across processes") into a measured,
regression-guarded fact — tests/test_compile_cache.py asserts the ratio on
the CPU backend; bench stage C measures it on the real chip.

The parent deliberately never imports jax (the axon tunnel serves one TPU
client at a time); each child is its own client, run sequentially.
"""
import json
import os
import subprocess
import sys
import tempfile

CHILD = r"""
import json, os, sys, time
import jax
if os.environ.get("CACHE_PROBE_CPU") == "1":
    # the axon TPU plugin ignores JAX_PLATFORMS; force CPU explicitly
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp
from video_styler_tpu.models.wan_dit import WanDiTConfig, init_wan_dit, wan_dit_forward

# 1.3B-dimension single block at a real token count: a few seconds of XLA
# compile — enough to measure, cheap enough for a bench sub-stage.
cfg = WanDiTConfig(dim=1536, in_dim=16, ffn_dim=8960, out_dim=16,
                   num_heads=12, num_layers=1)
params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
lat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 9, 30, 52), jnp.bfloat16)
ts = jnp.asarray([800.0], jnp.float32)
ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 512, cfg.text_dim), jnp.bfloat16)
fwd = jax.jit(lambda p, x, t, c: wan_dit_forward(p, cfg, x, t, c))
t0 = time.perf_counter()
lowered = fwd.lower(params, lat, ts, ctx)
lower_s = time.perf_counter() - t0
t0 = time.perf_counter()
compiled = lowered.compile()  # persistent-cache hit happens HERE
compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
float(jnp.sum(compiled(params, lat, ts, ctx).astype(jnp.float32)))
exec_s = time.perf_counter() - t0
print(json.dumps({"lower_s": lower_s, "compile_s": compile_s,
                  "exec_s": exec_s}))
"""


def run_child(cache_dir, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    proc = subprocess.run([sys.executable, "-c", CHILD, cache_dir],
                          capture_output=True, text=True, env=e,
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"child rc={proc.returncode}: {proc.stderr[-400:]}")
    return json.loads(lines[-1])


def main():
    with tempfile.TemporaryDirectory(prefix="jaxcache_probe_") as cache_dir:
        cold = run_child(cache_dir)
        warm = run_child(cache_dir)
    cold_s, warm_s = cold["compile_s"], warm["compile_s"]
    out = {
        "cold_compile_s": round(cold_s, 2),
        "warm_compile_s": round(warm_s, 2),
        "warm_over_cold": round(warm_s / cold_s, 3) if cold_s > 0 else None,
        "exec_call_s": round(warm["exec_s"], 4),
        "note": ("same jitted 1.3B-dim DiT block graph in two fresh "
                 "processes against one fresh persistent cache dir; "
                 "process 2's first call loads the compiled executable "
                 "from the cache instead of re-running XLA"),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
