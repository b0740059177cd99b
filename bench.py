"""Benchmark: Wan DiT denoising step on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline: Wan2.1-T2V-1.3B DiT forward step (one CFG branch) at 480x832x81
(latent 21x60x104 -> seq 32,760 tokens, the Ditto working resolution),
bf16, Pallas flash attention. The chip here is a single v5e; the reference
baseline (BASELINE.md) is ~4 min/video for the quantized 14B ComfyUI path on
an A6000 — we report projected sec/video for the full 50-step x 2-branch
1.3B denoise as the tracking metric and the DiT step ms as `value`.

vs_baseline: ratio of reference-quoted per-video wall time (240 s) to our
projected full-denoise wall time for the same step count on this chip
(>1 means faster than the reference number; note model sizes differ until
the 14B multi-chip path is benched on a pod).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from video_styler_tpu.models import WAN_T2V_1_3B, init_wan_dit, wan_dit_forward

    cfg = WAN_T2V_1_3B
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 21, 60, 104), jnp.bfloat16)
    ts = jnp.asarray([800.0], jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 512, cfg.text_dim), jnp.bfloat16)

    fwd = jax.jit(lambda p, x, t, c: wan_dit_forward(p, cfg, x, t, c))

    # warm-up/compile; force full materialization (block_until_ready does not
    # synchronize through the axon tunnel)
    out = fwd(params, lat, ts, ctx)
    _ = float(jnp.sum(out.astype(jnp.float32)))

    n = 5
    x = lat
    t0 = time.perf_counter()
    for _ in range(n):
        x = fwd(params, x, ts, ctx)
    _ = float(jnp.sum(x.astype(jnp.float32)))
    step_ms = (time.perf_counter() - t0) / n * 1e3

    steps, cfg_branches = 50, 2
    projected_video_s = step_ms / 1e3 * steps * cfg_branches
    baseline_video_s = 240.0
    result = {
        "metric": "wan1.3b_dit_step_ms_480p81f",
        "value": round(step_ms, 2),
        "unit": "ms",
        "vs_baseline": round(baseline_video_s / projected_video_s, 3),
        "extra": {
            "seq_tokens": 21 * 60 * 104 // 4,
            "projected_50step_cfg_video_s": round(projected_video_s, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
