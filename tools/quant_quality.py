"""Quality evidence for the quantized Ditto recipe (VERDICT r3 item 2).

Same seed, same inputs, same REAL 1.3B-architecture Wan T2V+VACE model: run
the 4-step denoise (the int4 recipe's step count, tools/measure_14b.py) with
bf16 weights, then with the SAME weights int8- and int4-quantized through the
production quantizers (ops/quant.py — the exact kernels the 14B recipe
runs), decode all three through the same bf16 VAE, and report:

  * latent relative RMSE (int8 vs bf16, int4 vs bf16)
  * frame PSNR / SSIM (decoded video, int8/int4 vs bf16)

No public checkpoints exist in this offline harness, so weights are
random-init: the numbers quantify NUMERIC error propagation through the real
48-layer-class compute graph (projection/attention/FFN chains at production
dimension), not perceptual quality of a trained model. They bound the
arithmetic fidelity of the recipe's quantization exactly.

Usage: python tools/quant_quality.py [--tiny] [--steps 4]
       [--out docs/quant_quality_r4.json]
"""
import argparse
import json
import os
import sys
import time

# CLI only: the re-exec must NEVER run at import time (a test importing this
# module would exec over the pytest process itself — it did, once)
if __name__ == "__main__" and \
        os.environ.get("MALLOC_MMAP_THRESHOLD_") != "1073741824":
    os.environ["MALLOC_MMAP_THRESHOLD_"] = "1073741824"
    os.environ["MALLOC_TRIM_THRESHOLD_"] = "2147483647"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(msg):
    print(f"[qq {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def psnr(a, b, data_range=2.0):
    import numpy as np
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    import math
    return 10.0 * math.log10(data_range ** 2 / mse)


def ssim(a, b, data_range=2.0):
    """Global-window SSIM per frame, averaged (the standard constants
    C1=(0.01L)^2, C2=(0.03L)^2). Evidence-grade summary, not a full
    sliding-window implementation."""
    import numpy as np
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    axes = tuple(range(1, a.ndim))
    mu_a = a.mean(axis=axes)
    mu_b = b.mean(axis=axes)
    va = a.var(axis=axes)
    vb = b.var(axis=axes)
    cov = ((a - mu_a.reshape((-1,) + (1,) * (a.ndim - 1)))
           * (b - mu_b.reshape((-1,) + (1,) * (a.ndim - 1)))).mean(axis=axes)
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)
         / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))
    return float(s.mean())


def run(args):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from video_styler_tpu.models.wan_dit import (
        WanDiTConfig, WAN_T2V_1_3B, init_wan_dit, wan_dit_forward)
    from video_styler_tpu.models.wan_vace import (
        VaceConfig, VACE_1_3B, init_vace)
    from video_styler_tpu.ops.quant import quantize_params
    from video_styler_tpu.schedulers.flow_match import FlowMatchScheduler
    import video_styler_tpu.models.wan_vae as V

    if args.tiny:
        # latent channels must match the tiny VAE's z_dim=4 for the decode
        cfg = WanDiTConfig(dim=192, in_dim=4, ffn_dim=512, out_dim=4,
                           num_heads=4, num_layers=4, text_dim=128,
                           freq_dim=32)
        vcfg = VaceConfig(vace_layers=(0, 2), vace_in_dim=4 * 2 + 64,
                          dim=192, num_heads=4, ffn_dim=512)
        lat_shape = (1, 4, 3, 16, 16)
        vid_hw = (9, 128, 128)
    else:
        cfg, vcfg = WAN_T2V_1_3B, VACE_1_3B
        # 33f 240x416 -> latent (16, 9, 30, 52): real architecture, a video
        # shape small enough that bf16 model + VAE decode fit one v5e
        lat_shape = (1, 16, 9, 30, 52)
        vid_hw = (33, 240, 416)

    dtype = jnp.bfloat16
    params = init_wan_dit(jax.random.PRNGKey(0), cfg, dtype=dtype)
    vace_params = init_vace(jax.random.PRNGKey(1), vcfg, dtype=dtype)

    noise = jax.random.normal(jax.random.PRNGKey(2), lat_shape, dtype)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 64, cfg.text_dim),
                            dtype)
    vctx = jax.random.normal(jax.random.PRNGKey(4),
                             (1, vcfg.vace_in_dim) + lat_shape[2:], dtype)

    sched = FlowMatchScheduler(shift=5.0, sigma_min=0.0, extra_one_step=True)
    sched.set_timesteps(args.steps, shift=5.0)

    def denoise(p, vp):
        fwd = jax.jit(lambda p, vp, x, t: wan_dit_forward(
            p, cfg, x, t, ctx, vace_params=vp, vace_cfg=vcfg,
            vace_context=vctx))
        lat = noise
        for t in sched.timesteps:
            v = fwd(p, vp, lat, jnp.asarray([float(t)], jnp.float32))
            lat = jnp.asarray(sched.step(np.asarray(v, np.float32), float(t),
                                         np.asarray(lat, np.float32)), dtype)
        return np.asarray(lat, np.float32)

    out = {"config": "tiny" if args.tiny else "Wan2.1-T2V-1.3B arch + VACE",
           "steps": args.steps, "latent_shape": list(lat_shape),
           "note": ("random-init weights (offline harness): numbers bound "
                    "NUMERIC error of the production int8/int4 kernels "
                    "through the real compute graph, not perceptual quality "
                    "of a trained model")}

    def pred(path, leaf):
        return not any(k in path for k in ("head", "modulation",
                                           "time_embedding"))

    lats = {}
    for mode in ("bf16", "int8", "int4"):
        t0 = time.time()
        if mode == "bf16":
            p, vp = params, vace_params
        else:
            p = quantize_params(params, mode=mode, predicate=pred)
            vp = quantize_params(vace_params, mode=mode, predicate=pred)
        lats[mode] = denoise(p, vp)
        _log(f"{mode} denoise done in {time.time()-t0:.0f}s")
        if mode != "bf16":
            del p, vp

    ref = lats["bf16"]
    scale = float(np.sqrt(np.mean(ref ** 2)))
    for mode in ("int8", "int4"):
        rmse = float(np.sqrt(np.mean((lats[mode] - ref) ** 2)))
        out[f"latent_rmse_{mode}"] = rmse
        out[f"latent_rel_rmse_{mode}"] = rmse / scale
        _log(f"{mode}: latent rel RMSE {rmse/scale:.4f}")

    # decode all three through the same bf16 VAE and compare frames
    if not args.skip_decode:
        vcfg_vae = V.WAN_VAE_TINY if args.tiny else V.WAN21_VAE
        vaep = jax.tree_util.tree_map(
            lambda x: x.astype(dtype),
            V.init_wan_vae(jax.random.PRNGKey(5), vcfg_vae))
        frames = {}
        for mode in ("bf16", "int8", "int4"):
            dec = V.decode(vaep, jnp.asarray(lats[mode], dtype), vcfg_vae,
                           tiled=not args.tiny)
            frames[mode] = np.clip(np.asarray(dec, np.float32), -1, 1)
            _log(f"{mode} decoded {frames[mode].shape}")
        for mode in ("int8", "int4"):
            out[f"frame_psnr_{mode}_vs_bf16"] = psnr(frames[mode],
                                                     frames["bf16"])
            out[f"frame_ssim_{mode}_vs_bf16"] = ssim(
                frames[mode][0].transpose(1, 0, 2, 3),
                frames["bf16"][0].transpose(1, 0, 2, 3))
            _log(f"{mode}: PSNR {out[f'frame_psnr_{mode}_vs_bf16']:.1f} dB "
                 f"SSIM {out[f'frame_ssim_{mode}_vs_bf16']:.4f}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--skip-decode", action="store_true")
    ap.add_argument("--out", default="docs/quant_quality_r4.json")
    args = ap.parse_args()
    out = run(args)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
