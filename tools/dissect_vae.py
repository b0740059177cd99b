"""Dissect Wan-VAE streaming decode/encode cost on the real chip.

Stage A: per-chunk-step timing of the production streaming decode/encode.
Stage B: microbench of the hot conv shapes in several lowering variants
(NCDHW conv3d as shipped, NDHWC, per-frame conv2d with temporal-tap
decomposition, phase-decomposed upsample conv) to find where the ~74% of
peak goes missing (decoder = ~268 TFLOP, measured 5.2 s = 26% of peak).

Usage: python tools/dissect_vae.py [--stage a|b|all]

NOTE on absolute numbers: each timed batch pays the tunnel's fixed
~30-45 ms sync cost (tools/bench_utils.py) — at the ~1 s chunk scale
that is ~4% inflation; stage B's small convs use n=5 and over-report by
~6-9 ms each. Use bench_utils.timeit for anything precision-critical.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _log(m):
    print(f"[vae {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def _time(fn, n=3):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def stage_a(out):
    import jax
    import jax.numpy as jnp
    import video_styler_tpu.models.wan_vae as V

    cfg = V.WAN21_VAE
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), V.init_wan_vae(jax.random.PRNGKey(0), cfg))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 19, 60, 104), jnp.bfloat16)

    # per-chunk decode timing (chunk = 4 latent frames after the first)
    from functools import partial
    step1 = jax.jit(partial(V._decode_stream_step, cfg=cfg, first=True))
    stepn = jax.jit(partial(V._decode_stream_step, cfg=cfg, first=False))
    y, caches = step1(params, z[:, :, 0:1], None)
    _sync(y)
    t0 = time.perf_counter()
    y, caches = step1(params, z[:, :, 0:1], None)
    _sync(y)
    out["dec_first_chunk_ms"] = (time.perf_counter() - t0) * 1e3
    y, c2 = stepn(params, z[:, :, 1:5], caches)
    _sync(y)
    del c2  # keep ONE cache pytree live; two wedge the 16 GB chip (OOM)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        y, c2 = stepn(params, z[:, :, 1:5], caches)
        _sync(y)
        times.append((time.perf_counter() - t0) * 1e3)
        del c2
    out["dec_chunk4_ms"] = sorted(times)[1]
    _log(f"decode: first-chunk {out['dec_first_chunk_ms']:.0f} ms, "
         f"4-frame chunk {out['dec_chunk4_ms']:.0f} ms (x5 chunks + first)")
    del y, caches

    # encode chunk timing
    video = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 73, 480, 832),
                              jnp.bfloat16)
    estep1 = jax.jit(partial(V._encode_stream_step, cfg=cfg, first=True))
    estepn = jax.jit(partial(V._encode_stream_step, cfg=cfg, first=False))
    y, caches = estep1(params, video[:, :, 0:1], None)
    _sync(y)
    y, c2 = estepn(params, video[:, :, 1:5], caches)
    _sync(y)
    del c2
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        y, c2 = estepn(params, video[:, :, 1:5], caches)
        _sync(y)
        times.append((time.perf_counter() - t0) * 1e3)
        del c2
    out["enc_chunk4_ms"] = sorted(times)[1]
    _log(f"encode: 4-frame chunk {out['enc_chunk4_ms']:.0f} ms (x18 chunks)")
    return out


def stage_b(out):
    import numpy as np
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)

    def conv_ncdhw(x, w, pad):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), pad, dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def conv_ndhwc(x, w, pad):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), pad, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def conv_ncdhw_bf16(x, w, pad):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), pad, dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            preferred_element_type=jnp.bfloat16)

    def conv_ndhwc_bf16(x, w, pad):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), pad, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.bfloat16)

    # hot shapes: (cin, cout, T, H, W) of one 4-latent-frame decode chunk
    shapes = [
        (384, 384, 8, 120, 208, "scale1_res"),
        (192, 192, 16, 240, 416, "scale2_res"),
        (96, 96, 16, 480, 832, "scale3_res"),
    ]
    for cin, cout, T, H, W, name in shapes:
        flop = 2 * cin * cout * 27 * T * H * W
        x = jax.random.normal(key, (1, cin, T, H, W), jnp.bfloat16)
        w = jax.random.normal(key, (cout, cin, 3, 3, 3), jnp.bfloat16) * 0.02
        xc = jnp.transpose(x, (0, 2, 3, 4, 1))
        wc = jnp.transpose(w, (2, 3, 4, 1, 0))
        pad = ((2, 0), (1, 1), (1, 1))
        j1 = jax.jit(lambda x, w: conv_ncdhw(x, w, pad))
        j2 = jax.jit(lambda x, w: conv_ncdhw_bf16(x, w, pad))
        j3 = jax.jit(lambda x, w: conv_ndhwc(x, w, pad))
        j4 = jax.jit(lambda x, w: conv_ndhwc_bf16(x, w, pad))
        variants = {
            "ncdhw": lambda: j1(x, w),
            "ncdhw_b": lambda: j2(x, w),
            "ndhwc": lambda: j3(xc, wc),
            "ndhwc_b": lambda: j4(xc, wc),
        }
        msg = [name]
        for vn, fn in variants.items():
            ms = _time(fn, n=5)
            out[f"{name}_{vn}_ms"] = round(ms, 1)
            out[f"{name}_{vn}_tfs"] = round(flop / ms / 1e9, 1)
            msg.append(f"{vn} {out[f'{name}_{vn}_ms']} ms "
                       f"({out[f'{name}_{vn}_tfs']} TF/s)")
        _log(" | ".join(msg))

    # upsample conv: nearest-2x + 3x3 conv vs phase-decomposed 2x2 conv
    for cin, cout, T, H, W, name in [(192, 96, 16, 240, 416, "up_scale2"),
                                     (384, 192, 8, 120, 208, "up_scale1")]:
        flop_naive = 2 * cin * cout * 9 * T * (2 * H) * (2 * W)
        flop_phase = 2 * cin * cout * 4 * T * (2 * H) * (2 * W)
        x = jax.random.normal(key, (1, cin, T, H, W), jnp.bfloat16)
        w2 = jax.random.normal(key, (cout, cin, 3, 3), jnp.bfloat16) * 0.02

        def up_naive(x, w):
            x = jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)
            b, c, t, h, wd = x.shape
            xb = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, wd)
            y = jax.lax.conv_general_dilated(
                xb, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return y.reshape(b, t, -1, h, wd).transpose(0, 2, 1, 3, 4)

        f4 = jax.jit(lambda x: up_naive(x, w2))
        ms = _time(lambda: f4(x))
        out[f"{name}_naive_ms"] = round(ms, 1)
        out[f"{name}_naive_tfs"] = round(flop_naive / ms / 1e9, 1)

        # phase decomposition: out[2y+py, 2x+px] = sum_{dy,dx in taps(p)}
        # w_eff[p] * x[y+dy, x+dx]; each phase has a 2x2 effective kernel
        def phase_kernels(w):
            # w (O, I, 3, 3) -> wp (4*O, I, 2, 2); phase p=(py,px)
            O, I = w.shape[:2]
            wp = jnp.zeros((4, O, I, 2, 2), w.dtype)
            # derived from up[i]=x[i//2], out[o]=sum_k w[k]*up[o-1+k]
            # p=0: taps x[y-1]:w0 ; x[y]:w1+w2   (kernel index 0,1)
            # p=1: taps x[y]:w0+w1 ; x[y+1]:w2
            row = {0: [(0, w[..., 0, :]), (1, w[..., 1, :] + w[..., 2, :])],
                   1: [(0, w[..., 0, :] + w[..., 1, :]), (1, w[..., 2, :])]}
            for py in (0, 1):
                for px in (0, 1):
                    acc = jnp.zeros((O, I, 2, 2), w.dtype)
                    for iy, wy in row[py]:
                        col = {0: [(0, wy[..., 0]), (1, wy[..., 1] + wy[..., 2])],
                               1: [(0, wy[..., 0] + wy[..., 1]), (1, wy[..., 2])]}
                        for ix, v in col[px]:
                            acc = acc.at[..., iy, ix].add(v)
                    wp = wp.at[2 * py + px].set(acc)
            return wp.reshape(4 * O, I, 2, 2)

        wp = phase_kernels(w2.astype(jnp.float32)).astype(jnp.bfloat16)

        def up_phase(x, wp):
            # one conv, 2x2 kernel, pad (1,1) -> (h+1, w+1); phase (py,px)
            # slices [py:py+h, px:px+w]: phase 0 window (y-1,y), phase 1
            # window (y,y+1)
            b, c, t, h, wd = x.shape
            xb = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, wd)
            y = jax.lax.conv_general_dilated(
                xb, wp, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            O = wp.shape[0] // 4
            y = y.reshape(b, t, 2, 2, O, h + 1, wd + 1)
            y00 = y[:, :, 0, 0, :, :h, :wd]
            y01 = y[:, :, 0, 1, :, :h, 1:]
            y10 = y[:, :, 1, 0, :, 1:, :wd]
            y11 = y[:, :, 1, 1, :, 1:, 1:]
            ph = jnp.stack([jnp.stack([y00, y01], axis=-1),
                            jnp.stack([y10, y11], axis=-1)], axis=-3)
            # ph: b,t,O,h,2,wd,2 -> interleave
            yi = ph.transpose(0, 2, 1, 3, 4, 5, 6).reshape(
                b, O, t, 2 * h, 2 * wd)
            return yi

        f5 = jax.jit(lambda x: up_phase(x, wp))
        ms = _time(lambda: f5(x))
        out[f"{name}_phase_ms"] = round(ms, 1)
        out[f"{name}_phase_eff_tfs"] = round(flop_phase / ms / 1e9, 1)
        # numerics check vs naive
        ref = f4(x)
        got = f5(x)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        out[f"{name}_phase_maxerr"] = err
        _log(f"{name}: naive {out[f'{name}_naive_ms']} ms "
             f"({out[f'{name}_naive_tfs']} TF/s) | phase "
             f"{out[f'{name}_phase_ms']} ms (maxerr {err:.4f})")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=["a", "b", "all"])
    ap.add_argument("--out", default="/tmp/dissect_vae.json")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    out = {"device": str(jax.devices()[0])}
    if args.stage in ("a", "all"):
        stage_a(out)
    if args.stage in ("b", "all"):
        stage_b(out)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
